"""Miller DSL built-in function library, vectorized (SURVEY.md §2.8).

The reference registers 265 named built-ins
(``pkg/dsl/cst/builtin_function_manager.go``) implemented as ``BIF_*``
functions in ``pkg/bifs/``. Here each supported function is a
vectorized kernel ``Array/ChunkedArray -> Array`` built on
``pyarrow.compute`` (numpy where Arrow lacks a kernel) — usable inside
any ``map_batches`` stage via :func:`apply` / :func:`put_fn`, the
engine's analogue of the DSL's per-record expression evaluation.

Naming follows Miller exactly (``toupper``, ``strlen``, ``sec2gmt``,
``md5``...). Semantics notes per function cite the reference file.
Functions are registered in ``REGISTRY``; ``supported()`` lists names.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

REGISTRY: dict[str, Callable] = {}


class _MlrNull:
    """The JSON-null mlrval (reference mlrval MT_NULL,
    mlrval_constants.go:31 printrep "null"). Distinct from absent
    (Python None) and void (""): the DSL `null` literal and JSON null
    values carry it. Falsy; renders as "null"."""

    __slots__ = ()

    def __repr__(self):
        return "null"

    def __str__(self):
        return "null"

    def __bool__(self):
        return False


MLR_NULL = _MlrNull()

# Process-wide float output format, mirroring the reference's MLR_OFMT
# environment variable (regtester.go:161 sets %.8f for golden tests).
# None outside conformance runs.
OFMT: str | None = None


def bif(name):
    def deco(fn):
        REGISTRY[name] = fn
        fn.__name__ = name
        return fn

    return deco


def supported() -> list[str]:
    return sorted(REGISTRY)


def apply(name: str, *args):
    """Apply a registered Miller function to Arrow array / scalar args."""
    return REGISTRY[name](*args)


def put_fn(name: str, col: str, out: str | None = None, *extra):
    """Batch fn for ``verbs.put``-style use: table -> table with
    ``out`` (default: overwrite ``col``) = fn(col, *extra)."""
    out = out or col

    def f(t: pa.Table) -> pa.Table:
        arr = REGISTRY[name](t[col], *extra)
        if out in t.column_names:
            return t.set_column(t.column_names.index(out), out, arr)
        return t.append_column(out, arr)

    return f


def _s(x):
    return pc.cast(x, pa.string())


def _f(x):
    return pc.cast(x, pa.float64())


# --- strings (pkg/bifs/strings.go) -----------------------------------------

@bif("strlen")
def _strlen_bif(x):
    """BIF_strlen: absent passes through; collections are type
    errors (dsl-mapvars-in-scalar-function-call-contexts); bytes
    report their BYTE length."""
    if isinstance(x, bytes):
        return len(x)
    if isinstance(x, (dict, list)):
        return "(error)"
    if x is None:
        return None
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        return len(_render_scalar(x))
    return pc.utf8_length(_s(x))


def _l1_one(v, to_utf8: bool):
    """Byte-level latin1<->utf8 conversion (bifs/strings.go
    BIF_latin1_to_utf8 / BIF_utf8_to_latin1, lib/unsparsify TryUTF8…).
    Non-UTF8 bytes are carried in str values via surrogateescape (the
    conformance readers' convention). A utf8 string with code points
    outside latin-1 cannot convert: Miller yields an error value,
    rendered ``(error)`` (dsl-latin1/0001 Cyrillic row)."""
    if not isinstance(v, str):
        if isinstance(v, dict):
            return {k: _l1_one(x, to_utf8) for k, x in v.items()}
        if isinstance(v, list):
            return [_l1_one(x, to_utf8) for x in v]
        if isinstance(v, bytes):  # binary column payloads
            return _l1_one(v.decode("utf-8", "surrogateescape"), to_utf8)
        return v
    b = v.encode("utf-8", "surrogateescape")
    try:
        if to_utf8:
            return b.decode("latin-1")
        text = b.decode("utf-8")  # must be valid utf8 to re-encode
        lat = text.encode("latin-1")
        return lat.decode("utf-8", "surrogateescape")
    except (UnicodeDecodeError, UnicodeEncodeError):
        return "(error)"


def _l1_conv(x, to_utf8: bool):
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array([_l1_one(v, to_utf8) for v in x.to_pylist()],
                        type=pa.string())
    return _l1_one(x, to_utf8)


bif("latin1_to_utf8")(lambda x: _l1_conv(x, True))
bif("utf8_to_latin1")(lambda x: _l1_conv(x, False))
bif("toupper")(lambda x: pc.utf8_upper(_s(x)))
bif("tolower")(lambda x: pc.utf8_lower(_s(x)))
bif("capitalize")(lambda x: pc.utf8_capitalize(_s(x)))
bif("lstrip")(lambda x: pc.utf8_ltrim_whitespace(_s(x)))
bif("rstrip")(lambda x: pc.utf8_rtrim_whitespace(_s(x)))
bif("strip")(lambda x: pc.utf8_trim_whitespace(_s(x)))
bif("clean_whitespace")(lambda x: pc.replace_substring_regex(
    pc.utf8_trim_whitespace(_s(x)), pattern=r"\s+", replacement=" "))
bif("collapse_whitespace")(lambda x: pc.replace_substring_regex(
    _s(x), pattern=r"\s+", replacement=" "))
@bif("truncate")
def _truncate(x, n):
    """truncate(s, n): first n codepoints; a negative n yields the
    Miller error VALUE "(error)" (errors propagate as values,
    mlrval_type.go:124-130)."""
    if int(n) < 0:
        return pa.array(["(error)"] * len(x), type=pa.string())
    return pc.utf8_slice_codeunits(_s(x), 0, int(n))
@bif("leafcount")
def _leafcount(x):
    """Recursive scalar-leaf count (bifs/collections.go BIF_leafcount);
    Arrow scalar columns count 1 per row; absent stays absent."""
    if x is None:
        return None
    if isinstance(x, dict):
        return sum(_leafcount(v) for v in x.values())
    if isinstance(x, list):
        return sum(_leafcount(v) for v in x)
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array(np.ones(len(x), dtype=np.int64))
    return 1


def _slice_incl(x, lo, hi):
    """Inclusive-both-ends substring with negative-index support
    (BIF_substr_0_up): pandas str.slice is C-vectorized and handles
    negative scalar bounds per row."""
    import pandas as pd

    s = pd.Series(_s(x).to_pandas() if hasattr(x, "to_pandas")
                  else pd.Series(x).astype(str))
    lo, hi = int(lo), int(hi)
    stop = None if hi == -1 else hi + 1
    return pa.array(s.str.slice(lo, stop), type=pa.string())


def _bytes_slice(b: bytes, lo: int, hi: int, zero_up: bool) -> bytes:
    """Byte-wise substr (bifs/strings.go BytesSliceAccess via
    MillerSliceAccess): inclusive bounds, negative aliasing, clamping,
    lower>upper → empty bytes."""
    n = len(b)
    lo, hi = int(lo), int(hi)
    if zero_up:
        if lo >= 0:
            lo += 1
        if hi >= 0:
            hi += 1

    def unal(m):
        return m - 1 if m >= 1 else (m + n if m <= -1 else -1)
    lz, uz = unal(lo), unal(hi)
    if lz > uz:
        return b""
    lz = max(lz, 0)
    uz = min(uz, n - 1)
    if lz > uz:
        return b""
    return b[lz:uz + 1]


# substr is an ALIAS FOR substr0 (0-up, inclusive both ends) — a Miller-5
# compatibility wart documented in builtin_function_manager.go:617-622
@bif("substr")
@bif("substr0")
def _substr0(x, lo, hi):
    if isinstance(x, bytes):
        return _bytes_slice(x, lo, hi, zero_up=True)
    return _slice_incl(x, lo, hi)


@bif("substr1")
def _substr1(x, lo, hi):
    """1-up inclusive variant (BIF_substr_1_up); negative indices count
    from the end unchanged."""
    if isinstance(x, bytes):
        return _bytes_slice(x, lo, hi, zero_up=False)
    lo = int(lo)
    hi = int(hi)
    return _slice_incl(x, lo - 1 if lo > 0 else lo, hi - 1 if hi > 0 else hi)
bif("ssub")(lambda x, a, b: pc.replace_substring(_s(x), pattern=a, replacement=b,
                                                 max_replacements=1))
def _raw_pat(p):
    """Regex-position strings are compiled from the RAW literal (Miller
    does not unescape regex strings; lib/regex.go)."""
    return getattr(p, "raw", p)


@bif("sub")
def _sub(x, a, b):
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        if x is None:
            return None
        return re.sub(str(_raw_pat(a)), _go_repl(b, _raw_pat(a)), str(x), count=1)
    return pc.replace_substring_regex(_s(x), pattern=_raw_pat(a),
                                      replacement=b, max_replacements=1)


@bif("gsub")
def _gsub(x, a, b):
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        if x is None:
            return None
        return re.sub(str(_raw_pat(a)), _go_repl(b, _raw_pat(a)), str(x))
    return pc.replace_substring_regex(_s(x), pattern=_raw_pat(a),
                                      replacement=b)


def _go_repl(b, pattern=None) -> str:
    # Miller replacement strings use \1..\9 backrefs; python re.sub
    # uses the same syntax. Backrefs beyond the pattern's group count
    # substitute EMPTY in Go/RE2 (dsl-filter-pattern-action/0016)
    # where python re raises — blank them out up front.
    s = str(b)
    if pattern is not None and "\\" in s:
        try:
            ngroups = re.compile(str(pattern)).groups
        except re.error:
            return s
        s = re.sub(r"\\([1-9])",
                   lambda m: m.group(0) if int(m.group(1)) <= ngroups
                   else "", s)
    return s


bif("matches")(lambda x, p: pc.match_substring_regex(_s(x), _raw_pat(p)))


@bif("contains")
def _contains_bif(x, p):
    """BIF_contains (pkg/bifs/strings.go:201): absent x passes
    through, collections are type errors, scalars coerce to their
    string form (contains("123", 3) is true)."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pc.match_substring(_s(x), _render_scalar(p))
    if x is None:
        return None
    if isinstance(x, (dict, list)) or isinstance(p, (dict, list)):
        return "(error)"
    if p is None:
        return True  # absent substring stringifies to ""
    return _render_scalar(p) in _render_scalar(x)


# 1-up position in codepoints; -1 when not found (BIF_index,
# pkg/bifs/strings.go:176)
@bif("index")
def _index_bif(x, p):
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        if x is None:
            return None
        if isinstance(x, (dict, list)) or isinstance(p, (dict, list)):
            return "(error)"
        i2 = _render_scalar(x).find(
            "" if p is None else _render_scalar(p))
        return i2 + 1 if i2 >= 0 else -1
    return pc.if_else(
        pc.equal(pc.find_substring(_s(x), str(p)), -1),
        pa.scalar(-1, type=pa.int32()),
        pc.add(pc.find_substring(_s(x), str(p)), 1))
bif("starts_with")(lambda x, p: pc.starts_with(_s(x), p))
bif("ends_with")(lambda x, p: pc.ends_with(_s(x), p))
def _render_scalar(v) -> str:
    """Miller mlrval String() for join*/map-key rendering: floats
    honor the process OFMT (MLR_OFMT / --ofmt)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and not v.is_integer() and OFMT:
        return OFMT % v
    return str(v)


@bif("splitax")
def _splitax(x, sep):
    """split to array of strings, no inference (collections.go
    BIF_splitax). Scalar string -> Python list; Arrow column ->
    list<string> column."""
    if isinstance(x, str):
        return x.split(str(sep)) if x != "" else []
    return pc.split_pattern(_s(x), sep)


@bif("joink")
def _joink(x, sep):
    """join map keys (collections.go BIF_joink)."""
    if isinstance(x, dict):
        return str(sep).join(_render_scalar(k) for k in x)
    if isinstance(x, list):
        return str(sep).join(_render_scalar(v) for v in x)
    return pc.binary_join(x, sep)


@bif("joinv")
def _joinv(x, sep):
    """join map/array values (collections.go BIF_joinv)."""
    if isinstance(x, dict):
        return str(sep).join(_render_scalar(v) for v in x.values())
    if isinstance(x, list):
        return str(sep).join(_render_scalar(v) for v in x)
    return pc.binary_join(x, sep)


@bif("joinkv")
def _joinkv(x, ps, fs):
    """join map k=v pairs; arrays join with 1-based index keys
    (collections.go BIF_joinkv; dsl-split-join/0006,0011)."""
    if isinstance(x, dict):
        return str(fs).join(
            f"{_render_scalar(k)}{ps}{_render_scalar(v)}"
            for k, v in x.items())
    if isinstance(x, list):
        return str(fs).join(
            f"{i}{ps}{_render_scalar(v)}"
            for i, v in enumerate(x, 1))
    raise TypeError("joinkv expects a map")
bif("format_values")(lambda x, fmt: pa.array(np.char.mod(fmt, np.asarray(x))))


def _fmtnum_fmt(vals: np.ndarray, fmt: str, m) -> np.ndarray:
    if m:
        ints = vals.astype(np.int64)
        if m.group(1) == "b":
            f2 = fmt.replace("%b", "%s")  # no binary in python %-format
            return np.array([f2 % bin(v)[2:] for v in ints], dtype=object)
        return np.char.mod(fmt, ints)
    return np.char.mod(fmt, vals)


@bif("fmtnum")
def _fmtnum(x, fmt):
    """printf-format a numeric column (bifs/mathlib.go fmtnum).
    Bytes input is a type error (dsl-bytes-ops).
    C length modifiers (ll/l/h) are stripped; int conversions coerce
    float/string input to int64 first (Miller accepts %d on floats);
    non-numeric input yields the error VALUE "(error)"."""
    if isinstance(x, bytes):
        return type_error2("fmtnum", x, fmt)
    if isinstance(x, (dict, list)):
        # fmtnum over a collection formats each value; non-numeric
        # members become the error VALUE (collections recurse;
        # dsl-number-formatting/0005 `$* = fmtnum($*, ...)`)
        def _fmt1(v):
            if isinstance(v, pa.Scalar):
                v = v.as_py()
            if v is None:
                return None
            if isinstance(v, str):
                try:
                    float(v)
                except ValueError:
                    return "(error)"
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                # lift to a 1-row array: the vectorized body needs
                # .to_pandas() (the DSL's scalar-lift wrapper is
                # bypassed when we recurse directly)
                out = _fmtnum(pa.array([v]), fmt)
                return out[0].as_py()
            return _fmtnum(v, fmt)
        if isinstance(x, dict):
            return {k: _fmt1(v) for k, v in x.items()}
        return [_fmt1(v) for v in x]
    import re as _re

    import pandas as _pd

    fmt = _re.sub(r"%([#0\- +]*\d*\.?\d*)(?:ll|l|h)?([dioxXbeEfFgGs])",
                  r"%\1\2", fmt)
    m = _re.search(r"%[#0\- +]*\d*\.?\d*([dioxXb])", fmt)
    raw = _pd.Series(np.asarray(_s(x).to_pandas()))
    nums = _pd.to_numeric(raw, errors="coerce")
    bad = (nums.isna() & raw.notna()).to_numpy()
    vals = nums.fillna(0.0).to_numpy(dtype=np.float64)
    out = _fmtnum_fmt(vals, fmt, m)
    if bad.any():
        res = np.asarray(out, dtype=object)
        res[bad] = "(error)"
        return pa.array(res, type=pa.string())
    return pa.array(out)


@bif("strrev")
def _strrev(x):
    return pc.utf8_reverse(_s(x))





# --- arithmetic / math (pkg/bifs/arithmetic.go, mathlib.go) ----------------

def _int_preserving(fn):
    """ceil/floor/round/roundm are int-preserving (bifs/mathlib.go
    math-unary dispositions: int input stays int)."""
    def wrapped(x, *rest):
        if isinstance(x, (int, np.integer)) and not isinstance(x, bool) \
                and all(isinstance(r2, (int, np.integer)) for r2 in rest):
            out = fn(x, *rest)
            if isinstance(out, (pa.Array, pa.ChunkedArray)):
                return out
            sc = out.as_py() if hasattr(out, "as_py") else out
            return int(sc)
        return fn(x, *rest)
    return wrapped


bif("abs")(lambda x: pc.abs(x))
bif("ceiling")(_int_preserving(lambda x: pc.ceil(_f(x))))
bif("floor")(_int_preserving(lambda x: pc.floor(_f(x))))
bif("round")(_int_preserving(lambda x: pc.round(_f(x), 0)))
bif("roundm")(_int_preserving(
    lambda x, m: pc.multiply(pc.round(pc.divide(_f(x), m), 0), m)))
bif("sgn")(lambda x: pc.sign(x))
bif("exp")(lambda x: pc.exp(_f(x)))
bif("expm1")(lambda x: pa.array(np.expm1(np.asarray(_f(x)))))
bif("log")(lambda x: pc.ln(_f(x)))
bif("log10")(lambda x: pc.log10(_f(x)))
bif("log1p")(lambda x: pc.log1p(_f(x)))
bif("pow")(lambda x, y: pc.power(_f(x), y))
bif("sqrt")(lambda x: pc.sqrt(_f(x)))
bif("cbrt")(lambda x: pa.array(np.cbrt(np.asarray(_f(x)))))
bif("sin")(lambda x: pc.sin(_f(x)))
bif("cos")(lambda x: pc.cos(_f(x)))
bif("tan")(lambda x: pc.tan(_f(x)))
bif("asin")(lambda x: pc.asin(_f(x)))
bif("acos")(lambda x: pc.acos(_f(x)))
bif("atan")(lambda x: pc.atan(_f(x)))
bif("atan2")(lambda y, x: pc.atan2(_f(y), _f(x)))
for _n, _np in [("sinh", np.sinh), ("cosh", np.cosh), ("tanh", np.tanh),
                ("asinh", np.arcsinh), ("acosh", np.arccosh), ("atanh", np.arctanh)]:
    bif(_n)(lambda x, _np=_np: pa.array(_np(np.asarray(_f(x)))))
bif("invqnorm")(lambda x: pa.array(_invqnorm(np.asarray(_f(x)))))
bif("qnorm")(lambda x: pa.array(_qnorm(np.asarray(_f(x)))))
def _is_num_arg(x):
    if hasattr(x, "type"):
        return pa.types.is_integer(x.type) or pa.types.is_floating(x.type)
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def _minmax_coll(v, want_max: bool):
    """min/max folded over a collection's values, recursing into
    nested collections (arithmetic.go bif_min_unary_array /
    BIF_min_within_map_values); empty -> VOID."""
    vals = list(v.values()) if isinstance(v, dict) else list(v)
    best = None
    for x in vals:
        if isinstance(x, (dict, list)):
            x = _minmax_coll(x, want_max)
        if x is None or x == "":
            continue
        if best is None:
            best = x
            continue
        bn, xn = _is_num_arg(best), _is_num_arg(x)
        if bn != xn:
            # numbers sort BELOW strings (mlrval_type.go:82-84)
            if (not xn) if want_max else xn:
                best = x
        else:
            if (x > best) if want_max else (x < best):
                best = x
    return "" if best is None else best


@bif("min")
def _min_fn(*xs):
    """Variadic min under Miller's total order: numbers sort BELOW
    strings (mlrval_type.go:82-84); zero args -> VOID; a single
    map/array arg folds over its values (bif_min_unary)."""
    if not xs:
        return ""
    if len(xs) == 1 and isinstance(xs[0], (dict, list)):
        return _minmax_coll(xs[0], want_max=False)
    nums = [x for x in xs if _is_num_arg(x)]
    strs = [x for x in xs if not _is_num_arg(x)]
    if nums:
        return nums[0] if len(nums) == 1 else pc.min_element_wise(*nums)
    return strs[0] if len(strs) == 1 else pc.min_element_wise(*strs)


@bif("max")
def _max_fn(*xs):
    """Variadic max: strings sort ABOVE numbers; zero args -> VOID;
    a single map/array arg folds over its values."""
    if not xs:
        return ""
    if len(xs) == 1 and isinstance(xs[0], (dict, list)):
        return _minmax_coll(xs[0], want_max=True)
    nums = [x for x in xs if _is_num_arg(x)]
    strs = [x for x in xs if not _is_num_arg(x)]
    if strs:
        return strs[0] if len(strs) == 1 else pc.max_element_wise(*strs)
    return nums[0] if len(nums) == 1 else pc.max_element_wise(*nums)
@bif("int")
def _int_bif(x, base=None):
    """int(x): truncating cast for numbers; prefix-aware string parse
    (0x.., 0b.., and LEADING-ZERO octal like Go). int(str, base)
    parses in the given radix; numbers pass through unchanged
    (dsl-int-function golden fixtures)."""
    b = int(base) if base is not None else 0

    def one(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, (int, np.integer, float, np.floating)):
            # already-numeric values pass through unchanged even with
            # an explicit radix (dsl-int-function/0006: int(345, 8)
            # stays 345; only STRINGS radix-parse)
            return int(v)
        sv = str(v).strip()
        if "_" in sv:
            return "(error)"  # lib/util.go:71 rejects Go's 1_2 form
        try:
            if b == 0 and re.fullmatch(r"[+-]?0\d+", sv):
                return int(sv, 8)
            return int(sv, b)
        except (ValueError, TypeError):
            # no float fallback: string_to_int (bifs/types.go:17) is
            # strconv.ParseInt only, so int("2.3") is the error VALUE
            # (dsl-type-reflect/0001)
            return "(error)"
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        if base is None and (pa.types.is_integer(x.type)
                             or pa.types.is_floating(x.type)):
            return pc.cast(pc.trunc(_f(x)), pa.int64())
        vals = [one(v) for v in x.to_pylist()]
        if any(isinstance(v, str) for v in vals):
            return pa.array([None if v is None else str(v)
                             for v in vals], type=pa.string())
        return pa.array(vals, type=pa.int64())
    return one(x)


@bif("float")
def _float_bif(x):
    """BIF_float (bifs/types.go:167 to_float_dispositions): numbers
    pass as float64; booleans -> 0.0/1.0; strings parse int/float/
    radix-prefixed forms, else the error VALUE; absent passes;
    collections/bytes error (dsl-type-reflect/0001)."""
    if x is None:
        return None
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return _f(x)
    if isinstance(x, (dict, list, bytes)):
        return "(error)"
    if isinstance(x, (bool, np.bool_)):
        return 1.0 if x else 0.0
    if isinstance(x, (int, np.integer, float, np.floating)):
        return float(x)
    s = str(x)
    try:
        return float(int(s, 0))
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return "(error)"
@bif("string")
def _string(x):
    """Cast to string (bifs/types.go BIF_string); scalar floats render
    through OFMT when set (mlrval String() honors --ofmt)."""
    if x is None:
        return "(absent)"
    if isinstance(x, bytes):
        # reinterpret raw bytes as text (strings.go:25 BIF_string);
        # invalid UTF-8 survives as raw bytes (surrogateescape), the
        # same way Miller's own JSON writer emits them verbatim
        return x.decode("utf-8", errors="surrogateescape")
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, float):
        if x.is_integer() and abs(x) < 1e15:
            return str(int(x))
        return (OFMT % x) if OFMT else str(x)
    if isinstance(x, (int, str)):
        return str(x)
    if isinstance(x, (dict, list)):
        # string() of a collection JSON-encodes it vertically
        # (mlrval String(); mapvars-in-scalar-function-call-contexts)
        from miller_ray import dsl as _dsl

        return _dsl._mlr_json(x, ofmt=OFMT)
    return _s(x)
@bif("boolean")
def _boolean_bif(x):
    """BIF_boolean (bifs/types.go:213): ints/floats -> nonzero test;
    only the literal strings "true"/"false" parse; anything else is
    the error VALUE (dsl-type-reflect/0001)."""
    if x is None:
        return None
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pc.cast(x, pa.bool_())
    if isinstance(x, (bool, np.bool_)):
        return bool(x)
    if isinstance(x, (int, np.integer)):
        return x != 0
    if isinstance(x, (float, np.floating)):
        return x != 0.0
    if x == "true":
        return True
    if x == "false":
        return False
    return "(error)"
@bif("hexfmt")
def _hexfmt(x):
    """hexfmt: INTS render as hex (negatives as 64-bit two's
    complement); floats and strings pass through unchanged
    (dsl-number-formatting golden cases)."""
    t = x.type if hasattr(x, "type") else pa.array([x]).type
    if not pa.types.is_integer(t):
        return _s(x)
    return pa.array(["0x%x" % (int(v) & 0xFFFFFFFFFFFFFFFF)
                     for v in np.asarray(x)])
@bif("bitcount")
def _bitcount(x):
    """popcount of int values; non-int input is the error VALUE
    (bifs/bits.go BIF_bitcount int-only dispositions)."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)) and not \
            pa.types.is_integer(x.type):
        return pa.array(["(error)"] * len(x), type=pa.string())
    if isinstance(x, float) and not float(x).is_integer():
        return "(error)"
    return pa.array(np.array(
        [bin(int(v) & 0xFFFFFFFFFFFFFFFF).count("1")
         for v in np.asarray(x)], dtype=np.int64))
def _mod_arr(m):
    if hasattr(m, "to_numpy"):
        return m.to_numpy(zero_copy_only=False).astype(np.int64)
    if hasattr(m, "combine_chunks"):
        return m.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    return np.int64(m)


def _np_i64(x):
    if hasattr(x, "combine_chunks"):
        x = x.combine_chunks()
    if hasattr(x, "to_numpy"):
        return x.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.asarray(x, dtype=np.int64)


bif("madd")(lambda a, b, m: pc.cast(pa.array(
    (_np_i64(a) + _np_i64(b)) % _mod_arr(m)), pa.int64()))
bif("urand_range_like")(lambda x: (_ for _ in ()).throw(
    NotImplementedError("random functions are not deterministic; use "
                        "miller_ray.hashing for seeded per-row values")))


def _qnorm(x):
    """Standard normal CDF via erf (bifs/mathlib.go qnorm)."""
    from math import sqrt

    try:
        from scipy.special import erf  # pragma: no cover
        return 0.5 * (1 + erf(x / sqrt(2)))
    except ImportError:
        import math

        return np.vectorize(lambda v: 0.5 * (1 + math.erf(v / math.sqrt(2))))(x)


def _invqnorm(p):
    """Acklam's inverse-normal approximation (reference implements the
    same algorithm, bifs/mathlib.go invqnorm)."""
    p = np.asarray(p, dtype=np.float64)
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    out = np.full_like(p, np.nan)
    plow, phigh = 0.02425, 1 - 0.02425
    lo = (p > 0) & (p < plow)
    q = np.sqrt(-2 * np.log(p[lo]))
    out[lo] = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
               / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    mid = (p >= plow) & (p <= phigh)
    q = p[mid] - 0.5
    r = q * q
    out[mid] = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q
                / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1))
    hi = (p > phigh) & (p < 1)
    q = np.sqrt(-2 * np.log(1 - p[hi]))
    out[hi] = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
                / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    return out


# --- datetime (pkg/bifs/datetime.go) ---------------------------------------

def _sec2gmt_impl(x, decimals=0, date_only=False):
    """Truncating epoch->ISO conversion (sec2gmt.go): fractional input
    floors to the second; optional decimals render TRUNCATED
    fractional-second digits."""
    if hasattr(decimals, "type") or isinstance(decimals, (pa.Array,
                                                          pa.ChunkedArray)):
        # per-row decimals (sec2gmt($s, $d)): scalar loop
        xs = np.asarray(_f(x), dtype=np.float64)
        ds_ = pc.cast(decimals, pa.int64()).to_pylist()
        return pa.array([_sec2gmt_one(v2, 0 if d2 is None else int(d2),
                                      date_only)
                         for v2, d2 in zip(xs, ds_)], type=pa.string())
    xf = np.asarray(_f(x), dtype=np.float64)
    secs = np.floor(xf)
    ts = pc.cast(pa.array(secs.astype(np.int64)), pa.timestamp("s"))
    if date_only:
        return pc.strftime(ts, format="%Y-%m-%d")
    base = pc.strftime(ts, format="%Y-%m-%dT%H:%M:%S")
    d = int(decimals)
    if d > 0:
        fr = np.floor((xf - secs) * 10 ** d).astype(np.int64)
        fs = np.char.zfill(fr.astype(str), d)
        out = pc.binary_join_element_wise(base, pa.array(fs), ".")
        return pc.binary_join_element_wise(out, pa.array([""] * len(xf)), "Z")
    return pc.binary_join_element_wise(base, pa.array([""] * len(xf)), "Z")


@bif("sec2gmt")
def _sec2gmt_bif(x, decimals=0):
    return _sec2gmt_impl(x, decimals)


bif("sec2gmtdate")(lambda x: _sec2gmt_impl(x, date_only=True))
def _gmt2sec_parts(x):
    """(whole seconds int64, fractional float64, bad mask) for ISO
    strings; ".Z" with EMPTY fractional digits is the Miller error
    value (dsl-gmt-date-time-functions/0005)."""
    import pandas as _pd

    ser = _pd.Series(np.asarray(_s(x).to_pandas())).astype(str)
    parts = ser.str.extract(r"^(.*T\d\d:\d\d:\d\d)(?:\.(\d*))?Z$")
    bad = (ser.str.contains(r"\.Z$", regex=True)
           | parts[0].isna()).to_numpy()
    base = parts[0].fillna("1970-01-01T00:00:00")
    secs = pc.cast(pc.cast(pc.strptime(
        pa.array(base + "Z"), format="%Y-%m-%dT%H:%M:%SZ", unit="s"),
        pa.int64()), pa.int64()).to_numpy(zero_copy_only=False)
    frac = parts[1].map(lambda d: float("0." + d) if isinstance(d, str)
                        and d else 0.0).to_numpy(dtype=np.float64)
    has_frac = bool((frac > 0).any())
    return secs, frac, bad, has_frac


@bif("gmt2sec")
def _gmt2sec(x):
    secs, frac, bad, has_frac = _gmt2sec_parts(x)
    if bad.any():
        out = np.array(["%.8f" % (s + f) for s, f in zip(secs, frac)],
                       dtype=object)
        out[bad] = "(error)"
        return pa.array(out, type=pa.string())
    # gmt2sec is FLOAT-typed always (bif_strptime_unary_aux:501
    # returns FromFloat even for whole seconds)
    return pa.array(secs.astype(np.float64) + frac)
# Miller strftime fractional-second extension table
# (bifs/datetime.go:404-440 appender1..appender9 — note the %8S quirk:
# NINE digits with quotient 10, exactly as the reference ships it)
_STRFTIME_FRACS = {1: (1, 100000000), 2: (2, 10000000), 3: (3, 1000000),
                   4: (4, 100000), 5: (5, 10000), 6: (6, 1000),
                   7: (7, 100), 8: (9, 10), 9: (9, 1)}
_STRFTIME_EXT_RE = None


def _mlr_strftime_one(dt, fmt: str, secs: int, nanos: int) -> str:
    """One strftime render with Miller's extensions: %nS (truncated
    fractional seconds), %N (9-digit nanos), %O (bare nanos), %s
    (epoch seconds); everything else via the platform strftime
    (bifs/datetime.go strftimeHelper + init() specification set)."""
    out = []
    i, L = 0, len(fmt)
    while i < L:
        c = fmt[i]
        if c == "%" and i + 1 < L:
            d = fmt[i + 1]
            if d in "123456789" and i + 2 < L and fmt[i + 2] == "S":
                nd, quot = _STRFTIME_FRACS[int(d)]
                out.append("%02d.%0*d" % (dt.second, nd, nanos // quot))
                i += 3
                continue
            if d == "N":
                out.append("%09d" % nanos)
                i += 2
                continue
            if d == "O":
                out.append("%d" % nanos)
                i += 2
                continue
            if d == "s":
                out.append(str(secs))
                i += 2
                continue
            out.append(dt.strftime("%" + d))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _strftime_gmt_one(x: float, fmt: str) -> str:
    import math as _math
    from datetime import datetime, timezone

    secs = _math.floor(float(x))
    nanos = int((float(x) - secs) * 1e9)
    dt = datetime.fromtimestamp(secs, tz=timezone.utc)
    return _mlr_strftime_one(dt, fmt, secs, nanos)


@bif("strftime")
def _strftime_bif(x, fmt):
    """strftime: epoch FLOAT seconds -> formatted GMT string
    (bifs/datetime.go BIF_strftime; always UTC regardless of --tz).
    Fractional seconds floor to the second; %nS/%N/%O/%s extensions."""
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        x = pa.array([x])
        return _strftime_bif(_f(x), fmt)[0].as_py()
    xf = _f(x)  # ArrowInvalid on non-numeric -> caller disposition
    if not re.search(r"%([1-9]S|[NOsZz])", fmt):
        # fast vectorized path for plain directives
        secs = np.floor(np.asarray(xf, dtype=np.float64)).astype(np.int64)
        return pc.strftime(pc.cast(pa.array(secs), pa.timestamp("s")),
                           format=fmt)
    return pa.array([None if v is None else _strftime_gmt_one(v, fmt)
                     for v in xf.to_pylist()], type=pa.string())
@bif("strptime")
def _strptime(x, fmt):
    """strptime -> epoch seconds; unparseable values yield the Miller
    error VALUE instead of aborting the batch."""
    import pandas as _pd

    # pandas %-directives match Go's strptime for the common cases
    import re as _re

    # C/Go composite directives pandas lacks
    fmt = (fmt.replace("%F", "%Y-%m-%d").replace("%T", "%H:%M:%S")
              .replace("%D", "%m/%d/%y").replace("%R", "%H:%M")
              .replace("%r", "%I:%M:%S %p"))
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        # literal/scalar argument (sequential-interpreter mode)
        one = _strptime(pa.array([x], type=pa.string()), fmt)
        return one[0].as_py()
    ser = _pd.Series(np.asarray(_s(x).to_pandas()))
    try:
        dt = _pd.to_datetime(ser, format=fmt, errors="coerce", utc=True)
    except ValueError:
        # directive unsupported by the C library (e.g. bare %U):
        # Miller's strptime yields the error VALUE (lib/time.go)
        return pa.array(["(error)"] * len(ser), type=pa.string())
    bad = dt.isna().to_numpy()
    frac = np.zeros(len(ser), dtype=np.float64)
    if bad.any():
        # Go's strptime tolerates fractional seconds attached to %S
        # and zone NAMES for %Z (applied with zero offset); pandas
        # needs them stripped (empty ".Z" stays an error)
        work_fmt = fmt
        ser2 = ser
        if "%Z" in work_fmt:
            work_fmt = _re.sub(r"\s*%Z", "", work_fmt)
            ser2 = ser2.str.replace(r"\s*[A-Za-z][A-Za-z0-9_/]*\s*$",
                                    "", regex=True)
        fr = ser2.str.extract(r"(?<=\d)\.(\d+)")[0]
        cleaned = ser2.str.replace(r"(?<=\d)\.\d+", "", n=1, regex=True)
        try:
            dt2 = _pd.to_datetime(cleaned, format=work_fmt,
                                  errors="coerce", utc=True)
        except ValueError:
            dt2 = None
        if dt2 is not None:
            retry = bad & dt2.notna().to_numpy()
            if retry.any():
                dt[retry] = dt2[retry]
                frac[retry] = fr[retry].map(
                    lambda d: float("0." + d)
                    if isinstance(d, str) else 0.0).to_numpy()
                bad = dt.isna().to_numpy()
    secs = ((dt - _pd.Timestamp(0, tz="UTC")).dt.total_seconds()
            .fillna(0.0).to_numpy()) + frac
    if bad.any():
        out = np.where(frac > 0, ["%.8f" % v for v in secs],
                       secs.astype(np.int64).astype(str)).astype(object)
        out[bad] = "(error)"
        return pa.array(out, type=pa.string())
    # reference strptime is FLOAT-typed always (datetime.go:501)
    return pa.array(secs)
@bif("dhms2sec")
def _dhms2sec_bif(x):
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array(np.array([_dhms2sec(v) for v in np.asarray(_s(x))],
                                 dtype=np.int64))
    # scalar: strict unit parse; unitless or empty input is the error
    # VALUE (lib/time.go; dsl-gmt-date-time-functions/0021). Repeated
    # units sum (1h2h = 3h).
    if x is None:
        return None
    s = str(x)
    sign = -1 if s.startswith("-") else 1
    body = s.lstrip("+-")
    toks = re.findall(r"(\d+(?:\.\d+)?)([dhms])", body)
    if not toks or "".join(n + u for n, u in toks) != body:
        return "(error)"
    mult = {"d": 86400, "h": 3600, "m": 60, "s": 1}
    total = sum(float(n) * mult[u] for n, u in toks)
    total *= sign
    return int(total) if float(total).is_integer() else total


def _dhms2sec(s: str) -> float:
    import re

    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("+-")
    m = re.fullmatch(
        r"(?:(\d+)d)?(?:(\d+)h)?(?:(\d+)m)?(?:(\d+(?:\.\d+)?)s)?", s)
    if not m:
        return 0
    d, h, mi = (int(g) if g else 0 for g in m.groups()[:3])
    se = float(m.group(4)) if m.group(4) else 0.0
    return sign * (((d * 24 + h) * 60 + mi) * 60 + se)


@bif("sec2dhms")
def _sec2dhms(x):
    vals = np.asarray(x, dtype=np.int64)
    out = []
    for v0 in vals:
        sign = "-" if v0 < 0 else ""
        v = abs(int(v0))
        d, r = divmod(v, 86400)
        h, r = divmod(r, 3600)
        m, s = divmod(r, 60)
        body = (f"{d}d{h:02d}h{m:02d}m{s:02d}s" if d else
                (f"{h}h{m:02d}m{s:02d}s" if h else
                 (f"{m}m{s:02d}s" if m else f"{s}s")))
        out.append(sign + body)
    return pa.array(out)


@bif("fsec2dhms")
def _fsec2dhms(x):
    out = []
    for v0 in np.asarray(_f(x), dtype=np.float64):
        sign = "-" if v0 < 0 else ""
        v = abs(float(v0))
        iv = int(v)
        d, r = divmod(iv, 86400)
        h, r = divmod(r, 3600)
        m = r // 60
        s = v % 60
        body = (f"{d}d{h:02d}h{m:02d}m{s:09.6f}s" if d else
                (f"{h}h{m:02d}m{s:09.6f}s" if h else
                 (f"{m}m{s:09.6f}s" if m else f"{s:.6f}s")))
        out.append(sign + body)
    return pa.array(out)


# --- hashing (pkg/bifs/hashing.go:25-45) -----------------------------------

def _digest(algo):
    def h(x):
        if isinstance(x, bytes):  # bytes hash their raw content
            return getattr(hashlib, algo)(x).hexdigest()
        return pa.array([getattr(hashlib, algo)(
            ("" if v is None else str(v)).encode()).hexdigest()
            for v in _s(x).to_pylist()])

    return h


bif("md5")(_digest("md5"))
bif("sha1")(_digest("sha1"))
bif("sha256")(_digest("sha256"))
bif("sha512")(_digest("sha512"))


@bif("crc32")
def _crc32(x):
    import zlib

    return pa.array(np.array([zlib.crc32(str(v).encode())
                              for v in _s(x).to_pylist()], dtype=np.int64))


# --- base64 / hex (pkg/bifs/base64.go) -------------------------------------

@bif("base64_encode")
def _b64e(x):
    import base64

    if isinstance(x, bytes):
        return base64.b64encode(x).decode()
    if isinstance(x, str):
        return base64.b64encode(
            x.encode("utf-8", errors="surrogateescape")).decode()
    return pa.array([base64.b64encode(str(v).encode()).decode()
                     for v in _s(x).to_pylist()])


def _b64_strict(v: str) -> bytes:
    """Go's encoding/base64 StdEncoding: padded, strict length; its
    error text ("illegal base64 data at input byte N") is part of the
    conformance surface."""
    import base64
    import binascii

    if len(v) % 4 != 0:
        raise ValueError(f"illegal base64 data at input byte "
                         f"{len(v) - len(v) % 4}")
    try:
        return base64.b64decode(v, validate=True)
    except binascii.Error:
        bad = next((i for i, c in enumerate(v)
                    if not (c.isalnum() or c in "+/=")), 0)
        raise ValueError(f"illegal base64 data at input byte {bad}")


@bif("base64_decode")
def _b64d(x):
    if isinstance(x, (str, bytes)):
        try:
            return _b64_strict(x if isinstance(x, str)
                               else x.decode("ascii"))
        except ValueError as e:
            return MlrError(str(e))
    return pa.array([_b64_strict(str(v)).decode()
                     for v in _s(x).to_pylist()])


# --- round-2 additions: strings, padding, regex, time, modular, math -------

bif("ceil")(_int_preserving(lambda x: pc.ceil(_f(x))))  # alias of ceiling
@bif("length")
def _length(x):
    """Collection size: map -> #keys, array -> #elements, scalar -> 1
    (bifs/collections.go). Python dict/list appear as per-row constant
    literals; Arrow list columns use the vectorized kernel."""
    if isinstance(x, (dict, list)):
        return len(x)
    if isinstance(x, (pa.Array, pa.ChunkedArray)) and (
            pa.types.is_list(x.type) or pa.types.is_large_list(x.type)):
        return pc.list_value_length(x)
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array(np.ones(len(x), dtype=np.int64))
    if x is None:
        return 0  # length(absent) = 0 (BIF_length absent row)
    return 1
bif("gssub")(lambda x, a, b: pc.replace_substring(_s(x), pattern=a, replacement=b))
def _pad_str(p):
    """Pad arg may arrive numerically inferred (leftpad($i, 5, 0));
    Miller pads with its string form (bifs/strings.go BIF_leftpad)."""
    if isinstance(p, float) and p.is_integer():
        return str(int(p))
    return str(p)


def _pad(x, n, p, left: bool):
    """leftpad/rightpad (bifs/strings.go): single-char pads fill to
    width; multi-char pads repeat in WHOLE units only (leftpad("pan",
    10, "XY") -> "XYXYXYpan", len 9 — dsl-leftpad-rightpad/L005)."""
    n, p = int(n), _pad_str(p)
    s = _s(x)
    if len(p) <= 1:
        fn = pc.utf8_lpad if left else pc.utf8_rpad
        return fn(s, width=n, padding=p or " ")

    def one(v):
        if v is None:
            return None
        reps = max(0, (n - len(v)) // len(p))
        return p * reps + v if left else v + p * reps
    if isinstance(s, (pa.Array, pa.ChunkedArray)):
        return pa.array([one(v) for v in s.to_pylist()], type=pa.string())
    return one(str(s))


bif("leftpad")(lambda x, n, p: _pad(x, n, p, True))
bif("rightpad")(lambda x, n, p: _pad(x, n, p, False))
@bif("strmatch")
def _strmatch(x, p):
    """Boolean regex match (bifs/strings.go BIF_strmatch); an absent
    operand is the error VALUE (dsl-match/0002)."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pc.match_substring_regex(_s(x), p)
    if x is None or p is None:
        return "(error)"
    return bool(re.search(str(p), str(x)))
bif("format_values_like")(lambda x: x)


@bif("regextract")
def _regextract(x, p):
    """First regex match per value; no match -> absent (the field is
    not assigned — observable in test/cases/dsl-filter-pattern-action
    0051/0053)."""
    import pandas as pd

    s = pd.Series(_s(x).to_pandas()).str.extract("(" + p + ")")[0]
    return pa.array(s, type=pa.string())


@bif("regextract_or_else")
def _regextract_or_else(x, p, dflt):
    import pandas as pd

    s = pd.Series(_s(x).to_pandas()).str.extract("(" + p + ")")[0]
    return pa.array(s.where(s.notna(), str(dflt)), type=pa.string())


@bif("hex_encode")
def _hexe(x):
    if isinstance(x, bytes):
        return x.hex()
    if isinstance(x, str):
        return x.encode("utf-8", errors="surrogateescape").hex()
    return pa.array([str(v).encode().hex() for v in _s(x).to_pylist()])


@bif("hex_decode")
def _hexd(x):
    if isinstance(x, (str, bytes)):
        v = x if isinstance(x, str) else x.decode("ascii")
        try:
            return bytes.fromhex(v)
        except ValueError:
            bad = next((c for c in v
                        if c not in "0123456789abcdefABCDEF"), "?")
            return MlrError(f"encoding/hex: invalid byte: "
                            f"U+{ord(bad):04X} {bad!r}")
    return pa.array([bytes.fromhex(str(v)).decode()
                     for v in _s(x).to_pylist()])
# (latin1_to_utf8 / utf8_to_latin1 are defined once near the top of
# this module with byte-faithful surrogateescape semantics)

# time scale conversions (bifs/datetime.go)
@bif("gmt2nsec")
def _gmt2nsec(x):
    secs, frac, bad, has_frac = _gmt2sec_parts(x)
    ns = secs * 1_000_000_000 + np.round(frac * 1e9).astype(np.int64)
    if bad.any():
        out = ns.astype(str).astype(object)
        out[bad] = "(error)"
        return pa.array(out, type=pa.string())
    return pa.array(ns)


def _as_f64(x) -> np.ndarray:
    """float64 view without Arrow's 2^53 safe-cast refusal (big ns
    counts are fine at second precision)."""
    if hasattr(x, "to_numpy"):
        return x.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.asarray(x, dtype=np.float64)


def _sec2gmt_one(xf: float, d: int, date_only: bool = False) -> str:
    import math as _math
    from datetime import datetime, timezone

    secs = _math.floor(float(xf))
    dt = datetime.fromtimestamp(secs, tz=timezone.utc)
    if date_only:
        return dt.strftime("%Y-%m-%d")
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if d > 0:
        fr = int(_math.floor((float(xf) - secs) * 10 ** d))
        return f"{base}.{str(fr).zfill(d)}Z"
    return base + "Z"


def _nsec2gmt_one(n: int, d: int) -> str:
    # exact int nanosecond math — no float round-trip
    from datetime import datetime, timezone

    n = int(n)
    secs = n // 10 ** 9
    rem = n - secs * 10 ** 9
    base = datetime.fromtimestamp(secs, tz=timezone.utc) \
        .strftime("%Y-%m-%dT%H:%M:%S")
    if d > 0:
        fr = rem // 10 ** (9 - d) if d <= 9 else rem * 10 ** (d - 9)
        return f"{base}.{str(fr).zfill(d)}Z"
    return base + "Z"


def _ns_list(x):
    # int64-exact nanosecond extraction: avoid the float64 round-trip
    # for already-integer columns (1.23e18 ns loses precision as float)
    if pa.types.is_integer(x.type):
        return x.to_pylist()
    return pc.cast(_f(x), pa.int64()).to_pylist()


@bif("nsec2gmt")
def _nsec2gmt(x, decimals=0):
    if hasattr(decimals, "type") or isinstance(decimals, (pa.Array,
                                                          pa.ChunkedArray)):
        ns = _ns_list(x) if isinstance(x, (pa.Array, pa.ChunkedArray)) \
            else [int(x)]
        ds_ = pc.cast(decimals, pa.int64()).to_pylist()
        return pa.array([_nsec2gmt_one(n2, 0 if d2 is None else int(d2))
                         for n2, d2 in zip(ns, ds_)], type=pa.string())
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array([_nsec2gmt_one(n2, int(decimals))
                         for n2 in _ns_list(x)], type=pa.string())
    return _nsec2gmt_one(int(x), int(decimals))


@bif("nsec2gmtdate")
def _nsec2gmtdate(x):
    return _sec2gmt_impl(pa.array(_as_f64(x) / 1e9), date_only=True)
def _hms_str(v: int) -> str:
    sign = "-" if v < 0 else ""
    v = abs(int(v))
    return "%s%02d:%02d:%02d" % (sign, v // 3600, (v % 3600) // 60, v % 60)


bif("sec2hms")(lambda x: pa.array(
    [_hms_str(v) for v in np.asarray(_f(x)).astype(np.int64)]))
def _hms2num(v: str, cast):
    s = str(v)
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("+-")
    return sign * sum(cast(p_) * m for p_, m in
                      zip(s.split(":")[::-1], (1, 60, 3600)))


bif("hms2sec")(lambda x: pa.array(np.array(
    [_hms2num(v, int) for v in _s(x).to_pylist()], dtype=np.int64)))
def _fhms_str(v: float) -> str:
    sign = "-" if v < 0 else ""
    v = abs(float(v))
    iv = int(v)
    return "%s%02d:%02d:%09.6f" % (sign, iv // 3600, (iv % 3600) // 60,
                                   v % 60)


bif("fsec2hms")(lambda x: pa.array(
    [_fhms_str(v) for v in np.asarray(_f(x), dtype=np.float64)]))
bif("hms2fsec")(lambda x: pa.array(np.array(
    [_hms2num(v, float) for v in _s(x).to_pylist()], dtype=np.float64)))
bif("dhms2fsec")(lambda x: pa.array(np.array(
    [_dhms2sec(str(v)) for v in _s(x).to_pylist()], dtype=np.float64)))

# modular arithmetic (bifs/arithmetic.go mexp/mmul/msub)
bif("mmul")(lambda a, b, m: pa.array((_np_i64(a) * _np_i64(b)) % _mod_arr(m)))
bif("msub")(lambda a, b, m: pa.array((_np_i64(a) - _np_i64(b)) % _mod_arr(m)))


@bif("mexp")
def _mexp(a, b, m):
    av = _np_i64(a)
    bv = _np_i64(b)
    mv = _mod_arr(m)
    bv = np.broadcast_to(bv, av.shape) if bv.ndim else np.full(av.shape, bv)
    mv = np.broadcast_to(mv, av.shape) if getattr(mv, "ndim", 0) else \
        np.full(av.shape, mv)
    out: list = []
    errs = False
    for v, e, md in zip(av, bv, mv):
        if e < 0:  # negative exponent -> Miller error value
            out.append("(error)")
            errs = True
        else:
            out.append(pow(int(v), int(e), int(md)))
    if errs:
        return pa.array([str(x) for x in out], type=pa.string())
    return pa.array(np.array(out, dtype=np.int64))


def _erf_vec(x):
    import math

    return np.vectorize(math.erf)(np.asarray(x, dtype=np.float64))


bif("erf")(lambda x: pa.array(_erf_vec(_f(x))))
bif("erfc")(lambda x: pa.array(1.0 - _erf_vec(_f(x))))
bif("fmtifnum")(lambda x, fmt: _fmtifnum_impl(x, fmt))


def _fmtifnum_impl(x, fmt):
    """printf-format numeric values, pass strings through (fmtifnum)."""
    if hasattr(x, "type") and (pa.types.is_integer(x.type)
                               or pa.types.is_floating(x.type)):
        return _fmtnum(x, fmt)
    return x


# --- types (pkg/bifs/types.go) ---------------------------------------------

bif("is_null")(lambda x: pc.is_null(x))
bif("is_not_null")(lambda x: pc.is_valid(x))
bif("is_absent")(lambda x: pc.is_null(x))
bif("is_present")(lambda x: pc.is_valid(x))


def _type_pred(check):
    def f(x):
        t = x.type if hasattr(x, "type") else pa.array([x]).type
        n = len(x) if hasattr(x, "__len__") else 1
        return pa.array([check(t)] * n, type=pa.bool_())

    return f


bif("is_int")(_type_pred(pa.types.is_integer))
bif("is_float")(_type_pred(pa.types.is_floating))
bif("is_string")(_type_pred(lambda t: pa.types.is_string(t)
                            or pa.types.is_large_string(t)))
bif("is_bool")(_type_pred(pa.types.is_boolean))
bif("is_boolean")(_type_pred(pa.types.is_boolean))
bif("is_array")(_type_pred(lambda t: pa.types.is_list(t)
                           or pa.types.is_fixed_size_list(t)))
bif("is_not_array")(_type_pred(lambda t: not (pa.types.is_list(t)
                                              or pa.types.is_fixed_size_list(t))))
bif("is_map")(_type_pred(pa.types.is_struct))
bif("is_not_map")(_type_pred(lambda t: not pa.types.is_struct(t)))
bif("is_nan")(lambda x: pc.is_nan(_f(x)))


class MlrError(str):
    """An error mlrval: compares/renders as "(error)" everywhere the
    engine already handles that sentinel, but carries the reference's
    error MESSAGE for surfaces that print it (repl, dump)."""

    def __new__(cls, msg: str):
        o = super().__new__(cls, "(error)")
        o.msg = msg
        return o


def _errval_render(v) -> str:
    """Value rendering inside Miller error messages (mlrval String()
    with strings re-quoted): bytes → hex, strings → quoted."""
    import json as _json

    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return _json.dumps(v, ensure_ascii=False)
    return str(v)


def _mlr_typename(v) -> str:
    if v is None:
        return "absent"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, bytes):
        return "bytes"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, dict):
        return "map"
    if isinstance(v, list):
        return "array"
    return "string"


def type_error2(op: str, a, b) -> "MlrError":
    """Binary type-error message (mlrval FromTypeErrorBinary):
    `{op}: unacceptable types {t1}, {t2} with values {v1}, {v2}`."""
    return MlrError(f"{op}: unacceptable types {_mlr_typename(a)}, "
                    f"{_mlr_typename(b)} with values "
                    f"{_errval_render(a)}, {_errval_render(b)}")


def type_error1(op: str, a) -> "MlrError":
    return MlrError(f"{op}: unacceptable type {_mlr_typename(a)} "
                    f"with value {_errval_render(a)}")


@bif("bytes")
def _bytes_bif(x):
    """BIF_bytes (bifs/types.go:240): string/void → bytes; other
    scalar and collection types are type errors; absent passes."""
    if x is None:
        return None
    if isinstance(x, bytes):
        return x
    if isinstance(x, str):
        return x.encode("utf-8", errors="surrogateescape")
    return type_error1("bytes", x)


bif("is_bytes")(lambda x: isinstance(x, bytes))


@bif("asserting_bytes")
def _asserting_bytes(x):
    if not isinstance(x, bytes):
        raise FatalError(f"mlr: asserting_bytes failed on {x!r}")
    return x


_SPARK_TICKS = "▁▂▃▄▅▆▇█"


@bif("sparkline")
def _sparkline_bif(coll):
    """BIF_sparkline (bifs/sparkline.go): one block glyph per element
    scaled to the collection's min/max; VOID on empty, error for
    non-collections or non-numeric elements."""
    fb = _check_coll(coll)
    if fb is not None:
        return fb[1]
    vals = list(coll.values()) if isinstance(coll, dict) else coll
    try:
        fv = [float(v) for v in vals]
    except (TypeError, ValueError):
        return "(error)"
    if not fv:
        return ""
    lo, hi = min(fv), max(fv)
    n = len(_SPARK_TICKS)
    out = []
    for v in fv:
        if hi == lo:
            out.append(_SPARK_TICKS[0])
            continue
        i = int((n - 1) * (v - lo) / (hi - lo) + 0.5)
        out.append(_SPARK_TICKS[min(max(i, 0), n - 1)])
    return "".join(out)
bif("is_empty")(lambda x: pc.equal(_s(x), ""))
bif("is_not_empty")(lambda x: pc.not_equal(_s(x), ""))
# number-shaped per Miller's scanner incl. hex/octal/binary int forms
# (pkg/mlrval/mlrval_infer.go:110-125)
_NUM_RE = (r"^[+-]?((\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"
           r"|0[xX][0-9a-fA-F]+|0[bB][01]+|0[oO][0-7]+)$")
bif("is_numeric")(lambda x: pc.match_substring_regex(_s(x), _NUM_RE))


@bif("typeof")
def _typeof(x):
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        # scalar (sequential-interpreter) mlrval type names
        # (mlrval_type.go)
        if x is None:
            return "absent"
        if isinstance(x, _MlrNull):
            return "null"
        if isinstance(x, tuple) and len(x) in (3, 4, 5) \
                and x[0] == "\x00funcval":
            return "funct"
        if isinstance(x, bool):
            return "bool"
        if isinstance(x, bytes):
            return "bytes"
        if isinstance(x, (int, np.integer)):
            return "int"
        if isinstance(x, (float, np.floating)):
            return "float"
        if isinstance(x, dict):
            return "map"
        if isinstance(x, list):
            return "array"
        if x == "":
            return "empty"
        if x == "(error)":
            return "error"
        return "string"
    t = x.type if hasattr(x, "type") else pa.array(x).type
    if pa.types.is_integer(t):
        name = "int"
    elif pa.types.is_floating(t):
        name = "float"
    elif pa.types.is_boolean(t):
        name = "bool"
    elif pa.types.is_string(t):
        name = "string"
    elif pa.types.is_list(t) or pa.types.is_fixed_size_list(t):
        name = "array"
    else:
        name = "map"
    n = len(x)
    return pa.array([name] * n)


# --- round-3: collection builtins over map/array values --------------------
# (pkg/bifs/collections.go; scalar dict/list values flow through the DSL
# sequential interpreter — these are per-record Python-object kernels,
# used by UDFs/HOFs/for-loops, never in the vectorized hot path)

def _infer_str(s: str):
    """Miller scanner inference for split* variants without the x
    suffix (pkg/mlrval/mlrval_infer.go): decimal/hex/binary ints,
    floats; everything else stays a string."""
    if not isinstance(s, str):
        return s
    if re.fullmatch(r"[+-]?0\d+", s):
        return s  # leading-zero decimals stay strings (zip codes)
    if re.fullmatch(r"[+-]?(0[xX][0-9a-fA-F]+|0[bB][01]+|\d+)", s):
        try:
            return int(s, 0)
        except ValueError:
            return s
    if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s):
        try:
            return float(s)
        except ValueError:
            return s
    return s


@bif("splita")
def _splita(x, sep):
    if not isinstance(x, str):
        x = _render_scalar(x)
    return [_infer_str(p) for p in x.split(str(sep))] if x != "" else []


@bif("splitnv")
def _splitnv(x, sep):
    if not isinstance(x, str):
        x = _render_scalar(x)
    parts = x.split(str(sep)) if x != "" else []
    return {str(i): _infer_str(p) for i, p in enumerate(parts, 1)}


@bif("splitnvx")
def _splitnvx(x, sep):
    if not isinstance(x, str):
        x = _render_scalar(x)
    parts = x.split(str(sep)) if x != "" else []
    return {str(i): p for i, p in enumerate(parts, 1)}


def _splitkv_impl(x, ps, fs, infer):
    out = {}
    for i, pair in enumerate((x.split(str(fs)) if x != "" else []), 1):
        k, sep, v = pair.partition(str(ps))
        if not sep:  # no pair separator: positional key, whole piece
            k, v = str(i), pair
        out[k] = _infer_str(v) if infer else v
    return out


@bif("splitkv")
def _splitkv(x, ps, fs):
    if not isinstance(x, str):
        x = _render_scalar(x)
    return _splitkv_impl(x, ps, fs, True)


@bif("splitkvx")
def _splitkvx(x, ps, fs):
    if not isinstance(x, str):
        x = _render_scalar(x)
    return _splitkv_impl(x, ps, fs, False)


@bif("mapsum")
def _mapsum(*maps):
    out = {}
    for m in maps:
        if m is None:
            continue
        if not isinstance(m, dict):
            raise TypeError("mapsum expects maps")
        out.update(m)
    return out


@bif("mapdiff")
def _mapdiff(*maps):
    if not maps:
        return {}  # mapdiff() with no args is the empty map (bifs/collections.go)
    if not isinstance(maps[0], dict):
        raise TypeError("mapdiff expects maps")
    out = dict(maps[0])
    for m in maps[1:]:
        if isinstance(m, dict):
            for k in m:
                out.pop(k, None)
    return out


def _keylist(args):
    keys = []
    for a in args:
        if isinstance(a, list):
            keys.extend(a)
        else:
            keys.append(a)
    return [k if isinstance(k, str) else _render_scalar(k) for k in keys]


@bif("mapexcept")
def _mapexcept(m, *keys):
    if not isinstance(m, dict):
        raise TypeError("mapexcept expects a map")
    drop = set(_keylist(keys))
    return {k: v for k, v in m.items() if k not in drop}


@bif("mapselect")
def _mapselect(m, *keys):
    if not isinstance(m, dict):
        raise TypeError("mapselect expects a map")
    keep = _keylist(keys)
    return {k: m[k] for k in keep if k in m}


@bif("get_keys")
def _get_keys(m):
    if isinstance(m, dict):
        return list(m.keys())
    if isinstance(m, list):  # array keys are the 1-up indices
        return list(range(1, len(m) + 1))
    raise TypeError("get_keys expects a collection")


@bif("get_values")
def _get_values(m):
    if isinstance(m, dict):
        return list(m.values())
    if isinstance(m, list):
        return list(m)
    raise TypeError("get_values expects a collection")


@bif("haskey")
def _haskey(m, k):
    """map: key present (int keys and their string renderings
    interconvert); array: 1-based or negative index in range."""
    if isinstance(m, dict):
        return k in m or (not isinstance(k, str) and str(k) in m)
    if isinstance(m, list):
        if isinstance(k, bool) or not isinstance(k, (int, np.integer)):
            return False
        i = int(k)
        return (1 <= i <= len(m)) or (-len(m) <= i <= -1)
    return "(error)"  # absent/scalar base (haskey dispositions)


@bif("append")
def _append(arr, v):
    if not isinstance(arr, list):
        raise TypeError("append expects an array")
    return [*arr, v]


@bif("concat")
def _concat(*args):
    """Variadic array concat; non-array args are appended as elements;
    absent args are skipped (collections.go BIF_concat)."""
    out = []
    for a in args:
        if a is None:
            continue
        if isinstance(a, list):
            out.extend(a)
        else:
            out.append(a)
    return out


@bif("arrayify")
def _arrayify(v):
    """Convert maps with consecutive "1","2",... keys to arrays,
    recursively (collections.go BIF_arrayify)."""
    if isinstance(v, dict):
        vals = {k: _arrayify(x) for k, x in v.items()}
        if vals and all(
                str(i) == k for i, k in enumerate(vals.keys(), 1)):
            return list(vals.values())
        return vals
    if isinstance(v, list):
        return [_arrayify(x) for x in v]
    return v


@bif("depth")
def _depth(v):
    """Max nesting depth: scalar -> 0, absent -> absent
    (collections.go BIF_depth)."""
    if v is None:
        return None
    if isinstance(v, dict):
        return 1 + max((_depth(x) for x in v.values()), default=0)
    if isinstance(v, list):
        return 1 + max((_depth(x) for x in v), default=0)
    return 0


# --- round-3: predicates, assertions, collection stats, format, local
# time, system info (builtin_function_manager.go; bifs/types.go,
# stats.go, strings.go, datetime.go, system.go) ------------------------------

bif("is_empty_map")(lambda v: isinstance(v, dict) and len(v) == 0)
bif("is_nonempty_map")(lambda v: isinstance(v, dict) and len(v) > 0)
bif("is_error")(lambda v: isinstance(v, str) and v == "(error)")


@bif("hasvalue")
def _hasvalue(m, v):
    if isinstance(m, dict):
        return v in m.values()
    if isinstance(m, list):
        return v in m
    return "(error)"


class FatalError(ValueError):
    """A Miller runtime FATAL: failed assertion / die — aborts the
    record stream with exit 1 (types.go assertions; should-fail golden
    cases)."""


def _mk_asserting(name: str, pred):
    def f(v):
        ok = pred(v)
        if isinstance(ok, (pa.Array, pa.ChunkedArray)):
            import pyarrow.compute as _pc

            if not _pc.all(ok).as_py():
                raise FatalError(f"mlr: {name} failed")
            return v
        if not ok:
            raise FatalError(f"mlr: {name} failed")
        return v
    REGISTRY[name] = f
    f.__name__ = name
    return f


# asserting_X(v) = v if is_X(v) else fatal (types.go assertions)
for _nm, _base in [
    ("asserting_absent", "is_absent"),
    ("asserting_array", "is_array"),
    ("asserting_bool", "is_bool"),
    ("asserting_boolean", "is_boolean"),
    ("asserting_empty", "is_empty"),
    ("asserting_empty_map", "is_empty_map"),
    ("asserting_error", "is_error"),
    ("asserting_float", "is_float"),
    ("asserting_int", "is_int"),
    ("asserting_map", "is_map"),
    ("asserting_nonempty_map", "is_nonempty_map"),
    ("asserting_not_array", "is_not_array"),
    ("asserting_not_empty", "is_not_empty"),
    ("asserting_not_map", "is_not_map"),
    ("asserting_not_null", "is_not_null"),
    ("asserting_null", "is_null"),
    ("asserting_numeric", "is_numeric"),
    ("asserting_present", "is_present"),
    ("asserting_string", "is_string"),
]:
    _mk_asserting(_nm, REGISTRY[_base])


_ABS_FALLBACK = ("\x00collfb", None)
_ERR_FALLBACK = ("\x00collfb", "(error)")


def _check_coll(v):
    """check_collection (bifs/stats.go:151): map/array pass (returns
    None); absent arg stays absent; anything else — null, error, any
    scalar — yields the error VALUE "(error)"."""
    if isinstance(v, (dict, list)):
        return None
    if v is None:
        return _ABS_FALLBACK
    return _ERR_FALLBACK


def _coll_vals(v) -> list:
    return list(v.values()) if isinstance(v, dict) else list(v)


def _coll_nums(v) -> list:
    """Numeric values of a collection argument (bifs/stats.go ingest:
    non-numeric and void values are skipped)."""
    out = []
    for x in _coll_vals(v):
        if isinstance(x, bool) or x is None or isinstance(x, _MlrNull):
            continue
        if isinstance(x, (int, float, np.integer, np.floating)):
            out.append(float(x))
        elif isinstance(x, str):
            ix = _infer_str(x)
            if not isinstance(ix, str):
                out.append(float(ix))
    return out


def _coll_stat(name):
    def deco(fn):
        def f(v, *args):
            fb = _check_coll(v)
            if fb is not None:
                return fb[1]
            return fn(_coll_nums(v), *args)
        REGISTRY[name] = f
        f.__name__ = name
        return fn
    return deco


def _int_if_whole(x: float):
    return int(x) if float(x).is_integer() and abs(x) < 1e15 else x


@bif("count")
def _c_count(v):
    """count of ALL collection elements, nested values included as one
    each (bifs/stats.go:182 BIF_count CollectionFold +1 per element)."""
    fb = _check_coll(v)
    if fb is not None:
        return fb[1]
    return len(v)


@_coll_stat("sum")
def _c_sum(xs):
    return _int_if_whole(sum(xs))


@_coll_stat("sum2")
def _c_sum2(xs):
    return _int_if_whole(sum(x * x for x in xs))


@_coll_stat("sum3")
def _c_sum3(xs):
    return _int_if_whole(sum(x ** 3 for x in xs))


@_coll_stat("sum4")
def _c_sum4(xs):
    return _int_if_whole(sum(x ** 4 for x in xs))


@_coll_stat("mean")
def _c_mean(xs):
    return sum(xs) / len(xs) if xs else None


@_coll_stat("meaneb")
def _c_meaneb(xs):
    """error bar of the mean: sqrt(variance/n), void for n<2
    (bifs/stats.go:55 BIF_finalize_mean_eb)."""
    n = len(xs)
    if n < 2:
        return None
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / (n - 1)
    return (var / n) ** 0.5


@_coll_stat("variance")
def _c_var(xs):
    n = len(xs)
    if n < 2:
        return None
    m = sum(xs) / n
    return sum((x - m) ** 2 for x in xs) / (n - 1)


@_coll_stat("stddev")
def _c_std(xs):
    v = _c_var(xs)
    return None if v is None else v ** 0.5


@_coll_stat("skewness")
def _c_skew(xs):
    n = len(xs)
    if n < 2:
        return None
    m = sum(xs) / n
    num = sum((x - m) ** 3 for x in xs) / n
    den = (sum((x - m) ** 2 for x in xs) / n) ** 1.5
    return num / den if den else None


@_coll_stat("kurtosis")
def _c_kurt(xs):
    n = len(xs)
    if n < 2:
        return None
    m = sum(xs) / n
    num = sum((x - m) ** 4 for x in xs) / n
    den = (sum((x - m) ** 2 for x in xs) / n) ** 2
    return num / den - 3.0 if den else None


def _pctl_type1(xs: list, p: float):
    """Miller R-type-1 percentile over an already-ingested list."""
    if not xs:
        return None
    s = sorted(xs)
    idx = int(p / 100.0 * len(s))
    return s[min(idx, len(s) - 1)]


def _is_num_scalar(x) -> bool:
    return isinstance(x, (int, float, np.integer, np.floating)) \
        and not isinstance(x, bool)


def _pctl_noninterp(sarr: list, p: float):
    """percentiles.go:193 GetPercentileNonInterpolated: R quantile
    type=1, any element type."""
    n = len(sarr)
    idx = int(p * n / 100.0)
    return sarr[min(max(idx, 0), n - 1)]


def _pctl_interp(sarr: list, p: float):
    """percentiles.go:9 GetPercentileLinearlyInterpolated: R type=7;
    non-numeric arithmetic yields the error VALUE except at the last
    index (returned verbatim)."""
    import math as _math

    n = len(sarr)
    findex = max((p / 100.0) * (n - 1), 0.0)
    iindex = int(_math.floor(findex))
    if iindex >= n - 1:
        return sarr[iindex]
    a, b = sarr[iindex], sarr[iindex + 1]
    if not (_is_num_scalar(a) and _is_num_scalar(b)):
        return "(error)"
    return a + (findex - iindex) * (b - a)


def _pctls_with_options(v, ps, opts, single: bool):
    """bif_percentiles_with_options_aux (bifs/stats.go:543): options
    {array_is_sorted/ais, interpolate_linearly/il,
    output_array_not_map/oa}; output map keyed by each percentile's
    string form; empty collection yields VOID per percentile."""
    fb = _check_coll(v)
    if fb is not None:
        return fb[1]
    interp = sorted_in = out_array = False
    if opts is not None:
        if not isinstance(opts, dict):
            return "(error)"
        for k, ov in opts.items():
            if not isinstance(ov, bool):
                return "(error)"
            if k in ("array_is_sorted", "ais"):
                sorted_in = ov
            elif k in ("interpolate_linearly", "il"):
                interp = ov
            elif k in ("output_array_not_map", "oa"):
                out_array = ov
    if sorted_in:
        if not isinstance(v, list):
            return "(error)"
        sarr = list(v)
    else:
        sarr = _sort_collection(_coll_vals(v))
    if single:
        ps = [ps]
    elif not isinstance(ps, list):
        return "(error)"
    outs = []
    for p in ps:
        if isinstance(p, str):
            ip = _infer_str(p)
            p = ip if not isinstance(ip, str) else None
        if isinstance(p, bool) or not _is_num_scalar(p):
            outs.append("(error)")
        elif not sarr:
            outs.append("")
        elif interp:
            outs.append(_pctl_interp(sarr, float(p)))
        else:
            outs.append(_pctl_noninterp(sarr, float(p)))
    if single:
        return outs[0]
    if out_array:
        return outs
    return {_render_scalar(p): o for p, o in zip(ps, outs)}


@bif("median")
def _c_median(v, opts=None):
    return _pctls_with_options(v, 50.0, opts, single=True)


@bif("percentile")
def _c_pctl(v, p, opts=None):
    return _pctls_with_options(v, p, opts, single=True)


@bif("percentiles")
def _c_pctls(v, ps, opts=None):
    return _pctls_with_options(v, ps, opts, single=False)


def _mode_common(v, anti: bool):
    """bif_mode_or_antimode (bifs/stats.go): equivalence classes by
    rendered string, FIRST-seen representative wins ties; VOID on
    empty."""
    fb = _check_coll(v)
    if fb is not None:
        return fb[1]
    vals = _coll_vals(v)
    if not vals:
        return ""
    counts: dict = {}
    reps: dict = {}
    for x in vals:
        ks = _render_scalar(x) if not isinstance(x, (dict, list)) \
            else repr(x)
        if ks in counts:
            counts[ks] += 1
        else:
            counts[ks] = 1
            reps[ks] = x
    best_k, best_n = None, None
    for ks, n in counts.items():
        if best_n is None or (n < best_n if anti else n > best_n):
            best_k, best_n = ks, n
    return reps[best_k]


@bif("mode")
def _c_mode(v):
    return _mode_common(v, anti=False)


@bif("antimode")
def _c_antimode(v):
    return _mode_common(v, anti=True)


@bif("distinct_count")
def _c_distinct(v):
    """distinct by rendered string, null elements included
    (bifs/stats.go:215 OriginalString keys)."""
    fb = _check_coll(v)
    if fb is not None:
        return fb[1]
    seen = set()
    for x in _coll_vals(v):
        if isinstance(x, (dict, list)):
            seen.add(repr(x))
        elif x is None:
            seen.add("\x00absent")
        else:
            seen.add(_render_scalar(x))
    return len(seen)


@bif("null_count")
def _c_nullcount(v):
    """count of void ("") and JSON-null elements; absent elements do
    NOT count (bifs/stats.go:195 IsVoid||IsNull)."""
    fb = _check_coll(v)
    if fb is not None:
        return fb[1]
    return sum(1 for x in _coll_vals(v)
               if isinstance(x, _MlrNull) or x == "")


@bif("minlen")
def _c_minlen(v):
    fb = _check_coll(v)
    if fb is not None:
        return fb[1]
    lens = [len(_render_scalar(x)) for x in _coll_vals(v)
            if x is not None]
    return min(lens) if lens else None


@bif("maxlen")
def _c_maxlen(v):
    fb = _check_coll(v)
    if fb is not None:
        return fb[1]
    lens = [len(_render_scalar(x)) for x in _coll_vals(v)
            if x is not None]
    return max(lens) if lens else None


@bif("sort_collection")
def _sort_collection(v):
    """Natural ascending sort of an array (bifs BIF_sort_collection)."""
    if isinstance(v, list):
        def key(x):
            if isinstance(x, bool):
                return (2, str(x))
            if isinstance(x, (int, float, np.integer, np.floating)):
                return (0, float(x), "")
            return (1, 0.0, str(x))
        return sorted(v, key=key)
    return v


@bif("logifit")
def _logifit(x, m, b):
    """Logistic fit evaluator 1/(1+exp(-m*x-b)) (bifs/stats.go
    BIF_logifit); vectorizes over any Arrow-array argument."""
    def np_of(a):
        if isinstance(a, (pa.Array, pa.ChunkedArray)):
            return _f(a).to_numpy(zero_copy_only=False)
        return float(a)
    xx, mm, bb = np_of(x), np_of(m), np_of(b)
    out = 1.0 / (1.0 + np.exp(-mm * xx - bb))
    return pa.array(out) if isinstance(out, np.ndarray) else float(out)


@bif("format")
def _format(fmt=None, *args):
    """format("{}:{}", a, b) — brace-pair substitution
    (bifs/strings.go BIF_format). A non-string format is the error
    VALUE; {} beyond the argument list substitute empty; zero args
    print empty (dsl-format/0001)."""
    if fmt is None:
        return ""
    if not isinstance(fmt, str):
        return "(error)"
    counter = [0]

    def sub(m):
        num = m.group(1)
        if num:  # numbered {1}..{n}, 1-up, reusable
            i = int(num) - 1
        else:
            i = counter[0]
            counter[0] += 1
        if 0 <= i < len(args) and args[i] is not None:
            return _render_scalar(args[i])
        return ""
    if re.search(r"\{0\}", fmt):
        return "(error)"  # numbered braces are 1-up (dsl-format/0014)
    return re.sub(r"\{(\d*)\}", sub, fmt)


def _unformat_impl(fmt, s, infer: bool):
    """Inverse of format: extract the {}-matched pieces as an array;
    no match -> error value (bifs/strings.go BIF_unformat)."""
    pat = re.escape(str(fmt)).replace(re.escape("{}"), "(.*?)")
    m = re.fullmatch(pat, str(s))
    if m is None:
        return "(error)"
    return [_infer_str(g) if infer else g for g in m.groups()]


bif("unformatx")(lambda fmt, s: _unformat_impl(fmt, s, False))
bif("unformat")(lambda fmt, s: _unformat_impl(fmt, s, True))


@bif("strmatchx")
def _strmatchx(s, pattern):
    """Rich regex-match result map (bifs/strings.go BIF_strmatchx):
    {matched, full_capture, full_start, full_end, captures[],
    starts[], ends[]} with 1-up positions."""
    if s is None or pattern is None:
        return "(error)"
    m = re.search(str(pattern), str(s))
    if m is None:
        return {"matched": False}
    out = {"matched": True, "full_capture": m.group(0),
           "full_start": m.start() + 1, "full_end": m.end()}
    if m.groups():
        out["captures"] = [_infer_str(g) if g is not None else ""
                           for g in m.groups()]
        out["starts"] = [m.start(i) + 1 for i in range(1, m.lastindex + 1)]
        out["ends"] = [m.end(i) for i in range(1, m.lastindex + 1)]
    return out


# --- local-time family and ns-resolution strptime/strftime
# (bifs/datetime.go; the optional trailing arg is an IANA timezone,
# else $TZ from the environment) --------------------------------------------

def _tzinfo(tzname=None):
    import os as _os
    from zoneinfo import ZoneInfo

    name = tzname or _os.environ.get("TZ") or "UTC"
    return ZoneInfo(str(name))


def _fmt_local(epoch_s: float, fmt: str, tzname=None) -> str:
    import math as _math
    from datetime import datetime

    secs = _math.floor(float(epoch_s))
    nanos = int((float(epoch_s) - secs) * 1e9)
    dt = datetime.fromtimestamp(secs, tz=_tzinfo(tzname))
    return _mlr_strftime_one(dt, fmt, secs, nanos)


@bif("strftime_local")
def _strftime_local(x, fmt, tzname=None):
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array([_fmt_local(v, fmt, tzname) if v is not None
                         else None for v in _f(x).to_pylist()])
    return _fmt_local(x, fmt, tzname)


@bif("strptime_local")
def _strptime_local(s, fmt, tzname=None):
    from datetime import datetime

    tz = _tzinfo(tzname)
    try:
        naive = datetime.strptime(str(s), fmt)
    except ValueError:
        return "(error)"
    dt = naive.replace(tzinfo=tz)
    ts = dt.timestamp()
    back = datetime.fromtimestamp(ts, tz).replace(tzinfo=None)
    if back != naive:
        # nonexistent local time (DST gap): Go resolves with the
        # post-transition offset — PEP495 fold=1 reproduces it
        ts = naive.replace(tzinfo=tz, fold=1).timestamp()
    return ts  # float: Miller renders via OFMT (10800.00000000)


def _opt_dec_tz(args):
    """sec2localtime(x [, ndecimals] [, tz]): middle int = fractional
    digits, trailing string = timezone (bifs/datetime.go)."""
    nd, tzname = 0, None
    for a in args:
        if isinstance(a, str):
            tzname = a
        elif a is not None:
            nd = int(a)
    return nd, tzname


def _one_sec2local(v, fmt, nd, tzname):
    out = _fmt_local(v, fmt, tzname)
    if nd:
        import math as _math

        # fraction relative to the FLOORED second (negative epochs:
        # -0.123456 renders ...:59.876544, not .123456)
        frac = float(v) - _math.floor(float(v))
        digits = int(_math.floor(frac * 10 ** nd))
        out += "." + str(digits).zfill(nd)
    return out


@bif("sec2localtime")
def _sec2localtime(x, *args):
    nd, tzname = _opt_dec_tz(args)
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array([_one_sec2local(v, "%Y-%m-%d %H:%M:%S", nd, tzname)
                         if v is not None else None
                         for v in _f(x).to_pylist()])
    return _one_sec2local(x, "%Y-%m-%d %H:%M:%S", nd, tzname)


@bif("sec2localdate")
def _sec2localdate(x, *args):
    _nd, tzname = _opt_dec_tz(args)
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array([_fmt_local(v, "%Y-%m-%d", tzname)
                         if v is not None else None
                         for v in _f(x).to_pylist()])
    return _fmt_local(x, "%Y-%m-%d", tzname)


@bif("localtime2sec")
def _localtime2sec(s, *tz):
    return _strptime_local(s, "%Y-%m-%d %H:%M:%S", tz[0] if tz else None)


@bif("localtime2gmt")
def _localtime2gmt(s, *tz):
    sec = _localtime2sec(s, *tz)
    if sec == "(error)":
        return sec
    from datetime import datetime, timezone

    return datetime.fromtimestamp(float(sec), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")


@bif("gmt2localtime")
def _gmt2localtime(s, *tz):
    from datetime import datetime, timezone

    try:
        dt = datetime.strptime(str(s), "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc)
    except ValueError:
        return "(error)"
    return _fmt_local(dt.timestamp(), "%Y-%m-%d %H:%M:%S",
                      tz[0] if tz else None)


bif("localtime2nsec")(lambda s, *tz: (
    lambda v: v if v == "(error)" else int(round(float(v) * 1e9)))(
        _localtime2sec(s, *tz)))
bif("nsec2localtime")(lambda x, *tz: _sec2localtime(
    float(x) / 1e9 if not isinstance(x, (pa.Array, pa.ChunkedArray))
    else pc.divide(_f(x), 1e9), *tz))
bif("nsec2localdate")(lambda x, *tz: _sec2localdate(
    float(x) / 1e9 if not isinstance(x, (pa.Array, pa.ChunkedArray))
    else pc.divide(_f(x), 1e9), *tz))


def _strfntime_one(n, fmt, tzname=None):
    # int nanoseconds kept exact (no float round-trip): floor-divide
    # into (secs, nanos) as Go time.Unix(0, nsec) does
    from datetime import datetime, timezone

    n = int(n)
    secs = n // 10 ** 9
    nanos = n - secs * 10 ** 9
    tz = _tzinfo(tzname) if tzname is not None else timezone.utc
    dt = datetime.fromtimestamp(secs, tz=tz)
    return _mlr_strftime_one(dt, fmt, secs, nanos)


@bif("strfntime")
def _strfntime(x, fmt):
    """strfntime: epoch INT nanoseconds -> formatted GMT string
    (bifs/datetime.go BIF_strfntime / strfntimeHelper)."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array([None if v is None else _strfntime_one(v, fmt)
                         for v in pc.cast(x, pa.int64()).to_pylist()],
                        type=pa.string())
    return _strfntime_one(int(x), fmt)


@bif("strfntime_local")
def _strfntime_local(x, fmt, *tz):
    import os as _os

    tzname = tz[0] if tz else (_os.environ.get("TZ") or "UTC")
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return pa.array([None if v is None
                         else _strfntime_one(v, fmt, tzname)
                         for v in pc.cast(x, pa.int64()).to_pylist()],
                        type=pa.string())
    return _strfntime_one(int(x), fmt, tzname)


@bif("strpntime")
def _strpntime(s, fmt):
    sec = REGISTRY["strptime"](s, fmt)
    if isinstance(sec, str):
        return sec
    return int(round(float(sec) * 1e9))


@bif("strpntime_local")
def _strpntime_local(s, fmt, *tz):
    sec = _strptime_local(s, fmt, tz[0] if tz else None)
    if sec == "(error)":
        return sec
    return int(round(float(sec) * 1e9))


# --- aliases, system info, wall clock, randoms (bifs/system.go,
# random.go; nondeterministic fns exist for API completeness and are
# excluded from golden comparisons) ------------------------------------------

def _json_single_line(v) -> str:
    """Miller JSON_SINGLE_LINE rendering (mlrval FormatAsJSON): space
    after ':' and ',', no newlines."""
    from miller_ray import dsl as _dsl

    if isinstance(v, dict):
        return "{" + ", ".join(
            f'"{_dsl._fmt_key(k)}": {_json_single_line(x)}'
            for k, x in v.items()) + "}"
    if isinstance(v, list):
        return "[" + ", ".join(_json_single_line(x) for x in v) + "]"
    return _dsl._json_scalar(v, OFMT)


@bif("json_parse")
def _json_parse_bif(x):
    """BIF_json_parse (collections.go:778): void passes through,
    non-string is a type error, bad JSON is the error value; JSON null
    parses to the null mlrval."""
    import json as _json

    if x == "":
        return ""
    if not isinstance(x, str):
        return "(error)"

    def fix(v):
        if v is None:
            return MLR_NULL
        if isinstance(v, dict):
            return {k: fix(x2) for k, x2 in v.items()}
        if isinstance(v, list):
            return [fix(x2) for x2 in v]
        return v
    try:
        return fix(_json.loads(x))
    except _json.JSONDecodeError:
        return "(error)"


@bif("json_stringify")
def _json_stringify_bif(x, multiline=None):
    """BIF_json_stringify_unary/_binary (collections.go:792): default
    single-line; second arg true switches to the vertical form."""
    if multiline is not None and not isinstance(multiline, bool):
        return "(error)"
    if multiline:
        from miller_ray import dsl as _dsl

        return _dsl._mlr_json(x, ofmt=OFMT)
    return _json_single_line(x)


@bif("flatten")
def _flatten_fn(*args):
    """flatten(map, sep) or flatten(prefix, sep, map)
    (collections.go BIF_flatten)."""
    if len(args) == 2:
        prefix, (m, sep) = "", args
    elif len(args) == 3:
        prefix, sep, m = args
    else:
        raise TypeError("flatten takes 2 or 3 arguments")
    if not isinstance(m, (dict, list)):
        return m
    out: dict = {}

    def rec(node, pre):
        if isinstance(node, dict):
            if not node:
                out[pre or ""] = {}
                return
            for k, v in node.items():
                rec(v, f"{pre}{sep}{k}" if pre else str(k))
        elif isinstance(node, list):
            if not node:
                out[pre or ""] = []
                return
            for i, v in enumerate(node, 1):
                rec(v, f"{pre}{sep}{i}" if pre else str(i))
        else:
            out[pre] = node
    rec(m, str(prefix) if prefix else "")
    return out


@bif("unflatten")
def _unflatten_fn(m, sep):
    """Inverse of flatten (collections.go BIF_unflatten). The "{}"/
    "[]" marker strings flatten wrote for EMPTY collections restore to
    real empty maps/arrays (flatten_unflatten.go unflattenTerminal)."""
    if not isinstance(m, dict):
        return m

    def _leaf(v):
        if v == "{}":
            return {}
        if v == "[]":
            return []
        return v

    out: dict = {}
    for k, v in m.items():
        parts = str(k).split(str(sep))
        if len(parts) == 1 or any(p == "" for p in parts):
            out[k] = _leaf(v)
            continue
        node = out
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            node = nxt
        node[parts[-1]] = _leaf(v)
    return out


def _no_shell() -> bool:
    """--no-shell / MLR_NO_SHELL disables shell-outs (option_parse.go;
    bifs/system.go returns an error mlrval instead of executing)."""
    import os as _os

    v = _os.environ.get("MLR_NO_SHELL", "")
    return v not in ("", "0", "false")


@bif("system")
def _system(cmd):
    import subprocess

    if _no_shell():
        return "(error)"
    r = subprocess.run(str(cmd), shell=True, capture_output=True, text=True)
    return r.stdout.rstrip("\n")


@bif("exec")
def _exec_fn(prog, argv, *rest):
    import subprocess

    if _no_shell():
        return "(error)"
    args = [str(prog)] + [str(a) for a in (argv or [])]
    r = subprocess.run(args, capture_output=True, text=True)
    return r.stdout.rstrip("\n")


@bif("stat")
def _stat_bif(x):
    """BIF_stat (bifs/system.go): file metadata map {name, size, mode,
    modtime, isdir}; an error mlrval when the path does not exist.
    Relative paths also resolve against MLR_TEST_ROOT (the conformance
    harness runs with a different cwd than the reference regtester)."""
    import os as _os

    if isinstance(x, (dict, list)):
        return "(error)"
    p = str(x)
    if not _os.path.isabs(p) and not _os.path.exists(p):
        root = _os.environ.get("MLR_TEST_ROOT", "")
        if root and _os.path.exists(_os.path.join(root, p)):
            p = _os.path.join(root, p)
    try:
        st = _os.stat(p)
    except OSError:
        return "(error)"
    return {"name": _os.path.basename(_os.path.normpath(p)),
            "size": int(st.st_size),
            "mode": int(st.st_mode & 0o7777),
            "modtime": int(st.st_mtime),
            "isdir": bool(__import__("stat").S_ISDIR(st.st_mode))}


bif("hostname")(lambda: __import__("socket").gethostname())
bif("os")(lambda: __import__("platform").system().lower())
bif("version")(lambda: "6.8.0-miller-ray")
bif("systime")(lambda: __import__("time").time())
bif("systimeint")(lambda: int(__import__("time").time()))
bif("sysntime")(lambda: __import__("time").time_ns())
bif("uptime")(lambda: __import__("time").monotonic())
bif("upntime")(lambda: int(__import__("time").monotonic() * 1e9))
bif("urand")(lambda: float(np.random.random()))
bif("urand32")(lambda: int(np.random.randint(0, 2**32)))
bif("urandint")(lambda lo, hi: int(np.random.randint(int(lo), int(hi) + 1)))
bif("urandrange")(lambda lo, hi: float(lo) + float(np.random.random())
                  * (float(hi) - float(lo)))
bif("urandelement")(lambda arr: arr[int(np.random.randint(0, len(arr)))]
                    if isinstance(arr, list) and arr else None)


# --- scalar dispatch for the is_* predicates (sequential-interpreter
# values are Python scalars; mlrval type semantics from bifs/types.go:
# absent=None, void="", is_string counts void, is_null = absent|void) -------

def _scalar_pred(name, scalar_fn):
    arr_fn = REGISTRY[name]

    def f(x):
        if isinstance(x, (pa.Array, pa.ChunkedArray)):
            return arr_fn(x)
        return scalar_fn(x)
    f.__name__ = name
    REGISTRY[name] = f


_scalar_pred("is_absent", lambda x: x is None)
_scalar_pred("is_present", lambda x: x is not None)
_scalar_pred("is_empty", lambda x: isinstance(x, str) and x == "")
_scalar_pred("is_not_empty", lambda x: x is not None and x != "")
_scalar_pred("is_null", lambda x: x is None or x == ""
             or isinstance(x, _MlrNull))
_scalar_pred("is_not_null", lambda x: not (x is None or x == ""
                                           or isinstance(x, _MlrNull)))
_scalar_pred("is_bool", lambda x: isinstance(x, bool))
_scalar_pred("is_boolean", lambda x: isinstance(x, bool))
_scalar_pred("is_int", lambda x: isinstance(x, (int, np.integer))
             and not isinstance(x, bool))
_scalar_pred("is_float", lambda x: isinstance(x, (float, np.floating)))
_scalar_pred("is_numeric", lambda x: isinstance(
    x, (int, float, np.integer, np.floating)) and not isinstance(x, bool))
_scalar_pred("is_string", lambda x: isinstance(x, str))
_scalar_pred("is_map", lambda x: isinstance(x, dict))
_scalar_pred("is_not_map", lambda x: not isinstance(x, dict))
_scalar_pred("is_array", lambda x: isinstance(x, list))
_scalar_pred("is_not_array", lambda x: not isinstance(x, list))
_scalar_pred("is_nan", lambda x: isinstance(
    x, (float, np.floating)) and np.isnan(x))


# asserting_* must wrap the SCALAR-DISPATCHED predicates registered just
# above (the first registration captured the array-only versions)
for _nm, _base in [
    ("asserting_absent", "is_absent"),
    ("asserting_array", "is_array"),
    ("asserting_bool", "is_bool"),
    ("asserting_boolean", "is_boolean"),
    ("asserting_empty", "is_empty"),
    ("asserting_empty_map", "is_empty_map"),
    ("asserting_error", "is_error"),
    ("asserting_float", "is_float"),
    ("asserting_int", "is_int"),
    ("asserting_map", "is_map"),
    ("asserting_nonempty_map", "is_nonempty_map"),
    ("asserting_not_array", "is_not_array"),
    ("asserting_not_empty", "is_not_empty"),
    ("asserting_not_map", "is_not_map"),
    ("asserting_not_null", "is_not_null"),
    ("asserting_null", "is_null"),
    ("asserting_numeric", "is_numeric"),
    ("asserting_present", "is_present"),
    ("asserting_string", "is_string"),
]:
    _mk_asserting(_nm, REGISTRY[_base])
