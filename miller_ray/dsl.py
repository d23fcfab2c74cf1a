"""Miller DSL expression subset for ``put -e`` / ``filter -e``, compiled
to vectorized Arrow kernels.

The reference implements a full language (GOYACC grammar in
``pkg/parsing``, CST in ``pkg/dsl/cst``, entry ``put_or_filter.go:23``);
this module covers the expression core that accounts for the vast
majority of real ``put``/``filter`` one-liners:

- statements: ``$name = expr``; ``unset $name``; ``filter expr``; a bare
  boolean expression (the filter predicate form); ``;``-separated.
- expressions: ``? :`` ternary, ``?? `` absent-coalesce, ``|| &&``,
  ``=~ !~`` regex match, ``== != < <= > >=``, ``.`` string concat,
  ``+ - * / // % **`` with Miller's dot-operators ``.+ .- .* ./``
  (int-preserving variants), unary ``- + !``, parentheses,
  ``$field`` / ``${field name}`` references, int (decimal/hex/binary),
  float and ``"string"`` literals (with ``\\`` escapes), ``true/false``,
  ``M_PI``/``M_E``, and calls to every function in
  ``miller_ray.functions.REGISTRY``.

Each statement compiles to a closure over (pa.Table, env) where env
carries intra-program assignments, so ``$y = $x * 2; $z = $y + 1`` works
per batch with zero Python-per-row cost.

Deliberate divergences (documented, consistent with SURVEY §1.6):
- ``/`` returns int when both operands are int columns and every
  element divides evenly (Miller decides per value, bifs/arithmetic.go
  BIF_divide); otherwise float64.
- 64-bit int overflow wraps instead of auto-promoting to float
  (``bifs/arithmetic.go`` overflow-to-float).
- out-of-stream variables (@vars), begin/end blocks, user-defined
  functions and higher-order functions are not supported and raise
  ``DslError`` at parse time.
"""

from __future__ import annotations

import copy as _copy
import functools
import re
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from miller_ray.functions import REGISTRY


class DslError(ValueError):
    pass


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<float>(\d+\.\d*|\.\d+)([eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>0[xX][0-9a-fA-F]+|0[bB][01]+|0[oO][0-7]+|\d+)
  | (?P<bytesstr>b"(\\.|[^"\\])*")
  | (?P<string>"(\\.|[^"\\])*"i?)
  | (?P<panic>%%%panic%%%)
  | (?P<posfield>\$\[\[\[|\$\[\[|\$\[)
  | (?P<field>\$(\{[^}]*\}|\w+|\*))
  | (?P<oosvar>@(\{[^}]*\}|\w+|\*)?)
  | (?P<ident>[^\W\d]\w*)
  | (?P<op>\*\*|\.\+|\.-|\.\*|\./|//|<=>|<<|>>>|>>|<=|>=|==|!=~|!=|=~|!~|&&|\|\||\^\^|\?\?\??|[-+*/%<>=!?:;,().{}\[\]|&^~])
""", re.VERBOSE)

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", ".=", "%=", "//=", "**=",
               "??=", "???=", "||=", "&&=", "^^=", "&=", "|=", "^=",
               "<<=", ">>=", ">>>=", "min=", "max="}


def _lex(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise DslError(f"DSL lex error at {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    # fuse compound assignment ops (lexer emits e.g. '+' '=' separately)
    fused = []
    i = 0
    while i < len(out):
        k, v = out[i]
        if (k == "op" and i + 1 < len(out) and out[i + 1] == ("op", "=")
                and v + "=" in _ASSIGN_OPS):
            fused.append(("op", v + "="))
            i += 2
        else:
            fused.append((k, v))
            i += 1
    return fused


# ---------------------------------------------------------------------------
# AST = nested tuples; compile directly to closures
# ---------------------------------------------------------------------------

Value = object  # pa.Array | pa.ChunkedArray | python scalar
Expr = Callable[[pa.Table, dict], Value]


def _decode_bytes_literal(body: str) -> bytes:
    r"""b"..." literal (mlrval bytes type): \xNN hex, \NNN octal,
    standard C escapes; other characters contribute their UTF-8
    bytes."""
    out = bytearray()
    i = 0
    esc = {"n": 0x0a, "t": 0x09, "r": 0x0d, "\\": 0x5c, '"': 0x22,
           "a": 0x07, "b": 0x08, "f": 0x0c, "v": 0x0b, "0": 0x00}
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "x" and i + 3 < len(body) + 1:
                out.append(int(body[i + 2:i + 4], 16))
                i += 4
                continue
            if nxt.isdigit() and nxt != "0":
                j = i + 1
                while j < len(body) and j < i + 4 and body[j].isdigit():
                    j += 1
                out.append(int(body[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            out.append(ord(nxt) & 0xFF)
            i += 2
            continue
        out.extend(c.encode("utf-8"))
        i += 1
    return bytes(out)


class _LitStr(str):
    """A string literal carrying its pre-unescape form in ``.raw`` for
    regex-position arguments (Miller compiles regex literals from the
    raw token; lib/regex.go)."""

    raw: str


def _regex_of(v):
    return getattr(v, "raw", v)


def _field_name(tok: str) -> str:
    body = tok[1:]
    return body[1:-1] if body.startswith("{") else body


def _is_arr(v) -> bool:
    return isinstance(v, (pa.Array, pa.ChunkedArray))


def _is_int(v) -> bool:
    if _is_arr(v):
        return pa.types.is_integer(v.type)
    return isinstance(v, (int, np.integer)) and not isinstance(v, bool)


def _is_str(v) -> bool:
    if _is_arr(v):
        return pa.types.is_string(v.type) or pa.types.is_large_string(v.type)
    return isinstance(v, str)


def _to_str(v):
    if _is_arr(v):
        return pc.cast(v, pa.string())
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and float(v).is_integer():
        return str(v)
    return str(v)


def _np(v):
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    if _is_arr(v):
        return v.to_numpy(zero_copy_only=False)
    return v


def _unscalar(v):
    """pyarrow kernels on two Python scalars return pa.Scalar — fold
    those back to Python values so scalar subexpressions stay scalars."""
    return v.as_py() if isinstance(v, pa.Scalar) else v


def _arith(op: str, a: Value, b: Value) -> Value:
    a, b = _unscalar(a), _unscalar(b)
    if isinstance(a, bytes) or isinstance(b, bytes):
        from miller_ray.functions import type_error2

        return type_error2(op, a, b)
    if not _is_arr(a) and not _is_arr(b):
        return _arith_scalar(op, a, b)
    if b is None:
        # array ∘ ABSENT = array for every op (arithmetic.go
        # *_dispositions `_1___` ABSENT column; dsl-functional-tests
        # 0018: $i + $nosuch keeps $i)
        return a
    if a is None:
        # ABSENT ∘ array: identity for + - * ., negation for .-, typed
        # zero for the division family (`_2___`/zero rows)
        if op == ".-":
            return _unscalar(pc.negate(b))
        if op in ("/", "//", "%", "**"):
            return _unscalar(pc.multiply(b, 0))
        return b
    return _unscalar(_arith_raw(op, a, b))


def _int_or_float(x):
    """64-bit overflow promotes to float (bifs/arithmetic.go)."""
    if isinstance(x, int) and not (-2**63 <= x < 2**63):
        return float(x)
    return x


def _wrap64(x):
    """Dot-operators are the int-preserving variants: 64-bit WRAParound
    instead of overflow-to-float (bifs/arithmetic.go dot-ops)."""
    if isinstance(x, int):
        return ((x + 2**63) % 2**64) - 2**63
    return x


def _to_str_ofmt(v):
    """Stringify for dot-concat: scalar floats render through the
    process OFMT when set (mlrval String() honors --ofmt)."""
    if isinstance(v, float) and not v.is_integer():
        from miller_ray import functions as _bifs

        if _bifs.OFMT:
            return _bifs.OFMT % v
    return _to_str(v)


def _arith_scalar(op: str, a, b):
    if a is None or b is None:
        # ABSENT dispositions (arithmetic.go / mathlib.go *_dispositions
        # ABSENT row/column): n∘absent = n for every operator; absent∘n
        # is n for + - * . (identity), -n for .-, typed zero for
        # / // % **, n for ./; absent against void is absent
        if a is None and b is None:
            return None
        other = b if a is None else a
        if other == "":
            return None
        if not isinstance(other, (int, float, np.integer, np.floating)) \
                or isinstance(other, bool):
            return other if b is None else None
        if b is None:
            return a  # _1___ in every table
        if op == ".-":
            return _wrap64(-other)
        if op in ("/", "//", "%", "**"):
            return 0 if isinstance(other, (int, np.integer)) \
                and not isinstance(other, bool) else 0.0
        return other
    if a == "" or b == "":
        # VOID dispositions: void∘void = void; n∘void = n for + - * .
        # but VOID for / // % **; void∘n = n for + *, -n for - .-,
        # void for the division family (arithmetic.go VOID rows)
        if a == "" and b == "":
            return ""
        other = b if a == "" else a
        if not isinstance(other, (int, float, np.integer, np.floating)) \
                or isinstance(other, bool):
            return "(error)"
        if op in ("/", "//", "%", "**", "./", ".//"):
            return ""
        if a == "" and op in ("-", ".-"):
            return _wrap64(-other)
        return other
    if isinstance(a, str) or isinstance(b, str):
        return "(error)"  # arithmetic on non-numeric strings
    if op == ".+":
        return _wrap64(a + b)
    if op == ".-":
        return _wrap64(a - b)
    if op == ".*":
        return _wrap64(a * b)
    if op == "+":
        return _int_or_float(a + b)
    if op == "-":
        return _int_or_float(a - b)
    if op == "*":
        return _int_or_float(a * b)
    if op == "./":
        return int(a / b)
    if op == "/":
        q = a / b
        if isinstance(a, int) and isinstance(b, int) and a % b == 0:
            return _int_or_float(a // b)
        return q
    if op == "//":
        out = math_floor_div(a, b)
        return out
    if op == "%":
        return a % b
    if op == "**":
        out = a ** b
        return _int_or_float(out) if isinstance(out, int) else out
    raise DslError(f"unknown arithmetic op {op}")


def math_floor_div(a, b):
    import math

    out = math.floor(a / b)
    return out if isinstance(a, int) and isinstance(b, int) else float(out)


def _null_identity(op: str, a: Value, b: Value, out: Value) -> Value:
    """Miller treats ABSENT operands as the identity for +,-,*
    (bifs/arithmetic.go absent dispositions: absent + x = x); Arrow
    nulls propagate. Patch nulls back with the other operand."""
    if not _is_arr(out):
        return out
    a_nulls = _is_arr(a) and a.null_count
    b_nulls = _is_arr(b) and b.null_count
    if not a_nulls and not b_nulls:
        return out
    if b_nulls:
        # x op absent = x for + - *
        fill_a = a if _is_arr(a) else pa.array([a] * len(out))
        out = pc.if_else(pc.is_valid(out), out, fill_a)
    if a_nulls:
        # absent op x = x unchanged for + - * (minus_dispositions ABSENT
        # row is `_2___`: return input2, NOT its negation)
        fill_b = b if _is_arr(b) else pa.array([b] * len(out))
        out = pc.if_else(pc.is_valid(out), out, fill_b)
    return out


def _checked_int_arith(fn_checked, fn_plain, op, a, b, wrap: bool):
    """int64 + - * with Miller overflow semantics: the plain operators
    PROMOTE to float64 on overflow (bifs/arithmetic.go plus_n_ii); the
    dot-variants wrap (dotplus_i_ii)."""
    if wrap or not (_is_int(a) and _is_int(b)):
        return _null_identity(op, a, b, fn_plain(a, b))
    try:
        return _null_identity(op, a, b, fn_checked(a, b))
    except pa.ArrowInvalid:  # overflow: redo in float64 (lossy like Go)
        fa = pc.cast(a, pa.float64(), safe=False) if _is_arr(a) \
            else float(a)
        fb = pc.cast(b, pa.float64(), safe=False) if _is_arr(b) \
            else float(b)
        return _null_identity(op, fa, fb, fn_plain(fa, fb))


def _arith_raw(op: str, a: Value, b: Value) -> Value:
    both_int = _is_int(a) and _is_int(b)
    if op in ("+", ".+"):
        return _checked_int_arith(pc.add_checked, pc.add, "+", a, b,
                                  wrap=op == ".+")
    if op in ("-", ".-"):
        return _checked_int_arith(pc.subtract_checked, pc.subtract, "-",
                                  a, b, wrap=op == ".-")
    if op in ("*", ".*"):
        return _checked_int_arith(pc.multiply_checked, pc.multiply, "*",
                                  a, b, wrap=op == ".*")
    if op == "./":
        return pc.divide(a, b)  # int division, truncating (bifs dot-ops)
    if op == "/":
        if both_int:
            # Miller: int/int stays int when evenly divisible
            # (per-column decision here; reference decides per value)
            fa = pc.cast(a, pa.float64()) if _is_arr(a) else float(a)
            fb = pc.cast(b, pa.float64()) if _is_arr(b) else float(b)
            out = pc.divide(fa, fb)
            arr = _np(out)
            if _is_arr(out) and np.all(np.mod(arr[~np.isnan(arr)], 1) == 0):
                return pc.cast(out, pa.int64())
            if not _is_arr(out) and float(out) == int(out):
                return int(out)
            return out
        fa = pc.cast(a, pa.float64()) if _is_arr(a) else float(a)
        fb = pc.cast(b, pa.float64()) if _is_arr(b) else float(b)
        return pc.divide(fa, fb)
    if op == "//":
        out = pc.floor(pc.divide(pc.cast(a, pa.float64()) if _is_arr(a) else float(a),
                                 pc.cast(b, pa.float64()) if _is_arr(b) else float(b)))
        return pc.cast(out, pa.int64()) if both_int else out
    if op == "%":
        # sign follows the divisor (Go BIF_modulus adjusts, matching
        # Python/numpy semantics)
        na, nb = _np(a), _np(b)
        out = np.mod(na, nb)
        return pa.array(out) if isinstance(out, np.ndarray) else out
    if op == "**":
        if both_int:
            return pc.power(a, b)
        return pc.power(pc.cast(a, pa.float64()) if _is_arr(a) else float(a),
                        pc.cast(b, pa.float64()) if _is_arr(b) else float(b))
    raise DslError(f"unknown arithmetic op {op}")


def _bw_class(v) -> str:
    if v is None:
        return "absent"
    if isinstance(v, (bool, np.bool_)):
        return "other"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, str) and v == "":
        return "void"
    return "other"


def _bitwise(op: str, a: Value, b: Value) -> Value:
    """Binary & ^ | << >> >>> per bifs/bits.go disposition matrices:
    int∘int computes; VOID absorbs against numerics; ABSENT is the
    identity against ints but pairs with void/absent to absent and
    with floats to a type error; everything else is a type error."""
    a, b = _unscalar(a), _unscalar(b)
    if _is_arr(a) or _is_arr(b):
        fns = {"&": pc.bit_wise_and, "|": pc.bit_wise_or,
               "^": pc.bit_wise_xor, "<<": pc.shift_left,
               ">>": pc.shift_right, ">>>": pc.shift_right}
        return _unscalar(fns[op](a, b))
    ca, cb = _bw_class(a), _bw_class(b)
    if ca == "int" and cb == "int":
        a2, b2 = int(a), int(b)
        out = {"&": a2 & b2, "|": a2 | b2, "^": a2 ^ b2,
               "<<": a2 << b2, ">>": a2 >> b2,
               ">>>": (a2 % (1 << 64)) >> b2}[op]
        return _wrap64(out)
    pair = (ca, cb)
    if pair in (("int", "void"), ("void", "int"), ("void", "void"),
                ("void", "float"), ("float", "void")):
        return ""
    if pair == ("int", "absent"):
        return a
    if pair == ("absent", "int"):
        return b
    if pair in (("void", "absent"), ("absent", "void"),
                ("absent", "absent")):
        return None
    from miller_ray.functions import type_error2

    return type_error2(op, a, b)


def _compare(op: str, a: Value, b: Value) -> Value:
    a, b = _unscalar(a), _unscalar(b)
    if isinstance(a, bytes) or isinstance(b, bytes):
        # bytes compare bytewise among themselves; against any other
        # type == is false / != is true (mlrval cmp.go bytes rows)
        if isinstance(a, bytes) and isinstance(b, bytes):
            if op == "<=>":
                return -1 if a < b else (1 if a > b else 0)
            return {"==": a == b, "!=": a != b, "<": a < b,
                    "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        if op == "==":
            return False
        if op == "!=":
            return True
        from miller_ray.functions import type_error2

        return type_error2(op, a, b)
    if op == "<=>":
        lt = _compare("<", a, b)
        gt = _compare(">", a, b)
        if _is_arr(lt) or _is_arr(gt):
            import pyarrow.compute as _pc
            return _unscalar(_pc.add(
                _pc.multiply(_pc.cast(gt, pa.int64()), 1),
                _pc.multiply(_pc.cast(lt, pa.int64()), -1)))
        return -1 if lt else (1 if gt else 0)
    if isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
        # collection equality is deep (mlrval cmp.go); ordering on
        # collections is not supported
        if op == "==":
            return _deep_eq(a, b)
        if op == "!=":
            return not _deep_eq(a, b)
        raise DslError(f"{op} is not defined on collections")
    a_bool = isinstance(a, (bool, np.bool_)) or (
        _is_arr(a) and pa.types.is_boolean(a.type))
    b_bool = isinstance(b, (bool, np.bool_)) or (
        _is_arr(b) and pa.types.is_boolean(b.type))
    if a_bool != b_bool:
        # bool vs non-bool never matches: == false, != true, orderings
        # false (bifs/cmp.go disposition matrices, BOOL row/column)
        res = op == "!="
        if _is_arr(a) or _is_arr(b):
            n = len(a) if _is_arr(a) else len(b)
            return pa.array(np.full(n, res))
        return res
    fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
          "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
    if _is_str(a) != _is_str(b):
        a, b = _to_str(a), _to_str(b)
    return _unscalar(fn(a, b))


def _deep_eq(a, b) -> bool:
    if isinstance(a, dict) and isinstance(b, dict):
        # map equality is order-insensitive (dsl-collection-equality)
        return set(a.keys()) == set(b.keys()) and all(
            _deep_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            _deep_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, (dict, list)) != isinstance(b, (dict, list)):
        return False
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    try:
        return a == b
    except TypeError:
        return False


def _unify_types(a: Value, b: Value) -> tuple[Value, Value]:
    """Make both branches of a ternary type-compatible for if_else."""
    if _is_str(a) or _is_str(b):
        return _to_str(a), _to_str(b)
    a_f = _is_arr(a) and pa.types.is_floating(a.type) or isinstance(a, float)
    b_f = _is_arr(b) and pa.types.is_floating(b.type) or isinstance(b, float)
    if a_f != b_f:
        a = pc.cast(a, pa.float64()) if _is_arr(a) else float(a)
        b = pc.cast(b, pa.float64()) if _is_arr(b) else float(b)
    return a, b


def _unalias_idx(n: int, m: int) -> int:
    """1-based index → 0-based, negative aliasing from the end
    (mlrval_collections.go UnaliasArrayLengthIndex); 0 maps to -1."""
    if m >= 1:
        return m - 1
    if m <= -1:
        return m + n
    return -1


def _slice_value(c, lo, hi):
    """Miller slice semantics (bifs/collections.go MillerSliceAccess):
    1-based INCLUSIVE bounds, negative aliasing, out-of-range clamping,
    lower>upper → empty; maps and scalars slice to (error); omitted or
    void bounds default to 1 / length."""
    if c is None:
        return None  # absent[slice] = absent
    if isinstance(c, list):
        n, empty = len(c), []
    elif isinstance(c, str):
        n, empty = len(c), ""
    else:
        return "(error)"  # maps and scalars do not slice
    if lo is None or (isinstance(lo, str) and lo == ""):
        lo_i = 1
    elif isinstance(lo, bool) or not isinstance(lo, (int, np.integer)):
        return "(error)"
    else:
        lo_i = int(lo)
    if hi is None or (isinstance(hi, str) and hi == ""):
        hi_i = n
    elif isinstance(hi, bool) or not isinstance(hi, (int, np.integer)):
        return "(error)"
    else:
        hi_i = int(hi)
    lz, uz = _unalias_idx(n, lo_i), _unalias_idx(n, hi_i)
    if lz > uz:
        return empty
    if lz < 0:
        lz = 0
        if lz > uz:
            return empty
    if uz > n - 1:
        uz = n - 1
        if lz > uz:
            return empty
    return c[lz:uz + 1]


def _index_value(container, key):
    """Miller collection indexing: maps by key, arrays 1-based with
    negative-from-end; out-of-range / missing -> absent (None)."""
    if container is None:
        return None
    if isinstance(container, dict):
        if key in container:
            return container[key]
        # int keys and their string renderings interconvert
        alt = str(key) if not isinstance(key, str) else None
        if alt is not None and alt in container:
            return container[alt]
        if isinstance(key, str):
            try:
                ik = int(key)
            except ValueError:
                return None
            return container.get(ik)
        return None
    if isinstance(container, list):
        if isinstance(key, bool) or not isinstance(key, (int, np.integer)):
            return None
        k = int(key)
        i = k - 1 if k > 0 else len(container) + k
        return container[i] if 0 <= i < len(container) else None
    return None


def _positional_name(c, n: int):
    """[[n]]: the name at slot n — maps: nth key; arrays: the
    normalized 1-based index itself (dsl-array-map-indexing/0018-0021);
    out of range -> absent."""
    if isinstance(c, dict):
        names = list(c.keys())
        i = n - 1 if n > 0 else len(names) + n
        return names[i] if 0 <= i < len(names) else None
    if isinstance(c, list):
        i = n if n > 0 else len(c) + n + 1
        return i if 1 <= i <= len(c) else None
    return None


def _positional_value(c, n: int):
    """[[[n]]]: the value at slot n (maps: nth value; arrays: aliased
    1-based element); out of range -> absent."""
    if isinstance(c, dict):
        vals = list(c.values())
        i = n - 1 if n > 0 else len(vals) + n
        return vals[i] if 0 <= i < len(vals) else None
    if isinstance(c, list):
        i = n - 1 if n > 0 else len(c) + n
        return c[i] if 0 <= i < len(c) else None
    return None


def _scalarize(v):
    """Fold a length-1 array / pa scalar to a Python value (sequential
    interpreter mode operates on 1-row slices)."""
    v = _unscalar(v)
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    if isinstance(v, pa.Array):
        if len(v) != 1:
            raise DslError("expected a scalar in sequential mode")
        return v[0].as_py()
    if isinstance(v, np.generic):
        return v.item()
    return v


# builtins whose arguments or results are Python collections — programs
# calling them route to the sequential interpreter (no Arrow kernel)
_SEQ_FNS = frozenset((
    "splita", "splitnv", "splitnvx", "splitkv", "splitkvx", "joinkv",
    "mapsum", "mapdiff", "mapexcept", "mapselect", "get_keys",
    "get_values", "haskey", "append", "concat", "arrayify", "depth",
    # collection-stats / map-shaped results (round 3)
    "count", "sum", "sum2", "sum3", "sum4", "mean", "meaneb", "median",
    "variance", "stddev", "skewness", "kurtosis", "mode", "antimode",
    "percentile", "percentiles", "distinct_count", "null_count",
    "minlen", "maxlen", "sort_collection", "hasvalue", "is_empty_map",
    "json_parse", "json_stringify", "sparkline",
    "is_nonempty_map", "format", "unformat", "unformatx", "strmatchx",
    "flatten", "unflatten",
    # scalar-only local-time implementations
    "sec2localtime", "sec2localdate", "localtime2sec", "localtime2gmt",
    "gmt2localtime", "localtime2nsec", "nsec2localtime",
    "nsec2localdate", "strptime_local", "strfntime_local",
    "strpntime_local", "strpntime",
))


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.force_seq = False

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise DslError(f"expected {val!r}, got {v!r}")

    # precedence climbing ---------------------------------------------------
    def expr(self) -> Expr:
        return self.ternary()

    def ternary(self) -> Expr:
        cond = self.coalesce()
        if self.peek() == ("op", "?"):
            self.next()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()

            def f(t, env, cond=cond, a=a, b=b):
                c = cond(t, env)
                if not _is_arr(c):
                    # scalar condition short-circuits: only the taken
                    # branch is EVALUATED (cst ternary;
                    # dsl-short-circuit/0019-0020)
                    return a(t, env) if c else b(t, env)
                x, y = _unify_types(a(t, env), b(t, env))
                return pc.if_else(c, x, y)
            return f
        return cond

    def coalesce(self) -> Expr:
        left = self.or_()
        while self.peek()[1] in ("??", "???"):
            _, op = self.next()
            right = self.or_()

            def f(t, env, left=left, right=right, op=op):
                a = left(t, env)
                if not _is_arr(a):
                    a = _unscalar(a)
                    if a is None:
                        return right(t, env)
                    if op == "???" and (a == "" or a == "(error)"):
                        # absent-empty-error coalesce (cst ???)
                        return right(t, env)
                    return a
                b = right(t, env)
                a2, b2 = _unify_types(a, b)
                return pc.coalesce(a2, b2)
            left = f
        return left

    def or_(self) -> Expr:
        left = self.and_()
        while self.peek()[1] in ("||", "^^") and self.peek()[0] == "op":
            if self.peek() == ("op", "^^"):
                # logical XOR — same precedence level as ||
                # (mlr.bnf Or-level; dsl-functional-tests 0046-0049)
                self.next()
                right2 = self.and_()

                def fx(t, env, left=left, right=right2):
                    a = _unscalar(left(t, env))
                    b = _unscalar(right(t, env))
                    if _is_arr(a) or _is_arr(b):
                        return pc.xor(a, b)
                    if isinstance(a, np.bool_):
                        a = bool(a)
                    if isinstance(b, np.bool_):
                        b = bool(b)
                    if isinstance(a, bool) and isinstance(b, bool):
                        return a != b
                    return "(error)"
                left = fx
                continue
            self.next()
            right = self.and_()

            def f(t, env, left=left, right=right):
                a = _unscalar(left(t, env))
                if not _is_arr(a):
                    # scalar: strict booleans, short-circuit on true
                    # (bifs/booleans.go BIF_logical_OR; CST short-circuit)
                    if isinstance(a, np.bool_):
                        a = bool(a)
                    if a is True:
                        return True
                    if a is not False:
                        return "(error)"
                    b = _unscalar(right(t, env))
                    if _is_arr(b):
                        return pc.or_kleene(a, b)
                    if isinstance(b, np.bool_):
                        b = bool(b)
                    return b if isinstance(b, bool) else "(error)"
                return pc.or_kleene(a, right(t, env))
            left = f
        return left

    def and_(self) -> Expr:
        left = self.match_()
        while self.peek() == ("op", "&&"):
            self.next()
            right = self.match_()

            def f(t, env, left=left, right=right):
                a = _unscalar(left(t, env))
                if not _is_arr(a):
                    # scalar: strict booleans, short-circuit on false
                    if isinstance(a, np.bool_):
                        a = bool(a)
                    if a is False:
                        return False
                    if a is not True:
                        return "(error)"
                    b = _unscalar(right(t, env))
                    if _is_arr(b):
                        return pc.and_kleene(a, b)
                    if isinstance(b, np.bool_):
                        b = bool(b)
                    return b if isinstance(b, bool) else "(error)"
                return pc.and_kleene(a, right(t, env))
            left = f
        return left

    def match_(self) -> Expr:
        left = self.comparison()
        while self.peek()[1] in ("=~", "!~", "!=~"):
            _, op = self.next()
            if op == "!=~":  # grammar spelling of negated match
                op = "!~"
            right = self.comparison()

            def f(t, env, left=left, right=right, op=op):
                from miller_ray.functions import MLR_NULL, _MlrNull

                a = left(t, env)
                pat = right(t, env)
                if _is_arr(pat):
                    raise DslError("=~ pattern must be a literal")
                if isinstance(pat, _MlrNull):
                    # `x =~ null` returns null and RESETS captures to
                    # the unset state (dsl-regex-matching/null-reset)
                    env["\x00caps"] = None
                    return MLR_NULL
                pat = str(_regex_of(pat))
                if not _is_arr(a):
                    if a is None:
                        return None  # absent =~ pattern is absent
                    m0 = re.search(pat, str(a))
                    if op == "=~":
                        if m0:
                            env["\x00caps"] = [m0.group(0)] + \
                                ["" if g is None else g
                                 for g in m0.groups()]
                        else:
                            # failed match CLEARS captures to empty
                            # strings (regex.go captures-on-no-match)
                            env["\x00caps"] = [""] * 10
                    return (m0 is None) if op == "!~" else (m0 is not None)
                m = pc.match_substring_regex(pc.cast(a, pa.string()), pat)
                if op == "=~":
                    # populate \0 (full match) and \1..\9 for later
                    # statements (pkg/dsl/cst regex captures): pandas
                    # str.extract is the C-vectorized group extractor;
                    # wrapping the pattern captures the full match as
                    # group 1 -> caps[0]
                    caps = pd.Series(
                        pc.cast(a, pa.string()).to_pandas()).str.extract(
                            "(" + pat + ")")
                    env["\x00caps"] = [
                        pa.array(caps[c].fillna(""), type=pa.string())
                        for c in caps.columns]
                return pc.invert(m) if op == "!~" else m
            left = f
        return left

    def comparison(self) -> Expr:
        left = self.bitor_()
        while self.peek()[1] in ("==", "!=", "<", "<=", ">", ">=",
                                 "<=>"):
            _, op = self.next()
            right = self.bitor_()

            def f(t, env, left=left, right=right, op=op):
                return _compare(op, left(t, env), right(t, env))
            left = f
        return left

    def _bitlevel(self, ops: tuple, next_level) -> Expr:
        """One binary bitwise/shift precedence level (mlr.bnf:
        comparison < `|` < `^` < `&` < shifts < dot-concat)."""
        left = next_level()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            _, op = self.next()
            right = next_level()

            def f(t, env, left=left, right=right, op=op):
                return _bitwise(op, left(t, env), right(t, env))
            left = f
        return left

    def bitor_(self) -> Expr:
        return self._bitlevel(("|",), self.bitxor_)

    def bitxor_(self) -> Expr:
        return self._bitlevel(("^",), self.bitand_)

    def bitand_(self) -> Expr:
        return self._bitlevel(("&",), self.shift_)

    def shift_(self) -> Expr:
        return self._bitlevel(("<<", ">>", ">>>"), self.concat)

    def concat(self) -> Expr:
        left = self.additive()
        while self.peek() == ("op", "."):
            self.next()
            # the dot operator doubles as map member access when the
            # LHS evaluates to a map and the RHS is a bare name
            # (cst/builtin_functions.go DotCallsiteNode: string2 is the
            # RHS token literal; concat otherwise)
            rhs_k, rhs_v = self.peek()
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) \
                else ("eof", "")
            member = rhs_v if rhs_k == "ident" and nxt[1] != "(" else None
            right = self.additive()

            def f(t, env, left=left, right=right, member=member):
                a = left(t, env)
                if isinstance(a, dict) and member is not None:
                    return a.get(member)  # absent when missing
                if member is not None and _is_arr(a) and \
                        pa.types.is_struct(a.type):
                    # vectorized member access on a nested-JSON column
                    try:
                        return pc.struct_field(a, member)
                    except (KeyError, pa.ArrowInvalid):
                        return None  # absent when missing
                if a is None and member is not None:
                    # absent.name: the RHS bare name is usually an
                    # undefined local (reads absent) — concat of two
                    # absents is absent
                    try:
                        b = right(t, env)
                    except DslError:
                        return None
                else:
                    b = right(t, env)
                if a is None and b is None:
                    return None  # absent . absent = absent
                if isinstance(a, bytes) or isinstance(b, bytes):
                    if isinstance(a, bytes) and isinstance(b, bytes):
                        return a + b  # bytes concat bytewise
                    from miller_ray.functions import type_error2

                    return type_error2(".", a, b)
                a = "" if a is None else _to_str_ofmt(a)
                b = "" if b is None else _to_str_ofmt(b)
                if _is_arr(a) and _is_arr(b):
                    return pc.binary_join_element_wise(a, b, "")
                if _is_arr(a):
                    return pc.binary_join_element_wise(
                        a, pa.array([b] * len(a)), "")
                if _is_arr(b):
                    return pc.binary_join_element_wise(
                        pa.array([a] * len(b)), b, "")
                return a + b
            left = f
        return left

    def additive(self) -> Expr:
        left = self.multiplicative()
        while self.peek()[1] in ("+", "-", ".+", ".-"):
            _, op = self.next()
            right = self.multiplicative()

            def f(t, env, left=left, right=right, op=op):
                return _arith(op, left(t, env), right(t, env))
            left = f
        return left

    def multiplicative(self) -> Expr:
        left = self.unary()
        while self.peek()[1] in ("*", "/", "//", "%", ".*", "./"):
            _, op = self.next()
            right = self.unary()

            def f(t, env, left=left, right=right, op=op):
                return _arith(op, left(t, env), right(t, env))
            left = f
        return left

    def unary(self) -> Expr:
        k, v = self.peek()
        if v == "-":
            self.next()
            operand = self.unary()

            def f(t, env, operand=operand):
                x = operand(t, env)
                if x is None:
                    return None  # -absent = absent (unary disposition
                    # matrix; dsl-multipart-scripts/0004 program "-f")
                x = _scalarize(x) if not _is_arr(x) else x
                if isinstance(x, str):
                    try:
                        xn = float(x)
                        x = int(x) if xn.is_integer() and \
                            "." not in x and "e" not in x.lower() else xn
                    except ValueError:
                        return "(error)"
                return pc.negate(x) if _is_arr(x) else -x
            return f
        if v == "+":
            self.next()
            return self.unary()
        if v == "!":
            self.next()
            operand = self.unary()

            def f(t, env, operand=operand):
                x = operand(t, env)
                return pc.invert(x) if _is_arr(x) else (not x)
            return f
        if v == "~":
            # unary bitwise NOT (bifs/bits.go BitwiseNOT): ints only;
            # absent passes through (dsl-basic/0051)
            self.next()
            operand = self.unary()

            def f(t, env, operand=operand):
                x = operand(t, env)
                if x is None:
                    return None
                if _is_arr(x):
                    return pc.bit_wise_not(x)
                x = _scalarize(x)
                if isinstance(x, bool) or not isinstance(x, (int, np.integer)):
                    try:
                        x = int(str(x), 0)
                    except (ValueError, TypeError):
                        return "(error)"
                return ~int(x)
            return f
        return self.power()

    def power(self) -> Expr:
        base = self.postfix()
        if self.peek() == ("op", "**"):
            self.next()
            exp = self.unary()  # right-assoc

            def f(t, env, base=base, exp=exp):
                return _arith("**", base(t, env), exp(t, env))
            return f
        return base

    def postfix(self) -> Expr:
        """primary followed by zero or more [index] accesses (map key /
        1-based array index; pkg/dsl/cst indexing) or [lo:hi] slices
        (bifs/collections.go MillerSliceAccess)."""
        base = self.primary()
        while self.peek() == ("op", "["):
            self.next()
            lo = hi = None
            is_slice = False
            if self.peek() == ("op", ":"):
                is_slice = True
                self.next()
                if self.peek() != ("op", "]"):
                    hi = self.expr()
            else:
                idx = self.expr()
                if self.peek() == ("op", ":"):
                    is_slice = True
                    lo = idx
                    self.next()
                    if self.peek() != ("op", "]"):
                        hi = self.expr()
            if is_slice:
                self.expect("]")

                def fslice(t, env, base=base, lo=lo, hi=hi):
                    c = base(t, env)
                    lv = None if lo is None else _unscalar(lo(t, env))
                    hv = None if hi is None else _unscalar(hi(t, env))
                    return _slice_value(c, lv, hv)
                base = fslice
                continue
            self.expect("]")

            def f(t, env, base=base, idx=idx):
                c = base(t, env)
                k2 = _unscalar(idx(t, env))
                if isinstance(c, (dict, list)) or c is None:
                    if isinstance(k2, list):
                        # single-int array index = POSITIONAL NAME
                        # (m[[2]] -> 2nd key; arr[[2]] -> normalized
                        # index); nested [[n]] = POSITIONAL VALUE
                        # (mlrval_collections.go positional access;
                        # dsl-array-map-indexing/0008)
                        if len(k2) == 1 and isinstance(k2[0], list):
                            inner = k2[0]
                            if len(inner) == 1 and \
                                    isinstance(inner[0], (int, np.integer)) \
                                    and not isinstance(inner[0], bool):
                                return _positional_value(c, int(inner[0]))
                            return None
                        if len(k2) == 1 and \
                                isinstance(k2[0], (int, np.integer)) and \
                                not isinstance(k2[0], bool):
                            return _positional_name(c, int(k2[0]))
                        for kk in k2:  # array index = key path
                            c = _index_value(c, kk)
                            if c is None:
                                return None
                        return c
                    return _index_value(c, k2)
                if _is_arr(c) and pa.types.is_list(c.type):
                    if not isinstance(k2, (int, np.integer)):
                        raise DslError("list index must be an int")
                    i2 = int(k2) - 1 if k2 > 0 else int(k2)
                    return pc.list_element(c, i2)
                if isinstance(c, str) and c == "(error)":
                    return "(error)"  # error values propagate
                if isinstance(c, str) and \
                        isinstance(k2, (int, np.integer)) and \
                        not isinstance(k2, bool):
                    # strings index by 1-based character with negative
                    # aliasing (dsl-string-array-indexing-slicing/0003)
                    i2 = int(k2) - 1 if k2 > 0 else len(c) + int(k2)
                    return c[i2] if 0 <= i2 < len(c) else "(error)"
                if isinstance(c, (str, int, float, bool, bytes)):
                    # any other non-collection index yields the mlr
                    # ERROR value (dsl-array-map-indexing/0010:
                    # $o[[1]]["x"] where $o[[1]] is a string key)
                    return "(error)"
                # Arrow value in the vectorized pass: raise so the
                # caller retries in the sequential interpreter
                raise DslError("[] index on a non-collection value")
            base = f
        return base

    def primary(self) -> Expr:
        k, v = self.next()
        if k == "int":
            try:
                val = int(v, 0)
            except ValueError:  # e.g. "0021": not octal, plain decimal
                val = int(v, 10)
            return lambda t, env: val
        if k == "float":
            val = float(v)
            return lambda t, env: val
        if k == "bytesstr":
            val = _decode_bytes_literal(v[2:-1])
            return lambda t, env: val
        if k == "string":
            ci = v.endswith('"i')
            if ci:
                # case-insensitive regex literal "..."i (mlr.bnf
                # regex_case_insensitive; lib/regex.go): the string
                # VALUE keeps the body, regex consumers see (?i)
                v = v[:-1]
            raw = v[1:-1]
            # \N is a regex-capture ref UNLESS it starts a 3-digit
            # octal escape like \102 (unbackslash.go isBackslashOctal
            # wins before capture splitting; dsl-basic/0061)
            pieces = re.split(r"(\\[0-9](?![0-7][0-7]))", raw)
            # regex-position consumers (sub/gsub/=~ ...) need the RAW
            # literal: Miller does not unescape regex strings, so
            # "\\t" matches a literal backslash-t, not a TAB
            # (dsl-filter-pattern-action/0031)
            if len(pieces) > 1:
                # capture-interpolating literal: "\1-\2" concatenates the
                # last =~ match's groups, \0 = full match (unescape only
                # the static parts — unicode_escape would eat \1 into
                # \x01)
                def f(t, env, pieces=pieces):
                    caps = env.get("\x00caps")
                    out = None
                    for p in pieces:
                        if re.fullmatch(r"\\[0-9]", p):
                            if caps is None:
                                # captures unset (never matched, or
                                # reset by `=~ null`): \N stays
                                # LITERAL (dsl-regex-matching/
                                # null-reset)
                                part = p
                            else:
                                i2 = int(p[1])
                                part = (caps[i2] if i2 < len(caps)
                                        else "")
                        elif p:
                            part = p.encode().decode("unicode_escape")
                        else:
                            continue
                        out = part if out is None else _concat_vals(out, part)
                    return out if out is not None else ""
                return f
            if ci:
                # a case-insensitive regex literal's string VALUE is
                # the verbatim quoted form `"..."i` (leaves.go:270
                # RegexLiteralNode keeps the original literal; only
                # CompileMillerRegex strips it) — so `"a"."d$"i`
                # concatenates to a pattern that matches nothing
                # (dsl-regex-matching/0013)
                val = _LitStr(v + "i")
                val.raw = "(?i)" + raw.replace('\\"', '"')
                return lambda t, env: val
            val = _LitStr(raw.encode().decode("unicode_escape"))
            val.raw = raw.replace('\\"', '"')
            return lambda t, env: val
        if k == "field":
            name = _field_name(v)
            if name == "*":
                # $* in expression position needs the whole record —
                # run the program through the sequential interpreter
                self.force_seq = True

                def fstar(t, env):
                    srec = env.get("\x00srec")
                    if srec is not None:
                        return {k: _copyval(v) for k, v in srec.items()}
                    if "\x00seq" not in env:
                        raise DslError("$* is only available in the "
                                       "sequential interpreter")
                    out = {}
                    for c in t.column_names:
                        val = env[c] if c in env else t[c]
                        if val is not None:
                            out[c] = _scalarize(val)
                    for c, val in env.items():
                        if (not c.startswith("\x00") and c not in out
                                and c not in t.column_names
                                and val is not None):
                            out[c] = _scalarize(val)
                    return out
                return fstar

            def f(t, env, name=name):
                srec = env.get("\x00srec")
                if srec is not None:
                    return srec.get(name)  # absent -> None (Miller)
                if name in env:
                    return env[name]
                if name not in t.column_names:
                    return None  # missing field reads ABSENT (mlrval)
                return t[name]
            return f
        if k == "oosvar":
            name = _field_name(v)  # same ${...} / bare forms as fields

            def fo(t, env, name=name):
                seq = env.get("\x00seq")
                if seq is None:
                    raise DslError("@oosvars require the sequential "
                                   "interpreter or an accumulator plan")
                if name in ("*", ""):
                    # @* — and bare @ followed by ["key"] indexing
                    # (dsl-indirect-oosvar-assignments) — read the
                    # whole oosvar map
                    return {k: _copyval(v) for k, v in seq["oos"].items()}
                return seq["oos"].get(name)
            return fo
        if k == "ident":
            if v == "true":
                return lambda t, env: True
            if v == "false":
                return lambda t, env: False
            if v == "null":
                # JSON-null literal (mlr.bnf null_literal; mlrval
                # MT_NULL) — distinct from absent
                from miller_ray.functions import MLR_NULL
                return lambda t, env: MLR_NULL
            if v == "M_PI":
                return lambda t, env: float(np.pi)
            if v == "M_E":
                return lambda t, env: float(np.e)
            if v == "NF":
                # needs the whole record: sequential interpreter
                self.force_seq = True

                def fnf(t, env):
                    srec = env.get("\x00srec")
                    if srec is None:
                        raise DslError("NF requires the sequential "
                                       "interpreter")
                    return len(srec)
                return fnf
            if v in ("IFS", "OFS", "IPS", "OPS", "IRS", "ORS",
                     "FLATSEP"):
                defaults = {"IFS": ",", "OFS": ",", "IPS": "=",
                            "OPS": "=", "IRS": "\n", "ORS": "\n",
                            "FLATSEP": "."}

                def fsep(t, env, v=v, d=defaults[v]):
                    return env.get("\x00" + v, d)
                return fsep
            if v == "ENV":
                def fenv(t, env):
                    import os as _os

                    return dict(_os.environ)
                return fenv
            if v in ("NR", "FNR", "FILENAME", "FILENUM"):
                # AWK-style context vars (pkg/types/context.go:91-98);
                # available only when the caller seeds them (stream
                # position does not exist in a distributed batch)
                def f(t, env, v=v):
                    key = "\x00" + v
                    if key in env:
                        return env[key]
                    raise DslError(f"{v} is not available here")
                return f
            if v == "func" and self.peek() == ("op", "("):
                # unnamed function literal: func(a, b) { ... }
                # (pkg/dsl/cst/udf.go unnamed-UDF for HOF arguments)
                params = self.params()
                body = _parse_block(self)

                def flit(t, env, params=params, body=body):
                    # capture the defining scope CHAIN by reference:
                    # literals see enclosing locals, including ones
                    # assigned after the literal (first-class-functions
                    # aaa-setup-0006 `cap`)
                    return ("\x00funcval", params, body,
                            list(env.get("\x00scopes") or []))
                return flit
            if self.peek() == ("op", "("):
                return self.call(v)

            def flocal(t, env, v=v):
                val = _scope_lookup(env, v)
                if val is not _ABSENT:
                    return val
                funcs = env.get("\x00funcs") or {}
                if v in funcs:
                    return funcs[v]
                if "\x00seq" in env:
                    return None  # unbound local reads as absent (Miller)
                raise DslError(
                    f"unknown identifier {v!r} (local variables require "
                    "the sequential interpreter)")
            return flocal
        if k == "posfield":
            # $[[n]] = name of n-th field, $[[[n]]] = its value,
            # $[expr] = field named by expr (pkg/dsl/cst positional and
            # indirect field access); sequential interpreter only.
            self.force_seq = True
            nclose = {"$[": 1, "$[[": 2, "$[[[": 3}[v]
            e = self.expr()
            for _ in range(nclose):
                self.expect("]")
            want = {"$[": "dyn", "$[[": "name", "$[[[": "value"}[v]

            def fpos(t, env, e=e, want=want):
                srec = env.get("\x00srec")
                if srec is None:
                    raise DslError("positional/indirect field access "
                                   "requires the sequential interpreter")
                key = _scalarize(e(t, env))
                if want == "dyn":
                    return None if key is None else srec.get(_fmt_key(key))
                if not isinstance(key, (int, np.integer)) or \
                        isinstance(key, bool):
                    raise DslError("positional field index must be an int")
                names = list(srec.keys())
                i = int(key) - 1 if int(key) > 0 else len(names) + int(key)
                if not (0 <= i < len(names)):
                    return None
                return names[i] if want == "name" else srec[names[i]]
            return fpos
        if k == "panic":
            # %%%panic%%% (mlr.bnf:96 PanicLiteral): a test-only token
            # that aborts if EVALUATED — proves short-circuiting
            self.force_seq = True

            def fpanic(t, env):
                raise DslError("%%%panic%%% was evaluated (short-"
                               "circuit failure)")
            return fpanic
        if v == "(":
            e = self.expr()
            self.expect(")")
            return e
        if v == "{":
            # map literal {keyexpr: valexpr, ...}
            pairs: list[tuple[Expr, Expr]] = []
            if self.peek() != ("op", "}"):
                while True:
                    ke = self.expr()
                    self.expect(":")
                    ve = self.expr()
                    pairs.append((ke, ve))
                    if self.peek() == ("op", ","):
                        self.next()
                        if self.peek() == ("op", "}"):
                            break  # trailing comma (dsl-arrayify)
                        continue
                    break
            self.expect("}")

            def fmap(t, env, pairs=pairs):
                out = {}
                for ke, ve in pairs:
                    kraw = _scalarize(ke(t, env))
                    vv = ve(t, env)
                    if not isinstance(vv, (dict, list)):
                        vv = _scalarize(vv)
                    if kraw is None or vv is None:
                        continue  # absent key or value: pair omitted
                        # (mlrval maps cannot hold absent;
                        # dsl-map-variant-dumps/0001)
                    out[_fmt_key(kraw)] = vv
                return out
            return fmap
        if v == "[":
            elems: list[Expr] = []
            if self.peek() != ("op", "]"):
                while True:
                    elems.append(self.expr())
                    if self.peek() == ("op", ","):
                        self.next()
                        if self.peek() == ("op", "]"):
                            break  # trailing comma (mlr.bnf allows)
                        continue
                    break
            self.expect("]")

            def farr(t, env, elems=elems):
                out = []
                for e in elems:
                    vv = e(t, env)
                    out.append(_scalarize(vv) if not isinstance(
                        vv, (dict, list)) else vv)
                return out
            return farr
        raise DslError(f"unexpected token {v!r}")

    def params(self) -> list[tuple[str, str]]:
        """Parse a UDF parameter list ``(typ? name, ...)`` — types from
        _TYPE_CHECKS (pkg/dsl/cst/udf.go typed parameters)."""
        self.expect("(")
        out: list[tuple[str, str]] = []
        if self.peek() != ("op", ")"):
            while True:
                k, v = self.next()
                if k != "ident":
                    raise DslError(f"expected parameter name, got {v!r}")
                if v in _TYPE_CHECKS and self.peek()[0] == "ident":
                    typ = v
                    _, v = self.next()
                else:
                    typ = "var"
                out.append((typ, v))
                if self.peek() == ("op", ","):
                    self.next()
                    if self.peek() == ("op", ")"):
                        break  # trailing comma (dsl-trailing-commas)
                    continue
                break
        self.expect(")")
        return out

    def call(self, name: str) -> Expr:
        self.expect("(")
        args: list[Expr] = []
        if self.peek() != ("op", ")"):
            args.append(self.expr())
            while self.peek() == ("op", ","):
                self.next()
                if self.peek() == ("op", ")"):
                    break  # trailing comma (dsl-trailing-commas)
                args.append(self.expr())
        self.expect(")")
        if name == "next" and not args:
            # mlr script cursor advance (transformers/script.go): load
            # the next input record into $-space, false at EOF
            self.force_seq = True

            def fnext(t, env):
                fn = env.get("\x00script_next")
                if fn is None:
                    raise DslError("next() is only valid in mlr script")
                return fn()
            return fnext
        if name in _SEQ_FNS:
            self.force_seq = True
        if name not in REGISTRY:
            # UDF or HOF — resolved at runtime against env
            # (pkg/dsl/cst/udf.go callsites; hofs.go)
            if name in _HOFS:
                self.force_seq = True
            hof = _HOFS.get(name)

            def fudf(t, env, name=name, args=args, hof=hof):
                vals = [_unseq_val(a(t, env)) for a in args]
                funcs = env.get("\x00funcs") or {}
                fv = funcs.get(name)
                if fv is None:
                    lv = _scope_lookup(env, name)
                    if _is_funcval(lv):
                        fv = lv
                if fv is not None:
                    return _call_func(env.get("\x00prog"), fv, vals, t, env)
                if hof is not None:
                    return hof(vals, t, env)
                raise DslError(f"unknown function {name!r} (supported: "
                               "miller_ray.functions.supported())")
            return fudf
        fn = REGISTRY[name]
        _BADINPUT_DISPO = {
            "sec2gmt": "pass", "sec2gmtdate": "pass",
            "strftime": "error", "strfntime": "error",
            "strftime_local": "error", "strfntime_local": "error",
        }

        def _bad_input(vals, name=name):
            # per-function non-numeric disposition (bifs/datetime.go):
            # 1-arg sec2gmt/sec2gmtdate PASS the input through
            # unchanged (void stays void); the ndecimals variants and
            # the strftime family return the mlr ERROR value — even
            # for void (dsl-gmt-date-time-functions/0003); default is
            # a hard DslError
            if name == "sec2gmt" and len(vals) >= 2:
                return "(error)"
            if vals and vals[0] == "":
                return ""  # void in, void out (most bifs)
            dispo = _BADINPUT_DISPO.get(name)
            if dispo == "pass":
                return vals[0]
            if dispo == "error":
                return "(error)"
            raise DslError(f"{name}: bad input")

        def f(t, env, fn=fn, args=args):
            vals = [_unscalar(a(t, env)) for a in args]
            try:
                return _unscalar(fn(*vals))
            except NotImplementedError as e:
                raise DslError(str(e))
            except (AttributeError, TypeError):
                # bif expects an Arrow array but got a Python scalar
                # (sequential-interpreter mode feeds 1-row slices);
                # retry with the first arg lifted to a length-1 array
                if vals and not isinstance(
                        vals[0], (pa.Array, pa.ChunkedArray, dict, list)):
                    try:
                        lifted = [pa.array([vals[0]]), *vals[1:]]
                        return _unscalar(fn(*lifted))
                    except pa.ArrowInvalid:
                        return _bad_input(vals)
                raise
            except pa.ArrowInvalid:
                return _bad_input(vals)
        return f


# ---------------------------------------------------------------------------
# statements / programs
# ---------------------------------------------------------------------------

class Program:
    """Compiled DSL program: ordered statements over a batch + env."""

    def __init__(self, statements: list[tuple], begin=None, end=None,
                 funcs=None, force_seq=False, subrs=None):
        self.statements = statements
        self.begin = begin or []
        self.end = end or []
        self.funcs = funcs or {}
        # subroutines live in their own namespace (cst/udf.go keeps
        # separate function/subroutine managers; dsl-subr/0016 defines
        # BOTH func s and subr s)
        self.subrs = subrs or {}
        self.needs_seq = bool(self.begin or self.end or self.funcs
                              or self.subrs) or \
            force_seq or _stmts_need_seq(statements)

    def run(self, t: pa.Table,
            seed_env: dict[str, Value] | None = None
            ) -> tuple[pa.Table, Value | None, Value | None]:
        """Apply all statements; returns (table, mask from `filter`
        KEYWORD statements or None, value of the last BARE expression
        or None). In Miller, a bare expression inside `put` is
        evaluated and discarded; the `filter` verb uses the final bare
        boolean as its predicate (put_or_filter.go). seed_env provides
        read-only context values (NUL-prefixed keys are never written
        back). Conditional blocks (if/elif/else, pattern-action)
        execute with a row MASK: assignments merge new values only for
        active rows (the vectorized form of per-record control flow)."""
        env: dict[str, Value] = dict(seed_env or {})
        state = {"mask": None, "bare": None}
        self._exec(self.statements, t, env, None, state)
        mask, bare = state["mask"], state["bare"]
        out = t
        for name, val in env.items():
            if name.startswith("\x00"):
                continue
            if val is None:
                if name in out.column_names:
                    out = out.drop_columns([name])
                continue
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, val)
            else:
                out = out.append_column(name, val)
        return out, mask, bare


def _bool_rows(v, n: int) -> np.ndarray:
    """Condition value -> numpy bool row mask of length n."""
    if _is_arr(v):
        arr = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        return pc.fill_null(arr, False).to_numpy(zero_copy_only=False
                                                 ).astype(bool)
    return np.full(n, bool(v))


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value=None):
        self.value = value


def _truthy(v) -> bool:
    """Scalar condition truthiness (sequential mode). Miller conditions
    are boolean-typed; absent is false; the string forms "true"/"false"
    coerce (mlrval scan)."""
    v = _scalarize(v)
    if v is None:
        return False
    if isinstance(v, str):
        if v == "true":
            return True
        if v == "false":
            return False
    return bool(v)


def _cond_bool(v, what: str = "conditional expression") -> bool:
    """STRICT statement-conditional evaluation (if/cond/while/do-while
    and the C-for continuation): Miller requires an actual boolean
    (if.go:125, while.go:59, for.go:893 — GetBoolValue accepts MT_BOOL
    only) and errors otherwise. The string forms "true"/"false" are
    accepted because some of our builtins carry booleans as their
    rendered text."""
    v = _scalarize(v)
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if v == "true":
        return True
    if v == "false":
        return False
    raise DslError(f"{what} did not evaluate to boolean")


def _scopes(env) -> list[dict]:
    return env.setdefault("\x00scopes", [{}])


def _scope_lookup(env, name):
    for sc in reversed(_scopes(env)):
        if name in sc:
            return sc[name]
    return _ABSENT


_ABSENT = object()  # sentinel: name not bound in any scope


def _scope_assign(env, name, val):
    """Assign to the innermost scope already holding name, else bind in
    the current (innermost) scope (pkg/runtime/stack.go semantics for
    non-declared assignment)."""
    scs = _scopes(env)
    for sc in reversed(scs):
        if name in sc:
            pt = sc.get("\x00ptypes")
            if pt and name in pt:
                # typed parameters keep their declared type for the
                # whole call (udf.go; dsl-argpass-typedecl 0005/0008)
                _typecheck(pt[name], name, val)
            sc[name] = val
            return
    scs[-1][name] = val


_TYPE_CHECKS = {
    "var": lambda v: True,
    "str": lambda v: isinstance(v, str),
    "num": lambda v: isinstance(v, (int, float, np.integer, np.floating))
    and not isinstance(v, bool),
    "int": lambda v: isinstance(v, (int, np.integer))
    and not isinstance(v, bool),
    "float": lambda v: isinstance(v, (float, np.floating)),
    "bool": lambda v: isinstance(v, (bool, np.bool_)),
    "map": lambda v: isinstance(v, dict),
    "arr": lambda v: isinstance(v, list),
    "funct": lambda v: isinstance(v, tuple) and len(v) in (3, 4, 5)
    and v[0] == "\x00funcval",
}


def _typecheck(typ: str, name: str, val):
    if val is None:
        return  # absent assignment is a no-op upstream
    if typ == "num" and isinstance(val, str):
        raise DslError(f"couldn't assign {typ} {name} from string")
    chk = _TYPE_CHECKS.get(typ)
    if chk is not None and not chk(val):
        raise DslError(
            f"couldn't assign {typ} {name} from {type(val).__name__}")


def _exec_scoped(self, body, t, env, state):
    """Run a block body in a fresh local scope (sequential mode)."""
    scs = _scopes(env)
    scs.append({})
    try:
        _exec_impl(self, body, t, env, None, state)
    finally:
        scs.pop()


def _call_func(self, fv, argvals, t, env):
    """Invoke a user function/subroutine value ('\\x00funcval', params,
    body). Functions see $-fields and @oosvars but get a fresh local
    scope stack seeded with their (type-checked) parameters
    (pkg/dsl/cst/udf.go)."""
    _tag, params, body = fv[0], fv[1], fv[2]
    captured = fv[3] if len(fv) > 3 else None
    if len(argvals) != len(params):
        raise DslError(f"function expects {len(params)} args, "
                       f"got {len(argvals)}")
    frame = {}
    ptypes = {}
    for (ptyp, pname), av in zip(params, argvals):
        _typecheck(ptyp, pname, av)
        frame[pname] = _copyval(av)
        if ptyp not in (None, "var"):
            ptypes[pname] = ptyp
    if ptypes:
        frame["\x00ptypes"] = ptypes
    saved = env.get("\x00scopes")
    saved_caps = env.get("\x00caps")
    env["\x00scopes"] = (list(captured) + [frame]) if captured \
        else [frame]
    state = {"mask": None, "bare": None}
    rettype = fv[4] if len(fv) > 4 else None
    try:
        _exec_impl(self, body, t, env, None, state)
        if rettype not in (None, "var"):
            # fall-through returns absent: a non-var declared return
            # type rejects it (udf.go; dsl-mapvars-udfs-subroutines/0011
            # "couldn't assign variable int function return value from
            # value absent (absent)")
            raise DslError(f"couldn't assign variable {rettype} "
                           "function return value from value absent")
        return None
    except _Return as r:
        if rettype is not None:
            # declared return type is enforced at return time
            # (udf.go typed returns; dsl-argpass-typedecl 0003-0005)
            if r.value is None and rettype != "var":
                raise DslError(f"couldn't assign variable {rettype} "
                               "function return value from value absent")
            _typecheck(rettype, "function return value", r.value)
        return r.value
    finally:
        if saved is None:
            env.pop("\x00scopes", None)
        else:
            env["\x00scopes"] = saved
        # regex captures are frame-scoped: a match inside the callee
        # must not clobber the caller's \1..\9 (golden
        # dsl-regex-matching/0017)
        if saved_caps is None:
            env.pop("\x00caps", None)
        else:
            env["\x00caps"] = saved_caps


def _is_funcval(v) -> bool:
    # 3-tuple = plain (params, body); 4-tuple adds the captured scope
    # chain (closure literals, round-3 first-class-functions)
    return isinstance(v, tuple) and len(v) in (3, 4, 5) \
        and v[0] == "\x00funcval"


def _as_funcval(v, hof: str):
    if not _is_funcval(v):
        raise DslError(f"{hof}: argument is not a function")
    return v


def _one_pair(v, hof: str) -> tuple:
    if not isinstance(v, dict) or len(v) != 1:
        raise DslError(f"{hof}: map callback must return a single-pair map")
    return next(iter(v.items()))


# Higher-order functions (pkg/dsl/cst/hofs.go). Each takes the
# already-evaluated arg list plus (t, env); the UDF value is invoked
# through _call_func so it sees $-fields and @oosvars.
def _check_hof_arity(fv, n: int, hof: str) -> None:
    """HOF lambdas must match the collection's pair shape exactly
    (hofs.go arity validation — enforced even on empty collections;
    dsl-first-class-functions *-errors cases)."""
    if len(fv[1]) != n:
        raise DslError(f"{hof}: function must take {n} argument(s); "
                       f"got {len(fv[1])}")


def _hof_apply(vals, t, env):
    from miller_ray.functions import FatalError

    coll, fv = vals[0], _as_funcval(vals[1], "apply")
    prog = env.get("\x00prog")

    def _must_return(r):
        # hofs.go: "second-argument function must return a value"
        if r is None:
            raise FatalError(
                "mlr: apply: second-argument function must return a "
                "value; got absent.")
        return r

    if isinstance(coll, list):
        _check_hof_arity(fv, 1, "apply")
        return [_must_return(_call_func(prog, fv, [e], t, env))
                for e in coll]
    if isinstance(coll, dict):
        _check_hof_arity(fv, 2, "apply")
        out = {}
        for k, v in coll.items():
            rk, rv = _one_pair(_call_func(prog, fv, [k, v], t, env), "apply")
            out[rk] = rv
        return out
    return "(error)"  # hofs.go: non-collection -> error value


def _select_bool(r):
    # hofs.go SelectHOF: the callback must return an actual boolean
    # (dsl-first-class-functions select-errors-12/13/15)
    from miller_ray.functions import FatalError

    if isinstance(r, bool):
        return r
    shown = "(absent)" if r is None else r
    raise FatalError(
        f'mlr: select: function returned non-boolean "{shown}".')


def _hof_select(vals, t, env):
    coll, fv = vals[0], _as_funcval(vals[1], "select")
    prog = env.get("\x00prog")
    if isinstance(coll, list):
        _check_hof_arity(fv, 1, "select")
        return [e for e in coll
                if _select_bool(_call_func(prog, fv, [e], t, env))]
    if isinstance(coll, dict):
        _check_hof_arity(fv, 2, "select")
        return {k: v for k, v in coll.items()
                if _select_bool(_call_func(prog, fv, [k, v], t, env))}
    return "(error)"  # hofs.go: non-collection -> error value


def _hof_fold(vals, t, env):
    coll, fv, init = vals[0], _as_funcval(vals[1], "fold"), vals[2]
    prog = env.get("\x00prog")
    if isinstance(coll, list):
        _check_hof_arity(fv, 2, "fold")
        from miller_ray.functions import FatalError

        acc = init
        for e in coll:
            acc = _call_func(prog, fv, [acc, e], t, env)
            if acc is None:
                # hofs.go: fold callback must return a value
                raise FatalError(
                    "mlr: apply: second-argument function must return "
                    "a value; got absent.")
        return acc
    if isinstance(coll, dict):
        _check_hof_arity(fv, 4, "fold")
        if not coll:
            return None
        ak, av = _one_pair(init, "fold")
        for k, v in coll.items():
            ak, av = _one_pair(
                _call_func(prog, fv, [ak, av, k, v], t, env), "fold")
        return {ak: av}
    return "(error)"  # hofs.go: non-collection -> error value


def _hof_reduce(vals, t, env):
    coll, fv = vals[0], _as_funcval(vals[1], "reduce")
    prog = env.get("\x00prog")
    if isinstance(coll, list):
        _check_hof_arity(fv, 2, "reduce")
        if not coll:
            return None
        from miller_ray.functions import FatalError

        acc = coll[0]
        for e in coll[1:]:
            acc = _call_func(prog, fv, [acc, e], t, env)
            if acc is None:
                # hofs.go: reduce callback must return a value
                raise FatalError(
                    "mlr: reduce: second-argument function must "
                    "return a value; got absent.")
        return acc
    if isinstance(coll, dict):
        _check_hof_arity(fv, 4, "reduce")
        if not coll:
            return None
        items = list(coll.items())
        ak, av = items[0]
        for k, v in items[1:]:
            ak, av = _one_pair(
                _call_func(prog, fv, [ak, av, k, v], t, env), "reduce")
        return {ak: av}
    return "(error)"  # hofs.go: non-collection -> error value


def _hof_any(vals, t, env):
    coll, fv = vals[0], _as_funcval(vals[1], "any")
    prog = env.get("\x00prog")
    if isinstance(coll, list):
        _check_hof_arity(fv, 1, "any")
        return any(_truthy(_call_func(prog, fv, [e], t, env))
                   for e in coll)
    if isinstance(coll, dict):
        _check_hof_arity(fv, 2, "any")
        return any(_truthy(_call_func(prog, fv, [k, v], t, env))
                   for k, v in coll.items())
    return "(error)"  # hofs.go: non-collection -> error value


def _hof_every(vals, t, env):
    coll, fv = vals[0], _as_funcval(vals[1], "every")
    prog = env.get("\x00prog")
    if isinstance(coll, list):
        _check_hof_arity(fv, 1, "every")
        return all(_truthy(_call_func(prog, fv, [e], t, env))
                   for e in coll)
    if isinstance(coll, dict):
        _check_hof_arity(fv, 2, "every")
        return all(_truthy(_call_func(prog, fv, [k, v], t, env))
                   for k, v in coll.items())
    return "(error)"  # hofs.go: non-collection -> error value


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p
            for p in re.split(r"(\d+)", s) if p != ""]


def _sort_key(flags: str):
    """decodeSortFlags (hofs.go:564): default numerical; f=lexical,
    c=case-fold, t=natural, r=reverse, v=by-map-value."""
    mode = "n"
    for c in flags:
        if c in "nfct":
            mode = c
    if mode == "n":
        def key(v):
            if isinstance(v, bool):
                return (3, 0.0, str(v))
            if isinstance(v, bytes):
                # bytes sort after strings, bytewise (cmp.go ordering)
                return (2, 0.0, v.hex())
            if isinstance(v, (int, float, np.integer, np.floating)):
                return (0, float(v), "")
            try:
                # numeric STRINGS (JSON map keys are always strings)
                # sort by value under the numerical mode (hofs.go)
                return (0, float(v), "")
            except (TypeError, ValueError):
                return (1, 0.0, str(v))
    elif mode == "c":
        def key(v):
            return str(v).casefold()
    elif mode == "t":
        def key(v):
            return _natural_key(str(v))
    else:
        def key(v):
            return str(v)
    return key


def _hof_sort(vals, t, env):
    from miller_ray.functions import FatalError

    coll = vals[0]
    prog = env.get("\x00prog")
    if len(vals) > 2:
        # hofs.go SortHOF arity (dsl-first-class-functions
        # sort-errors-04/05)
        raise FatalError("mlr: function sort takes maximum argument "
                         f"count 2; got {len(vals)}")
    arg2 = vals[1] if len(vals) > 1 else ""
    if not isinstance(arg2, str) and not _is_funcval(arg2) and \
            len(vals) > 1:
        raise FatalError("mlr: sort: second argument must be a string "
                         "or a function")

    def _cmp_num(r):
        # comparator must return a NUMBER (sort-errors-10/11/12)
        if isinstance(r, (int, float)) and not isinstance(r, bool):
            return int(r)
        shown = "(absent)" if r is None else r
        raise FatalError("mlr: sort: comparator function returned "
                         f'non-number "{shown}".')

    if _is_funcval(arg2):
        fv = arg2
        if isinstance(coll, list):
            # arity enforced even on empty collections (hofs.go;
            # sort-errors-06)
            _check_hof_arity(fv, 2, "sort")

            def cmp_a(a, b):
                return _cmp_num(_call_func(prog, fv, [a, b], t, env))
            return sorted(coll, key=functools.cmp_to_key(cmp_a))
        if isinstance(coll, dict):
            _check_hof_arity(fv, 4, "sort")

            def cmp_m(pa_, pb):
                return _cmp_num(_call_func(
                    prog, fv, [pa_[0], pa_[1], pb[0], pb[1]], t, env))
            return dict(sorted(coll.items(),
                               key=functools.cmp_to_key(cmp_m)))
        return "(error)"  # hofs.go: non-collection -> error value
    flags = str(arg2 or "")
    key = _sort_key(flags)
    rev = "r" in flags
    if isinstance(coll, list):
        return sorted(coll, key=key, reverse=rev)
    if isinstance(coll, dict):
        byval = "v" in flags
        return dict(sorted(
            coll.items(),
            key=(lambda kv: key(kv[1])) if byval else (lambda kv: key(kv[0])),
            reverse=rev))
    return "(error)"  # hofs.go: non-collection -> error value


_HOFS = {
    "apply": _hof_apply,
    "select": _hof_select,
    "fold": _hof_fold,
    "reduce": _hof_reduce,
    "any": _hof_any,
    "every": _hof_every,
    "sort": _hof_sort,
}


def _iter_bindings(keyvars, valvar, coll):
    """Yield per-iteration binding dicts for for-loops
    (pkg/dsl/cst/for.go): single var = keys of a map / elements of an
    array; (k, v) = items; ((k1..kn), v) = n-deep map iteration."""
    if valvar is None:
        (kv,) = keyvars
        if isinstance(coll, dict):
            for k in list(coll):
                yield {kv: k}
        elif isinstance(coll, list):
            for e in list(coll):
                yield {kv: e}
        elif coll is not None:
            return  # non-collection: silent zero-pass (for.go:377 TODO)
        return
    if len(keyvars) == 1:
        if isinstance(coll, dict):
            for k, v in list(coll.items()):
                yield {keyvars[0]: k, valvar: v}
        elif isinstance(coll, list):
            for i, v in enumerate(coll, 1):
                yield {keyvars[0]: i, valvar: v}
        elif coll is not None:
            return  # non-collection: silent zero-pass (for.go:377 TODO)
        return
    # multi-key: descend len(keyvars) levels through nested maps
    def rec(node, depth, bound):
        if depth == len(keyvars):
            yield {**bound, valvar: node}
            return
        if isinstance(node, dict):
            for k, v in list(node.items()):
                yield from rec(v, depth + 1, {**bound, keyvars[depth]: k})
    if isinstance(coll, dict):
        yield from rec(coll, 0, {})
    elif coll is not None:
        raise DslError("for-loop target is not a map")


def _exec_impl(self, stmts, t, env, mask, state):
    """Execute statements under an optional numpy bool row mask."""
    n = t.num_rows
    srec = env.get("\x00srec")
    for kind, *rest in stmts:
        if kind == "assign":
            name, op, expr = rest
            val = _unscalar(expr(t, env))
            if val is None:
                continue  # absent RHS: assignment is a no-op
            if srec is not None:
                if not isinstance(val, (dict, list)):
                    val = _scalarize(val)
                if op != "=":
                    cur = srec.get(name)
                    val = _oos_combine(op, cur, val)
                if val is not None:
                    srec[name] = _copyval(val)
                continue
            if "\x00seq" in env and isinstance(val, (dict, list)) \
                    and op == "=":
                env[name] = val
                continue
            cur = env.get(name, t[name] if name in t.column_names else None)
            if op != "=":
                if cur is None:
                    raise DslError(f"${name} read before assignment")
                base_op = op[:-1]
                val = (_concat_vals(cur, val) if base_op == "."
                       else _arith(base_op, cur, val))
            valm = _materialize(val, n)
            if mask is None:
                env[name] = valm
            else:
                cur_arr = (pa.nulls(n, valm.type) if cur is None
                           else _materialize(cur, n))
                a, b = _unify_types(valm, cur_arr)
                env[name] = pc.if_else(pa.array(mask),
                                       _materialize(a, n),
                                       _materialize(b, n))
        elif kind == "unset":
            (name,) = rest
            if srec is not None:
                srec.pop(name, None)
            elif mask is None:
                env[name] = None
            else:
                cur = env.get(name,
                              t[name] if name in t.column_names else None)
                if cur is not None:
                    cur_arr = _materialize(cur, n)
                    env[name] = pc.if_else(pa.array(mask),
                                           pa.nulls(n, cur_arr.type), cur_arr)
        elif kind == "filter":
            (expr,) = rest
            if srec is not None:
                m = _truthy(expr(t, env))
                prev = state["mask"]
                state["mask"] = m if prev is None else (bool(prev) and m)
                continue
            m = _bool_rows(expr(t, env), n)
            if mask is not None:
                # rows outside the active branch are unaffected (kept)
                m = m | ~mask
            prev = state["mask"]
            state["mask"] = pa.array(m) if prev is None else \
                pa.array(_bool_rows(prev, n) & m)
        elif kind == "expr":
            (expr,) = rest
            state["bare"] = expr(t, env)
        elif kind == "cond":
            (branches,) = rest
            if srec is not None:
                for cond_expr, body in branches:
                    if cond_expr is None or _cond_bool(cond_expr(t, env)):
                        _exec_scoped(self, body, t, env, state)
                        break
                continue
            taken = np.zeros(n, dtype=bool)
            for cond_expr, body in branches:
                if cond_expr is None:  # else branch
                    branch = ~taken
                else:
                    c = _bool_rows(cond_expr(t, env), n)
                    branch = c & ~taken
                    taken = taken | c
                eff = branch if mask is None else (branch & mask)
                if eff.any():
                    _exec_impl(self, body, t, env, eff, state)
        elif kind == "oassign":
            name, idx_exprs, op, rhs = rest
            seq = env.get("\x00seq")
            acc = state.get("acc")
            if seq is not None:
                _seq_oassign(name, idx_exprs, op, rhs, t, env, seq)
            elif acc is not None:
                _acc_oassign(name, idx_exprs, op, rhs, t, env, mask, acc)
            else:
                raise DslError("@oosvars require the sequential "
                               "interpreter or an accumulator plan")
        elif kind == "ounset":
            (name,) = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("unset @oosvar requires the sequential "
                               "interpreter")
            seq["oos"].pop(name, None)
        elif kind == "emit":
            variant, targets, keyexprs, redir = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("emit requires the sequential interpreter")
            items = _redirect_items(seq, env, t, redir)
            if items is not None:
                seq["divert"] = items
                try:
                    _seq_emit(variant, targets, keyexprs, t, env, seq)
                finally:
                    seq.pop("divert", None)
            else:
                _seq_emit(variant, targets, keyexprs, t, env, seq)
        elif kind == "emit1":
            (eexpr,) = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("emit1 requires the sequential interpreter")
            ev = _unseq_val(eexpr(t, env))
            if isinstance(ev, dict) and ev:
                _seq_push_recs(seq, [dict(ev)])
        elif kind == "dump":
            dexpr, redir = rest if len(rest) == 2 else (rest[0], None)
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("dump requires the sequential interpreter")
            if dexpr is None:
                text = _mlr_json(seq["oos"], ofmt=seq.get("ofmt"))
            else:
                dv = _unseq_val(dexpr(t, env))
                text = None if dv is None else _mlr_json(
                    dv, ofmt=seq.get("ofmt"))
            if text is not None:
                items = _redirect_items(seq, env, t, redir)
                if items is not None:
                    items.append(("text", text))
                else:
                    _seq_push_text(seq, text)
        elif kind == "edump":
            (dexpr,) = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("edump requires the sequential interpreter")
            if dexpr is None:
                text = _mlr_json(seq["oos"], ofmt=seq.get("ofmt"))
            else:
                dv = _unseq_val(dexpr(t, env))
                text = None if dv is None else _mlr_json(
                    dv, ofmt=seq.get("ofmt"))
            if text is not None:
                seq.setdefault("stderr_items", []).append(("text", text))
        elif kind == "eprint":
            expr, nl = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("eprint requires the sequential "
                               "interpreter")
            if expr is None:
                rendered = ""
            elif isinstance(expr, tuple) and expr[0] == "\x00joined":
                parts = []
                for e2 in expr[1]:
                    v = e2(t, env)
                    v = v if isinstance(v, (dict, list)) else _scalarize(v)
                    parts.append(_print_render(v, seq.get("ofmt")))
                rendered = " ".join(parts)
            else:
                v = expr(t, env)
                v = v if isinstance(v, (dict, list)) else _scalarize(v)
                rendered = _print_render(v, seq.get("ofmt"))
            seq.setdefault("stderr_items", []).append(
                ("text" if nl else "textn", rendered))
        elif kind == "print":
            expr, nl, redir = rest if len(rest) == 3 else (*rest, None)
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("print requires the sequential interpreter")
            if expr is None:
                rendered = ""
            elif isinstance(expr, tuple) and expr[0] == "\x00joined":
                parts = []
                for e2 in expr[1]:
                    v = e2(t, env)
                    v = v if isinstance(v, (dict, list)) else _scalarize(v)
                    parts.append(_print_render(v, seq.get("ofmt")))
                rendered = " ".join(parts)
            else:
                v = expr(t, env)
                v = v if isinstance(v, (dict, list)) else _scalarize(v)
                rendered = _print_render(v, seq.get("ofmt"))
            items = _redirect_items(seq, env, t, redir)
            if items is not None:
                items.append(("text" if nl else "textn", rendered))
            elif nl:
                _seq_push_text(seq, seq.get("buf", "") + rendered)
                seq["buf"] = ""
            else:  # printn: accumulate an unterminated line
                seq["buf"] = seq.get("buf", "") + rendered
        elif kind == "teestmt":
            (redir,) = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("tee requires the sequential interpreter")
            srec = env.get("\x00srec")
            items = _redirect_items(seq, env, t, redir)
            if items is None:
                # `tee > stdout, $*`: the record goes to the normal
                # output stream (output handlers' stdout target;
                # dsl-redirects/0011, dsl-output-redirects/0031)
                if srec is not None:
                    _seq_push_recs(seq, [dict(srec)])
            elif srec is not None:
                items.append(("rec", dict(srec)))
        elif kind == "localdecl":
            typ, name, expr = rest
            if "\x00seq" not in env:
                raise DslError("local variables require the sequential "
                               "interpreter")
            val = None
            if expr is not None:
                val = expr(t, env)
                if not isinstance(val, (dict, list, tuple)):
                    val = _scalarize(val)
                if val == "(error)":
                    # declared locals reject the error value outright
                    # (variables.go; dsl-mapvars-udfs-subroutines/0012)
                    raise DslError(f"couldn't assign variable {typ} "
                                   f"{name} from value error (error)")
                _typecheck(typ, name, val)
            sc0 = _scopes(env)[-1]
            sc0[name] = _copyval(val)
            if typ != "var":
                # declared type is enforced on every later assignment
                # (variables.go typed locals; dsl-localvar-typedecl,
                # dsl-forbind-typedecl should-fail cases) — reuses the
                # \x00ptypes check inside _scope_assign
                sc0.setdefault("\x00ptypes", {})[name] = typ
        elif kind == "localassign":
            name, op, expr = rest
            if "\x00seq" not in env:
                raise DslError("local variables require the sequential "
                               "interpreter")
            val = expr(t, env)
            if not isinstance(val, (dict, list, tuple)):
                val = _scalarize(val)
            if val is None:
                continue
            if op != "=":
                cur = _scope_lookup(env, name)
                cur = None if cur is _ABSENT else cur
                val = _oos_combine(op, cur, val)
            _scope_assign(env, name, _copyval(val))
        elif kind == "lidxassign":
            name, idx_exprs, op, expr = rest
            if "\x00seq" not in env:
                raise DslError("local variables require the sequential "
                               "interpreter")
            val = expr(t, env)
            if not isinstance(val, (dict, list, tuple)):
                val = _scalarize(val)
            keys = _splice_keys([_unseq_val(e(t, env))
                                 for e in idx_exprs])
            cur = _scope_lookup(env, name)
            cur = _deepen_base(None if cur is _ABSENT else cur, keys[0])
            _scope_assign(env, name, cur)
            _assign_path(cur, keys, op, val)
        elif kind == "fidxassign":
            fname, idx_exprs, op, expr = rest
            if srec is None:
                raise DslError("indexed field assignment requires the "
                               "sequential interpreter")
            val = expr(t, env)
            if not isinstance(val, (dict, list, tuple)):
                val = _scalarize(val)
            keys = _splice_keys([_unseq_val(e(t, env))
                                 for e in idx_exprs])
            cur = _deepen_base(srec.get(fname), keys[0])
            srec[fname] = cur
            _assign_path(cur, keys, op, val)
        elif kind == "dynassign":
            nameexpr, idx_exprs, op, expr = rest
            if srec is None:
                raise DslError("$[expr] assignment requires the "
                               "sequential interpreter")
            name = _scalarize(nameexpr(t, env))
            if name is None:
                continue
            name = _fmt_key(name)
            val = expr(t, env)
            if not isinstance(val, (dict, list, tuple)):
                val = _scalarize(val)
            if idx_exprs:
                keys = _splice_keys([_unseq_val(e(t, env))
                                      for e in idx_exprs])
                cur = _deepen_base(srec.get(name), keys[0])
                srec[name] = cur
                _assign_path(cur, keys, op, val)
            else:
                if op != "=":
                    val = _oos_combine(op, srec.get(name), val)
                if val is not None:
                    srec[name] = _copyval(val)
        elif kind == "posassign":
            form, nexpr, expr = rest
            if srec is None:
                raise DslError("positional field assignment requires the "
                               "sequential interpreter")
            idx = _scalarize(nexpr(t, env))
            if not isinstance(idx, (int, np.integer)):
                raise DslError("positional field index must be an int")
            names = list(srec.keys())
            i = int(idx) - 1 if int(idx) > 0 else len(names) + int(idx)
            if not (0 <= i < len(names)):
                continue  # out-of-range positional: no-op (Miller)
            val = expr(t, env)
            if not isinstance(val, (dict, list)):
                val = _scalarize(val)
            if form == "name":
                # rename-in-place; an existing field with the new name
                # is dropped (mlrmap rename, golden
                # dsl-array-map-indexing/0078)
                newname = _fmt_key(val)
                old = names[i]
                if newname != old:
                    out2 = {}
                    for kk, vv in srec.items():
                        if kk == old:
                            out2[newname] = vv
                        elif kk != newname:
                            out2[kk] = vv
                    srec.clear()
                    srec.update(out2)
            else:
                srec[names[i]] = _copyval(val)
        elif kind == "srec_assign":
            (expr,) = rest
            if srec is None:
                raise DslError("assignment to $* requires the "
                               "sequential interpreter")
            val = expr(t, env)
            if not isinstance(val, dict):
                raise DslError("$* must be assigned a map")
            srec.clear()
            for kk, vv in val.items():
                srec[_fmt_key(kk)] = _copyval(vv)
        elif kind == "srecidx_assign":
            idx_exprs, expr = rest
            if srec is None:
                raise DslError("indexed $* assignment requires the "
                               "sequential interpreter")
            val = expr(t, env)
            if not isinstance(val, (dict, list, tuple)):
                val = _scalarize(val)
            keys = _splice_keys([_unseq_val(e(t, env))
                                 for e in idx_exprs])
            # record keys are strings; _assign_path on srec directly
            keys = [_fmt_key(k3) if not isinstance(k3, list) else k3
                    for k3 in keys]
            _assign_path(srec, keys, "=", val)
        elif kind == "oall_assign":
            (expr,) = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("@* requires the sequential interpreter")
            val = expr(t, env)
            if not isinstance(val, dict):
                raise DslError("@* must be assigned a map")
            seq["oos"].clear()
            for kk, vv in val.items():
                seq["oos"][_fmt_key(kk)] = _copyval(vv)
        elif kind == "unset_multi":
            targets = rest[0]
            for tg in targets:
                _exec_unset(tg, t, env, srec)
        elif kind == "while":
            cond, body = rest
            if "\x00seq" not in env:
                raise DslError("while loops require the sequential "
                               "interpreter")
            iters = 0
            while _cond_bool(cond(t, env)):
                iters += 1
                if iters > 10_000_000:
                    raise DslError("while loop exceeded 1e7 iterations")
                try:
                    _exec_scoped(self, body, t, env, state)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "dowhile":
            body, cond = rest
            if "\x00seq" not in env:
                raise DslError("do-while loops require the sequential "
                               "interpreter")
            iters = 0
            while True:
                iters += 1
                if iters > 10_000_000:
                    raise DslError("do-while loop exceeded 1e7 iterations")
                try:
                    _exec_scoped(self, body, t, env, state)
                except _Break:
                    break
                except _Continue:
                    pass
                if not _cond_bool(cond(t, env)):
                    break
        elif kind == "for_bind":
            keyvars, valvar, collexpr, body = rest
            if "\x00seq" not in env:
                raise DslError("for loops require the sequential "
                               "interpreter")
            coll = collexpr(t, env)
            if not isinstance(coll, (dict, list)) and coll is not None:
                coll = _scalarize(coll)
            scs = _scopes(env)
            for binding in _iter_bindings(keyvars, valvar, coll):
                scs.append({k: _copyval(x) for k, x in binding.items()})
                try:
                    _exec_impl(self, body, t, env, None, state)
                except _Break:
                    break
                except _Continue:
                    continue
                finally:
                    scs.pop()
        elif kind == "for_c":
            init_stmts, condpack, update_stmts, body = rest
            if isinstance(condpack, tuple):
                cond_stmts, cond = condpack
            else:  # legacy shape
                cond_stmts, cond = [], condpack
            if "\x00seq" not in env:
                raise DslError("for loops require the sequential "
                               "interpreter")
            scs = _scopes(env)
            scs.append({})
            try:
                _exec_impl(self, init_stmts, t, env, None, state)
                iters = 0
                while True:
                    if cond_stmts:
                        _exec_impl(self, cond_stmts, t, env, None,
                                   state)
                    if cond is not None and not _cond_bool(
                            cond(t, env), "for-loop continuation"):
                        break
                    iters += 1
                    if iters > 10_000_000:
                        raise DslError("for loop exceeded 1e7 iterations")
                    try:
                        _exec_scoped(self, body, t, env, state)
                    except _Break:
                        break
                    except _Continue:
                        pass
                    _exec_impl(self, update_stmts, t, env, None, state)
            finally:
                scs.pop()
        elif kind == "scopeblock":
            (body,) = rest
            _exec_scoped(self, body, t, env, state)
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        elif kind == "return":
            (expr,) = rest
            raise _Return(None if expr is None else _unseq_val(expr(t, env)))
        elif kind == "callsubr":
            name, argexprs = rest
            subrs = env.get("\x00subrs") or {}
            fv = subrs.get(name)
            if fv is None:
                lv = _scope_lookup(env, name)
                fv = None if lv is _ABSENT else lv
            if not (isinstance(fv, tuple) and len(fv) in (3, 4, 5)
                    and fv[0] == "\x00funcval"):
                raise DslError(f"unknown subroutine {name!r}")
            argvals = [_unseq_val(a(t, env)) for a in argexprs]
            _call_func(self, fv, argvals, t, env)
        else:  # pragma: no cover
            raise DslError(f"unknown statement kind {kind}")


Program._exec = _exec_impl


# ---------------------------------------------------------------------------
# sequential (cross-record) execution: @oosvars, emit, begin/end
# ---------------------------------------------------------------------------

def _oos_combine(op: str, cur, val):
    """Compound-assign an oosvar (bifs absent dispositions: absent is
    the identity — @s += $x with unset @s yields $x, for every op)."""
    if val is None:
        return cur
    if cur is None:
        return val
    base = op[:-1]
    if base == ".":
        return _to_str(cur) + _to_str(val)
    if base == "??":
        return cur if cur is not None else val
    if base == "???":
        return cur if cur not in (None, "", "(error)") else val
    if base == "||":
        return bool(cur) or bool(val)
    if base == "&&":
        return bool(cur) and bool(val)
    if base == "^^":
        return bool(cur) != bool(val)
    if base == "min":
        return min(cur, val)
    if base == "max":
        return max(cur, val)
    if base in ("&", "|", "^", "<<", ">>", ">>>"):
        a2, b2 = int(cur), int(val)
        out = {"&": a2 & b2, "|": a2 | b2, "^": a2 ^ b2,
               "<<": a2 << b2, ">>": a2 >> b2,
               ">>>": (a2 % (1 << 64)) >> b2}[base]
        return _wrap64(out)
    return _unscalar(_arith(base, cur, val))


def _copyval(v):
    """Mlrvals assign by value (mlrval Copy()): collections are
    deep-copied at every assignment so later mutation of @x does not
    rewrite records that already captured it."""
    return _copy.deepcopy(v) if isinstance(v, (dict, list)) else v


def _set_elem(node, key, val):
    if isinstance(node, dict):
        # Miller map keys are strings (mlrmap): stringify non-string
        # keys so @m[1] and @m["1"] are the same slot and output
        # renders "1"
        if not isinstance(key, str):
            key = _fmt_key(key)
        node[key] = val
        return
    if isinstance(node, list):
        if isinstance(key, bool) or not isinstance(key, (int, np.integer)):
            raise DslError("array index must be an int")
        k = int(key)
        i = k - 1 if k > 0 else len(node) + k
        if 0 <= i < len(node):
            node[i] = val
        elif k > 0:
            # auto-lengthen with absent fill
            # (mlrval_collections.go LengthenMlrvalArray)
            node.extend([None] * (k - len(node)))
            node[k - 1] = val
        else:
            raise DslError("cannot use negative indices to "
                           "auto-lengthen arrays")
        return
    raise DslError("indexed assignment into a non-collection")


def _new_level(key):
    """Auto-deepen level type follows the index type: int makes an
    array, string makes a map (mlrval_collections.go PutIndexed)."""
    return [] if isinstance(key, (int, np.integer)) and \
        not isinstance(key, bool) else {}


def _deepen_base(cur, first_key):
    """Container for an indexed assignment whose base is not a
    collection: absent -> map (map auto-deepen,
    NewMlrvalForAutoDeepen); scalar -> replaced by array-or-map per the
    first index type (Mlrval.PutIndexed non-collection branch)."""
    if isinstance(cur, (dict, list)):
        return cur
    if cur is None:
        return {}
    return _new_level(first_key)


def _seq_oassign(name, idx_exprs, op, rhs, t, env, seq):
    oos = seq["oos"]
    val = rhs(t, env)
    if not isinstance(val, (dict, list)):
        val = _scalarize(val)
    if name == "" and idx_exprs:
        # @["name"][...] = ...: bare-@ root indexing; the first index
        # IS the oosvar name (dsl-indirect-oosvar-assignments)
        keyvals = [_unseq_val(e(t, env)) for e in idx_exprs]
        name = _fmt_key(keyvals[0])
        idx_exprs = [lambda t, env, k=k: k for k in keyvals[1:]]
    if not idx_exprs:
        if op == "=":
            if val is not None:
                oos[name] = _copyval(val)
        else:
            nv = _oos_combine(op, oos.get(name), val)
            if nv is not None:
                oos[name] = _copyval(nv)
        return
    if val is None:
        # assigning ABSENT is a no-op and must not auto-deepen the
        # oosvar (assignments of absent skip; for compound ops the
        # combine result equals the current value)
        return
    keys = _splice_keys([_unseq_val(e(t, env)) for e in idx_exprs])
    node = _deepen_base(oos.get(name), keys[0])
    oos[name] = node
    _assign_path(node, keys, op, val)


def _fmt_key(v) -> str:
    """Render a computed field/map key the way Miller stringifies
    mlrvals for record keys ($[expr] assignment, $* maps)."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def _unseq_val(v):
    """Fold an expression result to a sequential-mode value: scalars
    stay Python scalars, collections and funcvals pass through."""
    if isinstance(v, (dict, list)):
        return v
    if isinstance(v, tuple) and len(v) in (3, 4, 5) \
            and v[0] == "\x00funcval":
        return v
    return _scalarize(v)


def _splice_keys(keys: list) -> list:
    """An array-valued index splices its elements into the key path
    (mlrval PutIndexed with array-of-indices; golden dsl-multi-index).
    A NESTED array inside an index is a hard error
    (mlrval_collections.go PutIndexed; dsl-array-map-indexing/0007)."""
    from miller_ray.functions import FatalError

    out = []
    for k in keys:
        if isinstance(k, list):
            for e in k:
                if isinstance(e, list):
                    raise FatalError(
                        "mlr: record/map indices must be string, int, "
                        "or array thereof; got array")
                out.append(e)
        else:
            out.append(k)
    return out


def _assign_path(node, keys: list, op: str, val):
    """In-place indexed assignment through nested maps/arrays
    (mlrval_collections.go PutIndexed): a missing map key auto-deepens
    to a map; a scalar or absent-array-slot is replaced by an array or
    map per the NEXT index's type. An ABSENT index skips the whole
    assignment (executeIndexed absent-index guard;
    dsl-absent-empty/0005)."""
    keys = _splice_keys(keys)
    if any(k is None for k in keys):
        return
    for j, kk in enumerate(keys[:-1]):
        nxt = _index_value(node, kk)
        if not isinstance(nxt, (dict, list)):
            if nxt is None and isinstance(node, dict):
                nxt = {}
            else:
                nxt = _new_level(keys[j + 1])
            _set_elem(node, kk, nxt)
        node = nxt
    last = keys[-1]
    if op == "=":
        if val is not None:
            _set_elem(node, last, _copyval(val))
    else:
        nv = _oos_combine(op, _index_value(node, last), val)
        if nv is not None:
            _set_elem(node, last, _copyval(nv))


def _del_elem(node, key):
    if isinstance(node, dict):
        if key in node:
            del node[key]
        elif not isinstance(key, str) and str(key) in node:
            del node[str(key)]
        return
    if isinstance(node, list) and isinstance(key, (int, np.integer)) \
            and not isinstance(key, bool):
        k = int(key)
        i = k - 1 if k > 0 else len(node) + k
        if 0 <= i < len(node):
            del node[i]


def _unset_path(root, keys: list):
    # array-valued indices splice into the key path — so
    # `unset @m[[1]]` is @m[1], a NO-OP on string-keyed maps
    # (dsl-array-map-indexing/0035-0036 goldens: nothing removed)
    keys = _splice_keys(keys)
    node = root
    for kk in keys[:-1]:
        node = _index_value(node, kk)
        if not isinstance(node, (dict, list)):
            return
    _del_elem(node, keys[-1])


def _exec_unset(tg, t, env, srec):
    """One target of an `unset` statement (pkg/dsl/cst/statements.go
    unset): ("field"|"oos"|"local", name, idx_exprs) | ("srec_all",) |
    ("oos_all",)."""
    kind = tg[0]
    if kind == "srec_all":
        if srec is None:
            raise DslError("unset $* requires the sequential interpreter")
        idx_exprs = tg[1] if len(tg) > 1 else []
        if idx_exprs:
            # unset $*["a"]... — indexed path into the whole record
            # (pkg/dsl/cst/statements/unset.go full-srec lvalue)
            keys = [_scalarize(e(t, env)) for e in idx_exprs]
            _unset_path(srec, keys)
        else:
            srec.clear()
        return
    if kind == "oos_all":
        seq = env.get("\x00seq")
        if seq is None:
            raise DslError("unset @* requires the sequential interpreter")
        idx_exprs = tg[1] if len(tg) > 1 else []
        if idx_exprs:
            keys = [_scalarize(e(t, env)) for e in idx_exprs]
            _unset_path(seq["oos"], keys)
        else:
            seq["oos"].clear()
        return
    if kind == "posfield":
        if srec is None:
            raise DslError("positional unset requires the sequential "
                           "interpreter")
        v2, e2 = tg[1], tg[2]
        key = _scalarize(e2(t, env))
        if v2 == "$[":
            if key is not None:
                srec.pop(_fmt_key(key), None)
            return
        if not isinstance(key, (int, np.integer)) or \
                isinstance(key, bool):
            raise DslError("positional field index must be an int")
        names2 = list(srec.keys())
        i2 = int(key) - 1 if int(key) > 0 else len(names2) + int(key)
        if 0 <= i2 < len(names2):
            srec.pop(names2[i2], None)
        return
    _k, name, idx_exprs = tg
    keys = [_scalarize(e(t, env)) for e in idx_exprs]
    if kind == "field":
        if srec is None:
            if keys:
                raise DslError("indexed unset requires the sequential "
                               "interpreter")
            env[name] = None
            return
        if not keys:
            srec.pop(name, None)
        else:
            cur = srec.get(name)
            if isinstance(cur, (dict, list)):
                _unset_path(cur, keys)
        return
    if kind == "oos":
        seq = env.get("\x00seq")
        if seq is None:
            raise DslError("unset @var requires the sequential interpreter")
        if not keys:
            seq["oos"].pop(name, None)
        else:
            cur = seq["oos"].get(name)
            if isinstance(cur, (dict, list)):
                _unset_path(cur, keys)
        return
    # local
    scs = _scopes(env)
    for sc in reversed(scs):
        if name in sc:
            if not keys:
                del sc[name]
            elif isinstance(sc[name], (dict, list)):
                _unset_path(sc[name], keys)
            return


def _flatten_into(out: dict, prefix, v, sep: str = "."):
    # auto-flatten separator is "." (mlr default flatsep; golden cases
    # dsl-parameterized-emit/0001 `sum.pan=...`); empty collections
    # flatten to the "{}"/"[]" marker strings (flatten_unflatten.go)
    if isinstance(v, dict):
        if not v:
            out[prefix] = "{}"
            return
        for kk, vv in v.items():
            _flatten_into(out, f"{prefix}{sep}{kk}" if prefix else str(kk),
                          vv, sep)
    elif isinstance(v, list):
        if not v:
            out[prefix] = "[]"
            return
        for i, vv in enumerate(v, 1):
            _flatten_into(out, f"{prefix}{sep}{i}" if prefix else str(i),
                          vv, sep)
    elif v is not None:
        out[prefix] = v


def _has_map_vals(d: dict) -> bool:
    return any(isinstance(v, (dict, list)) for v in d.values())


def _emit_split(base, v) -> list[dict]:
    """emit (unprefixed) of one target with keynames exhausted
    (emit_emitp.go:501 executeNonIndexedNonLashedEmit): scalar ->
    {name: v}; map whose FIRST value is not a map (Mlrmap.IsNested,
    mlrmap_accessors.go:823 checks only Head) -> the map as one
    record, nested values kept in place; map whose first value IS a
    map -> recurse per (key, value) with the child key as the next
    name (golden dsl-emit/0006)."""
    if v is None:
        return []
    if not isinstance(v, (dict, list)):
        return [{base if base is not None else "_": v}]
    if isinstance(v, list):
        # arrays are leaf emittables: one record {name: array}
        # (dsl-slice/0001 "a35": [3, 4, 5]; empty arrays still emit)
        return [{base if base is not None else "_": v}]
    first = next(iter(v.values()), None)
    if not isinstance(first, dict):
        rec = {kk: vv for kk, vv in v.items() if vv is not None}
        return [rec] if rec else []
    recs: list[dict] = []
    for kk, vv in v.items():
        recs.extend(_emit_split(kk, vv))
    return recs


def _emit_records(prefixed: bool, names, vals, keynames,
                  rooted: bool = False, sep: str = ".") -> list[dict]:
    """Expand emit targets into records (emit_emitp.go; golden suites
    dsl-emit / dsl-parameterized-emit): N keynames consume the first N
    map levels into keyname fields (consumed keys drop out of emitp
    name paths — dsl-emit/0013 `a=pan, sums.pan=...`); after that,
    emitp flattens the remainder into ONE record under `name.k1.k2`
    while emit splits nested maps one record per key. Lashed targets
    iterate the FIRST target's keys."""
    if keynames:
        kn, rest = keynames[0], keynames[1:]
        first = vals[0]
        if isinstance(first, dict):
            recs = []
            for kk in first.keys():
                subvals = [_index_value(v, kk) if isinstance(v, (dict, list))
                           else None for v in vals]
                # NON-LASHED emit with >1 keynames switches to EMITP
                # semantics after the first level
                # (executeIndexedNonLashedEmitAux recurses into
                # ...EmitPAux when indices remain); the LASHED variant
                # merges residual maps plainly at exhaustion
                sub_prefixed = prefixed or (bool(rest) and len(names) == 1)
                for r in _emit_records(sub_prefixed, names,
                                       subvals, rest, rooted=True,
                                       sep=sep):
                    recs.append({kn: kk, **r})
            return recs
        # scalar with keynames remaining: extras ignored (dsl-emit/0015)
    if not prefixed and len(names) == 1 and not rooted:
        base, _path = names[0]
        return _emit_split(base, vals[0])
    rec: dict = {}
    for (base, path), v in zip(names, vals):
        if isinstance(v, (dict, list)):
            if prefixed:
                _flatten_into(rec, path, v, sep=sep)
            else:
                # non-prefixed residue maps SPLAT into the record
                # (executeIndexedNonLashedEmitAux PutCopy per entry)
                _flatten_into(rec, None, v, sep=sep)
        elif v is not None:
            fb = path if prefixed else base
            rec[fb if fb is not None else "_"] = v
    return [rec] if rec else []


def _redirect_items(seq, env, t, redir):
    """Resolve an output redirect to its item buffer: None means
    stdout (the normal stream); stderr and file targets accumulate
    ("rec"|"text"|"textn", payload) items that the harness renders
    after the run (cst output-handler semantics)."""
    if redir is None:
        return None
    mode, tgt = redir
    if mode == "pipe":
        import os as _os

        if _os.environ.get("MLR_NO_SHELL", "") not in ("", "0", "false"):
            from miller_ray.functions import FatalError

            raise FatalError(
                "mlr: piped redirects are disabled by --no-shell / "
                "MLR_NO_SHELL")
        cmd = _to_str(_scalarize(_unseq_val(tgt(t, env))))
        pipes = seq.setdefault("outpipes", {})
        ent = pipes.setdefault(cmd, {"items": []})
        return ent["items"]
    if tgt == "stdout":
        if seq.get("tag_stdout_redirect"):
            # the harness renders explicit >stdout redirect output
            # through the put-level writer format, separately from the
            # pass-through stream (dsl-output-redirects/0070)
            return seq.setdefault("stdout_redir_items", [])
        return None
    if tgt == "stderr":
        return seq.setdefault("stderr_items", [])
    path = _to_str(_scalarize(_unseq_val(tgt(t, env))))
    files = seq.setdefault("outfiles", {})
    ent = files.get(path)
    if ent is None:
        ent = {"mode": mode, "items": []}
        files[path] = ent
    return ent["items"]


def _seq_push_recs(seq, recs):
    dv = seq.get("divert")
    if dv is not None:
        dv.extend(("rec", dict(r)) for r in recs)
        return
    if not recs:
        return
    if seq.get("buf"):  # pending printn output joins the next line
        seq.setdefault("outq", []).append(("textn", seq["buf"]))
        seq["texts"].append(seq["buf"])
        seq["buf"] = ""
    seq["emitted"].extend(recs)
    seq.setdefault("outq", []).extend(("rec", r) for r in recs)


def _seq_push_text(seq, line):
    dv = seq.get("divert")
    if dv is not None:
        dv.append(("text", line))
        return
    seq["texts"].append(line)
    seq.setdefault("outq", []).append(("text", line))


def _seq_emit(variant, targets, keyexprs, t, env, seq):
    oos = seq["oos"]
    if variant == "emitf":
        rec = {}
        for tg in targets:
            if tg[0] == "ref":
                name, v = tg[1], oos.get(tg[1])
            elif tg[0] == "lref":
                name = tg[1]
                v = _scope_lookup(env, name)
                v = None if v is _ABSENT else v
            else:  # ("named_expr", name, e) — $field emittable
                name = tg[1]
                v = _scalarize(tg[2](t, env))
            if v is not None:
                rec[name] = v
        if rec:
            _seq_push_recs(seq, [rec])
        return
    prefixed = variant == "emitp"
    keynames = [str(_scalarize(e(t, env))) for e in keyexprs]
    if any(tg == ("all",) or (tg[0] == "ref" and tg[1] == "*"
                              and not tg[2]) for tg in targets):
        # `emit all` / `emit @*`: every oosvar, non-lashed
        # (emit_emitp.go Execute topLevelEvaluableMap path). With
        # keynames, executeIndexed demands EVERY value be a map —
        # one scalar kills the whole emit (dsl-parameterized-emit/0058)
        if keyexprs and any(not isinstance(v, dict)
                            for v in oos.values()):
            return
        for nm in list(oos):
            _seq_emit(variant, [("ref", nm, [])], keyexprs, t, env, seq)
        return
    if len(targets) == 1 and targets[0][0] == "expr":
        v0 = targets[0][1](t, env)
        if isinstance(v0, dict):
            # nameless map emittable ($*, {...}): each top-level
            # key/value is its own (non-lashed) named emittable
            # (emit_emitp.go topLevelEvaluableMap -> names/values per
            # map entry; dsl-redirects/0126: emit $* writes one record
            # per field)
            for k2, v2 in v0.items():
                _seq_emit(variant, [("const_named", k2, v2)],
                          keyexprs, t, env, seq)
            return
    names, vals = [], []
    for tg in targets:
        if tg[0] == "lref":
            lv = _scope_lookup(env, tg[1])
            names.append((tg[1], tg[1]))
            vals.append(None if lv is _ABSENT else lv)
        elif tg[0] == "const_named":
            names.append((tg[1], tg[1]))
            vals.append(tg[2])
        elif tg[0] == "named_expr":
            ev = tg[2](t, env)
            if not isinstance(ev, (dict, list)):
                ev = _scalarize(ev)
            names.append((tg[1], tg[1]))
            vals.append(ev)
        elif tg[0] == "ref":
            _, name, idx = tg
            v = oos.get(name)
            for ie in idx:
                kk = _scalarize(ie(t, env))
                v = _index_value(v, kk)
            # indexed targets keep the BASE name as the emitted column
            # prefix (dsl-lashed-emitp-singles/0013: emitp @a[111],"t"
            # -> t=...,a=...)
            names.append((name, name))
            vals.append(v)
        else:
            v = tg[1](t, env)
            if not isinstance(v, (dict, list)):
                v = _scalarize(v)
            names.append((None, None))
            vals.append(v)
    if keynames and not isinstance(vals[0], (dict, list)):
        return  # keynames demand a map target; scalar emits nothing
        # (dsl-parameterized-emit/0021)
    if prefixed and len(names) > 1 and any(
            nm[0] is None for nm in names):
        return  # emitp lash requires NAMED targets
        # (dsl-lashed-emitp-singles/0075)
    if len(names) > 1 and any(v is None for v in vals):
        return  # a lashed target that is absent kills the whole emit
        # (dsl-lashed-emitp-singles/0037)
    if not keynames and len(names) > 1:
        if all(not isinstance(v, (dict, list)) for v in vals):
            # lashed scalars merge into ONE record (dsl-emit/0009,
            # dsl-lashed-emitp-singles/0024)
            rec = {nm[1] if prefixed else (nm[1] or "_"): v
                   for nm, v in zip(names, vals) if v is not None}
            if rec:
                _seq_push_recs(seq, [rec])
            return
        if not prefixed:
            # lashed maps without keynames: each target emits its own
            # record stream in sequence (dsl-emit/0010)
            for nm, v in zip(names, vals):
                _seq_push_recs(seq, _emit_records(
                    False, [nm], [v], [], sep=seq.get("flatsep", ".")))
            return
        # emitp lashed maps merge into ONE flattened record
        # (dsl-emit/0008)
    _seq_push_recs(seq, _emit_records(prefixed, names, vals, keynames,
                                      sep=seq.get("flatsep", ".")))


_ACC_OPS = {"+=": "sum", "-=": "sum", "*=": "prod"}


def _acc_oassign(name, idx_exprs, op, rhs, t, env, mask, acc):
    """Vectorized per-block PARTIAL for an associative @oosvar
    accumulator (the engine path for the aggregating-put idiom —
    reference ``pkg/dsl/cst/statements/assignments``): += / -= / *=
    reduce the batch once; 1-level [key] indexing pre-aggregates per
    group inside the block (combiner before the tiny driver merge)."""
    if op not in _ACC_OPS:
        raise DslError(f"@oosvar {op} is not associative; only "
                       "+= -= *= run distributed (use put -q with the "
                       "sequential interpreter otherwise)")
    if len(idx_exprs) > 1:
        raise DslError("distributed @oosvar supports at most one [key]")
    kind = _ACC_OPS[op]
    n = t.num_rows
    val = _unscalar(rhs(t, env))
    ent = acc.setdefault(name, {"op": op, "grouped": bool(idx_exprs),
                                "val": None, "vals": {}})
    if ent["op"] != op or ent["grouped"] != bool(idx_exprs):
        raise DslError(f"@{name} mixes accumulator shapes")
    if not idx_exprs:
        if _is_arr(val):
            arr = val.combine_chunks() if isinstance(
                val, pa.ChunkedArray) else val
            if mask is not None:
                arr = arr.filter(pa.array(mask))
            part = _unscalar(pc.sum(arr) if kind == "sum"
                             else pc.product(arr))
        else:
            cnt = int(mask.sum()) if mask is not None else n
            if val is None or cnt == 0:
                part = None
            else:
                part = val * cnt if kind == "sum" else val ** cnt
        if part is not None:
            cur = ent["val"]
            ent["val"] = part if cur is None else (
                cur + part if kind == "sum" else cur * part)
        return
    keys = _materialize(_unscalar(idx_exprs[0](t, env)), n)
    varr = _materialize(val, n)
    kp = keys.to_pandas()
    vp = varr.to_pandas()
    if mask is not None:
        kp, vp = kp[mask], vp[mask]
    grp = vp.groupby(kp, sort=False)
    part = grp.sum() if kind == "sum" else grp.prod()
    vals = ent["vals"]
    for kk, pv in part.items():
        if isinstance(kk, np.generic):
            kk = kk.item()
        if isinstance(pv, np.generic):
            pv = pv.item()
        cur = vals.get(kk)
        vals[kk] = pv if cur is None else (
            cur + pv if kind == "sum" else cur * pv)


_FLOAT_STR_RE = None
_FLOAT_TOKEN_RE = None


def _json_scalar(v, ofmt: str | None = None) -> str:
    """One scalar in Miller's JSON output (pkg/mlrval json); ofmt is
    the MLR_OFMT float formatter (regtester.go:161 sets %.8f)."""
    import json

    if v is None:
        return '""'
    if type(v).__name__ == "_MlrNull":
        return "null"
    if isinstance(v, bytes):
        # bytes render as lowercase hex (mlrval_output.go:96)
        return json.dumps(v.hex())
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f.is_integer() and abs(f) < 1e15:
            return str(int(f))
        return (ofmt % f) if ofmt else repr(f)
    return json.dumps(str(v))


def _mlr_json(v, level: int = 0, ofmt: str | None = None) -> str:
    """Miller's vertical JSON rendering (dump / print of collections;
    pkg/output json): maps always multiline with 2-space indent,
    arrays single-line when all elements are scalars."""
    pad = "  " * level
    if isinstance(v, dict):
        if not v:
            return "{}"
        inner = ",\n".join(
            f'{"  " * (level + 1)}"{_fmt_key(k)}": '
            f"{_mlr_json(vv, level + 1, ofmt)}" for k, vv in v.items())
        return "{\n" + inner + "\n" + pad + "}"
    if isinstance(v, list):
        if all(not isinstance(e, (dict, list)) for e in v):
            return "[" + ", ".join(_json_scalar(e, ofmt) for e in v) + "]"
        inner = ",\n".join(
            f'{"  " * (level + 1)}{_mlr_json(e, level + 1, ofmt)}'
            for e in v)
        return "[\n" + inner + "\n" + pad + "]"
    return _json_scalar(v, ofmt)


def _print_render(v, ofmt: str | None = None) -> str:
    if v is None:
        return ""
    if isinstance(v, (dict, list)):
        return _mlr_json(v, ofmt=ofmt)
    if isinstance(v, bool):
        return "true" if v else "false"
    if ofmt is not None:
        # regtest sets MLR_OFMT (%.8f): FLOAT-typed values re-render
        # through the formatter (mlrval_output.go:21-23). Strings that
        # infer as float (fmtnum output is FromInferredType) count too.
        if isinstance(v, float):
            return ofmt % v
        if isinstance(v, str):
            global _FLOAT_STR_RE
            if _FLOAT_STR_RE is None:
                import re as _re
                _FLOAT_STR_RE = _re.compile(
                    r"[-+]?(\d+\.\d*|\.\d+|\d+[eE][-+]?\d+|"
                    r"\d+\.\d*[eE][-+]?\d+|\.\d+[eE][-+]?\d+)")
            if _FLOAT_STR_RE.fullmatch(v):
                return ofmt % float(v)
            # concatenations like "y is ".string($y) stringified a
            # float BEFORE the formatter could see it — re-render
            # embedded float literals, but only FREE-STANDING ones:
            # digits inside larger tokens (ISO timestamps
            # 00:00:00.123456Z) must stay verbatim
            global _FLOAT_TOKEN_RE
            if _FLOAT_TOKEN_RE is None:
                import re as _re
                _FLOAT_TOKEN_RE = _re.compile(
                    r"(?<![\w:.\-+])[-+]?(\d+\.\d*|\.\d+)"
                    r"([eE][-+]?\d+)?(?![\w:.])")
            if _FLOAT_TOKEN_RE.search(v):
                return _FLOAT_TOKEN_RE.sub(
                    lambda m: ofmt % float(m.group(0)), v)
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        # Go FormatFloat('f', -1) renders integral floats without ".0"
        return str(int(v))
    return str(v)


def _run_records_impl(self, records: list[dict], seeds: list[dict] | None
                      = None, quiet=False, ofmt: str | None = None,
                      want_filter=False, sinks: dict | None = None,
                      flatsep: str = ".", end_nr: int | None = None,
                      invert=False, tag_stdout_redirect=False):
    """Wrapper installing the process-wide float formatter (MLR_OFMT
    analogue) for the duration of the run; see _run_records_body.
    ``sinks``, when given, receives redirect output: sinks["files"] =
    {path: {"mode", "items"}}, sinks["stderr"] = [items]."""
    from miller_ray import functions as _bifs

    saved = _bifs.OFMT
    if ofmt is not None:
        _bifs.OFMT = ofmt
    try:
        return _run_records_body(self, records, seeds, quiet, ofmt,
                                 want_filter, sinks, flatsep, end_nr,
                                 invert, tag_stdout_redirect)
    finally:
        _bifs.OFMT = saved


def run_script(prog, records, ofmt=None, flatsep="."):
    """mlr script (transformers/script.go): the whole program runs
    ONCE; the DSL next() function advances a record cursor, loading
    each input record into $-space and returning false at EOF.
    Returns (emitted records, text output lines)."""
    from miller_ray import functions as _bifs

    saved = _bifs.OFMT
    if ofmt is not None:
        _bifs.OFMT = ofmt
    try:
        seq = {"oos": {}, "emitted": [], "texts": [], "ofmt": ofmt,
               "flatsep": flatsep}
        srec: dict = {}
        cur = {"i": 0}

        def _next():
            if cur["i"] >= len(records):
                return False
            srec.clear()
            srec.update(records[cur["i"]])
            cur["i"] += 1
            return True

        env = {"\x00seq": seq, "\x00funcs": getattr(prog, "funcs", {}),
               "\x00subrs": getattr(prog, "subrs", {}),
               "\x00scopes": [{}], "\x00prog": prog,
               "\x00srec": srec, "\x00script_next": _next}
        state = {"mask": None, "bare": None}
        empty = pa.table({})
        stmts = list(getattr(prog, "begin", []) or []) + \
            list(prog.statements) + list(getattr(prog, "end", []) or [])
        prog._exec(stmts, empty, env, None, state)
        # emitted records also appear in outq ("rec", r); emitted alone
        # is the deduplicated record list
        return list(seq["emitted"]), list(seq["texts"])
    finally:
        _bifs.OFMT = saved


def _run_records_body(self, records, seeds=None, quiet=False, ofmt=None,
                      want_filter=False, sinks=None, flatsep=".",
                      end_nr=None, invert=False,
                      tag_stdout_redirect=False):
    """Row-at-a-time execution over ordered record dicts with full
    cross-record semantics (@oosvars, begin/end, emit, dump/print,
    locals, loops, user functions). Returns (records, texts): emitted +
    passed-through records in stream order, and raw text output lines.
    Conformance-scale only — the distributed engine path for the
    aggregating-put idiom is verbs.put_oosvar.

    seeds: optional per-record context dicts ({'\\x00NR': ..}).
    want_filter: treat the program as a ``filter`` verb — keep a record
    when the final bare expression (or filter-keyword mask) is truthy."""
    oos: dict = {}
    seq = {"oos": oos, "emitted": [], "texts": [], "ofmt": ofmt,
           "flatsep": flatsep,
           "tag_stdout_redirect": tag_stdout_redirect}
    funcs = getattr(self, "funcs", {})
    subrs = getattr(self, "subrs", {})
    out_records: list[dict] = []
    texts: list[str] = []
    stream: list[tuple] = []  # ("rec", dict) | ("text", str) in order
    empty = pa.table({})

    def drain():
        stream.extend(seq.get("outq") or [])
        seq["outq"] = []
        out_records.extend(seq["emitted"])
        seq["emitted"].clear()
        texts.extend(seq["texts"])
        seq["texts"].clear()

    def base_env():
        return {"\x00seq": seq, "\x00funcs": funcs,
                "\x00subrs": subrs, "\x00scopes": [{}],
                "\x00prog": self}

    if self.begin:
        env = base_env()
        env["\x00srec"] = {}  # no current record: $reads absent,
        # $writes discarded; keeps control flow on the scalar path
        state = {"mask": None, "bare": None}
        self._exec(self.begin, empty, env, None, state)
        drain()
    nr = 0
    for i, rec in enumerate(records):
        nr = i + 1
        srec = dict(rec)
        env = base_env()
        env["\x00srec"] = srec
        env["\x00NR"] = nr
        env["\x00FNR"] = nr
        if seeds and i < len(seeds):
            env.update(seeds[i])
        state = {"mask": None, "bare": None}
        try:
            self._exec(self.statements, empty, env, None, state)
        except Exception as e:  # noqa: BLE001 — attach the partial
            # stream so should-fail golden cases can verify the output
            # written BEFORE the fatal error (regtester expout)
            drain()
            e.partial = (list(out_records), list(texts), list(stream))
            raise
        drain()
        if not quiet:
            keep = True
            pred = state["bare"] if want_filter and \
                state["bare"] is not None else state["mask"]
            if want_filter and state["bare"] is None and \
                    state["mask"] is None:
                keep = False
            if pred is not None:
                keep = bool(_scalarize(pred)) if _is_arr(pred) \
                    else bool(pred)
            if want_filter and invert:
                # filter -x: exclude records the expression selects
                # (filter.go -x; dsl-context-specific-validation/0020)
                keep = not keep
            if keep:
                out_records.append(srec)
                if seq.get("buf"):  # printn output joins this line
                    stream.append(("textn", seq["buf"]))
                    texts.append(seq["buf"])
                    seq["buf"] = ""
                stream.append(("rec", srec))
    if self.end:
        env = base_env()
        env["\x00srec"] = {}
        # the end block's context carries the READER's final NR (total
        # records read from input), which upstream dropping verbs like
        # `head -g` do not shrink (verb-head-early-out/0002)
        env["\x00NR"] = nr if end_nr is None else end_nr
        env["\x00FNR"] = nr if end_nr is None else end_nr
        state = {"mask": None, "bare": None}
        self._exec(self.end, empty, env, None, state)
        drain()
    if seq.get("buf"):  # unterminated printn output
        buf = seq.pop("buf")
        texts.append(buf)
        stream.append(("text", buf))
    if sinks is not None:
        sinks["files"] = seq.get("outfiles", {})
        sinks["stderr"] = seq.get("stderr_items", [])
        sinks["pipes"] = seq.get("outpipes", {})
        sinks["stdout_redir"] = seq.get("stdout_redir_items", [])
    return out_records, texts, stream


Program.run_records = _run_records_impl


def _table_records(t: pa.Table) -> list[dict]:
    """Arrow table -> ordered record dicts; nulls/NaN (union-schema
    fill for heterogeneous inputs) become absent."""
    out = []
    for row in t.to_pylist():
        out.append({k: v for k, v in row.items()
                    if v is not None and not (
                        isinstance(v, float) and np.isnan(v))})
    return out


def _run_sequential_impl(self, t: pa.Table, seed_env=None, quiet=False,
                         ofmt: str | None = None, want_filter=False):
    """Back-compat wrapper: run_records over an Arrow table, exploding
    vector-valued seed_env entries (NR arrays etc.) per row."""
    seed_env = seed_env or {}
    n = t.num_rows
    seeds: list[dict] = [{} for _ in range(n)]
    for kk, vv in seed_env.items():
        if _is_arr(vv) and len(vv) == n:
            pyvals = (vv.combine_chunks() if isinstance(
                vv, pa.ChunkedArray) else vv).to_pylist()
            for i in range(n):
                seeds[i][kk] = pyvals[i]
        else:
            for i in range(n):
                seeds[i][kk] = vv
    return self.run_records(_table_records(t), seeds=seeds, quiet=quiet,
                            ofmt=ofmt, want_filter=want_filter)


Program.run_sequential = _run_sequential_impl


def _concat_vals(a, b):
    a, b = _to_str(a), _to_str(b)
    if _is_arr(a) and _is_arr(b):
        return pc.binary_join_element_wise(a, b, "")
    if _is_arr(a):
        return pc.binary_join_element_wise(a, pa.array([b] * len(a)), "")
    return a + b


def _materialize(v: Value, n: int):
    """Broadcast scalars to column length for table insertion."""
    if _is_arr(v):
        return v if not isinstance(v, pa.ChunkedArray) else v.combine_chunks()
    if isinstance(v, bool):
        return pa.array([v] * n, type=pa.bool_())
    if isinstance(v, (int, np.integer)):
        return pa.array([int(v)] * n, type=pa.int64())
    if isinstance(v, (float, np.floating)):
        return pa.array([float(v)] * n, type=pa.float64())
    return pa.array([v] * n)


def _parse_block(p: "_Parser") -> list[tuple]:
    """Parse `{ stmts }`."""
    p.expect("{")
    body = _parse_stmts(p, in_block=True)
    p.expect("}")
    return body


def _parse_emit_target(p: "_Parser"):
    """One emittable: an @oosvar reference (possibly indexed) parsed
    structurally so emit can name output fields, `all` (every
    oosvar), or a general expression (map literal, function call,
    $*)."""
    k, v = p.peek()
    if (k, v) == ("ident", "all"):
        p.next()
        return ("all",)
    if k == "ident" and p.toks[p.i + 1: p.i + 2] != [("op", "(")]:
        p.next()
        return ("lref", v)
    if k == "ident" and v not in ("all",):
        # function-call emittable: named by the function
        # (emitKeyName of a callsite; dsl-lashed-emitp-singles/0060)
        e = p.expr()
        return ("named_expr", v, e)
    if k == "field" and v != "$*":
        # field-rooted emittable: named by the base field
        # (emit_emitp.go emitKeyName; dsl-lashed-emitp-singles/0057)
        name = _field_name(v)
        e = p.expr()
        return ("named_expr", name, e)
    if k == "oosvar":
        p.next()
        name = _field_name(v)
        idx: list[Expr] = []
        while p.peek() == ("op", "["):
            p.next()
            idx.append(p.expr())
            p.expect("]")
        return ("ref", name, idx)
    return ("expr", p.expr())


def _parse_redirect(p: "_Parser"):
    """Optional output redirect after an output-statement keyword
    (mlr.bnf Redirector): `> target` write, `>> target` append,
    `| cmd` pipe (unsupported). stdout/stderr are keyword targets."""
    k, v = p.peek()
    if k != "op" or v not in (">", ">>", "|"):
        return None
    p.next()
    if v == "|":
        # pipe redirect: rendered output streams through a shell
        # command (cst output-handler pipe targets)
        return ("pipe", p.expr())
    mode = "a" if v == ">>" else "w"
    if v == ">" and p.peek() == ("op", ">"):
        p.next()
        mode = "a"
    nk, nv = p.peek()
    if nk == "ident" and nv in ("stdout", "stderr") and \
            p.toks[p.i + 1: p.i + 2] != [("op", "(")]:
        p.next()
        return (mode, nv)
    return (mode, p.expr())


def _parse_emit(p: "_Parser", variant: str) -> tuple:
    """emit/emitp/emitf statement (pkg/dsl/cst/emit_emitp.go), with
    optional `> file,` / `>> file,` / `> stderr,` redirect."""
    redir = _parse_redirect(p)
    if redir is not None:
        p.expect(",")
    targets: list[tuple] = []
    if variant == "emitf":
        while True:
            tg = _parse_emit_target(p)
            # emitf takes named emittables: @oosvar (unindexed), local
            # var, or $field (emitf.go:39 'emitf a,$b,@c' — key is the
            # bare name, getNameFromNamedNode)
            ok = (tg[0] == "ref" and not tg[2]) or \
                tg[0] in ("lref", "named_expr")
            if not ok:
                raise DslError("emitf takes unindexed variable names")
            targets.append(tg)
            if p.peek() == ("op", ","):
                p.next()
                continue
            break
        return ("emit", "emitf", targets, [], redir)
    if p.peek() == ("op", "("):
        # lashed list: emit (@a, @b), "key"
        p.next()
        while True:
            targets.append(_parse_emit_target(p))
            if p.peek() == ("op", ","):
                p.next()
                continue
            break
        p.expect(")")
    else:
        targets.append(_parse_emit_target(p))
    keyexprs: list[Expr] = []
    while p.peek() == ("op", ","):
        p.next()
        keyexprs.append(p.expr())
    return ("emit", variant, targets, keyexprs, redir)


def _parse_stmts(p: "_Parser", in_block: bool = False,
                 top: dict | None = None) -> list[tuple]:
    stmts: list[tuple] = []
    need_sep = False
    while True:
        k, v = p.peek()
        if k == "eof" or (in_block and v == "}"):
            return stmts
        if v == ";":
            p.next()
            need_sep = False
            continue
        if need_sep and p.toks[p.i - 1: p.i] != [("op", "}")]:
            # statements require ';' separators unless the previous
            # one ended with '}' (mlr.bnf StatementBlock rules;
            # dsl-parse/0114 'x x' is a parse error)
            raise DslError(f"missing ';' before {v!r}")
        need_sep = True
        if k == "ident" and v in ("begin", "end") and in_block and \
                p.toks[p.i + 1: p.i + 2] == [("op", "{")]:
            # context validation: begin/end only at top level
            # (cst validators; dsl-context-specific-validation/0001-4)
            raise DslError(f"{v} blocks must be top-level")
        if k == "ident" and v in ("begin", "end") and not in_block and \
                p.toks[p.i + 1: p.i + 2] == [("op", "{")]:
            p.next()
            i0 = p.i
            body = _parse_block(p)
            # context validation: no $-field access inside begin/end
            # (there is no current record; cst validators;
            # dsl-context-specific-validation/0005-6)
            for tk, tv in p.toks[i0:p.i]:
                if tk in ("field", "posfield"):
                    raise DslError(
                        f"${{...}} not allowed in {v} blocks ({tv})")
            if top is None:
                raise DslError(f"{v} block not allowed here")
            # each begin/end block is its own local scope (udf.go
            # stack frames; dsl-user-defined-functions-and-subroutines
            # 0031: a local from one begin block is absent in the next)
            top.setdefault(v, []).append(("scopeblock", body))
            continue
        if k == "ident" and v == "emit1":
            p.next()
            stmts.append(("emit1", p.expr()))
        elif k == "ident" and v in ("emit", "emitp", "emitf"):
            p.next()
            stmts.append(_parse_emit(p, v))
        elif k == "ident" and v in ("dump", "edump"):
            p.next()
            stderr = v == "edump"
            redir = None if stderr else _parse_redirect(p)
            exprs: list = []
            if redir is not None and p.peek() == ("op", ","):
                p.next()
            if not (p.peek()[1] in (";", "}") or p.peek()[0] == "eof"):
                exprs.append(p.expr())
                while p.peek() == ("op", ","):
                    p.next()
                    exprs.append(p.expr())
            e0 = exprs[0] if len(exprs) == 1 else None
            if len(exprs) <= 1:
                stmts.append(("edump", e0) if stderr
                             else ("dump", e0, redir))
            else:
                # dump a, b prints each value on its own line
                for e1 in exprs:
                    stmts.append(("edump", e1) if stderr
                                 else ("dump", e1, redir))
        elif k == "ident" and v in ("print", "printn", "eprint",
                                    "eprintn"):
            p.next()
            nl = v in ("print", "eprint")
            kind2 = "eprint" if v.startswith("e") else "print"
            redir = None if v.startswith("e") else _parse_redirect(p)
            if redir is not None and p.peek() == ("op", ","):
                p.next()
            if p.peek()[1] in (";", "}") or p.peek()[0] == "eof":
                stmts.append((kind2, None, nl) if v.startswith("e")
                             else (kind2, None, nl, redir))
            else:
                exprs = [p.expr()]
                while p.peek() == ("op", ","):
                    # print a, b renders space-joined (cst/print.go:344)
                    p.next()
                    exprs.append(p.expr())
                e1 = exprs[0] if len(exprs) == 1 else ("\x00joined", exprs)
                stmts.append((kind2, e1, nl) if v.startswith("e")
                             else (kind2, e1, nl, redir))
        elif k == "ident" and v == "tee":
            p.next()
            redir = _parse_redirect(p)
            if redir is None:
                raise DslError("tee requires a redirect target")
            p.expect(",")
            if p.peek()[0] != "field" or p.peek()[1] != "$*":
                raise DslError("tee payload must be $*")
            p.next()
            stmts.append(("teestmt", redir))
        elif k == "ident" and v in ("func", "subr") and \
                p.toks[p.i + 1: p.i + 2] and p.toks[p.i + 1][0] == "ident":
            # func name(params) [: rettype] { body } (pkg/dsl/cst/udf.go)
            p.next()
            _, fname = p.next()
            if v == "func" and (fname in REGISTRY or fname in _HOFS):
                # SUBROUTINES live in their own namespace and may
                # shadow builtin function names (udf.go: subr log
                # is legal; dsl-user-defined-functions/0009)
                raise DslError(f"cannot redefine builtin {fname!r}")
            params = p.params()
            rettype = None
            if p.peek() == ("op", ":"):
                p.next()
                tk, tv = p.next()
                if tk != "ident" or tv not in _TYPE_CHECKS:
                    raise DslError(f"bad return type {tv!r}")
                rettype = tv
            body = _parse_block(p)
            if top is None:
                raise DslError(f"{v} definitions must be top-level")
            ns = "subrs" if v == "subr" else "funcs"
            if fname in top.get(ns, {}):
                # duplicate definition is fatal (udf.go
                # "function/subroutine named X has already been
                # defined"; dsl-user-defined-functions 0027-0029)
                from miller_ray.functions import FatalError

                kind2 = "subroutine" if v == "subr" else "function"
                raise FatalError(
                    f"mlr: {kind2} named \"{fname}\" has already "
                    "been defined.")
            _check_return_shape(body, v)
            top.setdefault(ns, {})[fname] = \
                ("\x00funcval", params, body, None, rettype)
        elif k == "ident" and v == "call":
            p.next()
            ck, cname = p.next()
            if ck != "ident":
                raise DslError("call expects a subroutine name")
            p.expect("(")
            argexprs: list[Expr] = []
            if p.peek() != ("op", ")"):
                argexprs.append(p.expr())
                while p.peek() == ("op", ","):
                    p.next()
                    argexprs.append(p.expr())
            p.expect(")")
            stmts.append(("callsubr", cname, argexprs))
        elif k == "ident" and v == "while":
            p.next()
            p.expect("(")
            cond = p.expr()
            p.expect(")")
            stmts.append(("while", cond, _parse_block(p)))
        elif k == "ident" and v == "do":
            p.next()
            body = _parse_block(p)
            if p.peek() != ("ident", "while"):
                raise DslError("expected 'while' after do-block")
            p.next()
            p.expect("(")
            cond = p.expr()
            p.expect(")")
            stmts.append(("dowhile", body, cond))
        elif k == "ident" and v == "for":
            p.next()
            stmts.append(_parse_for(p))
        elif k == "ident" and v == "break":
            p.next()
            stmts.append(("break",))
        elif k == "ident" and v == "continue":
            p.next()
            stmts.append(("continue",))
        elif k == "ident" and v == "return":
            p.next()
            if p.peek()[1] in (";", "}") or p.peek()[0] == "eof":
                stmts.append(("return", None))
            else:
                stmts.append(("return", p.expr()))
        elif k == "ident" and v in _TYPE_CHECKS and \
                p.toks[p.i + 1: p.i + 2] and p.toks[p.i + 1][0] == "ident":
            stmts.append(_parse_localdecl(p))
        elif k == "ident" and v not in ("begin", "end") and \
                _assign_ahead(p, p.i + 1):
            p.next()
            idx = []
            while True:
                if p.peek() == ("op", "["):
                    p.next()
                    idx.append(p.expr())
                    p.expect("]")
                elif p.peek() == ("op", ".") and \
                        p.toks[p.i + 1: p.i + 2] and \
                        p.toks[p.i + 1][0] == "ident":
                    # dot-path lvalue: m.foo = ... == m["foo"] = ...
                    # (dsl-env/0009 ENV.FOO = "bar")
                    p.next()
                    _, nm = p.next()
                    idx.append(lambda t, env, nm=nm: nm)
                else:
                    break
            _, op = p.next()
            if v == "ENV" and len(idx) > 1:
                from miller_ray.functions import FatalError

                raise FatalError("mlr: ENV[...] cannot be indexed")
            if idx:
                stmts.append(("lidxassign", v, idx, op, p.expr()))
            else:
                stmts.append(("localassign", v, op, p.expr()))
        elif k == "oosvar" and _assign_ahead(p, p.i + 1):
            p.next()
            name = _field_name(v)
            idx: list[Expr] = []
            while p.peek() == ("op", "["):
                p.next()
                idx.append(p.expr())
                p.expect("]")
            _, op = p.next()
            if op not in _ASSIGN_OPS:
                raise DslError(f"expected assignment op, got {op!r}")
            rhs = p.expr()
            if name == "*":
                if idx or op != "=":
                    raise DslError("@* assignment must be plain '='")
                stmts.append(("oall_assign", rhs))
            else:
                stmts.append(("oassign", name, idx, op, rhs))
        elif k == "ident" and v == "unset":
            p.next()
            targets: list[tuple] = []
            while True:
                fk, fv = p.next()
                idx: list[Expr] = []
                if fk in ("field", "oosvar"):
                    name = _field_name(fv)
                    while p.peek() == ("op", "["):
                        p.next()
                        idx.append(p.expr())
                        p.expect("]")
                    if name == "*":
                        targets.append(("srec_all", idx) if fk == "field"
                                       else ("oos_all", idx))
                    else:
                        targets.append((
                            "field" if fk == "field" else "oos", name, idx))
                elif fk == "ident" and fv == "all":
                    # `unset all` clears every @oosvar
                    # (pkg/dsl/cst unset-all)
                    targets.append(("oos_all",))
                elif fk == "posfield":
                    # unset $[[n]] / $[[[n]]] (drop the n-th field) and
                    # unset $[expr] (drop the field NAMED by expr)
                    # (pkg/dsl/cst/statements/unset.go positional)
                    nclose2 = {"$[": 1, "$[[": 2, "$[[[": 3}[fv]
                    e2 = p.expr()
                    for _ in range(nclose2):
                        p.expect("]")
                    p.force_seq = True
                    targets.append(("posfield", fv, e2))
                elif fk == "ident":
                    while p.peek() == ("op", "["):
                        p.next()
                        idx.append(p.expr())
                        p.expect("]")
                    targets.append(("local", fv, idx))
                else:
                    raise DslError("unset expects $field/@oosvar/local "
                                   "names")
                if p.peek() == ("op", ","):
                    p.next()
                    continue
                break
            if len(targets) == 1 and targets[0][0] == "field" and \
                    not targets[0][2]:
                stmts.append(("unset", targets[0][1]))
            elif len(targets) == 1 and targets[0][0] == "oos" and \
                    not targets[0][2]:
                stmts.append(("ounset", targets[0][1]))
            else:
                stmts.append(("unset_multi", targets))
        elif k == "ident" and v == "if":
            # if (cond) {..} [elif (cond) {..}]* [else {..}]
            p.next()
            p.expect("(")
            cond = p.expr()
            p.expect(")")
            branches = [(cond, _parse_block(p))]
            while p.peek() == ("ident", "elif"):
                p.next()
                p.expect("(")
                c2 = p.expr()
                p.expect(")")
                branches.append((c2, _parse_block(p)))
            if p.peek() == ("ident", "else"):
                p.next()
                branches.append((None, _parse_block(p)))
            stmts.append(("cond", branches))
        elif k == "ident" and v == "filter" and \
                p.toks[p.i + 1: p.i + 2] != [("op", "(")]:
            p.next()
            stmts.append(("filter", p.expr()))
        elif k == "field" and _assign_ahead(p, p.i + 1):
            _, ftok = p.next()
            fname = _field_name(ftok)
            fidx: list[Expr] = []
            while True:
                if p.peek() == ("op", "["):
                    p.next()
                    fidx.append(p.expr())
                    p.expect("]")
                elif p.peek() == ("op", ".") and \
                        p.toks[p.i + 1: p.i + 2] and \
                        p.toks[p.i + 1][0] == "ident":
                    # dot-path lvalue: $*.foo.bar = ... == $*["foo"]["bar"]
                    # (dsl-indexing/0018-0021; cst DotOperator lvalue)
                    p.next()
                    _, nm = p.next()
                    fidx.append(lambda t, env, nm=nm: nm)
                else:
                    break
            _, op = p.next()
            rhs = p.expr()
            if fname == "*":
                if fidx:
                    # $*[idx]... = value: indexed path into the whole
                    # record; an array index splices into the key path
                    # (dsl-array-map-indexing/0004/0005/0062-0068)
                    if op != "=":
                        raise DslError(
                            "indexed $* assignment must be plain '='")
                    stmts.append(("srecidx_assign", fidx, rhs))
                elif op != "=":
                    raise DslError("$* assignment must be plain '='")
                else:
                    stmts.append(("srec_assign", rhs))
            elif fidx:
                stmts.append(("fidxassign", fname, fidx, op, rhs))
            else:
                stmts.append(("assign", fname, op, rhs))
        elif k == "posfield":
            # $[[n]] = ..., $[[[n]]] = ..., $[expr] = ... statements;
            # otherwise fall through to an expression statement below.
            saved_i = p.i
            p.next()
            nexpr = p.expr()
            nclose = {"$[": 1, "$[[": 2, "$[[[": 3}[v]
            matched = True
            for _ in range(nclose):
                if p.peek() == ("op", "]"):
                    p.next()
                else:
                    matched = False
                    break
            didx: list[Expr] = []
            if matched and v == "$[":
                while p.peek() == ("op", "["):
                    p.next()
                    didx.append(p.expr())
                    p.expect("]")
            if matched and p.peek()[0] == "op" and \
                    p.peek()[1] in _ASSIGN_OPS:
                _, op = p.next()
                rhs = p.expr()
                if v == "$[":
                    stmts.append(("dynassign", nexpr, didx, op, rhs))
                else:
                    if op != "=":
                        raise DslError("positional assignment must be "
                                       "plain '='")
                    stmts.append(("posassign",
                                  "name" if v == "$[[" else "value",
                                  nexpr, rhs))
            else:
                p.i = saved_i
                e = p.expr()
                if p.peek() == ("op", "{"):
                    stmts.append(("cond", [(_pa_cond(e), _parse_block(p))]))
                else:
                    stmts.append(("expr", e))
        else:
            e = p.expr()
            if p.peek() == ("op", "{"):
                # AWK-style pattern-action: expr { stmts }
                stmts.append(("cond", [(_pa_cond(e), _parse_block(p))]))
            else:
                stmts.append(("expr", e))
        if p.peek() == ("op", ";"):
            p.next()
            need_sep = False


def _pa_cond(e):
    """Pattern-action conditions treat ABSENT as false rather than
    erroring (cond.go:57-58 Execute: condition.IsAbsent() -> false;
    dsl-null-empty-handling 0014/0016)."""
    def f(t, env, e=e):
        v = e(t, env)
        return False if v is None else v
    return f


def _check_return_shape(stmts, kind: str):
    """Parse-time return validation (pkg/dsl/cst/udf.go): func bodies
    must `return <value>`, subr bodies must use bare `return`
    (dsl-user-defined-functions-and-subroutines 0004/0005)."""
    from miller_ray.functions import FatalError

    for st in stmts:
        if not isinstance(st, tuple):
            continue
        if st[0] == "return":
            if kind == "subr" and st[1] is not None:
                raise FatalError("mlr: return statements in subr "
                                 "blocks must not return a value")
            if kind == "func" and st[1] is None:
                raise FatalError("mlr: return statements in func "
                                 "blocks must return a value")
        else:
            # recurse into nested statement lists (if/while/for bodies)
            for part in st[1:]:
                if isinstance(part, list) and part and \
                        all(isinstance(x, tuple) for x in part):
                    _check_return_shape(part, kind)
                elif isinstance(part, list):
                    for sub in part:
                        if isinstance(sub, tuple) and len(sub) == 2 \
                                and isinstance(sub[1], list):
                            _check_return_shape(sub[1], kind)


def _assign_ahead(p: "_Parser", i: int) -> bool:
    """True if the tokens from index i (just past a $field/@oosvar/local
    name) continue an assignment statement, possibly through [index]
    chains, rather than an expression."""
    depth = 0
    while i < len(p.toks):
        k, v = p.toks[i]
        if v == "[":
            depth += 1
        elif v == "]":
            depth -= 1
            if depth < 0:
                return False
        elif depth == 0:
            if k == "op" and v == "." and i + 1 < len(p.toks) and \
                    p.toks[i + 1][0] == "ident":
                # dot-path lvalue segment ($*.foo.bar = ...)
                i += 2
                continue
            return k == "op" and v in _ASSIGN_OPS
        i += 1
    return False


def _parse_localdecl(p: "_Parser") -> tuple:
    """Typed local declaration: ``var x = 3``, ``str s``, ... (grammar
    pkg/parsing typed-decl statements)."""
    _, typ = p.next()
    nk, name = p.next()
    if nk != "ident":
        raise DslError(f"expected variable name after {typ!r}")
    expr = None
    if p.peek() == ("op", "="):
        p.next()
        expr = p.expr()
    return ("localdecl", typ, name, expr)


def _parse_one_simple(p: "_Parser") -> tuple:
    """One init/update statement of a C-style for loop (assignment or
    typed declaration only)."""
    k, v = p.peek()
    if k == "ident" and v in _TYPE_CHECKS and \
            p.toks[p.i + 1: p.i + 2] and p.toks[p.i + 1][0] == "ident":
        return _parse_localdecl(p)
    if k == "ident":
        p.next()
        _, op = p.next()
        if op not in _ASSIGN_OPS:
            raise DslError(f"expected assignment in for(;;), got {op!r}")
        return ("localassign", v, op, p.expr())
    if k == "field":
        p.next()
        _, op = p.next()
        if op not in _ASSIGN_OPS:
            raise DslError(f"expected assignment in for(;;), got {op!r}")
        return ("assign", _field_name(v), op, p.expr())
    if k == "oosvar":
        p.next()
        _, op = p.next()
        if op not in _ASSIGN_OPS:
            raise DslError(f"expected assignment in for(;;), got {op!r}")
        return ("oassign", _field_name(v), [], op, p.expr())
    raise DslError("unsupported statement in for(;;) header")


def _loopvar(p: "_Parser") -> str:
    k, v = p.next()
    if k == "ident" and v in _TYPE_CHECKS and p.peek()[0] == "ident":
        _, v = p.next()  # typed loop variable; type is advisory
        k = "ident"
    if k != "ident":
        raise DslError(f"expected loop variable, got {v!r}")
    return v


def _parse_for(p: "_Parser") -> tuple:
    """for loops (pkg/dsl/cst/for.go): ``for (k in coll)``,
    ``for (k, v in coll)``, ``for ((k1, k2), v in coll)``, and C-style
    ``for (init; cond; update)``."""
    p.expect("(")
    # decide bind-form vs C-style: a ';' at paren depth 1 before the
    # closing ')' means C-style
    depth = 1
    i = p.i
    triple = False
    while i < len(p.toks):
        kk, vv = p.toks[i]
        if vv in ("(", "[", "{"):
            depth += 1
        elif vv in (")", "]", "}"):
            depth -= 1
            if depth == 0:
                break
        elif vv == ";" and depth == 1:
            triple = True
            break
        i += 1
    if triple:
        def _section():
            # a (possibly EMPTY) comma-list of simple statements
            # (for.go triple-for: `for (;;)` legal everywhere)
            items: list = []
            if p.peek() not in (("op", ";"), ("op", ")")):
                items.append(_parse_one_simple(p))
                while p.peek() == ("op", ","):
                    p.next()
                    items.append(_parse_one_simple(p))
            return items

        init = _section()
        p.expect(";")
        # middle section: leading statements then a final condition
        # EXPR (`$o3 = 3, $o4 < 4`; dsl-triple-for-loops/0017); empty
        # means loop-forever (needs break)
        cond_stmts: list = []
        cond = None
        while p.peek() != ("op", ";"):
            k5, _v5 = p.peek()
            is_stmt = False
            if k5 in ("ident", "field", "oosvar"):
                j = p.i + 1
                d5 = 0
                while j < len(p.toks):
                    kj, vj = p.toks[j]
                    if vj == "[":
                        d5 += 1
                    elif vj == "]":
                        d5 -= 1
                    elif d5 == 0:
                        is_stmt = kj == "op" and vj in _ASSIGN_OPS
                        break
                    j += 1
            if is_stmt:
                cond_stmts.append(_parse_one_simple(p))
                if p.peek() == ("op", ","):
                    p.next()
                    continue
                break
            cond = p.expr()
            break
        if cond is None and cond_stmts:
            # `for (init; a=1, b=2; upd)`: a non-empty middle section
            # must END in a bare boolean expression (for.go validation;
            # dsl-for-variants/0008 should-fail)
            raise DslError("the final triple-for continuation statement "
                           "must be a bare boolean")
        p.expect(";")
        update = _section()
        p.expect(")")
        return ("for_c", init, (cond_stmts, cond), update,
                _parse_block(p))
    keyvars: list[str] = []
    valvar = None
    if p.peek() == ("op", "("):
        p.next()
        while True:
            keyvars.append(_loopvar(p))
            if p.peek() == ("op", ","):
                p.next()
                continue
            break
        p.expect(")")
        p.expect(",")
        valvar = _loopvar(p)
    else:
        keyvars.append(_loopvar(p))
        if p.peek() == ("op", ","):
            p.next()
            valvar = _loopvar(p)
    if p.peek() != ("ident", "in"):
        raise DslError("expected 'in' in for loop")
    p.next()
    coll = p.expr()
    p.expect(")")
    allvars = keyvars + ([valvar] if valvar is not None else [])
    seen_v: set = set()
    for v3 in allvars:
        if v3 in seen_v:
            # for ((a,b), a in @*): duplicate loop variables are a
            # parse-time fatal (cst/for.go; dsl-for-oosvar-loops)
            from miller_ray.functions import FatalError

            raise FatalError("mlr: redefinition of variable "
                             f"{v3} in the same scope")
        seen_v.add(v3)
    return ("for_bind", keyvars, valvar, coll, _parse_block(p))


_SEQ_ONLY_KINDS = frozenset((
    "oassign", "ounset", "emit", "emit1", "dump", "edump", "print",
    "eprint",
    "localdecl", "localassign", "lidxassign", "fidxassign", "dynassign",
    "posassign", "srec_assign", "oall_assign", "unset_multi",
    "while", "dowhile", "for_bind", "for_c",
    "break", "continue", "return", "callsubr", "teestmt",
))


def _stmts_need_seq(stmts) -> bool:
    for kind, *rest in stmts:
        if kind in _SEQ_ONLY_KINDS:
            return True
        if kind == "cond":
            for _c, body in rest[0]:
                if _stmts_need_seq(body):
                    return True
    return False


_LOOP_KINDS = {"while", "dowhile", "for_bind", "for_c"}


def _validate_break_continue(stmts, in_loop: bool = False):
    """break/continue must appear inside a loop body (cst validators;
    dsl-context-specific-validation/0015-18). Walks nested statement
    lists; expression closures are opaque and contain no statements."""
    for st in stmts:
        if not isinstance(st, tuple) or not st:
            continue
        kind = st[0]
        if kind in ("break", "continue") and not in_loop:
            raise DslError(f"{kind} is only valid inside a loop")
        child_in_loop = in_loop or kind in _LOOP_KINDS
        for el in st[1:]:
            if isinstance(el, list) and el and all(
                    isinstance(x, tuple) and x and isinstance(x[0], str)
                    for x in el):
                _validate_break_continue(el, child_in_loop)


def _validate_no_return(stmts):
    """return is only valid inside func/subr bodies (cst validators;
    dsl-context-validation/0008). Func/subr bodies are stored in the
    `top` namespaces, so any return left in main/begin/end statement
    lists is illegal. Mirrors _validate_break_continue's walk, but
    skips "cond" branch tuples whose (expr, body) pairs nest bodies one
    level deeper."""
    for st in stmts:
        if not isinstance(st, tuple) or not st:
            continue
        if st[0] == "return":
            raise DslError(
                "return statements are only valid within func/subr blocks")
        for el in st[1:]:
            if isinstance(el, list):
                if el and all(isinstance(x, tuple) and x
                              and isinstance(x[0], str) for x in el):
                    _validate_no_return(el)
                else:
                    for sub in el:
                        if isinstance(sub, tuple):
                            for part in sub:
                                if isinstance(part, list) and part and all(
                                        isinstance(x, tuple) and x and
                                        isinstance(x[0], str)
                                        for x in part):
                                    _validate_no_return(part)


def compile_program(src: str) -> Program:
    """Parse a statement list (';'-separated; if/elif/else,
    pattern-action `cond { ... }`, begin/end blocks, @oosvar
    assignments and emit/emitp/emitf/dump/print supported) into a
    Program. Programs touching cross-record state set ``needs_seq``
    and must run through ``run_sequential`` (or an accumulator plan)."""
    p = _Parser(_lex(src))
    top: dict = {}
    stmts = _parse_stmts(p, top=top)
    if p.peek()[0] != "eof":
        raise DslError(f"unexpected trailing token {p.peek()[1]!r}")
    _validate_break_continue(stmts)
    _validate_no_return(stmts)
    for blocks in (top.get("begin") or []), (top.get("end") or []):
        _validate_break_continue(list(blocks))
        _validate_no_return(list(blocks))
    for fv in list((top.get("funcs") or {}).values()) + \
            list((top.get("subrs") or {}).values()):
        _validate_break_continue(fv[2])
    # subroutine callsites link at parse time (cst/udf.go; dsl-subr
    # 0001/0003 should-fail "subroutine name not found") — a callsite
    # may also target a funct-typed local, so only names that exist
    # nowhere (no subr, no local binding possible because the name is
    # never assigned/declared) are rejected
    subr_names = set((top.get("subrs") or {}))
    assigned: set = set()
    called: set = set()

    def _scan(sts):
        for st in sts:
            if not isinstance(st, tuple) or not st:
                continue
            if st[0] == "callsubr":
                called.add(st[1])
            elif st[0] in ("localdecl", "localassign") and \
                    isinstance(st[2 if st[0] == "localdecl" else 1], str):
                assigned.add(st[2] if st[0] == "localdecl" else st[1])
            for el in st[1:]:
                if isinstance(el, list) and el and all(
                        isinstance(x, tuple) and x and isinstance(x[0], str)
                        for x in el):
                    _scan(el)

    _scan(stmts)
    for blocks in (top.get("begin") or []), (top.get("end") or []):
        _scan(list(blocks))
    for fv in list((top.get("funcs") or {}).values()) + \
            list((top.get("subrs") or {}).values()):
        assigned.update(nm for _ty, nm in fv[1])
        _scan(fv[2])
    for nm in called - subr_names - assigned:
        raise DslError(f"subroutine name not found: {nm}")
    return Program(stmts, begin=top.get("begin"), end=top.get("end"),
                   funcs=top.get("funcs"), subrs=top.get("subrs"),
                   force_seq=p.force_seq)


def _apply_mask(out: pa.Table, mask, invert: bool = False) -> pa.Table:
    if mask is None:
        return out
    if not _is_arr(mask):
        keep = bool(mask) != invert
        return out if keep else out.slice(0, 0)
    if invert:
        mask = pc.invert(mask)
    return out.filter(pc.fill_null(mask, False))


def put_expr(ds, src: str, exclude: bool = False):
    """Verb ``put -e 'src'`` (put_or_filter.go:23): run DSL statements
    per record, vectorized per batch. `filter` keyword statements
    filter; bare expressions are evaluated and discarded (Miller put
    semantics); ``-x`` flips the filter-statement sense."""
    prog = compile_program(src)

    def f(t: pa.Table) -> pa.Table:
        out, mask, _bare = prog.run(t)
        return _apply_mask(out, mask, invert=exclude)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def put_oosvar(ds, src: str) -> pd.DataFrame:
    """Distributed aggregating-put: ``put -q 'begin{@s=0} @s += $x;
    end{emit @s}'`` compiled onto a partial/merge plan (the Ray-Data
    re-expression of Miller's out-of-stream variables,
    ``pkg/dsl/cst/statements`` + ``emit_emitp.go``).

    Supported main-block shape: field assignments / conditionals plus
    ASSOCIATIVE @oosvar accumulators (+= -= *=, optional single [key]
    for grouped sums). Each block reduces its batch vectorized into a
    tiny pickled partial; the driver folds partials (with begin-block
    inits) and runs the end block sequentially to produce the emitted
    records. Non-associative programs raise DslError — at conformance
    scale use Program.run_sequential instead."""
    import pickle

    prog = compile_program(src)
    if not prog.needs_seq:
        raise DslError("put_oosvar expects a program with @oosvars")

    # begin-block inits, evaluated once on an empty table
    oos0: dict = {}
    if prog.begin:
        seq0 = {"oos": oos0, "emitted": [], "texts": []}
        env0 = {"\x00seq": seq0}
        prog._exec(prog.begin, pa.table({}), env0, None,
                   {"mask": None, "bare": None})

    stmts = prog.statements

    def block(t: pa.Table) -> pa.Table:
        acc: dict = {}
        state = {"mask": None, "bare": None, "acc": acc}
        _exec_impl(prog, stmts, t, {}, None, state)
        return pa.table({"blob": pa.array([pickle.dumps(acc)],
                                          type=pa.binary())})

    parts = [pickle.loads(r["blob"]) for r in
             ds.map_batches(block, batch_format="pyarrow",
                            batch_size=None).take_all()]

    merged: dict = {}
    for part in parts:
        for name, ent in part.items():
            cur = merged.setdefault(name, {"op": ent["op"],
                                           "grouped": ent["grouped"],
                                           "val": None, "vals": {}})
            if cur["op"] != ent["op"] or cur["grouped"] != ent["grouped"]:
                raise DslError(f"@{name} accumulator shape mismatch "
                               "across blocks")
            kind = _ACC_OPS[ent["op"]]
            if ent["grouped"]:
                for kk, pv in ent["vals"].items():
                    c = cur["vals"].get(kk)
                    cur["vals"][kk] = pv if c is None else (
                        c + pv if kind == "sum" else c * pv)
            elif ent["val"] is not None:
                c = cur["val"]
                cur["val"] = ent["val"] if c is None else (
                    c + ent["val"] if kind == "sum" else c * ent["val"])

    # fold begin inits + merged partials into final oosvar values
    oos: dict = dict(oos0)
    for name, ent in merged.items():
        init = oos0.get(name)
        if ent["op"] == "-=" and init is None:
            raise DslError(f"@{name} -= needs an explicit begin "
                           "initializer to be order-free")
        if ent["grouped"]:
            base = init if isinstance(init, dict) else {}
            out = dict(base)
            for kk, pv in ent["vals"].items():
                c = out.get(kk)
                if ent["op"] == "-=":
                    out[kk] = (c if c is not None else 0) - pv
                elif ent["op"] == "*=":
                    out[kk] = pv if c is None else c * pv
                else:
                    out[kk] = pv if c is None else c + pv
            oos[name] = out
        else:
            v = ent["val"]
            if v is not None:
                if ent["op"] == "-=":
                    oos[name] = init - v
                elif ent["op"] == "*=":
                    oos[name] = v if init is None else init * v
                else:
                    oos[name] = v if init is None else init + v

    # end block: sequential over the final oosvar state
    seq = {"oos": oos, "emitted": [], "texts": []}
    if prog.end:
        env = {"\x00seq": seq}
        prog._exec(prog.end, pa.table({}), env, None,
                   {"mask": None, "bare": None})
    return pd.DataFrame(seq["emitted"])


def filter_expr(ds, src: str, exclude: bool = False):
    """Verb ``filter -e 'src'`` (put_or_filter.go): keep records where
    the final bare expression (or `filter` statement) is true; ``-x``
    inverts."""
    prog = compile_program(src)

    def f(t: pa.Table) -> pa.Table:
        out, mask, bare = prog.run(t)
        pred = bare if bare is not None else mask
        if pred is None:
            raise DslError("filter program has no predicate expression")
        return _apply_mask(out, pred, invert=exclude)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
