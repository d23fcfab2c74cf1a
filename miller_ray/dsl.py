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
  | (?P<int>0[xX][0-9a-fA-F]+|0[bB][01]+|\d+)
  | (?P<string>"(\\.|[^"\\])*")
  | (?P<field>\$(\{[^}]*\}|[A-Za-z_][A-Za-z0-9_]*|\*))
  | (?P<oosvar>@(\{[^}]*\}|[A-Za-z_][A-Za-z0-9_]*|\*))
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\*\*|\.\+|\.-|\.\*|\./|//|<=|>=|==|!=|=~|!~|&&|\|\||\?\?\??|[-+*/%<>=!?:;,().{}\[\]])
""", re.VERBOSE)

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", ".=", "%=", "//=", "**="}


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
    if not _is_arr(a) and not _is_arr(b):
        return _arith_scalar(op, a, b)
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


def _arith_scalar(op: str, a, b):
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


def _arith_raw(op: str, a: Value, b: Value) -> Value:
    both_int = _is_int(a) and _is_int(b)
    if op in ("+", ".+"):
        return _null_identity("+", a, b, pc.add(a, b))
    if op in ("-", ".-"):
        return _null_identity("-", a, b, pc.subtract(a, b))
    if op in ("*", ".*"):
        return _null_identity("*", a, b, pc.multiply(a, b))
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


def _compare(op: str, a: Value, b: Value) -> Value:
    a, b = _unscalar(a), _unscalar(b)
    fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
          "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
    if _is_str(a) != _is_str(b):
        a, b = _to_str(a), _to_str(b)
    return _unscalar(fn(a, b))


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


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

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
                c, x, y = cond(t, env), a(t, env), b(t, env)
                x, y = _unify_types(x, y)
                if not _is_arr(c):
                    return x if c else y
                return pc.if_else(c, x, y)
            return f
        return cond

    def coalesce(self) -> Expr:
        left = self.or_()
        while self.peek()[1] in ("??", "???"):
            self.next()
            right = self.or_()

            def f(t, env, left=left, right=right):
                a = left(t, env)
                if not _is_arr(a):
                    return a if a is not None else right(t, env)
                b = right(t, env)
                a2, b2 = _unify_types(a, b)
                return pc.coalesce(a2, b2)
            left = f
        return left

    def or_(self) -> Expr:
        left = self.and_()
        while self.peek() == ("op", "||"):
            self.next()
            right = self.and_()

            def f(t, env, left=left, right=right):
                a, b = left(t, env), right(t, env)
                if not _is_arr(a) and not _is_arr(b):
                    return bool(a) or bool(b)
                return pc.or_kleene(a, b)
            left = f
        return left

    def and_(self) -> Expr:
        left = self.match_()
        while self.peek() == ("op", "&&"):
            self.next()
            right = self.match_()

            def f(t, env, left=left, right=right):
                a, b = left(t, env), right(t, env)
                if not _is_arr(a) and not _is_arr(b):
                    return bool(a) and bool(b)
                return pc.and_kleene(a, b)
            left = f
        return left

    def match_(self) -> Expr:
        left = self.comparison()
        while self.peek()[1] in ("=~", "!~"):
            _, op = self.next()
            right = self.comparison()

            def f(t, env, left=left, right=right, op=op):
                a = left(t, env)
                pat = right(t, env)
                if _is_arr(pat):
                    raise DslError("=~ pattern must be a literal")
                pat = str(pat)
                if not _is_arr(a):
                    m0 = re.search(pat, str(a))
                    if op == "=~" and m0:
                        env["\x00caps"] = [m0.group(0)] + \
                            ["" if g is None else g for g in m0.groups()]
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
        left = self.concat()
        while self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            _, op = self.next()
            right = self.concat()

            def f(t, env, left=left, right=right, op=op):
                return _compare(op, left(t, env), right(t, env))
            left = f
        return left

    def concat(self) -> Expr:
        left = self.additive()
        while self.peek() == ("op", "."):
            self.next()
            right = self.additive()

            def f(t, env, left=left, right=right):
                a, b = _to_str(left(t, env)), _to_str(right(t, env))
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
        1-based array index; pkg/dsl/cst indexing)."""
        base = self.primary()
        while self.peek() == ("op", "["):
            self.next()
            idx = self.expr()
            self.expect("]")

            def f(t, env, base=base, idx=idx):
                c = base(t, env)
                k2 = _unscalar(idx(t, env))
                if isinstance(c, (dict, list)) or c is None:
                    return _index_value(c, k2)
                if _is_arr(c) and pa.types.is_list(c.type):
                    if not isinstance(k2, (int, np.integer)):
                        raise DslError("list index must be an int")
                    i2 = int(k2) - 1 if k2 > 0 else int(k2)
                    return pc.list_element(c, i2)
                raise DslError("[] index on a non-collection value")
            base = f
        return base

    def primary(self) -> Expr:
        k, v = self.next()
        if k == "int":
            val = int(v, 0)
            return lambda t, env: val
        if k == "float":
            val = float(v)
            return lambda t, env: val
        if k == "string":
            raw = v[1:-1]
            pieces = re.split(r"(\\[0-9])", raw)
            if len(pieces) > 1:
                # capture-interpolating literal: "\1-\2" concatenates the
                # last =~ match's groups, \0 = full match (unescape only
                # the static parts — unicode_escape would eat \1 into
                # \x01)
                def f(t, env, pieces=pieces):
                    caps = env.get("\x00caps")
                    if caps is None:
                        raise DslError("\\N used before any =~ match")
                    out = None
                    for p in pieces:
                        if re.fullmatch(r"\\[0-9]", p):
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
            val = raw.encode().decode("unicode_escape")
            return lambda t, env: val
        if k == "field":
            name = _field_name(v)
            if name == "*":
                def fstar(t, env):
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
                if name in env:
                    return env[name]
                if name not in t.column_names:
                    raise DslError(f"field ${name} not in schema")
                return t[name]
            return f
        if k == "oosvar":
            name = _field_name(v)  # same ${...} / bare forms as fields

            def fo(t, env, name=name):
                seq = env.get("\x00seq")
                if seq is None:
                    raise DslError("@oosvars require the sequential "
                                   "interpreter or an accumulator plan")
                if name == "*":
                    return dict(seq["oos"])
                return seq["oos"].get(name)
            return fo
        if k == "ident":
            if v == "true":
                return lambda t, env: True
            if v == "false":
                return lambda t, env: False
            if v == "M_PI":
                return lambda t, env: float(np.pi)
            if v == "M_E":
                return lambda t, env: float(np.e)
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
            if self.peek() == ("op", "("):
                return self.call(v)
            raise DslError(f"unknown identifier {v!r} (NR/FNR/FILENAME and "
                           "@oosvars are not supported)")
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
                        continue
                    break
            self.expect("}")

            def fmap(t, env, pairs=pairs):
                out = {}
                for ke, ve in pairs:
                    kv = _scalarize(ke(t, env))
                    vv = ve(t, env)
                    out[kv] = _scalarize(vv) if not isinstance(
                        vv, (dict, list)) else vv
                return out
            return fmap
        if v == "[":
            elems: list[Expr] = []
            if self.peek() != ("op", "]"):
                while True:
                    elems.append(self.expr())
                    if self.peek() == ("op", ","):
                        self.next()
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

    def call(self, name: str) -> Expr:
        if name not in REGISTRY:
            raise DslError(f"unknown function {name!r} "
                           f"(supported: miller_ray.functions.supported())")
        self.expect("(")
        args: list[Expr] = []
        if self.peek() != ("op", ")"):
            args.append(self.expr())
            while self.peek() == ("op", ","):
                self.next()
                args.append(self.expr())
        self.expect(")")
        fn = REGISTRY[name]

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
                    lifted = [pa.array([vals[0]]), *vals[1:]]
                    return _unscalar(fn(*lifted))
                raise
        return f


# ---------------------------------------------------------------------------
# statements / programs
# ---------------------------------------------------------------------------

class Program:
    """Compiled DSL program: ordered statements over a batch + env."""

    def __init__(self, statements: list[tuple], begin=None, end=None):
        self.statements = statements
        self.begin = begin or []
        self.end = end or []
        self.needs_seq = bool(self.begin or self.end) or \
            _stmts_need_seq(statements)

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


def _exec_impl(self, stmts, t, env, mask, state):
    """Execute statements under an optional numpy bool row mask."""
    n = t.num_rows
    for kind, *rest in stmts:
        if kind == "assign":
            name, op, expr = rest
            val = _unscalar(expr(t, env))
            if val is None:
                continue  # absent RHS: assignment is a no-op
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
            if mask is None:
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
            variant, targets, keyexprs = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("emit requires the sequential interpreter")
            _seq_emit(variant, targets, keyexprs, t, env, seq)
        elif kind == "dump":
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("dump requires the sequential interpreter")
            import json

            seq["texts"].append(json.dumps(seq["oos"], indent=2,
                                           default=str))
        elif kind == "print":
            expr, nl = rest
            seq = env.get("\x00seq")
            if seq is None:
                raise DslError("print requires the sequential interpreter")
            if expr is None:
                seq["texts"].append("" if nl else "")
            else:
                v = expr(t, env)
                v = v if isinstance(v, (dict, list)) else _scalarize(v)
                seq["texts"].append(_print_render(v, seq.get("ofmt")))
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
    return _unscalar(_arith(base, cur, val))


def _set_elem(node, key, val):
    if isinstance(node, dict):
        # int keys and their string renderings are the same slot
        if key not in node and not isinstance(key, str) and \
                str(key) in node:
            key = str(key)
        node[key] = val
        return
    if isinstance(node, list):
        if isinstance(key, bool) or not isinstance(key, (int, np.integer)):
            raise DslError("array index must be an int")
        k = int(key)
        i = k - 1 if k > 0 else len(node) + k
        if i == len(node):
            node.append(val)
        elif 0 <= i < len(node):
            node[i] = val
        else:
            raise DslError("array index out of bounds")
        return
    raise DslError("indexed assignment into a non-collection")


def _seq_oassign(name, idx_exprs, op, rhs, t, env, seq):
    oos = seq["oos"]
    val = rhs(t, env)
    if not isinstance(val, (dict, list)):
        val = _scalarize(val)
    if not idx_exprs:
        if op == "=":
            if val is not None:
                oos[name] = val
        else:
            nv = _oos_combine(op, oos.get(name), val)
            if nv is not None:
                oos[name] = nv
        return
    keys = [_scalarize(e(t, env)) for e in idx_exprs]
    node = oos.get(name)
    if not isinstance(node, (dict, list)):
        node = {}
        oos[name] = node
    for kk in keys[:-1]:
        nxt = _index_value(node, kk)
        if not isinstance(nxt, (dict, list)):
            nxt = {}
            _set_elem(node, kk, nxt)
        node = nxt
    last = keys[-1]
    if op == "=":
        if val is not None:
            _set_elem(node, last, val)
    else:
        nv = _oos_combine(op, _index_value(node, last), val)
        if nv is not None:
            _set_elem(node, last, nv)


def _flatten_into(out: dict, prefix, v):
    # auto-flatten separator is "." (mlr default flatsep; golden cases
    # dsl-parameterized-emit/0001 `sum.pan=...`)
    if isinstance(v, dict):
        for kk, vv in v.items():
            _flatten_into(out, f"{prefix}.{kk}" if prefix else str(kk), vv)
    elif isinstance(v, list):
        for i, vv in enumerate(v, 1):
            _flatten_into(out, f"{prefix}.{i}" if prefix else str(i), vv)
    elif v is not None:
        out[prefix] = v


def _has_map_vals(d: dict) -> bool:
    return any(isinstance(v, (dict, list)) for v in d.values())


def _emit_split(base, v) -> list[dict]:
    """emit (unprefixed) of one target with keynames exhausted
    (emit_emitp.go): scalar -> {name: v}; map of scalars -> the map as
    one record; map with nested maps -> recurse per key (keys do NOT
    become fields — golden dsl-emit/0006)."""
    if v is None:
        return []
    if not isinstance(v, (dict, list)):
        return [{base if base is not None else "_": v}]
    if isinstance(v, list):
        v = {str(i): x for i, x in enumerate(v, 1)}
    if not _has_map_vals(v):
        rec = {kk: vv for kk, vv in v.items() if vv is not None}
        return [rec] if rec else []
    recs: list[dict] = []
    for vv in v.values():
        recs.extend(_emit_split(base, vv))
    return recs


def _emit_records(prefixed: bool, names, vals, keynames) -> list[dict]:
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
                for r in _emit_records(prefixed, names, subvals, rest):
                    recs.append({kn: kk, **r})
            return recs
        # scalar with keynames remaining: extras ignored (dsl-emit/0015)
    if not prefixed and len(names) == 1:
        base, _path = names[0]
        return _emit_split(base, vals[0])
    rec: dict = {}
    for (base, path), v in zip(names, vals):
        if isinstance(v, (dict, list)):
            if prefixed:
                _flatten_into(rec, path, v)
            else:
                _flatten_into(rec, None, v)
        elif v is not None:
            fb = path if prefixed else base
            rec[fb if fb is not None else "_"] = v
    return [rec] if rec else []


def _seq_emit(variant, targets, keyexprs, t, env, seq):
    oos = seq["oos"]
    if variant == "emitf":
        rec = {}
        for _kind, name, _idx in targets:
            v = oos.get(name)
            if v is not None:
                rec[name] = v
        if rec:
            seq["emitted"].append(rec)
        return
    prefixed = variant == "emitp"
    keynames = [str(_scalarize(e(t, env))) for e in keyexprs]
    names, vals = [], []
    for tg in targets:
        if tg[0] == "ref":
            _, name, idx = tg
            v = dict(oos) if name == "*" else oos.get(name)
            pname = name
            for ie in idx:
                kk = _scalarize(ie(t, env))
                v = _index_value(v, kk)
                pname = f"{pname}.{kk}"
            names.append((name, pname))
            vals.append(v)
        else:
            v = tg[1](t, env)
            if not isinstance(v, (dict, list)):
                v = _scalarize(v)
            names.append((None, None))
            vals.append(v)
    if not prefixed and not keynames and len(names) > 1:
        # lashed emit without keynames: each target emits its own
        # record stream in sequence (dsl-emit/0010)
        for nm, v in zip(names, vals):
            seq["emitted"].extend(_emit_records(False, [nm], [v], []))
        return
    seq["emitted"].extend(_emit_records(prefixed, names, vals, keynames))


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


def _print_render(v, ofmt: str | None = None) -> str:
    if v is None:
        return ""
    if isinstance(v, (dict, list)):
        import json

        return json.dumps(v, indent=2, default=str)
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
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        # Go FormatFloat('f', -1) renders integral floats without ".0"
        return str(int(v))
    return str(v)


def _run_sequential_impl(self, t: pa.Table, seed_env=None, quiet=False,
                         ofmt: str | None = None):
    """Row-at-a-time execution with full cross-record semantics
    (@oosvars, begin/end, emit, dump/print). Returns (records, texts):
    emitted + passed-through records in stream order, and raw text
    output lines. Conformance-scale only — the distributed engine path
    for the aggregating-put idiom is verbs.put_oosvar."""
    oos: dict = {}
    seq = {"oos": oos, "emitted": [], "texts": [], "ofmt": ofmt}
    out_records: list[dict] = []
    texts: list[str] = []
    seed_env = seed_env or {}

    def drain():
        out_records.extend(seq["emitted"])
        seq["emitted"].clear()
        texts.extend(seq["texts"])
        seq["texts"].clear()

    empty = t.slice(0, 0)
    if self.begin:
        env = {"\x00seq": seq}
        state = {"mask": None, "bare": None}
        self._exec(self.begin, empty, env, None, state)
        drain()
    for i in range(t.num_rows):
        row = t.slice(i, 1)
        env = {"\x00seq": seq}
        for kk, vv in seed_env.items():
            if _is_arr(vv) and len(vv) == t.num_rows:
                env[kk] = _scalarize(vv.slice(i, 1) if isinstance(
                    vv, pa.Array) else vv.combine_chunks().slice(i, 1))
            else:
                env[kk] = vv
        state = {"mask": None, "bare": None}
        self._exec(self.statements, row, env, None, state)
        drain()
        if not quiet:
            keep = True
            if state["mask"] is not None:
                m = state["mask"]
                keep = bool(_scalarize(m)) if _is_arr(m) else bool(m)
            if keep:
                rec: dict = {}
                for c in row.column_names:
                    v = env[c] if c in env else row[c]
                    if v is not None:
                        rec[c] = _scalarize(v)
                for c, v in env.items():
                    if c.startswith("\x00") or c in row.column_names:
                        continue
                    if v is not None:
                        rec[c] = _scalarize(v)
                out_records.append(rec)
    if self.end:
        env = {"\x00seq": seq, "\x00NR": t.num_rows,
               "\x00FNR": t.num_rows}
        state = {"mask": None, "bare": None}
        self._exec(self.end, empty, env, None, state)
        drain()
    return out_records, texts


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
    structurally so emit can name output fields, or a general
    expression (map literal, function call, $*)."""
    k, v = p.peek()
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


def _parse_emit(p: "_Parser", variant: str) -> tuple:
    """emit/emitp/emitf statement (pkg/dsl/cst/emit_emitp.go).
    Redirects (`emit > file, ...`) are unsupported."""
    if p.peek()[1] in (">", ">>", "|"):
        raise DslError(f"{variant} redirects are not supported")
    targets: list[tuple] = []
    if variant == "emitf":
        while True:
            tg = _parse_emit_target(p)
            if tg[0] != "ref" or tg[2]:
                raise DslError("emitf takes unindexed @oosvar names")
            targets.append(tg)
            if p.peek() == ("op", ","):
                p.next()
                continue
            break
        return ("emit", "emitf", targets, [])
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
    return ("emit", variant, targets, keyexprs)


def _parse_stmts(p: "_Parser", in_block: bool = False,
                 top: dict | None = None) -> list[tuple]:
    stmts: list[tuple] = []
    while True:
        k, v = p.peek()
        if k == "eof" or (in_block and v == "}"):
            return stmts
        if v == ";":
            p.next()
            continue
        if k == "ident" and v in ("begin", "end") and not in_block and \
                p.toks[p.i + 1: p.i + 2] == [("op", "{")]:
            p.next()
            body = _parse_block(p)
            if top is None:
                raise DslError(f"{v} block not allowed here")
            top.setdefault(v, []).extend(body)
            continue
        if k == "ident" and v in ("emit", "emitp", "emitf"):
            p.next()
            stmts.append(_parse_emit(p, v))
        elif k == "ident" and v in ("dump", "edump"):
            p.next()
            stmts.append(("dump",))
        elif k == "ident" and v in ("print", "printn"):
            p.next()
            nl = v == "print"
            if p.peek()[1] in (";", "}") or p.peek()[0] == "eof":
                stmts.append(("print", None, nl))
            else:
                stmts.append(("print", p.expr(), nl))
        elif k == "ident" and v == "tee":
            raise DslError("tee statements are not supported")
        elif k == "oosvar" and _oassign_ahead(p):
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
            stmts.append(("oassign", name, idx, op, p.expr()))
        elif k == "ident" and v == "unset":
            p.next()
            fk, fv = p.next()
            if fk == "oosvar":
                stmts.append(("ounset", _field_name(fv)))
            elif fk == "field":
                stmts.append(("unset", _field_name(fv)))
            else:
                raise DslError("unset expects a $field or @oosvar")
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
        elif k == "field" and p.toks[p.i + 1: p.i + 2] and \
                p.toks[p.i + 1][0] == "op" and p.toks[p.i + 1][1] in _ASSIGN_OPS:
            _, ftok = p.next()
            _, op = p.next()
            fname = _field_name(ftok)
            if fname == "*":
                raise DslError("assignment to $* is not supported")
            stmts.append(("assign", fname, op, p.expr()))
        else:
            e = p.expr()
            if p.peek() == ("op", "{"):
                # AWK-style pattern-action: expr { stmts }
                stmts.append(("cond", [(e, _parse_block(p))]))
            else:
                stmts.append(("expr", e))
        if p.peek() == ("op", ";"):
            p.next()


def _oassign_ahead(p: "_Parser") -> bool:
    """True if the oosvar token at p.i starts an assignment statement
    (possibly through [index] chains) rather than an expression."""
    i = p.i + 1
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
            return k == "op" and v in _ASSIGN_OPS
        i += 1
    return False


def _stmts_need_seq(stmts) -> bool:
    for kind, *rest in stmts:
        if kind in ("oassign", "ounset", "emit", "dump", "print"):
            return True
        if kind == "cond":
            for _c, body in rest[0]:
                if _stmts_need_seq(body):
                    return True
    return False


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
    return Program(stmts, begin=top.get("begin"), end=top.get("end"))


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
