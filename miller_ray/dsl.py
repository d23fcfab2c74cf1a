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
  | (?P<op>\*\*|\.\+|\.-|\.\*|\./|//|<=|>=|==|!=|=~|!~|&&|\|\||\?\?\??|[-+*/%<>=!?:;,().{}])
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
        base = self.primary()
        if self.peek() == ("op", "**"):
            self.next()
            exp = self.unary()  # right-assoc

            def f(t, env, base=base, exp=exp):
                return _arith("**", base(t, env), exp(t, env))
            return f
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
                raise DslError("$* is not supported (fixed Arrow schema)")

            def f(t, env, name=name):
                if name in env:
                    return env[name]
                if name not in t.column_names:
                    raise DslError(f"field ${name} not in schema")
                return t[name]
            return f
        if k == "oosvar":
            raise DslError("@oosvars are not supported (no cross-record "
                           "state in a distributed batch transform)")
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
        return f


# ---------------------------------------------------------------------------
# statements / programs
# ---------------------------------------------------------------------------

class Program:
    """Compiled DSL program: ordered statements over a batch + env."""

    def __init__(self, statements: list[tuple]):
        self.statements = statements

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
        else:  # pragma: no cover
            raise DslError(f"unknown statement kind {kind}")


Program._exec = _exec_impl


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


def _parse_stmts(p: "_Parser", in_block: bool = False) -> list[tuple]:
    stmts: list[tuple] = []
    while True:
        k, v = p.peek()
        if k == "eof" or (in_block and v == "}"):
            return stmts
        if v == ";":
            p.next()
            continue
        if k == "ident" and v == "unset":
            p.next()
            fk, fv = p.next()
            if fk != "field":
                raise DslError("unset expects a $field")
            stmts.append(("unset", _field_name(fv)))
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
            stmts.append(("assign", _field_name(ftok), op, p.expr()))
        else:
            e = p.expr()
            if p.peek() == ("op", "{"):
                # AWK-style pattern-action: expr { stmts }
                stmts.append(("cond", [(e, _parse_block(p))]))
            else:
                stmts.append(("expr", e))
        if p.peek() == ("op", ";"):
            p.next()


def compile_program(src: str) -> Program:
    """Parse a statement list (';'-separated; if/elif/else and
    pattern-action `cond { ... }` blocks supported) into a Program."""
    p = _Parser(_lex(src))
    stmts = _parse_stmts(p)
    if p.peek()[0] != "eof":
        raise DslError(f"unexpected trailing token {p.peek()[1]!r}")
    return Program(stmts)


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
