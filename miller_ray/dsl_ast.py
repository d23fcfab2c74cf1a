"""Miller DSL AST printer — reproduces ``mlr put -v`` / ``filter -v``
output byte-for-byte.

The reference grammar (pkg/parsing/mlr.bnf) annotates every production
with the AST-construction rule (parent token, child components, node
type); this module is a recursive-descent implementation of exactly
that chain, producing ``Node(text, tt, nt, children)`` and rendering
them in the reference's tree format::

    "block" [tt:block] [nt:StatementBlock]
        "=" [tt:equals] [nt:Assignment]
            ...

It is parse-only: evaluation stays in miller_ray.dsl.  Used by the
conformance harness for the ~540 ``-v`` golden cases
(test/cases/dsl-parse, dsl-operator-precedence, ... in the reference).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field


class AstError(ValueError):
    pass


@dataclass
class Node:
    text: str
    tt: str
    nt: str
    children: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# lexer (mlr.bnf lexer section; longest-match, keywords before identifiers)
# ---------------------------------------------------------------------------

_KEYWORDS = {
    "unset": "kw_unset", "filter": "kw_filter",
    "printn": "kw_printn", "print": "kw_print",
    "eprintn": "kw_eprintn", "eprint": "kw_eprint",
    "dump": "kw_dump", "edump": "kw_edump", "tee": "kw_tee",
    "emit1": "kw_emit1", "emitp": "kw_emitp", "emitf": "kw_emitf",
    "emit": "kw_emit", "begin": "kw_begin", "end": "kw_end",
    "if": "kw_if", "elif": "kw_elif", "else": "kw_else",
    "for": "kw_for", "in": "kw_in", "while": "kw_while", "do": "kw_do",
    "break": "kw_break", "continue": "kw_continue", "return": "kw_return",
    "call": "kw_call", "func": "kw_func", "subr": "kw_subr",
    "arr": "kw_arr", "bool": "kw_bool", "float": "kw_float",
    "int": "kw_int", "map": "kw_map", "num": "kw_num", "str": "kw_str",
    "var": "kw_var", "funct": "kw_funct",
    "stdout": "kw_stdout", "stderr": "kw_stderr", "ENV": "kw_env",
    "IPS": "ctx_IPS", "IFS": "ctx_IFS", "IRS": "ctx_IRS",
    "OPS": "ctx_OPS", "OFS": "ctx_OFS", "ORS": "ctx_ORS",
    "FLATSEP": "ctx_FLATSEP", "NF": "ctx_NF", "NR": "ctx_NR",
    "FNR": "ctx_FNR", "FILENAME": "ctx_FILENAME", "FILENUM": "ctx_FILENUM",
    "true": "literal_true", "false": "literal_false",
    "null": "null_literal", "Inf": "inf_literal", "NaN": "nan_literal",
    "M_PI": "const_M_PI", "M_E": "const_M_E",
}

_TYPEDECLS = {"kw_arr", "kw_bool", "kw_float", "kw_int", "kw_map",
              "kw_num", "kw_str", "kw_var", "kw_funct"}

# operators, longest first (mlr.bnf op_* lexer rules)
_OPS = [
    (">>>=", "op_shift_right_unsigned_equals"),
    ("???=", "op_empty_coalesce_equals"),
    ("??=", "op_absent_coalesce_equals"),
    ("<<=", "op_shift_left_equals"), (">>=", "op_shift_right_equals"),
    ("||=", "op_or_equals"), ("^^=", "op_xor_equals"),
    ("&&=", "op_and_equals"), ("**=", "op_pow_equals"),
    ("//=", "op_slash_slash_equals"), (".//", "op_dot_slash_slash"),
    ("!=~", "op_negtilde"), ("<=>", "op_spaceship"),
    ("???", "op_empty_coalesce"), (">>>", "op_shift_right_unsigned"),
    ("|=", "op_bit_or_equals"), ("&=", "op_bit_and_equals"),
    ("^=", "op_bit_xor_equals"), ("+=", "op_plus_equals"),
    (".=", "op_dot_equals"), ("-=", "op_minus_equals"),
    ("*=", "op_star_equals"), ("/=", "op_slash_equals"),
    ("%=", "op_percent_equals"),
    ("||", "op_logical_or"), ("^^", "op_logical_xor"),
    ("&&", "op_logical_and"), ("=~", "op_eqtilde"),
    ("==", "op_eqeq"), ("!=", "op_ne"),
    (">=", "op_ge"), ("<=", "op_le"),
    ("<<", "op_shift_left"), (">>", "op_shift_right"),
    ("??", "op_absent_coalesce"), ("**", "op_pow"),
    ("//", "op_slash_slash"),
    (".+", "op_dot_plus"), (".-", "op_dot_minus"),
    (".*", "op_dot_star"), ("./", "op_dot_slash"),
    ("=", "equals"), (";", "semicolon"), ("[", "lbrack"), ("]", "rbrack"),
    ("{", "lbrace"), ("}", "rbrace"), ("(", "lparen"), (")", "rparen"),
    (",", "comma"), (":", "colon"),
    ("?", "op_ternary"), ("|", "op_bit_or"), ("^", "op_bit_xor"),
    ("&", "op_bit_and"), ("+", "op_plus"), ("-", "op_minus"),
    ("*", "op_star"), ("/", "op_slash"), ("%", "op_percent"),
    (".", "op_dot"), (">", "op_gt"), ("<", "op_lt"),
    ("!", "op_bang"), ("~", "op_tilde"),
]

_STRING_RE = re.compile(r'"(\\.|[^"\\])*"')
_FLOAT_RE = re.compile(
    r"\d+\.\d+([eE][+-]?\d+)?|\d+\.(?!\d)([eE][+-]?\d+)?"
    r"|\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+")
_INT_RE = re.compile(r"0x[0-9a-fA-F]+|0o[0-7]+|0b[01]+|\d+")
_IDENT_RE = re.compile("[A-Za-z_\u00a0-\U0010ffff][A-Za-z0-9_\u00a0-\U0010ffff]*")
_BRACED_RE = re.compile(r"\{[^{}]*\}")
_SIGIL_IDENT_RE = re.compile("[A-Za-z0-9_\u00a0-\U0010ffff]+")


def lex(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith("%%%panic%%%", i):
            toks.append(("panic", "%%%panic%%%"))
            i += 11
            continue
        if c == '"':
            m = _STRING_RE.match(src, i)
            if not m:
                raise AstError(f"unterminated string at {i}")
            text = m.group()
            i = m.end()
            # case-insensitive regex literal: "..."i with no gap
            # (mlr.bnf RegexCaseInsensitive)
            if i < n and src[i] == "i" and (
                    i + 1 >= n or not re.match(r"[A-Za-z0-9_]", src[i + 1])):
                toks.append(("string_literal_ci", text + "i"))
                i += 1
            else:
                toks.append(("string_literal", text))
            continue
        if c == "b" and i + 1 < n and src[i + 1] == '"':
            m = _STRING_RE.match(src, i + 1)
            if not m:
                raise AstError(f"unterminated bytes literal at {i}")
            toks.append(("bytes_literal", "b" + m.group()))
            i = m.end()
            continue
        if c == "$":
            if src.startswith("$*", i):
                toks.append(("full_srec", "$*"))
                i += 2
                continue
            if src.startswith("${", i):
                m = _BRACED_RE.match(src, i + 1)
                if not m:
                    raise AstError(f"unterminated braced field at {i}")
                toks.append(("braced_field_name", "$" + m.group()))
                i = 1 + m.end()
                continue
            if src.startswith("$[", i):
                toks.append(("dollar_lbrack", "$["))
                i += 2
                continue
            m = _SIGIL_IDENT_RE.match(src, i + 1)
            if not m:
                raise AstError(f"bad field name at {i}")
            toks.append(("field_name", "$" + m.group()))
            i = m.end()
            continue
        if c == "@":
            if src.startswith("@*", i):
                toks.append(("full_oosvar", "@*"))
                i += 2
                continue
            if src.startswith("@{", i):
                m = _BRACED_RE.match(src, i + 1)
                if not m:
                    raise AstError(f"unterminated braced oosvar at {i}")
                toks.append(("braced_oosvar_name", "@" + m.group()))
                i = 1 + m.end()
                continue
            if src.startswith("@[", i):
                toks.append(("at_lbrack", "@["))
                i += 2
                continue
            m = _SIGIL_IDENT_RE.match(src, i + 1)
            if not m:
                raise AstError(f"bad oosvar name at {i}")
            toks.append(("oosvar_name", "@" + m.group()))
            i = m.end()
            continue
        m = _FLOAT_RE.match(src, i)
        if m:
            toks.append(("float_literal", m.group()))
            i = m.end()
            continue
        m = _INT_RE.match(src, i)
        if m:
            toks.append(("int_literal", m.group()))
            i = m.end()
            continue
        m = _IDENT_RE.match(src, i)
        if m:
            text = m.group()
            toks.append((_KEYWORDS.get(text, "non_sigil_name"), text))
            i = m.end()
            continue
        for op, tt in _OPS:
            if src.startswith(op, i):
                toks.append((tt, op))
                i += len(op)
                break
        else:
            raise AstError(f"lex error at {src[i:i+15]!r}")
    return toks


# ---------------------------------------------------------------------------
# parser (mlr.bnf parser section; -> annotations define Node shapes)
# ---------------------------------------------------------------------------

_CMP_ASSIGN = {"op_or_equals", "op_xor_equals", "op_and_equals",
               "op_absent_coalesce_equals", "op_empty_coalesce_equals",
               "op_bit_or_equals", "op_bit_and_equals", "op_bit_xor_equals",
               "op_shift_left_equals", "op_shift_right_equals",
               "op_shift_right_unsigned_equals",
               "op_plus_equals", "op_dot_equals", "op_minus_equals",
               "op_star_equals", "op_slash_equals", "op_slash_slash_equals",
               "op_percent_equals", "op_pow_equals"}

_LITERAL_NT = {"int_literal": "int_literal", "float_literal": "float_literal",
               "literal_true": "bool_literal", "literal_false": "bool_literal",
               "null_literal": "null_literal", "inf_literal": "float_literal",
               "nan_literal": "float_literal",
               "string_literal": "string_literal",
               "bytes_literal": "bytes_literal"}

# binary-operator precedence chain, loosest first
# (mlr.bnf PrecedenceChainStart .. PrecedenceChainEnd)
_BINARY_LEVELS = [
    ("op_logical_or",),
    ("op_logical_xor",),
    ("op_logical_and",),
    ("op_eqtilde", "op_negtilde", "op_eqeq", "op_ne", "op_spaceship"),
    ("op_gt", "op_ge", "op_lt", "op_le"),
    ("op_bit_or",),
    ("op_bit_xor",),
    ("op_bit_and",),
    ("op_shift_left", "op_shift_right", "op_shift_right_unsigned"),
    ("op_plus", "op_minus", "op_dot_plus", "op_dot_minus"),
    ("op_star", "op_slash", "op_slash_slash", "op_percent",
     "op_dot_star", "op_dot_slash", "op_dot_slash_slash"),
]

_UNARY = {"op_plus", "op_minus", "op_dot_plus", "op_dot_minus",
          "op_bang", "op_tilde"}

_STMT_KWS = {"kw_begin", "kw_end", "kw_if", "kw_while", "kw_do", "kw_for",
             "kw_func", "kw_subr", "kw_unset", "kw_filter", "kw_print",
             "kw_printn", "kw_eprint", "kw_eprintn", "kw_dump", "kw_edump",
             "kw_tee", "kw_emit1", "kw_emit", "kw_emitp", "kw_emitf",
             "kw_break", "kw_continue", "kw_return", "kw_call"}


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> tuple[str, str]:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, tt: str) -> tuple[str, str]:
        t = self.next()
        if t[0] != tt:
            raise AstError(f"expected {tt}, got {t}")
        return t

    # -- statements ---------------------------------------------------

    def block(self, stop: str = "eof") -> Node:
        out = Node("block", "block", "StatementBlock")
        while True:
            while self.peek()[0] == "semicolon":
                self.next()
            if self.peek()[0] in (stop, "eof"):
                break
            out.children.append(self.statement())
        return out

    def braced_block(self) -> Node:
        self.expect("lbrace")
        inner = self.block(stop="rbrace")
        self.expect("rbrace")
        return Node("block", "block", "StatementBlockInBraces", [inner])

    def statement(self) -> Node:
        tt, v = self.peek()
        if tt == "kw_begin":
            self.next()
            return Node(v, tt, "BeginBlock", [self.braced_block()])
        if tt == "kw_end":
            self.next()
            return Node(v, tt, "EndBlock", [self.braced_block()])
        if tt == "kw_if":
            return self.if_chain()
        if tt == "kw_while":
            self.next()
            self.expect("lparen")
            cond = self.rvalue()
            self.expect("rparen")
            return Node(v, tt, "WhileLoop", [cond, self.braced_block()])
        if tt == "kw_do":
            self.next()
            body = self.braced_block()
            self.expect("kw_while")
            self.expect("lparen")
            cond = self.rvalue()
            self.expect("rparen")
            return Node(v, tt, "DoWhileLoop", [body, cond])
        if tt == "kw_for":
            return self.for_loop()
        if tt == "kw_func":
            return self.func_def(named=True)
        if tt == "kw_subr":
            self.next()
            _, name = self.expect("non_sigil_name")
            params = self.func_params()
            return Node(name, "non_sigil_name", "SubroutineDefinition",
                        [params, self.braced_block()])
        if tt == "kw_unset":
            self.next()
            return Node(v, tt, "Unset", self.fcn_args())
        if tt == "kw_filter":
            self.next()
            return Node(v, tt, "FilterStatement", [self.rvalue()])
        if tt in ("kw_print", "kw_printn", "kw_dump"):
            self.next()
            nt = {"kw_print": "PrintStatement", "kw_printn": "PrintnStatement",
                  "kw_dump": "DumpStatement"}[tt]
            kids: list[Node] = []
            red = self.maybe_redirector()
            if red is not None:
                kids.append(red)
                if self.peek()[0] == "comma":
                    self.next()
                    kids.extend(self.fcn_args())
            elif not self.at_stmt_end():
                kids.extend(self.fcn_args())
            return Node(v, tt, nt, kids)
        if tt in ("kw_eprint", "kw_eprintn", "kw_edump"):
            self.next()
            nt = {"kw_eprint": "EprintStatement",
                  "kw_eprintn": "EprintnStatement",
                  "kw_edump": "EdumpStatement"}[tt]
            kids = [] if self.at_stmt_end() else self.fcn_args()
            return Node(v, tt, nt, kids)
        if tt == "kw_tee":
            self.next()
            red = self.maybe_redirector()
            if red is None:
                raise AstError("tee requires a redirect")
            self.expect("comma")
            fs = self.expect("full_srec")
            return Node(v, tt, "TeeStatement",
                        [red, Node(fs[1], fs[0], "FullSrec")])
        if tt == "kw_emit1":
            self.next()
            return Node(v, tt, "Emit1Statement", [self.rvalue()])
        if tt in ("kw_emit", "kw_emitp", "kw_emitf"):
            return self.emit_stmt()
        if tt == "kw_break":
            self.next()
            return Node(v, tt, "BreakStatement")
        if tt == "kw_continue":
            self.next()
            return Node(v, tt, "ContinueStatement")
        if tt == "kw_return":
            self.next()
            if self.at_stmt_end():
                return Node(v, tt, "ReturnStatement")
            return Node(v, tt, "ReturnStatement", [self.rvalue()])
        if tt == "kw_call":
            self.next()
            _, name = self.expect("non_sigil_name")
            self.expect("lparen")
            kids = [] if self.peek()[0] == "rparen" else self.fcn_args()
            self.expect("rparen")
            return Node(name, "non_sigil_name", "SubroutineCallsite", kids)
        if tt in _TYPEDECLS and self.peek(1)[0] == "non_sigil_name":
            # typed local declaration: var x = ..., int y = ...
            self.next()
            _, name = self.expect("non_sigil_name")
            lhs = Node(v, tt, "TypedeclLocalVariable",
                       [Node(v, tt, tt),
                        Node(name, "non_sigil_name", "LocalVariable")])
            return self.finish_assignment(lhs)
        # Rvalue-led: assignment, cond block, or bare boolean
        ex = self.rvalue()
        if self.peek()[0] == "lbrace":
            return Node(ex.text, ex.tt, "CondBlock", [ex, self.braced_block()])
        return self.finish_assignment(ex)

    def at_stmt_end(self) -> bool:
        return self.peek()[0] in ("semicolon", "rbrace", "eof")

    def finish_assignment(self, lhs: Node) -> Node:
        tt, v = self.peek()
        if tt == "equals":
            self.next()
            return Node(v, tt, "Assignment", [lhs, self.rvalue()])
        if tt in _CMP_ASSIGN:
            self.next()
            return Node(v, tt, "CompoundAssignment",
                        [lhs, Node(v, tt, tt), self.rvalue()])
        if lhs.nt == "TypedeclLocalVariable":
            raise AstError("typedecl without assignment")
        return Node(lhs.text, lhs.tt, "BareBoolean", [lhs])

    def if_chain(self) -> Node:
        chain = Node("if_chain", "if_chain", "IfChain")
        _, v = self.expect("kw_if")
        self.expect("lparen")
        cond = self.rvalue()
        self.expect("rparen")
        chain.children.append(
            Node(v, "kw_if", "IfItem", [cond, self.braced_block()]))
        while True:
            tt, v = self.peek()
            if tt == "kw_elif":
                self.next()
                self.expect("lparen")
                cond = self.rvalue()
                self.expect("rparen")
                chain.children.append(
                    Node(v, tt, "IfItem", [cond, self.braced_block()]))
            elif tt == "kw_else":
                self.next()
                chain.children.append(
                    Node(v, tt, "IfItem", [self.braced_block()]))
                break
            else:
                break
        return chain

    def for_loop(self) -> Node:
        _, v = self.expect("kw_for")
        self.expect("lparen")
        if self.peek()[0] == "lparen":
            # for ((k1,k2),v in ...)
            self.next()
            mi = Node("multi_index", "multi_index", "MultiIndex")
            mi.children.append(self.local_var())
            while self.peek()[0] == "comma":
                self.next()
                mi.children.append(self.local_var())
            self.expect("rparen")
            self.expect("comma")
            val = self.local_var()
            self.expect("kw_in")
            coll = self.rvalue()
            self.expect("rparen")
            return Node(v, "kw_for", "ForLoopMultivariable",
                        [mi, val, coll, self.braced_block()])
        # triple-for vs one/two-variable: scan for kw_in before ';'
        save = self.i
        depth = 0
        is_in_loop = False
        while True:
            tt, _ = self.peek()
            if tt == "eof":
                break
            if tt == "lparen":
                depth += 1
            elif tt == "rparen":
                if depth == 0:
                    break
                depth -= 1
            elif tt == "semicolon" and depth == 0:
                break
            elif tt == "kw_in" and depth == 0:
                is_in_loop = True
                break
            self.i += 1
        self.i = save
        if is_in_loop:
            k = self.local_var()
            if self.peek()[0] == "comma":
                self.next()
                v2 = self.local_var()
                self.expect("kw_in")
                coll = self.rvalue()
                self.expect("rparen")
                return Node(v, "kw_for", "ForLoopTwoVariable",
                            [k, v2, coll, self.braced_block()])
            self.expect("kw_in")
            coll = self.rvalue()
            self.expect("rparen")
            return Node(v, "kw_for", "ForLoopOneVariable",
                        [k, coll, self.braced_block()])
        start = self.stmt_list_block("semicolon", allow_bare=False)
        self.expect("semicolon")
        cont = self.stmt_list_block("semicolon", allow_bare=True)
        self.expect("semicolon")
        upd = self.stmt_list_block("rparen", allow_bare=False)
        self.expect("rparen")
        return Node(v, "kw_for", "TripleForLoop",
                    [start, cont, upd, self.braced_block()])

    def stmt_list_block(self, stop: str, allow_bare: bool) -> Node:
        out = Node("block", "block", "StatementBlock")
        while self.peek()[0] not in (stop, "eof"):
            tt, v = self.peek()
            if tt in _TYPEDECLS and self.peek(1)[0] == "non_sigil_name":
                self.next()
                _, name = self.expect("non_sigil_name")
                lhs = Node(v, tt, "TypedeclLocalVariable",
                           [Node(v, tt, tt),
                            Node(name, "non_sigil_name", "LocalVariable")])
                out.children.append(self.finish_assignment(lhs))
            else:
                ex = self.rvalue()
                out.children.append(self.finish_assignment(ex))
            if self.peek()[0] == "comma":
                self.next()
            else:
                break
        return out

    def local_var(self) -> Node:
        _, name = self.expect("non_sigil_name")
        return Node(name, "non_sigil_name", "LocalVariable")

    def func_def(self, named: bool) -> Node:
        _, v = self.expect("kw_func")
        if named and self.peek()[0] == "non_sigil_name":
            _, name = self.next()
            params = self.func_params()
            kids = [params]
            if self.peek()[0] == "colon":
                self.next()
                tt, tv = self.next()
                if tt not in _TYPEDECLS:
                    raise AstError(f"bad return typedecl {tv}")
                kids.append(Node(tv, tt, tt))
            kids.append(self.braced_block())
            return Node(name, "non_sigil_name", "NamedFunctionDefinition",
                        kids)
        params = self.func_params()
        kids = [params]
        if self.peek()[0] == "colon":
            self.next()
            tt, tv = self.next()
            if tt not in _TYPEDECLS:
                raise AstError(f"bad return typedecl {tv}")
            kids.append(Node(tv, tt, tt))
        kids.append(self.braced_block())
        return Node(v, "kw_func", "UnnamedFunctionDefinition", kids)

    def func_params(self) -> Node:
        self.expect("lparen")
        outer = Node("params", "params", "ParameterList")
        if self.peek()[0] == "rparen":
            self.next()
            return outer
        inner = Node("params", "params", "ParameterList")
        while True:
            tt, v = self.peek()
            if tt in _TYPEDECLS:
                self.next()
                lv = self.local_var()
                inner.children.append(
                    Node(v, tt, "Parameter", [Node(v, tt, tt), lv]))
            else:
                lv = self.local_var()
                inner.children.append(
                    Node(lv.text, lv.tt, "Parameter", [lv]))
            if self.peek()[0] == "comma":
                self.next()
                if self.peek()[0] == "rparen":
                    break
            else:
                break
        self.expect("rparen")
        outer.children.append(inner)
        return outer

    def maybe_redirector(self) -> Node | None:
        tt, v = self.peek()
        kinds = {"op_gt": "RedirectWrite", "op_shift_right": "RedirectAppend",
                 "op_bit_or": "RedirectPipe"}
        if tt not in kinds:
            return None
        self.next()
        t2, v2 = self.peek()
        if t2 == "kw_stdout":
            self.next()
            tgt = Node(v2, t2, "RedirectTargetStdout")
        elif t2 == "kw_stderr":
            self.next()
            tgt = Node(v2, t2, "RedirectTargetStderr")
        else:
            ex = self.rvalue()
            tgt = Node(ex.text, ex.tt, "RedirectTargetRvalue", [ex])
        return Node(v, tt, kinds[tt], [tgt])

    def emit_stmt(self) -> Node:
        tt, v = self.next()
        nt = {"kw_emit": "EmitStatement", "kw_emitp": "EmitPStatement",
              "kw_emitf": "EmitFStatement"}[tt]
        kids: list[Node] = []
        red = self.maybe_redirector()
        if red is not None:
            kids.append(red)
            self.expect("comma")
        # parenthesized lashed list: emit (@a, @b), "k"
        if self.peek()[0] == "lparen":
            save = self.i
            try:
                self.next()
                first = self.rvalue()
                if self.peek()[0] != "comma":
                    raise AstError("not a lashed list")
                lashed = Node("args", "args", "FcnArgs", [first])
                while self.peek()[0] == "comma":
                    self.next()
                    lashed.children.append(self.rvalue())
                self.expect("rparen")
                if red is None:
                    kids.extend(lashed.children)
                else:
                    kids.append(lashed)
                if self.peek()[0] == "comma":
                    self.next()
                    keys = Node("args", "args", "FcnArgs", self.fcn_args())
                    kids.append(keys)
                return Node(v, tt, nt, kids)
            except AstError:
                self.i = save
        kids.extend(self.fcn_args())
        return Node(v, tt, nt, kids)

    def fcn_args(self) -> list[Node]:
        args = [self.rvalue()]
        while self.peek()[0] == "comma":
            self.next()
            if self.at_stmt_end() or self.peek()[0] in ("rparen", "rbrack"):
                break  # trailing comma
            args.append(self.rvalue())
        return args

    # -- expressions ---------------------------------------------------

    def rvalue(self) -> Node:
        return self.ternary()

    def ternary(self) -> Node:
        cond = self.binary(0)
        if self.peek()[0] != "op_ternary":
            return cond
        _, v = self.next()
        mid = self.ternary()
        self.expect("colon")
        rhs = self.ternary()
        return Node(v, "op_ternary", "Operator", [cond, mid, rhs])

    def binary(self, level: int) -> Node:
        if level >= len(_BINARY_LEVELS):
            return self.dot_factor()
        ops = _BINARY_LEVELS[level]
        left = self.binary(level + 1)
        while self.peek()[0] in ops:
            tt, v = self.next()
            right = self.binary(level + 1)
            left = Node(v, tt, "Operator", [left, right])
        return left

    def dot_factor(self) -> Node:
        left = self.unary()
        while self.peek()[0] == "op_dot":
            _, v = self.next()
            right = self.unary()
            left = Node(v, "op_dot", "DotOperator", [left, right])
        return left

    def unary(self) -> Node:
        tt, v = self.peek()
        if tt in _UNARY:
            self.next()
            return Node(v, tt, "Operator", [self.unary()])
        return self.abs_coalesce()

    def abs_coalesce(self) -> Node:
        left = self.empty_coalesce()
        while self.peek()[0] == "op_absent_coalesce":
            tt, v = self.next()
            left = Node(v, tt, "Operator", [left, self.empty_coalesce()])
        return left

    def empty_coalesce(self) -> Node:
        left = self.pow_term()
        while self.peek()[0] == "op_empty_coalesce":
            tt, v = self.next()
            left = Node(v, tt, "Operator", [left, self.pow_term()])
        return left

    def pow_term(self) -> Node:
        base = self.chain_end()
        if self.peek()[0] != "op_pow":
            return base
        _, v = self.next()
        # exponent may carry a unary sign and is right-associative
        tt2, v2 = self.peek()
        if tt2 in ("op_minus", "op_plus"):
            self.next()
            rhs = Node(v2, tt2, "Operator", [self.pow_term()])
        else:
            rhs = self.pow_term()
        return Node(v, "op_pow", "Operator", [base, rhs])

    def chain_end(self) -> Node:
        if self.peek()[0] == "lparen":
            self.next()
            inner = self.rvalue()
            self.expect("rparen")
            return Node(inner.text, inner.tt, "Parenthesized", [inner])
        return self.postfix(self.atom())

    def postfix(self, node: Node) -> Node:
        while self.peek()[0] == "lbrack":
            self.next()
            if self.peek()[0] == "colon":
                self.next()
                if self.peek()[0] == "rbrack":
                    self.next()
                    node = Node("[]", "[]", "ArraySliceFull", [node])
                    continue
                hi = self.rvalue()
                self.expect("rbrack")
                node = Node("[]", "[]", "ArraySliceHiOnly", [node, hi])
                continue
            idx = self.rvalue()
            if self.peek()[0] == "colon":
                self.next()
                if self.peek()[0] == "rbrack":
                    self.next()
                    node = Node("[]", "[]", "ArraySliceLoOnly", [node, idx])
                    continue
                hi = self.rvalue()
                self.expect("rbrack")
                node = Node("[]", "[]", "ArraySliceLoHi", [node, idx, hi])
                continue
            self.expect("rbrack")
            node = Node("[]", "[]", "ArrayOrMapIndexAccess", [node, idx])
        return node

    def atom(self) -> Node:
        tt, v = self.next()
        if tt == "field_name":
            return Node(v, tt, "DirectFieldValue")
        if tt == "braced_field_name":
            return Node(v, tt, "BracedFieldValue")
        if tt == "full_srec":
            return Node(v, tt, "FullSrec")
        if tt == "dollar_lbrack":
            inner = self.rvalue()
            self.expect("rbrack")
            return Node("$[]", "$[]", "IndirectFieldValue", [inner])
        if tt == "oosvar_name":
            return Node(v, tt, "DirectOosvarValue")
        if tt == "braced_oosvar_name":
            return Node(v, tt, "BracedOosvarValue")
        if tt == "full_oosvar":
            return Node(v, tt, "FullOosvar")
        if tt == "at_lbrack":
            inner = self.rvalue()
            self.expect("rbrack")
            return Node("@[]", "@[]", "IndirectOosvarValue", [inner])
        if tt == "kw_env":
            t2 = self.peek()[0]
            if t2 == "lbrack":
                self.next()
                inner = self.rvalue()
                self.expect("rbrack")
                return Node(v, tt, "EnvironmentVariable", [inner])
            if t2 == "op_dot":
                self.next()
                _, name = self.expect("non_sigil_name")
                return Node(v, tt, "EnvironmentVariable",
                            [Node(name, "non_sigil_name", "LocalVariable")])
            return Node(v, tt, "EnvironmentVariable")
        if tt.startswith("ctx_"):
            return Node(v, tt, tt)
        if tt in ("const_M_PI", "const_M_E"):
            return Node(v, tt, tt)
        if tt == "panic":
            return Node(v, tt, "Panic")
        if tt == "string_literal_ci":
            return Node(v[:-1], "string_literal", "RegexCaseInsensitive",
                        [Node(v[:-1], "string_literal", "string_literal")])
        if tt in _LITERAL_NT:
            return Node(v, tt, _LITERAL_NT[tt])
        if tt == "lbrack":
            arr = Node("[]", "[]", "ArrayLiteral")
            if self.peek()[0] == "rbrack":
                self.next()
                return arr
            arr.children = self.fcn_args()
            self.expect("rbrack")
            return arr
        if tt == "lbrace":
            mp = Node("{}", "{}", "MapLiteral")
            if self.peek()[0] == "rbrace":
                self.next()
                return mp
            while True:
                k = self.rvalue()
                _, cv = self.expect("colon")
                val = self.rvalue()
                mp.children.append(
                    Node(cv, "colon", "MapLiteralKeyValuePair", [k, val]))
                if self.peek()[0] == "comma":
                    self.next()
                    if self.peek()[0] == "rbrace":
                        break
                else:
                    break
            self.expect("rbrace")
            return mp
        if tt == "kw_func":
            # anonymous function literal
            self.i -= 1
            return self.func_def(named=False)
        if tt in ("non_sigil_name", "kw_int", "kw_float", "kw_str",
                  "kw_bool", "kw_map", "kw_arr", "kw_num"):
            if self.peek()[0] == "lparen":
                self.next()
                kids = [] if self.peek()[0] == "rparen" else self.fcn_args()
                self.expect("rparen")
                return Node(v, tt, "FunctionCallsite", kids)
            if tt != "non_sigil_name":
                raise AstError(f"keyword {v} in expression position")
            return Node(v, tt, "LocalVariable")
        raise AstError(f"unexpected token {v!r} ({tt})")


def parse(src: str) -> Node:
    p = _P(lex(src))
    root = p.block()
    if p.peek()[0] != "eof":
        raise AstError(f"trailing tokens at {p.peek()}")
    return root


def render(node: Node) -> str:
    lines: list[str] = []

    def walk(n: Node, d: int):
        lines.append("    " * d + f'"{n.text}" [tt:{n.tt}] [nt:{n.nt}]')
        for c in n.children:
            walk(c, d + 1)

    walk(node, 0)
    return "\n".join(lines) + "\n"


def verbose_header(src: str) -> str:
    """The exact stdout prefix of ``mlr put -v <src>`` (transformers/
    put_or_filter.go:440-449): expression echo, blank line, AST tree,
    blank line."""
    ast_text = render(parse(src))
    return "DSL EXPRESSION:\n" + src + "\n\nAST:\n" + ast_text + "\n"
