"""Online-help catalog for the REPL's ``:help`` / ``?`` / ``??``
commands (reference: repl/verbs.go handleHelpSingle +
cst/builtin_function_manager.go showSingleUsage +
cst/keyword_usage.go).

The help prose itself is part of the reference's behavioral surface
(the regtest goldens compare it byte-for-byte), so — exactly like the
golden corpus — it is read from the reference tree AT RUNTIME, not
vendored: ``load_bif_catalog`` parses the ``lookupTable`` struct
literals out of builtin_function_manager.go and ``load_keyword_catalog``
the one-Println usage bodies out of keyword_usage.go. Only the FORMAT
logic (JoinHelp whitespace folding, ``(class=… #args=…)`` headers,
describeNargs arity labels) is re-implemented here."""
from __future__ import annotations

import os
import re
from functools import lru_cache

_REF = os.environ.get("MILLER_REFERENCE", "/root/reference")
_BFM = os.path.join(_REF, "pkg/dsl/cst/builtin_function_manager.go")
_KWU = os.path.join(_REF, "pkg/dsl/cst/keyword_usage.go")

# describeNargs (builtin_function_manager.go:2823): single-arity order
_SINGLE_ARITY = [("zaryFunc", "0"), ("zaryFuncWithState", "0"),
                 ("unaryFunc", "1"), ("unaryFuncWithContext", "1"),
                 ("binaryFunc", "2"), ("binaryFuncWithState", "2"),
                 ("regexCaptureBinaryFunc", "2"),
                 ("ternaryFunc", "3"), ("ternaryFuncWithState", "3")]
# hasMultipleArities order (note: *WithState variants not consulted)
_MULTI_ARITY = [("zaryFunc", "0"), ("unaryFunc", "1"),
                ("unaryFuncWithContext", "1"), ("binaryFunc", "2"),
                ("regexCaptureBinaryFunc", "2"), ("ternaryFunc", "3")]


def _go_strings(src: str, pos: int) -> tuple[str, int]:
    """Parse one Go string literal (double-quoted with escapes, or
    raw backtick) starting at src[pos]; returns (value, end_pos)."""
    q = src[pos]
    if q == "`":
        end = src.index("`", pos + 1)
        return src[pos + 1:end], end + 1
    assert q == '"', f"not a string at {pos}: {src[pos:pos+20]!r}"
    out: list[str] = []
    i = pos + 1
    esc = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
           "'": "'"}
    while i < len(src):
        c = src[i]
        if c == "\\":
            out.append(esc.get(src[i + 1], src[i + 1]))
            i += 2
        elif c == '"':
            return "".join(out), i + 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated Go string")


def _describe_nargs(info: dict) -> str:
    fields = info["fields"]
    if info.get("hasMultipleArities"):
        return ",".join(label for f, label in _MULTI_ARITY if f in fields)
    for f, label in _SINGLE_ARITY:
        if f in fields:
            return label
    if "variadicFunc" in fields or "variadicFuncWithState" in fields:
        lo, hi = info.get("minimumVariadicArity"), \
            info.get("maximumVariadicArity")
        if lo and hi:
            return f"{lo}-{hi}"
        return "variadic"
    return "(error)"


@lru_cache(maxsize=1)
def load_bif_catalog() -> list[dict]:
    """Ordered function-info entries: {name, class, help, examples,
    nargs}."""
    src = open(_BFM, encoding="utf-8").read()
    start = src.index("lookupTable := []BuiltinFunctionInfo{")
    end = src.index("\n\t}\n", start)
    body = src[start:end]
    entries: list[dict] = []
    cur: dict | None = None
    # line-anchored field starts only ("// comment: text" can't match
    # since \s* cannot skip the slashes)
    matches = list(re.finditer(r"^\s*(\w+): +", body, re.M))
    pos = 0
    for m in matches:
        if m.start() < pos:
            continue  # inside a previously-consumed multi-line value
        fld = m.group(1)
        j = m.end()
        while j < len(body) and body[j] in " \t\n":
            j += 1
        if fld == "name" and body[j] == '"':
            val, j = _go_strings(body, j)
            cur = {"name": val, "class": "", "help": "",
                   "examples": [], "fields": set()}
            entries.append(cur)
        elif cur is None:
            pass
        elif fld == "class":
            m2 = re.match(r"FUNC_CLASS_(\w+)", body[j:])
            if m2:
                cls = m2.group(1).lower()
                cur["class"] = ("higher-order-functions"
                                if cls == "hofs" else cls)
                j += m2.end()
        elif fld == "help":
            parts = []
            while True:
                val, j = _go_strings(body, j)
                parts.append(val)
                m3 = re.match(r"\s*\+\s*", body[j:])
                if m3 and body[j + m3.end()] in "\"`":
                    j += m3.end()
                else:
                    break
            cur["help"] = "".join(parts)
        elif fld == "examples":
            k = body.index("{", j) + 1
            while True:
                while k < len(body) and body[k] in " \t\n,":
                    k += 1
                if body.startswith("//", k):  # comment inside block
                    k = body.index("\n", k) + 1
                    continue
                if body[k] == "}":
                    break
                val, k = _go_strings(body, k)
                cur["examples"].append(val)
            j = k + 1
        elif fld in ("hasMultipleArities",):
            cur["hasMultipleArities"] = body[j:j + 4] == "true"
        elif fld in ("minimumVariadicArity", "maximumVariadicArity"):
            m4 = re.match(r"(\d+)", body[j:])
            if m4:
                cur[fld] = int(m4.group(1))
        else:
            cur["fields"].add(fld)
        pos = j
    for e in entries:
        e["nargs"] = _describe_nargs(e)
    # the manager sorts the table for online help: names starting with
    # a letter first, ascending; symbols after
    # (builtin_function_manager.go:2617 sort.Slice)
    entries.sort(key=lambda e: (0 if e["name"][:1].isalpha() else 1,
                                e["name"]))
    return entries


def _join_help(help_text: str) -> str:
    # JoinHelp (builtin_function_manager.go:2890): newlines become
    # spaces, multi-whitespace folds to one space
    return re.sub(r"\s+", " ", help_text.replace("\n", " "))


def bif_usage(e: dict) -> str:
    """showSingleUsage format."""
    lines = [f"{e['name']}  (class={e['class']} #args={e['nargs']}) "
             f"{_join_help(e['help'])}"]
    if len(e["examples"]) == 1:
        lines.append("Example:")
    elif len(e["examples"]) > 1:
        lines.append("Examples:")
    lines.extend(e["examples"])
    return "\n".join(lines) + "\n"


@lru_cache(maxsize=1)
def load_keyword_catalog() -> list[tuple[str, str | None]]:
    """Ordered (keyword, usage_text) pairs from KEYWORD_USAGE_TABLE;
    usage_text is None when the usage func isn't a parseable
    one-Println body."""
    src = open(_KWU, encoding="utf-8").read()
    tbl = re.search(
        r"KEYWORD_USAGE_TABLE = \[\]tKeywordUsageEntry\{(.*?)\n\}",
        src, re.S)
    order = re.findall(r'\{"([^"]+)", (\w+)\}', tbl.group(1))
    texts: dict[str, str] = {}
    for m in re.finditer(r"func (\w+KeywordUsage)\(\) \{", src):
        fn = m.group(1)
        j = m.end()
        # first string literal inside the body, if the body is a
        # single fmt.Println(<literal>)
        m2 = re.match(r"\s*fmt\.Println\(\s*", src[j:])
        if not m2:
            continue
        k = j + m2.end()
        if src[k] not in "\"`":
            continue
        val, k2 = _go_strings(src, k)
        m3 = re.match(r"\s*\)\s*\n\}", src[k2:])
        if m3:
            texts[fn] = val
    return [(name, texts.get(fn)) for name, fn in order]


def keyword_usage(name: str) -> str | None:
    for kw, text in load_keyword_catalog():
        if kw == name:
            return None if text is None else f"{kw}: {text}\n"
    return None


def keyword_usage_approximate(sub: str) -> list[str]:
    out = []
    for kw, text in load_keyword_catalog():
        if sub in kw and text is not None:
            out.append(f"{kw}: {text}\n")
    return out


def bif_usage_exact(name: str) -> str | None:
    for e in load_bif_catalog():
        if e["name"] == name:
            return bif_usage(e)
    return None


def bif_usage_approximate(sub: str) -> list[str]:
    return [bif_usage(e) for e in load_bif_catalog() if sub in e["name"]]


_MANPAGE = os.path.join(_REF, "docs/src/manpage.txt")
# the generated manpage carries cooked bold markers: literal
# "1m"/"0m" (ESC bytes stripped at generation time)
_BOLD_HDR = re.compile(r"^   (?:\x1b\[)?1m(.+?)(?:\x1b\[)?0m\s*$")


@lru_cache(maxsize=1)
def load_verb_catalog() -> list[tuple[str, str]]:
    """Ordered (verb, usage_text) pairs, extracted from the generated
    manpage's VERBS section (docs/src/manpage.txt — the rendered
    output of each transformer's UsageFunc, 7-space indented under a
    bold verb header). TRANSFORMER_LOOKUP_TABLE order is preserved
    (aaa_transformer_table.go; e.g. sec2gmtdate precedes sec2gmt)."""
    lines = open(_MANPAGE, encoding="utf-8").read().split("\n")
    # find the top-level VERBS section
    start = None
    for i, ln in enumerate(lines):
        if re.match(r"^(?:\x1b\[)?1mVERBS(?:\x1b\[)?0m\s*$", ln):
            start = i + 1
            break
    if start is None:
        return []
    out: list[tuple[str, str]] = []
    name: str | None = None
    body: list[str] = []

    def flush():
        if name is not None:
            while body and body[-1] == "":
                body.pop()
            out.append((name, "\n".join(body) + "\n"))

    for ln in lines[start:]:
        if re.match(r"^(?:\x1b\[)?1m", ln):  # next top-level section
            break
        m = _BOLD_HDR.match(ln)
        if m:
            flush()
            name, body = m.group(1), []
        elif name is not None:
            if ln.startswith("       "):
                ln = ln[7:]
                # the manpage generator expanded the one literal TAB in
                # the put/filter usage (put_or_filter.go "\t'if ($a =~")
                # to spaces; restore it for byte-exact usage text
                ln = re.sub(r"^ +('if \(\$a =~ )", "\t\\1", ln)
                body.append(ln)
            elif ln.strip() == "":
                body.append("")
            else:
                body.append(ln.strip())
    flush()
    return out


def verb_usage_exact(verb: str) -> str | None:
    for v, text in load_verb_catalog():
        if v == verb:
            return f"{v}\n{text}"
    return None


def verb_usage_approximate(sub: str) -> list[str]:
    return [f"{v}\n{text}" for v, text in load_verb_catalog() if sub in v]


_OPT_PARSE = os.path.join(_REF, "pkg/cli/option_parse.go")


@lru_cache(maxsize=1)
def load_flag_catalog() -> list[dict]:
    """Ordered flag entries {name, help, altNames} from the cli flag
    table (option_parse.go), with sections ordered as in FLAG_TABLE."""
    src = open(_OPT_PARSE, encoding="utf-8").read()
    tbl = re.search(r"var FLAG_TABLE = FlagTable\{.*?sections: "
                    r"\[\]\*FlagSection\{(.*?)\}", src, re.S)
    section_order = re.findall(r"&(\w+)", tbl.group(1))
    flags_by_section: dict[str, list[dict]] = {}
    section_display: dict[str, str] = {}
    for m in re.finditer(r"var (\w+) = FlagSection\{", src):
        sec = m.group(1)
        dn = re.search(r'name: +"([^"]+)"', src[m.end():m.end() + 400])
        section_display[sec] = dn.group(1) if dn else sec
        fls = src.index("flags: []Flag{", m.end())
        # section ends at the next section var (or EOF)
        nxt = re.search(r"^var \w+ = FlagSection\{", src[m.end():], re.M)
        end = m.end() + nxt.start() if nxt else len(src)
        body = src[fls:end]
        entries: list[dict] = []
        cur: dict | None = None
        pos = 0
        for fm in re.finditer(r"^\s*(name|help|altNames): +", body, re.M):
            if fm.start() < pos:
                continue
            fld = fm.group(1)
            j = fm.end()
            if fld == "name":
                val, j = _go_strings(body, j)
                cur = {"name": val, "help": "", "altNames": []}
                entries.append(cur)
            elif cur is None:
                pass
            elif fld == "help":
                parts = []
                while True:
                    val, j = _go_strings(body, j)
                    parts.append(val)
                    m3 = re.match(r"\s*\+\s*", body[j:])
                    if m3 and body[j + m3.end()] in "\"`":
                        j += m3.end()
                    else:
                        break
                cur["help"] = "".join(parts)
            elif fld == "altNames":
                k = body.index("{", j) + 1
                while True:
                    while k < len(body) and body[k] in " \t\n,":
                        k += 1
                    if body[k] == "}":
                        break
                    val, k = _go_strings(body, k)
                    cur["altNames"].append(val)
                j = k + 1
            pos = j
        flags_by_section[sec] = entries
    out: list[dict] = []
    # each section init() sorts its flags by lowercase name, and
    # FLAG_TABLE.Sort() sorts sections by lowercase display name
    # (option_parse.go:136,253-3066; flag_types.go:128,338)
    for sec in sorted(section_order,
                      key=lambda s: section_display.get(s, s).lower()):
        out.extend(sorted(flags_by_section.get(sec, []),
                          key=lambda f: f["name"].lower()))
    return out


def _flag_help_one_line(help_text: str) -> str:
    return " ".join(help_text.split("\n"))


def flag_usage_exact(name: str) -> str | None:
    """ShowHelpForFlagWithName: flag name then one-line help."""
    for f in load_flag_catalog():
        if f["name"] == name or name in f["altNames"]:
            return f"{name}\n{_flag_help_one_line(f['help'])}\n"
    return None


def flag_usage_approximate(sub: str) -> list[str]:
    out = []
    for f in load_flag_catalog():
        if sub in f["name"] or any(sub in a for a in f["altNames"]):
            out.append(f"{f['name']}\n{_flag_help_one_line(f['help'])}\n")
    return out
