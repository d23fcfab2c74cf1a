"""Miller REPL session engine (reference: pkg/terminals/repl/) in
script mode (``mlr repl -q -s < script``), replayed for conformance.

DSL statements execute immediately against one persistent runtime
state (locals, @oosvars, UDFs survive across lines — the reference
reuses a single runtime.State, session.go:63-75); ``begin``/``end``
blocks and func/subr definitions accumulate without executing
(dsl.go:70-76); ``:``-commands manage the record stream, block
execution and AST printing (verbs.go handler table).

This is a terminal/interactive surface, inherently single-process —
there is no Ray Data pipeline here by design; the engine reuses the
same sequential DSL interpreter the conformance harness runs."""
from __future__ import annotations

import dataclasses
import os

import pyarrow as pa


def _parex(node, oneline: bool) -> str:
    """Parenthesized-expression AST print (pgpg asts PrintParex /
    PrintParexOneLine as evidenced by repl/0011-0012 goldens): leaves
    print their token text; a node whose children are all leaves
    prints on one line; otherwise children indent by 4."""
    def leaf(n) -> bool:
        return not n.children

    def one(n) -> str:
        if leaf(n):
            return n.text
        return "(" + " ".join([n.text] + [one(c) for c in n.children]) + ")"

    if oneline:
        return one(node) + "\n"

    lines: list[str] = []

    def walk(n, d: int):
        pad = "    " * d
        if leaf(n):
            lines.append(pad + n.text)
        elif all(leaf(c) for c in n.children):
            lines.append(pad + one(n))
        else:
            lines.append(pad + "(" + n.text)
            for c in n.children:
                walk(c, d + 1)
            lines.append(pad + ")")

    walk(node, 0)
    return "\n".join(lines) + "\n"


class ReplWriter:
    """Incremental record writer: the REPL writes records one at a
    time and the JSON writer keeps list-wrap state across writes
    (record_writer_json listwrap; a nil record — end-of-stream from
    ':w' after the reader dried up — emits the closing bracket,
    repl/0009-0010 goldens)."""

    def __init__(self, out: list[str], fmt: str, flatsep: str,
                 unflatten: bool):
        self.out = out
        self.fmt = fmt
        self.flatsep = flatsep
        self.unflatten = unflatten  # ifmt != json and ofmt == json
        self.wrote_any = False
        self.hdr: list[str] | None = None  # csv/tsv header state

    def write(self, rec: dict | None) -> None:
        from miller_ray import conformance as C
        from miller_ray import dsl as DSL

        if self.fmt == "json":
            if rec is None:
                self.out.append("\n]\n" if self.wrote_any else "[\n]\n")
                return
            if self.unflatten:
                rec = C._auto_unflatten(rec, sep=self.flatsep)
            body = DSL._mlr_json(rec, ofmt=C.REGTEST_OFMT[0])
            self.out.append(("," if self.wrote_any else "[") + "\n" + body)
            self.wrote_any = True
            return
        if rec is None:
            return
        fr: dict = {}
        for k, v in rec.items():
            if isinstance(v, (dict, list)):
                DSL._flatten_into(fr, str(k), v, sep=self.flatsep)
            else:
                fr[k] = v
        if self.fmt == "xtab":
            if self.wrote_any:
                self.out.append("\n")  # blank line between records
            self.out.append(C.render_records([fr], "xtab"))
        elif self.fmt in ("csv", "csvlite", "tsv", "tsvlite"):
            sep = "\t" if self.fmt.startswith("tsv") else ","
            keys = list(fr.keys())
            if keys != self.hdr:
                if self.hdr is not None:
                    self.out.append("\n")
                self.hdr = keys
                self.out.append(sep.join(C._csv_quote(str(k))
                                         for k in keys) + "\n")
            self.out.append(sep.join(
                C._csv_quote(C._render_value(fr[k])) for k in keys) + "\n")
        else:  # dkvp / nidx / markdown-per-record etc.
            self.out.append(C.render_records([fr], self.fmt))
        self.wrote_any = True


class ReplSession:
    def __init__(self, case, ast_mode: str = "none",
                 loads: list[str] | None = None):
        from miller_ray import dsl as DSL

        self.case = case
        self.out: list[str] = []
        self.flatsep = case.flatsep or "."
        self.writer = ReplWriter(
            self.out, case.ofmt, self.flatsep,
            unflatten=(case.ofmt == "json" and case.ifmt != "json"))
        self.ast_mode = ast_mode
        self.seq: dict = {"oos": {}, "emitted": [], "texts": [],
                          "outq": [], "flatsep": self.flatsep,
                          "ofmt": None}
        self.funcs: dict = {}
        self.subrs: dict = {}
        self.scopes: list[dict] = [{}]
        # $* is the empty map until a record is read (session.go:59)
        self.srec: dict | None = {}
        self.ctx = {"FILENAME": "(stdin)", "FILENUM": 0, "NR": 0, "FNR": 0}
        self.begin_blocks: list = []
        self.main_stmts: list = []
        self.end_blocks: list = []
        # a host Program carries the session-level func/subr registry
        self.host = DSL.Program([])
        self.host.funcs = self.funcs
        self.host.subrs = self.subrs
        self.stream: list = []   # (rec, filename, filenum, fnr)
        self.pos = 0
        self.base_nr = 0
        self.base_filenum = 0
        self.reader_open = False
        self.opened_files: list[str] = []
        for name in loads or []:
            self._load_path(name)
        if case.files:
            self.open_files(list(case.files))

    # ---- output plumbing -------------------------------------------
    def _println(self, s: str) -> None:
        self.out.append(s + "\n")

    def _drain(self) -> None:
        for kind, item in self.seq.get("outq") or []:
            if kind == "rec":
                self.writer.write(item)
            elif kind == "textn":
                self.out.append(item)
            else:
                self.out.append(str(item) + "\n")
        self.seq["outq"] = []
        self.seq["texts"].clear()
        self.seq["emitted"].clear()
        if self.seq.get("buf"):
            self.out.append(self.seq.pop("buf"))

    # ---- DSL handling ----------------------------------------------
    def _env(self, prog) -> dict:
        return {"\x00seq": self.seq, "\x00funcs": self.funcs,
                "\x00subrs": self.subrs, "\x00scopes": self.scopes,
                "\x00srec": self.srec if self.srec is not None else {},
                "\x00prog": prog,
                "\x00NR": self.ctx["NR"], "\x00FNR": self.ctx["FNR"],
                "\x00FILENAME": self.ctx["FILENAME"],
                "\x00FILENUM": self.ctx["FILENUM"]}

    def _exec(self, stmts, prog=None) -> dict:
        state = {"mask": None, "bare": None}
        prog = prog or self.host
        prog._exec(stmts, pa.table({}), self._env(prog), None, state)
        self._drain()
        return state

    def _print_ast(self, src: str) -> None:
        from miller_ray import dsl_ast as AST

        try:
            node = AST.parse(src)
        except AST.AstError:
            return  # parse errors go to stderr in the reference
        if self.ast_mode == "indent":
            self.out.append(AST.render(node))
        elif self.ast_mode == "parex":
            self.out.append(_parex(node, oneline=False))
        elif self.ast_mode == "parex1":
            self.out.append(_parex(node, oneline=True))

    def handle_dsl(self, src: str, immediate: bool) -> None:
        """dsl.go handleDSLStringAux: begin/end/func/subr accumulate;
        other statements execute now (immediate) or append to the main
        block (bulk: '<<' multi-line, :load, --load)."""
        from miller_ray import dsl as DSL

        if not src.strip():
            return
        if self.ast_mode != "none":
            self._print_ast(src)
        try:
            prog = DSL.compile_program(src)
        except DSL.DslError:
            return  # parse errors print to stderr (not compared)
        self.funcs.update(prog.funcs)
        self.subrs.update(prog.subrs)
        self.begin_blocks.extend(prog.begin)
        self.end_blocks.extend(prog.end)
        prog.funcs = self.funcs
        prog.subrs = self.subrs
        if not prog.statements:
            return
        if not immediate:
            self.main_stmts.extend(prog.statements)
            return
        try:
            state = self._exec(prog.statements, prog)
        except Exception:  # noqa: BLE001 — runtime errors go to
            self._drain()  # stderr; the session continues (dsl.go:101)
            return
        bare = state["bare"]
        if bare is None:
            return  # FilterExpression stayed NULL: nothing to print
        from miller_ray import conformance as C

        if DSL._is_arr(bare):
            try:
                bare = DSL._scalarize(bare)
            except DSL.DslError:
                return
        self._println(C._repl_render(bare))

    def _load_path(self, name: str) -> None:
        """--load/:load semantics (lib.LoadStringsFromFileOrDir): a
        directory loads every *.mlr inside; each file is one bulk DSL
        string."""
        from miller_ray import conformance as C

        full = os.path.join(C.REFERENCE, name)
        paths = [full]
        if os.path.isdir(full):
            paths = sorted(
                os.path.join(full, f) for f in os.listdir(full)
                if f.endswith(".mlr"))
        for p in paths:
            if not os.path.exists(p):
                self.out.append(
                    f'Cannot load DSL expression file "{name}": \n')
                return
            with open(p, encoding="utf-8") as fh:
                self.handle_dsl(fh.read(), immediate=False)

    # ---- record stream ---------------------------------------------
    def open_files(self, files: list[str]) -> None:
        from miller_ray import conformance as C

        for f in files:
            if not os.path.exists(os.path.join(C.REFERENCE, f)):
                self._println(f'mlr repl: could not open "{f}"')
                return
        self.opened_files = list(files)
        case2 = dataclasses.replace(self.case, files=list(files),
                                    unsupported=None, verb="cat", args=[])
        df = C.load_df(case2)
        raw = df.attrs.get("raw_records") or []
        entries: list = []
        if len(df):
            fnr = df.groupby("__filenum__", sort=False) \
                    .cumcount().to_numpy() + 1
            for i in range(len(raw)):
                entries.append((raw[i], str(df["__file__"].iloc[i]),
                                int(df["__filenum__"].iloc[i]),
                                int(fnr[i])))
        self.stream = entries
        self.pos = 0
        # the reader continues from the context at :open time
        # (verbs.go openFiles passes *runtimeState.Context)
        self.base_nr = self.ctx["NR"]
        self.base_filenum = self.ctx["FILENUM"]
        self.reader_open = True

    def _read_one(self) -> str:
        """One channel read (verbs.go handleRead): 'rec', 'eos', or
        'nofiles'."""
        if not self.reader_open:
            self._println("No open files")
            return "nofiles"
        if self.pos >= len(self.stream):
            self._println("End of record stream")
            self.reader_open = False
            self.srec = None  # Inrec goes nil at end-of-stream
            return "eos"
        rec, fname, fnum, fnr = self.stream[self.pos]
        self.pos += 1
        self.ctx.update(NR=self.base_nr + self.pos, FNR=fnr,
                        FILENAME=fname,
                        FILENUM=self.base_filenum + fnum)
        self.srec = dict(rec)
        return "rec"

    def _write_current(self) -> None:
        self.writer.write(dict(self.srec) if self.srec is not None
                          else None)

    def _skip_or_process_n(self, n: int, processing: bool) -> None:
        for _ in range(n):
            status = self._read_one()
            if status != "rec":
                return
            if processing:
                self._exec_main()
                self._write_current()

    def _skip_or_process_until(self, expr: str, processing: bool) -> None:
        from miller_ray import dsl as DSL

        if self.ast_mode != "none":
            self._print_ast(expr)
        try:
            prog = DSL.compile_program(expr)
        except DSL.DslError:
            return
        prog.funcs, prog.subrs = self.funcs, self.subrs
        while True:
            status = self._read_one()
            if status != "rec":
                return
            if processing:
                self._exec_main()
                self._write_current()
            try:
                state = self._exec(prog.statements, prog)
            except Exception:  # noqa: BLE001
                self._drain()
                return
            bare = state["bare"]
            if DSL._is_arr(bare):
                bare = DSL._scalarize(bare)
            if isinstance(bare, bool) and bare:
                return

    def _exec_main(self) -> None:
        if self.main_stmts:
            try:
                self._exec(self.main_stmts)
            except Exception:  # noqa: BLE001
                self._drain()

    # ---- colon-command dispatch --------------------------------------
    def handle_colon(self, line: str) -> None:
        from miller_ray import conformance as C

        args = line.split()
        verb, rest = args[0], args[1:]
        if verb in (":l", ":load"):
            for name in rest:
                self._load_path(name)
        elif verb in (":o", ":open"):
            self.open_files(rest)
        elif verb == ":reopen":
            self.open_files(self.opened_files)
        elif verb in (":r", ":read"):
            self._read_one()
        elif verb in (":w", ":write"):
            self._write_current()
        elif verb == ":rw":
            self._read_one()
            self._write_current()
        elif verb in (":c", ":context"):
            c = self.ctx
            self._println(f'FILENAME="{c["FILENAME"]}",'
                          f'FILENUM={c["FILENUM"]},'
                          f'NR={c["NR"]},FNR={c["FNR"]}')
        elif verb in (":s", ":skip", ":p", ":process"):
            processing = verb in (":p", ":process")
            if not self.reader_open:
                self._println("No open files")
                return
            if not rest:
                return
            if rest[0] in ("until", "u"):
                expr = " ".join(rest[1:])
                if expr == "intr":
                    expr = "false"
                self._skip_or_process_until(expr, processing)
            else:
                try:
                    n = int(rest[0])
                except ValueError:
                    self._println(
                        f'Could not parse "{rest[0]}" as integer.')
                    return
                self._skip_or_process_n(n, processing)
        elif verb in (":b", ":begin"):
            for blk in self.begin_blocks:
                self._exec([blk])
        elif verb in (":m", ":main"):
            self._exec_main()
        elif verb in (":e", ":end"):
            for blk in self.end_blocks:
                self._exec([blk])
        elif verb == ":blocks":
            self._println(f"#begin {len(self.begin_blocks)}")
            self._println(f"#main  {len(self.main_stmts)}")
            self._println(f"#end   {len(self.end_blocks)}")
        elif verb in (":rb", ":resetblocks"):
            which = rest or ["begin", "main", "end"]
            if "begin" in which:
                self.begin_blocks = []
            if "main" in which:
                self.main_stmts = []
            if "end" in which:
                self.end_blocks = []
        elif verb == ":astprint":
            if rest and rest[0] in ("parex", "parex1", "indent", "none"):
                self.ast_mode = rest[0]
            elif rest:
                self._println(f"Unrecognized style {rest[0]}: "
                              f"see ':help :astprint'.")
        elif verb in (":h", ":help"):
            if not rest:
                raise C.Unsupported(":help with no args (option list)")
            if rest[0] == "find":
                for arg in rest[1:]:
                    self._help_find_single(arg)
            else:
                for arg in rest:
                    self._help_single(arg)
        elif verb.startswith("??"):
            if verb[2:]:
                self._help_find_single(verb[2:])
        elif verb.startswith("?"):
            if verb[1:]:
                self._help_single(verb[1:])
            else:
                raise C.Unsupported("? with no args (option list)")
        elif verb in (":>", ":>>"):
            raise C.Unsupported(f"repl command {verb}")
        else:
            self._println(f"REPL verb {verb} not found.")

    _REPL_HANDLER_NAMES = (
        ":l :load :o :open :reopen :r :read :w :write :rw :c :context "
        ":s :skip :p :process :> :>> :b :begin :m :main :e :end "
        ":astprint :blocks :rb :resetblocks :q :quit :h :help").split()

    def _help_single(self, arg: str) -> None:
        """repl/verbs.go handleHelpSingle: keyword usage, then builtin
        function usage, then REPL-handler usage."""
        from miller_ray import conformance as C
        from miller_ray import help_catalog as H

        if arg in ("intro", "examples", "repl-details", "prompt",
                   "function-names", "function-details"):
            raise C.Unsupported(f":help {arg} (prose dump)")
        if arg == "repl-list":
            raise C.Unsupported(":help repl-list")
        text = H.keyword_usage(arg)
        if text is not None:
            self.out.append(text)
            return
        text = H.bif_usage_exact(arg)
        if text is not None:
            self.out.append(text)
            return
        if arg in self._REPL_HANDLER_NAMES:
            raise C.Unsupported(f":help {arg} (handler usage text)")
        self._println(f"No help available for {arg}")

    def _help_find_single(self, arg: str) -> None:
        from miller_ray import conformance as C
        from miller_ray import help_catalog as H

        found = False
        for text in H.keyword_usage_approximate(arg):
            self.out.append(text)
            found = True
        for text in H.bif_usage_approximate(arg):
            self.out.append(text)
            found = True
        if any(arg in h for h in self._REPL_HANDLER_NAMES):
            raise C.Unsupported(f":help find {arg} (handler usage)")
        if not found:
            self._println(f"No help available for {arg}. Try "
                          f'":help find {arg}" to search for matches')

    # ---- session loop -------------------------------------------------
    def run_lines(self, lines: list[str]) -> None:
        it = iter(lines)
        for raw in it:
            line = raw.strip()
            if line in ("<", "<<"):
                term = ">" if line == "<" else ">>"
                buf: list[str] = []
                for nxt in it:
                    if nxt.strip() == term:
                        break
                    buf.append(nxt)
                self.handle_dsl("".join(buf), immediate=(term == ">"))
            elif line in (":quit", ":q"):
                break
            elif line.startswith(":") or line.startswith("?"):
                self.handle_colon(line)
            elif line:
                self.handle_dsl(raw, immediate=True)

    def output(self) -> str:
        return "".join(self.out)


def run_repl_case(case_dir: str, cmd: str) -> tuple[str, str]:
    """Replay one `mlr repl -q -s ... < script` golden case."""
    import shlex

    from miller_ray import conformance as C
    from miller_ray import functions as _bifs

    toks = shlex.split(cmd.strip())
    if "<" not in toks:
        raise C.Unsupported("repl without script redirect")
    script = toks[toks.index("<") + 1]
    toks = toks[:toks.index("<")]
    toks = toks[2:]  # past "mlr repl"
    ast_mode = "none"
    loads: list[str] = []
    main_toks: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t in ("-q", "-s", "-w", "-z"):
            i += 1
        elif t == "-v":
            ast_mode, i = "indent", i + 1
        elif t == "-d":
            ast_mode, i = "parex", i + 1
        elif t == "-D":
            ast_mode, i = "parex1", i + 1
        elif t == "--load":
            loads.append(toks[i + 1])
            i += 2
        elif t == "--mload":
            i += 1
            while i < len(toks) and toks[i] != "--":
                loads.append(toks[i])
                i += 1
            i += 1  # past "--"
        else:
            main_toks.append(t)
            i += 1
    # split data-file names (opened as if via :open, entry.go:200)
    # from reader/writer main flags, then parse the flags through the
    # main-flag parser with a synthesized no-op verb
    files = [t for t in main_toks
             if not t.startswith("-")
             and os.path.exists(os.path.join(C.REFERENCE, t))]
    flags = [t for t in main_toks if t not in files]
    case = C.parse_cmd("mlr " + " ".join(flags + ["cat"]))
    if case.unsupported:
        raise C.Unsupported(case.unsupported)
    case = dataclasses.replace(case, files=files)
    saved = _bifs.OFMT
    if C.REGTEST_OFMT[0] is not None:
        _bifs.OFMT = C.REGTEST_OFMT[0]
    try:
        sess = ReplSession(case, ast_mode=ast_mode, loads=loads)
        with open(os.path.join(case_dir, "input"),
                  encoding="utf-8", errors="surrogateescape") as fh:
            sess.run_lines(fh.readlines())
        got = sess.output()
    finally:
        _bifs.OFMT = saved
    exp_p = os.path.join(case_dir, "expout")
    exp = open(exp_p, encoding="utf-8").read() if os.path.exists(exp_p) \
        else ""
    if got.rstrip("\n") == exp.rstrip("\n"):
        return "pass", "repl session ok"
    return "fail", (f"{cmd}: repl mismatch got {got[:120]!r} "
                    f"want {exp[:120]!r}")
