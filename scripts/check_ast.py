"""Diff dsl_ast.verbose_header against every `-v` golden case."""
import os, re, shlex, sys
sys.path.insert(0, "/root/repo")
from miller_ray import dsl_ast as A

REF = "/root/reference"
CASES = os.path.join(REF, "test/cases")
ok = bad = skip = 0
fails = []
for suite in sorted(os.listdir(CASES)):
    sdir = os.path.join(CASES, suite)
    if not os.path.isdir(sdir):
        continue
    for cid in sorted(os.listdir(sdir)):
        cdir = os.path.join(sdir, cid)
        cmdf = os.path.join(cdir, "cmd")
        if not os.path.exists(cmdf):
            continue
        cmd = open(cmdf).read().strip()
        toks = shlex.split(cmd.replace("${CASEDIR}", os.path.relpath(cdir, REF)))
        if "-v" not in toks or not (("put" in toks) or ("filter" in toks)):
            continue
        # extract program: -f file(s) or inline after put/filter flags
        srcs = []
        j = 0
        while j < len(toks):
            if toks[j] == "-f" and j+1 < len(toks):
                p = os.path.join(REF, toks[j+1])
                if os.path.exists(p):
                    srcs.append(open(p).read())
                j += 2
            elif toks[j] == "-e" and j+1 < len(toks):
                srcs.append(toks[j+1]); j += 2
            else:
                j += 1
        if not srcs:
            # inline: the arg after the verb that isn't a flag
            vi = max(toks.index(v) for v in ("put", "filter") if v in toks)
            rest = [t for t in toks[vi+1:] if not t.startswith("-")]
            # drop trailing file args (exist on disk relative to REF)
            rest = [t for t in rest if not os.path.exists(os.path.join(REF, t))]
            if len(rest) >= 1:
                srcs = [rest[0]]
        if not srcs:
            skip += 1; continue
        try:
            hdr = "".join(A.verbose_header(s) for s in srcs)
        except A.AstError as e:
            bad += 1; fails.append((suite, cid, f"AstError: {e}")); continue
        exp = open(os.path.join(cdir, "expout")).read()
        if exp.startswith(hdr):
            ok += 1
        else:
            bad += 1
            # find first diff line
            el = exp.splitlines(); hl = hdr.splitlines()
            d = next((k for k in range(min(len(el), len(hl))) if el[k] != hl[k]), min(len(el), len(hl)))
            fails.append((suite, cid, f"line {d}: exp={el[d] if d < len(el) else '<end>'!r} got={hl[d] if d < len(hl) else '<end>'!r}"))
print(f"ok={ok} bad={bad} skip={skip}")
import collections
bysuite = collections.Counter(s for s, _, _ in fails)
print(dict(bysuite))
for s, c, msg in fails[: int(os.environ.get("NSHOW", 25))]:
    print(f"{s}/{c}: {msg[:200]}")
