"""Text-format sources and sinks for the engine (reference
``pkg/input/record_reader_factory.go:9-44`` /
``pkg/output/record_writer_factory.go:9-42``).

Arrow-native formats ride Ray Data's own readers (``read_csv`` /
``read_json``); Miller's line-oriented formats (DKVP, NIDX) are built as
``read_text`` + a vectorized ``map_batches`` parser — Arrow string
kernels split lines and pairs, and columns materialize per distinct key
with a scatter, no Python-per-record in the parse path. Sinks write one
file per block (content-named parts — the resumable-output layout).

Type inference mirrors ``pkg/mlrval/mlrval_infer.go``: int, then float,
else string; Arrow's CSV reader does the same inference natively.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------

def read_csv(paths, **kw):
    """CSV source (record_reader_csv.go): header-driven field names,
    native Arrow type inference."""
    import ray.data as rd

    return rd.read_csv(paths, **kw)


def read_tsv(paths, **kw):
    import ray.data as rd
    from pyarrow import csv as pacsv

    return rd.read_csv(paths,
                       parse_options=pacsv.ParseOptions(delimiter="\t"), **kw)


def read_jsonl(paths, **kw):
    """JSON-lines source (record_reader_json.go streaming form)."""
    import ray.data as rd

    return rd.read_json(paths, **kw)


def _infer_column(vals: np.ndarray) -> pa.Array:
    """Miller's scan order (mlrval_infer.go): int, float, else string.
    Whole-column decision (Arrow columns are homogeneous)."""
    s = pd.Series(vals)
    present = s.notna() & (s != "")
    if present.any():
        as_num = pd.to_numeric(s[present], errors="coerce")
        if as_num.notna().all():
            if (as_num.astype(np.int64, errors="ignore") == as_num).all() \
                    and s[present].str.fullmatch(r"[+-]?\d+").all():
                out = pd.Series(np.full(len(s), np.nan), dtype="float64")
                out[present.to_numpy()] = as_num.to_numpy()
                return pa.array(out.astype("Int64"))
            out = np.full(len(s), np.nan)
            out[present.to_numpy()] = as_num.to_numpy(dtype=np.float64)
            return pa.array(out)
    return pa.array([None if x is np.nan or x is None else x for x in vals],
                    type=pa.string())


def read_dkvp(paths, ifs: str = ",", ips: str = "=", infer_types: bool = True):
    """DKVP source (record_reader_dkvp_nidx.go): ``k=v,k=v`` lines.

    Vectorized parse: split lines on ``ifs`` -> flat pair array ->
    split once on ``ips`` -> per distinct key, scatter values into a
    column by parent-row index. Columns = union of keys per block;
    Ray unifies block schemas (missing keys -> null)."""
    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        lines = t["text"]
        pairs = pc.split_pattern(lines, ifs)
        flat = pc.list_flatten(pairs)
        parents = pc.list_parent_indices(pairs).to_numpy(zero_copy_only=False)
        kv = pc.split_pattern(flat, ips, max_splits=1)
        keys = pc.list_element(kv, 0).to_numpy(zero_copy_only=False)
        has_val = pc.list_value_length(kv).to_numpy(zero_copy_only=False) == 2
        vals = np.empty(len(flat), dtype=object)
        if has_val.any():
            second = pc.list_flatten(pc.list_slice(kv, 1, 2))
            vals[has_val] = second.to_numpy(zero_copy_only=False)
        vals[~has_val] = ""
        n = t.num_rows
        cols: dict[str, pa.Array] = {}
        for key in pd.unique(keys):
            sel = keys == key
            col = np.full(n, None, dtype=object)
            col[parents[sel]] = vals[sel]
            cols[str(key)] = (_infer_column(col) if infer_types
                              else pa.array(col, type=pa.string()))
        return pa.table(cols)

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow",
                                           batch_size=None)


def read_nidx(paths, ifs: str | None = None, infer_types: bool = True):
    """NIDX source: whitespace- (or ifs-) split positional fields with
    1-up integer keys."""
    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        toks = (pc.split_pattern_regex(t["text"], pattern=r"\s+")
                if ifs is None else pc.split_pattern(t["text"], ifs))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        width = int(lens.max()) if len(lens) else 0
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        offs = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        pos = np.arange(len(flat)) - offs[parents]
        cols = {}
        for i in range(width):
            col = np.full(t.num_rows, None, dtype=object)
            sel = pos == i
            col[parents[sel]] = flat[sel]
            cols[str(i + 1)] = (_infer_column(col) if infer_types
                                else pa.array(col, type=pa.string()))
        return pa.table(cols)

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow",
                                           batch_size=None)


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------

def write_csv(ds, path, **kw):
    return ds.write_csv(path, **kw)


def write_jsonl(ds, path, **kw):
    return ds.write_json(path, **kw)


def _render_dkvp(t: pa.Table, ofs: str = ",", ops: str = "=") -> pa.Array:
    pieces = []
    for c in t.column_names:
        s = pc.cast(t[c], pa.string())
        pieces.append(pc.binary_join_element_wise(
            pa.array([c] * t.num_rows), pc.fill_null(s, ""), ops))
    if len(pieces) == 1:
        return pieces[0]
    return pc.binary_join_element_wise(*pieces, ofs)


def _part_name(lines: pa.Array, ext: str) -> str:
    """Deterministic content-derived part name (resumable layout:
    re-running the same block rewrites the same file). Hashes the FULL
    rendered content so distinct blocks never collide; byte-IDENTICAL
    blocks do hash alike — _write_part disambiguates them with an
    O_EXCL ordinal probe so duplicated data is never silently lost."""
    import hashlib

    h = hashlib.md5()
    arr = lines.combine_chunks() if isinstance(lines, pa.ChunkedArray) else lines
    h.update(str(len(arr)).encode())
    for buf in arr.buffers():
        if buf is not None:
            h.update(buf)
    return f"part-{h.hexdigest()[:16]}.{ext}"


def _write_part(out_dir: str, lines: pa.Array, ext: str) -> str:
    """Write one rendered block under its content-hash name. If that
    name is taken (a byte-identical block in the SAME run — two equal
    blocks must yield two files), probe ``-2``, ``-3``… with O_EXCL so
    concurrent writers never clobber each other. A rerun over the same
    data starts from a cleared/unique out_dir (sinks are terminal), so
    pre-existing files are treated as same-run duplicates."""
    base = _part_name(lines, ext)
    stem, dot, suffix = base.rpartition(".")
    path = os.path.join(out_dir, base)
    k = 1
    while True:
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            break
        except FileExistsError:
            k += 1
            path = os.path.join(out_dir, f"{stem}-{k}.{suffix}")
    with os.fdopen(fd, "w") as f:
        for v in lines.to_pylist():
            f.write(v + "\n")
    return path


def write_dkvp(ds, out_dir: str, ofs: str = ",", ops: str = "="):
    """DKVP sink: one ``part-<contenthash>.dkvp`` file per block."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        lines = _render_dkvp(t, ofs, ops)
        path = _write_part(out_dir, lines, "dkvp")
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None).to_pandas()


def write_nidx(ds, out_dir: str, ofs: str = " "):
    """NIDX sink: positional values joined by ``ofs``."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        cols = [pc.fill_null(pc.cast(t[c], pa.string()), "")
                for c in t.column_names]
        lines = (pc.binary_join_element_wise(*cols, ofs)
                 if len(cols) > 1 else cols[0])
        path = _write_part(out_dir, lines, "nidx")
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None).to_pandas()


# ---------------------------------------------------------------------------
# round 3: multi-line text formats (xtab / pprint / markdown / yaml /
# recutils-dcf), promoted from the conformance harness into first-class
# Dataset sources and sinks (record_reader_factory.go:9-44,
# record_writer_factory.go:9-42).
#
# These are record-spans-multiple-lines formats, so the parallel unit is
# the FILE: ``read_binary_files`` gives one row per file and the parser
# runs per file inside ``map_batches`` (files parse concurrently across
# the actor pool; a 100-TB corpus of these human-oriented formats is a
# corpus of MANY files, so per-file parallelism is the honest grain).
# ---------------------------------------------------------------------------

def _records_to_table(recs: list[dict], infer_types: bool) -> pa.Table:
    """Union-schema table from ordered record dicts (key order of first
    appearance; missing fields -> null)."""
    cols: list[str] = []
    seen = set()
    for r in recs:
        for k in r:
            if k not in seen:
                seen.add(k)
                cols.append(k)
    n = len(recs)
    out = {}
    for c in cols:
        col = np.full(n, None, dtype=object)
        for i, r in enumerate(recs):
            if c in r:
                col[i] = r[c]
        nonnull = [x for x in col if x is not None]
        if nonnull and not all(isinstance(x, str) for x in nonnull):
            out[c] = pa.array(col)  # already typed (e.g. YAML scalars)
        elif infer_types:
            out[c] = _infer_column(col)
        else:
            out[c] = pa.array(col, type=pa.string())
    return pa.table(out) if out else pa.table({"__empty__": pa.nulls(0)})


def _per_file_reader(paths, parse_text, infer_types: bool = True):
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        recs: list[dict] = []
        for raw in batch["bytes"]:
            recs.extend(parse_text(bytes(raw).decode("utf-8")))
        return _records_to_table(recs, infer_types)

    return rd.read_binary_files(paths).map_batches(parse,
                                                   batch_format="numpy")


def _parse_xtab_text(text: str) -> list[dict]:
    """XTAB: one `key value` per line, records separated by blank lines
    (record_reader_xtab.go). The key is the first whitespace-run-
    delimited token; the rest (stripped) is the value."""
    recs: list[dict] = []
    cur: dict = {}
    for line in text.split("\n"):
        if line.strip() == "":
            if cur:
                recs.append(cur)
                cur = {}
            continue
        parts = line.split(None, 1)
        cur[parts[0]] = parts[1].strip() if len(parts) > 1 else ""
    if cur:
        recs.append(cur)
    return recs


def read_xtab(paths, infer_types: bool = True):
    return _per_file_reader(paths, _parse_xtab_text, infer_types)


def _parse_pprint_text(text: str) -> list[dict]:
    """PPRINT: whitespace-aligned columns, first line is the header; a
    blank line starts a new header block (record_reader_pprint.go);
    the `-` cell renders a void value."""
    recs: list[dict] = []
    hdr: list[str] | None = None
    for line in text.split("\n"):
        if line.strip() == "":
            hdr = None
            continue
        parts = line.split()
        if hdr is None:
            hdr = parts
            continue
        recs.append({k: ("" if v == "-" else v)
                     for k, v in zip(hdr, parts)})
    return recs


def read_pprint(paths, infer_types: bool = True):
    return _per_file_reader(paths, _parse_pprint_text, infer_types)


def _parse_markdown_text(text: str) -> list[dict]:
    """Markdown tables: `| a | b |` header, `| --- |` separator, data
    rows (record_reader_markdown.go)."""
    recs: list[dict] = []
    hdr: list[str] | None = None
    for line in text.split("\n"):
        s = line.strip()
        if not s.startswith("|"):
            hdr = None
            continue
        cells = [c.strip() for c in s.strip("|").split("|")]
        if hdr is None:
            hdr = cells
            continue
        if all(set(c) <= {"-", ":", " "} and c for c in cells):
            continue  # separator row
        recs.append(dict(zip(hdr, cells)))
    return recs


def read_markdown(paths, infer_types: bool = True):
    return _per_file_reader(paths, _parse_markdown_text, infer_types)


def _parse_yaml_text(text: str) -> list[dict]:
    """YAML: a document that is a list of maps, or a stream of map
    documents (record_reader_yaml.go)."""
    import yaml

    recs: list[dict] = []
    for doc in yaml.safe_load_all(text):
        if doc is None:
            continue
        if isinstance(doc, list):
            recs.extend(d for d in doc if isinstance(d, dict))
        elif isinstance(doc, dict):
            recs.append(doc)
    return recs


def read_yaml(paths, infer_types: bool = True):
    return _per_file_reader(paths, _parse_yaml_text, infer_types)


def _parse_recutils_text(text: str) -> list[dict]:
    """recutils / DCF (Debian control file): `Key: value` lines,
    records separated by blank lines; `#` comment lines skipped
    (record_reader_rec.go / record_reader_dcf.go)."""
    recs: list[dict] = []
    cur: dict = {}
    last_key: str | None = None
    for line in text.split("\n"):
        if line.strip() == "":
            if cur:
                recs.append(cur)
                cur = {}
            last_key = None
            continue
        if line.lstrip().startswith("#"):
            continue
        if line[:1] in (" ", "\t") and last_key is not None:
            cur[last_key] = cur[last_key] + "\n" + line.strip()
            continue
        k, sep, v = line.partition(":")
        if sep:
            last_key = k.strip()
            cur[last_key] = v.strip()
    if cur:
        recs.append(cur)
    return recs


def read_recutils(paths, infer_types: bool = True):
    return _per_file_reader(paths, _parse_recutils_text, infer_types)


read_dcf = read_recutils


def _fmt_cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return str(int(v))
    return str(v)


def _block_writer(ds, out_dir: str, ext: str, render_lines):
    """Shared multi-line sink harness: render each block to lines,
    write one content-named part per block (resumable layout)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        lines = pa.array(render_lines(t), type=pa.string())
        path = _write_part(out_dir, lines, ext)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None).to_pandas()


def write_xtab(ds, out_dir: str):
    """XTAB sink: keys padded to the longest key per record block,
    blank line between records (record_writer_xtab.go)."""

    def render(t: pa.Table) -> list[str]:
        names = t.column_names
        w = max((len(c) for c in names), default=0)
        lines: list[str] = []
        for i in range(t.num_rows):
            if i:
                lines.append("")
            for c in names:
                lines.append(f"{c.ljust(w)} {_fmt_cell(t[c][i].as_py())}")
        return lines

    return _block_writer(ds, out_dir, "xtab", render)


def write_pprint(ds, out_dir: str):
    """PPRINT sink: space-aligned columns, header first, void cells as
    `-` (record_writer_pprint.go). Alignment is computed per BLOCK —
    the streaming-friendly variant of Miller's whole-stream buffering;
    one block per part file keeps each file internally aligned."""

    def render(t: pa.Table) -> list[str]:
        names = t.column_names
        grid = [[_fmt_cell(t[c][i].as_py()) or "-" for c in names]
                for i in range(t.num_rows)]
        widths = [max([len(c)] + [len(r[j]) for r in grid])
                  for j, c in enumerate(names)]
        def row(cells):
            out = " ".join(c.ljust(w) for c, w in zip(cells, widths))
            return out.rstrip()
        return [row(names)] + [row(r) for r in grid]

    return _block_writer(ds, out_dir, "pprint", render)


def write_markdown(ds, out_dir: str):
    """Markdown-table sink (record_writer_markdown.go)."""

    def render(t: pa.Table) -> list[str]:
        names = t.column_names
        lines = ["| " + " | ".join(names) + " |",
                 "| " + " | ".join("---" for _ in names) + " |"]
        for i in range(t.num_rows):
            lines.append("| " + " | ".join(
                _fmt_cell(t[c][i].as_py()) for c in names) + " |")
        return lines

    return _block_writer(ds, out_dir, "md", render)


def write_yaml(ds, out_dir: str):
    """YAML sink: a list-of-maps document per part file."""

    def render(t: pa.Table) -> list[str]:
        import yaml

        recs = [{k: v for k, v in r.items() if v is not None}
                for r in t.to_pylist()]
        return yaml.safe_dump(recs, sort_keys=False,
                              default_flow_style=False).rstrip("\n").split("\n")

    return _block_writer(ds, out_dir, "yaml", render)


def write_tsv(ds, path, **kw):
    from pyarrow import csv as pacsv

    return ds.write_csv(
        path, write_options=pacsv.WriteOptions(delimiter="\t"), **kw)
