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
    rendered content so distinct blocks with equal size and endpoints
    (e.g. duplicated data) never collide onto one filename."""
    import hashlib

    h = hashlib.md5()
    arr = lines.combine_chunks() if isinstance(lines, pa.ChunkedArray) else lines
    h.update(str(len(arr)).encode())
    for buf in arr.buffers():
        if buf is not None:
            h.update(buf)
    return f"part-{h.hexdigest()[:16]}.{ext}"


def write_dkvp(ds, out_dir: str, ofs: str = ",", ops: str = "="):
    """DKVP sink: one ``part-<contenthash>.dkvp`` file per block."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        lines = _render_dkvp(t, ofs, ops)
        path = os.path.join(out_dir, _part_name(lines, "dkvp"))
        with open(path, "w") as f:
            for v in lines.to_pylist():
                f.write(v + "\n")
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
        path = os.path.join(out_dir, _part_name(lines, "nidx"))
        with open(path, "w") as f:
            for v in lines.to_pylist():
                f.write(v + "\n")
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None).to_pandas()
