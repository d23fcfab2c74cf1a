"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: the baseline — numpy matmul per batch
  against a BROADCAST query matrix (ray.put once, read in every task;
  never re-shipped per batch), local top-k per block, tiny global merge.
- LSH-bucketed variant: random-hyperplane signatures bucket the corpus;
  only matching buckets are scanned — the scale path when the corpus is
  too large for full scans per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from miller_ray.hashing import splitmix64


def _emb_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     emb_col: str = "embedding", id_col: str = "vec_id",
                     concurrency=(1, 4)) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Output columns:
    (query_id, rank, vec_id) — rank 1-based by (similarity desc, vec_id
    asc); similarity itself is omitted so results are float-free.

    Query matrix is normalized once on the driver and broadcast via
    ray.put; each actor fetches it once in __init__."""
    import ray

    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qref = ray.put(qn)

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)  # (nq, d), once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _emb_matrix(t, emb_col)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = self.q @ m.T  # (nq, batch)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            nq = self.q.shape[0]
            kk = min(k, sims.shape[1])
            # local top-k per query per block
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {"query_id": [], id_col: [], "sim": []}
            for qi in range(nq):
                sel = part[qi]
                rows["query_id"].append(np.full(kk, qi, dtype=np.int64))
                rows[id_col].append(ids[sel])
                rows["sim"].append(sims[qi, sel])
            return pa.table({c: pa.array(np.concatenate(v)) for c, v in rows.items()})

    parts = ds.map_batches(Scorer, batch_format="pyarrow", zero_copy_batch=True,
                           concurrency=concurrency)
    pdf = parts.to_pandas()  # small: nq * k * n_blocks rows
    pdf = pdf.sort_values(["query_id", "sim", id_col],
                          ascending=[True, False, True])
    top = pdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", id_col]]


def _lsh_planes(d: int, n_planes: int, seed: int) -> np.ndarray:
    rng_base = splitmix64(np.arange(n_planes * d, dtype=np.uint64), seed=seed)
    return ((rng_base.astype(np.float64) / 2**64) - 0.5).reshape(n_planes, d)


def _expand_probe(sigs: set[int], n_planes: int, radius: int) -> set[int]:
    """All signatures within Hamming distance ``radius`` of any seed:
    BFS over single-bit flips, one level per unit of radius, so a
    single seed yields 1 + C(n,1) + ... + C(n,radius) signatures."""
    probe = set(sigs)
    frontier = set(sigs)
    for _ in range(max(0, radius)):
        nxt = set()
        for s in frontier:
            for b in range(n_planes):
                t = s ^ (1 << b)
                if t not in probe:
                    probe.add(t)
                    nxt.add(t)
        frontier = nxt
    return probe


def _probe_set(queries: np.ndarray, planes: np.ndarray,
               probe_hamming: int) -> set[int]:
    n_planes = planes.shape[0]
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qsig = (qn @ planes.T > 0).astype(np.uint64) @ \
        (1 << np.arange(n_planes, dtype=np.uint64))
    return _expand_probe({int(s) for s in qsig}, n_planes, probe_hamming)


def build_lsh_index(ds, out_dir: str, n_planes: int = 8,
                    emb_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 0) -> str:
    """Persist the corpus as a SIGNATURE-PARTITIONED Parquet layout
    (one hive directory per LSH bucket): the corpus is signed exactly
    ONCE, and each query afterwards reads only its probed partitions —
    the 100 TB scale path the in-memory ``lsh_bucketed_topk`` stands in
    for. Deterministic planes (seeded splitmix64) make the index
    reproducible and the probe computation driver-side-only.

    Partition count is 2**n_planes: size n_planes to the corpus so a
    partition stays well under a read-task's memory (100 TB wants
    n_planes>=16 → 65k partitions of ~1.5 GB; the default 8 is test
    scale). Probe cost grows as sum_{i<=r} C(n_planes, i) per query —
    raise n_planes and keep probe_hamming small rather than the
    reverse."""
    import ray

    # probe the embedding dimension from one row
    first = ds.take(1)[0]
    d = len(first[emb_col])
    planes = _lsh_planes(d, n_planes, seed)
    pref = ray.put(planes)

    def sign(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        m = _emb_matrix(t, emb_col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sig = (mn @ pl.T > 0).astype(np.uint64) @ \
            (1 << np.arange(pl.shape[0], dtype=np.uint64))
        return t.append_column("__sig", pa.array(sig.astype(np.int64)))

    ds.map_batches(sign, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["__sig"])
    return out_dir


def lsh_index_topk(index_dir: str, queries: np.ndarray, k: int = 10,
                   n_planes: int = 8, emb_col: str = "embedding",
                   id_col: str = "vec_id", seed: int = 0,
                   probe_hamming: int = 2) -> pd.DataFrame:
    """Query a persisted LSH index: read ONLY the partitions within
    ``probe_hamming`` of each query signature (partition pruning at the
    read — no corpus re-sign, no full scan), then exact cosine top-k
    over the candidates."""
    import os

    import ray.data as rd

    d = queries.shape[1]
    planes = _lsh_planes(d, n_planes, seed)
    probe = _probe_set(queries, planes, probe_hamming)
    dirs = [os.path.join(index_dir, f"__sig={s}") for s in sorted(probe)]
    files = [os.path.join(p, f) for p in dirs if os.path.isdir(p)
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not files:
        return pd.DataFrame(columns=["query_id", "rank", id_col])
    cand = rd.read_parquet(files, columns=[id_col, emb_col])
    return brute_force_topk(cand, queries, k=k, emb_col=emb_col,
                            id_col=id_col)


def lsh_bucketed_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 8,
                      emb_col: str = "embedding", id_col: str = "vec_id",
                      seed: int = 0, probe_hamming: int = 2) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets; scan only the
    buckets within ``probe_hamming`` of each query's signature. At scale
    the bucketed corpus is a partitioned Parquet layout keyed by
    signature prefix; here buckets are a grouped Dataset.

    Recall depends on corpus structure: hyperplane LSH prunes by cosine
    locality, so clustered real-world embeddings retain high recall at
    small scan fractions, while UNIFORM random vectors (the synthetic
    testdata) have weakly-separated top-k and any pruning costs recall —
    report scan fraction alongside recall when evaluating."""
    import ray

    d = queries.shape[1]
    planes = _lsh_planes(d, n_planes, seed)
    probe = _probe_set(queries, planes, probe_hamming)
    probe_arr = np.array(sorted(probe), dtype=np.uint64)
    pref = ray.put((planes, probe_arr))

    class Filter:
        def __init__(self):
            self.planes, self.probe = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _emb_matrix(t, emb_col)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sig = (mn @ self.planes.T > 0).astype(np.uint64) @ \
                (1 << np.arange(self.planes.shape[0], dtype=np.uint64))
            mask = np.isin(sig, self.probe)
            return t.filter(pa.array(mask))

    candidates = ds.map_batches(Filter, batch_format="pyarrow", zero_copy_batch=True,
                                concurrency=(1, 4))
    return brute_force_topk(candidates, queries, k=k, emb_col=emb_col, id_col=id_col)
