"""Canonical north-rule table schema + deterministic synthetic generator.

BASELINE.json input_hint: Parquet of pre-tokenized training sequences
  (doc_id: string, tokens: list<int32>, n_tok: int32, source: string).

FIXTURES.md F1 generator spec (seed=42): Zipf(s=1.2) token ids over a
GPT-2-sized vocab (50257), lognormal(mu=6, sigma=1) lengths clipped to
[1, 8192], skewed ``source`` (one hot source ~90% of rows), optional
duplicated doc_ids for dedup tests. Generation is chunked and written as
multi-row-group Parquet so Ray reads it as multiple blocks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50257
SOURCES = ["web", "books", "code", "wiki", "forums", "news", "social", "academic"]
HOT_SOURCE = "web"  # ~90% of rows — exercises salted-key merge

TOKENS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])

_CACHE_ROOT = "/tmp/miller_ray_cache"


def generate_tokens_table(n_rows: int, seed: int = 42, dup_fraction: float = 0.0,
                          mean_len: float = 6.0, sigma_len: float = 1.0,
                          max_len: int = 8192) -> pa.Table:
    """Deterministic in-memory tokens table (small/medium scales)."""
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.lognormal(mean_len, sigma_len, n_rows).astype(np.int64), 1, max_len)
    total = int(lengths.sum())
    # Zipf via inverse-CDF on a power-law over the vocab (bounded, fast)
    u = rng.random(total)
    s = 1.2
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** -s)
    cdf /= cdf[-1]
    token_vals = np.searchsorted(cdf, u).astype(np.int32)

    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()).cast(pa.int32()),
                                      pa.array(token_vals, type=pa.int32()))

    ids = np.char.add("doc-", np.char.zfill(np.arange(n_rows).astype(str), 12))
    if dup_fraction > 0:
        n_dup = int(n_rows * dup_fraction)
        dup_targets = rng.integers(0, n_rows, size=n_dup)
        dup_pos = rng.choice(n_rows, size=n_dup, replace=False)
        ids[dup_pos] = ids[dup_targets]

    # skewed source: HOT_SOURCE ~90%, rest uniform
    src_idx = rng.random(n_rows)
    sources = np.where(
        src_idx < 0.9, HOT_SOURCE,
        np.array(SOURCES)[1:][rng.integers(0, len(SOURCES) - 1, size=n_rows)])

    return pa.table({
        "doc_id": pa.array(ids.tolist(), type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(lengths.astype(np.int32)),
        "source": pa.array(sources.tolist(), type=pa.string()),
    })


def tokens_parquet_path(n_rows: int, seed: int = 42, dup_fraction: float = 0.0) -> str:
    """Generate-once-and-cache a tokens Parquet DATASET (directory of
    files) under /tmp.

    Written as many small files (≥1 per expected CPU at bench scale) so
    Ray's parquet reader gets enough independent blocks to parallelize —
    the 100 TB layout in miniature (one file ≈ one shard). A single file
    with a handful of row groups serializes the whole scan.
    """
    tag = f"tokens_n{n_rows}_s{seed}_d{int(dup_fraction * 1000)}_v2"
    path = os.path.join(_CACHE_ROOT, tag)
    done_marker = path + ".done"  # sibling file: keeps the dir parquet-only
    if os.path.exists(done_marker):
        return path
    os.makedirs(path, exist_ok=True)
    # ~64 files at bench scale; files stay ≥3125 rows so tiny scales
    # don't produce hundreds of 100-row files
    file_rows = max(3125, -(-n_rows // 64))
    fidx = 0
    for start in range(0, n_rows, file_rows):
        n = min(file_rows, n_rows - start)
        # chunk-local seed keeps memory bounded and is deterministic
        t = generate_tokens_table(n, seed=seed + start, dup_fraction=dup_fraction)
        if start and dup_fraction == 0.0:
            # re-key doc_ids so they stay globally unique; with
            # dup_fraction > 0 chunk-local ids repeat ACROSS chunks,
            # giving cross-partition duplicates (what dedup tests need)
            ids = np.char.add("doc-", np.char.zfill(
                (np.arange(n) + start).astype(str), 12))
            t = t.set_column(0, "doc_id", pa.array(ids.tolist(), type=pa.string()))
        fp = os.path.join(path, f"part-{fidx:05d}.parquet")
        # uncompressed + non-dict: scan-side decode is a memcpy, so the
        # bench measures sketch-build throughput, not snappy decode
        pq.write_table(t, fp + ".tmp", row_group_size=file_rows,
                       compression="none", use_dictionary=False)
        os.replace(fp + ".tmp", fp)
        fidx += 1
    with open(done_marker, "w") as f:
        f.write(str(fidx))
    return path


def sf_to_tokens_rows(sf_dir: str) -> int:
    """Map a testdata sf dir to a deterministic tokens-table size.
    $GRAFT_TOKENS_ROWS overrides (bench --scaling uses a larger table)."""
    env = os.environ.get("GRAFT_TOKENS_ROWS")
    if env:
        return int(env)
    base = os.path.basename(sf_dir.rstrip("/"))
    return {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}.get(base, 20_000)
