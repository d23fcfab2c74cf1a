"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given sf dir, runs the matching
oracle_sql() through DuckDB (tables pre-registered as views), and
compares row-count + schema (sorted column names) + values
(order-insensitive: rows sorted by all columns). Reports per-query
PASS/FAIL with max float deltas so rounding conventions can be tuned.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif not pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> tuple[bool, str]:
    if len(ours) != len(oracle):
        return False, f"rowcount {len(ours)} != {len(oracle)}"
    a, b = canon(ours), canon(oracle)
    if list(a.columns) != list(b.columns):
        return False, f"schema {list(a.columns)} != {list(b.columns)}"
    msgs = []
    ok = True
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                ok = False
                d = np.nanmax(np.abs(av - bv))
                msgs.append(f"{c}: {int((~eq).sum())} diffs, maxdelta={d:.3g}")
        else:
            if not (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all():
                ok = False
                bad = (a[c].astype(str).to_numpy() != b[c].astype(str).to_numpy()).sum()
                msgs.append(f"{c}: {bad} value diffs")
    return ok, "; ".join(msgs) or "ok"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception:
            print(f"FAIL  {name}: query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(ours)} rows [{dt:.1f}s] (rows-only check)")
            n_rowsonly += 1
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare(name, ours, oracle)
        if ok:
            print(f"PASS  {name}: {len(ours)} rows [{dt:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {msg} [{dt:.1f}s]")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
