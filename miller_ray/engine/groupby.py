"""Grouped aggregation: partial pre-aggregation inside map_batches, then a
small shuffle over per-(block, group) partials.

This is the scale-critical path (SURVEY.md §4): a bare
``ds.groupby(k).aggregate(...)`` shuffles every row; here each block is
reduced to one row per group first (pyarrow ``Table.group_by`` — zero-copy
Arrow in, vectorized kernels), so the exchange moves ``O(blocks x groups)``
rows regardless of input size. Skewed keys are absorbed at the partial
stage: a key holding 90% of rows still contributes exactly one partial row
per block.

Reproduces Miller's stats1/stats2 observable semantics
(``pkg/transformers/stats1.go``, ``stats2.go``): null values are skipped
by the accumulators (``stats1_accumulators.go:456-460``), ``count`` counts
ingested (non-null) values, ``null_count`` counts nulls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from miller_ray.engine import exact

_DUMMY = "__g"

# acc name -> required partial moments
_NEEDS = {
    "count": ("n",),
    "null_count": ("n", "nall"),
    "sum": ("s1",),
    "mean": ("n", "s1"),
    "min": ("mn",),
    "max": ("mx",),
    "var": ("n", "s1", "s2"),
    "stddev": ("n", "s1", "s2"),
    "meaneb": ("n", "s1", "s2"),
    "skewness": ("n", "s1", "s2", "s3"),
    "kurtosis": ("n", "s1", "s2", "s3", "s4"),
    "minlen": ("lmn",),
    "maxlen": ("lmx",),
}

_PA_AGG = {"n": "count", "s1": "sum", "s2": "sum", "s3": "sum", "s4": "sum",
           "mn": "min", "mx": "max", "lmn": "min", "lmx": "max"}


def _partial_builder(group_by: list[str], fields: list[str], moments: dict[str, set]):
    """Returns a map_batches fn: Arrow batch -> per-group partial rows."""

    def partial(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        keys = list(group_by)
        if not keys:
            cols[_DUMMY] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
            keys = [_DUMMY]
        else:
            for k in keys:
                cols[k] = t[k]
        aggs = []
        for f in fields:
            need = moments[f]
            col = t[f]
            if "lmn" in need or "lmx" in need:
                ln = pc.utf8_length(pc.cast(col, pa.string()))
                cols[f"{f}__len"] = ln
                if "lmn" in need:
                    aggs.append((f"{f}__len", "min"))
                if "lmx" in need:
                    aggs.append((f"{f}__len", "max"))
            numeric_needs = [m for m in need if m in ("n", "s1", "s2", "s3", "s4", "mn", "mx")]
            if numeric_needs:
                x = pc.cast(col, pa.float64()) if not pa.types.is_floating(col.type) else col
                cols[f"{f}__x"] = x
                if "s2" in need or "s3" in need or "s4" in need:
                    x2 = pc.multiply(x, x)
                    cols[f"{f}__x2"] = x2
                    if "s3" in need or "s4" in need:
                        x3 = pc.multiply(x2, x)
                        cols[f"{f}__x3"] = x3
                        if "s4" in need:
                            cols[f"{f}__x4"] = pc.multiply(x2, x2)
                for m in numeric_needs:
                    src = {"n": f"{f}__x", "s1": f"{f}__x", "s2": f"{f}__x2",
                           "s3": f"{f}__x3", "s4": f"{f}__x4",
                           "mn": f"{f}__x", "mx": f"{f}__x"}[m]
                    aggs.append((src, _PA_AGG[m]))
            if "nall" in need:
                pass  # derived from count_all below
        aggs.append(([], "count_all"))
        work = pa.table(cols)
        out = work.group_by(keys).aggregate(aggs)
        # canonical column order: Table.group_by emits aggregate columns
        # in hash order, which varies per block and breaks downstream
        # schema unification
        return out.select(sorted(out.column_names))

    return partial


def _ray_agg_for(colname: str):
    from ray.data.aggregate import Max, Min, Sum

    if colname.endswith("_min"):
        return Min(colname, alias_name=colname)
    if colname.endswith("_max"):
        return Max(colname, alias_name=colname)
    # counts and sums both merge by summation
    return Sum(colname, alias_name=colname)


def grouped_stats(ds, group_by: list[str], fields: list[str], accs: list[str]) -> pd.DataFrame:
    """Miller stats1 moment accumulators, grouped. Output columns:
    group_by + [f"{field}_{acc}"] in the requested order.

    Percentile/median/mode/distinct_count accs are handled by
    :func:`grouped_percentiles` / the verbs layer, not here.
    """
    bad = [a for a in accs if a not in _NEEDS]
    if bad:
        raise ValueError(f"unsupported moment accumulators: {bad}")
    moments = {f: set(m for a in accs for m in _NEEDS[a]) for f in fields}
    keys = list(group_by) if group_by else [_DUMMY]

    parts = ds.map_batches(
        _partial_builder(group_by, fields, moments),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # merge partials: small shuffle (one row per block per group)
    agg_cols: list[str] = []
    for f in fields:
        need = moments[f]
        for m in need:
            if m == "nall":
                continue
            src = {"n": f"{f}__x_count", "s1": f"{f}__x_sum", "s2": f"{f}__x2_sum",
                   "s3": f"{f}__x3_sum", "s4": f"{f}__x4_sum",
                   "mn": f"{f}__x_min", "mx": f"{f}__x_max",
                   "lmn": f"{f}__len_min", "lmx": f"{f}__len_max"}[m]
            if src not in agg_cols:
                agg_cols.append(src)
    agg_cols.append("count_all")
    # partials are O(blocks x groups): fold small fan-in on the driver
    # (a Ray shuffle on a few hundred rows is pure fixed overhead); the
    # distributed merge below is the scale path for high-cardinality keys
    parts = parts.materialize()
    if parts.count() <= 100_000:
        ppdf = parts.to_pandas()
        spec = {}
        for c in agg_cols:
            spec[c] = "min" if c.endswith("_min") else (
                "max" if c.endswith("_max") else "sum")
        pdf = ppdf.groupby(keys, sort=False, dropna=False).agg(spec).reset_index()
    else:
        merged = parts.groupby(keys).aggregate(*[_ray_agg_for(c) for c in agg_cols])
        pdf = merged.to_pandas()  # small: one row per group

    out = pdf[[k for k in keys if k != _DUMMY]].copy()

    def col(f, m):
        src = {"n": f"{f}__x_count", "s1": f"{f}__x_sum", "s2": f"{f}__x2_sum",
               "s3": f"{f}__x3_sum", "s4": f"{f}__x4_sum",
               "mn": f"{f}__x_min", "mx": f"{f}__x_max",
               "lmn": f"{f}__len_min", "lmx": f"{f}__len_max"}[m]
        return pdf[src].to_numpy()

    for f in fields:
        for a in accs:
            name = f"{f}_{a}"
            if a == "count":
                out[name] = col(f, "n").astype(np.int64)
            elif a == "null_count":
                out[name] = (pdf["count_all"].to_numpy() - col(f, "n")).astype(np.int64)
            elif a == "sum":
                out[name] = col(f, "s1")
            elif a == "mean":
                with np.errstate(invalid="ignore", divide="ignore"):
                    out[name] = col(f, "s1") / col(f, "n")
            elif a == "min":
                out[name] = col(f, "mn")
            elif a == "max":
                out[name] = col(f, "mx")
            elif a == "var":
                out[name] = exact.finalize_var(col(f, "n"), col(f, "s1"), col(f, "s2"))
            elif a == "stddev":
                out[name] = exact.finalize_stddev(col(f, "n"), col(f, "s1"), col(f, "s2"))
            elif a == "meaneb":
                out[name] = exact.finalize_meaneb(col(f, "n"), col(f, "s1"), col(f, "s2"))
            elif a == "skewness":
                out[name] = exact.finalize_skewness(col(f, "n"), col(f, "s1"),
                                                    col(f, "s2"), col(f, "s3"))
            elif a == "kurtosis":
                out[name] = exact.finalize_kurtosis(col(f, "n"), col(f, "s1"),
                                                    col(f, "s2"), col(f, "s3"), col(f, "s4"))
            elif a == "minlen":
                out[name] = col(f, "lmn").astype(np.int64)
            elif a == "maxlen":
                out[name] = col(f, "lmx").astype(np.int64)
    return out.reset_index(drop=True)


def grouped_percentiles(ds, group_by: list[str], field: str, ps: list[float],
                        interpolated: bool = False,
                        extra_accs: list[str] | None = None) -> pd.DataFrame:
    """Exact Miller percentiles (R type-1; -i => type-7) per group.

    Shuffles only (group_by + field) columns; per-group sort inside
    map_groups. This is the exact/oracle path — the sketch path (KLL /
    t-digest via engine.udaf) avoids the wide shuffle entirely.
    extra_accs may include 'median' (= p50) and 'mad' (mean absolute
    deviation, reference stats1_accumulators.go:496-534).
    """
    extra_accs = extra_accs or []
    cols = (list(group_by) + [field]) if group_by else [field]
    sub = ds.select_columns(cols)

    pfn = exact.percentile_interpolated if interpolated else exact.percentile_type1

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        raw = df[field].dropna()
        if raw.dtype == object:
            vals = exact.miller_sorted(raw.tolist())
        else:
            vals = np.sort(raw.to_numpy(dtype=np.float64))
        out = {}
        for k in group_by:
            out[k] = [df[k].iloc[0]]
        for p in ps:
            pname = f"{field}_p{int(p) if float(p).is_integer() else p}"
            out[pname] = [pfn(vals, p)]
        for a in extra_accs:
            if a == "median":
                out[f"{field}_median"] = [pfn(vals, 50)]
            elif a == "mad":
                mean = vals.mean() if vals.size else np.nan
                out[f"{field}_mad"] = [np.abs(vals - mean).mean() if vals.size else np.nan]
        return pd.DataFrame(out)

    if group_by:
        res = sub.groupby(group_by).map_groups(per_group, batch_format="pandas")
        return res.to_pandas()
    # global: single logical group — aggregate per block then merge sorted
    # (small data path; the scale path for global percentiles is the sketch)
    chunks = [b[field].to_numpy(zero_copy_only=False)
              for b in sub.iter_batches(batch_format="pyarrow", batch_size=65536)]
    allv = np.concatenate(chunks) if chunks else np.zeros(0)
    if allv.dtype == object:
        vals = exact.miller_sorted(allv.tolist())
    else:
        vals = np.sort(allv.astype(np.float64))
        vals = vals[~np.isnan(vals)]
    out = {}
    for p in ps:
        pname = f"{field}_p{int(p) if float(p).is_integer() else p}"
        out[pname] = [pfn(vals, p)]
    for a in extra_accs:
        if a == "median":
            out[f"{field}_median"] = [pfn(vals, 50)]
        elif a == "mad":
            mean = vals.mean() if vals.size else np.nan
            out[f"{field}_mad"] = [np.abs(vals - mean).mean() if vals.size else np.nan]
    return pd.DataFrame(out)
