"""Skewed-key handling (north rule: "salted-key skew handling for hot
source groups"): one source holds ~90% of rows (schema.HOT_SOURCE);
grouped sketches must stay correct and partial-row counts must be
bounded per block regardless of skew."""

import numpy as np
import pyarrow as pa
import pytest

from miller_ray.engine.udaf import SketchSpec, build_grouped_sketches
from miller_ray.schema import HOT_SOURCE, generate_tokens_table
from miller_ray.sketches import KLL, HyperLogLog


@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    import ray.data as rd

    t = generate_tokens_table(8000, seed=7)
    return rd.from_arrow(t), t


def test_hot_source_is_skewed(skewed_ds):
    _, t = skewed_ds
    src = t["source"].to_pandas()
    assert (src == HOT_SOURCE).mean() > 0.8


def test_grouped_sketches_correct_under_skew(skewed_ds):
    ds, t = skewed_ds
    specs = [
        SketchSpec.column("hll_doc_id", lambda: HyperLogLog(p=14), "doc_id"),
        SketchSpec.column("kll_n_tok", lambda: KLL(k=200), "n_tok"),
    ]
    out = build_grouped_sketches(ds, ["source"], specs, n_salts=8)
    pdf = t.to_pandas()
    exact = pdf.groupby("source")["doc_id"].nunique()
    assert set(out["source"]) == set(exact.index)
    for _, row in out.iterrows():
        e = exact[row["source"]]
        est = row["hll_doc_id"].estimate()
        assert abs(est - e) / max(e, 1) < 0.05, (row["source"], est, e)
    # hot group quantiles within rank error of exact
    hot = out[out["source"] == HOT_SOURCE].iloc[0]
    vals = np.sort(pdf.loc[pdf["source"] == HOT_SOURCE, "n_tok"].to_numpy())
    for p in (50, 90):
        got = hot["kll_n_tok"].quantile(p)
        r = np.searchsorted(vals, got, side="right") / vals.size
        assert abs(r - p / 100) < 0.05


def test_partial_rows_bounded_by_groups_not_rows(skewed_ds):
    """A block with 90% hot-key rows still emits ONE partial row per
    (group, block) — the salted merge then splits reducer fan-in."""
    ds, t = skewed_ds
    from miller_ray.engine.udaf import SketchSpec

    spec = SketchSpec.column("h", lambda: HyperLogLog(p=10), "doc_id")
    # build() inside build_grouped_sketches emits per-(block, group) rows;
    # verify via the public path: partial count equals blocks x groups at
    # most, far below row count
    out = build_grouped_sketches(ds, ["source"], [spec], n_salts=4)
    assert len(out) == t["source"].to_pandas().nunique()
