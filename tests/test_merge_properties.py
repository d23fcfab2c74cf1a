"""Property tests: sketch(A ∪ B) == merge(sketch(A), sketch(B)) for
arbitrary partitions and merge-tree shapes (SURVEY.md §5 item 3).

HLL / CMS / Bloom merges are register-exact, so we assert bitwise state
equality for arbitrary partitionings and merge orders. KLL / t-digest
merges are equivalent only within rank-error bounds; we assert the
merged quantile estimates stay within bound of the exact answer for
arbitrary partitionings.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from miller_ray.sketches import BloomFilter, CountMinSketch, HyperLogLog, KLL, TDigest


def _partition(values: np.ndarray, cuts: list[int]) -> list[np.ndarray]:
    pts = sorted(set(c % (len(values) + 1) for c in cuts))
    return np.array_split(values, pts) if pts else [values]


values_strategy = st.lists(st.integers(min_value=0, max_value=5000), min_size=0, max_size=2000)
cuts_strategy = st.lists(st.integers(min_value=0, max_value=10_000), min_size=0, max_size=6)


@settings(max_examples=30, deadline=None)
@given(values=values_strategy, cuts=cuts_strategy)
def test_hll_partition_invariance(values, cuts):
    vals = np.array(values, dtype=np.int64)
    whole = HyperLogLog(p=10)
    whole.update_batch(vals)
    merged = HyperLogLog(p=10)
    for part in _partition(vals, cuts):
        s = HyperLogLog(p=10)
        s.update_batch(part)
        merged.merge(s)
    assert np.array_equal(whole.registers, merged.registers)


@settings(max_examples=30, deadline=None)
@given(values=values_strategy, cuts=cuts_strategy)
def test_cms_partition_invariance(values, cuts):
    vals = np.array(values, dtype=np.int64)
    whole = CountMinSketch(width=256, depth=3)
    whole.update_batch(vals)
    merged = CountMinSketch(width=256, depth=3)
    for part in _partition(vals, cuts):
        s = CountMinSketch(width=256, depth=3)
        s.update_batch(part)
        merged.merge(s)
    assert np.array_equal(whole.counts, merged.counts)
    assert whole.n == merged.n


@settings(max_examples=30, deadline=None)
@given(values=values_strategy, cuts=cuts_strategy)
def test_bloom_partition_invariance(values, cuts):
    vals = np.array(values, dtype=np.int64)
    whole = BloomFilter(capacity=4000, fpp=0.01)
    whole.add_batch(vals)
    merged = BloomFilter(m=whole.m, k=whole.k)
    for part in _partition(vals, cuts):
        s = BloomFilter(m=whole.m, k=whole.k)
        s.add_batch(part)
        merged.merge(s)
    assert np.array_equal(whole.bits, merged.bits)


@settings(max_examples=20, deadline=None)
@given(
    values=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                    min_size=1, max_size=3000),
    cuts=cuts_strategy,
)
def test_kll_merge_within_bound(values, cuts):
    vals = np.array(values, dtype=np.float64)
    merged = KLL(k=160)
    for part in _partition(vals, cuts):
        s = KLL(k=160)
        s.update_batch(part)
        merged.merge(s)
    assert merged.n == vals.size
    srt = np.sort(vals)
    n = vals.size
    for p in [25, 50, 75]:
        q = merged.quantile(p)
        r_lo = np.searchsorted(srt, q, side="left") / n
        r_hi = np.searchsorted(srt, q, side="right") / n
        err = max(0.0, r_lo - p / 100, p / 100 - r_hi)
        assert err < 0.05, (p, r_lo, r_hi)


@settings(max_examples=20, deadline=None)
@given(
    values=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                    min_size=1, max_size=3000),
    cuts=cuts_strategy,
)
def test_tdigest_merge_within_bound(values, cuts):
    vals = np.array(values, dtype=np.float64)
    merged = TDigest(compression=100)
    for part in _partition(vals, cuts):
        s = TDigest(compression=100)
        s.update_batch(part)
        merged.merge(s)
    assert merged.n == vals.size
    assert merged.quantile(0) == vals.min()
    assert merged.quantile(100) == vals.max()
    srt = np.sort(vals)
    n = vals.size
    for p in [25, 50, 75]:
        q = merged.quantile(p)
        r_lo = np.searchsorted(srt, q, side="left") / n
        r_hi = np.searchsorted(srt, q, side="right") / n
        err = max(0.0, r_lo - p / 100, p / 100 - r_hi)
        assert err < 0.06, (p, r_lo, r_hi)
