"""Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", arXiv:1902.04023).

Approximate analogue of Miller's stats1 percentiles (reference
``pkg/transformers/utils/percentile_keeper.go``), with relative accuracy
concentrated at the tails via the k1 (arcsine) scale function.

Fully vectorized clustering: incoming points and existing centroids are
sorted together, the k1 scale value of each item's mid-quantile is
computed, items are grouped by integer k-bucket, and
``np.add.reduceat``-style bincounts produce the new centroid means and
weights in one pass. Deterministic (no RNG), so merge is reproducible;
associativity holds within the digest's rank-error bound
(property-tested rather than bitwise).
"""

from __future__ import annotations

import numpy as np

from miller_ray.sketches.base import pack_arrays, unpack_arrays

_TAG = b"TDG1"


class TDigest:
    __slots__ = ("compression", "means", "weights", "n", "_min", "_max")

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.n = 0.0
        self._min = np.inf
        self._max = -np.inf

    # -- core clustering pass -------------------------------------------
    def _cluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        total = weights.sum()
        cw = np.cumsum(weights)
        qmid = (cw - 0.5 * weights) / total
        # k1 scale: k(q) = (delta / pi) * asin(2q - 1); span = compression
        kvals = (self.compression / np.pi) * np.arcsin(2.0 * qmid - 1.0)
        buckets = np.floor(kvals).astype(np.int64)
        # group consecutive equal buckets
        change = np.empty(buckets.size, dtype=bool)
        change[0] = True
        np.not_equal(buckets[1:], buckets[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        w_new = np.add.reduceat(weights, starts)
        m_new = np.add.reduceat(means * weights, starts) / w_new
        self.means = m_new
        self.weights = w_new
        self.n = float(total)

    def update_batch(self, values, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        if weights is None:
            w = np.ones(v.size, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)
        mask = ~np.isnan(v)
        v, w = v[mask], w[mask]
        if v.size == 0:
            return
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self._cluster(np.concatenate([self.means, v]),
                      np.concatenate([self.weights, w]))

    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("t-digest compression mismatch")
        if other.n == 0:
            return self
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._cluster(np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]))
        return self

    # -- queries ---------------------------------------------------------
    def quantile(self, p: float) -> float:
        """p in [0,100]. Dunning's MergingDigest quantile: singleton
        centroids (weight 1) are exact samples and are not interpolated
        across; the extreme indices clamp to observed min/max (p0 = min,
        p100 = max, matching Miller's stats1 convention, reference
        ``stats1.go:80-82``)."""
        if self.n == 0:
            return float("nan")
        q = p / 100.0
        if q <= 0:
            return self._min
        if q >= 1:
            return self._max
        means, weights, n = self.means, self.weights, self.n
        m = means.size
        if m == 1:
            return float(means[0])
        index = q * n
        if index < 1.0:
            return self._min
        if weights[0] > 1 and index < weights[0] / 2.0:
            frac = (index - 1.0) / (weights[0] / 2.0 - 1.0) if weights[0] > 2 else 0.0
            return self._min + frac * (float(means[0]) - self._min)
        if index > n - 1.0:
            return self._max
        if weights[-1] > 1 and n - index <= weights[-1] / 2.0:
            frac = (n - index - 1.0) / (weights[-1] / 2.0 - 1.0) if weights[-1] > 2 else 0.0
            return self._max - frac * (self._max - float(means[-1]))
        weight_so_far = weights[0] / 2.0
        for i in range(m - 1):
            dw = (weights[i] + weights[i + 1]) / 2.0
            if weight_so_far + dw > index:
                left_unit = 0.0
                if weights[i] == 1:
                    if index - weight_so_far < 0.5:
                        return float(means[i])
                    left_unit = 0.5
                right_unit = 0.0
                if weights[i + 1] == 1:
                    if weight_so_far + dw - index <= 0.5:
                        return float(means[i + 1])
                    right_unit = 0.5
                z1 = index - weight_so_far - left_unit
                z2 = weight_so_far + dw - index - right_unit
                denom = max(z1 + z2, 1e-12)
                return float((means[i] * z2 + means[i + 1] * z1) / denom)
            weight_so_far += dw
        return self._max

    def quantiles(self, ps) -> np.ndarray:
        return np.array([self.quantile(p) for p in ps])

    def cdf(self, x: float) -> float:
        if self.n == 0:
            return float("nan")
        if x < self._min:
            return 0.0
        if x >= self._max:
            return 1.0
        cw = np.cumsum(self.weights)
        centers = cw - 0.5 * self.weights
        i = np.searchsorted(self.means, x, side="right")
        if i == 0:
            return float(centers[0] / self.n) * 0.5
        if i >= self.means.size:
            return 1.0
        lo, hi = self.means[i - 1], self.means[i]
        frac = (x - lo) / max(hi - lo, 1e-12)
        return float((centers[i - 1] + frac * (centers[i] - centers[i - 1])) / self.n)

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        return pack_arrays(_TAG, [self.compression, self.n, self._min, self._max],
                           [self.means, self.weights])

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        scalars, arrays = unpack_arrays(data, _TAG)
        obj = cls(compression=scalars[0])
        obj.n = scalars[1]
        obj._min = scalars[2]
        obj._max = scalars[3]
        obj.means = arrays[0].astype(np.float64)
        obj.weights = arrays[1].astype(np.float64)
        return obj
