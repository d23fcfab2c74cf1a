"""Exact kernels reproducing Miller's observable aggregate semantics.

Formulas are transcribed from the reference implementation (cited per
function) so the exact path is the oracle the sketch path is tested
against:

- percentiles: R type-1 indexing ``int(p*n/100)`` clamped to [0, n-1]
  (reference ``pkg/bifs/percentiles.go:195-210``), ``-i`` interpolation
  is R type-7 (``percentiles.go:9``, ``GetPercentileInterpolated``).
- var: sample variance via streamed moments
  (``pkg/lib/stats.go:85-98`` GetVar).
- skewness / kurtosis: moment forms from ``pkg/bifs/stats.go:85-143``
  (note the mixed 1/n numerator with (n-1) variance denominator for
  skewness — reproduced verbatim, NOT scipy's convention).
- cov / corr / r2: ``pkg/lib/stats.go:139-162`` GetCov and
  ``pkg/transformers/utils/stats2_accumulators.go:355-358,577-581``.
"""

from __future__ import annotations

import numpy as np


def miller_sorted(values) -> np.ndarray:
    """Sort under Miller's mixed-type total order: numbers sort
    numerically and BELOW strings ("1 < abc", "7 < true";
    pkg/mlrval/mlrval_type.go:82-84, mlrval_cmp.go disposition
    matrices). Nulls are dropped (absent values are skipped by
    accumulators)."""
    nums, strs = [], []
    for v in values:
        if v is None:
            continue
        if isinstance(v, (int, np.integer)):
            nums.append(v)
        elif isinstance(v, (float, np.floating)):
            if not np.isnan(v):
                nums.append(v)
        elif isinstance(v, bool):
            strs.append(str(v).lower())
        else:
            strs.append(str(v))
    if strs:
        return np.array(sorted(nums) + sorted(strs), dtype=object)
    return np.sort(np.asarray(nums, dtype=np.float64))


def percentile_type1(sorted_values: np.ndarray, p: float):
    """Miller non-interpolated percentile: sorted[int(p*n/100)], clamped."""
    n = sorted_values.size
    if n == 0:
        return None
    idx = int(p * n / 100.0)
    if idx >= n:
        idx = n - 1
    if idx < 0:
        idx = 0
    return sorted_values[idx]


def percentile_interpolated(sorted_values: np.ndarray, p: float):
    """Miller -i percentile: R type-7 linear interpolation."""
    n = sorted_values.size
    if n == 0:
        return None
    findex = (p / 100.0) * (n - 1)
    if findex < 0:
        findex = 0.0
    iidx = int(findex)
    if iidx >= n - 1:
        return float(sorted_values[n - 1])
    frac = findex - iidx
    return float(sorted_values[iidx] * (1.0 - frac) + sorted_values[iidx + 1] * frac)


# ---------------------------------------------------------------------------
# moment finalizers (vectorized over numpy arrays of group partials)
# ---------------------------------------------------------------------------

def finalize_var(n, sumx, sumx2):
    """Sample variance; NaN where n < 2 (Miller emits VOID)."""
    n = np.asarray(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = sumx / n
        numer = sumx2 - mean * (2.0 * sumx - n * mean)
        numer = np.maximum(numer, 0.0)  # round-off guard, as in GetVar
        out = numer / (n - 1.0)
    return np.where(n < 2, np.nan, out)


def finalize_stddev(n, sumx, sumx2):
    return np.sqrt(finalize_var(n, sumx, sumx2))


def finalize_meaneb(n, sumx, sumx2):
    """Error bar on the mean: sqrt(var/n) (pkg/bifs/stats.go:119-125)."""
    n = np.asarray(n, dtype=np.float64)
    return np.sqrt(finalize_var(n, sumx, sumx2) / n)


def finalize_skewness(n, sumx, sumx2, sumx3):
    n = np.asarray(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = sumx / n
        numer = (sumx3 - mean * (3.0 * sumx2 - 2.0 * n * mean * mean)) / n
        denom = (sumx2 - n * mean * mean) / (n - 1.0)
        out = numer / np.power(denom, 1.5)
    return np.where(n < 2, np.nan, out)


def finalize_kurtosis(n, sumx, sumx2, sumx3, sumx4):
    n = np.asarray(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = sumx / n
        numer = (sumx4 - mean * (4.0 * sumx3 - mean * (6.0 * sumx2 - 3.0 * n * mean ** 2))) / n
        denom = (sumx2 - n * mean * mean) / n
        out = numer / (denom * denom) - 3.0
    return np.where(n < 2, np.nan, out)


def finalize_cov(n, sumx, sumy, sumxy):
    n = np.asarray(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        meanx = sumx / n
        meany = sumy / n
        out = (sumxy - meanx * sumy - meany * sumx + n * meanx * meany) / (n - 1.0)
    return np.where(n < 2, np.nan, out)


def finalize_corr(n, sumx, sumx2, sumy, sumy2, sumxy):
    with np.errstate(invalid="ignore", divide="ignore"):
        cov = finalize_cov(n, sumx, sumy, sumxy)
        sx = finalize_stddev(n, sumx, sumx2)
        sy = finalize_stddev(n, sumy, sumy2)
        return cov / sx / sy


def finalize_r2(n, sumx, sumx2, sumy, sumy2, sumxy):
    n = np.asarray(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        numer = (n * sumxy - sumx * sumy) ** 2
        denom = (n * sumx2 - sumx * sumx) * (n * sumy2 - sumy * sumy)
        out = numer / denom
    return np.where(n < 2, np.nan, out)


def finalize_linreg_ols(n, sumx, sumx2, sumxy, sumy):
    """OLS slope m and intercept b (pkg/lib/stats.go:25-40 GetLinRegOLS)."""
    n = np.asarray(n, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        d = n * sumx2 - sumx * sumx
        m = (n * sumxy - sumx * sumy) / d
        b = (-sumx * sumxy + sumx2 * sumy) / d
    return np.where(n < 2, np.nan, m), np.where(n < 2, np.nan, b)


def finalize_linreg_pca(n, sumx, sumx2, sumy, sumy2, sumxy):
    """PCA (total least squares) line fit from moment sums, following
    the reference's formulation (pkg/lib/stats.go GetCovMatrix /
    GetLinearRegressionPCA): sample covariance matrix -> principal
    eigenvector -> m = v1/v0, b = ybar - m*xbar,
    quality = 1 - |lambda2|/|lambda1|. Vectorized over groups."""
    n = np.asarray(n, dtype=np.float64)
    sumx, sumy = np.asarray(sumx, float), np.asarray(sumy, float)
    sumx2, sumy2 = np.asarray(sumx2, float), np.asarray(sumy2, float)
    sumxy = np.asarray(sumxy, float)
    denom = n - 1
    q00 = (sumx2 - sumx * sumx / n) / denom
    q01 = (sumxy - sumx * sumy / n) / denom
    q11 = (sumy2 - sumy * sumy / n) / denom
    # eigenvalues of [[q00, q01], [q01, q11]]
    tr = q00 + q11
    det = q00 * q11 - q01 * q01
    disc = np.sqrt(np.maximum(tr * tr / 4 - det, 0.0))
    l1 = tr / 2 + disc   # |l1| >= |l2| for PSD cov
    l2 = tr / 2 - disc
    # principal eigenvector for l1: (q01, l1 - q00) (or (l1-q11, q01))
    v0 = np.where(np.abs(q01) > 1e-300, q01, l1 - q11)
    v1 = np.where(np.abs(q01) > 1e-300, l1 - q00, q01)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = v1 / v0
        quality = np.where(np.abs(l1) == 0, 0.0,
                           1.0 - np.abs(l2) / np.abs(l1))
    b = sumy / n - m * (sumx / n)
    return m, b, quality
