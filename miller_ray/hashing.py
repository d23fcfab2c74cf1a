"""Deterministic vectorized 64-bit hashing for sketch updates.

All sketches key off these functions so that a re-executed Ray block
(task retry / lineage reconstruction) produces byte-identical partial
state: no RNG in any update path, fixed seeds only.

- integers  -> splitmix64 finalizer (public-domain constant mix, as in
  Steele et al., "Fast Splittable Pseudorandom Number Generators").
- strings / arbitrary objects -> ``pandas.util.hash_array`` (SipHash-based,
  keyed with a fixed 16-byte key -> stable across processes and runs).

Double hashing (Kirsch-Mitzenmacher) derives the i-th hash as
``h1 + i*h2`` which preserves Bloom/CMS guarantees with two base hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# fixed 16-byte key => pandas siphash output is stable across runs/processes
_HASH_KEY = "miller_ray_00042"

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64, copy=True)
        z += _GOLDEN * np.uint64(seed + 1)
        z ^= z >> np.uint64(30)
        z *= _C1
        z ^= z >> np.uint64(27)
        z *= _C2
        z ^= z >> np.uint64(31)
    return z


def _as_numpy(values) -> np.ndarray:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if pa.types.is_integer(values.type):
            # zero-copy when no nulls; nulls hashed as sentinel
            return values.to_numpy(zero_copy_only=False)
        return np.asarray(values.to_pandas())
    return np.asarray(values)


def hash64(values, seed: int = 0) -> np.ndarray:
    """Hash a vector of scalars to uint64, deterministically.

    Accepts numpy arrays, pyarrow (Chunked)Arrays, pandas Series, lists.
    Integer/float inputs use splitmix64 on the raw value; strings and
    other objects go through pandas' keyed SipHash. Distinct seeds give
    independent hash families.
    """
    arr = _as_numpy(values)
    if arr.dtype.kind in ("i", "u"):
        return splitmix64(arr.astype(np.uint64, copy=False), seed=seed)
    if arr.dtype.kind == "f":
        # hash the bit pattern so 1.0 and 1 differ (Miller string-distinctness
        # is handled a level up by canonical string rendering when required)
        return splitmix64(arr.astype(np.float64).view(np.uint64), seed=seed)
    if arr.dtype.kind == "b":
        return splitmix64(arr.astype(np.uint64), seed=seed)
    if arr.dtype == object and arr.size and all(isinstance(x, (int, np.integer)) for x in arr[:16]):
        # normalize integer-valued object arrays onto the int hash path so
        # the same logical values hash identically regardless of dtype
        try:
            return splitmix64(arr.astype(np.int64).astype(np.uint64), seed=seed)
        except (TypeError, ValueError, OverflowError):
            pass
    if arr.dtype.kind != "O":
        # numpy unicode / StringDType arrays (np.asarray on list[str])
        # must hash identically to the object path pyarrow strings take
        arr = arr.astype(object)
    h = pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)
    if seed:
        return splitmix64(h, seed=seed)
    return h


def hash_pair(values, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash vectors for double hashing."""
    h1 = hash64(values, seed=seed)
    h2 = splitmix64(h1, seed=seed + 7919)
    # h2 must be odd so (h1 + i*h2) mod 2^k cycles well for power-of-two mods
    h2 |= np.uint64(1)
    return h1, h2
