"""Mergeable, serializable sketches (pure numpy — no Ray dependency).

Every sketch implements the :class:`miller_ray.sketches.base.Sketch`
protocol: ``update_batch(values)`` / ``merge(other)`` / ``to_bytes()`` /
``from_bytes()`` plus a sketch-specific estimator. Updates are
deterministic functions of the insertion sequence (fixed-seed hashing,
no RNG), so Ray task retries reproduce identical partial states.
"""

from miller_ray.sketches.base import Sketch
from miller_ray.sketches.hll import HyperLogLog
from miller_ray.sketches.cms import CountMinSketch, HeavyHitters
from miller_ray.sketches.kll import KLL
from miller_ray.sketches.tdigest import TDigest
from miller_ray.sketches.bloom import BloomFilter
from miller_ray.sketches.inthist import BoundedIntHist
from miller_ray.sketches.minhash import MinHash, simhash64

__all__ = [
    "BoundedIntHist",
    "Sketch",
    "HyperLogLog",
    "CountMinSketch",
    "HeavyHitters",
    "KLL",
    "TDigest",
    "BloomFilter",
    "MinHash",
    "simhash64",
]
