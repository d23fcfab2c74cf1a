"""miller_ray — a Ray-Data-native distributed sketch / aggregation engine.

A from-scratch re-expression of johnkerl/miller's streaming-summary verbs
(count-distinct, uniq, top, stats1/stats2, histogram, fraction, ...) as
vectorized Arrow batch transforms and mergeable (approximate) UDAFs over
``ray.data.Dataset``, designed for multi-node 100 TB-scale execution:

- ``miller_ray.sketches`` — pure numpy, serializable, mergeable sketches
  (HyperLogLog, Count-Min, KLL, t-digest, Bloom, MinHash, SimHash).
- ``miller_ray.engine`` — the UDAF harness (per-block partial sketches via
  ``map_batches`` -> small tree merge), exact kernels (Miller R-type-1
  percentiles, string distinctness), grouped/salted aggregation.
- ``miller_ray.verbs`` — the Miller-semantics facade over Dataset.
- ``miller_ray.stages`` — training-data pipeline stages: dedup (exact,
  MinHash-LSH, SimHash), ANN similarity search, text analysis.
- ``miller_ray.state`` — per-partition lineage manifests + resume.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
