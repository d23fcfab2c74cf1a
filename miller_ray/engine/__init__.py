"""Execution engine: exact kernels, grouped aggregation, sketch UDAF harness."""

from miller_ray.engine.exact import percentile_type1, percentile_interpolated
from miller_ray.engine.groupby import grouped_stats, grouped_percentiles
from miller_ray.engine.udaf import SketchSpec, build_sketches, build_grouped_sketches

__all__ = [
    "percentile_type1",
    "percentile_interpolated",
    "grouped_stats",
    "grouped_percentiles",
    "SketchSpec",
    "build_sketches",
    "build_grouped_sketches",
]
