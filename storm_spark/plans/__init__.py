"""Composed plans — multi-stage pipelines built on the engine's state layer."""

from storm_spark.plans.rollup import ContinuousRollup

__all__ = ["ContinuousRollup"]
