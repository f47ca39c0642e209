"""Data-pipeline function library (beyond-reference surface, SURVEY §7.7).

The reference ships no scalar/analytic function catalog (SURVEY §2.3) — its
parity surface is the UDF harness. This package is the engine's *native*
function library for large-scale training-data pipelines: text analysis,
deduplication, similarity search, multimodal column plumbing — all
expression-first (JVM/codegen), Pandas-UDF only where unavoidable.
"""

from storm_spark.functions import (
    dedup,
    multimodal,
    profile,
    robust,
    sampling,
    search,
    similarity,
    sketch,
    skew,
    temporal,
    text,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "search",
    "sampling",
    "sketch",
    "skew",
    "multimodal",
    "temporal",
    "robust",
    "profile",
]
