"""Operator library: composable DataFrame transforms, one module per
SURVEY §2 family (relational B/C/D, encoders E, dedup, similarity,
text, multimodal, temporal joins, batched inference)."""

from orx_surgical_spark.operators import (  # noqa: F401
    clustering,
    dedup,
    encoders,
    graph,
    inference,
    multimodal,
    relational,
    similarity,
    temporal,
    text,
)

__all__ = [
    "clustering",
    "dedup",
    "encoders",
    "graph",
    "inference",
    "multimodal",
    "relational",
    "similarity",
    "temporal",
    "text",
]
