"""Vector expressions over ``array<float>`` embedding columns.

All math is elementwise double-precision inside Catalyst (``zip_with`` +
``aggregate`` sequential fold) — bit-identical to a sequential C loop, so
results are reproducible across engines and across cluster topologies
(verified bit-equal against DuckDB list functions at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
