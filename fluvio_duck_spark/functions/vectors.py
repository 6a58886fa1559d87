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


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a vector (map-only; after this, cosine reduces to a
    plain dot product — normalize once at ingest, save a sqrt per
    comparison at query time).  Zero vectors pass through unchanged."""
    # norm lambda-bound (transform over a 1-element wrapper) so the fold
    # runs once per row, not once per element (interpreted HOFs have no
    # common-subexpression elimination — see functions/text.py)
    return F.flatten(
        F.transform(
            F.array(norm(a)),
            lambda n: F.when(
                n == 0.0, F.transform(a, lambda x: x.cast("double"))
            ).otherwise(F.transform(a, lambda x: x.cast("double") / n)),
        )
    )
