"""Grouped-map pandas UDF surface (SURVEY §2.12) — the batch
``applyInPandas`` shape: whole group in, whole group out, Arrow both
ways.  The reference's closest analogue is the aggregate-kind SmartModule
(state per partition); this is the general "fit something per group"
primitive a feature-engineering pipeline uses when the kernel genuinely
needs the group materialized (sklearn scalers, per-group models).

Only reach for this when window expressions can't express the kernel —
the concrete scaler below IS window-expressible, which is exactly why it
makes a good oracle-checked demo of the machinery: pandas and the SQL
window formula must produce identical IEEE doubles.

Scale note: one shuffle on the key; each group must fit in one task's
memory (that's the applyInPandas contract) — for heavy-hitter keys use
the salted variants in operators/skew.py or a window formulation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minmax_scale_grouped(
    df: DataFrame,
    key_col: str,
    val_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group min-max scaling to [0, 1] via applyInPandas (constant
    groups scale to 0.5).  Output: (id, key, scaled)."""
    schema = f"{id_col} long, {key_col} string, scaled double"

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf[val_col].min()
        hi = pdf[val_col].max()
        if hi == lo:
            scaled = pd.Series(0.5, index=pdf.index)
        else:
            scaled = (pdf[val_col] - lo) / (hi - lo)
        return pd.DataFrame(
            {id_col: pdf[id_col], key_col: pdf[key_col], "scaled": scaled}
        )

    return df.select(id_col, key_col, val_col).groupBy(key_col).applyInPandas(
        scale, schema=schema
    )


def robust_scale_grouped(
    df: DataFrame,
    key_col: str,
    val_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group robust scaling: (x - median) / IQR, the outlier-resistant
    counterpart of ``minmax_scale_grouped`` (sklearn's RobustScaler).
    Groups with IQR = 0 scale to NULL (no spread to normalize by).

    Unlike the pandas variant above, this one is window-free pure
    Catalyst: one exact-percentile aggregation per group (single shuffle
    on the key, partial percentile state map-side) joined back onto the
    rows on the same key — AQE broadcasts the per-group stats when small,
    sort-merges when the group count is itself huge.  The group-stats
    side is #groups rows, never #rows, so no group needs to fit in one
    task (the applyInPandas contract this avoids).

    Output: (id, key, scaled) with scaled rounded to 6 decimals —
    quartile interpolation is one multiply+add per bound, identical
    across engines up to final-ulp, which rounding absorbs.
    """
    stats = df.groupBy(key_col).agg(
        F.expr(f"percentile({val_col}, array(0.25, 0.5, 0.75))").alias("_q")
    ).select(
        key_col,
        F.col("_q")[0].alias("_p25"),
        F.col("_q")[1].alias("_med"),
        F.col("_q")[2].alias("_p75"),
    )
    return (
        df.select(id_col, key_col, val_col)
        .join(stats, key_col)
        .select(
            F.col(id_col),
            F.col(key_col),
            F.round(
                (F.col(val_col) - F.col("_med"))
                / F.nullif(F.col("_p75") - F.col("_p25"), F.lit(0.0)),
                6,
            ).alias("scaled"),
        )
    )
