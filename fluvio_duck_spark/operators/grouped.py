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
