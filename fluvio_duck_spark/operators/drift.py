"""Distribution-drift detection — the population-stability-index (PSI)
check a pipeline runs between a reference window and a fresh window of
the same feed before trusting the new data (or retraining on it).

PSI(group) = Σ_bins (p_actual − p_expected) · ln(p_actual / p_expected)
with Laplace-smoothed proportions so empty bins stay defined (and the
result deterministic — no epsilon tuning).  Conventional read: <0.1
stable, 0.1–0.25 drifting, >0.25 shifted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def psi_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    expected_pred: Column,
    actual_pred: Column,
    bin_width: float,
    n_bins: int,
    round_dp: int = 6,
) -> DataFrame:
    """One PSI row per group comparing ``value_col``'s distribution
    under ``expected_pred`` (reference window) vs ``actual_pred``
    (fresh window).  Values bin at ``floor(value / bin_width)`` clamped
    to [0, n_bins).

    Plan shape: ONE corpus pass — both windows' bin counts come from a
    single (group, bin) aggregation with conditional counts; the dense
    (group × bin) spine (distinct groups × an in-row sequence explode)
    left-joins those counts, per-group totals are whole-partition
    windows over the ≤ n_bins-row groups, and the PSI sum is a final
    tiny aggregation.  Nothing rescans the corpus; proportions divide
    exact integers so both engines see identical doubles into ln().
    """
    bin_expr = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor(F.col(value_col) / bin_width).cast("int")),
    )
    counts = (
        df.filter(expected_pred | actual_pred)
        .select(
            F.col(group_col),
            bin_expr.alias("bin"),
            expected_pred.cast("long").alias("_e"),
            actual_pred.cast("long").alias("_a"),
        )
        .groupBy(group_col, "bin")
        .agg(F.sum("_e").alias("ce"), F.sum("_a").alias("ca"))
    )
    spine = (
        df.select(group_col)
        .distinct()
        .select(
            group_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        )
    )
    dense = (
        spine.join(counts, [group_col, "bin"], "left")
        .select(
            group_col,
            "bin",
            F.coalesce("ce", F.lit(0)).alias("ce"),
            F.coalesce("ca", F.lit(0)).alias("ca"),
        )
    )
    w = Window.partitionBy(group_col)
    smoothed = dense.select(
        group_col,
        ((F.col("ce") + 1) / (F.sum("ce").over(w) + n_bins)).alias("pe"),
        ((F.col("ca") + 1) / (F.sum("ca").over(w) + n_bins)).alias("pa"),
    )
    return smoothed.groupBy(group_col).agg(
        F.round(
            F.sum((F.col("pa") - F.col("pe")) * F.log(F.col("pa") / F.col("pe"))),
            round_dp,
        ).alias("psi")
    )
