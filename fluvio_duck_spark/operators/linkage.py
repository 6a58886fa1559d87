"""Entity resolution: fuzzy (approximate-string) JOIN between two tables.

The cross-table sibling of ``operators/dedup.py``'s within-table near-dup
machinery: link records whose join keys don't equal byte-for-byte (dirty
ingest, OCR, hand-typed names) by character-q-gram Jaccard similarity —
record linkage, the step before any MERGE/dedup can run on dirty feeds.

Design for 100 TB: the classic inverted-index blocking plan, never n²:
explode each side's distinct q-grams, equi-join on the gram (ONE shuffle
of each side keyed by gram), count shared grams per candidate pair, then
score exact Jaccard from the per-record set sizes.  ``max_gram_df``
drops stop-grams so a gram shared by half the corpus cannot quadratically
fan out the join — the same bound `dedup.ngram_jaccard_pairs` uses.
Best-match selection is a per-right-record top-1 window (WindowGroupLimit
k-heap; deterministic tie-break), so output is |right|-bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def char_qgrams(col: Column | str, q: int = 3) -> Column:
    """Distinct character q-grams of ``lower(col)`` padded with ^/$
    boundary markers (boundary grams make prefixes/suffixes count, the
    standard record-linkage construction).  Strings shorter than q yield
    the whole padded string as one gram."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit("^"), F.lower(c), F.lit("$"))
    return F.array_distinct(
        F.when(
            F.length(padded) >= q,
            F.transform(
                F.sequence(F.lit(1), F.length(padded) - q + 1),
                lambda i: padded.substr(i, F.lit(q)),
            ),
        ).otherwise(F.array(padded))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    q: int = 3,
    threshold: float = 0.3,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Best fuzzy match per right record: (right_key, left_key, jaccard),
    rank-1 by Jaccard desc then left_key asc (deterministic ties).
    Right records with no candidate ≥ threshold are absent — wrap with a
    left join downstream if unmatched rows must surface."""

    def grams(df: DataFrame, key: str) -> DataFrame:
        g = df.select(key).distinct().select(
            F.col(key), F.explode(char_qgrams(key, q)).alias("g")
        )
        if max_gram_df is not None:
            freq = g.groupBy("g").agg(F.count("*").alias("df_"))
            g = g.join(freq.filter(F.col("df_") <= max_gram_df), "g").drop("df_")
        return g

    lg = grams(left, left_key).alias("l")
    rg = grams(right, right_key).alias("r")
    ln = lg.groupBy(left_key).agg(F.count("*").alias("nl"))
    rn = rg.groupBy(right_key).agg(F.count("*").alias("nr"))

    common = (
        lg.join(rg, F.col("l.g") == F.col("r.g"))
        .groupBy(F.col(f"l.{left_key}"), F.col(f"r.{right_key}"))
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common").cast("double") / (
        F.col("nl") + F.col("nr") - F.col("common")
    )
    scored = (
        common.join(ln, left_key)
        .join(rn, right_key)
        .select(right_key, left_key, jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    w = W.partitionBy(right_key).orderBy(
        F.desc("jaccard"), F.asc(left_key)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
