"""Unigram language-model scoring — the perplexity-style quality signal
pretraining pipelines use to rank/filter documents (cheap stand-in for a
KenLM pass; same plumbing, simpler model).

Two corpus passes, both standard shapes:

1. **Fit**: explode tokens → token counts (one shuffle with map-side
   combine) → add-one-smoothed log probabilities against the corpus
   total.  The model is |vocab| rows — small by Heaps' law relative to
   the corpus; at 100 TB it is still just the vocabulary.
2. **Score**: explode each doc's tokens, join the model (broadcast —
   the model is the small side by construction), aggregate mean log
   prob per doc (one shuffle on doc id).  OOV tokens score as the
   smoothed unseen probability, so scores are well-defined on any text.

All-JVM expressions; ``ln`` is evaluated identically by the oracle (the
same caveat as operators/sampling.py::weighted_key applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvio_duck_spark.operators.chunking import tokenize


def unigram_fit(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Token → add-one-smoothed log10 probability over the corpus.
    Returns ``(model, totals)``: model = (token, logp); totals = 1 row
    (n_tokens, vocab) — needed by score for the OOV probability."""
    toks = docs.select(
        F.explode(tokenize(text_col)).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("vocab")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log10(
            (F.col("c") + 1).cast("double")
            / (F.col("n_tokens") + F.col("vocab")).cast("double")
        ).alias("logp"),
    )
    return model, totals


def unigram_logprob_scores(
    docs: DataFrame,
    model: DataFrame,
    totals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean per-token log10 probability per document (higher = more
    corpus-typical; filter/rank on it like a perplexity gate).  Output:
    (id_col, n_scored_tokens, mean_logp)."""
    exploded = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    ).filter(F.col("token") != "")
    oov = totals.select(
        F.log10(
            F.lit(1.0) / (F.col("n_tokens") + F.col("vocab")).cast("double")
        ).alias("__oov")
    )
    scored = (
        exploded.join(F.broadcast(model), "token", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce(F.col("logp"), F.col("__oov")).alias("lp"),
        )
    )
    # exact decimal accumulation of the log terms → the mean is
    # partial-aggregation-order-independent (functions/exact.py rule)
    return scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_scored_tokens"),
        (
            F.sum(F.col("lp").cast("decimal(18,12)")).cast("double")
            / F.count("*")
        ).alias("mean_logp"),
    )
