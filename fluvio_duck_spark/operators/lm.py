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
    # counts feeds the model projection AND the totals row; materialize
    # the |vocab|-row table so each consumer doesn't re-run the corpus
    # explode (branch reuse is not deduped)
    counts = toks.groupBy("token").agg(F.count("*").alias("c")).localCheckpoint(
        eager=True
    )
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


def _doc_bigrams(
    docs: DataFrame, id_col: str | None, text_col: str
) -> DataFrame:
    """(id?, w1, w2) rows — one per adjacent token pair.  Map-only: the
    pair list is built per-row (tokens materialized before the HOF
    lambda per SCALE.md rule 4) and exploded where the row lives."""
    cols = ([F.col(id_col)] if id_col else []) + [
        tokenize(text_col).alias("_tk")
    ]
    base = docs.select(*cols).filter(F.size("_tk") >= 2)
    tk = F.col("_tk")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_tk") - 1),
        lambda i: F.struct(
            F.get(tk, i - 1).alias("w1"), F.get(tk, i).alias("w2")
        ),
    )
    out = base.select(*([id_col] if id_col else []), F.explode(pairs).alias("_b"))
    return out.select(*([id_col] if id_col else []), "_b.w1", "_b.w2")


def bigram_fit(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Add-one-smoothed bigram model over the corpus.  Returns
    ``(bigrams, contexts, totals)``: bigrams = (w1, w2, c2); contexts =
    (w1, c1) with c1 = Σ_w2 c2; totals = 1 row (vocab).  Two shuffles
    (bigram counts, then context counts over the already-aggregated
    bigram table — corpus-sized only on the first)."""
    toks = docs.select(
        F.explode(tokenize(text_col)).alias("token")
    ).filter(F.col("token") != "")
    totals = toks.agg(F.count_distinct("token").alias("vocab"))
    c2 = _doc_bigrams(docs, None, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("c2")
    ).localCheckpoint(eager=True)  # the model table: scoring joins it
    # twice (pair + context) — materialize instead of re-counting
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return c2, c1, totals


def bigram_logprob_scores(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    totals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean log10 P(w2|w1) per document under the add-one bigram model:
    P = (c2+1)/(c1+V); unseen contexts/pairs degrade smoothly via the
    COALESCE(…, 0) path.  Unlike the unigram scorer the model side is
    NOT broadcast-hinted — a 100 TB corpus's bigram table is itself
    large, so the (w1, w2) and (w1) joins stay plain equi-joins for
    AQE to strategize (the tf-idf lesson from VERDICT r1).  Documents
    with fewer than two tokens have no bigrams and drop out.  Output:
    (id, n_bigrams, mean_logp)."""
    bi = _doc_bigrams(docs, id_col, text_col)
    scored = (
        bi.join(bigrams, ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.log10(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vocab")).cast(
                    "double"
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_bigrams"),
        (
            F.sum(F.col("lp").cast("decimal(18,12)")).cast("double")
            / F.count("*")
        ).alias("mean_logp"),
    )
