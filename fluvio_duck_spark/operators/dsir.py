"""DSIR-style importance weights for targeted data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
public arXiv:2302.03169): score every corpus document by how much more
likely its hashed n-gram features are under a TARGET distribution than
under the CORPUS distribution — the standard recipe for skewing a
pretraining mixture toward a high-quality / in-domain slice without
training a classifier.  log w(x) = Σ_f n_f(x) · [ln p̂_target(f) −
ln p̂_corpus(f)] over hashed bigram buckets with add-one smoothing.

Spark shape (all JVM expressions, no Python):
  1. explode token bigrams per doc (map-only), bucket each by a
     PORTABLE md5-fold hash mod B — the same ascii-fold family as
     functions/checksum.py, so DuckDB reproduces bucket ids exactly;
  2. two bucket-count aggregations (target slice + whole corpus) —
     each collapses to ≤ B rows with map-side combine, so the shuffle
     is feature-table-sized, not corpus-sized (the target slice pays a
     second map-only explode; its filter pushes to the scan);
  3. the ≤ B-row log-ratio table broadcast-joins back onto the exploded
     bigrams; ONE corpus-sized shuffle on doc id sums the per-doc
     weight in DECIMAL(28,12) (partial-aggregation-order-independent,
     and the 1e-12 quantization absorbs any cross-engine ln() ulp).

At 100 TB: one corpus-sized shuffle (the per-doc sum); everything else
is map-side or ≤ B rows.  B=256 keeps the hashed feature table
broadcastable forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5-fold weights (i·2654435761 mod 1000003) — same portable family as
#: functions/checksum.py; 8 hex chars mix 16^8 values before the mod.
_HASH_WEIGHTS = [(i * 2654435761) % 1000003 for i in range(1, 9)]

N_BUCKETS = 256


def hash_bucket(col: Column | str, n_buckets: int = N_BUCKETS) -> Column:
    """Engine-portable string → [0, n_buckets) hash: weighted ascii fold
    of the first 8 md5 hex chars (md5/ascii/substr exist everywhere).

    ``col`` may be a SQL expression STRING (preferred where the caller
    builds many hashes — the fold parses as one expression instead of
    ~50 py4j round trips of Column construction; see
    operators/dedup.py::portable_text_hash) or a Column."""
    if isinstance(col, str):
        terms = " + ".join(
            f"ascii(substring(md5({col}), {i}, 1)) * {w}"
            for i, w in enumerate(_HASH_WEIGHTS, start=1)
        )
        return F.expr(f"pmod(CAST(({terms}) AS BIGINT), {n_buckets})")
    h = F.md5(col)
    term = None
    for i, w in enumerate(_HASH_WEIGHTS, start=1):
        t = F.ascii(F.substring(h, i, 1)).cast("long") * F.lit(w)
        term = t if term is None else term + t
    return F.pmod(term, F.lit(n_buckets))


def hash_bucket_sql(expr: str, n_buckets: int = N_BUCKETS) -> str:
    """The identical hash as SQL text, built from the same weights."""
    terms = " + ".join(
        f"ascii(substr(md5({expr}), {i}, 1)) * {w}"
        for i, w in enumerate(_HASH_WEIGHTS, start=1)
    )
    return f"(({terms}) % {n_buckets})"


def _bucketed_bigrams(
    docs: DataFrame, id_col: str | None, text_col: str, n_buckets: int
) -> DataFrame:
    """(id?, bucket) — one row per adjacent token pair, hashed."""
    from fluvio_duck_spark.operators.lm import _doc_bigrams

    bi = _doc_bigrams(docs, id_col, text_col)
    gram = F.concat_ws(" ", F.col("w1"), F.col("w2"))
    cols = ([F.col(id_col)] if id_col else []) + [
        hash_bucket(gram, n_buckets).alias("bucket")
    ]
    return bi.select(*cols)


def dsir_lambda(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """The ≤ n_buckets-row (bucket, lam) log-ratio table — the trained
    "model" of DSIR.  Fit once over the reference corpus, broadcast
    everywhere (batch scoring, streaming gates): bounded state, like a
    k-means codebook."""
    # ONE bigram pass fits both sides: the target slice is a subset of
    # the corpus, so its per-bucket count is a conditional sum riding the
    # corpus aggregation (the flag travels through _bucketed_bigrams in
    # the id seat) — previously two corpus-sized explode passes + a
    # two-sided totals cross join.
    # NULL predicate rows are non-target (SQL WHERE semantics): without
    # the coalesce, a bucket whose bigrams all come from NULL-predicate
    # rows would get ct = NULL (F.sum skips NULLs over an all-NULL
    # group) and a NULL λ that silently poisons downstream score joins.
    flagged = docs.withColumn(
        "__is_t", F.coalesce(target_pred.cast("long"), F.lit(0))
    )
    grams = _bucketed_bigrams(flagged, "__is_t", text_col, n_buckets)
    counts = grams.groupBy("bucket").agg(
        F.count("*").alias("cc"), F.sum("__is_t").alias("ct")
    )
    tot = counts.agg(F.sum("cc").alias("nc"), F.sum("ct").alias("nt"))
    # log-ratio per bucket, add-one smoothed over B buckets:
    #   λ(b) = ln((ct+1)/(nt+B)) − ln((cc+1)/(nc+B))
    # built on the corpus bucket table (every scored gram's bucket has
    # cc ≥ 1 by construction; a bucket unseen in the target has ct = 0).
    lam = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("ct") + 1).cast("double")
                    / (F.col("nt") + n_buckets).cast("double")
                )
                - F.log(
                    (F.col("cc") + 1).cast("double")
                    / (F.col("nc") + n_buckets).cast("double")
                )
            ).alias("lam"),
        )
    )
    return lam


def dsir_score(
    docs: DataFrame,
    lam: DataFrame,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a fitted λ table: explode bigrams,
    broadcast-join λ, sum per doc in DECIMAL.  The only corpus-sized
    shuffle in the whole DSIR pipeline.  Buckets absent from λ score 0
    (unseen at fit time — no evidence either way)."""
    grams = _bucketed_bigrams(docs, id_col, text_col, n_buckets)
    return (
        grams.join(F.broadcast(lam), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.sum(F.coalesce(F.col("lam"), F.lit(0.0)).cast("decimal(28,12)"))
            .cast("double")
            .alias("dsir_logweight"),
        )
    )


def dsir_logweights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR log importance weight over hashed bigram
    features.  ``target_pred`` selects the target slice (e.g.
    ``F.col("lang") == "en"``).  Documents with < 2 tokens have no
    features and drop out (same as the bigram LM).  Output:
    (id, n_grams, dsir_logweight) — positive = more target-like than
    corpus-typical; resample ∝ exp(weight) to shift the mixture."""
    return dsir_score(
        docs, dsir_lambda(docs, target_pred, n_buckets, text_col),
        n_buckets, id_col, text_col,
    )
