"""Token-bounded document chunking (sliding window with overlap).

A training-data pipeline rarely feeds whole documents to a model; it
feeds fixed-budget chunks with some overlap for context continuity
(the standard pretraining / RAG-indexing prep step).  The reference has
no such operator (its unit is the stream record); this is one of the
brief's beyond-the-reference training-pipeline operators.

Design for 100 TB: pure JVM expressions — ``split`` → ``sequence`` of
window starts → ``posexplode`` → ``slice``/``array_join``.  Map-only
(zero shuffles): each input partition chunks independently, output row
count ≈ input tokens / stride, and Catalyst keeps the whole thing in
one whole-stage-codegen pass.  No Python, no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: whitespace tokenization shared with the DuckDB oracle (regexp split on
#: runs of whitespace over the trimmed text)
_WS = r"\s+"


def tokenize(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), _WS)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 16,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each document into sliding windows of ``max_tokens``
    tokens advancing by ``max_tokens - overlap``.

    Output: ``(id_col, chunk_index INT, n_chunk_tokens INT, chunk
    STRING, *keep_cols)``.  Every token appears in ≥1 chunk; consecutive
    chunks share exactly ``overlap`` tokens (the final chunk may be
    shorter).  A window is emitted only if it contributes a new token:
    starts are ``0, stride, 2·stride, … <= n_tokens - overlap - 1``
    (so a trailing window lying entirely inside the previous one never
    appears).  Tokenless documents emit no chunks.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = tokenize(text_col)
    n = F.size(toks)
    starts = F.when(
        (n > 0) & (F.trim(F.col(text_col)) != ""),
        F.sequence(
            F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
        ),
    ).otherwise(F.array().cast("array<int>"))
    keep = keep_cols or []
    exploded = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col(text_col),
        F.posexplode(starts).alias("chunk_index", "start"),
    )
    piece = F.slice(tokenize(text_col), F.col("start") + 1, max_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk"),
        *[F.col(c) for c in keep],
    )


def concat_pack(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens: Column | None = None,
    seq_len: int = 256,
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk packing assignment: documents are
    (conceptually) concatenated in ``id_col`` order and cut into
    fixed-length training sequences of ``seq_len`` tokens; each document
    learns which sequences it lands in.

    Output per input row: ``(id_col, n_tokens INT, cum_before BIGINT,
    seq_start BIGINT, seq_end BIGINT, offset_in_seq BIGINT)`` where
    ``cum_before`` is the token count of all preceding documents,
    ``seq_start/seq_end`` the first/last sequence index the document
    touches, and ``offset_in_seq`` its position inside ``seq_start``.

    This is a GLOBAL running sum — the operator a naive implementation
    funnels through a single-task ``Window.orderBy`` — computed here as a
    distributed two-level prefix sum:

    1. bucket by ~P driver-sampled id-quantile boundaries shipped back
       as LITERALS (one approxQuantile scan; the bucket is a pure
       function of the row's id, so every re-evaluation of the plan
       assigns the identical bucket — ``spark_partition_id`` after a
       range shuffle is evaluation-dependent, and this operator's
       totals aggregate and join branch each re-evaluate the exchange:
       the same double-evaluation drift the sf1 receipt caught in
       operators/ranking.py.  Boundary placement affects balance only);
    2. per-bucket token totals (an aggregate of ≤ #buckets rows)
       cumulated into per-bucket offsets by a window over that TINY
       table, broadcast back;
    3. an in-bucket running sum keyed by the bucket id plus the
       broadcast offset.

    No driver collect, no global sort, no single-task stage over data —
    the only full-data movement is the bucket-id window's hash exchange.
    ``n_tokens`` defaults to the whitespace token count of ``text``
    (must be ≥ 1 per row with that tokenizer, matching the oracle).
    """
    from fluvio_duck_spark.operators.ranking import bucket_by_quantiles

    spark = df.sparkSession
    toks = n_tokens if n_tokens is not None else F.size(tokenize("text"))
    base = df.select(F.col(id_col), toks.cast("long").alias("n_tokens"))
    parts = num_partitions or spark.sparkContext.defaultParallelism
    # shared value-derived bucketing (ranking.py): NULL ids land in
    # bucket 0 (NULLS FIRST) instead of being dropped by the offsets
    # join; non-numeric ids degrade to one bucket with a loud warning
    ranged = base.withColumn("__pid", bucket_by_quantiles(base, id_col, parts))
    totals = ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("__ptot"))
    w_parts = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__ptot").over(w_parts), F.lit(0)).alias("__poff"),
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.col("__poff") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn("cum_before", cum)
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("cum_before"),
            F.floor(F.col("cum_before") / seq_len).alias("seq_start"),
            F.floor(
                (F.col("cum_before") + F.col("n_tokens") - 1) / seq_len
            ).alias("seq_end"),
            F.pmod(F.col("cum_before"), F.lit(seq_len)).cast("long").alias(
                "offset_in_seq"
            ),
        )
    )


def span_corruption_plan(
    docs: DataFrame,
    start_pct: int = 5,
    span_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span-corruption planning (Raffel et al., JMLR 2020):
    deterministically select noise spans per document and report the
    masking statistics a pretraining pipeline needs before writing
    (inputs, targets) pairs.

    A token position i starts a span iff the PORTABLE hash of
    ``"<doc_id>:<i>"`` lands below ``start_pct`` of 100 buckets
    (operators/dsir.py::hash_bucket — md5 ascii-fold, so the plan is
    engine-reproducible and resample-stable: adding documents never
    changes another document's mask).  Each span covers ``span_len``
    tokens; overlapping/adjacent spans merge, which the position-wise
    OR over the trailing window expresses exactly.  Expected noise
    density ≈ start_pct·span_len / 100 (≈15% at the defaults).

    Plan shape: everything is per-row array HOFs — sequence →
    start flags → trailing-window OR → masked count and span count —
    ZERO shuffles at any corpus size (the chunk_documents contract).
    Output: (id, n_tokens, n_spans, n_masked, mask_ratio)."""
    from fluvio_duck_spark.operators.dsir import hash_bucket

    tk = tokenize(text_col)
    # NULL/blank docs are excluded up front: split(trim(''), '\s+') yields
    # [''] (size 1), which would count a phantom empty token and diverge
    # from the oracle's WHERE trim(text) <> '' (ADVICE r4).
    base = (
        docs.filter(
            F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col), tk.alias("_tk"))
        .filter(F.size("_tk") >= 1)
    )
    n = F.size("_tk")
    idcol = F.col(id_col)

    def start_flag(i):
        key = F.concat(idcol.cast("string"), F.lit(":"), i.cast("string"))
        return (hash_bucket(key, 100) < start_pct).cast("int")

    starts = F.transform(F.sequence(F.lit(1), n), start_flag)

    def masked_flag(i):
        # position i is masked iff some span starts in (i-span_len, i]
        flags = [
            F.when(i - off >= 1, F.element_at(F.col("_st"), (i - off).cast("int")))
            .otherwise(F.lit(0))
            for off in range(span_len)
        ]
        out = flags[0]
        for fl in flags[1:]:
            out = F.greatest(out, fl)
        return out

    with_masks = base.select(
        idcol,
        "_tk",
        starts.alias("_st"),
    ).select(
        idcol,
        F.size("_tk").alias("n_tokens"),
        F.transform(F.sequence(F.lit(1), F.size("_tk")), masked_flag).alias(
            "_mk"
        ),
    )
    m = F.col("_mk")
    n_masked = F.aggregate(m, F.lit(0), lambda a, x: a + x)
    # a span begins where masked flips 0→1: position 1 counts if masked
    n_spans = F.aggregate(
        F.sequence(F.lit(1), F.size(m)),
        F.lit(0),
        lambda a, i: a
        + F.when(
            (F.element_at(m, i.cast("int")) == 1)
            & ((i == 1) | (F.element_at(m, (i - 1).cast("int")) == 0)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return with_masks.select(
        idcol,
        "n_tokens",
        n_spans.alias("n_spans"),
        n_masked.alias("n_masked"),
        (n_masked.cast("double") / F.col("n_tokens")).alias("mask_ratio"),
    )
