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

from pyspark.sql import Column, DataFrame
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
