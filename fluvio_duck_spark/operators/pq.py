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


# -- portable PQ (engine-reproducible training + ADC) -----------------------


def pq_train_portable(
    df: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Per-subspace codebooks from the DECIMAL-accumulated portable
    k-means (operators/kmeans.py::kmeans_fit_portable) — every float in
    every codebook is engine-reproducible, so PQ *training* can be
    hash-audited, not just its output (the numpy ``pq_train`` stays the
    perf path).  Returns m × k × (d/m) nested lists (bounded driver
    state)."""
    from fluvio_duck_spark.operators.kmeans import kmeans_fit_portable

    dim = len(df.select(vec_col).first()[0])
    assert dim % m == 0
    sub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            id_col, F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col)
        )
        books.append(
            kmeans_fit_portable(sliced, k=k, iters=iters,
                                vec_col=vec_col, id_col=id_col)
        )
    return books


def _py_d2(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right Σ(x−y)² in doubles — the same fold the
    engines run, so a driver-computed ADC table matches them exactly."""
    s = 0.0
    for x, y in zip(a, b):
        s += (x - y) * (x - y)
    return s


def pq_topk_portable(
    df: DataFrame,
    books: list[list[list[float]]],
    query_id: int = 0,
    k_out: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC retrieval over the portable codebooks: each row's subspace
    codes are in-row argmins against codebook literals; the asymmetric
    distance is an EXPLICIT left-to-right sum of per-subspace lookup
    literals (no float-order ambiguity anywhere); the best ``shortlist``
    by ADC (bounded heap) re-rank by exact cosine.  Scan cost at scale:
    the codes-from-floats form here demos the arithmetic — a production
    table persists the m uint8 codes and never touches the floats."""
    from fluvio_duck_spark.functions.vectors import cosine
    from fluvio_duck_spark.operators.kmeans import _argmin_cell

    m = len(books)
    sub = len(books[0][0])
    qv = [float(x) for x in df.filter(F.col(id_col) == query_id)
          .select(vec_col).first()[0]]

    emb = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    score = None
    for j in range(m):
        qsub = qv[j * sub:(j + 1) * sub]
        adc = [_py_d2(qsub, c) for c in books[j]]
        code = _argmin_cell(f"slice(__v, {j * sub + 1}, {sub})", books[j])
        term = F.element_at(
            F.array(*[F.lit(d) for d in adc]), code + 1
        )
        score = term if score is None else score + term
    cand = (
        emb.filter(F.col(id_col) != query_id)
        .select(id_col, vec_col, score.alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(shortlist)
    )
    qlit = F.array(*[F.lit(x) for x in qv])
    return (
        cand.select(id_col, cosine(F.col(vec_col), qlit).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k_out)
    )


def pq_portable_oracle_sql(
    m: int = 4, k: int = 4, iters: int = 2, dim: int = 64,
    query_id: int = 0, k_out: int = 10, shortlist: int = 50,
) -> str:
    """The whole portable-PQ pipeline as DuckDB SQL: per-subspace
    unrolled k-means chains (same decimal arithmetic as the kmeans
    portable oracle), per-row code assignment, ADC as an explicit
    left-to-right 4-term sum, bounded shortlist, exact-cosine rerank."""
    sub = dim // m

    def d2(vec_expr: str) -> str:
        return (
            f"list_aggregate(list_transform(range(1, {sub} + 1), "
            f"i -> ({vec_expr}[i] - cv[i]) * ({vec_expr}[i] - cv[i])), 'sum')"
        )

    parts = [f"""WITH emb AS MATERIALIZED (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings)"""]
    for j in range(m):
        lo = j * sub + 1
        sl = f"list_slice(v, {lo}, {lo + sub - 1})"
        sums = ",\n           ".join(
            f"SUM(CAST(sv[{i + 1}] AS DECIMAL(38,12))) AS s{i}"
            for i in range(sub)
        )
        cvexpr = ", ".join(f"CAST(s{i} AS DOUBLE) / cnt" for i in range(sub))
        parts.append(f"""sub{j} AS MATERIALIZED (
  SELECT vec_id, {sl} AS sv FROM emb),
c{j}_0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         sv AS cv
  FROM (SELECT vec_id, sv FROM sub{j} ORDER BY vec_id LIMIT {k}) z)""")
        for t in range(1, iters + 1):
            parts.append(f"""a{j}_{t} AS MATERIALIZED (
  SELECT vec_id, sv, cell FROM (
    SELECT e.vec_id, e.sv, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2('sv')}, c.cell) AS rn
    FROM sub{j} e CROSS JOIN c{j}_{t - 1} c) z
  WHERE rn = 1),
n{j}_{t} AS MATERIALIZED (
  SELECT cell, COUNT(*) AS cnt,
           {sums}
  FROM a{j}_{t} GROUP BY cell),
c{j}_{t} AS MATERIALIZED (
  SELECT p.cell,
         CASE WHEN n.cell IS NULL THEN p.cv ELSE list_value({cvexpr}) END AS cv
  FROM c{j}_{t - 1} p LEFT JOIN n{j}_{t} n USING (cell))""")
        parts.append(f"""code{j} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2('sv')}, c.cell) AS rn
    FROM sub{j} e CROSS JOIN c{j}_{iters} c) z
  WHERE rn = 1),
adc{j} AS MATERIALIZED (
  SELECT c.cell, {d2(f'list_slice(q.v, {lo}, {lo + sub - 1})').replace('cv[i]', 'c.cv[i]')} AS d
  FROM c{j}_{iters} c CROSS JOIN (SELECT v FROM emb WHERE vec_id = {query_id}) q)""")
    code_joins = " ".join(
        f"JOIN code{j} k{j} USING (vec_id)" for j in range(m)
    )
    adc_joins = " ".join(
        f"JOIN adc{j} a{j} ON a{j}.cell = k{j}.cell" for j in range(m)
    )
    adc_sum = " + ".join(f"a{j}.d" for j in range(m))
    parts.append(f"""cand AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, {adc_sum} AS adc
  FROM emb e {code_joins} {adc_joins}
  WHERE e.vec_id <> {query_id}
  ORDER BY adc, e.vec_id LIMIT {shortlist}),
q2 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id}),
scored AS (
  SELECT vec_id,
    list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM cand CROSS JOIN q2)
SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT {k_out}""")
    return ",\n".join(parts) + "\n"
