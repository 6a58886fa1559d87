"""Distributed Lloyd's k-means over an embedding column — the trained
coarse quantizer for IVF ANN (``similarity.ivf_topk``'s production
codebook), and the house example of an *iterative* algorithm done
Spark-right.

Per iteration:

* centroids (k×d floats, a few KB) broadcast to every task as plan
  literals — never a shuffle;
* assignment + per-cell partial sums computed inside one Arrow-batched
  ``mapInPandas`` pass: each task emits at most k rows (cell, sum-vector,
  count) regardless of input size — the map-side-combine shape;
* partials (≤ tasks×k rows) collect to the driver and reduce in numpy —
  the treeAggregate pattern; driver memory is O(k·d), not O(n).

So a 100 TB fit shuffles *nothing*: each iteration is one scan + a
driver-side reduction of a few thousand tiny rows.  State that must not
be recomputed (the input projection) should be cached by the caller.

Determinism: init picks the k lowest-id vectors (no RNG), ties in
assignment break toward the lower cell index, iteration count and tol
are fixed — same data → same codebook on any cluster size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_normalize(m: np.ndarray) -> np.ndarray:
    """Unit-L2 rows (zero rows pass through) — numpy-side so callers can
    cluster in cosine geometry without stacking a higher-order-function
    expression under the pandas UDF input (Spark cannot evaluate a
    Python UDF whose argument embeds lambda expressions once a filter is
    pushed below the projection)."""
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def _partial_sums_fn(centroids: np.ndarray, vec_col: str, normalize: bool = False):
    k, d = centroids.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                m = _row_normalize(m)
            # pairwise squared L2 via the expansion trick; argmin returns
            # the lowest index on ties (deterministic)
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * (m @ centroids.T)
                + (centroids * centroids).sum(axis=1)[None, :]
            )
            cells = np.argmin(d2, axis=1)
            for c in np.unique(cells):
                sel = cells == c
                sums[c] += m[sel].sum(axis=0)
                counts[c] += int(sel.sum())
        yield pd.DataFrame(
            {
                "cell": np.arange(k),
                "vsum": list(sums),
                "cnt": counts,
            }
        )

    return run


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 20,
    tol: float = 1e-6,
    normalize: bool = False,
) -> np.ndarray:
    """Fit a k×d codebook.  Returns the centroid matrix (numpy, driver
    side — it is broadcast state, not data).  ``normalize=True`` fits in
    cosine geometry (unit-L2 rows; see :func:`_row_normalize`)."""
    init_rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = np.stack([np.asarray(r[0], dtype=np.float64) for r in init_rows])
    if normalize:
        centroids = _row_normalize(centroids)
    schema = "cell int, vsum array<double>, cnt long"
    vecs = df.select(vec_col)
    for _ in range(max_iter):
        partials = vecs.mapInPandas(
            _partial_sums_fn(centroids, vec_col, normalize=normalize),
            schema=schema,
        ).collect()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in partials:
            sums[r.cell] += np.asarray(r.vsum)
            counts[r.cell] += r.cnt
        nonempty = counts > 0
        new_centroids = centroids.copy()  # empty cells keep their position
        new_centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift < tol:
            break
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    normalize: bool = False,
) -> DataFrame:
    """Map-only cell assignment (argmin over the broadcast codebook) —
    appends ``cell_col``; at scale this is the column the table is
    partitioned/bucketed by so IVF probes become partition-pruned scans."""
    cent = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        if normalize:
            m = _row_normalize(m)
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return df.withColumn(cell_col, assign(F.col(vec_col)))


# -- portable (engine-reproducible) k-means ---------------------------------


def _dist2_to_literal(v, cent: list[float]):
    """Σ (x−c)² as the sequential zip-fold (left-to-right double adds —
    the functions/vectors.py portability contract)."""
    lits = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(v, lits, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _dist2_sql(v_sql: str, cent: list[float]) -> str:
    """The SQL spelling of :func:`_dist2_to_literal` — identical
    expression tree (double literals round-trip through ``repr``;
    CAST-from-string parses the shortest repr back to the same IEEE
    double)."""
    lits = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in cent)
    return (
        f"aggregate(zip_with({v_sql}, array({lits}), "
        f"(x, y) -> (x - y) * (x - y)), "
        f"CAST('0.0' AS DOUBLE), (acc, t) -> acc + t)"
    )


def _argmin_cell(v, cents: list[list[float]]):
    """Nearest-centroid index with ties toward the lower cell: array_min
    over (d2, cell) structs compares lexicographically.

    ``v`` may be a SQL expression STRING (preferred — the whole k×d
    literal distance tree parses as one expression instead of
    k·(d + ~10) py4j round trips of Column construction per call, paid
    once per k-means iteration) or a Column (loop fallback, same
    tree)."""
    if isinstance(v, str):
        structs = ", ".join(
            f"named_struct('d2', {_dist2_sql(v, c)}, 'cell', {i})"
            for i, c in enumerate(cents)
        )
        return F.expr(f"array_min(array({structs})).cell")
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2_to_literal(v, c).alias("d2"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(cents)
            ]
        )
    )["cell"]


def kmeans_fit_portable(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's k-means whose every float is ENGINE-REPRODUCIBLE — the
    auditable twin of :func:`kmeans_fit` (which keeps the zero-shuffle
    mapInPandas perf path):

    * init = the k lowest-id vectors (no RNG);
    * assignment = in-row sequential-fold distances to centroid
      LITERALS, argmin with ties toward the lower cell;
    * update = per-cell per-dimension sums in DECIMAL(38,12) —
      partial-aggregation-ORDER-INDEPENDENT, so the fit is bit-stable
      under any partitioning, unlike float partial sums — divided as
      correctly-rounded double;
    * empty cells keep their previous centroid;
    * FIXED iteration count (no tol early-exit: a convergence test on
      floats would reintroduce order sensitivity).

    Per iteration: one scan + one k-row shuffle (map-side combine).
    Driver state is the k×d codebook — bounded, the kmeans-codebook
    precedent.  Returns the centroid list; DuckDB replicates the whole
    fit from the same arithmetic (see the generated oracle)."""
    emb = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    init = emb.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(
            f"kmeans_fit_portable: need at least k={k} rows, got {len(init)}"
        )
    cents = [list(r.v) for r in init]
    d = len(cents[0])
    for _ in range(iters):
        assigned = emb.select(_argmin_cell("v", cents).alias("cell"), "v")
        aggs = [
            F.expr(
                f"sum(CAST(element_at(v, {i + 1}) AS DECIMAL(38,12)))"
            ).alias(f"s{i}")
            for i in range(d)
        ] + [F.count("*").alias("cnt")]
        rows = {r["cell"]: r for r in assigned.groupBy("cell").agg(*aggs).collect()}
        new = []
        for c in range(k):
            r = rows.get(c)
            if r is None:
                new.append(cents[c])  # empty cell keeps its centroid
            else:
                # float(Decimal) is the correctly-rounded double — the
                # same value as the engine's CAST(sum AS DOUBLE) — and
                # double division matches the engine's
                new.append([float(r[f"s{i}"]) / r.cnt for i in range(d)])
        cents = new
    return cents


def ivf_topk_portable(
    df: DataFrame,
    cents: list[list[float]],
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe against the portable codebook: assign every vector (and
    the query) a cell in-row, score only the query's cell, exact-cosine
    top-k.  Same plan as ivf_topk; the cell column is what the table is
    partitioned by at scale."""
    from fluvio_duck_spark.functions.vectors import cosine

    emb = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    signed = emb.withColumn("cell", _argmin_cell(F.col("__v"), cents))
    q = (
        signed.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("__qv"), F.col("cell").alias("__qcell"))
    )
    return (
        signed.crossJoin(F.broadcast(q))
        .filter((F.col("cell") == F.col("__qcell")) & (F.col(id_col) != query_id))
        .select(id_col, cosine(F.col(vec_col), F.col("__qv")).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def _kmeans_fit_ctes(k: int, iters: int, dim: int) -> list[str]:
    """Shared CTE chain: the unrolled portable fit through the final
    assignment table ``asg`` (vec_id, cell).  Reused by the IVF-probe
    oracle and the cell-balance oracle so both check the SAME fit."""
    sums = ",\n           ".join(
        f"SUM(CAST(CAST(v[{i + 1}] AS DOUBLE) AS DECIMAL(38,12))) AS s{i}"
        for i in range(dim)
    )
    cv = ", ".join(f"CAST(s{i} AS DOUBLE) / cnt" for i in range(dim))
    d2 = (
        "list_aggregate(list_transform(range(1, {d} + 1), "
        "i -> (v[i] - cv[i]) * (v[i] - cv[i])), 'sum')".format(d=dim)
    )
    parts = [f"""WITH emb AS MATERIALIZED (
  SELECT vec_id, embedding, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
cent0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, v AS cv
  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {k}) z)"""]
    for t in range(1, iters + 1):
        parts.append(f"""a{t} AS MATERIALIZED (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cell) AS rn
    FROM emb e CROSS JOIN cent{t - 1} c) z
  WHERE rn = 1),
n{t} AS MATERIALIZED (
  SELECT cell, COUNT(*) AS cnt,
           {sums}
  FROM a{t} GROUP BY cell),
cent{t} AS MATERIALIZED (
  SELECT p.cell,
         CASE WHEN n.cell IS NULL THEN p.cv ELSE list_value({cv}) END AS cv
  FROM cent{t - 1} p LEFT JOIN n{t} n USING (cell))""")
    parts.append(f"""asg AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cell) AS rn
    FROM emb e CROSS JOIN cent{iters} c) z
  WHERE rn = 1)""")
    return parts


def kmeans_portable_oracle_sql(
    k: int = 8, iters: int = 3, dim: int = 64, query_id: int = 0,
    topk: int = 10, probe_where: str = "",
) -> str:
    """The ENTIRE portable pipeline — k-means fit (unrolled iterations)
    + IVF probe — as DuckDB SQL, from the same arithmetic: sequential
    distance folds, DECIMAL(38,12) per-dimension sums, double division,
    lexicographic argmin tie-break.  ``probe_where`` adds a metadata
    predicate to the probe's candidate set (filtered ANN) without
    touching the fit."""
    parts = _kmeans_fit_ctes(k, iters, dim)
    parts.append(f"""q AS (
  SELECT e.embedding AS qv, a.cell AS qcell
  FROM emb e JOIN asg a USING (vec_id) WHERE e.vec_id = {query_id}),
scored AS (
  SELECT e.vec_id,
    list_aggregate(list_transform(range(1, len(e.embedding)+1),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(e.embedding)+1),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM emb e JOIN asg a USING (vec_id) CROSS JOIN q
  WHERE a.cell = qcell AND e.vec_id <> {query_id}{probe_where})""")
    return (
        ",\n".join(parts)
        + f"\nSELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT {topk}\n"
    )


def kmeans_cells_oracle_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Cell-population report over the SAME oracle-checked fit: per cell
    the vector count, the corpus fraction (6 dp), and the ratio to the
    perfectly-balanced size — the skew number an IVF deployment watches
    (a hot cell is a hot partition at probe time)."""
    parts = _kmeans_fit_ctes(k, iters, dim)
    return (
        ",\n".join(parts)
        + f""",
tot AS (SELECT COUNT(*) AS n FROM asg)
SELECT cell, CAST(COUNT(*) AS INT) AS n_vecs,
       round(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot), 6) AS frac,
       round(CAST(COUNT(*) AS DOUBLE) * {k} / (SELECT n FROM tot), 6)
         AS balance_ratio
FROM asg GROUP BY cell
"""
    )
