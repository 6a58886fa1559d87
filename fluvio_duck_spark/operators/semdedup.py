"""Semantic deduplication (SemDedup-style): cluster the embedding space
with the distributed k-means codebook, then search for near-duplicate
pairs only *within* each cluster.

The reference has no similarity surface at all (its only extensibility is
server-side WASM transforms, SURVEY §2.12); this is a brief-mandated
training-data-pipeline extension, following the published SemDedup recipe
(Abbas et al., 2023, arXiv:2303.09540): exact all-pairs cosine is O(n²),
but semantic duplicates are — by construction — near each other in
embedding space, so restricting the pair search to k-means cells keeps
~all true pairs while cutting the candidate set by ~k×.

Scale shape (the reason this exists next to the exact operators in
``operators/similarity.py``):

* ``kmeans_fit`` is shuffle-free distributed Lloyd's (map-side partial
  sums, k×d driver state — see ``operators/kmeans.py``).
* Cell assignment is a map-only pandas-UDF pass; at 100 TB the table is
  then *bucketed/partitioned by cell*, so the within-cell self-join below
  is a co-located join with no cross-cell traffic.
* The self-join shuffles on ``cell`` only; per-task work is |cell|²·d,
  bounded by the cluster granularity k (pick k ∝ n/√n to bound cell
  sizes; a runaway hot cell is split exactly like a skewed join key —
  ``operators/skew.py``).

Recall is governed by cluster tightness, not luck: a pair is missed only
when the two vectors fall in different cells, i.e. when their similarity
is at the cluster boundary — tests measure recall against the exact
all-pairs answer (``tests/test_kmeans.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvio_duck_spark.functions.vectors import cosine
from fluvio_duck_spark.operators.kmeans import kmeans_assign, kmeans_fit


def semantic_dup_pairs(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    normalize: bool = True,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: ``(cell, id_a, id_b, sim)``
    with ``id_a < id_b`` and cosine ≥ ``threshold``.  Deterministic end
    to end (deterministic k-means init/order, pure-expression cosine).

    ``normalize=True`` (the paper's setup) L2-normalizes inside the
    k-means kernels so the clustering's L2 geometry matches the cosine
    objective: on the unit sphere ``||a-b||² = 2(1-cos)``, so
    ε-near-duplicate pairs are ε-close in the clustered space and land
    in the same cell except exactly at a cell boundary.  (The
    normalization runs numpy-side — ``operators/kmeans.py`` — because
    cosine below is scale-invariant anyway and Spark cannot feed a
    higher-order-function expression into a pandas UDF once join
    null-filters are pushed below the projection.)"""
    work = df.select(id_col, vec_col)
    centroids = kmeans_fit(
        work, k=k, vec_col=vec_col, id_col=id_col, max_iter=max_iter,
        normalize=normalize,
    )
    # Materialize the assignment once: both self-join sides (and the
    # join's pushed-down null filters) would otherwise re-run the Python
    # assignment pass per branch.  At 100 TB the equivalent step is
    # writing the assigned table bucketed by cell (sinks.write_bucketed),
    # which also makes the self-join co-located.
    assigned = kmeans_assign(
        work, centroids, vec_col=vec_col, normalize=normalize
    ).localCheckpoint(eager=False)
    a = assigned.select(
        "cell", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        "cell", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cell",
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    normalize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(survivors, dup_pairs)``.

    Survivor policy: drop every vector that near-duplicates a *smaller
    id* (greedy keep-lowest-id — the deterministic one-pass policy; for
    transitive-closure grouping compose with
    ``operators/dedup.py::connected_components`` over the pairs)."""
    pairs = semantic_dup_pairs(
        df, k=k, threshold=threshold, id_col=id_col, vec_col=vec_col,
        max_iter=max_iter, normalize=normalize,
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = df.join(drop, id_col, "left_anti")
    return survivors, pairs


# -- portable SemDedup (engine-reproducible clustering) ---------------------


def semantic_dup_pairs_portable(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDedup whose clustering is the DECIMAL-accumulated portable
    k-means (kmeans_fit_portable) over in-engine L2-normalized vectors
    (functions/vectors.py::l2_normalize — a sequential-fold expression,
    so the normalization is engine-reproducible too; on the unit sphere
    L2 cells align with the cosine objective, the SemDedup setup).
    Assignment is an in-row argmin against centroid literals; pairs are
    the same-cell self-join with exact cosine ≥ threshold.  Output:
    (cell, id_a, id_b, sim) — fully oracle-checkable, unlike the
    numpy-fit perf path.

    SCALE CONTRACT (measured, SCALE.md round-4 block): the in-cell pair
    join is quadratic in cell population, so k must grow with the
    corpus — pick ``k ≈ n / target_cell_size`` (the published SemDedup
    setup).  This portable twin embeds k centroid literals in-row, so
    it is the moderate-k AUDIT path; use the mapInPandas fit
    (``semantic_dup_pairs``) when k reaches the tens of thousands."""
    from fluvio_duck_spark.functions.vectors import cosine, l2_normalize
    from fluvio_duck_spark.operators.kmeans import (
        _argmin_cell,
        kmeans_fit_portable,
    )

    work = df.select(
        F.col(id_col),
        F.col(vec_col),
        l2_normalize(F.col(vec_col)).alias("__nv"),
    )
    cents = kmeans_fit_portable(
        work, k=k, iters=iters, vec_col="__nv", id_col=id_col
    )
    assigned = work.withColumn(
        "cell", _argmin_cell("__nv", cents)
    ).localCheckpoint(eager=False)
    a = assigned.select(
        "cell", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        "cell", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cell", "id_a", "id_b",
            cosine(F.col("va"), F.col("vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semdedup_portable_oracle_sql(
    k: int = 8, iters: int = 2, dim: int = 64, threshold: float = 0.45,
    source_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """The portable SemDedup as DuckDB SQL: normalize → unrolled
    k-means chain → in-row assignment → same-cell pairs → exact cosine
    filter.  ``source_sql`` must yield (vec_id, embedding)."""
    d2 = (
        f"list_aggregate(list_transform(range(1, {dim} + 1), "
        f"i -> (nv[i] - cv[i]) * (nv[i] - cv[i])), 'sum')"
    )
    sums = ",\n           ".join(
        f"SUM(CAST(nv[{i + 1}] AS DECIMAL(38,12))) AS s{i}"
        for i in range(dim)
    )
    cvexpr = ", ".join(f"CAST(s{i} AS DOUBLE) / cnt" for i in range(dim))
    parts = [f"""WITH src AS MATERIALIZED ({source_sql}),
emb AS MATERIALIZED (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM src),
nrm AS MATERIALIZED (
  SELECT vec_id, embedding,
         CASE WHEN nn = 0 THEN v
              ELSE list_transform(v, x -> x / nn) END AS nv
  FROM (SELECT vec_id, embedding, v,
               sqrt(list_aggregate(list_transform(range(1, {dim} + 1),
                    i -> v[i] * v[i]), 'sum')) AS nn
        FROM emb) z),
cent0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         nv AS cv
  FROM (SELECT vec_id, nv FROM nrm ORDER BY vec_id LIMIT {k}) z)"""]
    for t in range(1, iters + 1):
        parts.append(f"""a{t} AS MATERIALIZED (
  SELECT vec_id, nv, cell FROM (
    SELECT e.vec_id, e.nv, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cell) AS rn
    FROM nrm e CROSS JOIN cent{t - 1} c) z
  WHERE rn = 1),
n{t} AS MATERIALIZED (
  SELECT cell, COUNT(*) AS cnt,
           {sums}
  FROM a{t} GROUP BY cell),
cent{t} AS MATERIALIZED (
  SELECT p.cell,
         CASE WHEN n.cell IS NULL THEN p.cv ELSE list_value({cvexpr}) END AS cv
  FROM cent{t - 1} p LEFT JOIN n{t} n USING (cell))""")
    cos = """
    list_aggregate(list_transform(range(1, len(va)+1),
        i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(va)+1),
        i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(vb)+1),
        i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)), 'sum')))"""
    parts.append(f"""asg AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cell) AS rn
    FROM nrm e CROSS JOIN cent{iters} c) z
  WHERE rn = 1),
pairs AS (
  SELECT x.cell, a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS va, b.embedding AS vb
  FROM asg x JOIN src a ON a.vec_id = x.vec_id
  JOIN asg y ON y.cell = x.cell
  JOIN src b ON b.vec_id = y.vec_id
  WHERE a.vec_id < b.vec_id)""")
    return (
        ",\n".join(parts)
        + f"\nSELECT cell, id_a, id_b, {cos} AS sim FROM pairs"
        + f"\nWHERE {cos} >= {threshold}\n"
    )
