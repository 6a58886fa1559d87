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
