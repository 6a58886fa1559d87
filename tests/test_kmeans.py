"""Distributed Lloyd's k-means: determinism, convergence, IVF recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fluvio_duck_spark.operators.kmeans import kmeans_assign, kmeans_fit
from fluvio_duck_spark.operators.similarity import cosine_topk, ivf_topk
from fluvio_duck_spark.sources.tables import load


def _emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_fit_is_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    c1 = kmeans_fit(emb, k=4, max_iter=5)
    c2 = kmeans_fit(emb, k=4, max_iter=5)
    assert np.array_equal(c1, c2)


def test_iterations_reduce_inertia(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    vecs = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in emb.select("embedding").collect()]
    )

    def inertia(cent):
        d2 = ((vecs * vecs).sum(1)[:, None] - 2 * vecs @ cent.T
              + (cent * cent).sum(1)[None, :])
        return float(d2.min(axis=1).sum())

    c0 = kmeans_fit(emb, k=4, max_iter=1)
    c5 = kmeans_fit(emb, k=4, max_iter=5)
    assert inertia(c5) <= inertia(c0) + 1e-9


def test_assign_partitions_all_rows(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cent = kmeans_fit(emb, k=4, max_iter=3)
    assigned = kmeans_assign(emb, cent)
    n = emb.count()
    assert assigned.count() == n
    cells = [r.cell for r in assigned.select("cell").distinct().collect()]
    assert all(0 <= c < 4 for c in cells)
    # every row got exactly one cell
    assert assigned.filter(F.col("cell").isNull()).count() == 0


def test_trained_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cent = kmeans_fit(emb, k=4, max_iter=5)
    assigned = kmeans_assign(emb, cent)
    exact = [r.vec_id for r in cosine_topk(emb, query_id=0, k=10).collect()]
    approx = {
        r.vec_id
        for r in ivf_topk(assigned, query_id=0, k=10, cell_col="cell").collect()
    }
    recall = len(set(exact) & approx) / len(exact)
    assert recall >= 0.3, f"trained-IVF recall too low: {recall}"


def test_pq_codes_shape_and_range(spark, sf_dir):
    from fluvio_duck_spark.operators.pq import pq_encode, pq_train

    emb = _emb(spark, sf_dir)
    books = pq_train(emb, m=16, k=32, max_iter=5)
    assert books.shape == (16, 32, 4)  # 64-dim fixture → 4-dim subspaces
    enc = pq_encode(emb, books)
    rows = enc.select("pq_code").limit(20).collect()
    for r in rows:
        assert len(r.pq_code) == 16
        assert all(0 <= c < 32 for c in r.pq_code)


def test_pq_rerank_recall_vs_bruteforce(spark, sf_dir):
    from fluvio_duck_spark.operators.pq import pq_encode, pq_topk_rerank, pq_train

    emb = _emb(spark, sf_dir).cache()
    books = pq_train(emb, m=16, k=32, max_iter=10)
    enc = pq_encode(emb, books).select("vec_id", "pq_code").cache()
    recalls = []
    for qid in (0, 7, 42):
        qv = emb.filter(F.col("vec_id") == qid).select("embedding").first()[0]
        exact = {r.vec_id for r in cosine_topk(emb, query_id=qid, k=10).collect()}
        approx = {
            r.vec_id
            for r in pq_topk_rerank(
                emb.filter(F.col("vec_id") != qid),
                enc.filter(F.col("vec_id") != qid),
                books, qv, k=10, shortlist=50,
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    mean = sum(recalls) / len(recalls)
    assert all(r >= 0.5 for r in recalls), f"pq recall floor: {recalls}"
    assert mean >= 0.7, f"pq mean recall too low: {recalls}"


# --- SemDedup (operators/semdedup.py) ------------------------------------


def _with_planted(emb, n=20, offset=100000, scale=2.0):
    """Re-add the first n vectors under new ids, scaled by a power of two
    (exact in IEEE float → cosine with the original is exactly 1.0)."""
    planted = emb.filter(F.col("vec_id") < n).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(scale)).cast("float")
        ).alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(planted)


def test_semantic_dedup_planted_recall_is_total(spark, sf_dir):
    """Scaled copies are bit-identical after normalization, so every
    planted pair MUST be co-clustered and found — recall 1.0, not luck."""
    from fluvio_duck_spark.operators.semdedup import semantic_dedup

    emb = _emb(spark, sf_dir)
    corpus = _with_planted(emb, n=20)
    survivors, pairs = semantic_dedup(corpus, k=8, threshold=0.99, max_iter=5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(i, i + 100000) for i in range(20)}
    surv_ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    # keep-lowest-id policy: all originals survive, all planted copies drop
    assert all(i in surv_ids for i in range(20))
    assert all(i + 100000 not in surv_ids for i in range(20))
    assert len(surv_ids) == corpus.count() - 20


def test_semantic_pairs_subset_of_exact(spark, sf_dir):
    from fluvio_duck_spark.operators.semdedup import semantic_dup_pairs
    from fluvio_duck_spark.operators.similarity import embedding_near_dup_pairs

    emb = _emb(spark, sf_dir)
    sem = {
        (r.id_a, r.id_b)
        for r in semantic_dup_pairs(emb, k=4, threshold=0.4, max_iter=5).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    assert sem <= exact


def test_semantic_dup_pairs_deterministic(spark, sf_dir):
    from fluvio_duck_spark.operators.semdedup import semantic_dup_pairs

    emb = _emb(spark, sf_dir)
    corpus = _with_planted(emb, n=10)
    r1 = sorted(
        (r.cell, r.id_a, r.id_b)
        for r in semantic_dup_pairs(corpus, k=8, threshold=0.99).collect()
    )
    r2 = sorted(
        (r.cell, r.id_a, r.id_b)
        for r in semantic_dup_pairs(corpus, k=8, threshold=0.99).collect()
    )
    assert r1 == r2 and len(r1) == 10


def test_kmeans_portable_fit_bit_stable_across_layouts(spark, sf_dir):
    """The DECIMAL-accumulated portable fit must produce BIT-IDENTICAL
    centroids under any partitioning (the float-partial-sum perf path
    can only promise near-equality; this one is order-independent by
    construction)."""
    from fluvio_duck_spark.operators.kmeans import kmeans_fit_portable
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    a = kmeans_fit_portable(emb.repartition(1), k=4, iters=2)
    b = kmeans_fit_portable(emb.repartition(13), k=4, iters=2)
    assert a == b  # exact float equality, every component


def test_ivf_portable_recall_vs_bruteforce(spark, sf_dir):
    from fluvio_duck_spark.operators.kmeans import (
        ivf_topk_portable,
        kmeans_fit_portable,
    )
    from fluvio_duck_spark.operators.similarity import cosine_topk
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    cents = kmeans_fit_portable(emb, k=8, iters=3)
    got = {r.vec_id for r in ivf_topk_portable(emb, cents, 0, k=10).collect()}
    exact = {r.vec_id for r in cosine_topk(emb, query_id=0, k=10).collect()}
    assert len(got & exact) / 10 >= 0.3  # single-cell probe recall


def test_pq_portable_recall_and_shortlist_contract(spark, sf_dir):
    """Portable-PQ ADC shortlist + rerank: decent recall vs brute force,
    and the reranked sims are the exact cosine values of the returned
    ids (the rerank stage is exact, only the shortlist is approximate)."""
    from fluvio_duck_spark.operators.pq import (
        pq_topk_portable,
        pq_train_portable,
    )
    from fluvio_duck_spark.operators.similarity import cosine_topk
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train_portable(emb, m=4, k=4, iters=2)
    got = {r.vec_id: r.sim
           for r in pq_topk_portable(emb, books, 0, k_out=10).collect()}
    exact = {r.vec_id: r.sim
             for r in cosine_topk(emb, query_id=0, k=10).collect()}
    assert len(got.keys() & exact.keys()) / 10 >= 0.3
    for vid in got.keys() & exact.keys():
        assert abs(got[vid] - exact[vid]) < 1e-12


def test_semdedup_portable_recovers_all_plants(spark, sf_dir):
    """Every planted exact duplicate must land in its original's cell
    (bit-identical after normalization) and appear as a pair."""
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.semdedup import (
        semantic_dup_pairs_portable,
    )
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    pairs = semantic_dup_pairs_portable(
        emb.unionAll(planted), k=8, iters=2, threshold=0.9
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(i, i + 100000) for i in range(50)}


def test_kmeans_fit_portable_rejects_fewer_than_k_rows(spark):
    """ADVICE r4: < k input rows used to crash with IndexError deep in the
    update loop; now a clear ValueError up front."""
    import pytest

    from fluvio_duck_spark.operators.kmeans import kmeans_fit_portable

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="at least k=8"):
        kmeans_fit_portable(df, k=8, iters=1)


def test_power_iteration_portable_is_dominant_direction(spark, sf_dir):
    """The portable fit must (a) return a unit vector, (b) be layout-
    independent bit-for-bit, and (c) agree with numpy's power iteration
    from the same start to ~1e-9 (the fixed-point quantization bound)."""
    import numpy as np
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.pca import power_iteration_portable
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    v, eig = power_iteration_portable(emb, iters=3)
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9 and eig > 0

    v2, eig2 = power_iteration_portable(emb.repartition(7), iters=3)
    assert v2 == v and eig2 == eig  # bit-stable under repartitioning

    X = np.array(
        [r.embedding for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    ref = np.full(X.shape[1], 0.125)
    for _ in range(3):
        w = X.T @ (X @ ref)
        ref = w / np.linalg.norm(w)
    cos = abs(float(np.dot(ref, np.array(v))))
    assert cos > 1 - 1e-9
