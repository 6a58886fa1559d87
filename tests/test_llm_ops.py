"""Verification of the training-data-pipeline operators: hash-based
approximations (MinHash-LSH, SimHash, hyperplane ANN) measured against
their exact counterparts, plus the multimodal plumbing contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluvio_duck_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from fluvio_duck_spark.operators.multimodal import (
    attach_binary_content,
    extract_features,
    sample_frames,
)
from fluvio_duck_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup_pairs,
)
from fluvio_duck_spark.sources.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, k=5, threshold=0.8).collect()
    }


def test_exact_dedup_covers_all_docs(docs):
    groups = exact_dedup(docs)
    assert groups.agg(F.sum("n_copies")).first()[0] == docs.count()


def test_planted_near_dups_found(exact_pairs):
    # the fixture plants near-duplicate documents
    assert len(exact_pairs) >= 5


def test_minhash_lsh_matches_exact(docs, exact_pairs):
    """b=8/r=4 banding: P(candidate | j>=0.8) ≈ 0.99 — expect full recall
    on the planted pairs, and verification removes false positives."""
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert lsh == exact_pairs


def test_minhash_candidates_without_verify_are_superset(docs, exact_pairs):
    cands = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, threshold=0.8, verify=False).collect()
    }
    assert cands >= exact_pairs


def test_simhash_pairs_are_near_dups(docs, exact_pairs):
    sh = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    # hamming<=3 of 64 is tighter than jaccard 0.8; everything it finds
    # must be a genuine exact-Jaccard near-dup, and it must find most
    assert sh <= exact_pairs
    assert len(sh) >= len(exact_pairs) // 3


def test_cosine_topk_excludes_query_and_is_ordered(emb):
    top = cosine_topk(emb, query_id=0, k=10).collect()
    assert len(top) == 10
    assert all(r.vec_id != 0 for r in top)
    sims = [r.sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ann_lsh_recall_vs_bruteforce(emb):
    exact = [r.vec_id for r in cosine_topk(emb, query_id=0, k=10).collect()]
    approx = {r.vec_id for r in ann_lsh_topk(emb, query_id=0, k=10).collect()}
    recall = len(set(exact) & approx) / len(exact)
    assert recall >= 0.3, f"ANN recall too low: {recall}"


def test_embedding_near_dups_symmetric_free(emb):
    pairs = embedding_near_dup_pairs(emb, threshold=0.45).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    assert all(r.sim >= 0.45 for r in pairs)


def test_concat_pack_layout_invariant_and_contiguous(spark, sf_dir):
    """concat_pack's answer must depend only on the global doc order,
    never on partition boundaries: 1, 3, and 16 range partitions yield
    byte-identical assignments, and the assignment is a contiguous
    token-interval tiling (each doc starts exactly where the previous
    ended)."""
    from fluvio_duck_spark.functions.text import token_count
    from fluvio_duck_spark.operators.chunking import concat_pack
    from fluvio_duck_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    results = [
        {
            tuple(r)
            for r in concat_pack(
                docs, n_tokens=token_count("text"), seq_len=128, num_partitions=p
            ).collect()
        }
        for p in (1, 3, 16)
    ]
    assert results[0] == results[1] == results[2]

    rows = sorted(results[0])  # by doc_id
    cum = 0
    for doc_id, n_tokens, cum_before, seq_start, seq_end, off in rows:
        assert cum_before == cum
        assert seq_start == cum // 128 and off == cum % 128
        assert seq_end == (cum + n_tokens - 1) // 128
        cum += n_tokens


def test_exact_near_dups_guard_refuses_large_input(emb):
    # the n² verification path must never silently run at scale: above
    # max_rows it raises with a pointer to the scale paths
    with pytest.raises(ValueError, match="bucketed=True"):
        embedding_near_dup_pairs(emb, threshold=0.45, max_rows=10)
    # bucketed path is unguarded (it IS the scale path)
    embedding_near_dup_pairs(emb, threshold=0.45, bucketed=True, max_rows=10)
    # explicit override runs
    assert embedding_near_dup_pairs(
        emb, threshold=0.45, max_rows=None
    ).count() > 0


def test_connected_components_chain_and_islands(spark):
    from fluvio_duck_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5 (diameter 4 → needs >1 propagation round),
    # pair 10-11, and 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_blocked_near_dups_matches_exact(emb):
    from fluvio_duck_spark.operators.similarity import blocked_near_dup_pairs

    exact = {
        (r.id_a, r.id_b): round(r.sim, 6)
        for r in embedding_near_dup_pairs(emb, threshold=0.45).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.sim
        for r in blocked_near_dup_pairs(emb, threshold=0.45).collect()
    }
    assert set(exact) == set(blocked)
    # GEMM vs sequential-fold summation differ below rounding precision
    assert all(abs(exact[k] - blocked[k]) < 1e-9 for k in exact)


def test_lsh_bucketed_near_dups_subset_of_exact(emb):
    exact = {
        (r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, threshold=0.45).collect()
    }
    bucketed = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.45, bucketed=True).collect()
    }
    assert bucketed <= exact


def test_multimodal_feature_extraction(docs):
    blobs = attach_binary_content(docs.limit(20))
    assert dict(blobs.dtypes)["content"] == "binary"
    feats = extract_features(blobs, n_features=16)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.features) == 16 for r in rows)
    # deterministic: same bytes → same features
    again = extract_features(blobs, n_features=16).collect()
    assert {r.doc_id: r.features for r in rows} == {r.doc_id: r.features for r in again}


def test_multimodal_frame_sampling_bounded(docs):
    blobs = attach_binary_content(docs.limit(10))
    frames = sample_frames(blobs, every_n_bytes=64, max_frames=4)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)


def test_decode_image_is_explicit_stub():
    from fluvio_duck_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image()


def test_l2_normalize_unit_norm_and_zero_vector(spark):
    import math

    from pyspark.sql import functions as F

    from fluvio_duck_spark.functions.vectors import l2_normalize, norm

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "id long, v array<double>",
    )
    out = {
        r.id: (r.unit, r.n)
        for r in df.select(
            "id",
            l2_normalize(F.col("v")).alias("unit"),
            norm(l2_normalize(F.col("v"))).alias("n"),
        ).collect()
    }
    assert out[1][0] == [0.6, 0.8] and math.isclose(out[1][1], 1.0)
    assert out[2][0] == [0.0, 0.0] and out[2][1] == 0.0  # zero passes through
    assert out[3][0] == [1.0, 0.0]


# --- deterministic sampling / data-mixture (operators/sampling.py) ----------


def test_stratified_sample_quota_and_determinism(spark):
    from fluvio_duck_spark.operators.sampling import stratified_sample, uniform_key

    rows = [(i, "en" if i % 3 else "fr") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, ["lang"], 10, uniform_key("doc_id", seed=7),
                            tiebreak=["doc_id"])
    got = out.groupBy("lang").count().collect()
    assert {r.lang: r["count"] for r in got} == {"en": 10, "fr": 10}

    # pure function of the data: partition layout must not change the draw
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(
            df.repartition(13), ["lang"], 10, uniform_key("doc_id", seed=7),
            tiebreak=["doc_id"],
        ).collect()
    )
    assert a == b

    # a different seed draws a different sample
    c = sorted(
        r.doc_id
        for r in stratified_sample(
            df, ["lang"], 10, uniform_key("doc_id", seed=8), tiebreak=["doc_id"]
        ).collect()
    )
    assert a != c


def test_stratified_sample_small_stratum_returns_all(spark):
    from fluvio_duck_spark.operators.sampling import stratified_sample, uniform_key

    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")],
                               "doc_id long, lang string")
    out = stratified_sample(df, ["lang"], 5, uniform_key("doc_id"))
    assert out.count() == 3  # quota > stratum size -> whole stratum


def test_pack_token_budget_greedy_prefix(spark):
    from fluvio_duck_spark.operators.sampling import pack_token_budget

    # en: 60+30 fits in 100, next (25) would overflow at 115 -> stops,
    # even though the later 5-token doc would individually still fit.
    rows = [
        (1, "en", 60), (2, "en", 30), (3, "en", 25), (4, "en", 5),
        (5, "fr", 200),  # single doc over budget -> empty stratum
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    out = pack_token_budget(
        df, ["lang"], [F.asc("doc_id")], F.col("n_tokens"), budget=100
    ).collect()
    assert sorted((r.doc_id, r.cum_tokens) for r in out) == [(1, 60), (2, 90)]


def test_contamination_report_counts_distinct_shared_shingles(spark):
    from fluvio_duck_spark.operators.dedup import contamination_report

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),       # shares 'a b c' and 'b c d' with bench
            (2, "x y z w q"),       # no overlap
            (3, "a b c a b c a"),   # repeated shingle counted once
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, "a b c d x")], "doc_id long, text string")
    got = {r.doc_id: r.n_shared_grams
           for r in contamination_report(corpus, bench, k=3).collect()}
    # bench 3-grams: {'a b c', 'b c d', 'c d x'}
    assert got == {1: 2, 3: 1}


# --- PII redaction (functions/text.py) -----------------------------------


def test_redact_pii_all_categories(spark):
    from fluvio_duck_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail a@b.io and c.d+x@e.org now"),
            (1, "server 192.168.1.250 up, call +44 20 7946 0958 ok"),
            (2, "no pii here at all"),
            (3, None),
        ],
        "id long, t string",
    )
    out = df.select(
        "id",
        redact_pii("t").alias("clean"),
        *[v.alias(k) for k, v in pii_counts("t").items()],
    ).collect()
    rows = {r.id: r for r in out}
    assert rows[0].clean == "mail <EMAIL> and <EMAIL> now"
    assert rows[0].n_emails == 2 and rows[0].n_ips == 0
    assert rows[1].clean == "server <IP> up, call <PHONE> ok"
    assert rows[1].n_ips == 1 and rows[1].n_phones == 1
    assert rows[2].clean == "no pii here at all"
    assert rows[3].clean is None and rows[3].n_emails is None


def test_redact_pii_order_email_before_phone(spark):
    """An email whose local part is digit-heavy must be redacted as an
    email, not half-eaten by the IP/phone patterns."""
    from fluvio_duck_spark.functions.text import redact_pii

    df = spark.createDataFrame([("x 5551234567@txt.att.net y",)], "t string")
    assert df.select(redact_pii("t").alias("c")).first().c == "x <EMAIL> y"


# --- temperature mixture (operators/sampling.py) -------------------------


def test_temperature_mixture_flattens_toward_uniform(spark):
    from fluvio_duck_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame(
        [("big",)] * 900 + [("small",)] * 100, "source string"
    )
    out = {r.source: r for r in temperature_mixture(df, "source", 0.5, 1000).collect()}
    assert out["big"].n == 900 and out["small"].n == 100
    # alpha=1 would give 900/100; sqrt flattening gives 750/250
    assert out["big"].alloc == 750 and out["small"].alloc == 250
    assert abs(out["big"].share - 0.75) < 1e-9
    assert abs(out["big"].share + out["small"].share - 1.0) < 1e-6


def test_temperature_mixture_alpha_one_is_proportional(spark):
    from fluvio_duck_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame(
        [("a",)] * 600 + [("b",)] * 400, "source string"
    )
    out = {r.source: r for r in temperature_mixture(df, "source", 1.0, 100).collect()}
    assert out["a"].alloc == 60 and out["b"].alloc == 40


def test_segment_dedup_keeps_first_occurrence_and_reassembles(spark):
    from fluvio_duck_spark.operators.dedup import segment_dedup

    # w=2 segments: doc 1 = [a b][c d], doc 2 repeats [a b] then has
    # fresh [x y]; doc 3 is entirely doc 1's segments → drops out
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "c d a b")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_segments_kept, r.dedup_text)
        for r in segment_dedup(df, words_per_segment=2).collect()
    }
    assert got == {1: (2, "a b c d"), 2: (1, "x y")}


def test_segment_dedup_ragged_tail_and_order(spark):
    from fluvio_duck_spark.operators.dedup import segment_dedup

    # 5 words at w=2 → ragged last segment [e]; segment order must be
    # positional after reassembly, not lexicographic
    df = spark.createDataFrame([(7, "d c b a e")], "doc_id long, text string")
    row = segment_dedup(df, words_per_segment=2).first()
    assert (row.n_segments_kept, row.dedup_text) == (3, "d c b a e")


def test_boilerplate_removal_strips_every_copy_including_first(spark):
    from fluvio_duck_spark.operators.dedup import boilerplate_segment_removal

    # w=2, max_doc_freq=1: [a b] appears in docs 1 and 2 → stripped from
    # BOTH (contrast segment_dedup, which keeps doc 1's copy); [a b]
    # twice within doc 4 alone is NOT boilerplate (distinct-doc count is
    # 1 there... but docs 1/2 already made it frequent, so it goes);
    # [q q] repeated only inside doc 5 survives both copies.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (4, "a b a b"), (5, "q q q q")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_segments_kept, r.clean_text)
        for r in boilerplate_segment_removal(
            df, words_per_segment=2, max_doc_freq=1
        ).collect()
    }
    # doc 4 was pure boilerplate → dropped entirely
    assert got == {1: (1, "c d"), 2: (1, "x y"), 5: (2, "q q q q")}


def test_split_assign_stable_and_partitioned(spark):
    from fluvio_duck_spark.operators.sampling import split_assign

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    splits = split_assign(df)
    by = {r.split: r.n for r in splits.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by) == {"train", "val", "test"}
    assert abs(by["train"] / 2000 - 0.9) < 0.03
    # stability: a doc's split is a pure function of its id — subsetting
    # the corpus must not move any doc between splits
    sub = split_assign(df.filter(F.col("doc_id") < 500))
    full = dict(splits.filter(F.col("doc_id") < 500).select("doc_id", "split").collect())
    assert dict(sub.select("doc_id", "split").collect()) == full


def test_training_order_permutes_per_seed_and_repeats(spark):
    from fluvio_duck_spark.operators.sampling import training_order

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    o1 = [r.doc_id for r in training_order(df, seed=1, num_partitions=4).collect()]
    o2 = [r.doc_id for r in training_order(df, seed=2, num_partitions=4).collect()]
    o1b = [r.doc_id for r in training_order(df, seed=1, num_partitions=4).collect()]
    assert sorted(o1) == list(range(300))  # a permutation, nothing lost
    assert o1 == o1b  # rerun-identical
    assert o1 != o2  # seeds give independent orders
    # collect() preserves partition order; range partitioning + in-partition
    # sort must equal the global (key, id) order
    from fluvio_duck_spark.operators.sampling import uniform_key
    want = [r.doc_id for r in df.select("doc_id", uniform_key("doc_id", 1).alias("k"))
            .orderBy("k", "doc_id").collect()]
    assert o1 == want


def test_canonical_text_merges_trivial_variants(spark):
    from fluvio_duck_spark.functions.text import canonical_text, fingerprint

    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO WORLD."),
         (4, "goodbye world")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        fingerprint("text").alias("raw_fp"),
        F.md5(canonical_text("text")).alias("canon_fp"),
    )
    assert out.select("raw_fp").distinct().count() == 4  # raw hash: all differ
    groups = {
        r.canonical_id: r.n
        for r in out.groupBy("canon_fp")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n"))
        .collect()
    }
    assert groups == {1: 3, 4: 1}  # canonical form merges 1,2,3


def test_chunking_covers_and_overlaps_exactly(spark, sf_dir):
    """Dropping each chunk's first `overlap` tokens (except chunk 0) and
    concatenating reconstructs the document exactly — proves full
    coverage AND exact-overlap in one invariant."""
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.chunking import chunk_documents
    from fluvio_duck_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(50)
    chunks = chunk_documents(docs, max_tokens=64, overlap=16)
    rebuilt = (
        chunks.withColumn(
            "part",
            F.when(F.col("chunk_index") == 0, F.col("chunk")).otherwise(
                F.array_join(
                    F.slice(F.split(F.col("chunk"), r"\s+"), 17, 100000), " "
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_index", "part"))
                ).part,
                " ",
            ).alias("rebuilt")
        )
    )
    joined = docs.select(
        "doc_id", F.array_join(F.split(F.trim("text"), r"\s+"), " ").alias("norm")
    ).join(rebuilt, "doc_id")
    bad = joined.filter(F.col("norm") != F.col("rebuilt")).count()
    assert bad == 0


def test_chunking_token_budget_and_edges(spark):
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # 100 toks: 2 chunks
            (2, "a b c"),                                # short: 1 chunk
            (3, ""),                                     # empty: none
            (4, None),                                   # null: none
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=64, overlap=16)
    rows = {(r.doc_id, r.chunk_index): r for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0)}
    assert rows[(1, 0)].n_chunk_tokens == 64
    assert rows[(1, 1)].n_chunk_tokens == 52  # tokens 48..99
    assert rows[(1, 1)].chunk.split()[0] == "t48"
    assert rows[(2, 0)].chunk == "a b c"
    assert all(r.n_chunk_tokens <= 64 for r in rows.values())


def test_random_projection_deterministic_and_map_only(spark, sf_dir):
    from fluvio_duck_spark.operators.projection import random_projection
    from fluvio_duck_spark.plans import assert_plan
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    red = random_projection(emb, out_dim=32, seed=7)
    a = {r.vec_id: list(r.embedding) for r in red.collect()}
    b = {
        r.vec_id: list(r.embedding)
        for r in random_projection(emb, out_dim=32, seed=7).collect()
    }
    assert a == b  # matrix regenerated from seed in every task, bit-stable
    assert len(next(iter(a.values()))) == 32
    assert_plan(red, Exchange=0, Scan_parquet=1)  # single Arrow map pass


def test_random_projection_preserves_distances_and_near_dups(spark, sf_dir):
    """The two JL guarantees the pipeline relies on: (a) pairwise squared
    distances distort by O(1/sqrt(out_dim)) on average, (b) near-duplicate
    pairs (cos >= 0.99) stay near-duplicate in the reduced space — the
    property that makes reduced-space near-dup shortlisting sound.
    (Ranking mid-similarity neighbors is NOT preserved at these margins;
    see operators/projection.py docstring.)"""
    import numpy as np

    from fluvio_duck_spark.operators.projection import projection_matrix
    from fluvio_duck_spark.sources.tables import load

    X = np.array(
        [r.embedding for r in load(spark, sf_dir, "embeddings").collect()],
        dtype=np.float32,
    )
    R = projection_matrix(X.shape[1], 32, seed=7)
    Y = X @ R.T
    rng = np.random.RandomState(0)
    i, j = rng.randint(0, len(X), 1000), rng.randint(0, len(X), 1000)
    m = i != j
    ratio = ((Y[i[m]] - Y[j[m]]) ** 2).sum(1) / ((X[i[m]] - X[j[m]]) ** 2).sum(1)
    assert np.abs(ratio - 1).mean() < 0.25
    # planted near-dups: noise at 1% of each vector's norm
    noise = rng.standard_normal((40, X.shape[1])).astype(np.float32)
    noise *= 0.01 * np.linalg.norm(X[:40], axis=1, keepdims=True) / np.sqrt(X.shape[1])
    dup = X[:40] + noise

    def cos(a, b):
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        return (an * bn).sum(1)

    assert cos(X[:40], dup).min() > 0.995
    assert cos(Y[:40], dup @ R.T).min() > 0.99


def test_chunking_boundary_token_counts(spark):
    """Every boundary of the window-start rule in one pass: n = 1,
    overlap, overlap+1, max, max+1, exact multiple of stride+overlap,
    and one past it.  Invariants: full coverage, budget respected,
    chunk i starts at token i*stride, last window contributes a new
    token (never fully contained in the previous one)."""
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.chunking import chunk_documents

    mx, ov = 8, 3  # stride 5
    ns = [1, 2, 3, 4, 8, 9, 13, 14, 18, 100]
    docs = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in ns],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=mx, overlap=ov)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r)
    stride = mx - ov
    for n in ns:
        chunks = sorted(got[n], key=lambda r: r.chunk_index)
        # expected number of windows: starts 0, stride, ... <= max(n-ov-1, 0)
        exp = len(range(0, max(n - ov - 1, 0) + 1, stride))
        assert len(chunks) == exp, (n, len(chunks), exp)
        seen = []
        for k, r in enumerate(chunks):
            toks = r.chunk.split()
            assert r.chunk_index == k
            assert toks[0] == f"w{k * stride}"          # start position
            assert len(toks) == min(mx, n - k * stride)  # budget + tail
            assert r.n_chunk_tokens == len(toks)
            seen.extend(toks[ov:] if k else toks)
        # dropping the overlap prefix of every non-first chunk
        # reconstructs the doc exactly — coverage with exact overlap
        assert seen == [f"w{i}" for i in range(n)]


def test_topk_batch_gemm_matches_exact(spark, sf_dir):
    """The GEMM scale path (per-batch numpy + map-side partial top-k)
    must select the same (query, rank) -> neighbor assignments as the
    exact JVM-fold path."""
    from fluvio_duck_spark.operators.similarity import cosine_topk_batch
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("label") == 0)
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk_batch(emb, qs, k=5).collect()
    }
    gemm = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk_batch(emb, qs, k=5, gemm=True).collect()
    }
    assert exact == gemm and len(exact) > 0


def test_weighted_sample_biases_toward_weight_and_is_layout_free(spark, sf_dir):
    from fluvio_duck_spark.operators.sampling import stratified_sample, weighted_key
    from fluvio_duck_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    draw = stratified_sample(
        docs, ["lang"], 50, weighted_key("doc_id", "n_chars", seed=3),
        tiebreak=["doc_id"],
    )
    # inclusion prob ∝ n_chars → the sampled mean must exceed the corpus
    # mean (a uniform draw would match it in expectation)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = draw.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean

    # pure function of the data: partition layout must not change the draw
    a = sorted(r.doc_id for r in draw.collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(
            docs.repartition(13), ["lang"], 50,
            weighted_key("doc_id", "n_chars", seed=3), tiebreak=["doc_id"],
        ).collect()
    )
    assert a == b


def test_ivf_batch_cell_pruning_and_single_query_consistency(spark, sf_dir):
    """Batch IVF: every returned neighbor shares the query's cell (the
    defined probe semantics), and for any one query the batch result is
    the single-query ``ivf_topk`` result.  (Recall vs exhaustive is the
    TRAINED-codebook question — test_kmeans.py; this fixture's ``label``
    column is not a similarity clustering.)"""
    from fluvio_duck_spark.operators.similarity import ivf_topk, ivf_topk_batch
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("label") == 0)
    got = ivf_topk_batch(emb, qs, k=5).collect()
    cells = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert got and all(cells[r.vec_id] == 0 for r in got)  # same-cell only
    one = min(r.query_id for r in got)
    batch_one = sorted(
        (r.rn, r.vec_id) for r in got if r.query_id == one
    )
    single = sorted(
        (i + 1, r.vec_id)
        for i, r in enumerate(ivf_topk(emb, query_id=one, k=5).collect())
    )
    assert [v for _, v in batch_one] == [v for _, v in single]


def test_unigram_oov_scores_smoothed_floor(spark):
    """Documents containing tokens absent from the fit corpus score them
    with the add-one unseen probability — lower than any in-vocab token,
    and the scorer never produces nulls."""
    import math

    from fluvio_duck_spark.operators.lm import unigram_fit, unigram_logprob_scores

    fit = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b b c")], "doc_id long, text string"
    )
    model, totals = unigram_fit(fit)
    score = spark.createDataFrame(
        [(10, "a a"), (11, "zzz qqq")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_scored_tokens, r.mean_logp)
        for r in unigram_logprob_scores(score, model, totals).collect()
    }
    # fit: 8 tokens, vocab 3 → p(a)=(4+1)/11, p(unseen)=1/11
    assert got[10][0] == 2 and math.isclose(got[10][1], math.log10(5 / 11), rel_tol=1e-9)
    assert got[11][0] == 2 and math.isclose(got[11][1], math.log10(1 / 11), rel_tol=1e-9)
    assert got[11][1] < got[10][1]


def test_upsample_repeat_integer_and_fractional_rates(spark):
    import math

    from fluvio_duck_spark.operators.sampling import upsample_repeat

    df = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    # integer rate: exactly 2 copies of every row, copy_idx 1..2
    doubled = upsample_repeat(df.withColumn("r", F.lit(2.0)), "r")
    assert doubled.count() == 800
    assert doubled.groupBy("doc_id").count().filter("count != 2").count() == 0
    # fractional rate 0.5: ~half survive, and the draw is deterministic
    half = upsample_repeat(df.withColumn("r", F.lit(0.5)), "r")
    n = half.count()
    assert abs(n - 200) < 40
    again = upsample_repeat(df.withColumn("r", F.lit(0.5)), "r")
    assert sorted(r.doc_id for r in half.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # rate 2.5: between 2 and 3 copies each, mean ≈ 2.5
    mixed = upsample_repeat(df.withColumn("r", F.lit(2.5)), "r")
    per = [r["count"] for r in mixed.groupBy("doc_id").count().collect()]
    assert set(per) <= {2, 3}
    assert math.isclose(sum(per) / len(per), 2.5, abs_tol=0.2)


def test_bigram_model_hand_computed(spark):
    import math

    from fluvio_duck_spark.operators.lm import bigram_fit, bigram_logprob_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b x")], "doc_id long, text string"
    )
    c2, c1, totals = bigram_fit(docs)
    model = {(r.w1, r.w2): r.c2 for r in c2.collect()}
    assert model == {("a", "b"): 3, ("b", "a"): 1, ("b", "x"): 1}
    assert {r.w1: r.c1 for r in c1.collect()} == {"a": 3, "b": 2}
    assert totals.first().vocab == 3
    got = {
        r.doc_id: (r.n_bigrams, r.mean_logp)
        for r in bigram_logprob_scores(docs, c2, c1, totals).collect()
    }
    # P(b|a) = (3+1)/(3+3), P(a|b) = (1+1)/(2+3), P(x|b) = (1+1)/(2+3)
    p_ab, p_ba = math.log10(4 / 6), math.log10(2 / 5)
    assert got[1][0] == 3 and abs(got[1][1] - (2 * p_ab + p_ba) / 3) < 1e-9
    assert got[2][0] == 2 and abs(got[2][1] - (p_ab + p_ba) / 2) < 1e-9


def test_knn_graph_block_count_invariant(emb):
    from fluvio_duck_spark.operators.similarity import knn_graph_blocked

    g4 = {(r.id, r.nbr) for r in knn_graph_blocked(emb, k=3, n_blocks=4).collect()}
    g8 = {(r.id, r.nbr) for r in knn_graph_blocked(emb, k=3, n_blocks=8).collect()}
    # the block decomposition must not change the selected neighbors
    assert g4 == g8
    # exactly k neighbors per node
    from collections import Counter
    per = Counter(i for i, _ in g8)
    assert set(per.values()) == {3}
    assert len(per) == emb.count()


def test_label_noise_flags_planted_outlier(spark):
    from fluvio_duck_spark.queries.llm import q_sim_label_noise  # noqa: F401
    from fluvio_duck_spark.operators.similarity import knn_graph_blocked

    # two tight clusters; one point of cluster B mislabeled as A
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.0, 0.01 * i], 0))
    for i in range(6, 12):
        rows.append((i, [0.0, 1.0, 0.01 * i], 1))
    rows.append((99, [0.0, 1.0, 0.03], 0))  # sits in cluster B, labeled A
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    g = knn_graph_blocked(emb, k=5, n_blocks=4)
    nbr = emb.selectExpr("vec_id as nbr", "label as nbr_label")
    votes = (
        g.join(nbr, "nbr").groupBy("id", "nbr_label").count()
        .filter("id = 99").collect()
    )
    by = {r.nbr_label: r["count"] for r in votes}
    assert by.get(1, 0) >= 3  # neighbors vote cluster B's label


def test_mmr_rerank_prefers_diversity(spark):
    from fluvio_duck_spark.operators.similarity import mmr_rerank

    # three near-identical candidates ~18 deg off the query (pairwise sim
    # ~1.0) and one alternative of almost-equal relevance in a different
    # plane (sim to clones ~0.89): plain top-3 keeps all three clones,
    # MMR's 0.3 penalty must swap the alternative in at step 2
    rows = [
        (100, [1.0, 0.0, 0.0], 9),
        (1, [0.9512, 0.3086, 0.0], 0),
        (2, [0.9511, 0.3088, 0.0], 0),
        (3, [0.9510, 0.3090, 0.0], 0),
        (4, [0.94, 0.0, 0.341], 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    out = mmr_rerank(
        emb, emb.filter("vec_id = 100"), k=3, n_candidates=4
    ).collect()
    picked = [r.vec_id for r in sorted(out, key=lambda r: r.sel_rank)]
    assert picked[0] == 1            # relevance still wins first
    assert 4 in picked               # diversity pulls in the alternative
    assert len(set(picked)) == 3


def test_substring_span_dedup_unaligned_and_within_doc_safe(spark):
    from fluvio_duck_spark.operators.dedup import substring_span_dedup

    # span "q r s" duplicates across docs 1 and 2 at DIFFERENT offsets →
    # removed from both; doc 3 repeats a span only within itself → kept
    # (cross-document frequency, not raw frequency)
    df = spark.createDataFrame(
        [
            (1, "a b q r s c d"),
            (2, "x q r s y z w"),
            (3, "m n o m n o p"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens_kept, r.clean_text)
        for r in substring_span_dedup(df, min_span=3).collect()
    }
    assert got[1] == (4, "a b c d")
    assert got[2] == (4, "x y z w")
    assert got[3] == (7, "m n o m n o p")


def test_label_propagation_densifies_and_freezes_seeds(spark, sf_dir):
    """Seeds keep their exact label; the labeled fraction must grow
    (2 propagation rounds over a 5-NN graph reach most of a 500-point
    corpus from a 25% seed set); propagated labels come only from the
    label vocabulary."""
    from fluvio_duck_spark.queries.llm import q_sim_label_propagation

    rows = q_sim_label_propagation(spark, sf_dir).collect()
    seeds = [r for r in rows if r.is_seed]
    assert all(r.label_prop == r.own_label for r in seeds)
    labeled = [r for r in rows if r.label_prop is not None]
    assert len(labeled) > len(seeds)  # propagation actually happened
    vocab = {r.own_label for r in rows}
    assert {r.label_prop for r in labeled} <= vocab


def test_bpe_fit_classic_corpus(spark):
    """Sennrich et al.'s canonical example: es, est, lo, low come out in
    order with the right weighted counts."""
    from fluvio_duck_spark.operators.bpe import bpe_fit

    docs = spark.createDataFrame(
        [("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest",)],
        "text string",
    )
    got = [(r.round, r.sym_a, r.sym_b, r.pair_count)
           for r in bpe_fit(docs, n_merges=4).collect()]
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] — the freshly
    merged symbol never chains into the same round's next position."""
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.bpe import _apply_merge

    df = spark.createDataFrame([("aaaa",), ("aaa",), ("a",)], "w string")
    got = {
        r.w: r.m
        for r in df.select(
            "w",
            _apply_merge(F.split("w", ""), F.lit("a"), F.lit("a")).alias("m"),
        ).collect()
    }
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"], "a": ["a"]}


def test_bpe_fit_layout_independent(spark, sf_dir):
    """Same merges from 1 and 7 input partitions (argmax tie-break and
    fold are partitioning-free)."""
    from fluvio_duck_spark.operators.bpe import bpe_fit
    from fluvio_duck_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    a = bpe_fit(docs.repartition(1), n_merges=3).collect()
    b = bpe_fit(docs.repartition(7), n_merges=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_encode_matches_reference_greedy_encoder(spark):
    """Encode under known merges equals a per-word Python reference that
    applies each merge exhaustively left-to-right — including the
    boundary traps: a merge pair whose 'b' symbol starts another symbol
    ('ab'+'y' vs the 'b y' substring inside 'ab  y') and chained
    adjacent matches ('abab' must become [ab, ab] in ONE pass)."""
    from fluvio_duck_spark.operators.bpe import bpe_encode_tokens

    merges = [("a", "b"), ("ab", "y"), ("ab", "ab")]

    def ref_encode(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = ["abab", "aby", "abyab", "bab", "aab", "ababab", "y", "ba"]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "abab abab"), (3, "xyz")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_tokens(docs, merges).collect()
    }
    want1 = sum(len(ref_encode(w)) for w in words)
    assert got == {
        1: (len(words), want1),
        2: (2, 2 * len(ref_encode("abab"))),
        3: (1, len(ref_encode("xyz"))),
    }


def test_jaccard_prefix_filter_equals_unbounded_exact(docs):
    """Prefix filtering is a pruning, not an approximation: pairs and
    jaccard values must equal the unbounded inverted-index join on the
    real corpus."""
    from fluvio_duck_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    want = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(docs, k=5, threshold=0.8).collect()
    }
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs_prefix(
            docs, k=5, threshold_num=4, threshold_den=5
        ).collect()
    }
    assert got == want and len(got) > 0


def test_jaccard_prefix_integer_ceil_boundary(spark):
    """Boundary cases around t = 4/5 on 5-shingle sets: identical sets
    pair (J=1), a superset at J = 5/6 pairs, and a 4-of-5 overlap
    (J = 4/6) must NOT — binary-float ceil(0.8*5) = 5 (0.8*5 rounds to
    4.0000000000000002) would shrink the prefix to length 1 and risk
    dropping true pairs; the rational form keeps
    n - ceil(4n/5) + 1 = 2 at n = 5."""
    from fluvio_duck_spark.operators.dedup import ngram_jaccard_pairs_prefix

    w = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 9 tokens -> 5 shingles (k=5)
    docs = spark.createDataFrame(
        [
            (1, w),
            (2, w),
            (3, w + " DIFFERENT"),       # 6 shingles, shares 5: J=5/6
            (4, "w1 w2 w3 w4 w5 w6 w7 w8 CHANGED"),  # shares 4: J=4/6
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs_prefix(docs, k=5).collect()
    }
    assert got == {
        (1, 2): 1.0,
        (1, 3): round(5 / 6, 9),
        (2, 3): round(5 / 6, 9),
    }


def test_dsir_weights_rank_target_slice_higher(docs):
    """The target slice (lang='en') must average a higher DSIR log
    weight than the complement — the defining property of the
    importance weight — and the weights must be layout-independent."""
    from fluvio_duck_spark.operators.dsir import dsir_logweights

    w = dsir_logweights(docs, F.col("lang") == "en")
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    rows = j.groupBy(F.col("lang") == "en").agg(
        F.avg("dsir_logweight").alias("m")
    ).collect()
    means = {r[0]: r.m for r in rows}
    assert means[True] > means[False]

    a = sorted(tuple(r) for r in w.collect())
    b = sorted(
        tuple(r)
        for r in dsir_logweights(
            docs.repartition(13), F.col("lang") == "en"
        ).collect()
    )
    assert a == b


def test_dsir_lambda_null_predicate_rows_are_nontarget(spark):
    """A NULL target predicate means non-target (SQL WHERE semantics).
    Regression (ADVICE r10): ``target_pred.cast("long")`` propagated
    NULL, so a bucket whose bigrams all came from NULL-predicate rows
    got ct = NULL → λ = NULL, silently poisoning downstream score
    joins.  Pin: no NULL λ, and the fit equals the filter-as-false
    fit."""
    from fluvio_duck_spark.operators.dsir import dsir_lambda

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en"),
            (2, "alpha beta gamma delta", None),
            (3, "zulu yankee xray whiskey victor", None),
            (4, "uniform tango sierra romeo quebec", "fr"),
        ],
        "doc_id int, text string, lang string",
    )
    lam = dsir_lambda(docs, F.col("lang") == "en", n_buckets=64)
    assert lam.filter(F.col("lam").isNull()).count() == 0
    explicit = dsir_lambda(
        docs, F.coalesce(F.col("lang") == "en", F.lit(False)), n_buckets=64
    )
    got = sorted((r.bucket, round(r.lam, 12)) for r in lam.collect())
    want = sorted((r.bucket, round(r.lam, 12)) for r in explicit.collect())
    assert got == want


def test_binary_hamming_recall_vs_exact(emb):
    """1-bit quantization keeps enough signal on the fixture: recall@10
    of the Hamming-candidates + cosine-rerank pipeline vs the exact
    cosine top-10, plus exactness of the rerank stage (sims of returned
    ids equal their exact cosine values)."""
    from fluvio_duck_spark.operators.similarity import (
        binary_hamming_topk,
        cosine_topk,
    )

    exact = {r.vec_id: r.sim for r in cosine_topk(emb, query_id=0, k=10).collect()}
    got = {r.vec_id: r.sim
           for r in binary_hamming_topk(emb, query_id=0, k=10).collect()}
    recall = len(exact.keys() & got.keys()) / 10
    assert recall >= 0.5, recall
    for vid in exact.keys() & got.keys():
        assert abs(exact[vid] - got[vid]) < 1e-12


def test_pack_sign_bits_exact_words(spark):
    """Known sign pattern packs to the expected words; all-negative
    packs to 0 and all-positive to 2^32-1."""
    from fluvio_duck_spark.operators.similarity import pack_sign_bits

    neg, pos = [-1.0] * 64, [1.0] * 64
    mixed = [1.0 if i % 3 == 0 else -1.0 for i in range(64)]
    want_lo = sum(1 << i for i in range(32) if i % 3 == 0)
    want_hi = sum(1 << (i - 32) for i in range(32, 64) if i % 3 == 0)
    df = spark.createDataFrame(
        [(1, neg), (2, pos), (3, mixed)], "vec_id long, v array<double>"
    )
    got = {
        r.vec_id: (r.w1, r.w2)
        for r in df.select(
            "vec_id",
            pack_sign_bits(F.col("v"), 1, 32).alias("w1"),
            pack_sign_bits(F.col("v"), 33, 64).alias("w2"),
        ).collect()
    }
    assert got == {1: (0, 0), 2: (2**32 - 1, 2**32 - 1),
                   3: (want_lo, want_hi)}


def test_minhash_portable_matches_exact_pairs(docs, exact_pairs):
    """The portable-hash chain must behave like a MinHash: on the
    fixture's planted near-dups (J mostly ~1) the banding curve gives
    ~full recall, and verification removes all false positives — so the
    output equals the exact pair set, like the xxhash64 form."""
    from fluvio_duck_spark.operators.dedup import minhash_lsh_pairs_portable

    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs_portable(docs).collect()
    }
    assert got <= exact_pairs  # no false positives, ever
    assert len(got) >= int(0.9 * len(exact_pairs))  # banding recall


def test_simhash_portable_no_python_and_finds_near_dups(docs, exact_pairs):
    """The JVM-only SimHash twin must find most planted near-dups (its
    pairs overlap the exact-Jaccard set heavily at hamming<=3) and its
    executed plan must contain NO Python passes."""
    from fluvio_duck_spark.operators.dedup import (
        simhash_near_dup_pairs_portable,
    )
    from fluvio_duck_spark.plans import assert_plan

    df = simhash_near_dup_pairs_portable(docs, max_hamming=3)
    df.write.format("noop").mode("overwrite").save()
    assert_plan(df, ArrowEvalPython=0, BatchEvalPython=0)
    got = {(r.doc_a, r.doc_b) for r in df.collect()}
    assert len(got & exact_pairs) >= len(exact_pairs) // 2


def test_span_corruption_plan_contract(docs):
    """Mask stats are internally consistent (spans*len bounds, flips
    counted right), the corpus-level density is near start_pct*span_len,
    the plan is resample-stable (per-doc mask independent of other docs)
    and map-only."""
    from fluvio_duck_spark.operators.chunking import span_corruption_plan
    from fluvio_duck_spark.plans import assert_plan

    df = span_corruption_plan(docs)
    df.write.format("noop").mode("overwrite").save()
    assert_plan(df, Exchange=0, ArrowEvalPython=0, BatchEvalPython=0)
    rows = df.collect()
    for r in rows:
        assert 0 <= r.n_masked <= r.n_tokens
        # each merged span covers >= 1 token (overlapping starts merge
        # into runs LONGER than span_len, so there is no *3 upper bound)
        assert r.n_spans <= r.n_masked
    total = sum(r.n_tokens for r in rows)
    masked = sum(r.n_masked for r in rows)
    assert 0.08 <= masked / total <= 0.25  # ~15% expected

    # resample stability: the plan for a subset equals the full plan's
    # rows for those docs (hash depends only on (doc_id, position))
    sub = span_corruption_plan(docs.filter("doc_id < 100")).collect()
    full = {r.doc_id: (r.n_spans, r.n_masked) for r in rows}
    assert all(full[r.doc_id] == (r.n_spans, r.n_masked) for r in sub)


def test_containment_prefix_equals_unbounded_exact(docs):
    """Containment prefix filtering is a pruning, not an approximation:
    ordered pairs and values must equal the unbounded inverted-index
    join on the real corpus."""
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.dedup import (
        _exploded_shingles,
        ngram_containment_pairs_prefix,
    )

    sh = _exploded_shingles(docs, "text", "doc_id", 5, None)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    unbounded = (
        a.join(b, "s")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n").alias("na")), "doc_a")
        .filter(F.lit(10) * F.col("c") >= F.lit(9) * F.col("na"))
    )
    want = {
        (r.doc_a, r.doc_b): round(r.c / r.na, 9) for r in unbounded.collect()
    }
    got = {
        (r.doc_a, r.doc_b): round(r.containment, 9)
        for r in ngram_containment_pairs_prefix(
            docs, k=5, threshold_num=9, threshold_den=10
        ).collect()
    }
    assert got == want and len(got) > 0


def test_containment_is_asymmetric_where_jaccard_fails(spark):
    """A short doc fully inside a much longer one: containment 1.0 one
    way, below threshold the other way, and Jaccard would miss the pair
    entirely at the same threshold."""
    from fluvio_duck_spark.operators.dedup import (
        ngram_containment_pairs_prefix,
        ngram_jaccard_pairs,
    )

    quote = "w1 w2 w3 w4 w5 w6 w7 w8 w9"            # 5 shingles (k=5)
    container = quote + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11"  # 16 shingles
    docs = spark.createDataFrame(
        [(1, quote), (2, container)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): round(r.containment, 9)
        for r in ngram_containment_pairs_prefix(
            docs, k=5, threshold_num=9, threshold_den=10
        ).collect()
    }
    assert got == {(1, 2): 1.0}  # contained direction only
    jac = ngram_jaccard_pairs(docs, k=5, threshold=0.8).collect()
    assert jac == []  # J = 5/16 — symmetric threshold misses the dup


def test_keep_drop_manifest_planted_reasons(spark, tmp_path, sf_dir):
    """Planted corpus hits every branch in priority order: a byte-dup
    (exact_dup beats containment), a quote inside a long doc
    (contained), a stopword-free word-soup (low_quality), and a fluent
    original (keep)."""
    import os

    from pyspark.sql import functions as F

    from fluvio_duck_spark.queries.llm import q_keep_drop_manifest

    fluent = ("the quick brown fox and the lazy dog sat in the sun and "
              "it is a tale of the calm morning to enjoy in peace")
    soup = " ".join(f"tok{i}" for i in range(40))
    quote = " ".join(fluent.split()[:12])
    rows = [
        (0, fluent, "en", "s0", len(fluent)),
        (1, fluent, "en", "s0", len(fluent)),          # byte-dup of 0
        (2, quote, "en", "s0", len(quote)),            # contained in 0
        (3, soup, "en", "s0", len(soup)),              # low quality
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "kd")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r.reason for r in q_keep_drop_manifest(spark, d).collect()}
    assert got[1] == "exact_dup"       # priority over mutual containment
    assert got[2] == "contained"
    assert got[3] == "low_quality"
    assert got[0] == "keep"
