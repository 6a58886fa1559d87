"""Semantics tests for the event-analytics / pipeline operators
(operators/events.py, robust_scale_grouped, group_centroids) on
constructed inputs where the expected answer is hand-checkable; the
oracle hash parity runs via scripts/verify_local.py and the driver gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_funnel_requires_strict_order(spark):
    from fluvio_duck_spark.operators.events import funnel_stages

    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 10:00:00", "view", 1, 0.0),
        (1, "2024-01-01 10:01:00", "click", 2, 0.0),
        (1, "2024-01-01 10:02:00", "purchase", 3, 0.0),
        # user 2: purchase BEFORE click — must not count at stage 3
        (2, "2024-01-02 10:00:00", "view", 4, 0.0),
        (2, "2024-01-02 10:00:30", "purchase", 5, 0.0),
        (2, "2024-01-02 10:01:00", "click", 6, 0.0),
        # user 3: click only (no view) — counts nowhere
        (3, "2024-01-03 09:00:00", "click", 7, 0.0),
    ]
    ev = spark.createDataFrame(
        [(u, ts, t, i, v) for u, ts, t, i, v in rows],
        "user_id long, ts string, event_type string, event_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = funnel_stages(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    got = {r.stage: r.users for r in out.collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_cdc_apply_insert_update_delete_passthrough(spark):
    from fluvio_duck_spark.operators.events import cdc_apply

    snapshot = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [
            # key 2: two updates — later one wins
            (2, 1, 1, "upsert", 21.0),
            (2, 2, 2, "upsert", 22.0),
            # key 3: deleted
            (3, 1, 3, "delete", 0.0),
            # key 4: pure insert
            (4, 1, 4, "upsert", 40.0),
            # key 5: inserted then deleted within the feed — never appears
            (5, 1, 5, "upsert", 50.0),
            (5, 2, 6, "delete", 0.0),
        ],
        "k long, ts long, eid long, op string, v double",
    )
    out = cdc_apply(
        snapshot, changes, key_col="k", ts_col="ts", op_col="op",
        val_cols=["v"], tiebreak_col="eid",
    )
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: 10.0, 2: 22.0, 4: 40.0}


def test_cdc_apply_tiebreak_on_equal_ts(spark):
    from fluvio_duck_spark.operators.events import cdc_apply

    snapshot = spark.createDataFrame([(1, 0.0)], "k long, v double")
    changes = spark.createDataFrame(
        [(1, 5, 1, "upsert", 1.0), (1, 5, 2, "upsert", 2.0)],
        "k long, ts long, eid long, op string, v double",
    )
    out = cdc_apply(snapshot, changes, "k", "ts", "op", ["v"], tiebreak_col="eid")
    assert out.collect()[0].v == 2.0


def test_robust_scale_zero_iqr_is_null(spark):
    from fluvio_duck_spark.operators.grouped import robust_scale_grouped

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0),
         (4, "b", 0.0), (5, "b", 10.0), (6, "b", 20.0)],
        "id long, k string, x double",
    )
    out = {r.id: r.scaled for r in robust_scale_grouped(df, "k", "x", "id").collect()}
    assert out[1] is None and out[2] is None and out[3] is None
    # group b: median 10, IQR = 15 - 5 = 10
    assert out[4] == -1.0 and out[5] == 0.0 and out[6] == 1.0


def test_group_centroids_known_vectors(spark):
    from fluvio_duck_spark.operators.similarity import group_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.0, 1.0]), (1, [2.0, 2.0])],
        "label int, embedding array<float>",
    )
    out = group_centroids(df, "label", "embedding")
    got = {(r.label, r.embedding_pos): r.centroid for r in out.collect()}
    assert got == {(0, 0): 0.5, (0, 1): 0.5, (1, 0): 2.0, (1, 1): 2.0}


def test_source_cap_plan_uses_window_group_limit(spark, sf_dir):
    """The per-source quota must compile to WindowGroupLimit (per-task
    k-heap before the shuffle), not a full sort of the corpus."""
    from fluvio_duck_spark.queries.pipeline import q_curate_source_cap

    plan = q_curate_source_cap(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_cohort_offsets_are_weekly_multiples(spark, sf_dir):
    from fluvio_duck_spark.operators.events import cohort_retention
    from fluvio_duck_spark.sources.tables import load

    out = cohort_retention(load(spark, sf_dir, "events"), "user_id", "ts")
    rows = out.collect()
    assert all(r.week_offset >= 0 for r in rows)
    # offset 0 must exist: every user is active in their own cohort week
    assert any(r.week_offset == 0 for r in rows)


def test_gapfill_produces_dense_grid(spark):
    from fluvio_duck_spark.operators.timeseries import calendar_gapfill

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00"), ("a", "2024-01-01 03:20:00"),
         ("b", "2024-01-01 01:00:00")],
        "k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = calendar_gapfill(df, "k", "ts", step="1 hour").collect()
    # span is hours 00..03 → 4 buckets × 2 keys = 8 dense rows
    assert len(out) == 8
    got = {(r.k, r.bucket.hour): r.n for r in out}
    assert got[("a", 0)] == 1 and got[("a", 3)] == 1
    assert got[("a", 1)] == 0 and got[("a", 2)] == 0  # filled gaps
    assert got[("b", 1)] == 1 and got[("b", 0)] == 0


def test_locf_carries_forward_and_leads_null(spark):
    from fluvio_duck_spark.operators.timeseries import locf_fill

    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, 5.0), (1, 3, None), (1, 4, 7.0), (1, 5, None),
         (2, 1, None)],
        "k long, ts long, x double",
    )
    out = locf_fill(df, "k", "ts", "x", out_col="y")
    got = {(r.k, r.ts): r.y for r in out.collect()}
    assert got[(1, 1)] is None          # before first observation
    assert got[(1, 3)] == 5.0           # carried forward
    assert got[(1, 5)] == 7.0           # latest wins
    assert got[(2, 1)] is None          # keys never observed stay null


def test_edit_distance_blocking_matches_bruteforce(spark):
    """Deletion-neighborhood candidates must find EVERY true pair — the
    SymSpell invariant, checked against an in-memory brute force."""
    import itertools

    from fluvio_duck_spark.operators.dedup import edit_distance_pairs

    words = ["part", "past", "pat", "spark", "sort", "sore", "store",
             "agg", "egg", "big", "bag", "bat", "row", "slow", "snow"]

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[n]

    expected = {
        (a, b) for a, b in itertools.combinations(sorted(words), 2)
        if lev(a, b) <= 2
    }
    v = spark.createDataFrame([(w,) for w in words], "token string")
    got = {
        (r.token_a, r.token_b)
        for r in edit_distance_pairs(v, max_dist=2).collect()
    }
    assert got == expected


def test_new_pipeline_plan_shapes(spark, sf_dir):
    """SCALE.md contracts for the round-2 pipeline queries: centroids and
    LOCF are single-shuffle; robust scale joins group stats without a
    second data shuffle; CDC's latest-change is an aggregation (no
    row_number window over the change history)."""
    from fluvio_duck_spark.plans import assert_plan
    from fluvio_duck_spark.queries.pipeline import (
        q_cdc_apply_latest,
        q_grouped_robust_scale,
        q_sim_group_centroids,
        q_window_locf_fill,
    )

    def run(fn):
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return df

    assert_plan(run(q_sim_group_centroids), Exchange=1)
    assert_plan(run(q_window_locf_fill), Exchange=1, Window=1)
    assert_plan(run(q_grouped_robust_scale), Exchange=1, SortMergeJoin=0)
    ops = assert_plan(run(q_cdc_apply_latest), Exchange=2, Window=0)
    assert ops.get("SortMergeJoin", 0) == 1  # full outer cannot broadcast


def test_pagerank_star_graph(spark):
    from fluvio_duck_spark.operators.graph import pagerank

    # undirected star: hub 0 ↔ leaves 1..4
    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    out = pagerank(edges, iters=10)
    ranks = {r.node: r.rank for r in out.collect()}
    assert len(ranks) == 5
    hub = ranks[0]
    leaves = [ranks[i] for i in range(1, 5)]
    assert all(hub > l for l in leaves)        # hub dominates
    assert len(set(leaves)) == 1               # symmetry
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # no dangling mass lost


def test_pagerank_checkpoint_invariance(spark):
    from fluvio_duck_spark.operators.graph import pagerank

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    a = {r.node: r.rank for r in pagerank(edges, iters=4, checkpoint=True).collect()}
    b = {r.node: r.rank for r in pagerank(edges, iters=4, checkpoint=False).collect()}
    assert a == b


def test_triangle_counts_k4_messy_input(spark):
    from fluvio_duck_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3 of them) given as a
    # messy edge list: mixed orientations, duplicates, a self-loop, and
    # a pendant node 5 that closes nothing
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(1, 2), (3, 3), (4, 5)]
    edges = spark.createDataFrame(noisy, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # node 5 in no triangle


def test_profile_columns_single_pass_and_nulls(spark):
    from fluvio_duck_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, s string"
    )
    out = {r.col_name: r for r in profile_columns(df, ["id", "s"]).collect()}
    assert out["id"].n_null == 0 and out["id"].n_distinct == 4
    assert out["id"].min_val == "1" and out["id"].max_val == "4"
    assert out["s"].n_null == 1 and out["s"].n_distinct == 2
    assert out["s"].n_rows == 4
    # one corpus pass: a single scan feeds every metric
    plan = profile_columns(df, ["id", "s"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_funnel_randomized_parity_vs_python_reference(spark):
    """Seeded random event logs; every user is an independent scenario,
    so one Spark run checks hundreds of cases against a pure-Python
    first-touch funnel walk."""
    import random

    from fluvio_duck_spark.operators.events import funnel_stages

    rng = random.Random(42)
    stages = ["view", "click", "purchase"]
    types = stages + ["error", "signup"]
    rows = []
    eid = 0
    for user in range(300):
        for _ in range(rng.randint(0, 12)):
            eid += 1
            rows.append((user, rng.randint(0, 50), types[rng.randrange(len(types))], eid))

    def reference():
        counts = [0, 0, 0]
        by_user = {}
        for u, ts, t, e in rows:
            by_user.setdefault(u, []).append((ts, e, t))
        for evs in by_user.values():
            evs.sort()
            anchor, stage_i = None, 0
            for ts, _e, t in evs:
                if stage_i >= len(stages):
                    break
                if t == stages[stage_i] and (anchor is None or ts > anchor):
                    anchor = ts
                    counts[stage_i] += 1
                    stage_i += 1
            # note: anchor advances only on the first qualifying event per
            # stage — identical to the operator's min-ts semantics
        return counts

    ev = spark.createDataFrame(
        [(u, ts, t, e) for u, ts, t, e in rows],
        "user_id long, ts long, event_type string, event_id long",
    )
    out = funnel_stages(ev, "user_id", "ts", "event_type", stages)
    got = {r.stage: r.users for r in out.collect()}
    exp = reference()
    assert [got.get(i + 1, 0) for i in range(3)] == exp


def test_cdc_randomized_parity_vs_python_reference(spark):
    import random

    from fluvio_duck_spark.operators.events import cdc_apply

    rng = random.Random(7)
    snap_rows = [(k, float(rng.randint(0, 99))) for k in range(200) if rng.random() < 0.7]
    change_rows = []
    eid = 0
    for k in range(250):
        for _ in range(rng.randint(0, 4)):
            eid += 1
            change_rows.append(
                (k, rng.randint(0, 9), eid,
                 "delete" if rng.random() < 0.3 else "upsert",
                 float(rng.randint(100, 199)))
            )

    def reference():
        state = dict(snap_rows)
        latest = {}
        for k, ts, e, op, v in change_rows:
            cur = latest.get(k)
            if cur is None or (ts, e) > (cur[0], cur[1]):
                latest[k] = (ts, e, op, v)
        for k, (_ts, _e, op, v) in latest.items():
            if op == "delete":
                state.pop(k, None)
            else:
                state[k] = v
        return state

    snapshot = spark.createDataFrame(snap_rows, "k long, v double")
    changes = spark.createDataFrame(
        change_rows, "k long, ts long, eid long, op string, v double"
    )
    out = cdc_apply(snapshot, changes, "k", "ts", "op", ["v"], tiebreak_col="eid")
    got = {r.k: r.v for r in out.collect()}
    assert got == reference()


def test_gapfill_generic_step_aligns_grid(spark):
    """Non-hour steps bucket on the epoch-aligned step grid; observed
    counts must never fall off the spine (regression: a bare
    interval→long cast yields the interval's own unit, bucketing on a
    15-second grid against a 15-minute spine)."""
    from fluvio_duck_spark.operators.timeseries import calendar_gapfill

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:05:23"), ("a", "2024-01-01 00:52:41")],
        "k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = calendar_gapfill(df, "k", "ts", step="15 minutes").collect()
    assert len(rows) == 4  # 00:00 .. 00:45
    assert sum(r.n for r in rows) == 2
    assert all(r.bucket.minute % 15 == 0 and r.bucket.second == 0 for r in rows)


def test_edit_distance_max_dist_1_matches_bruteforce(spark):
    import itertools

    from fluvio_duck_spark.operators.dedup import edit_distance_pairs

    words = ["part", "past", "pat", "parts", "art", "cart", "dart", "par"]
    v = spark.createDataFrame([(w,) for w in words], "token string")
    got = {(r.token_a, r.token_b) for r in edit_distance_pairs(v, max_dist=1).collect()}

    def lev1(a, b):
        if abs(len(a) - len(b)) > 1:
            return False
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) == 1
        s, l = (a, b) if len(a) < len(b) else (b, a)
        for i in range(len(l)):
            if l[:i] + l[i + 1:] == s:
                return True
        return False

    exp = {(a, b) for a, b in itertools.combinations(sorted(words), 2) if lev1(a, b)}
    assert got == exp


def test_events_demo_end_to_end(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from demo_events import analyze

    out = analyze(spark, sf_dir)
    funnel = {r.stage: r.users for r in out["funnel"].collect()}
    assert funnel[1] >= funnel[2] >= funnel[3]  # funnel only narrows
    assert out["profile"].count() == 5
    # CDC state: one row per surviving user, value column present
    state = out["state"]
    assert state.columns == ["user_id", "value"]
    assert state.groupBy("user_id").count().filter("count > 1").count() == 0
    # dashboard grid is dense: #types × #hours
    n_types = out["dashboard"].select("event_type").distinct().count()
    n_buckets = out["dashboard"].select("bucket").distinct().count()
    assert out["dashboard"].count() == n_types * n_buckets


def test_psi_zero_when_distributions_identical(spark):
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.drift import psi_by_group

    # same values in both windows → PSI must be exactly 0
    rows = [("a", 1, float(v)) for v in (5, 15, 25, 35)] + \
           [("a", 2, float(v)) for v in (5, 15, 25, 35)]
    df = spark.createDataFrame(rows, "g string, w int, v double")
    out = psi_by_group(
        df, "g", "v",
        expected_pred=F.col("w") == 1,
        actual_pred=F.col("w") == 2,
        bin_width=10.0, n_bins=5,
    ).collect()
    assert out[0].psi == 0.0


def test_psi_positive_on_shift_and_corpus_single_pass(spark):
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.drift import psi_by_group

    rows = [("a", 1, 5.0)] * 50 + [("a", 2, 45.0)] * 50  # total shift
    df = spark.createDataFrame(rows, "g string, w int, v double")
    out = psi_by_group(
        df, "g", "v",
        expected_pred=F.col("w") == 1,
        actual_pred=F.col("w") == 2,
        bin_width=10.0, n_bins=5,
    )
    assert out.collect()[0].psi > 0.25  # "shifted" by the conventional read


def test_psi_query_scans_corpus_twice_only(spark, sf_dir):
    """Counts pass + spine-keys distinct — never a rescan per window."""
    from fluvio_duck_spark.queries.pipeline import q_drift_psi_by_type

    df = q_drift_psi_by_type(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2


def test_operators_on_empty_and_degenerate_inputs(spark):
    """Edge contracts: empty feeds, single rows, all-delete feeds."""
    from fluvio_duck_spark.operators.events import cdc_apply, funnel_stages
    from fluvio_duck_spark.operators.timeseries import calendar_gapfill, locf_fill

    empty_ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string, event_id long")
    out = funnel_stages(empty_ev, "user_id", "ts", "event_type", ["view", "click"])
    assert {r.users for r in out.collect()} == {0}  # 0-count row per stage

    snap = spark.createDataFrame([(1, 1.0)], "k long, v double")
    no_changes = spark.createDataFrame([], "k long, ts long, op string, v double")
    got = cdc_apply(snap, no_changes, "k", "ts", "op", ["v"]).collect()
    assert [(r.k, r.v) for r in got] == [(1, 1.0)]  # passthrough

    all_delete = spark.createDataFrame([(1, 5, "delete", 0.0)],
                                       "k long, ts long, op string, v double")
    assert cdc_apply(snap, all_delete, "k", "ts", "op", ["v"]).count() == 0

    one = spark.createDataFrame([("a", "2024-01-01 10:30:00")], "k string, ts string") \
        .selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    rows = calendar_gapfill(one, "k", "ts").collect()
    assert len(rows) == 1 and rows[0].n == 1  # single-bucket span

    single = spark.createDataFrame([(1, 1, None)], "k long, ts long, x double")
    assert locf_fill(single, "k", "ts", "x", out_col="y").collect()[0].y is None


def test_negative_samples_label_disjoint_and_deterministic(spark, sf_dir):
    from fluvio_duck_spark.operators.sampling import negative_samples
    from fluvio_duck_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    out = negative_samples(emb, "vec_id", "label", k=4, seed=0)
    joined = (
        out.join(emb.withColumnRenamed("vec_id", "neg_id")
                    .withColumnRenamed("label", "neg_label"), "neg_id")
        .join(emb, "vec_id")
    )
    # every negative has a different label than its anchor, never itself
    assert joined.filter("label = neg_label OR vec_id = neg_id").count() == 0
    # at most k per anchor
    assert out.groupBy("vec_id").count().filter("count > 4").count() == 0
    # run-to-run determinism (different partitioning)
    again = negative_samples(emb.repartition(7), "vec_id", "label", k=4, seed=0)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # a different seed draws a different permutation
    other = negative_samples(emb, "vec_id", "label", k=4, seed=3)
    assert {tuple(r) for r in out.collect()} != {tuple(r) for r in other.collect()}


def test_hard_negatives_mask_beats_post_filter(spark):
    """Construct a corpus where a query's nearest rows all share its
    label: an unmasked partial top-k + post-filter would starve it;
    the masked path must still return the true different-label top-k."""
    from fluvio_duck_spark.operators.similarity import hard_negatives

    rows = [(0, [1.0, 0.0, 0.0], 0)]
    # 20 same-label rows nearly identical to the query
    rows += [(i, [1.0, 0.001 * i, 0.0], 0) for i in range(1, 21)]
    # two different-label rows, farther away
    rows += [(100, [0.8, 0.6, 0.0], 1), (101, [0.0, 1.0, 0.0], 2)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negatives(emb, emb.filter("vec_id = 0"), k=2)
    got = [(r.vec_id, r.rn) for r in out.orderBy("rn").collect()]
    assert got == [(100, 1), (101, 2)]


def test_gemm_query_side_collect_is_guarded(spark):
    """The GEMM batch path collects the query set to the driver — that is
    only safe when queries ≪ corpus.  Passing a corpus-sized query side
    must raise (naming knn_graph_blocked) instead of OOMing the driver;
    raising the bound explicitly re-enables the collect."""
    import pytest

    from fluvio_duck_spark.operators.similarity import (
        cosine_topk_batch,
        hard_negatives,
    )

    rows = [(i, [1.0, float(i % 7), 0.5], i % 3) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError, match="knn_graph_blocked"):
        cosine_topk_batch(emb, emb, k=2, gemm=True, max_query_rows=10)
    with pytest.raises(ValueError, match="max_query_rows"):
        hard_negatives(emb, emb, k=2, max_query_rows=10)
    # raising the bound restores the documented behavior
    ok = cosine_topk_batch(emb, emb.limit(12), k=2, gemm=True, max_query_rows=12)
    assert ok.count() > 0


def test_observation_metrics_ride_the_query(spark, sf_dir):
    """Spark's Observation API: data-quality counters collected DURING a
    query's single pass (no second scan) — the in-flight form of the
    profile gate.  Metrics must agree with independently computed values."""
    from pyspark.sql import Observation

    from fluvio_duck_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    obs = Observation("quality")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.min("ts").alias("min_ts"),
    )
    out = observed.groupBy("event_type").count()
    out.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["n_null_value"] == 0
    assert got["min_ts"] == ev.agg(F.min("ts")).collect()[0][0]


def test_more_pipeline_plan_contracts(spark, sf_dir):
    """Remaining SCALE.md rows for the round-2 set, enforced."""
    from fluvio_duck_spark.plans import assert_plan
    from fluvio_duck_spark.queries.pipeline import (
        q_funnel_conversion,
        q_rollup_gapfill_hourly,
        q_sample_negatives,
    )

    def run(fn):
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return df

    # funnel: shuffles only on the user key per stage; joins all broadcast
    ops = assert_plan(run(q_funnel_conversion), SortMergeJoin=0)
    assert ops.get("Exchange", 0) <= 8
    # gap fill: the 1-row span crossJoin is the only nested loop
    ops = assert_plan(run(q_rollup_gapfill_hourly), SortMergeJoin=0)
    assert ops.get("BroadcastNestedLoopJoin", 0) <= 1
    # negative sampling: candidate join + k-bounded window, nothing else
    ops = assert_plan(run(q_sample_negatives), SortMergeJoin=0)
    assert "WindowGroupLimit" in str(ops) or ops.get("Window", 0) == 1


def test_compression_ratio_separates_boilerplate_from_prose(spark):
    from fluvio_duck_spark.functions.text import compression_ratio_udf

    import random
    rng = random.Random(1)
    repetitive = "buy now click here " * 200
    diverse = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
        for _ in range(600)
    )
    df = spark.createDataFrame(
        [(1, repetitive), (2, diverse), (3, None), (4, "")],
        "doc_id long, text string",
    )
    ratio = compression_ratio_udf()
    got = {r.doc_id: r.r for r in df.select("doc_id", ratio("text").alias("r")).collect()}
    assert got[1] < 0.1 < got[2]          # boilerplate compresses far better
    assert got[3] is None and got[4] == 1.0
    # deterministic across partitionings
    again = {r.doc_id: r.r
             for r in df.repartition(3).select("doc_id", ratio("text").alias("r")).collect()}
    assert got == again


def test_kcore_peels_tendrils_keeps_core(spark):
    from fluvio_duck_spark.operators.graph import kcore_peel

    # K4 on {1..4} is a 3-core; 5-6-7 is a chain hanging off node 1 that
    # must peel away (degrees < 3), taking its edges with it
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    chain = [(1, 5), (5, 6), (6, 7)]
    edges = spark.createDataFrame(k4 + chain, "src long, dst long")
    got = {r.node: r.degree for r in kcore_peel(edges, k=3, rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_hll_sliding_wau_within_error_bound(spark, sf_dir):
    """The registered query now surfaces (wau_exact, within-bound boolean)
    instead of the raw estimate; assert every day's sketch-union estimate
    passed its bound AND the surfaced exact values agree with the
    independently-computed exact rolling distinct (q_events_dau_wau) on
    the common day set (6 trailing warm-up days beyond the exact twin's
    join-pruned output are expected)."""
    from fluvio_duck_spark.queries.pipeline import (
        q_events_dau_wau,
        q_rollup_hll_sliding_wau,
    )

    exact = {r.day: r.wau for r in q_events_dau_wau(spark, sf_dir).collect()}
    rows = q_rollup_hll_sliding_wau(spark, sf_dir).collect()
    assert all(r.wau_est_within_15pct for r in rows), [
        r.day for r in rows if not r.wau_est_within_15pct
    ]
    got = {r.day: r.wau_exact for r in rows}
    common = set(exact) & set(got)
    assert len(common) >= len(exact) * 0.9
    for d in common:
        assert got[d] == exact[d], (d, exact[d], got[d])


def test_bt_driver_arithmetic_matches_engine_cast(spark):
    """eval_bradley_terry's MM fixpoint runs as driver arithmetic over
    the collected |models|²-bounded pair table; its safety rests on the
    driver kernels mirroring the engine ops bit for bit.  Pin all three
    against Spark on adversarial doubles: r12 (floor fixed-point), the
    double→DECIMAL(28,12) cast (shortest-repr + HALF_UP — the exact
    ``Decimal.set(double)`` semantics), and the decimal-sum→double cast
    (correctly rounded)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from fluvio_duck_spark.functions.exact import r12
    from fluvio_duck_spark.queries.pipeline import _bt_dec12, _bt_r12f

    # adversarial inputs: 12-dp grid points, >1 magnitudes near the
    # 17-significant-digit repr edge (the MM domain bound is ~5e5),
    # half-ulp-at-12dp neighbourhoods, tiny eps-floor survivors
    vals = [
        0.333333333333, 1.0 / 3.0, 2.0 / 3.0, 0.1, 0.2, 0.30000000000004,
        1e-06, 5e-07, 1.5e-12, 4.9999999999995e-1, 0.4999999999995,
        123456.789012345678, 499999.9999999999, 0.0000000000005,
        7.0 / 11.0, 355.0 / 113.0, 1.0 / 7.0, 99999.000000000005,
        2.5000000000005, 0.9999999999995,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    got = df.select(
        "x",
        r12(F.col("x")).alias("r"),
        F.col("x").cast("decimal(28,12)").alias("d"),
        F.col("x").cast("decimal(28,12)").cast("double").alias("rt"),
    ).collect()
    for row in got:
        assert _bt_r12f(row.x) == row.r, (row.x, _bt_r12f(row.x), row.r)
        assert _bt_dec12(row.x) == row.d, (row.x, _bt_dec12(row.x), row.d)
        assert float(_bt_dec12(row.x)) == row.rt

    # exact decimal accumulation → double: engine SUM(DECIMAL(28,12))
    # cast to double vs driver sum of the same quantized decimals
    eng = (
        df.select(F.col("x").cast("decimal(28,12)").alias("d"))
        .agg(F.sum("d").cast("double").alias("s"))
        .collect()[0].s
    )
    drv = float(sum((_bt_dec12(v) for v in vals), Decimal(0)))
    assert drv == eng, (drv, eng)
