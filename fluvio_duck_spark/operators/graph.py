"""Iterative graph algorithms expressed as join+aggregate rounds —
PageRank here, connected components in ``operators/dedup.py``.

PageRank's distributed shape is the canonical iterative Spark workload:
each round joins the rank vector to the edge list on the source key and
re-aggregates contributions by destination — two well-partitioned
shuffles per round, nothing driver-side, lineage truncated per round so
a 50-iteration run doesn't build a 100-stage plan.

Determinism contract: per-round values are rounded to a fixed number of
decimals and accumulated in DECIMAL, so the ranks are bit-identical
across partial-agg orders, cluster sizes, and engines — the oracle is
the same recurrence unrolled in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decimal places kept per iteration — both the Spark loop and the SQL
#: oracle round to this, making the fixpoint engine-independent.
RANK_DP = 12


def _r12(col):
    """Shared fixed-point rounding — see functions/exact.py::r12 (incl.
    the ~9.2e6 domain bound; PageRank values are probabilities ≤ 1, well
    inside it)."""
    from fluvio_duck_spark.functions.exact import r12

    return r12(col)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    checkpoint: bool = True,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.  Returns
    (node, rank) for every node appearing as a source or destination.

    Nodes with no out-edges contribute no redistributed mass (their
    rank decays toward the teleport term) — callers wanting classic
    dangling-mass redistribution should densify the edge list first.

    Scale shape per round: contributions = rank ⋈ edges on the source
    key (AQE broadcasts the rank vector only if it is genuinely small —
    at web scale both sides hash-partition on src, and pre-partitioning
    edges by src makes the join shuffle-free), then one aggregation
    shuffled on dst; the rank vector seeds zero contributions into that
    same aggregation, so no join brings the teleport term back (a left
    join here costs an SMJ + two sorts per round).  ``localCheckpoint``
    truncates lineage each round, keeping plan size O(1) in the
    iteration count (same pattern as ``connected_components``).

    Local measurement note (sf0.1, 1.2 M edges): ~2-4 s/round, dominated
    by deserializing the checkpointed edge RDD + fixed shuffle costs —
    toy-scale overhead, not data.  On a cluster the edge list should be
    a bucketed-by-src parquet table (columnar scan, co-located join)
    rather than a localCheckpoint; the loop body is unchanged.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not assume_distinct:
        # duplicate edges would double-count contributions; callers that
        # construct an already-deduped edge list (e.g. a distinct pair
        # set unioned with its disjoint reverse orientation) pass
        # assume_distinct=True and skip this corpus-sized shuffle
        e = e.distinct()
    # out-degree is static: fold it onto the edge rows ONCE so each
    # round does a single rank⋈edges join instead of rank⋈edges⋈deg.
    # The inner join keeps every edge row (each src has ≥1 out-edge by
    # construction), so ONE materialization of the folded list serves
    # nodes, the init ranks, and every round — checkpointing the bare
    # edge list first as well was a second edge-sized RDD round trip
    # for nothing (measured r13: two checkpoints 1.2-1.4 s of the
    # query's 7 s at sf0.1).
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e = e.join(deg, "src")
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # |nodes| is a model-sized scalar (the kmeans-centroid precedent):
    # collect it once and inline it as a literal.  The previous 1-row
    # checkpoint + crossJoin re-broadcast it every round AND made every
    # shuffle carry the constant n column (guide §2.3 narrower rows).
    # F.lit(n)'s division doubles are identical to the crossJoined
    # column's — same long→double cast, same IEEE divide.
    n = nodes.agg(F.count("*").alias("n")).collect()[0][0]

    ranks = nodes.select(
        "node", _r12(F.lit(1.0) / F.lit(n)).alias("rank")
    )
    if checkpoint:
        ranks = ranks.localCheckpoint(eager=True)

    contrib_acc = f"decimal(28,{RANK_DP})"
    for it in range(iters):
        # SHUFFLE_HASH: both sides are corpus-sized at scale (never
        # broadcastable) and checkpoint-backed here (no stats), so the
        # planner would default to sort-merge; the rank vector is the
        # strictly smaller side and hashes per-partition, avoiding the
        # per-round sort of the edge list (guide §3.1).  Measured r13:
        # 6.5 → 5.2 s for the 3-round query at sf0.1, identical ranks.
        contribs = ranks.hint("shuffle_hash").join(
            e, ranks.node == e.src
        ).select(
            F.col("dst").alias("node"),
            _r12(F.col("rank") / F.col("deg")).alias("c"),
        )
        # seed every node with a zero contribution instead of left-joining
        # the sums back onto the rank vector: the union rides into the same
        # aggregation exchange, where a join would add an SMJ + two sorts
        # per round (exact: DECIMAL sum of an extra exact zero)
        zeros = ranks.select("node", F.lit(0.0).alias("c"))
        ranks = (
            contribs.unionByName(zeros)
            .groupBy("node")
            .agg(F.sum(F.col("c").cast(contrib_acc)).cast("double").alias("s"))
            .select(
                "node",
                _r12(
                    F.lit(1 - damping) / F.lit(n)
                    + F.lit(damping) * F.col("s")
                ).alias("rank"),
            )
        )
        # checkpoint every SECOND round: a two-round-deep plan is still
        # O(1) in iterations, and each eager materialization costs a
        # fixed RDD round-trip at toy scale (measured 10.3 s → 9.1 s
        # for 3 rounds at sf0.1); the final round always
        # materializes so callers get a truncated lineage back.
        # eager=False was measured and REJECTED (r13 s6, alternating
        # warm best-of-4 ×2: lazy 4.27/5.49 vs eager 4.04/5.34 s) —
        # collapsing the per-round job launches into one chained action
        # saves no wall time here; the rounds' cost is the shuffles and
        # RDD round trips themselves, not driver job-launch latency
        if checkpoint and (it % 2 == 1 or it == iters - 1):
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph, via the
    degree-orientation algorithm (the standard MPC/MapReduce shape:
    Suri & Vassilvitskii, WWW'11).  Input rows are undirected edges in
    either orientation; self-loops and duplicates are dropped here.

    Why not the naive three-way self-join: its wedge step fans out
    quadratically in the max degree (a single celebrity node with 10 M
    neighbors yields 5·10¹³ wedges).  Orienting every edge from its
    lower-(degree, id) endpoint to the higher one caps the out-degree
    at O(√m), so the wedge join materializes at most Σ C(outdeg, 2) =
    O(m^1.5) rows — the best bound any triangle enumeration can have —
    regardless of skew.

    Plan shape: canonicalize+distinct (1 shuffle), degree groupBy
    (1 shuffle, map-side combine), two degree joins to decorate
    endpoints (equi-joins on the edge endpoints), the wedge self-join
    on the oriented source (equi-join; the O(√m) out-degree bound is
    what keeps its output polynomial), and the closing equi-join on
    (v1, v2) against the oriented edge set.  Nothing driver-side.

    Returns ``(node, triangles)`` for every node in ≥1 triangle; each
    triangle credits all three corners.
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select("b"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    j = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    # orient low-rank → high-rank, rank = (degree, id) lexicographic —
    # struct comparison gives the tie-broken total order directly
    low_first = F.struct("da", "a") < F.struct("db", "b")
    oriented = j.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    if checkpoint:
        # the oriented edge list feeds BOTH wedge sides and the closing
        # join; exchange reuse does not dedup the three consumers (each
        # re-runs the distinct + degree-join lineage — measured 32
        # shuffles vs ~8 here), so materialize it once, edge-sized
        oriented = oriented.localCheckpoint(eager=True)
    # The wedge self-join stays SORT-MERGE deliberately (r13 session 5
    # measured the SHUFFLE_HASH form: warm best-of-8 2.418 vs 2.401 s —
    # no win).  The two per-consumer sorts it pays are O(m log m) under
    # an O(m^1.5) wedge output, a second-order term at every scale, and
    # sort-merge spills gracefully where a forced hash build of a
    # hot-degree u's edge group would not (guide §3.1) — unlike the
    # closing join below, whose probe stream IS the dominant term.
    # r14 re-adjudicated this at sf1 under a 32-core/8-core A/B: an
    # apparent 4× SMJ collapse at local[32] turned out to be a
    # 64 GB-driver-heap artifact (GC geometry, not the join — at the
    # default 8 GB heap SMJ reads 9.0 s warm vs SHUFFLE_HASH 10.2 s and
    # a grouped in-row pair explosion ~equal, fresh-process best-of-2
    # on the sf1 co-purchase graph).  SMJ stays; see OPTIMIZATION_r14.md
    # for the heap-size finding.
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (F.struct("o1.dv", "o1.v") < F.struct("o2.dv", "o2.v")),
    ).select(
        F.col("o1.u").alias("u"),
        F.col("o1.v").alias("v1"),
        F.col("o2.v").alias("v2"),
    )
    # wedge (v1, v2) is rank-ordered, and so is every oriented edge —
    # one equi-join closes the triangle.  SHUFFLE_HASH on the edge side:
    # the wedge stream is the O(m^1.5) side and the planner (stats-blind
    # behind the checkpoint) would sort-merge, paying a full sort of the
    # wedges; hashing the O(m) edge set per partition instead leaves the
    # wedge stream sort-free (guide §3.1).  Measured r13: 3.11 → 2.54 s
    # at sf0.1, identical counts.
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    ).hint("shuffle_hash")
    tri = wedges.join(closing, ["v1", "v2"])
    return (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling: repeatedly drop nodes of degree < k
    (with their edges) — after enough rounds only the k-core survives.
    Fixed ``rounds`` rather than loop-until-stable keeps the computation
    oracle-checkable (the SQL oracle unrolls the same rounds), exactly
    the pagerank trick; real deployments loop until the edge count stops
    changing, one extra count() per round.

    Per round: one degree aggregation (map-side combined) + two semi
    joins filtering both endpoints — all equi-operations on the edge
    key; ``localCheckpoint`` truncates lineage so plan size stays O(1)
    in rounds.  Returns ``(node, degree)`` of survivors with
    degree ≥ k after the last peel.
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("src").alias("node"))
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    deg = e.groupBy("src").agg(F.count("*").alias("degree"))
    return deg.filter(F.col("degree") >= k).select(
        F.col("src").alias("node"), "degree"
    )
