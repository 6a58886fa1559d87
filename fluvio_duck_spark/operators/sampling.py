"""Deterministic sampling / data-mixture operators for training-data
curation — brief-mandated extensions beyond the reference surface (the
reference delegates all relational work to its SQL engine, SURVEY §2.6;
sampling a corpus into a training mix is the 100 TB pipeline step that
follows the dedup/quality operators in this package).

Design rules shared by both operators:

* **Deterministic.** ``df.sample()`` is seed-stable only per partitioning;
  these operators instead rank by an explicit pure function of the data
  (a hash of a unique id, or a quality ordering), so the same corpus
  always yields the same sample regardless of cluster layout, partition
  count, or execution order.  That is what makes a 100 TB run resumable
  and auditable.
* **One shuffle.** Both are a single window over ``partitionBy(strata)``
  — the same exchange any per-stratum aggregate would pay.  No
  driver-side collection, no global sort.
* **Skew note.** A stratum is processed by one task; strata are
  language/source-grained (thousands of rows to low billions).  For a
  pathological mega-stratum, pre-split by adding a salt column to
  ``strata`` and dividing per-salt quotas — same pattern as
  ``operators/skew.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth multiplicative constant — used by :func:`uniform_key` so the
#: pseudo-random ordering is reproducible in plain integer SQL on any
#: engine (the oracle cannot evaluate Spark's xxhash64).
_KNUTH = 2654435761
_MOD = 1_000_003  # prime modulus keeps the key well-mixed and small
_SEED_STRIDE = 98_765_431  # spreads seeds far apart in multiplier space


def uniform_key(id_col: str | Column, seed: int = 0) -> Column:
    """Deterministic pseudo-uniform ordering key from an integer id:
    ``((id + 1) * (2654435761 + seed * 98765431)) % 1000003``.

    The seed perturbs the *multiplier*, not an additive offset — the
    modulus is prime, so each multiplier is a different permutation of
    the keyspace, whereas ``(id*K + seed) % M`` would only rotate it
    (same relative order, nearly the same bottom-n sample).  The seed is
    scaled by a large stride because neighbouring multipliers perturb
    small ids by only ~id; and ``id + 1`` avoids the fixed point
    ``0 * m = 0`` (id 0 would be drawn first under every seed).

    Engine-portable (plain 64-bit integer arithmetic — the DuckDB oracle
    computes the identical expression), which is why the oracle-paired
    query uses it.  Int64 domain bound: the raw product must stay below
    2^63, i.e. ``(id+1) * (2654435761 + seed*98765431) < 2^63`` — with
    seeds ≤ 11 that caps ids at ~2.4e9 (DuckDB raises on BIGINT overflow
    where Spark silently wraps).  Past that, pre-reduce the id
    (``pmod(id, 1000003)`` BEFORE the multiply — the bootstrap-CI query
    is the worked example) or, at real scale with non-integer/composite
    ids, pass ``F.xxhash64(*cols, F.lit(seed))`` as ``order_key``
    instead — same operator, stronger mixing, no SQL-oracle requirement.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod((c + F.lit(1)) * F.lit(_KNUTH + seed * _SEED_STRIDE), F.lit(_MOD))


def weighted_key(
    id_col: str | Column, weight: str | Column, seed: int = 0
) -> Column:
    """Efraimidis–Spirakis exponential key for WEIGHTED sampling
    without replacement: rank ascending by ``-ln(u)/w`` (u deterministic
    uniform in (0,1] from ``uniform_key``) and take the bottom-n — each
    row's inclusion probability is proportional to ``weight``, exactly
    the importance-weighted corpus draw ("sample by token count") a
    mixture builder needs.  Deterministic: same data + seed → same
    sample on any cluster.  ``ln`` is the one transcendental — engines'
    libm may differ in the last ULP, which matters only if two keys at
    the quota boundary agree to ~1e-15 (keys are spread ~1e-3 apart;
    the tiebreak column settles exact ties).  Weights must be > 0."""
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (uniform_key(id_col, seed) + F.lit(1)).cast("double") / F.lit(
        float(_MOD + 1)
    )
    return -F.log(u) / w.cast("double")


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    order_key: Column,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact per-stratum quota sample: the ``n_per_stratum`` rows with the
    smallest ``order_key`` within each stratum.

    With a hash ``order_key`` this is a uniform-without-replacement draw
    of exactly ``min(n, |stratum|)`` rows per stratum — the building
    block of a fixed-mixture training set ("20 docs per language").
    Plan: one shuffle on ``strata``, in-partition top-n via
    ``row_number`` (Spark runs the window sort per partition; no global
    sort, no second exchange).
    """
    order = [order_key.asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*strata).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def global_sample(
    df: DataFrame,
    k: int,
    order_key: Column,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact global uniform k-sample: the ``k`` rows with the smallest
    ``order_key`` over the WHOLE corpus — the distributed equivalent of
    a k-slot reservoir, as one declarative top-k.

    Why this shape and not a reservoir loop or a window: ``orderBy(key)
    .limit(k)`` compiles to ``TakeOrderedAndProject`` — every partition
    keeps only its local k smallest (a bounded heap, map-side), and the
    driver merges |partitions| k-row heaps.  No shuffle of the corpus,
    no global sort, state bounded by k everywhere — exactly the merge
    property that makes reservoir sampling scale, with Catalyst picking
    the physical plan.  Contrast :func:`stratified_sample`, which pays
    one shuffle because its quota is per-stratum.

    With a hash ``order_key`` (``uniform_key``) the draw is uniform
    without replacement and a pure function of the data: same corpus →
    same sample on any cluster layout, and a re-run after appending new
    rows changes the sample only where new keys displace old ones (the
    property that makes incremental refreshes cheap to audit).
    ``tiebreak`` must make the order total (hash collisions otherwise
    leave the boundary row nondeterministic).
    """
    order = [order_key.asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    return df.orderBy(*order).limit(k)


def pack_token_budget(
    df: DataFrame,
    strata: list[str],
    order_by: list[Column],
    token_col: Column,
    budget: int,
    cum_alias: str = "cum_tokens",
) -> DataFrame:
    """Greedy prefix packing: within each stratum, walk rows in
    ``order_by`` order (best-first) accumulating ``token_col``; keep the
    prefix whose running total (inclusive) stays ``<= budget``.

    The data-mixture step of a training pipeline — "the best documents
    per language up to N tokens each".  Prefix semantics (not knapsack):
    the first row that would overflow the budget ends the stratum's
    intake even if a later smaller row would fit; that is what makes the
    result a deterministic function of the ordering, expressible as one
    running-sum window in any engine.  ``order_by`` must be a total
    order (append a unique id) or the packing is ambiguous.

    Adds ``cum_alias`` (the inclusive running token total) to the
    output.  Plan: one shuffle on ``strata``, one in-partition sort.
    """
    w = (
        Window.partitionBy(*strata)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(cum_alias, F.sum(token_col).over(w))
        .filter(F.col(cum_alias) <= budget)
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    budget: int = 100_000,
) -> DataFrame:
    """Temperature-scaled data-mixture allocation: per-group sampling
    shares ``p_i^alpha / sum_j p_j^alpha`` (``p_i`` = the group's corpus
    fraction) and the resulting per-group document allocation for a total
    sampling ``budget``.

    ``alpha < 1`` flattens the natural distribution toward uniform —
    the standard multilingual/multi-source rebalancing trick (upsample
    rare sources, downsample dominant ones) used by large-corpus
    training mixes.  ``alpha=1`` is proportional sampling, ``alpha=0``
    is uniform.

    Plan shape: one partial+final count aggregation over ``group_col``
    — the ONLY pass over the corpus — then two whole-partition windows
    over the |groups|-row count table for the totals.  The windows run
    single-task over a relation whose size is the number of *sources*
    (tens to thousands), never the corpus; expressing the totals as
    scalar-aggregate cross joins instead would re-derive the count
    lineage per branch and scan the corpus once per total.

    ``alpha=0.5`` uses ``sqrt`` (IEEE correctly-rounded in every engine)
    so the oracle-paired query is reproducible bit-for-bit; other alphas
    go through ``pow``.  ``share`` is rounded to 6 decimals to absorb
    group-sum association-order differences across engines.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    wgt = F.sqrt(F.col("n") / F.sum("n").over(w)) if alpha == 0.5 else (
        F.pow(F.col("n") / F.sum("n").over(w), F.lit(alpha))
    )
    weighted = counts.withColumn("__wgt", wgt)
    z = F.sum("__wgt").over(w)
    return weighted.select(
        group_col,
        "n",
        F.round(F.col("__wgt") / z, 6).alias("share"),
        F.round(F.lit(budget) * F.col("__wgt") / z, 0).cast("long").alias("alloc"),
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 0,
    split_alias: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the hashed id keyed into
    cumulative weight thresholds.  Map-only — no shuffle, no sampling
    state, and stable under reruns/retries and corpus growth (a doc's
    split never changes when other docs are added, which is what keeps
    held-out sets uncontaminated across dataset versions).

    Thresholds are integer cut points in :func:`uniform_key`'s keyspace,
    so assignment is exact integer arithmetic — portable to any engine
    (the oracle replays it), and no float-boundary ambiguity.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    key = uniform_key(id_col, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cut = int(cum * _MOD)
        cond = key < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_alias, expr)


def upsample_repeat(
    df: DataFrame,
    rate_col: str | Column,
    id_col: str = "doc_id",
    seed: int = 0,
    copy_alias: str = "copy_idx",
) -> DataFrame:
    """Materialize a sampling *rate* (which may exceed 1 — upsampling)
    into concrete row copies: each row yields ``floor(rate)`` copies
    plus one more with probability ``frac(rate)``, decided by the
    deterministic uniform — so realized counts hit the target mixture
    in expectation AND are reproducible row-for-row (same data + seed →
    the same physical corpus on any cluster, the property a resumable
    pretraining run needs).

    This is the materializer for :func:`temperature_mixture`'s
    allocation table: join the per-source ``alloc / n`` rate onto the
    corpus and every source lands within 1 doc of its quota in
    expectation.  Map-only — the explode happens where the row already
    lives; rows with ``copies = 0`` drop out (rate < 1 downsamples with
    the same machinery).  ``copy_idx`` (1-based) distinguishes the
    clones so a downstream shuffle/order pass can interleave them.
    """
    r = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    r = r.cast("double")
    u = (uniform_key(id_col, seed) + F.lit(1)).cast("double") / F.lit(
        float(_MOD + 1)
    )
    copies = (F.floor(r) + F.when(u < r - F.floor(r), 1).otherwise(0)).cast(
        "int"
    )
    # sequence(1, 0) would yield the DESCENDING [1, 0] — gate on copies
    # >= 1 instead of relying on an empty sequence
    seqs = F.when(
        copies >= 1, F.sequence(F.lit(1), copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.select("*", F.explode(seqs).alias(copy_alias))


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
    key_alias: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle for training-order materialization:
    every epoch's read order is ``(uniform_key(id, seed), id)`` — change
    the seed, get an independent permutation; rerun the job, get the
    identical one.

    Implemented as ``repartitionByRange`` on the key + in-partition
    sort: a range-partitioned total order across output files WITHOUT
    any single-task global sort or driver-side index — the one
    unavoidable corpus-wide shuffle, and exactly one of it.  (A
    ``row_number`` over a global window would funnel 100 TB through one
    task; downstream training readers only need file order + in-file
    order, not a materialized contiguous index.)
    """
    out = df.withColumn(key_alias, uniform_key(id_col, seed))
    cols = [key_alias, id_col]
    if num_partitions:
        return out.repartitionByRange(num_partitions, *cols).sortWithinPartitions(*cols)
    return out.repartitionByRange(*cols).sortWithinPartitions(*cols)


def negative_samples(
    df: DataFrame,
    id_col: str,
    label_col: str,
    k: int = 4,
    seed: int = 0,
    oversample: int = 2,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor row, ``k`` rows whose label differs, drawn by a pure
    integer-hash function of (anchor id, draw index) — the same corpus
    yields the same negatives on any cluster layout, so a training run
    is resumable and its pairs auditable.

    Contract: ``id_col`` must be dense 0..N-1 (the standard contiguous
    row-id a training pipeline assigns; ``training_order`` produces
    one).  Candidate j for anchor i is
    ``(i + 1)·(KNUTH + (seed·31 + j)·STRIDE) mod N`` — each draw index
    is a different multiplicative permutation of the id space.

    Plan shape: ``k·oversample`` candidates explode in-row (map-side
    fan-out), ONE equi-join on the candidate id fetches candidate
    labels, self/same-label collisions filter out, and a rank window
    keeps the first ``k`` survivors per anchor (WindowGroupLimit: the
    per-anchor heap is k-bounded before the shuffle).  No corpus²
    anything; the join is the only data-sized exchange.

    Returns (id, neg_rank 1..k, neg_id).  Anchors whose oversampled
    candidates all collide (tiny corpora, dominant labels) return
    fewer than k rows — raise ``oversample`` if that matters.
    """
    n = df.agg((F.max(F.col(id_col)) + 1).alias("_n"))
    draws = df.select(
        F.col(id_col).alias("_aid"), F.col(label_col).alias("_albl")
    ).crossJoin(n).select(
        "_aid", "_albl", "_n",
        F.explode(F.sequence(F.lit(0), F.lit(k * oversample - 1))).alias("_j"),
    )
    cand = draws.select(
        "_aid", "_albl", "_j",
        F.pmod(
            (F.col("_aid") + 1)
            * (
                F.lit(_KNUTH)
                + (F.lit(seed * 31).cast("long") + F.col("_j"))
                * F.lit(_SEED_STRIDE).cast("long")
            ),
            F.col("_n"),
        ).alias("_cid"),
    )
    labels = df.select(
        F.col(id_col).alias("_cid"), F.col(label_col).alias("_clbl")
    )
    valid = (
        cand.join(labels, "_cid")
        .filter((F.col("_cid") != F.col("_aid")) & (F.col("_clbl") != F.col("_albl")))
    )
    w = Window.partitionBy("_aid").orderBy("_j")
    return (
        valid.select(
            F.col("_aid").alias(id_col),
            F.row_number().over(w).alias("neg_rank"),
            F.col("_cid").alias("neg_id"),
        )
        .filter(F.col("neg_rank") <= k)
    )
