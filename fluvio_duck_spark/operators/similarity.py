"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: full scan + per-partition
  heap (TakeOrderedAndProject).  At 100 TB this is the *correct baseline*:
  embarrassingly parallel, no shuffle, bounded driver memory (k rows).
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH signatures
  (sign bits of projections onto seeded Gaussian planes) partition vectors
  into 2^n_planes buckets; the query probes its own bucket plus all
  hamming-1 neighbors, then scores candidates exactly.  Candidate set is
  ~(n_probes/2^n_planes) of the data — the scan is pruned, not the math.
* ``embedding_near_dup_pairs`` — all-pairs cosine ≥ threshold; exact via
  self-join (bounded fixtures / verification), LSH-bucketed variant for
  scale via ``bucketed=True``.
* ``blocked_near_dup_pairs`` — the *exact* all-pairs answer at scale:
  block-partitioned matrix multiply (each block pair is one Arrow-batched
  numpy GEMM) instead of per-pair expression evaluation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvio_duck_spark.functions.vectors import cosine, dot, l2_normalize


def _query_df(df: DataFrame, query_id: int, id_col: str, vec_col: str) -> DataFrame:
    # limit(1): ids are unique by contract, and the explicit limit makes
    # the broadcast side's 1-row bound provable from the physical plan
    # (the census BNLJ gate adjudicates on it) while letting the scan
    # stop at the first match.
    return (
        df.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("__qv"))
        .coalesce(1)  # satisfies limit's single-partition need, no Exchange
        .limit(1)
    )


def _check_query_rows(queries: DataFrame, max_query_rows: int) -> None:
    """Raise if the query set exceeds ``max_query_rows``.  Bounded probe:
    ``limit(max+1).count()`` stops scanning once the limit is hit, so the
    guard costs O(max_query_rows) however expensive the upstream plan is
    — never a second full evaluation of the query side."""
    probed = queries.limit(max_query_rows + 1).count()
    if probed > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}; a "
            "corpus-sized query set must go through knn_graph_blocked "
            "(blocked GEMM, neither side materialized), or raise "
            "max_query_rows explicitly."
        )


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the vector with ``query_id`` (excluded from
    the results).  The 1-row query side is broadcast; ordering carries the
    id tie-break so results are total-ordered and reproducible."""
    q = _query_df(df, query_id, id_col, vec_col)
    return (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(id_col, cosine(F.col(vec_col), F.col("__qv")).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    gemm: bool = False,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact top-k for a whole QUERY SET at once — the realistic
    retrieval workload (N queries × corpus), not one query per job.
    Output: ``(query_id, id_col, sim, rn)`` with rn 1..k, total-ordered
    by (sim desc, id) so reruns are identical.

    gemm=False (oracle path): both sides L2-normalize once map-side, so
    each score is ONE sequential dot fold (not the 3 folds of raw
    cosine — interpreted HOFs have no CSE); the query set broadcasts and
    the per-query top-k is one window shuffle carrying
    |corpus|×|queries| score rows.

    gemm=True (scale path): one numpy GEMM per Arrow batch against the
    materialized query matrix (a request batch is bounded by contract),
    with MAP-SIDE PARTIAL TOP-K — each batch emits only its own best 2k
    per query, so the window shuffle carries |batches|×|queries|×2k rows
    instead of |corpus|×|queries|.  Same results as the exact path
    (GEMM reassociates float sums; ties at the 2k boundary are the only
    theoretical divergence — parity asserted in tests)."""
    from pyspark.sql import Window

    if gemm:
        scored = _gemm_scores(corpus, queries, 2 * k, id_col, vec_col,
                              max_query_rows=max_query_rows)
    else:
        cn = corpus.select(
            F.col(id_col), l2_normalize(F.col(vec_col)).alias("__cv")
        )
        _check_query_rows(queries, max_query_rows)
        qn = queries.select(
            F.col(id_col).alias("query_id"),
            l2_normalize(F.col(vec_col)).alias("__qv"),
        )
        # Never binds (guard above) but makes the broadcast side's row
        # bound plan-provable; coalesce(1) satisfies the limit's single-
        # partition requirement without an Exchange (query side is tiny).
        qn = qn.coalesce(1).limit(max_query_rows)
        scored = (
            cn.crossJoin(F.broadcast(qn))
            .filter(F.col(id_col) != F.col("query_id"))
            .select(
                "query_id", id_col,
                dot(F.col("__cv"), F.col("__qv")).alias("sim"),
            )
        )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    )
    return scored.withColumn("rn", rn).filter(F.col("rn") <= k)


def _gemm_scores(
    corpus: DataFrame, queries: DataFrame, keep: int, id_col: str, vec_col: str,
    label_col: str | None = None, max_query_rows: int = 100_000,
) -> DataFrame:
    """Per-Arrow-batch GEMM scores pruned to each batch's top ``keep``
    rows per query (np.argpartition) before anything leaves the task.

    With ``label_col``, rows sharing the query's label are masked out
    BEFORE the per-batch partial top-k — hard-negative mining stays
    exact (a post-hoc label filter over an unmasked partial top-k could
    starve a query whose nearest rows all share its label).

    Contract: vectors must have nonzero L2 norm (a zero vector normalizes
    to NaN sims on both batch paths).  The output id field types are
    derived from the input schemas, so non-long ids round-trip intact.

    The query side is collected to the driver (that is the GEMM shape:
    a query SET ≪ the corpus, broadcast into every Arrow batch).  A
    corpus-sized query side would OOM the driver, so the collect is
    guarded: above ``max_query_rows`` the call raises and points at
    ``knn_graph_blocked``, the all-pairs form that never materializes
    either side."""
    import numpy as np
    import pandas as pd

    qcols = [id_col, vec_col] + ([label_col] if label_col else [])
    _check_query_rows(queries, max_query_rows)
    qpd = queries.select(*qcols).toPandas()
    qids = qpd[id_col].to_numpy()
    qlbl = qpd[label_col].to_numpy() if label_col else None
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qpd[vec_col]])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            lbl = pdf[label_col].to_numpy() if label_col else None
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            S = Q @ X.T  # (queries × batch)
            out_q, out_i, out_s = [], [], []
            for j in range(len(qids)):
                s = S[j]
                mask = ids != qids[j]
                if lbl is not None:
                    mask &= lbl != qlbl[j]
                cand = np.flatnonzero(mask)
                if len(cand) > keep:
                    cand = cand[np.argpartition(-s[cand], keep - 1)[:keep]]
                out_q.extend([qids[j]] * len(cand))
                out_i.extend(ids[cand])
                out_s.extend(s[cand])
            yield pd.DataFrame(
                {"query_id": out_q, id_col: out_i, "sim": out_s}
            )

    qid_ty = queries.schema[id_col].dataType.simpleString()
    cid_ty = corpus.schema[id_col].dataType.simpleString()
    schema = f"query_id {qid_ty}, {id_col} {cid_ty}, sim double"
    ccols = [id_col, vec_col] + ([label_col] if label_col else [])
    return corpus.select(*ccols).mapInPandas(score, schema=schema)


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Pack sign bits of plane projections into one integer signature.
    Pure expression — evaluated JVM-side per row.

    ``vec_col`` may be a SQL expression STRING (preferred — the
    n_planes × dim literal projection tree parses as ONE expression
    instead of ~600 py4j round trips of Column construction per call)
    or a Column (loop fallback, same tree).  Double literals round-trip
    through ``repr`` + CAST-from-string, the same exactness contract as
    operators/kmeans.py::_dist2_sql."""
    if isinstance(vec_col, str):
        def proj(plane):
            lits = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in plane)
            return (
                f"aggregate(zip_with({vec_col}, array({lits}), "
                f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                f"CAST('0.0' AS DOUBLE), (acc, v) -> acc + v)"
            )

        terms = " + ".join(
            f"(CASE WHEN {proj(plane)} >= 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)
        )
        return F.expr(f"CAST({terms} AS INT)")
    bits = [
        F.when(
            dot(vec_col, F.array(*[F.lit(float(x)) for x in plane])) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ann_lsh_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    hamming distance 1 of the query's bucket (n_planes+1 probes of
    2^n_planes buckets).  In production the signature column is
    precomputed and the table is partitioned/bucketed by it, turning each
    query into a partition-pruned scan."""
    planes = _planes(dim, n_planes, seed)
    signed = df.withColumn("__sig", lsh_signature(f"`{vec_col}`", planes))
    q = (
        signed.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("__qv"), F.col("__sig").alias("__qsig"))
        .coalesce(1)
        .limit(1)  # unique id by contract; plan-provable broadcast bound
    )
    probe_ok = F.col("__sig") == F.col("__qsig")
    for i in range(n_planes):
        probe_ok = probe_ok | (
            F.col("__sig") == F.col("__qsig").bitwiseXOR(F.lit(1 << i))
        )
    return (
        signed.crossJoin(F.broadcast(q))
        .filter(probe_ok & (F.col(id_col) != query_id))
        .select(id_col, cosine(F.col(vec_col), F.col("__qv")).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer assigns every vector to a cell and
    the query scores only its own cell — here the fixture's precomputed
    ``label`` column stands in for the k-means cell assignment (in
    production the codebook is trained offline and assignment is a map-only
    argmin expression over the centroid array, then persisted).

    The scale plan: partition/bucket the table by ``cell_col`` so each
    probe is a partition-pruned scan touching 1/n_cells of the data; the
    top-k is a per-partition heap (TakeOrderedAndProject), never a global
    sort.  Unlike ``ann_lsh_topk`` the cell boundaries are data-driven, so
    recall degrades gracefully on clustered data."""
    q = (
        df.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("__qv"), F.col(cell_col).alias("__qcell"))
        .coalesce(1)
        .limit(1)  # unique id by contract; plan-provable broadcast bound
    )
    return (
        df.crossJoin(F.broadcast(q))
        .filter((F.col(cell_col) == F.col("__qcell")) & (F.col(id_col) != query_id))
        .select(id_col, cosine(F.col(vec_col), F.col("__qv")).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe for a whole query set: each query scores ONLY its own
    cell — the probe is a real EQUI-JOIN on the cell id (broadcast of
    the query batch), so at scale a cell-partitioned/bucketed corpus
    turns every probe into a partition-pruned scan of 1/n_cells of the
    data.  Scoring is the normalized single-fold dot; per-query top-k is
    one window shuffle over the (tiny) per-cell candidate sets.  The
    same-cell semantics is deterministic, hence exactly oracle-checkable
    (the recall-vs-exhaustive trade is the separate, tested question)."""
    from pyspark.sql import Window

    cn = corpus.select(
        F.col(id_col), F.col(cell_col),
        l2_normalize(F.col(vec_col)).alias("__cv"),
    )
    qn = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("__qcell"),
        l2_normalize(F.col(vec_col)).alias("__qv"),
    )
    scored = (
        cn.join(F.broadcast(qn), F.col(cell_col) == F.col("__qcell"))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", id_col,
            dot(F.col("__cv"), F.col("__qv")).alias("sim"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    )
    return scored.withColumn("rn", rn).filter(F.col("rn") <= k)


#: Above this input size the exact all-pairs path refuses to run — n² pair
#: generation through a broadcast NLJ is the verification anchor, never the
#: production plan (use bucketed=True or blocked_near_dup_pairs instead).
EXACT_PAIRS_MAX_ROWS = 200_000


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: bool = False,
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
    max_rows: int | None = EXACT_PAIRS_MAX_ROWS,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    bucketed=False: exact all-pairs self-join (n² — verification scale
    ONLY).  Guarded: if the input exceeds ``max_rows`` (bounded probe
    scan, not a full count) this raises instead of silently launching an
    n² job — pass ``max_rows=None`` to override deliberately.
    bucketed=True: equi-join on the LSH signature first (same-bucket pairs
    only), then exact cosine — the 100 TB plan, trading recall for a
    shuffle bounded by bucket sizes."""
    if not bucketed and max_rows is not None:
        # limit(max_rows+1) bounds the probe: Spark stops scanning once
        # the limit is hit, so the guard costs O(max_rows), not O(n).
        probed = df.select(id_col).limit(max_rows + 1).count()
        if probed > max_rows:
            raise ValueError(
                f"embedding_near_dup_pairs(bucketed=False) is the n² "
                f"verification path; input exceeds max_rows={max_rows}. "
                f"Use bucketed=True or blocked_near_dup_pairs for scale, "
                f"or pass max_rows=None to force."
            )
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if not bucketed and max_rows is not None:
        # Never binds (the probe above already raised past max_rows) but
        # makes the broadcast side's row bound provable from the plan.
        # The broadcast side is PINNED by hint below; the streamed side
        # repartitions back out after its limit — a GlobalLimit leaves
        # ONE partition behind, and an NLJ streaming 200M pairs through
        # one task serialized the whole scan (sf1 receipt, round 9:
        # minutes-per-task wall on a 16-thread box).  The repartition
        # moves only max_rows rows; the bound proof is unchanged.
        par = df.sparkSession.sparkContext.defaultParallelism
        a = a.coalesce(1).limit(max_rows).repartition(par)
        b = F.broadcast(b.coalesce(1).limit(max_rows))
    if bucketed:
        planes = _planes(dim, n_planes, seed)
        a = a.withColumn("__sig", lsh_signature("va", planes))
        b = b.withColumn("__sig", lsh_signature("vb", planes))
        joined = a.join(b, ["__sig"]).filter(F.col("id_a") < F.col("id_b"))
    else:
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        joined.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _block_pair_rows(
    df: DataFrame, id_col: str, vec_col: str, n_blocks: int
) -> DataFrame:
    """Expand each row into its (bi, bj, side) block-pair memberships in
    ONE map-only pass: a row in block b is side 0 of every pair (b, j≥b)
    and side 1 of every pair (i<b, b).

    This used to be two broadcast joins against a (bi, bj) literal table
    plus a union — which scanned (and deserialized) the vector column
    twice and planned two join stages.  The explode over a filtered
    literal pair array produces the identical rows from a single scan
    with no join at all; the only exchange left in a block-pair pipeline
    is the groupBy(bi, bj) the GEMM stage needs anyway (guide §2.4:
    remove shuffles outright; §2.3: project before the exchange)."""
    tagged = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    all_pairs = F.array(*[
        F.struct(F.lit(i).alias("bi"), F.lit(j).alias("bj"))
        for i in range(n_blocks) for j in range(i, n_blocks)
    ])
    blk = F.col("blk")
    mine = F.filter(
        all_pairs, lambda p: (p.bi == blk) | ((p.bj == blk) & (p.bi != p.bj))
    )
    return (
        tagged.select("id", "v", "blk", F.explode(mine).alias("p"))
        .select(
            F.col("p.bi").alias("bi"),
            F.col("p.bj").alias("bj"),
            "id",
            "v",
            F.when(F.col("p.bi") == F.col("blk"), F.lit(0))
            .otherwise(F.lit(1))
            .alias("side"),
        )
    )


def blocked_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via block-partitioned matrix
    multiply — the scale-correct form of ``embedding_near_dup_pairs``'s
    exact mode.

    Rows are hashed into ``n_blocks`` blocks; each of the B(B+1)/2
    unordered block pairs becomes one group whose task pulls the two
    blocks into numpy and scores every cross pair with a single float64
    GEMM.  Per-row replication is B+1 (each block meets every other block
    once), per-task memory is 2·(n/B)·dim floats, and the n² work runs
    inside BLAS instead of the expression interpreter — ~40× faster than
    the broadcast-NLJ + ``F.aggregate`` plan at sf0.1 and, unlike that
    plan, it distributes: block pairs are independent tasks, so a cluster
    scales it out while per-pair expression evaluation on a broadcast NLJ
    concentrates all n² work in one stage of width n.

    Output pairs carry ``id_a < id_b`` and ``sim`` rounded to 6 decimals
    (GEMM sums in a different order than sequential-fold engines; rounding
    makes the result comparable across engines while the 1e-16-scale
    difference is far below any real threshold margin).
    """
    both = _block_pair_rows(df, id_col, vec_col, n_blocks)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        a = pdf[pdf["side"] == 0]
        diagonal = bool((pdf["bi"] == pdf["bj"]).iloc[0])
        b = a if diagonal else pdf[pdf["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return empty
        ma = np.stack(a["v"].to_numpy()).astype(np.float64)
        mb = ma if diagonal else np.stack(b["v"].to_numpy()).astype(np.float64)
        sims = (ma @ mb.T) / np.outer(
            np.linalg.norm(ma, axis=1), np.linalg.norm(mb, axis=1)
        )
        ia, ib = np.nonzero(sims >= threshold)
        ids_a = a["id"].to_numpy()[ia]
        ids_b = b["id"].to_numpy()[ib]
        vals = np.round(sims[ia, ib], 6)
        if diagonal:
            # both orientations (and the self-diagonal) are present; keep
            # the strict upper triangle by id
            keep = ids_a < ids_b
            ids_a, ids_b, vals = ids_a[keep], ids_b[keep], vals[keep]
        else:
            # each cross pair appears exactly once — reorient, never drop
            lo = np.minimum(ids_a, ids_b)
            hi = np.maximum(ids_a, ids_b)
            ids_a, ids_b = lo, hi
        return pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "sim": vals})

    return both.groupBy("bi", "bj").applyInPandas(
        score, schema="id_a long, id_b long, sim double"
    )


def knn_graph_blocked(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs k-NN graph (cosine) via the same B(B+1)/2
    block-pair GEMM decomposition as :func:`blocked_near_dup_pairs` —
    the building block for graph-based curation (label-noise voting,
    kNN-dedup, diversity scoring).

    Each block-pair task emits a per-row PARTIAL top-k against just the
    other block (both directions for off-diagonal pairs), so the reduce
    shuffle carries ≤ n·k·(B+1) candidate rows — never the n² score
    matrix; the final per-row top-k is one window over the candidates.
    This is the scale-correct form of "use the whole corpus as the
    query batch": the broadcast-batch GEMM path requires the query set
    to fit in every task, which an all-pairs workload violates by
    definition.

    Similarities round to 6 decimals BEFORE selection (with the
    neighbor id as tiebreak), so the chosen neighbors are reproducible
    across engines and summation orders.  Output: (id, nbr, sim),
    exactly k rows per id (fewer only if the corpus has < k+1 rows).
    """
    from pyspark.sql import Window as W

    both = _block_pair_rows(df, id_col, vec_col, n_blocks)

    def partial_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id": pd.Series(dtype="int64"),
                              "nbr": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        a = pdf[pdf["side"] == 0]
        diagonal = bool((pdf["bi"] == pdf["bj"]).iloc[0])
        b = a if diagonal else pdf[pdf["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return empty
        ma = np.stack(a["v"].to_numpy()).astype(np.float64)
        mb = ma if diagonal else np.stack(b["v"].to_numpy()).astype(np.float64)
        sims = np.round(
            (ma @ mb.T)
            / np.outer(np.linalg.norm(ma, axis=1), np.linalg.norm(mb, axis=1)),
            6,
        )
        ids_a, ids_b = a["id"].to_numpy(), b["id"].to_numpy()

        def emit(S, rows, cols):
            out_i, out_n, out_s = [], [], []
            for r in range(S.shape[0]):
                s = S[r]
                cand = np.flatnonzero(cols != rows[r])
                if len(cand) > k:
                    # sims rounded → ties possible; order by (-sim, id)
                    order = np.lexsort((cols[cand], -s[cand]))
                    cand = cand[order[:k]]
                out_i.extend([rows[r]] * len(cand))
                out_n.extend(cols[cand])
                out_s.extend(s[cand])
            return out_i, out_n, out_s

        i1, n1, s1 = emit(sims, ids_a, ids_b)
        if not diagonal:
            i2, n2, s2 = emit(sims.T, ids_b, ids_a)
            i1, n1, s1 = i1 + i2, n1 + n2, s1 + s2
        return pd.DataFrame({"id": i1, "nbr": n1, "sim": s1})

    cands = both.groupBy("bi", "bj").applyInPandas(
        partial_topk, schema="id long, nbr long, sim double"
    )
    rn = F.row_number().over(
        W.partitionBy("id").orderBy(F.col("sim").desc(), F.col("nbr"))
    )
    return cands.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_candidates: int = 10,
    lam: float = 0.7,
    div_weight: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversity re-rank — the retrieval
    post-processing step that stops a result list collapsing onto one
    near-duplicate cluster: greedily pick argmax of
    ``lam·sim(q,d) − div_weight·max_{s∈S} sim(d,s)``.

    Shape: candidate generation is the GEMM partial-top-k batch
    retrieval (bounded |queries|×n_candidates output); the greedy loop
    runs per query group over ≤ n_candidates rows in one applyInPandas
    pass — sequential by nature, but over a k-bounded group, never the
    corpus.  ``lam`` and ``div_weight`` are independent parameters (not
    1−lam) so both engines evaluate the exact same double literals.

    Determinism: candidate sims and pairwise sims round to 6 decimals
    before scoring, scores round to 6 before argmax, ties break on the
    lower id — the selection is reproducible across engines and
    summation orders (the oracle unrolls the same greedy steps in SQL).
    Output: (query_id, sel_rank 1..k, id_col, mmr_score).
    """
    cand = cosine_topk_batch(
        corpus, queries, k=n_candidates, id_col=id_col, vec_col=vec_col,
        gemm=True,
    ).select("query_id", id_col, F.round("sim", 6).alias("sim"))
    withv = cand.join(
        corpus.select(F.col(id_col), F.col(vec_col).alias("__v")), id_col
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        sims = pdf["sim"].to_numpy()
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
        )
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        P = np.round(Vn @ Vn.T, 6)
        qid = pdf["query_id"].iloc[0]
        sel: list[int] = []
        out = []
        remaining = list(range(len(ids)))
        for rank in range(1, min(k, len(ids)) + 1):
            best = None
            for idx in remaining:
                pen = max((P[idx][j] for j in sel), default=0.0)
                # floor-form half-up rounding in plain IEEE ops — the
                # 6dp inputs make EXACT decimal halves common here, where
                # python round (half-even) and SQL ROUND (half-away)
                # disagree; floor(x*1e6+0.5)/1e6 is bit-identical in any
                # engine evaluating the same double ops
                score = (
                    math.floor((lam * sims[idx] - div_weight * pen) * 1e6 + 0.5)
                    / 1e6
                )
                key = (-score, ids[idx])
                if best is None or key < best[0]:
                    best = (key, idx, score)
            sel.append(best[1])
            remaining.remove(best[1])
            out.append((qid, rank, ids[best[1]], best[2]))
        return pd.DataFrame(
            out, columns=["query_id", "sel_rank", id_col, "mmr_score"]
        )

    qid_ty = queries.schema[id_col].dataType.simpleString()
    cid_ty = corpus.schema[id_col].dataType.simpleString()
    return withv.groupBy("query_id").applyInPandas(
        greedy,
        schema=f"query_id {qid_ty}, sel_rank int, {id_col} {cid_ty}, "
               "mmr_score double",
    )


def group_centroids(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Element-wise mean embedding per group (class centroids, per-domain
    corpus centroids, cluster summaries for SemDedup-style pipelines).

    Plan shape: ``posexplode`` the vector to (key, pos, val) and run one
    hash aggregation on (key, pos).  Catalyst puts the partial aggregate
    map-side, so the shuffle carries #groups × dim partial states per
    task, never n × dim value rows — the same partial-agg contract as
    the k-means step in operators/kmeans.py, expressed declaratively.
    Output is the flat (key, pos, centroid) form: stable to hash-compare
    (no array ordering ambiguity) and directly joinable as a feature.

    Determinism: float32 components widen exactly to double, are rounded
    to ``round_dp + 3`` decimals, and accumulate in DECIMAL — the sum is
    then exact and identical across partial-agg orders and engines; one
    double division (the mean) and a final round follow.
    """
    pos, val = f"{vec_col}_pos", f"{vec_col}_val"
    exploded = df.select(
        F.col(key_col), F.posexplode(vec_col).alias(pos, val)
    )
    # the decimal scale MUST match the pre-round precision, or the cast
    # re-quantizes with engine-native rounding (SCALE.md trap #1)
    acc = F.round(F.col(val).cast("double"), round_dp + 3).cast(
        f"decimal(28,{round_dp + 3})"
    )
    return exploded.groupBy(key_col, pos).agg(
        F.round(
            (F.sum(acc).cast("double") / F.count(val)), round_dp
        ).alias("centroid")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    MOST-SIMILAR rows with a different label (the negatives that move a
    contrastive loss, vs ``negative_samples``'s uniform draws).

    Scale shape: the GEMM batch path with the label mask applied inside
    each Arrow batch before its partial top-k — the window shuffle
    carries |batches|×|queries|×2k rows, never |corpus|×|queries|, and
    the result is exactly the label-filtered top-k (masking before the
    heap, so same-label neighbors can't crowd out true negatives).
    Output (query_id, id, sim rounded 6, rn 1..k)."""
    from pyspark.sql import Window

    scored = _gemm_scores(corpus, queries, 2 * k, id_col, vec_col,
                          label_col=label_col, max_query_rows=max_query_rows)
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, F.round("sim", 6).alias("sim"),
                F.col("rn").cast("int").alias("rn"))
    )


def pack_sign_bits(vec_col, lo: int, hi: int):
    """Sign bits of dims ``lo..hi`` (1-indexed, inclusive) packed into a
    BIGINT — bit (i - lo) set iff element i ≥ 0.  Packed per 32 dims so
    the value stays far from the int64 sign bit on every engine; exact
    because 2^31 is exactly representable in the double pow()."""
    return F.aggregate(
        F.sequence(F.lit(lo), F.lit(hi)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at(vec_col, i.cast("int")) >= 0,
            F.pow(F.lit(2.0), (i - lo).cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def binary_hamming_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantization ANN: 1-bit-per-dimension sign quantization
    (64 dims → two 32-bit words), Hamming-distance candidate scan via
    xor + popcount, exact-cosine rerank of the top ``n_candidates``.

    The modern memory-bound retrieval recipe (32× smaller index than
    float32; Hamming on packed words is a few ALU ops/comparison): scan
    cost is two BIGINTs per row instead of the full vector, the
    candidate heap is ``orderBy().limit()`` (per-partition
    TakeOrderedAndProject, no global sort), and the expensive cosine
    fold touches only ``n_candidates`` rows.  Deterministic end-to-end:
    Hamming ties break on id, so the candidate set — and therefore the
    reranked answer — is reproducible and oracle-parity-checkable.

    At 100 TB: the packed-words table is the only full scan (16 bytes +
    id per row); everything downstream is candidate-sized.
    """
    from fluvio_duck_spark.functions.vectors import cosine

    packed = df.select(
        F.col(id_col),
        F.col(vec_col),
        pack_sign_bits(F.col(vec_col), 1, 32).alias("w1"),
        pack_sign_bits(F.col(vec_col), 33, 64).alias("w2"),
    )
    q = packed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"),
        F.col("w1").alias("__qw1"),
        F.col("w2").alias("__qw2"),
    ).coalesce(1).limit(1)  # unique id; plan-provable broadcast bound
    cand = (
        packed.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            vec_col,
            "__qv",
            (
                F.bit_count(F.col("w1").bitwiseXOR(F.col("__qw1")))
                + F.bit_count(F.col("w2").bitwiseXOR(F.col("__qw2")))
            ).alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(n_candidates)
    )
    return (
        cand.select(
            id_col,
            "hamming",
            cosine(F.col(vec_col), F.col("__qv")).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
