"""Deduplication operators for training-data pipelines, designed for the
100 TB regime:

* **exact** — hash-groupBy on a content fingerprint.  One shuffle on the
  md5 key; partial aggregation makes the map side cheap.
* **n-gram Jaccard (exact)** — w-shingle inverted index self-joined on the
  shingle.  The shuffle key is the shingle; frequent shingles create
  quadratic pair blowup, so ``max_shingle_df`` drops stop-shingles (a
  standard trick — a shingle shared by thousands of docs carries no
  dedup signal).
* **MinHash + LSH** — the scale path: n minhashes per doc (one pass over
  the exploded shingles), banded into b buckets; only same-bucket pairs
  are candidates, then exact Jaccard verification on candidates only.
  Cluster cost: explode + one groupBy(doc) + one self-join on (band,
  signature) whose cardinality is controlled by banding, not by n².
* **SimHash** — 64-bit signature per doc via an Arrow-batched pandas UDF
  (the per-token bit-vote loop is genuinely imperative), then banded
  hamming candidates.

Each returns plain DataFrames; nothing collects to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluvio_duck_spark.functions.text import fingerprint, shingles


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical (normalized) texts: one row per distinct content,
    with the canonical (minimum) id and the copy count."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, k: int, max_shingle_df: int | None
) -> DataFrame:
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("s"))
    if max_shingle_df is not None:
        # drop stop-shingles: bounded fan-out for the self-join at scale
        freq = sh.groupBy("s").agg(F.count("*").alias("df_"))
        sh = (
            sh.join(freq.filter(F.col("df_") <= max_shingle_df), "s")
            .drop("df_")
        )
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 5,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-over-shingles pairs ≥ threshold.

    Inverted-index plan: explode distinct shingles → self-join on the
    shingle (equi-join; Catalyst shuffles both sides by `s` once) → count
    common shingles per pair → join per-doc set sizes → filter.
    """
    sh = _exploded_shingles(df, text_col, id_col, k, max_shingle_df)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    k: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_counts: bool = False,
) -> DataFrame:
    """EXACT Jaccard-over-shingles pairs ≥ threshold via PREFIX
    FILTERING (Chaudhuri et al. SSJoin / Bayardo et al. AllPairs /
    Xiao et al. PPJoin — all published) — the third way to bound the
    inverted-index self-join, complementing ``max_shingle_df`` (drops
    frequent shingles, changes the universe) and MinHash/LSH
    (approximate): prefix filtering keeps the result EXACTLY equal to
    the unbounded all-pairs Jaccard while joining only on each set's
    rarest few shingles.

    Principle: order every doc's shingle set by ascending global
    document frequency (rarest first; ties by shingle).  If
    J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so A's
    (|A| − ⌈t·|A|⌉ + 1)-prefix must contribute an intersection
    element — two qualifying sets MUST share a prefix shingle.  The
    self-join therefore runs on prefixes only (≈ (1−t)·|S| shingles
    per doc, and the rarest ones, so per-shingle fan-out is small);
    candidates are then verified with full intersection counts.

    The threshold is a RATIONAL (num/den) and every comparison is
    integer arithmetic — ⌈t·n⌉ as ``(num·n + den − 1) div den`` and
    the final test as ``den·common ≥ num·(na + nb − common)`` — so no
    float-rounding hazard exists on either engine (binary 0.8·5
    rounds UP to a 5-shingle prefix requirement; exact 4/5 does not).

    Plan: df(shingle) agg + join back (shuffles on the shingle), one
    per-doc window for the frequency rank (bounded group = one doc's
    shingles), prefix self-join on the shingle, then the verification
    equi-join on (doc_b, shingle) restricted to candidate pairs.  No
    stage is quadratic in a shingle's document frequency beyond the
    prefix join itself, which the rarest-first order keeps small —
    the published scale behavior of AllPairs/PPJoin.
    """
    from pyspark.sql import Window as W

    sh = _exploded_shingles(df, text_col, id_col, k, None)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))

    freq = sh.groupBy("s").agg(F.count("*").alias("df_"))
    ranked = (
        sh.join(freq, "s")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy(id_col).orderBy("df_", "s")
            ),
        )
        .join(sizes, id_col)
        # prefix length: n - ceil(t*n) + 1; ceil(a/b) = (a + b - 1) div b
        # (floor of a double ratio is exact while a < 2^53 — shingle
        # counts are nowhere near that)
        .withColumn(
            "pfx",
            F.col("n")
            - F.floor(
                (F.lit(threshold_num) * F.col("n") + threshold_den - 1)
                / threshold_den
            ).cast("long")
            + 1,
        )
    )
    prefix = ranked.filter(F.col("rk") <= F.col("pfx")).select(id_col, "s")

    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )

    # verification: count the FULL intersection for candidate pairs only
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("s"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("s"))
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    za = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    surviving = (
        common.join(za, "doc_a")
        .join(zb, "doc_b")
        .filter(
            F.lit(threshold_den) * F.col("common")
            >= F.lit(threshold_num)
            * (F.col("na") + F.col("nb") - F.col("common"))
        )
    )
    if keep_counts:
        # expose the integer evidence (common, na, nb) so downstream
        # banding/calibration can stay in tie-free integer arithmetic
        return surviving.select(
            "doc_a", "doc_b", "common", "na", "nb", jac.alias("jaccard")
        )
    return surviving.select("doc_a", "doc_b", jac.alias("jaccard"))


def ngram_containment_pairs_prefix(
    df: DataFrame,
    k: int = 5,
    threshold_num: int = 9,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT shingle-CONTAINMENT pairs via prefix filtering — the
    asymmetric cousin of :func:`ngram_jaccard_pairs_prefix` and the op
    behind doc-in-doc duplication (quotes, mirrored excerpts, wrapper
    pages around a copied body): C(A→B) = |A∩B| / |A| ≥ t flags A as
    mostly contained in B even when B is much larger, which a symmetric
    Jaccard threshold misses (|A∪B| grows with B).

    Prefix bound (same SSJoin family, containment form): if
    |A∩B| ≥ ⌈t·|A|⌉ then A's rarest-first prefix of
    |A| − ⌈t·|A|⌉ + 1 shingles must intersect B — so the candidate
    join runs A-PREFIX × FULL-INDEX (containment constrains only the
    contained side, so B probes with all its shingles).  The prefix is
    the globally rarest shingles of each A, so per-shingle fan-out on
    the index side stays df-of-a-rare-shingle-sized.  Candidates are
    verified with full intersection counts; the threshold is a rational
    and every comparison integer (``den·common ≥ num·na``), so the
    result equals the unbounded all-ordered-pairs form exactly.

    Plan: shingle df agg + join back, one per-doc window (bounded
    group), prefix × index equi-join on the shingle, verification
    equi-join restricted to candidates — the AllPairs shape with an
    asymmetric verify.  Output ordered pairs (doc_a contained-in
    doc_b, containment)."""
    from pyspark.sql import Window as W

    sh = _exploded_shingles(df, text_col, id_col, k, None)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))

    freq = sh.groupBy("s").agg(F.count("*").alias("df_"))
    ranked = (
        sh.join(freq, "s")
        .withColumn(
            "rk",
            F.row_number().over(W.partitionBy(id_col).orderBy("df_", "s")),
        )
        .join(sizes, id_col)
        .withColumn(
            "pfx",
            F.col("n")
            - F.floor(
                (F.lit(threshold_num) * F.col("n") + threshold_den - 1)
                / threshold_den
            ).cast("long")
            + 1,
        )
    )
    prefix = ranked.filter(F.col("rk") <= F.col("pfx")).select(
        F.col(id_col).alias("doc_a"), "s"
    )

    index = sh.select(F.col(id_col).alias("doc_b"), "s")
    cand = (
        prefix.join(index, "s")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sa = sh.select(F.col(id_col).alias("doc_a"), "s")
    common = (
        cand.join(sa, "doc_a")
        .join(index, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    za = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    return (
        common.join(za, "doc_a")
        .filter(
            F.lit(threshold_den) * F.col("common")
            >= F.lit(threshold_num) * F.col("na")
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("common").cast("double") / F.col("na")).alias("containment"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    k: int = 5,
    n_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """n_hashes MinHash values per doc: min over shingles of the i-th
    hash function, where hash_i(s) = ``xxhash64(i, xxhash64(s))`` — the
    shingle string is hashed ONCE and the n_hashes permutations re-hash
    the resulting long (a few ALU ops each), not the string.

    Plan shape: explode(shingles) → string-hash → hash-aggregate with
    n_hashes min buffers.  Everything is whole-stage codegen; the
    partial (map-side) aggregation collapses each doc to a single
    signature row before the exchange, so the shuffle volume is
    |docs| × n_hashes longs regardless of document length — at 100 TB of
    text the exchange carries ~1 KB per doc.

    Deliberately NOT the per-row ``array_min(transform(...))`` form: the
    alternative evaluates n_hashes higher-order functions per row in
    interpreted mode (HOFs are excluded from codegen) and re-hashes every
    shingle string n_hashes times — measured 339 s vs 12 s (string
    re-hash) vs 7 s (this form) on 5 000 docs × 128 hashes, local[32]."""
    ex = (
        df.select(F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("s"))
        .select(id_col, F.xxhash64("s").alias("h"))
    )
    # one parsed SQL string per aggregate (identical expression tree to
    # the F.min(F.xxhash64(F.lit(i), ...)) form — xxhash64's SQL spelling
    # uses the same default seed 42 and INT literal): the Column-API loop
    # cost n_hashes × ~5 py4j round trips of plan construction per call
    aggs = [
        F.expr(f"min(xxhash64({i}, h))").alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def band_buckets(
    sig: DataFrame,
    n_hashes: int = 32,
    n_bands: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode a MinHash signature row into its (band, band-hash) LSH
    bucket keys — one row per band.  Shared by the batch pair-join and
    the streaming gate so both sides hash identically."""
    assert n_hashes % n_bands == 0
    rows_per_band = n_hashes // n_bands
    structs = ", ".join(
        "named_struct('band', {b}, 'bh', xxhash64({cols}))".format(
            b=band,
            cols=", ".join(
                f"mh{band * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for band in range(n_bands)
    )
    bands = F.expr(f"array({structs})")
    return sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )


def rowwise_minhash(
    df: DataFrame,
    k: int = 5,
    n_hashes: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Per-row (stateless) MinHash — bit-identical values to the
    aggregate form in minhash_signatures, but computed with array HOFs
    inside the row so a *stream* can evaluate it with no stateful
    aggregation.  Interpreted-HOF cost is the price of statelessness
    (see minhash_signatures' measured comparison); batch pipelines should
    keep using the codegen aggregate form.  Docs with fewer than k tokens
    (empty shingle set) are dropped, matching the aggregate form."""
    def perm(i: int):
        # single-arg lambda: a two-arg lambda would receive the array
        # *index* as its second argument and shadow the captured i
        return lambda h: F.xxhash64(F.lit(i), h)

    hs = F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s))
    out = df.withColumn("__hs", hs).filter(F.size("__hs") > 0)
    for i in range(n_hashes):
        out = out.withColumn(f"mh{i}", F.array_min(F.transform(F.col("__hs"), perm(i))))
    return out.drop("__hs")


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 5,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs.

    b=8 bands × r=4 rows: P(candidate) = 1-(1-j⁴)⁸ — ≈0.99 at j=0.8,
    ≈0.07 at j=0.3.  Candidates are same-(band, band-signature) pairs;
    with verify=True each candidate is checked with exact Jaccard so the
    output has no false positives (LSH then only costs recall, bounded by
    the banding curve)."""
    # docs shorter than k tokens have no shingles and vanish at the
    # explode — correct: they can't be near-dups under shingle Jaccard
    sig = minhash_signatures(df, k, n_hashes, text_col, id_col)
    buckets = band_buckets(sig, n_hashes, n_bands, id_col)
    a, b = buckets.alias("a"), buckets.alias("b")
    # Sort-merge hint on the bucket self-join: without it the tiny local
    # estimate makes AQE broadcast one side, whose BroadcastExchange
    # subtree is planned separately — the whole signature pipeline
    # (shingle explode + n_hashes min-aggs, the expensive stage) runs
    # TWICE.  A shuffle join hashes both sides on (band, bh) with
    # identical children, so ReuseExchange computes the signatures once
    # (guide §2.4).  It is also the only plan that exists at scale:
    # the bucket table is corpus-sized and can never be broadcast.
    cands = (
        a.hint("merge").join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    if not verify:
        return cands

    # Exact verification on candidates only: join each side's shingle SET
    # onto the pair and intersect in-row (array_intersect in codegen) —
    # no explode, no groupBy; cost is O(|candidates| × shingles/doc).
    sets = df.select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sha"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("shb"))
    common = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    union = F.size("sha") + F.size("shb") - common
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (common.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over 5-word shingles (Arrow-batched; numpy bit
    votes).  Shingle features, not unigrams: on a small vocabulary every
    doc shares most unigrams and unigram-SimHash collapses; shingles keep
    the signature discriminative.  Top bit masked so the value stays in
    signed-long range."""
    import hashlib

    import numpy as np

    out = np.empty(len(texts), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        votes = np.zeros(64, dtype=np.int64)
        toks = t.split(" ") if t else []
        feats = (
            {" ".join(toks[j : j + 5]) for j in range(len(toks) - 4)}
            if len(toks) >= 5
            else set(toks)
        )
        for tok in feats:
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")
            )
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            votes += bits * 2 - 1
        sig = 0
        for bit in np.nonzero(votes > 0)[0]:
            sig |= 1 << int(bit)
        out[i] = sig & 0x7FFFFFFFFFFFFFFF
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), _simhash64(F.col(text_col)).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dups: band the 64-bit signature into 4 × 16-bit chunks;
    any pair within hamming distance ≤ 3 shares at least one chunk
    (pigeonhole), so the candidate join is an equi-join on the chunk, then
    an exact popcount filter."""
    # Materialization barrier: the signature feeds BOTH sides of the
    # self-join plus the hamming filter, and without a barrier Catalyst
    # inlines the pandas UDF into each consumer — 4 ArrowEvalPython
    # passes over the corpus (observed in the executed plan).  A
    # repartition on the id materializes (id, simhash) — 16 bytes/doc —
    # into one exchange that every consumer re-reads (ReusedExchange),
    # so Python runs exactly once per document.
    sig = simhash(df, text_col, id_col).repartition(F.col(id_col))
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for c in range(4)
        ]
    )
    banded = sig.select(id_col, "simhash", F.explode(chunks).alias("ck")).select(
        id_col, "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.cv").alias("cv")
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph → the cluster
    assignment a dedup pipeline actually needs (pairs alone can't pick
    survivors: A~B and B~C must collapse to ONE keeper even when A~C was
    never emitted).  Output: ``(id, component)`` where component = min
    node id in the cluster — i.e. the canonical survivor.

    Algorithm: iterative min-label propagation.  Each round every node
    takes the min of its own label and its neighbors' labels; converges
    in O(component diameter) rounds — near-dup clusters are shallow
    (diameter rarely >3), so this terminates in a handful of shuffles.
    Each round ``localCheckpoint``s to truncate lineage (an iterative
    plan otherwise grows unboundedly and re-executes from scratch).
    At web scale the same loop is the core of the large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce"); the
    propagation step here IS small-star — large-star only matters for
    high-diameter graphs, which near-dup clusters are not.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).localCheckpoint()
    # ^ materialize the symmetric edge list ONCE (edge-sized — the same
    # bound as the per-round shuffles below): without this, every
    # propagation round's join re-executes the caller's pair-generation
    # pipeline (LSH banding / blocked GEMM — usually the most expensive
    # subtree in the query) from scratch, max_iter times.  Measured r13
    # (same-session A/B, warm best-of-3): dedup_survivorship
    # 3.99 → 2.83 s, dedup_components 3.18 → 2.29 s at sf0.1.
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    # Convergence probe: labels are monotonically non-increasing under
    # min-propagation, so the label SUM strictly decreases on any change
    # and is stationary exactly at the fixed point — one narrow
    # aggregation over the freshly checkpointed labels replaces the
    # old per-round join(new, old) + filter + count probe (two
    # node-sized shuffles per round).  DECIMAL(38,0) keeps the sum
    # exact at any node-id magnitude/count.
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct k-word shingles it shares with the benchmark/eval set
    (a doc with any overlap is a leak candidate; the count grades
    severity).

    Plan shape for 100 TB: the benchmark side is an eval suite — tiny by
    construction relative to the corpus — so its distinct shingle set is
    **broadcast** and the corpus side stays map-only through the join;
    the only shuffle is the final per-doc count, keyed on ``id_col``
    (no skew: a doc contributes at most its own shingle count).
    ``shingles`` is already per-doc distinct, so ``count(*)`` after the
    join counts distinct shared shingles.
    """
    bench_grams = bench.select(F.explode(shingles(text_col, k)).alias("s")).distinct()
    doc_grams = corpus.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("s"))
    return (
        doc_grams.join(F.broadcast(bench_grams), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def _word_segments(
    df: DataFrame, text_col: str, id_col: str, words_per_segment: int
) -> DataFrame:
    """Explode each document into fixed-width word segments:
    (id, seg_idx, segment) rows — the shared map-side front end of the
    corpus-wide segment passes.  The tokens column is materialized
    *before* the HOF lambda so the interpreted lambda only references a
    column attribute (SCALE.md rule 4)."""
    w = int(words_per_segment)
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_tk"))
    n_seg = F.ceil(F.size("_tk") / F.lit(float(w))).cast("int")
    segments = F.when(F.size("_tk") <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_seg - F.lit(1)),
            lambda i: F.array_join(F.slice("_tk", i * F.lit(w) + F.lit(1), w), " "),
        )
    )
    return toks.select(
        F.col(id_col), F.posexplode(segments).alias("seg_idx", "segment")
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_segment: int = 10,
) -> DataFrame:
    """Corpus-wide exact segment dedup (the C4/RefinedWeb "remove
    duplicate paragraphs across documents" pass): split each document
    into fixed-width word segments, keep only the globally-first
    occurrence of every distinct segment (first = lowest (id, position)),
    and reassemble each document from its surviving segments.

    With newline-delimited corpora the segment would be the literal
    line/paragraph; the fixture corpus is single-line, so a fixed
    word-window stands in — the dataflow is identical either way:

    explode (map-side) → keep-first window, ONE shuffle on the segment
    key → reassembly groupBy on the doc id (2nd shuffle).  Both shuffle
    keyspaces are data-sized but the exploded rows carry only (id, idx,
    segment) — no full-document rows move.  The segment tokens column is
    materialized *before* the HOF lambda so the interpreted lambda only
    references a column attribute (SCALE.md rule 4).

    Returns ``(id, n_segments_kept, dedup_text)``; docs whose every
    segment appeared earlier elsewhere drop out entirely (count 0 docs
    are deleted, matching C4's empty-doc removal).
    """
    from pyspark.sql import Window as W

    segd = _word_segments(df, text_col, id_col, words_per_segment)
    rn = F.row_number().over(
        W.partitionBy("segment").orderBy(F.col(id_col), F.col("seg_idx"))
    )
    kept = segd.withColumn("rn", rn).filter(F.col("rn") == 1)
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_segments_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "segment"))),
                lambda s: s.segment,
            ),
            " ",
        ).alias("dedup_text"),
    )


def boilerplate_segment_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_segment: int = 10,
    max_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the RefinedWeb/CCNet "strip
    nav-bars and cookie banners" pass): drop EVERY copy of a segment that
    appears in more than ``max_doc_freq`` distinct documents — including
    the first occurrence, which is what distinguishes this from
    :func:`segment_dedup`'s keep-first semantics — then reassemble the
    surviving text.  A segment repeated *within* one document is not
    boilerplate (document frequency counts distinct docs, not copies).

    Plan shape: segment explode (map-side) → document-frequency groupBy
    on the segment key (two-phase: partial distinct per map task) →
    LEFT ANTI equi-join of the exploded rows against the over-frequent
    segments (both sides already hash on ``segment``, so AQE reuses the
    exchange) → reassembly groupBy on the doc id.  No all-pairs step;
    the anti-join's build side is only the boilerplate vocabulary, which
    is corpus-frequency-bounded and tiny relative to the corpus — at
    100 TB it is broadcastable, and AQE picks that automatically.

    Returns ``(id, n_segments_kept, clean_text)``; documents that were
    pure boilerplate drop out (C4-style empty-doc removal).
    """
    segd = _word_segments(df, text_col, id_col, words_per_segment)
    frequent = (
        segd.groupBy("segment")
        .agg(F.count_distinct(F.col(id_col)).alias("df_"))
        .filter(F.col("df_") > max_doc_freq)
        .select("segment")
    )
    kept = segd.join(frequent, "segment", "left_anti")
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_segments_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "segment"))),
                lambda s: s.segment,
            ),
            " ",
        ).alias("clean_text"),
    )


def substring_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_span: int = 8,
) -> DataFrame:
    """Unaligned duplicated-span removal — the sliding-window form of
    exact substring dedup (the "remove any ≥N-token span that repeats
    across documents" pass of Lee et al.'s train-data dedup, windowed
    n-grams standing in for the suffix array): every token position
    covered by ANY cross-document duplicated ``min_span``-gram is
    removed from EVERY document, and the survivors reassemble.  Unlike
    :func:`segment_dedup` (fixed aligned windows), spans here match at
    any offset, so a quote shifted by one word still dies.

    Plan shape, all corpus-sized steps bounded: sliding n-grams build
    IN-ROW (transform over a sequence — no self-join) and explode to
    (id, gpos, gram); the duplicate set is one groupBy on the gram
    string (map-side combined, distinct-doc counted); covered positions
    explode only from *duplicated* gram hits (fan-out L per hit, not per
    token); the keep-side is a LEFT ANTI equi-join on (id, pos) and one
    reassembly groupBy.  The gram string itself is the join key so the
    SQL oracle shares it exactly (engine hash functions differ).

    Returns ``(id, n_tokens_kept, clean_text)``; fully-duplicated
    documents drop out.
    """
    L = int(min_span)
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_tk"))
    pos_tok = toks.select(
        F.col(id_col), F.posexplode("_tk").alias("pos0", "token")
    )
    n_grams = F.greatest(F.size("_tk") - F.lit(L - 1), F.lit(0))
    grams_arr = F.when(n_grams <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.array_join(F.slice("_tk", i, L), " "),
        )
    )
    grams = toks.select(
        F.col(id_col), F.posexplode(grams_arr).alias("gpos0", "gram")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    covered = (
        grams.join(dup, "gram")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("gpos0"), F.col("gpos0") + F.lit(L - 1))
            ).alias("pos0"),
        )
        .distinct()
    )
    kept = pos_tok.join(covered, [id_col, "pos0"], "left_anti")
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos0", "token"))),
                lambda s: s.token,
            ),
            " ",
        ).alias("clean_text"),
    )


def edit_distance_pairs(
    vocab: DataFrame,
    token_col: str = "token",
    max_dist: int = 1,
) -> DataFrame:
    """Token pairs within Levenshtein distance ``max_dist`` (1 or 2), via
    SymSpell-style deletion-neighborhood blocking — the fuzzy-matching
    step of a vocabulary-normalization / typo-dedup pass.

    Every token emits every variant reachable by deleting up to
    ``max_dist`` characters (itself included); two tokens within edit
    distance d share such a variant whenever d <= max_dist (the SymSpell
    invariant: align the edit script and delete the edited positions
    from each side), so an equi-join on the variant finds every true
    pair.  Candidates then verify with one exact ``levenshtein`` call.

    Scale shape: per-token fan-out is O(len^max_dist) variants (bounded:
    cap token length upstream), the join is an equi-join on the variant
    string — no n² pass anywhere, and the verify filter runs only on
    candidates.  Contrast with the oracle's all-pairs form, which is
    quadratic in vocabulary size and exists only to check this plan.
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")

    def dels(col):
        # all single-deletion forms of a string column
        return F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substr(col, F.lit(1), i - F.lit(1)),
                F.substr(col, i + F.lit(1), F.length(col)),
            ),
        )

    t = vocab.select(F.col(token_col).alias("token")).distinct()
    v1 = t.select(
        "token",
        F.explode(
            F.array_union(F.array(F.col("token")), dels(F.col("token")))
        ).alias("v"),
    )
    if max_dist == 1:
        variants = v1
    else:
        variants = v1.select(
            "token",
            F.explode(
                F.array_union(F.array(F.col("v")), dels(F.col("v")))
            ).alias("v"),
        ).distinct()
    a = variants.alias("a")
    b = variants.alias("b")
    cands = (
        a.join(b, (F.col("a.v") == F.col("b.v"))
               & (F.col("a.token") < F.col("b.token")))
        .select(
            F.col("a.token").alias("token_a"),
            F.col("b.token").alias("token_b"),
        )
        .distinct()
    )
    return cands.select(
        "token_a",
        "token_b",
        F.levenshtein("token_a", "token_b").alias("dist"),
    ).filter(F.col("dist") <= max_dist)


# -- portable MinHash (engine-reproducible) ---------------------------------

#: Knuth-multiplicative weight families for the portable MinHash chain.
#: Fixed forever: the whole point is that ANY engine with md5/ascii/substr
#: and 64-bit integer arithmetic reproduces identical signatures.
_PMH_W16 = [(i * 2654435761) % 1000003 for i in range(1, 17)]
_PMH_P = 1_000_000_007
_PMH_P2 = 998_244_353
_PMH_A = [(((2 * i + 1) * 2654435761) % 1000003) | 1 for i in range(64)]
_PMH_B = [(i * 40503) % 999983 for i in range(64)]
_PMH_V = [((r + 7) * 2654435761) % 1000003 for r in range(16)]


def portable_text_hash(col) -> F.Column:
    """Engine-portable string → long: weighted ascii fold of the first
    16 md5 hex chars (~2^31 span — plenty for within-doc MinHash).

    Accepts a plain column NAME (preferred — the 16-term fold parses as
    ONE SQL string instead of ~100 py4j round trips of Column-API plan
    construction per call) or any Column expression (loop fallback,
    same expression tree)."""
    if isinstance(col, str):
        terms = " + ".join(
            f"CAST(ascii(substring(md5(`{col}`), {i}, 1)) AS BIGINT) * {w}"
            for i, w in enumerate(_PMH_W16, start=1)
        )
        return F.expr(terms)
    h = F.md5(col)
    term = None
    for i, w in enumerate(_PMH_W16, start=1):
        t = F.ascii(F.substring(h, i, 1)).cast("long") * F.lit(w)
        term = t if term is None else term + t
    return term


def portable_text_hash_sql(expr: str) -> str:
    # every factor cast to BIGINT up front: DuckDB's INTEGER arithmetic
    # is overflow-checked, not silently promoted
    terms = " + ".join(
        f"CAST(ascii(substr(md5({expr}), {i}, 1)) AS BIGINT) * {w}"
        for i, w in enumerate(_PMH_W16, start=1)
    )
    return f"CAST(({terms}) AS BIGINT)"


def minhash_portable_buckets(
    df: DataFrame,
    k: int = 5,
    n_hashes: int = 32,
    n_bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, bh) LSH bucket keys from the portable hash chain —
    shared by the batch pair join and the streaming gate so both sides
    hash identically (the portable twin of ``band_buckets``)."""
    assert n_hashes % n_bands == 0 and n_hashes <= 64
    rpb = n_hashes // n_bands

    # single parsed SQL strings throughout (identical expression trees
    # to the former Column-API loops, ~300 fewer py4j round trips of
    # plan construction per call — see minhash_signatures)
    ex = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("s")
    ).select(id_col, portable_text_hash("s").alias("h"))
    aggs = [
        F.expr(f"min(pmod(h * {_PMH_A[i]} + {_PMH_B[i]}, {_PMH_P}))")
        .alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = ex.groupBy(id_col).agg(*aggs)

    structs = ", ".join(
        "named_struct('band', {b}, 'bh', pmod({terms}, {p2}))".format(
            b=band,
            terms="0 + " + " + ".join(
                f"mh{band * rpb + r} * {_PMH_V[r]}" for r in range(rpb)
            ),
            p2=_PMH_P2,
        )
        for band in range(n_bands)
    )
    bands = F.expr(f"array({structs})")
    return sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )


def minhash_lsh_pairs_portable(
    df: DataFrame,
    k: int = 5,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs with an ENGINE-PORTABLE hash
    chain, so the whole approximate pipeline is exactly reproducible by
    any SQL engine (the xxhash64 form in ``minhash_lsh_pairs`` is the
    performance path; this is the auditable one — same plan shape, same
    banding curve, rows-only becomes hash-checked).

    Chain: shingle → md5 ascii-fold base hash h; permutation i →
    (A_i·h + B_i) mod 1e9+7 (products ≤ ~1.6e15, comfortably in int64
    on every engine); band hash → Σ mh_j·V_j mod 998244353.  Candidates
    are same-(band, bh) pairs; each is verified with exact Jaccard
    (rational threshold, integer comparison), so output has no false
    positives and the banding curve only costs recall.

    Plan shape is the measured-fast form from ``minhash_signatures``:
    explode → hash string ONCE → hash-aggregate with n_hashes min
    buffers (map-side combine ⇒ shuffle = |docs| × n_hashes longs)."""
    buckets = minhash_portable_buckets(
        df, k, n_hashes, n_bands, text_col, id_col
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    # merge hint: see minhash_lsh_pairs — a broadcast self-join would
    # plan the signature pipeline twice; the shuffle join's identical
    # exchanges are computed once via ReuseExchange, and a broadcast of
    # the corpus-sized bucket table is impossible at scale anyway
    cands = (
        a.hint("merge").join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    sets = df.select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sha"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("shb"))
    common = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    union = F.size("sha") + F.size("shb") - common
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.lit(threshold_den) * common >= F.lit(threshold_num) * union
        )
        .select(
            "doc_a",
            "doc_b",
            (common.cast("double") / union).alias("jaccard"),
        )
    )


def minhash_lsh_portable_oracle_sql(
    k: int = 5,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> str:
    """The identical pipeline as DuckDB SQL, generated from the same
    constant tables — signatures, banding, candidates, and the exact
    verification all replicated."""
    return _minhash_portable_ctes(k, n_hashes, n_bands) + f"""
,cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk a JOIN bk b USING (band, bh) WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
com AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS cn
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(cn AS DOUBLE) / (sa.n + sb.n - cn) AS jaccard
FROM com
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE {threshold_den} * cn >= {threshold_num} * (sa.n + sb.n - cn)
"""


def _minhash_portable_ctes(
    k: int = 5, n_hashes: int = 32, n_bands: int = 8
) -> str:
    """Shared CTE chain (shingles → base hash → signatures → buckets)
    for the portable-MinHash oracles."""
    rpb = n_hashes // n_bands
    mh_aggs = ",\n         ".join(
        f"MIN((h * {_PMH_A[i]} + {_PMH_B[i]}) % {_PMH_P}) AS mh{i}"
        for i in range(n_hashes)
    )
    band_arms = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {band} AS band, ({expr}) % {p2} AS bh FROM sig".format(
            band=band,
            p2=_PMH_P2,
            expr=" + ".join(
                f"mh{band * rpb + r} * {_PMH_V[r]}" for r in range(rpb)
            ),
        )
        for band in range(n_bands)
    )
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {k - 2}, 1)),
           i -> concat_ws(' ', {", ".join(f"w[i+{j}]" for j in range(k))})))) AS s
  FROM w),
hh AS (SELECT doc_id, {portable_text_hash_sql("s")} AS h FROM sh),
sig AS (
  SELECT doc_id,
         {mh_aggs}
  FROM hh GROUP BY doc_id),
bk AS (
{band_arms})"""


def minhash_portable_gate_oracle_sql(
    k: int = 5, n_hashes: int = 32, n_bands: int = 8
) -> str:
    """Oracle for the streaming portable near-dup gate: per doc, the
    number of DISTINCT other docs sharing any LSH band bucket."""
    return _minhash_portable_ctes(k, n_hashes, n_bands) + """
SELECT doc_id, CAST(COUNT(DISTINCT other) AS INTEGER) AS n_partners
FROM (SELECT a.doc_id AS doc_id, b.doc_id AS other
      FROM bk a JOIN bk b USING (band, bh) WHERE a.doc_id <> b.doc_id) z
GROUP BY doc_id
"""


def portable_text_hash2(col) -> F.Column:
    """Second independent portable fold (md5 hex chars 17..32) — paired
    with ``portable_text_hash`` when one 31-bit value isn't enough."""
    h = F.md5(col)
    term = None
    for i, w in enumerate(_PMH_W16, start=1):
        t = F.ascii(F.substring(h, i + 16, 1)).cast("long") * F.lit(w)
        term = t if term is None else term + t
    return term


_SIMHASH_BITS = 60  # 4 bands × 15 bits; stays clear of the int64 sign


def simhash_portable_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """60-bit SimHash per doc with NO Python and an engine-portable hash
    chain — the JVM-expression twin of the pandas-UDF ``simhash``:
    per-token bit votes become 60 conditional SUM aggregates over the
    exploded token table (the same codegen hash-agg shape that made
    ``minhash_signatures`` 50× faster than its HOF form), so Python
    leaves the hot path entirely AND any SQL engine reproduces the
    signature.  Bit b of a token = parity of (h·A_b + B_b) mod 1e9+7
    over the md5 ascii-fold base hash — per-bit rehashing keeps each
    vote unbiased even though the base fold is sum-shaped."""
    from fluvio_duck_spark.operators.chunking import tokenize

    toks = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    ).filter(F.col("token") != "")
    h = portable_text_hash("token")
    # single parsed SQL strings (identical expression trees to the
    # former Column-API loops — 60 aggs × ~12 + 60 sig terms × ~5 py4j
    # round trips of plan construction saved per call)
    votes = toks.select(F.col(id_col), h.alias("h")).groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN pmod(pmod(h * {_PMH_A[b]} + {_PMH_B[b]}, "
                f"{_PMH_P}), 2) = 1 THEN 1 ELSE -1 END)"
            ).alias(f"v{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    sig = F.expr(
        " + ".join(
            f"CASE WHEN v{b} >= 0 THEN CAST({1 << b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"
            for b in range(_SIMHASH_BITS)
        )
    )
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dup_pairs_portable(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded-hamming near-dup pairs over the portable SimHash: 4 ×
    15-bit chunks — any pair within hamming ≤ 3 shares a chunk
    (pigeonhole) — equi-join on the chunk, exact popcount filter.
    Same plan as ``simhash_near_dup_pairs`` minus the Python pass and
    its materialization barrier (nothing to keep from re-running:
    the signature is plain codegen)."""
    sig = simhash_portable_signatures(df, text_col, id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 15)
                .bitwiseAND(F.lit(0x7FFF))
                .alias("cv"),
            )
            for c in range(4)
        ]
    )
    banded = sig.select(id_col, "simhash", F.explode(chunks).alias("ck")).select(
        id_col, "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.cv").alias("cv")
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_portable_oracle_sql(max_hamming: int = 3) -> str:
    """The identical portable SimHash pipeline as DuckDB SQL."""
    fold = " + ".join(
        f"CAST(ascii(substr(md5(token), {i}, 1)) AS BIGINT) * {w}"
        for i, w in enumerate(_PMH_W16, start=1)
    )
    votes = ",\n         ".join(
        f"SUM(CASE WHEN ((h * {_PMH_A[b]} + {_PMH_B[b]}) % {_PMH_P}) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{b}"
        for b in range(_SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    chunk_arms = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {c} AS chunk, (simhash >> {c * 15}) & 32767 AS cv FROM sig"
        for c in range(4)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
hh AS (SELECT doc_id, CAST(({fold}) AS BIGINT) AS h
       FROM tok WHERE token <> ''),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hh GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes),
bk AS (
{chunk_arms}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
  FROM bk a JOIN bk b USING (chunk, cv)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {max_hamming}
"""


def minhash_portable_gate_incremental_oracle_sql(
    k: int = 5, n_hashes: int = 32, n_bands: int = 8
) -> str:
    """Oracle for the INCREMENTAL streaming near-dup gate: per doc, the
    number of DISTINCT EARLIER docs (lower id = earlier log offset)
    sharing any LSH band bucket — the grows-with-the-stream index
    semantics.  'Earlier' is defined on the id, not the batch, so the
    result is micro-batch-split-independent and SQL-expressible."""
    return _minhash_portable_ctes(k, n_hashes, n_bands) + """
SELECT doc_id, CAST(COUNT(DISTINCT other) AS INTEGER) AS n_prior_dups
FROM (SELECT a.doc_id AS doc_id, b.doc_id AS other
      FROM bk a JOIN bk b USING (band, bh) WHERE b.doc_id < a.doc_id) z
GROUP BY doc_id
"""
