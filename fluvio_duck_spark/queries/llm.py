"""Training-data-pipeline queries (dedup / similarity / text analysis)
over the ``documents`` and ``embeddings`` fixtures, oracle-paired where the
semantics are SQL-expressible.

Where an operator is hash-based (MinHash, SimHash, hyperplane LSH) the
Spark hash functions have no DuckDB equivalent, so those entries are
rows-only; their *verification* happens in tests/test_llm_ops.py against
the exact (oracle-checked) variants — e.g. LSH candidate pairs must
contain every exact-Jaccard pair above the banding curve's high-recall
region, and the ANN result is measured for recall against brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluvio_duck_spark.functions.text import (
    char_count,
    fingerprint,
    lang_id,
    mean_token_len,
    prefix_fingerprint,
    quality_score,
    stopword_ratio,
    token_count,
    winnow_fingerprints,
)
from fluvio_duck_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from fluvio_duck_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
)
from fluvio_duck_spark.queries import QuerySpec
from fluvio_duck_spark.sources.tables import load

_STOPLIST_SQL = "('the','a','of','and','to','in','is','it')"


def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf.

    Corpus-level feature extraction shape: term explode → per-(doc,term)
    counts (shuffle on doc+term) → vocabulary doc-frequencies → tf⋈df
    join on term (left to AQE: sort-merge or broadcast by *measured*
    size — a 100 TB corpus's vocabulary is NOT assumed broadcastable)
    → per-doc ranking window.  The corpus size N is folded in lazily as
    a 1-row aggregate crossJoin (the LEO pattern, sources/consume.py),
    not an eager ``count()`` — no driver action, no second corpus scan
    at plan-build time.  idf uses the rational form N/df (no log) so the
    score is an exact integer product over one double division —
    bit-identical across engines."""
    from pyspark.sql import Window as W

    from fluvio_duck_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.agg(F.count("*").alias("__n_docs"))
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = (
        terms.select("doc_id", "term").distinct()
        .groupBy("term").agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("__n_docs")).cast("double") / F.col("df"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score")
    )


ORACLE_TFIDF = """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT doc_id, term, CAST(tf * n AS DOUBLE) / df AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
      FROM s)
SELECT doc_id, term, score FROM r WHERE rn <= 3
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals, adapted to the fixture's
    token streams (no newlines → token n-grams instead of lines):
    distinct-token ratio, fraction of tokens covered by the most frequent
    bigram, and fraction of trigram occurrences that are duplicated
    within the doc.

    Scale shape: n-grams are built as array expressions inside the row
    (no self-join), then explode → two (doc_id, gram) aggregations with
    map-side combine; the per-doc reductions join back on doc_id.  All
    ratios are exact-integer numerators over one double division."""
    from fluvio_duck_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select(
        "doc_id",
        tokens("text").alias("toks"),
    ).select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_tokens"),
        F.expr(
            "transform(slice(toks, 1, size(toks)-1), (t, i) -> concat(t, ' ', toks[i+1]))"
        ).alias("bigrams"),
        F.expr(
            "transform(slice(toks, 1, size(toks)-2),"
            " (t, i) -> concat(t, ' ', toks[i+1], ' ', toks[i+2]))"
        ).alias("trigrams"),
    )
    base = d.select(
        "doc_id",
        "n_tokens",
        (F.size(F.array_distinct("toks")).cast("double") / F.col("n_tokens"))
        .alias("distinct_ratio"),
    )
    top_bg = (
        d.select("doc_id", F.explode("bigrams").alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("top_c"))
    )
    dup_tg = (
        d.select("doc_id", F.explode("trigrams").alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup"),
            F.sum("c").alias("tot"),
        )
    )
    return (
        base.join(top_bg, "doc_id")
        .join(dup_tg, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "distinct_ratio",
            ((F.col("top_c") * F.lit(2)).cast("double") / F.col("n_tokens"))
            .alias("top_bigram_frac"),
            (F.col("dup").cast("double") / F.col("tot")).alias("dup_trigram_frac"),
        )
    )


ORACLE_REPETITION = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
base AS (SELECT doc_id, len(toks) AS n_tokens,
                CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
         FROM d),
t AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM d),
grams AS (SELECT doc_id,
                 tok || ' ' || lead(tok)    OVER w AS bg,
                 tok || ' ' || lead(tok)    OVER w || ' ' || lead(tok, 2) OVER w AS tg
          FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
topbg AS (SELECT doc_id, MAX(c) AS top_c
          FROM (SELECT doc_id, bg, COUNT(*) AS c FROM grams
                WHERE bg IS NOT NULL GROUP BY 1, 2) GROUP BY 1),
duptg AS (SELECT doc_id,
                 SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, SUM(c) AS tot
          FROM (SELECT doc_id, tg, COUNT(*) AS c FROM grams
                WHERE tg IS NOT NULL GROUP BY 1, 2) GROUP BY 1)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, distinct_ratio,
       CAST(top_c * 2 AS DOUBLE) / n_tokens AS top_bigram_frac,
       CAST(dup AS DOUBLE) / tot AS dup_trigram_frac
FROM base JOIN topbg USING (doc_id) JOIN duptg USING (doc_id)
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        char_count("text").alias("n_chars_m"),
        stopword_ratio("text").alias("stopword_ratio"),
        mean_token_len("text").alias("mean_token_len"),
    )


ORACLE_TEXT_STATS = f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
  CAST(length(text) AS INTEGER) AS n_chars_m,
  CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOPLIST_SQL})) AS DOUBLE)
    / len(string_split(text, ' ')) AS stopword_ratio,
  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
    / len(string_split(text, ' ')) AS mean_token_len
FROM documents
"""


def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution — the
    classic gibberish/repetition quality signal (low entropy = repeated
    or templated text, very high = random noise).

    Plan shape: the per-character explode is map-side only — the first
    exchange carries partially-aggregated (doc, char, count) rows, at
    most |alphabet| per doc per map task, NOT per-character rows; the
    per-doc reduce is a second map-side-combined groupBy.  Entropy uses
    the Σ c·log2 c identity (H = log2 n − (Σ c·log2 c)/n) so no
    per-term division or pre-computed total is needed.

    Determinism: each c·log2(c) term is rounded to 1e-6 via explicit
    floor(x·1e6 + 0.5) IEEE ops and summed as exact integer DECIMAL, so
    partial-aggregation order cannot move the hash; the final round(…, 6)
    erases sub-1e-11 libm log2 divergence between engines."""
    d = load(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    term6 = F.floor(
        F.col("c") * F.log2("c") * F.lit(1e6) + F.lit(0.5)
    ).cast("decimal(28,0)")
    per = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars_counted"),
        F.count("*").alias("n_distinct_chars"),
        F.sum(term6).alias("_s6"),
    )
    entropy = F.round(
        F.log2("n_chars_counted")
        - (F.col("_s6").cast("double") / F.lit(1e6)) / F.col("n_chars_counted"),
        6,
    )
    return per.select(
        "doc_id",
        "n_chars_counted",
        "n_distinct_chars",
        entropy.alias("entropy_bits"),
        (entropy < F.lit(3.0)).alias("low_entropy"),
    )


ORACLE_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id,
         substr(text, CAST(unnest(range(1, length(text)+1)) AS INTEGER), 1) AS ch
  FROM documents
), counts AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
), per AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_chars_counted,
         count(*) AS n_distinct_chars,
         sum(CAST(floor(c * log2(c) * 1e6 + 0.5) AS DECIMAL(28,0))) AS s6
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_chars_counted, CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
       round(log2(n_chars_counted) - (CAST(s6 AS DOUBLE)/1e6)/n_chars_counted, 6)
         AS entropy_bits,
       round(log2(n_chars_counted) - (CAST(s6 AS DOUBLE)/1e6)/n_chars_counted, 6) < 3.0
         AS low_entropy
FROM per
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        quality_score("text").alias("quality_score"),
        lang_id("text").alias("lang_guess"),
    )


ORACLE_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text,' '), t -> t IN {_STOPLIST_SQL})) AS DOUBLE)
      / len(string_split(text,' ')) AS sw,
    CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
      / len(string_split(text,' ')) AS mtl
  FROM documents)
SELECT doc_id,
  least(sw * 4.0, 1.0) * 0.5 + (1.0 - least(abs(mtl - 5.0) / 5.0, 1.0)) * 0.5
    AS quality_score,
  CASE WHEN sw >= 0.04 THEN 'en' ELSE 'unknown' END AS lang_guess
FROM t
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load(spark, sf_dir, "documents"))


ORACLE_DEDUP_EXACT = """
SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized exact dedup (the CCNet/C4 normalization pass):
    lowercase + strip non-word chars + collapse whitespace BEFORE
    hashing, so case/punctuation/spacing variants collapse into one
    group.  n_raw_variants counts how many distinct raw contents the
    canonical form merged — the dedup the raw hash misses."""
    from fluvio_duck_spark.functions.text import canonical_text

    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            fingerprint("text").alias("raw_fp"),
            F.md5(canonical_text("text")).alias("canon_fp"),
        )
        .groupBy("canon_fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
            F.countDistinct("raw_fp").alias("n_raw_variants"),
        )
    )


ORACLE_DEDUP_CANONICAL = """
WITH c AS (
  SELECT doc_id, md5(lower(trim(text))) AS raw_fp,
         md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
               '\\s+', ' ', 'g'))) AS canon_fp
  FROM documents)
SELECT canon_fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies,
       COUNT(DISTINCT raw_fp) AS n_raw_variants
FROM c GROUP BY canon_fp
"""


def q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact segment dedup (C4-style duplicate-paragraph
    removal, fixed 10-word segments on the single-line fixture): every
    distinct segment survives only at its globally-first (doc, position)
    occurrence, then documents are reassembled from survivors."""
    from fluvio_duck_spark.operators.dedup import segment_dedup

    return segment_dedup(load(spark, sf_dir, "documents"), words_per_segment=10)


ORACLE_DEDUP_SEGMENTS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
idx AS (
  SELECT doc_id, tk,
         CAST(unnest(range(0, CAST(ceil(CAST(len(tk) AS DOUBLE)/10) AS BIGINT))) AS INTEGER) AS seg_idx
  FROM toks),
segs AS (
  SELECT doc_id, seg_idx,
         array_to_string(tk[(seg_idx*10+1):(seg_idx*10+10)], ' ') AS segment
  FROM idx),
kept AS (
  SELECT doc_id, seg_idx, segment,
         row_number() OVER (PARTITION BY segment ORDER BY doc_id, seg_idx) AS rn
  FROM segs)
SELECT doc_id, COUNT(*) AS n_segments_kept,
       string_agg(segment, ' ' ORDER BY seg_idx) AS dedup_text
FROM kept WHERE rn = 1
GROUP BY doc_id
"""


def q_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal: every copy of a 10-word
    segment appearing in >1 distinct documents is stripped (including
    the first occurrence — contrast ``dedup_segments``' keep-first),
    and documents are reassembled from what survives."""
    from fluvio_duck_spark.operators.dedup import boilerplate_segment_removal

    return boilerplate_segment_removal(
        load(spark, sf_dir, "documents"), words_per_segment=10, max_doc_freq=1
    )


ORACLE_DEDUP_BOILERPLATE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
idx AS (
  SELECT doc_id, tk,
         CAST(unnest(range(0, CAST(ceil(CAST(len(tk) AS DOUBLE)/10) AS BIGINT))) AS INTEGER) AS seg_idx
  FROM toks),
segs AS (
  SELECT doc_id, seg_idx,
         array_to_string(tk[(seg_idx*10+1):(seg_idx*10+10)], ' ') AS segment
  FROM idx),
freq AS (
  SELECT segment FROM segs GROUP BY segment
  HAVING COUNT(DISTINCT doc_id) > 1)
SELECT doc_id, COUNT(*) AS n_segments_kept,
       string_agg(segment, ' ' ORDER BY seg_idx) AS clean_text
FROM segs s
WHERE NOT EXISTS (SELECT 1 FROM freq f WHERE f.segment = s.segment)
GROUP BY doc_id
"""


def q_dedup_prefix_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-key canonicalization: docs sharing the first-3-token
    fingerprint collapse to the minimum doc_id."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", prefix_fingerprint("text", 3).alias("block"))
        .groupBy("block")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


ORACLE_DEDUP_PREFIX = """
WITH b AS (
  SELECT doc_id,
         md5(concat_ws(' ', string_split(text,' ')[1],
                            string_split(text,' ')[2],
                            string_split(text,' ')[3])) AS block
  FROM documents)
SELECT block, min(doc_id) AS canonical_id, COUNT(*) AS n_docs
FROM b GROUP BY block HAVING COUNT(*) > 1
"""


#: Stop-shingle bound for the exact-Jaccard query (VERDICT r3 #3): a
#: shingle shared by D docs creates O(D^2) candidate rows in the
#: inverted-index self-join, so one boilerplate 5-gram shared by 1e5
#: docs would emit 1e10 pairs at 100x scale.  Dropping shingles with
#: document frequency > bound keeps the fan-out per shingle bounded;
#: Jaccard is then exact over the filtered shingle universe (the
#: standard stop-shingle contract, mirrored in the oracle's WHERE).
_JACCARD_MAX_SHINGLE_DF = 1000


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), k=5, threshold=0.8,
        max_shingle_df=_JACCARD_MAX_SHINGLE_DF,
    )


ORACLE_NGRAM_JACCARD = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 3, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))) AS s
  FROM w),
sdf AS (SELECT s, COUNT(*) AS df_ FROM sh0 GROUP BY 1),
sh AS (SELECT doc_id, s FROM sh0 JOIN sdf USING (s)
       WHERE df_ <= {_JACCARD_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load(spark, sf_dir, "documents"), threshold=0.8)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_dup_pairs(load(spark, sf_dir, "documents"), max_hamming=3)


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


ORACLE_SIM_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
    list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM embeddings, q WHERE vec_id <> 0)
SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id LIMIT 10
"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.45)


ORACLE_EMBEDDING_NEAR_DUPS = """
WITH nrm AS (
  SELECT vec_id, embedding,
         sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
             'sum')) AS n
  FROM embeddings)
SELECT id_a, id_b, sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_aggregate(list_transform(range(1, len(a.embedding)+1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
    / (a.n * b.n) AS sim
  FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id) t
WHERE sim >= 0.45
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh_topk(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


def q_sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a *trained* coarse quantizer: distributed Lloyd's
    k-means fits the codebook (shuffle-free iterations — broadcast
    centroids, map-side partial sums, driver reduce), assignment is a
    map-only argmin, then the probe scores only the query's cell.
    Rows-only (the codebook is engine-specific); recall vs brute force
    and fit determinism are asserted in tests/test_kmeans.py."""
    from fluvio_duck_spark.operators.kmeans import kmeans_assign, kmeans_fit
    from fluvio_duck_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=8, max_iter=10)
    assigned = kmeans_assign(emb, centroids)
    return ivf_topk(assigned, query_id=0, k=10, cell_col="cell")


def q_sim_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN with exact re-rank: per-subspace codebooks
    (distributed Lloyd's), map-only encode to m uint8-range codes (16-32×
    smaller scan footprint than the float column), ADC shortlist via
    broadcast lookup tables, exact cosine only on the shortlist.
    Rows-only (codebooks are engine-specific); shortlist recall vs brute
    force is asserted in tests/test_kmeans.py."""
    from fluvio_duck_spark.operators.pq import pq_encode, pq_topk_rerank, pq_train

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=16, k=32, max_iter=10)
    enc = pq_encode(emb, books).select("vec_id", "pq_code")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return pq_topk_rerank(
        emb.filter(F.col("vec_id") != 0),
        enc.filter(F.col("vec_id") != 0),
        books, qv, k=10, shortlist=50,
    )


def q_near_dups_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup plan: LSH-signature equi-join (same-bucket
    pairs only) then exact cosine — shuffle bounded by bucket sizes, not
    n².  Rows-only; recall vs the exact all-pairs variant is asserted in
    tests/test_llm_ops.py."""
    return embedding_near_dup_pairs(
        load(spark, sf_dir, "embeddings"), threshold=0.45, bucketed=True
    )


def q_near_dups_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine at scale: block-partitioned float64 GEMM
    (one Arrow batch per block pair) instead of per-pair expression
    evaluation — same answer as sim_embedding_near_dups, ~25x faster at
    sf0.1 and distributable (block pairs are independent tasks)."""
    from fluvio_duck_spark.operators.similarity import blocked_near_dup_pairs

    return blocked_near_dup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.45)


ORACLE_NEAR_DUPS_BLOCKED = """
SELECT id_a, id_b, ROUND(sim, 6) AS sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_aggregate(list_transform(range(1, len(a.embedding)+1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(a.embedding)+1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(b.embedding)+1),
        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
WHERE sim >= 0.45
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components → canonical survivor per
    cluster (component = min id).  Pairs from the blocked-GEMM exact
    scorer; clustering via iterative min-label propagation.  The oracle
    computes the same components with a recursive CTE — transitive
    closure by reachability, min reachable id per node."""
    from fluvio_duck_spark.operators.dedup import connected_components
    from fluvio_duck_spark.operators.similarity import blocked_near_dup_pairs

    pairs = blocked_near_dup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.45)
    return connected_components(pairs)


ORACLE_DEDUP_COMPONENTS = """
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      list_aggregate(list_transform(range(1, len(a.embedding)+1),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
      / (sqrt(list_aggregate(list_transform(range(1, len(a.embedding)+1),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
       * sqrt(list_aggregate(list_transform(range(1, len(b.embedding)+1),
          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
  WHERE sim >= 0.45
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
walk(node, reach) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
)
SELECT node AS id, MIN(reach) AS component FROM walk GROUP BY node
"""


def q_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize the embedding column (map-only ingest step: cosine
    then reduces to a dot product at query time).

    The unit vector is surfaced through scalar witnesses — first/last
    element plus a left-to-right element sum — because the driver's pandas
    canon cannot hash list-typed cells (scripts/lint_oracle_types.py).
    The witnesses are exact: both engines fold the same doubles in the
    same order, so every column is bit-comparable."""
    from fluvio_duck_spark.functions.vectors import l2_normalize

    e = load(spark, sf_dir, "embeddings")
    unit = l2_normalize(F.col("embedding"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(unit, 1).alias("u_first"),
        F.element_at(unit, -1).alias("u_last"),
        F.aggregate(unit, F.lit(0.0), lambda a, x: a + x).alias("u_sum"),
    )


ORACLE_NORMALIZE = """
SELECT vec_id,
  CAST(len(unit) AS INTEGER) AS dim,
  unit[1] AS u_first,
  unit[len(unit)] AS u_last,
  list_aggregate(unit, 'sum') AS u_sum
FROM (
  SELECT vec_id,
    CASE WHEN nrm = 0 THEN list_transform(embedding, x -> CAST(x AS DOUBLE))
         ELSE list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) END AS unit
  FROM (SELECT vec_id, embedding,
          sqrt(list_aggregate(list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
               'sum')) AS nrm
        FROM embeddings))
"""


def q_grouped_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas) feature scaling, verified
    against the equivalent SQL window formula — the §2.12 grouped-map
    surface with a real oracle (pandas and SQL produce identical IEEE
    doubles for (x−min)/(max−min))."""
    from fluvio_duck_spark.operators.grouped import minmax_scale_grouped

    ev = load(spark, sf_dir, "events")
    return minmax_scale_grouped(ev, "event_type", "value", "event_id")


ORACLE_GROUPED_MINMAX = """
SELECT event_id, event_type,
       CASE WHEN mx = mn THEN 0.5 ELSE (value - mn) / (mx - mn) END AS scaled
FROM (SELECT event_id, event_type, value,
             min(value) OVER (PARTITION BY event_type) AS mn,
             max(value) OVER (PARTITION BY event_type) AS mx
      FROM events)
"""


def q_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram profile language ID (the n-gram heuristic): one
    trigram pass per row, per-language overlap scores, argmax with an
    'unknown' floor — all in-row array expressions."""
    from fluvio_duck_spark.functions.text import lang_id_ngram, lang_scores_ngram

    d = load(spark, sf_dir, "documents")
    scores = lang_scores_ngram("text")
    return d.select(
        "doc_id",
        scores["en"].alias("en_score"),
        scores["es"].alias("es_score"),
        lang_id_ngram("text").alias("lang"),
    )


_EN_PROF = "['the','he ',' th','ing','nd ',' an','and',' of','of ',' to','to ',' in','ed ','ion',' is','is ']"
_ES_PROF = "['de ',' de','la ',' la','el ',' el','os ','ión',' qu','que','ue ',' en','en ','ar ',' co','con']"

ORACLE_LANGID_NGRAM = f"""
WITH g AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(length(lower(text)) - 2, 0) + 1),
                  i -> lower(text)[i:i+2])) AS tg
  FROM documents),
s AS (
  SELECT doc_id,
    CAST(len(list_intersect(tg, {_EN_PROF})) AS DOUBLE) / 16.0 AS en_score,
    CAST(len(list_intersect(tg, {_ES_PROF})) AS DOUBLE) / 16.0 AS es_score
  FROM g)
SELECT doc_id, en_score, es_score,
  CASE WHEN en_score >= 0.25 AND en_score >= es_score THEN 'en'
       WHEN es_score >= 0.25 THEN 'es'
       ELSE 'unknown' END AS lang
FROM s
"""


def q_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval — the SCALE path: per-Arrow-batch numpy GEMM with
    MAP-SIDE PARTIAL top-k (operators/similarity.py::cosine_topk_batch,
    gemm=True).  Each batch emits only its own best 2k rows per query, so
    the final window shuffle carries |batches|×|queries|×2k rows instead
    of |corpus|×|queries|.  sim is rounded to 6 decimals for cross-engine
    hash comparability (GEMM reassociates float sums; the 1e-16-scale
    difference is far below any ranking margin) — same convention as
    sim_near_dups_blocked."""
    from fluvio_duck_spark.operators.similarity import cosine_topk_batch

    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk_batch(
        emb, emb.filter(F.col("label") == 0), k=5, gemm=True
    ).select(
        "query_id", "vec_id",
        F.round("sim", 6).alias("sim"),
        F.col("rn").cast("int").alias("rn"),
    )


def q_topk_batch_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval — the exact oracle anchor: both sides L2-normalize
    map-side, broadcast query matrix, one window shuffle carrying
    |corpus|×|queries| score rows.  Bit-identical to the DuckDB
    sequential-fold oracle (unrounded); the verification twin of the
    GEMM-registered sim_topk_batch."""
    from fluvio_duck_spark.operators.similarity import cosine_topk_batch

    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk_batch(
        emb, emb.filter(F.col("label") == 0), k=5
    ).select("query_id", "vec_id", "sim", F.col("rn").cast("int").alias("rn"))


_TOPK_BATCH_CTE = """
WITH cn AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(x AS DOUBLE) / sqrt(list_aggregate(list_transform(embedding,
                  y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))) AS nv
  FROM embeddings),
q AS (
  SELECT cn.vec_id AS query_id, nv AS qv
  FROM cn JOIN embeddings e ON cn.vec_id = e.vec_id WHERE e.label = 0),
s AS (
  SELECT q.query_id, c.vec_id,
    list_aggregate(list_transform(range(1, len(c.nv)+1),
        i -> c.nv[i] * q.qv[i]), 'sum') AS sim
  FROM cn c CROSS JOIN q WHERE c.vec_id <> q.query_id),
r AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS rn
  FROM s)
"""

ORACLE_TOPK_BATCH = _TOPK_BATCH_CTE + """
SELECT query_id, vec_id, ROUND(sim, 6) AS sim, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= 5
"""

ORACLE_TOPK_BATCH_EXACT = _TOPK_BATCH_CTE + """
SELECT query_id, vec_id, sim, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= 5
"""


def q_ivf_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF retrieval: the whole label-0 query set probes its own
    cells via an equi-join (operators/similarity.py::ivf_topk_batch) —
    cell-pruned scoring, one window shuffle."""
    from fluvio_duck_spark.operators.similarity import ivf_topk_batch

    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk_batch(
        emb, emb.filter(F.col("label") == 0), k=5
    ).select("query_id", "vec_id", "sim", F.col("rn").cast("int").alias("rn"))


ORACLE_IVF_TOPK_BATCH = """
WITH cn AS (
  SELECT vec_id, label, list_transform(embedding,
           x -> CAST(x AS DOUBLE) / sqrt(list_aggregate(list_transform(embedding,
                  y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))) AS nv
  FROM embeddings),
q AS (
  SELECT vec_id AS query_id, label AS qcell, nv AS qv
  FROM cn WHERE label = 0),
s AS (
  SELECT q.query_id, c.vec_id,
    list_aggregate(list_transform(range(1, len(c.nv)+1),
        i -> c.nv[i] * q.qv[i]), 'sum') AS sim
  FROM cn c JOIN q ON c.label = q.qcell AND c.vec_id <> q.query_id),
r AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS rn
  FROM s)
SELECT query_id, vec_id, sim, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= 5
"""


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64→32 of the embedding column — the
    dimensionality-reduction scale path (reduced-space shortlist, exact
    re-rank).  The seeded Gaussian matrix is deterministic
    (test_llm_ops.py proves bit-stability, distance preservation, and
    near-dup survival) but not SQL-expressible, so the driver-checkable
    contract is per-vector dims (exact) plus a norm-preservation boolean:
    ‖Px‖²/‖x‖² for a 1/√k-scaled Gaussian P is χ²₃₂/32-distributed
    (mean 1), so [0.16, 3.24] is a ≳6σ envelope — P(outside) < 1e-9 per
    vector.  A wrong matrix, scale, or GEMM flips booleans and fails the
    driver hash; zero vectors must project to exactly zero."""
    from fluvio_duck_spark.operators.projection import random_projection

    proj = random_projection(
        load(spark, sf_dir, "embeddings"), out_dim=32, seed=7, out_col="proj"
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda a, x: a + x.cast("double") * x
    )
    en2, pn2 = sq(F.col("embedding")), sq(F.col("proj"))
    return proj.select(
        "vec_id",
        F.size("embedding").alias("dim_in"),
        F.size("proj").alias("dim_out"),
        F.when(en2 == 0, pn2 == 0)
        .otherwise((pn2 / en2).between(F.lit(0.16), F.lit(3.24)))
        .alias("norm_ratio_ok"),
    )


ORACLE_RANDOM_PROJECTION = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim_in,
       32 AS dim_out,
       TRUE AS norm_ratio_ok
FROM embeddings
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality signal: corpus-fit unigram LM (add-one
    smoothing), mean per-token log10 prob per document
    (operators/lm.py).  Fit = one token-count shuffle; score = broadcast
    model join + one doc-id shuffle."""
    from fluvio_duck_spark.operators.lm import unigram_fit, unigram_logprob_scores

    docs = load(spark, sf_dir, "documents")
    model, totals = unigram_fit(docs)
    return unigram_logprob_scores(docs, model, totals)


ORACLE_UNIGRAM = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
counts AS (SELECT token, COUNT(*) AS c FROM tok2 GROUP BY token),
tot AS (SELECT SUM(c) AS n_tokens, COUNT(*) AS vocab FROM counts),
model AS (
  SELECT token,
         log10(CAST(c + 1 AS DOUBLE) / CAST(n_tokens + vocab AS DOUBLE)) AS logp
  FROM counts, tot),
s AS (
  SELECT doc_id,
         COALESCE(m.logp,
                  (SELECT log10(1.0 / CAST(n_tokens + vocab AS DOUBLE)) FROM tot))
           AS lp
  FROM tok2 LEFT JOIN model m USING (token))
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_scored_tokens,
       CAST(SUM(CAST(lp AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS mean_logp
FROM s GROUP BY doc_id
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bounded sliding-window chunking (max 64 tokens, 16 overlap)
    — the pretraining / RAG-indexing prep step.  Map-only explode: zero
    shuffles at any corpus size (see operators/chunking.py)."""
    from fluvio_duck_spark.operators.chunking import chunk_documents

    return chunk_documents(
        load(spark, sf_dir, "documents"),
        max_tokens=64,
        overlap=16,
        keep_cols=["lang"],
    )


ORACLE_CHUNK = """
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''),
s AS (
  SELECT doc_id, lang, toks,
         CAST(u.start AS INTEGER) AS start,
         CAST(u.start / 48 AS INTEGER) AS chunk_index
  FROM t, UNNEST(range(0, GREATEST(len(toks) - 16, 1), 48)) AS u(start))
SELECT doc_id, chunk_index,
       CAST(len(list_slice(toks, start + 1, start + 64)) AS INTEGER)
         AS n_chunk_tokens,
       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk,
       lang
FROM s
"""


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints, one row per selected
    fingerprint.  Map-only expression per doc; the explode happens at the
    end so nothing upstream shuffles."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(winnow_fingerprints("text", k=5, w=4)).alias("fp")
    )


ORACLE_WINNOW = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id,
  CASE WHEN len(toks) >= 5 THEN list_transform(range(1, len(toks) - 5 + 2),
         i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))
       ELSE [] END AS hs
  FROM t),
w AS (SELECT doc_id,
  CASE WHEN len(hs) >= 4 THEN list_transform(range(1, len(hs) - 4 + 2),
         i -> list_aggregate(hs[i:i+3], 'min'))
       WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')]
       ELSE [] END AS fps
  FROM g)
SELECT doc_id, unnest(list_distinct(fps)) AS fp FROM w
"""


def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


ORACLE_SIM_IVF = """
WITH q AS (SELECT embedding AS qv, label AS qcell FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
    list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM embeddings, q WHERE vec_id <> 0 AND label = qcell)
SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id LIMIT 10
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-mixture corpus sample: exactly 20 docs per language, drawn
    uniformly-without-replacement by a deterministic multiplicative-hash
    ordering (operators/sampling.py) — resumable/auditable at 100 TB
    because the sample is a pure function of the data, not of partition
    layout.  One shuffle on lang; per-stratum top-n window."""
    from fluvio_duck_spark.operators.sampling import stratified_sample, uniform_key

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(
        docs, ["lang"], 20, uniform_key("doc_id", seed=7), tiebreak=["doc_id"]
    )


ORACLE_SAMPLE_STRATIFIED = """
WITH k AS (SELECT doc_id, lang, source,
                  ((doc_id + 1) * (2654435761 + 7 * 98765431)) % 1000003 AS key
           FROM documents),
r AS (SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rn
      FROM k)
SELECT doc_id, lang, source FROM r WHERE rn <= 20
"""


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus draw: 20 docs per language with
    inclusion probability proportional to ``n_chars``
    (Efraimidis–Spirakis exponential keys over the same deterministic
    uniform — operators/sampling.py::weighted_key).  Same one-shuffle
    top-n plan as the uniform draw; the sample stays a pure function of
    the data."""
    from fluvio_duck_spark.operators.sampling import stratified_sample, weighted_key

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return stratified_sample(
        docs, ["lang"], 20,
        weighted_key("doc_id", "n_chars", seed=7),
        tiebreak=["doc_id"],
    )


ORACLE_SAMPLE_WEIGHTED = """
WITH k AS (SELECT doc_id, lang, n_chars,
                  -ln((((doc_id + 1) * (2654435761 + 7 * 98765431)) % 1000003 + 1)
                      / 1000004.0) / n_chars AS wkey
           FROM documents),
r AS (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY wkey, doc_id) AS rn
      FROM k)
SELECT doc_id, lang, n_chars FROM r WHERE rn <= 20
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by hashed-id
    threshold (map-only; a doc's split never changes as the corpus
    grows), summarized per split.  Integer cut points in the hash
    keyspace — no float-boundary ambiguity between engines."""
    from fluvio_duck_spark.operators.sampling import split_assign

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return split_assign(docs).groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


#: cut points = int(cum_weight * 1000003): train < 900002 <= val < 950002 <= test
ORACLE_SPLIT_ASSIGN = """
WITH k AS (SELECT doc_id, n_chars,
                  ((doc_id + 1) * 2654435761) % 1000003 AS key
           FROM documents)
SELECT CASE WHEN key < 900002 THEN 'train'
            WHEN key < 950002 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM k GROUP BY 1
"""


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle (epoch read order): every doc's
    position key under seed 1.  The operator materializes the
    permutation as a range-partitioned sort — one corpus shuffle, no
    single-task global window; the hash here checks the complete
    permutation, not a sample of it."""
    from fluvio_duck_spark.operators.sampling import training_order

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return training_order(docs, seed=1, num_partitions=8).select(
        "doc_id", "source", "shuffle_key"
    )


ORACLE_TRAINING_ORDER = """
SELECT doc_id, source,
       ((doc_id + 1) * (2654435761 + 1 * 98765431)) % 1000003 AS shuffle_key
FROM documents
"""


def q_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture packing: per language, admit documents longest-first
    until a 2500-token budget is filled (greedy prefix, inclusive) —
    the final allocation step of a training-data pipeline.  One running-
    sum window per stratum (operators/sampling.py::pack_token_budget)."""
    from fluvio_duck_spark.operators.sampling import pack_token_budget

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", token_count("text").alias("n_tokens")
    )
    packed = pack_token_budget(
        docs,
        strata=["lang"],
        order_by=[F.desc("n_chars"), F.asc("doc_id")],
        token_col=F.col("n_tokens"),
        budget=2500,
    )
    return packed.select("doc_id", "lang", "n_tokens", "cum_tokens")


ORACLE_PACK_BUDGET = """
WITH t AS (SELECT doc_id, lang, n_chars,
                  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (
                 PARTITION BY lang ORDER BY n_chars DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
      FROM t)
SELECT doc_id, lang, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 2500
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing any 3-gram with the eval
    set (stand-in: every 97th doc), graded by distinct shared-shingle
    count.  The eval side is broadcast — corpus stays map-only through
    the join; one shuffle for the per-doc count
    (operators/dedup.py::contamination_report).  Real pipelines use 8-13
    word grams; the synthetic fixture's vocabulary only collides at 3."""
    from fluvio_duck_spark.operators.dedup import contamination_report

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_report(corpus, bench, k=3)


ORACLE_DECONTAMINATE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 1, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS s
  FROM w),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
SELECT doc_id, COUNT(*) AS n_shared_grams
FROM corpus JOIN bench USING (s)
GROUP BY doc_id
"""


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile quality gate: keep docs at or above their language's 10th
    quality percentile — the DISCRETE percentile (k-th order statistic,
    k = ⌈n/10⌉ via integer ceil-division), not an interpolated one:
    interpolation formulas differ across engines in the last ulp on raw
    doubles (SCALE.md trap #7), while the order statistic is selected
    with pure integer count arithmetic over ppm-quantized scores —
    tie-free by construction on both engines.

    Scale-correct plan: the threshold comes from a (lang, qppm) VALUE
    HISTOGRAM — one grouped aggregate over the corpus, then a per-lang
    cumulative window over the histogram (≤ 1e6 ppm values per lang by
    quantization, never corpus-sized) — joined back by **broadcast**.
    NOT a percent_rank window, which would sort an entire language
    stratum in one task at 100 TB."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", quality_score("text").alias("quality_score")
    )
    q = docs.withColumn(
        "qppm", F.floor(F.col("quality_score") * 1000000).cast("long")
    )
    hist = q.groupBy("lang", "qppm").agg(F.count("*").alias("c"))
    wcum = (
        W.partitionBy("lang")
        .orderBy("qppm")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wcum))
    n = q.groupBy("lang").agg(F.count("*").alias("n"))
    thr = (
        cum.join(F.broadcast(n), "lang")
        .filter(F.col("cum") >= F.expr("div(n + 9, 10)"))
        .groupBy("lang")
        .agg(F.min("qppm").alias("thr"))
    )
    return (
        q.join(F.broadcast(thr), "lang")
        .filter(F.col("qppm") >= F.col("thr"))
        .select("doc_id", "lang", "quality_score")
    )


ORACLE_QUALITY_GATE = f"""
WITH t AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(string_split(text,' '), t -> t IN {_STOPLIST_SQL})) AS DOUBLE)
      / len(string_split(text,' ')) AS sw,
    CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
      / len(string_split(text,' ')) AS mtl
  FROM documents),
q AS (SELECT doc_id, lang,
             least(sw * 4.0, 1.0) * 0.5
               + (1.0 - least(abs(mtl - 5.0) / 5.0, 1.0)) * 0.5 AS quality_score
      FROM t),
q2 AS (SELECT doc_id, lang, quality_score,
              CAST(floor(quality_score * 1000000) AS BIGINT) AS qppm
       FROM q),
hist AS (SELECT lang, qppm, COUNT(*) AS c FROM q2 GROUP BY lang, qppm),
cum AS (SELECT lang, qppm,
               SUM(c) OVER (PARTITION BY lang ORDER BY qppm
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
        FROM hist),
n AS (SELECT lang, COUNT(*) AS n FROM q2 GROUP BY lang),
thr AS (SELECT lang, MIN(qppm) AS thr
        FROM cum JOIN n USING (lang)
        WHERE cum >= (n + 9) // 10 GROUP BY lang)
SELECT doc_id, lang, quality_score
FROM q2 JOIN thr USING (lang)
WHERE qppm >= thr
"""


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: per-doc match counts + redacted text.  The fixture text
    is synthetic word salad, so deterministic PII (an email, a phone, an
    IP derived from doc_id) is appended by the *query* — the identical
    expression runs on the oracle side, so the redaction paths are
    exercised on every row and hash-compared end to end."""
    from fluvio_duck_spark.functions.text import pii_counts, redact_pii

    d = load(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".99"),
    )
    counts = pii_counts(full)
    return d.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        counts["n_phones"].alias("n_phones"),
        redact_pii(full).alias("clean_text"),
    )


_PII_FULL_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.99'"
)
_PII_EMAIL_SQL = '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
_PII_IPV4_SQL = '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'
_PII_PHONE_SQL = '\\+\\d[\\d\\- ]{6,}\\d'

ORACLE_PII_REDACT = f"""
WITH t AS (SELECT doc_id, {_PII_FULL_SQL} AS full_text FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(full_text, '{_PII_EMAIL_SQL}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(full_text, '{_PII_IPV4_SQL}')) AS INT) AS n_ips,
  CAST(len(regexp_extract_all(full_text, '{_PII_PHONE_SQL}')) AS INT) AS n_phones,
  regexp_replace(
    regexp_replace(
      regexp_replace(full_text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
      '{_PII_IPV4_SQL}', '<IP>', 'g'),
    '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS clean_text
FROM t
"""


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup: k-means cells bound the near-dup pair search.  The
    fixture embeddings carry no true semantic duplicates (max pairwise
    cosine ≈ 0.48), so the query plants them deterministically: vectors
    with ``vec_id < 50`` are re-added under ``vec_id + 100000`` scaled by
    2.0 — scaling by a power of two is exact in IEEE float, so after L2
    normalization each copy is bit-identical to its original (cosine
    exactly 1) and must land in the same cell.  Per-cell report; recall
    vs the exact all-pairs answer is measured in tests/test_kmeans.py."""
    from fluvio_duck_spark.operators.semdedup import semantic_dup_pairs

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias(
            "embedding"
        ),
    )
    pairs = semantic_dup_pairs(
        emb.unionByName(planted), k=8, threshold=0.99, max_iter=10
    )
    return (
        pairs.groupBy("cell")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("id_b").alias("n_dropped"),
        )
        .orderBy("cell")
    )


def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) source-mixture allocation for a
    100k-document sampling budget."""
    from fluvio_duck_spark.operators.sampling import temperature_mixture

    return temperature_mixture(
        load(spark, sf_dir, "documents"), "source", alpha=0.5, budget=100_000
    )


ORACLE_SAMPLE_TEMPERATURE = """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c),
w AS (SELECT source, n, sqrt(n / tot) AS wgt FROM c, t),
z AS (SELECT SUM(wgt) AS z FROM w)
SELECT source, n, round(wgt / z, 6) AS share,
       CAST(round(100000 * wgt / z, 0) AS BIGINT) AS alloc
FROM w, z
"""


def q_pack_concat_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing assignment (GPT-style pretraining prep):
    documents concatenated in doc_id order, cut into 256-token training
    sequences; each doc learns its (seq_start, seq_end, offset_in_seq).
    The global running sum is a distributed two-level prefix sum
    (operators/chunking.py::concat_pack) — range shuffle + tiny
    per-partition-offset broadcast, never a single-task global window."""
    from fluvio_duck_spark.operators.chunking import concat_pack

    docs = load(spark, sf_dir, "documents")
    return concat_pack(
        docs, id_col="doc_id", n_tokens=token_count("text"), seq_len=256
    )


ORACLE_PACK_CONCAT = """
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT)
           AS cum_before
  FROM d)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, cum_before,
       cum_before // 256 AS seq_start,
       (cum_before + n_tokens - 1) // 256 AS seq_end,
       cum_before % 256 AS offset_in_seq
FROM c
"""


def q_ngram_corpus_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-100 bigrams: in-row n-gram arrays (no self-join) →
    explode → ONE count shuffle with map-side combine → global top-k as a
    TakeOrderedAndProject heap (k rows to the driver, never a sort).
    The corpus-statistics primitive behind stop-n-gram lists and
    contamination screens."""
    from fluvio_duck_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").select(tokens("text").alias("toks"))
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks)-1),"
                " (t, i) -> concat(t, ' ', toks[i+1]))"
            )
        ).alias("gram")
    )
    return (
        bigrams.groupBy("gram").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(100)
    )


ORACLE_NGRAM_TOPK = """
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
g AS (SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS gram FROM t)
SELECT gram, COUNT(*) AS n FROM g GROUP BY gram
ORDER BY n DESC, gram LIMIT 100
"""


def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search: all vectors with cosine ≥ 0.25 to the query vector —
    the dual of top-k retrieval (dedup candidate pull, coverage probes).
    1-row query broadcast, map-only scoring + filter, no shuffle at all;
    at scale the same LSH/IVF pruning as the top-k paths applies."""
    emb = load(spark, sf_dir, "embeddings")
    from fluvio_duck_spark.functions.vectors import cosine

    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("__qv"))
        .coalesce(1)
        .limit(1)  # unique id by contract; plan-provable broadcast bound
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", cosine(F.col("embedding"), F.col("__qv")).alias("sim"))
        .filter(F.col("sim") >= 0.25)
    )


ORACLE_SIM_RANGE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
    list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM embeddings, q WHERE vec_id <> 0)
SELECT vec_id, sim FROM s WHERE sim >= 0.25
"""


def q_text_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution (the packing/truncation planning
    stat): token counts bucketed to 16-token bins — one partial+final
    aggregate over map-side bin keys, mergeable counts."""
    docs = load(spark, sf_dir, "documents")
    tc = token_count("text")
    return (
        docs.select(
            (F.floor(tc / 16) * 16).cast("long").alias("bin_lo"),
            tc.alias("tc"),
        )
        .groupBy("bin_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tc").cast("long").alias("n_tokens"),
            F.min("tc").cast("int").alias("min_len"),
            F.max("tc").cast("int").alias("max_len"),
        )
    )


ORACLE_SEQLEN_HIST = """
WITH d AS (
  SELECT CAST(len(string_split(text, ' ')) AS INTEGER) AS tc FROM documents)
SELECT CAST(tc // 16 * 16 AS BIGINT) AS bin_lo,
       COUNT(*) AS n_docs,
       CAST(SUM(tc) AS BIGINT) AS n_tokens,
       CAST(MIN(tc) AS INTEGER) AS min_len,
       CAST(MAX(tc) AS INTEGER) AS max_len
FROM d GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "pack_concat_sequences": QuerySpec(q_pack_concat_sequences, ORACLE_PACK_CONCAT,
                                       doc="concat-and-chunk sequence packing via distributed prefix sum"),
    "ngram_corpus_topk": QuerySpec(q_ngram_corpus_topk, ORACLE_NGRAM_TOPK,
                                   doc="corpus-wide top-100 bigrams: 1 count shuffle + top-k heap"),
    "sim_range_search": QuerySpec(q_sim_range_search, ORACLE_SIM_RANGE,
                                  doc="cosine radius search (map-only broadcast-query scan)"),
    "text_seqlen_histogram": QuerySpec(q_text_seqlen_histogram, ORACLE_SEQLEN_HIST,
                                       doc="token-length histogram, 16-token bins (packing planning stat)"),
    "text_pii_redact": QuerySpec(q_text_pii_redact, ORACLE_PII_REDACT,
                                 doc="PII detect+redact (email/IP/phone regexes shared with the oracle)"),
    "dedup_semantic": QuerySpec(q_dedup_semantic, None,
                                doc="SemDedup: within-k-means-cell near-dup pairs (recall-tested vs exact)"),
    "sample_temperature_mixture": QuerySpec(q_sample_temperature, ORACLE_SAMPLE_TEMPERATURE,
                                            doc="temperature-scaled (alpha=.5) source mixture allocation"),
    "text_decontaminate": QuerySpec(q_decontaminate, ORACLE_DECONTAMINATE,
                                    doc="benchmark decontamination: 3-gram overlap vs broadcast eval set"),
    "text_quality_gate": QuerySpec(q_quality_gate, ORACLE_QUALITY_GATE,
                                   doc="per-lang 10th-percentile quality gate (agg+broadcast, no giant window)"),
    "sample_weighted_quota": QuerySpec(q_sample_weighted, ORACLE_SAMPLE_WEIGHTED,
                                       doc="importance-weighted per-stratum draw (Efraimidis-Spirakis keys; deterministic)"),
    "sample_stratified_quota": QuerySpec(q_sample_stratified, ORACLE_SAMPLE_STRATIFIED,
                                         doc="deterministic per-language quota sample (training-mix draw)"),
    "sample_split_assign": QuerySpec(q_split_assign, ORACLE_SPLIT_ASSIGN,
                                     doc="deterministic 90/5/5 train/val/test split by hashed-id threshold (map-only)"),
    "sample_training_order": QuerySpec(q_training_order, ORACLE_TRAINING_ORDER,
                                       doc="deterministic epoch-shuffle permutation (range-partitioned, no global window)"),
    "pack_token_budget": QuerySpec(q_pack_token_budget, ORACLE_PACK_BUDGET,
                                   doc="greedy per-language token-budget packing (data-mixture allocation)"),
    "text_tfidf_topterms": QuerySpec(q_text_tfidf_topterms, ORACLE_TFIDF,
                                     doc="top-3 tf-idf terms per doc (AQE-planned tf⋈df join, lazy 1-row N, rational idf)"),
    "text_repetition": QuerySpec(q_text_repetition, ORACLE_REPETITION,
                                 doc="Gopher-style repetition signals: distinct ratio, top-bigram + dup-trigram fractions"),
    "text_stats": QuerySpec(q_text_stats, ORACLE_TEXT_STATS,
                            doc="token/char counts, stopword ratio"),
    "text_char_entropy": QuerySpec(q_text_char_entropy, ORACLE_CHAR_ENTROPY,
                                   doc="per-doc character Shannon entropy (gibberish/repetition signal)"),
    "text_quality_langid": QuerySpec(q_quality, ORACLE_QUALITY,
                                     doc="quality score + language-ID heuristic"),
    "dedup_exact": QuerySpec(q_dedup_exact, ORACLE_DEDUP_EXACT,
                             doc="exact dedup via content fingerprint groupBy"),
    "dedup_canonical": QuerySpec(q_dedup_canonical, ORACLE_DEDUP_CANONICAL,
                                 doc="canonicalized exact dedup (case/punct/space variants collapse)"),
    "dedup_segments": QuerySpec(q_dedup_segments, ORACLE_DEDUP_SEGMENTS,
                                doc="C4-style corpus-wide duplicate-segment removal + doc reassembly"),
    "dedup_boilerplate": QuerySpec(q_dedup_boilerplate, ORACLE_DEDUP_BOILERPLATE,
                                   doc="corpus-frequency boilerplate segment removal (all copies stripped)"),
    "dedup_prefix_blocks": QuerySpec(q_dedup_prefix_blocks, ORACLE_DEDUP_PREFIX,
                                     doc="blocking-key canonicalization"),
    "dedup_ngram_jaccard": QuerySpec(q_ngram_jaccard, ORACLE_NGRAM_JACCARD,
                                     doc="exact 5-gram Jaccard near-dup pairs"),
    "dedup_minhash_lsh": QuerySpec(q_minhash_lsh, None,
                                   doc="MinHash+LSH near-dups (hash-based; verified vs exact in tests)"),
    "dedup_simhash": QuerySpec(q_simhash_pairs, None,
                               doc="SimHash hamming≤3 pairs (hash-based; rows-only)"),
    "sim_topk_bruteforce": QuerySpec(q_sim_topk, ORACLE_SIM_TOPK,
                                     doc="exact cosine top-10"),
    "sim_embedding_near_dups": QuerySpec(q_embedding_near_dups, ORACLE_EMBEDDING_NEAR_DUPS,
                                         doc="all-pairs cosine ≥ 0.45"),
    # sim_ann_lsh registered below with its generated oracle (round-4
    # upgrade) — one registration per name, enforced by
    # test_no_duplicate_query_registrations_in_source
    "sim_pq_rerank": QuerySpec(q_sim_pq_rerank, None,
                               doc="product-quantized ANN: ADC shortlist + exact re-rank (recall-tested)"),
    "text_fingerprint_winnow": QuerySpec(q_winnow_fingerprints, ORACLE_WINNOW,
                                         doc="winnowing rolling-hash fingerprints (SIGMOD'03)"),
    "text_langid_ngram": QuerySpec(q_langid_ngram, ORACLE_LANGID_NGRAM,
                                   doc="char-trigram profile language ID (n-gram heuristic)"),
    "grouped_minmax_scale": QuerySpec(q_grouped_minmax, ORACLE_GROUPED_MINMAX,
                                      doc="applyInPandas grouped-map scaling vs SQL window oracle — §2.12"),
    "sim_normalize_embeddings": QuerySpec(q_normalize_embeddings, ORACLE_NORMALIZE,
                                          doc="map-only L2 normalization of the embedding column"),
    "sim_ivf_topk": QuerySpec(q_sim_ivf, ORACLE_SIM_IVF,
                              doc="IVF cell-probed ANN top-10 (coarse quantizer = label)"),
    "dedup_components": QuerySpec(q_dedup_components, ORACLE_DEDUP_COMPONENTS,
                                  doc="near-dup clusters via min-label propagation vs recursive-CTE oracle"),
    "sim_near_dups_blocked": QuerySpec(q_near_dups_blocked, ORACLE_NEAR_DUPS_BLOCKED,
                                       doc="exact all-pairs cosine via blocked GEMM (scale path)"),
    "sim_ivf_trained": QuerySpec(q_sim_ivf_trained, None,
                                 doc="IVF ANN over a k-means-trained codebook (shuffle-free Lloyd's fit)"),
    # sim_near_dups_bucketed registered below with its generated oracle
    # (round-4 upgrade)
    "text_chunk_documents": QuerySpec(q_chunk_documents, ORACLE_CHUNK,
                                      doc="token-budget sliding-window chunking with overlap (map-only explode)"),
    "sim_random_projection": QuerySpec(q_random_projection, ORACLE_RANDOM_PROJECTION,
                                       doc="JL random projection 64->32 (seeded GEMM per Arrow batch), norm-bound-checked"),
    "sim_topk_batch": QuerySpec(q_topk_batch, ORACLE_TOPK_BATCH,
                                doc="batch retrieval scale path: GEMM + map-side partial top-k (sim rounded 6dp)"),
    "sim_topk_batch_exact": QuerySpec(q_topk_batch_exact, ORACLE_TOPK_BATCH_EXACT,
                                      doc="batch retrieval oracle anchor: exact fold, one window shuffle (verification twin)"),
    "sim_ivf_topk_batch": QuerySpec(q_ivf_topk_batch, ORACLE_IVF_TOPK_BATCH,
                                    doc="batch IVF probe: query set equi-joins its cells (pruned scoring)"),
    "text_unigram_logprob": QuerySpec(q_unigram_logprob, ORACLE_UNIGRAM,
                                      doc="perplexity-style quality gate: corpus-fit unigram LM, mean token logprob per doc"),
}


def q_sample_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized temperature mixture: the alpha=0.5 allocation table
    joined back as a per-source rate (alloc/n, may exceed 1), then
    every document expanded to floor(rate) copies plus a
    deterministic-uniform extra — the physical corpus a mixture spec
    compiles to.  Map-only after the broadcast of the |sources|-row
    allocation; realized counts land within 1 doc of quota per source
    in expectation."""
    from fluvio_duck_spark.operators.sampling import (
        temperature_mixture,
        upsample_repeat,
    )

    docs = load(spark, sf_dir, "documents")
    alloc = temperature_mixture(docs, "source", alpha=0.5, budget=1000)
    rate = alloc.select(
        "source", (F.col("alloc") / F.col("n")).alias("_rate")
    )
    rated = docs.select("doc_id", "source").join(F.broadcast(rate), "source")
    return upsample_repeat(rated, "_rate").select(
        "source", "doc_id", "copy_idx"
    )


ORACLE_SAMPLE_UPSAMPLE = """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c),
w AS (SELECT source, n, sqrt(n / tot) AS wgt FROM c, t),
z AS (SELECT SUM(wgt) AS z FROM w),
rate AS (
  SELECT source, CAST(round(1000 * wgt / z, 0) AS BIGINT) / CAST(n AS DOUBLE) AS r
  FROM w, z),
rated AS (
  SELECT d.doc_id, d.source, r.r,
         (((d.doc_id + 1) * 2654435761) % 1000003 + 1) / 1000004.0 AS u
  FROM documents d JOIN rate r USING (source)),
counted AS (
  SELECT doc_id, source,
         CAST(floor(r) + (CASE WHEN u < r - floor(r) THEN 1 ELSE 0 END) AS INTEGER)
           AS copies
  FROM rated)
SELECT source, doc_id,
       CAST(unnest(range(1, copies + 1)) AS INTEGER) AS copy_idx
FROM counted WHERE copies >= 1
"""


QUERIES.update({
    "sample_upsample_repeat": QuerySpec(
        q_sample_upsample, ORACLE_SAMPLE_UPSAMPLE,
        doc="temperature mixture materialized: deterministic fractional row repetition (upsampling)",
    ),
})


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency signal: corpus-fit add-one bigram model, mean
    log10 P(w2|w1) per document — one step up the n-gram ladder from
    ``text_unigram_logprob``, and the shape a KenLM-style filter takes
    when the model itself is too big to broadcast (both model joins are
    plain equi-joins; see operators/lm.py)."""
    from fluvio_duck_spark.operators.lm import bigram_fit, bigram_logprob_scores

    docs = load(spark, sf_dir, "documents")
    c2, c1, totals = bigram_fit(docs)
    return bigram_logprob_scores(docs, c2, c1, totals)


ORACLE_BIGRAM = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
bi AS (
  SELECT doc_id,
         list_extract(tk, CAST(i AS INTEGER)) AS w1,
         list_extract(tk, CAST(i AS INTEGER) + 1) AS w2
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
        FROM t WHERE len(tk) >= 2) x),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
v AS (
  SELECT COUNT(DISTINCT token) AS vocab FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents WHERE text IS NOT NULL AND trim(text) <> '') u
  WHERE token <> ''),
s AS (
  SELECT doc_id,
         log10(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(c1.c1, 0) + vocab AS DOUBLE)) AS lp
  FROM bi LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
       CAST(SUM(CAST(lp AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS mean_logp
FROM s GROUP BY doc_id
"""


QUERIES.update({
    "text_bigram_logprob": QuerySpec(
        q_bigram_logprob, ORACLE_BIGRAM,
        doc="add-one bigram LM fluency score (non-broadcast model joins)",
    ),
})


_BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def q_text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer counting (the GPT-2 pre-tokenizer idea
    reduced to engine-portable character classes): letter runs are one
    token, every digit is its own token, every other non-space char is
    its own token.  Map-only regexp_extract_all — the cheap token-budget
    estimator a packing/pricing pass runs before real tokenization."""
    d = load(spark, sf_dir, "documents")
    toks = F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")
    alpha = F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)")
    digit = F.expr("regexp_extract_all(text, '[0-9]', 0)")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(alpha).alias("n_alpha_runs"),
        F.size(digit).alias("n_digits"),
        (F.size(toks) - F.size(alpha) - F.size(digit)).alias("n_punct"),
        F.round(
            F.size(toks) * F.lit(100.0) / F.greatest(F.length("text"), F.lit(1)), 6
        ).alias("tokens_per_100_chars"),
    )


ORACLE_TOKEN_REGEX = """
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS INTEGER)
    AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_alpha_runs,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS n_digits,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
       - len(regexp_extract_all(text, '[A-Za-z]+'))
       - len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS n_punct,
  round(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) * 100.0
        / greatest(length(text), 1), 6) AS tokens_per_100_chars
FROM documents
"""


def q_curate_domain_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard — the one-glance table a corpus
    owner reads before setting mixture weights: volume, exact-dup rate,
    token density, and each source's share of corpus characters.  One
    grouped aggregation over the corpus; the corpus-wide total folds in
    as a 1-row aggregate crossJoin (never an eager count() — the tf-idf
    lesson from VERDICT r1)."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        (F.count("*") - F.count_distinct(F.md5("text"))).alias("n_dup_docs"),
        F.sum(token_count("text")).alias("_tok"),
    )
    tot = per.agg(F.sum("total_chars").alias("_tc"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "total_chars",
        "n_dup_docs",
        F.round(F.col("_tok").cast("double") / F.col("n_docs"), 6).alias(
            "mean_tokens"
        ),
        F.round(F.col("total_chars").cast("double") / F.col("_tc"), 6).alias(
            "char_share"
        ),
    )


ORACLE_DOMAIN_REPORT = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(length(text)) AS BIGINT) AS total_chars,
         COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs,
         SUM(len(string_split(text, ' '))) AS tok
  FROM documents GROUP BY source),
tot AS (SELECT SUM(total_chars) AS tc FROM per)
SELECT source, n_docs, total_chars, n_dup_docs,
       round(CAST(tok AS DOUBLE) / n_docs, 6) AS mean_tokens,
       round(CAST(total_chars AS DOUBLE) / tc, 6) AS char_share
FROM per, tot
"""


QUERIES.update({
    "text_token_regex": QuerySpec(
        q_text_token_regex, ORACLE_TOKEN_REGEX,
        doc="BPE-style pre-tokenizer token counting (map-only regex)",
    ),
    "curate_domain_report": QuerySpec(
        q_curate_domain_report, ORACLE_DOMAIN_REPORT,
        doc="per-source curation dashboard: volume, dup rate, token density, char share",
    ),
})


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-ingest dedup — the snapshot-over-snapshot shape every
    continuously-crawled corpus runs: the historical partition (here
    ``doc_id % 10 < 7``) contributes only its distinct fingerprint
    index; the new batch anti-joins that index, then collapses its own
    internal duplicates keep-first.  At 100 TB the index is a
    precomputed table an order of magnitude smaller than the corpus,
    and only the NEW batch is scanned at full width — history is never
    re-read beyond its fingerprint column."""
    d = load(spark, sf_dir, "documents")
    part = F.pmod(F.col("doc_id"), F.lit(10))
    hist_fp = (
        d.filter(part < 7).select(fingerprint("text").alias("fp")).distinct()
    )
    new = d.filter(part >= 7).select("doc_id", fingerprint("text").alias("fp"))
    return (
        new.join(hist_fp, "fp", "left_anti")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("first_new_id"),
            F.count("*").alias("n_batch_copies"),
        )
    )


ORACLE_DEDUP_INCREMENTAL = """
WITH f AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp, doc_id % 10 AS part
  FROM documents),
hist AS (SELECT DISTINCT fp FROM f WHERE part < 7),
new AS (SELECT doc_id, fp FROM f WHERE part >= 7)
SELECT fp, min(doc_id) AS first_new_id, COUNT(*) AS n_batch_copies
FROM new WHERE fp NOT IN (SELECT fp FROM hist)
GROUP BY fp
"""


QUERIES.update({
    "dedup_incremental": QuerySpec(
        q_dedup_incremental, ORACLE_DEDUP_INCREMENTAL,
        doc="delta-ingest dedup: new batch anti-joins the historical fingerprint index",
    ),
})


_COS_AB = """list_aggregate(list_transform(range(1, len(a.embedding)+1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(a.embedding)+1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(b.embedding)+1),
        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')))"""


def q_sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-NN graph over the embedding corpus via the
    blocked-GEMM partial-top-k decomposition — the reduce shuffle
    carries n·k·(B+1) candidates, never the n² score matrix.  The
    oracle ranks the full n² cross join; the hash compare proves the
    block decomposition selects identical neighbors."""
    from fluvio_duck_spark.operators.similarity import knn_graph_blocked

    return knn_graph_blocked(load(spark, sf_dir, "embeddings"), k=3)


ORACLE_KNN_GRAPH = f"""
WITH s AS (
  SELECT a.vec_id AS id, b.vec_id AS nbr, round({_COS_AB}, 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (
  SELECT id, nbr, sim,
         row_number() OVER (PARTITION BY id ORDER BY sim DESC, nbr) AS rn
  FROM s)
SELECT id, nbr, sim FROM r WHERE rn <= 3
"""


def q_sim_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection by k-NN majority vote (the Confident-
    Learning-style neighborhood check): a point whose 5 nearest
    neighbors strictly-majority-vote a different label is flagged as
    probably mislabeled.  Built on the blocked k-NN graph, so the n²
    never materializes; the vote itself is one groupBy + keep-first
    window over n·k rows."""
    from pyspark.sql import Window as W

    from fluvio_duck_spark.operators.similarity import knn_graph_blocked

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph_blocked(emb, k=5)
    nbr_lbl = emb.select(
        F.col("vec_id").alias("nbr"), F.col("label").alias("nbr_label")
    )
    own = emb.select(F.col("vec_id").alias("id"), F.col("label").alias("own_label"))
    votes = (
        g.join(nbr_lbl, "nbr")
        .groupBy("id", "nbr_label")
        .agg(F.count("*").alias("n_votes"))
    )
    rn = F.row_number().over(
        W.partitionBy("id").orderBy(F.col("n_votes").desc(), F.col("nbr_label"))
    )
    top = votes.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    return top.join(own, "id").select(
        F.col("id").alias("vec_id"),
        "own_label",
        F.col("nbr_label").alias("voted_label"),
        "n_votes",
        (
            (F.col("nbr_label") != F.col("own_label")) & (F.col("n_votes") >= 3)
        ).alias("flagged"),
    )


ORACLE_LABEL_NOISE = f"""
WITH s AS (
  SELECT a.vec_id AS id, b.vec_id AS nbr, a.label AS own_label,
         b.label AS nbr_label, round({_COS_AB}, 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (
  SELECT id, nbr, own_label, nbr_label, sim,
         row_number() OVER (PARTITION BY id ORDER BY sim DESC, nbr) AS rn
  FROM s),
votes AS (
  SELECT id, own_label, nbr_label, COUNT(*) AS n_votes
  FROM r WHERE rn <= 5 GROUP BY id, own_label, nbr_label),
top AS (
  SELECT id, own_label, nbr_label, n_votes,
         row_number() OVER (PARTITION BY id ORDER BY n_votes DESC, nbr_label)
           AS vr
  FROM votes)
SELECT id AS vec_id, own_label, nbr_label AS voted_label, n_votes,
       (nbr_label <> own_label AND n_votes >= 3) AS flagged
FROM top WHERE vr = 1
"""


def q_sim_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL (reciprocal) k-NN pairs: (a, b) kept only when b is in
    a's 3-NN AND a is in b's 3-NN — the standard high-precision match
    filter (hubness-resistant: a hub vector near everything is not
    reciprocated by its victims), used for ER confirmation and
    conservative semantic dedup.  One extra self-equi-join on the
    (n·k)-row kNN edge list — the n² never materializes."""
    from fluvio_duck_spark.operators.similarity import knn_graph_blocked

    g = knn_graph_blocked(load(spark, sf_dir, "embeddings"), k=3)
    fwd = g.select(
        F.col("id").alias("id_a"), F.col("nbr").alias("id_b"), "sim"
    ).filter(F.col("id_a") < F.col("id_b"))
    rev = g.select(
        F.col("nbr").alias("id_a"), F.col("id").alias("id_b")
    ).filter(F.col("id_a") < F.col("id_b"))
    return fwd.join(rev, ["id_a", "id_b"]).select("id_a", "id_b", "sim")


ORACLE_MUTUAL_KNN = f"""
WITH s AS (
  SELECT a.vec_id AS id, b.vec_id AS nbr, round({_COS_AB}, 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (
  SELECT id, nbr, sim,
         row_number() OVER (PARTITION BY id ORDER BY sim DESC, nbr) AS rn
  FROM s),
knn AS (SELECT id, nbr, sim FROM r WHERE rn <= 3)
SELECT f.id AS id_a, f.nbr AS id_b, f.sim
FROM knn f JOIN knn g ON g.id = f.nbr AND g.nbr = f.id
WHERE f.id < f.nbr
"""


QUERIES.update({
    "sim_knn_graph": QuerySpec(
        q_sim_knn_graph, ORACLE_KNN_GRAPH,
        doc="exact all-pairs 3-NN graph via blocked GEMM partial top-k",
    ),
    "sim_mutual_knn": QuerySpec(
        q_sim_mutual_knn, ORACLE_MUTUAL_KNN,
        doc="reciprocal 3-NN pairs (hubness-resistant match filter) — one self-join on the n*k edge list",
    ),
    "sim_label_noise": QuerySpec(
        q_sim_label_noise, ORACLE_LABEL_NOISE,
        doc="k-NN majority-vote label-noise flags on the blocked k-NN graph",
    ),
})


def q_sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank of batch retrieval results (λ=0.7,
    diversity weight 0.3): top-10 candidates per label-0 query vector,
    greedy 3-item diverse selection.  The greedy loop runs per query
    over ≤10 candidate rows; the oracle unrolls the same three greedy
    steps in SQL, so the sequential selection is hash-verified."""
    from fluvio_duck_spark.operators.similarity import mmr_rerank

    emb = load(spark, sf_dir, "embeddings")
    return mmr_rerank(
        emb, emb.filter(F.col("label") == 0), k=3, n_candidates=10
    )


ORACLE_MMR = _TOPK_BATCH_CTE.rstrip() + """,
c AS (SELECT query_id, vec_id AS cand, ROUND(sim, 6) AS sim FROM r WHERE rn <= 10),
p AS (
  SELECT c1.query_id, c1.cand AS i, c2.cand AS j,
         ROUND(list_aggregate(list_transform(range(1, len(a.nv)+1),
               t -> a.nv[t] * b.nv[t]), 'sum'), 6) AS psim
  FROM c c1
  JOIN c c2 ON c1.query_id = c2.query_id AND c1.cand <> c2.cand
  JOIN cn a ON a.vec_id = c1.cand
  JOIN cn b ON b.vec_id = c2.cand),
s1 AS (
  SELECT query_id, cand, sim, floor((0.7 * sim) * 1e6 + 0.5) / 1e6 AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor((0.7 * sim) * 1e6 + 0.5) / 1e6 DESC, cand) AS rr
  FROM c),
pick1 AS (SELECT query_id, cand, score FROM s1 WHERE rr = 1),
s2 AS (
  SELECT c.query_id, c.cand,
         floor((0.7 * c.sim - 0.3 * p.psim) * 1e6 + 0.5) / 1e6 AS score,
         row_number() OVER (PARTITION BY c.query_id
                            ORDER BY floor((0.7 * c.sim - 0.3 * p.psim) * 1e6 + 0.5) / 1e6 DESC,
                                     c.cand) AS rr
  FROM c
  JOIN pick1 k1 ON c.query_id = k1.query_id AND c.cand <> k1.cand
  JOIN p ON p.query_id = c.query_id AND p.i = c.cand AND p.j = k1.cand),
pick2 AS (SELECT query_id, cand, score FROM s2 WHERE rr = 1),
s3 AS (
  SELECT c.query_id, c.cand,
         floor((0.7 * c.sim - 0.3 * greatest(p1.psim, p2.psim)) * 1e6 + 0.5) / 1e6 AS score,
         row_number() OVER (PARTITION BY c.query_id
                            ORDER BY floor((0.7 * c.sim
                                           - 0.3 * greatest(p1.psim, p2.psim)) * 1e6 + 0.5) / 1e6
                                       DESC, c.cand) AS rr
  FROM c
  JOIN pick1 k1 ON c.query_id = k1.query_id AND c.cand <> k1.cand
  JOIN pick2 k2 ON c.query_id = k2.query_id AND c.cand <> k2.cand
  JOIN p p1 ON p1.query_id = c.query_id AND p1.i = c.cand AND p1.j = k1.cand
  JOIN p p2 ON p2.query_id = c.query_id AND p2.i = c.cand AND p2.j = k2.cand),
pick3 AS (SELECT query_id, cand, score FROM s3 WHERE rr = 1)
SELECT query_id, CAST(1 AS INTEGER) AS sel_rank, cand AS vec_id,
       score AS mmr_score FROM pick1
UNION ALL SELECT query_id, CAST(2 AS INTEGER), cand, score FROM pick2
UNION ALL SELECT query_id, CAST(3 AS INTEGER), cand, score FROM pick3
"""


QUERIES.update({
    "sim_mmr_rerank": QuerySpec(
        q_sim_mmr_rerank, ORACLE_MMR,
        doc="MMR diversity re-rank of batch retrieval (greedy selection, SQL-unrolled oracle)",
    ),
})


def q_text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary planning: build the top-500 token vocabulary
    by corpus frequency (the truncation every fixed-size tokenizer
    makes), then measure each document's OOV rate against it — the
    signal that decides whether V is large enough.  The vocabulary is
    top-V BY CONSTRUCTION, so broadcasting it is correct at any corpus
    size (contrast the full document-frequency table, which is not
    broadcastable — the tf-idf lesson); the top-V itself is a k-bounded
    heap, never a global sort."""
    from fluvio_duck_spark.operators.chunking import tokenize

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    ).filter(F.col("token") != "")
    vocab = (
        toks.groupBy("token").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(500)
        .select("token", F.lit(1).alias("__in_v"))
    )
    joined = toks.join(F.broadcast(vocab), "token", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


ORACLE_VOCAB_OOV = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS c FROM tok2 GROUP BY token
    ORDER BY c DESC, token LIMIT 500) v)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS INTEGER)
         AS n_oov,
       round(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM tok2 LEFT JOIN vocab v USING (token)
GROUP BY doc_id
"""


QUERIES.update({
    "text_vocab_oov": QuerySpec(
        q_text_vocab_oov, ORACLE_VOCAB_OOV,
        doc="top-V vocabulary build + per-doc OOV rate (tokenizer planning)",
    ),
})


_BM25_TERMS = ("hash", "join", "merge")


def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed 3-term query (k1=1.2, b=0.75)
    — the lexical-search scoring every retrieval pipeline starts from,
    entirely in Catalyst expressions.  Corpus statistics (N, avgdl)
    fold in as a 1-row aggregate crossJoin; the per-term idf table is
    |query terms| rows (broadcast is correct by construction); the
    top-20 is a k-bounded heap.  Per-term contributions are cast to
    DECIMAL before the per-doc sum so term order cannot move the hash."""
    from fluvio_duck_spark.operators.chunking import tokenize

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    ).filter(F.col("token") != "")
    # dl feeds the corpus totals AND the per-doc normalizer; without
    # materialization each branch re-scans + re-explodes the corpus
    # (branch reuse is not deduped) — |docs|-row table, checkpoint once
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl")).localCheckpoint(
        eager=True
    )
    totals = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    hits = toks.filter(F.col("token").isin(*_BM25_TERMS))
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * F.lit(2.2)
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("contrib"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("contrib").cast("decimal(18,12)")).cast("double"),
                6,
            ).alias("bm25")
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


ORACLE_BM25 = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM dl),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok2
  WHERE token IN ('hash', 'join', 'merge') GROUP BY doc_id, token),
idf AS (
  SELECT token, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
  FROM (SELECT token, COUNT(*) AS df FROM tf GROUP BY token) d, tot),
scored AS (
  SELECT tf.doc_id,
         idf.idf * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS contrib
  FROM tf JOIN idf USING (token) JOIN dl USING (doc_id) CROSS JOIN tot)
SELECT doc_id,
       round(CAST(SUM(CAST(contrib AS DECIMAL(18,12))) AS DOUBLE), 6) AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 20
"""


QUERIES.update({
    "text_bm25_search": QuerySpec(
        q_text_bm25_search, ORACLE_BM25,
        doc="BM25 lexical search scoring (k1=1.2, b=0.75), pure Catalyst, top-20 heap",
    ),
})


def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unaligned duplicated-span removal: any token position covered by
    a cross-document duplicated 8-gram is stripped everywhere (the
    sliding-window exact-substring dedup; contrast dedup_segments'
    aligned windows and dedup_boilerplate's whole-segment frequency)."""
    from fluvio_duck_spark.operators.dedup import substring_span_dedup

    return substring_span_dedup(load(spark, sf_dir, "documents"), min_span=8)


ORACLE_DEDUP_SPANS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
pos_tok AS (
  SELECT doc_id, CAST(i AS INTEGER) - 1 AS pos0, tk[CAST(i AS INTEGER)] AS token
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM toks) x),
grams AS (
  SELECT doc_id, CAST(i AS INTEGER) - 1 AS gpos0,
         array_to_string(tk[CAST(i AS INTEGER):(CAST(i AS INTEGER) + 7)], ' ')
           AS gram
  FROM (SELECT doc_id, tk, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS i
        FROM toks) x),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
covered AS (
  SELECT DISTINCT g.doc_id, g.gpos0 + CAST(j AS INTEGER) AS pos0
  FROM (SELECT doc_id, gpos0 FROM grams JOIN dup USING (gram)) g,
       (SELECT unnest(range(8)) AS j) o),
kept AS (
  SELECT p.doc_id, p.pos0, p.token FROM pos_tok p
  WHERE NOT EXISTS (SELECT 1 FROM covered c
                    WHERE c.doc_id = p.doc_id AND c.pos0 = p.pos0))
SELECT doc_id, COUNT(*) AS n_tokens_kept,
       string_agg(token, ' ' ORDER BY pos0) AS clean_text
FROM kept GROUP BY doc_id
"""


QUERIES.update({
    "dedup_substring_spans": QuerySpec(
        q_dedup_substring_spans, ORACLE_DEDUP_SPANS,
        doc="unaligned duplicated-span removal (sliding 8-gram exact substring dedup)",
    ),
})


def q_sim_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column (the
    4× memory compression every vector store applies before ANN):
    per-vector scale = max|x|/127, codes = floor(x/scale + 0.5).
    Entirely in-row HOF arithmetic — map-only at any corpus size.  The
    floor-form rounding is IEEE-identical in both engines (SQL ROUND
    half-away vs numpy/JVM half-even would diverge on exact halves);
    code sum is an exact integer parity check of every code, and the
    reconstruction-error stats fold sequentially in-row so both engines
    sum in the same order.  Nonzero-norm contract as the batch paths."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.transform(v, lambda x: F.floor(x / F.col("_scale") + F.lit(0.5)))
    err = F.transform(
        F.arrays_zip(v, F.col("_q")),
        lambda p: F.abs(
            p["embedding"].cast("double") - p["_q"] * F.col("_scale")
        ),
    )
    return (
        emb.withColumn("_scale", scale)
        .withColumn("_q", q)
        .withColumn("_err", err)
        .select(
            "vec_id",
            F.round("_scale", 9).alias("scale9"),
            F.size("_q").cast("int").alias("n_dims"),
            F.aggregate("_q", F.lit(0).cast("long"), lambda a, x: a + x)
            .alias("code_sum"),
            F.round(F.array_max("_err"), 9).alias("max_abs_err"),
            F.round(
                F.aggregate(
                    "_err", F.lit(0.0), lambda a, x: a + x * x
                )
                / F.size("_err"),
                9,
            ).alias("mse"),
        )
    )


ORACLE_SCALAR_QUANT = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings),
q AS (
  SELECT vec_id, scale, embedding,
         list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE) / scale + 0.5)) AS codes
  FROM s),
e AS (
  SELECT vec_id, scale, codes,
         list_transform(range(1, len(embedding) + 1),
                        i -> abs(CAST(embedding[i] AS DOUBLE)
                                 - codes[i] * scale)) AS errs
  FROM q)
SELECT vec_id, round(scale, 9) AS scale9,
       CAST(len(codes) AS INTEGER) AS n_dims,
       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
       round(list_max(errs), 9) AS max_abs_err,
       round(list_aggregate(list_transform(errs, x -> x * x), 'sum')
             / len(errs), 9) AS mse
FROM e
"""


QUERIES.update({
    "sim_scalar_quantize": QuerySpec(
        q_sim_scalar_quantize, ORACLE_SCALAR_QUANT,
        doc="symmetric int8 scalar quantization + reconstruction-error stats, map-only",
    ),
})


def q_curate_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE Catalyst plan — dedup →
    quality gate → per-source quota → mixture report — proving the
    operators compose without materialization barriers: exact-dedup
    keep-first (fingerprint window), token-count + stopword-density
    filters, a top-30-per-source cap (WindowGroupLimit pre-shuffle
    heap), and the per-source summary.  What a user's nightly corpus
    build actually runs; every stage reuses an operator verified
    individually elsewhere."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    fp = fingerprint("text")
    dedup_rn = F.row_number().over(
        W.partitionBy(fp).orderBy("doc_id")
    )
    surv = d.withColumn("_rn", dedup_rn).filter(F.col("_rn") == 1).drop("_rn")
    gated = surv.withColumn("_nt", token_count("text")).withColumn(
        "_sw", stopword_ratio("text")
    ).filter(
        (F.col("_nt") >= 20) & (F.col("_nt") <= 900) & (F.col("_sw") >= 0.03)
    )
    cap_rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )
    capped = gated.withColumn("_cap", cap_rn).filter(F.col("_cap") <= 30)
    return capped.groupBy("source").agg(
        F.count("*").cast("int").alias("n_kept"),
        F.round(F.sum("_nt") / F.count("*"), 6).alias("mean_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


ORACLE_CURATE_E2E = f"""
WITH surv AS (
  SELECT * FROM (
    SELECT d.*, row_number() OVER (
        PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
    FROM documents d) x WHERE rn = 1),
gated AS (
  SELECT doc_id, source, n_chars,
         len(string_split(text, ' ')) AS nt
  FROM surv
  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 900
    AND CAST(len(list_filter(string_split(text, ' '),
                             t -> t IN {_STOPLIST_SQL})) AS DOUBLE)
        / len(string_split(text, ' ')) >= 0.03),
capped AS (
  SELECT * FROM (
    SELECT g.*, row_number() OVER (
        PARTITION BY source ORDER BY n_chars DESC, doc_id) AS cap
    FROM gated g) y WHERE cap <= 30)
SELECT source, CAST(COUNT(*) AS INTEGER) AS n_kept,
       round(SUM(nt) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM capped GROUP BY source
"""


QUERIES.update({
    "curate_pipeline_e2e": QuerySpec(
        q_curate_pipeline_e2e, ORACLE_CURATE_E2E,
        doc="full curation pipeline in one plan: dedup -> quality gate -> per-source cap -> mixture report",
    ),
})


def _energy_frac(v, d: int):
    head = F.aggregate(
        F.slice(v, 1, d), F.lit(0.0), lambda a, x: a + x.cast("double") * x
    )
    full = F.aggregate(
        v, F.lit(0.0), lambda a, x: a + x.cast("double") * x
    )
    return F.round(head / full, 9)


def q_sim_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation planning: the fraction of each vector's L2
    energy captured by its first 8/16/32 dims — the statistic that
    decides how far an MRL-trained embedding can be truncated before
    retrieval quality collapses.  In-row slice+fold arithmetic, map-only
    at any corpus size; both engines fold sequentially left-to-right so
    the doubles are bit-identical."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(v).cast("int").alias("n_dims"),
        _energy_frac(v, 8).alias("frac8"),
        _energy_frac(v, 16).alias("frac16"),
        _energy_frac(v, 32).alias("frac32"),
    )


ORACLE_MATRYOSHKA = """
SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n_dims,
  round(list_aggregate(list_transform(embedding[1:8],
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
        / list_aggregate(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 9) AS frac8,
  round(list_aggregate(list_transform(embedding[1:16],
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
        / list_aggregate(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 9) AS frac16,
  round(list_aggregate(list_transform(embedding[1:32],
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
        / list_aggregate(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 9) AS frac32
FROM embeddings
"""


QUERIES.update({
    "sim_matryoshka_energy": QuerySpec(
        q_sim_matryoshka_energy, ORACLE_MATRYOSHKA,
        doc="per-vector truncation energy profile (MRL planning), map-only in-row folds",
    ),
})


def q_text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: Reciprocal Rank Fusion of the BM25 lexical
    top-20 (fixed 3-term query) and the vector cosine top-20 (query
    vector 0), fused as Σ 1/(60 + rank) — the standard zero-tuning
    fusion every hybrid search stack ships.  Both legs are k-bounded,
    the fusion is a full outer join of two 20-row lists: post-retrieval
    cost is O(k), independent of corpus size."""
    from pyspark.sql import Window as W

    from fluvio_duck_spark.operators.similarity import cosine_topk

    lex = q_text_bm25_search(spark, sf_dir).limit(20)
    lex = lex.withColumn(
        "lex_rank",
        F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    ).select("doc_id", "lex_rank")
    emb = load(spark, sf_dir, "embeddings")
    vec = cosine_topk(emb, query_id=0, k=20).withColumn(
        "vec_rank",
        F.row_number().over(W.orderBy(F.desc("sim"), F.asc("vec_id"))),
    ).select(F.col("vec_id").alias("doc_id"), "vec_rank")
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10)


ORACLE_HYBRID_RRF = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM dl),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok2
  WHERE token IN ('hash', 'join', 'merge') GROUP BY doc_id, token),
idf AS (
  SELECT token, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
  FROM (SELECT token, COUNT(*) AS df FROM tf GROUP BY token) d, tot),
scored AS (
  SELECT tf.doc_id,
         idf.idf * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS contrib
  FROM tf JOIN idf USING (token) JOIN dl USING (doc_id) CROSS JOIN tot),
bm AS (
  SELECT doc_id,
         round(CAST(SUM(CAST(contrib AS DECIMAL(18,12))) AS DOUBLE), 6) AS bm25
  FROM scored GROUP BY doc_id
  ORDER BY bm25 DESC, doc_id LIMIT 20),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM bm),
sims AS (
  SELECT b.vec_id AS doc_id, {_COS_AB} AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0),
vtop AS (
  SELECT doc_id, sim FROM sims ORDER BY sim DESC, doc_id LIMIT 20),
vec AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim DESC, doc_id) AS vec_rank
  FROM vtop)
SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
       round(COALESCE(1.0 / (60 + l.lex_rank), 0)
             + COALESCE(1.0 / (60 + v.vec_rank), 0), 9) AS rrf
FROM lex l FULL OUTER JOIN vec v USING (doc_id)
ORDER BY rrf DESC, doc_id LIMIT 10
"""


QUERIES.update({
    "text_hybrid_rrf": QuerySpec(
        q_text_hybrid_rrf, ORACLE_HYBRID_RRF,
        doc="hybrid retrieval: reciprocal-rank fusion of BM25 and vector top-20 lists",
    ),
})


def q_sim_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health check (dead dims, variance
    collapse, mean offset — the diagnostics run before whitening):
    posexplode to (dim, x) rows, ONE map-side-combined aggregation.
    The exchange carries |dims| partial-state rows per task, never
    vectors.  DECIMAL accumulation makes the moments hash-stable."""
    emb = load(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("dim", "x"))
    # decimal(18,9): float32 inputs fit losslessly-enough, and the
    # square stays within decimal(38) EXACTLY in both engines — a wider
    # scale overflows Spark's 38-digit cap and truncates differently
    # than DuckDB (observed as a 1e-6 var_pop flip at the round boundary)
    xd = F.col("x").cast("decimal(18,9)")
    return d.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.round(F.sum(xd).cast("double") / F.count("*"), 6).alias("mean"),
        F.round(
            F.sum(xd * xd).cast("double") / F.count("*")
            - F.pow(F.sum(xd).cast("double") / F.count("*"), 2),
            6,
        ).alias("var_pop"),
        F.round(F.min(F.col("x").cast("double")), 6).alias("lo"),
        F.round(F.max(F.col("x").cast("double")), 6).alias("hi"),
    )


ORACLE_DIM_STATS = """
WITH d AS (
  SELECT CAST(unnest(range(1, len(embedding)+1)) AS INTEGER) - 1 AS dim,
         unnest(embedding) AS x
  FROM embeddings)
SELECT dim, COUNT(*) AS n,
  round(CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS mean,
  round(CAST(SUM(CAST(x AS DECIMAL(18,9)) * CAST(x AS DECIMAL(18,9))) AS DOUBLE)
          / COUNT(*)
        - pow(CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 2), 6)
    AS var_pop,
  round(MIN(CAST(x AS DOUBLE)), 6) AS lo,
  round(MAX(CAST(x AS DOUBLE)), 6) AS hi
FROM d GROUP BY dim
"""


def q_sim_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus anisotropy — the expected pairwise cosine equals the
    squared norm of the mean UNIT vector (the standard one-pass
    identity; an isotropic cloud scores ~0, a collapsed cone ~1).
    L2-normalize per row (map-only), per-dim DECIMAL sums in one
    exchange, then the squared-norm fold over |dims| values."""
    from fluvio_duck_spark.functions.vectors import l2_normalize

    emb = load(spark, sf_dir, "embeddings")
    unit = emb.select(l2_normalize(F.col("embedding")).alias("u"))
    d = unit.select(F.posexplode("u").alias("dim", "x"))
    sums = d.groupBy("dim").agg(
        F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
        F.count("*").alias("n"),
    )
    return sums.agg(
        F.max("n").cast("bigint").alias("n_vectors"),
        F.round(
            F.sum(
                (F.col("s").cast("double") / F.col("n"))
                * (F.col("s").cast("double") / F.col("n"))
            ),
            6,
        ).alias("anisotropy"),
    )


ORACLE_ANISOTROPY = """
WITH unit AS (
  SELECT list_transform(embedding,
           x -> CAST(x AS DOUBLE) / sqrt(list_aggregate(list_transform(embedding,
                  y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))) AS u
  FROM embeddings),
d AS (
  SELECT CAST(unnest(range(1, len(u)+1)) AS INTEGER) - 1 AS dim, unnest(u) AS x
  FROM unit),
sums AS (
  SELECT dim, SUM(CAST(x AS DECIMAL(28,12))) AS s, COUNT(*) AS n
  FROM d GROUP BY dim)
SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
       round(SUM((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6)
         AS anisotropy
FROM sums
"""


QUERIES.update({
    "sim_dim_stats": QuerySpec(
        q_sim_dim_stats, ORACLE_DIM_STATS,
        doc="per-dimension embedding health stats (dims-bounded exchange)",
    ),
    "sim_anisotropy": QuerySpec(
        q_sim_anisotropy, ORACLE_ANISOTROPY,
        doc="corpus anisotropy via the mean-unit-vector identity, one pass",
    ),
})


def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact ROC-AUC via the rank identity
    AUC = (Σ ranks(pos) − n₊(n₊+1)/2) / (n₊ n₋) — evaluation INSIDE the
    engine, no sklearn, no collect.  Score = first embedding dim,
    positive = label 0 (a deterministic stand-in scorer; the shape is
    what matters).  Ranks come from the range-partitioned global rank,
    so the sort distributes; ties break on the id identically in both
    engines."""
    from fluvio_duck_spark.operators.ranking import global_rank

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("label") == 0).cast("int").alias("is_pos"),
    )
    ranked = global_rank(scored, ["score", "vec_id"], rank_col="rank")
    agg = ranked.agg(
        F.sum(F.when(F.col("is_pos") == 1, F.col("rank"))).alias("_rs"),
        F.sum("is_pos").alias("_np"),
        F.sum(1 - F.col("is_pos")).alias("_nn"),
    )
    return agg.select(
        F.col("_np").alias("n_pos"),
        F.col("_nn").alias("n_neg"),
        F.round(
            (F.col("_rs") - F.col("_np") * (F.col("_np") + 1) / 2)
            / (F.col("_np") * F.col("_nn")),
            6,
        ).alias("auc"),
    )


ORACLE_EVAL_AUC = """
WITH s AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS is_pos
  FROM embeddings),
r AS (
  SELECT is_pos,
         row_number() OVER (ORDER BY score, vec_id) AS rank
  FROM s)
SELECT CAST(SUM(is_pos) AS BIGINT) AS n_pos,
       CAST(SUM(1 - is_pos) AS BIGINT) AS n_neg,
       round((SUM(CASE WHEN is_pos = 1 THEN rank END)
              - SUM(is_pos) * (SUM(is_pos) + 1) / 2)
             / CAST(SUM(is_pos) * SUM(1 - is_pos) AS DOUBLE), 6) AS auc
FROM r
"""


def q_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: exact score deciles (range-partitioned
    binning — no single-reducer NTILE) × observed positive rate per
    bin, the calibration table a score ships with."""
    from fluvio_duck_spark.operators.ranking import quantile_bins

    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("label") == 0).cast("int").alias("is_pos"),
    )
    binned = quantile_bins(scored, ["score", "vec_id"], n_bins=10)
    return binned.groupBy("bin").agg(
        F.count("*").cast("int").alias("n"),
        F.round(F.min("score"), 6).alias("score_lo"),
        F.round(F.max("score"), 6).alias("score_hi"),
        F.round(F.sum("is_pos") / F.count("*"), 6).alias("pos_rate"),
    )


ORACLE_EVAL_CALIBRATION = """
WITH s AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS is_pos
  FROM embeddings),
r AS (
  SELECT score, is_pos,
         row_number() OVER (ORDER BY score, vec_id) AS rnk,
         count(*) OVER () AS n
  FROM s)
SELECT CAST(floor((rnk - 1) * 10 / n) + 1 AS INTEGER) AS bin,
       CAST(COUNT(*) AS INTEGER) AS n,
       round(MIN(score), 6) AS score_lo,
       round(MAX(score), 6) AS score_hi,
       round(SUM(is_pos) / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate
FROM r GROUP BY 1
"""


def q_eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score in-engine:
    Brier = reliability − resolution + uncertainty, over a discrete
    probability forecast (11 categories f = (vec_id % 11)/10 against
    outcome o = [label = 0]) — the forecast-quality audit a classifier
    gate ships with its calibration table.

    Exactness contract: all counts are BIGINT; every category/row term
    is quantized via round(x·1e12)→BIGINT (operators/pca.py contract)
    BEFORE the cross-group sum, so no double summation order leaks in;
    ō, ō_k and the final divisions are single correctly-rounded ops on
    identical inputs.  ``identity_ok`` re-derives Brier from the three
    components and checks them against the directly-summed per-row
    Brier within the quantization tolerance — a cross-engine proof the
    decomposition balances.

    At 100 TB: one row-level pass (partial count/sum map-side) into an
    11-row category table plus a 1-row total — two metadata-sized
    broadcasts, no data-sized shuffle beyond the category groupBy."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        (F.col("vec_id") % 11).alias("cat"),
        ((F.col("vec_id") % 11).cast("double") / F.lit(10.0)).alias("f"),
        (F.col("label") == 0).cast("long").alias("o"),
    )
    tot = base.agg(
        F.count("*").alias("n_total"),
        F.sum("o").alias("o_total"),
        F.sum(
            F.round((F.col("f") - F.col("o")) * (F.col("f") - F.col("o"))
                    * F.lit(1e12), 0).cast("long")
        ).alias("brier_fx"),
    )
    cat = base.groupBy("cat", "f").agg(
        F.count("*").alias("n_k"), F.sum("o").alias("c_k")
    )
    ok = F.col("c_k").cast("double") / F.col("n_k").cast("double")
    obar = F.col("o_total").cast("double") / F.col("n_total").cast("double")
    comp = cat.crossJoin(F.broadcast(tot)).select(
        F.round(F.col("n_k").cast("double") * (F.col("f") - ok) * (F.col("f") - ok)
                * F.lit(1e12), 0).cast("long").alias("rel_fx"),
        F.round(F.col("n_k").cast("double") * (ok - obar) * (ok - obar)
                * F.lit(1e12), 0).cast("long").alias("res_fx"),
        "n_total", "o_total", "brier_fx",
    )
    agg = comp.groupBy("n_total", "o_total", "brier_fx").agg(
        F.sum("rel_fx").alias("srel"), F.sum("res_fx").alias("sres")
    )
    den = F.col("n_total") * F.lit(1e12)
    obar2 = F.col("o_total").cast("double") / F.col("n_total").cast("double")
    brier = F.col("brier_fx").cast("double") / den
    rel = F.col("srel").cast("double") / den
    res = F.col("sres").cast("double") / den
    unc = obar2 * (F.lit(1.0) - obar2)
    return agg.select(
        F.col("n_total").alias("n"),
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        (F.abs(brier - (rel - res + unc)) < F.lit(1e-9)).alias("identity_ok"),
    )


ORACLE_BRIER = """
WITH base AS (
  SELECT vec_id % 11 AS cat,
         CAST(vec_id % 11 AS DOUBLE) / 10.0 AS f,
         CASE WHEN label = 0 THEN 1 ELSE 0 END AS o
  FROM embeddings),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(o) AS BIGINT) AS o_total,
         CAST(SUM(CAST(round((f - o) * (f - o) * 1e12) AS BIGINT)) AS BIGINT)
           AS brier_fx
  FROM base),
cat AS (
  SELECT cat, f, CAST(COUNT(*) AS BIGINT) AS n_k,
         CAST(SUM(o) AS BIGINT) AS c_k
  FROM base GROUP BY 1, 2),
comp AS (
  SELECT CAST(round(CAST(n_k AS DOUBLE)
                    * (f - CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE))
                    * (f - CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE))
                    * 1e12) AS BIGINT) AS rel_fx,
         CAST(round(CAST(n_k AS DOUBLE)
                    * (CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE)
                       - CAST(o_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                    * (CAST(c_k AS DOUBLE) / CAST(n_k AS DOUBLE)
                       - CAST(o_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                    * 1e12) AS BIGINT) AS res_fx,
         n_total, o_total, brier_fx
  FROM cat, tot),
agg AS (
  SELECT n_total, o_total, brier_fx,
         CAST(SUM(rel_fx) AS BIGINT) AS srel,
         CAST(SUM(res_fx) AS BIGINT) AS sres
  FROM comp GROUP BY 1, 2, 3)
SELECT n_total AS n,
       round(CAST(brier_fx AS DOUBLE) / (n_total * 1e12), 6) AS brier,
       round(CAST(srel AS DOUBLE) / (n_total * 1e12), 6) AS reliability,
       round(CAST(sres AS DOUBLE) / (n_total * 1e12), 6) AS resolution,
       round((CAST(o_total AS DOUBLE) / CAST(n_total AS DOUBLE))
             * (1.0 - CAST(o_total AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
         AS uncertainty,
       abs(CAST(brier_fx AS DOUBLE) / (n_total * 1e12)
           - (CAST(srel AS DOUBLE) / (n_total * 1e12)
              - CAST(sres AS DOUBLE) / (n_total * 1e12)
              + (CAST(o_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                * (1.0 - CAST(o_total AS DOUBLE) / CAST(n_total AS DOUBLE))))
         < 1e-9 AS identity_ok
FROM agg
"""


QUERIES.update({
    "eval_auc": QuerySpec(
        q_eval_auc, ORACLE_EVAL_AUC,
        doc="exact ROC-AUC via the rank identity, range-partitioned rank (eval-in-engine)",
    ),
    "eval_calibration": QuerySpec(
        q_eval_calibration, ORACLE_EVAL_CALIBRATION,
        doc="reliability diagram: exact score deciles x positive rate",
    ),
    "eval_brier_decomposition": QuerySpec(
        q_eval_brier_decomposition, ORACLE_BRIER,
        doc="Murphy decomposition of the Brier score (reliability - resolution "
            "+ uncertainty) with a cross-engine balance proof, fixed-point exact",
    ),
})


# ---------------------------------------------------------------------------
# curate_split_leakage — near-dup pairs straddling the train/val/test split
# ---------------------------------------------------------------------------

def q_curate_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: exact near-duplicate pairs (5-gram Jaccard
    ≥ 0.8 — the `dedup_ngram_jaccard` machinery) whose two documents
    landed in DIFFERENT splits under the deterministic assignment
    (`sample_split_assign` machinery).  Any row here means a held-out
    document has a training near-twin — the leak that inflates evals.

    Plan composition: the inverted-index pair search dominates (bounded
    by shingle document frequency, never all-pairs); the split columns
    are map-only hash arithmetic, and the pair⇄split joins are
    pair-table-sized.  Splits are integer-keyspace cuts, so the audit
    is engine-reproducible end-to-end.
    """
    from fluvio_duck_spark.operators.sampling import split_assign

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, k=5, threshold=0.8)
    splits = split_assign(docs.select("doc_id")).select(
        "doc_id", "split"
    )
    sa = splits.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "split", "split_a"
    )
    sb = splits.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "split", "split_b"
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            "doc_a", "doc_b", "jaccard", "split_a", "split_b"
        )
    )


ORACLE_SPLIT_LEAKAGE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 3, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))) AS s
  FROM w),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b,
         CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
sp AS (
  SELECT doc_id,
         CASE WHEN ((doc_id + 1) * 2654435761) % 1000003 < 900002 THEN 'train'
              WHEN ((doc_id + 1) * 2654435761) % 1000003 < 950002 THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT p.doc_a, p.doc_b, p.jaccard, a.split AS split_a, b.split AS split_b
FROM pairs p
JOIN sp a ON a.doc_id = p.doc_a
JOIN sp b ON b.doc_id = p.doc_b
WHERE a.split <> b.split
"""


QUERIES.update({
    "curate_split_leakage": QuerySpec(
        q_curate_split_leakage, ORACLE_SPLIT_LEAKAGE,
        doc="split-leakage audit: exact near-dup pairs straddling train/val/test",
    ),
})


# ---------------------------------------------------------------------------
# eval_ndcg_mrr — ranked-retrieval quality scored in-engine
# ---------------------------------------------------------------------------

def q_eval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-in-engine ranking metrics: nDCG@10 and MRR per query over
    the exact cosine top-10, with binary relevance = "corpus label
    matches the query label" — the retrieval scorecard beside recall
    (sim_ivf_recall) and classification metrics (eval_auc).

    The ranked lists come from the oracle-anchored exact batch-retrieval
    plan; metrics are in-row folds over each ≤10-element list.  DCG/IDCG
    fold left-to-right over identical doubles in both engines (the
    matryoshka-fold precedent), so the scores hash-match without any
    decimal detour; MRR is one exact division.
    """
    from fluvio_duck_spark.operators.similarity import cosine_topk_batch

    emb = load(spark, sf_dir, "embeddings")
    top = cosine_topk_batch(emb, emb.filter(F.col("vec_id") < 5), k=10)
    lab = emb.select("vec_id", "label")
    scored = (
        top.join(
            lab.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
                "label", "qlabel"
            ),
            "query_id",
        )
        .join(lab.withColumnRenamed("label", "clabel"), "vec_id")
        .select(
            "query_id",
            "rn",
            (F.col("clabel") == F.col("qlabel")).cast("int").alias("rel"),
        )
    )
    g = scored.groupBy("query_id").agg(
        F.array_sort(F.collect_list(F.struct("rn", "rel"))).alias("rr"),
        F.sum("rel").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_rel"),
    )
    dcg = F.aggregate(
        F.transform(
            "rr",
            lambda s: s["rel"].cast("double")
            / F.log2(s["rn"].cast("double") + F.lit(1.0)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("n_rel")),
        F.lit(0.0),
        lambda a, i: a + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return g.select(
        "query_id",
        F.col("n_rel").cast("int").alias("n_rel_10"),
        F.when(F.col("n_rel") > 0, F.round(dcg / idcg, 6)).alias("ndcg10"),
        F.round(F.lit(1.0) / F.col("first_rel"), 6).alias("mrr"),
    )


ORACLE_NDCG_MRR = """
WITH cn AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(x AS DOUBLE) / sqrt(list_aggregate(list_transform(embedding,
                  y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))) AS nv
  FROM embeddings),
q AS (SELECT vec_id AS query_id, nv AS qv FROM cn WHERE vec_id < 5),
s AS (
  SELECT q.query_id, c.vec_id,
    list_aggregate(list_transform(range(1, len(c.nv)+1),
        i -> c.nv[i] * q.qv[i]), 'sum') AS sim
  FROM cn c CROSS JOIN q WHERE c.vec_id <> q.query_id),
r AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS rn
  FROM s),
top AS (SELECT query_id, vec_id, rn FROM r WHERE rn <= 10),
scored AS (
  SELECT t.query_id, t.rn,
         CASE WHEN ce.label = qe.label THEN 1 ELSE 0 END AS rel
  FROM top t
  JOIN embeddings ce ON ce.vec_id = t.vec_id
  JOIN embeddings qe ON qe.vec_id = t.query_id),
g AS (
  SELECT query_id,
         list(rel ORDER BY rn) AS rr,
         sum(rel) AS n_rel,
         min(CASE WHEN rel = 1 THEN rn END) AS first_rel
  FROM scored GROUP BY 1)
SELECT query_id,
       CAST(n_rel AS INTEGER) AS n_rel_10,
       CASE WHEN n_rel > 0 THEN round(
         list_aggregate(list_transform(range(1, len(rr)+1),
             i -> CAST(rr[i] AS DOUBLE) / log2(CAST(i AS DOUBLE) + 1.0)), 'sum')
         / list_aggregate(list_transform(range(1, CAST(n_rel AS INTEGER)+1),
             i -> CAST(1.0 AS DOUBLE) / log2(CAST(i AS DOUBLE) + 1.0)), 'sum'),
         6) END AS ndcg10,
       round(CAST(1.0 AS DOUBLE) / first_rel, 6) AS mrr
FROM g
"""


QUERIES.update({
    "eval_ndcg_mrr": QuerySpec(
        q_eval_ndcg_mrr, ORACLE_NDCG_MRR,
        doc="eval-in-engine ranking metrics: nDCG@10 + MRR per query from exact top-10",
    ),
})


# ---------------------------------------------------------------------------
# sim_label_propagation — semi-supervised labels over the k-NN graph
# ---------------------------------------------------------------------------

def q_sim_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation: 25% of points keep their label
    (vec_id % 4 == 0 — the deterministic seed set); everyone else takes
    the majority label of their 5 nearest neighbors, two rounds, seeds
    frozen — the cheap label-densification step before training on a
    partially-labeled corpus.

    Per round: one edges⋈labels join (n·k rows), a majority-vote agg,
    a keep-first window, and the label update — all n·k-bounded; the n²
    never materializes (edges come from the blocked-GEMM k-NN graph,
    neighbor choice engine-reproducible via 6-dp sim rounding).  Two
    FIXED rounds keep it oracle-checkable (production loops until no
    label changes, one count per round).
    """
    from pyspark.sql import Window as W

    from fluvio_duck_spark.operators.similarity import knn_graph_blocked

    emb = load(spark, sf_dir, "embeddings")
    # materialize the k-NN edge list ONCE (n·k-sized — the same bound as
    # every per-round shuffle): both rounds join it, and without the
    # checkpoint each round re-executes the blocked-GEMM graph build
    # (the operators/dedup.py::connected_components lesson)
    edges = knn_graph_blocked(emb, k=5).select("id", "nbr").localCheckpoint()
    is_seed = F.col("id") % 4 == 0
    cur = emb.select(
        F.col("vec_id").alias("id"),
        F.when(F.col("vec_id") % 4 == 0, F.col("label")).alias("lbl"),
    )
    for _ in range(2):
        # NOT hinted (r13 session 5): the vote join's label side is n
        # rows with live size estimates (its lineage is not behind the
        # checkpoint), so the planner broadcasts it locally — zero
        # shuffle of the n·k edges — and falls back to a shuffle join
        # size-adaptively once labels outgrow the threshold.  Forcing
        # SHUFFLE_HASH was measured to ADD the edge exchange the
        # broadcast avoids; the pagerank-round argument does not apply
        # because nothing blinds the planner here.
        votes = (
            edges.join(
                cur.select(
                    F.col("id").alias("nbr"), F.col("lbl").alias("nlbl")
                ),
                "nbr",
            )
            .filter(F.col("nlbl").isNotNull())
            .groupBy("id", "nlbl")
            .agg(F.count("*").alias("n"))
        )
        rn = F.row_number().over(
            W.partitionBy("id").orderBy(F.desc("n"), F.asc("nlbl"))
        )
        top = votes.withColumn("_rn", rn).filter(F.col("_rn") == 1).select(
            "id", F.col("nlbl").alias("voted")
        )
        cur = cur.join(top, "id", "left").select(
            "id",
            F.when(is_seed, F.col("lbl"))
            .otherwise(F.coalesce(F.col("voted"), F.col("lbl")))
            .alias("lbl"),
        )
    truth = emb.select(
        F.col("vec_id").alias("id"), F.col("label").alias("own_label")
    )
    return cur.join(truth, "id").select(
        F.col("id").alias("vec_id"),
        is_seed.alias("is_seed"),
        F.col("lbl").alias("label_prop"),
        "own_label",
        (F.col("lbl") == F.col("own_label")).alias("correct"),
    )


ORACLE_LABEL_PROP = f"""
WITH s AS (
  SELECT a.vec_id AS id, b.vec_id AS nbr, round({_COS_AB}, 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (
  SELECT id, nbr, row_number() OVER (PARTITION BY id
                                     ORDER BY sim DESC, nbr) AS rn
  FROM s),
edges AS (SELECT id, nbr FROM r WHERE rn <= 5),
l0 AS (
  SELECT vec_id AS id,
         CASE WHEN vec_id % 4 = 0 THEN label END AS lbl
  FROM embeddings),
v1 AS (
  SELECT e.id, l.lbl AS nlbl, count(*) AS n
  FROM edges e JOIN l0 l ON l.id = e.nbr
  WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
t1 AS (
  SELECT id, nlbl, row_number() OVER (PARTITION BY id
                                      ORDER BY n DESC, nlbl) AS vr
  FROM v1),
l1 AS (
  SELECT l0.id,
         CASE WHEN l0.id % 4 = 0 THEN l0.lbl
              ELSE COALESCE(t1.nlbl, l0.lbl) END AS lbl
  FROM l0 LEFT JOIN (SELECT id, nlbl FROM t1 WHERE vr = 1) t1 USING (id)),
v2 AS (
  SELECT e.id, l.lbl AS nlbl, count(*) AS n
  FROM edges e JOIN l1 l ON l.id = e.nbr
  WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
t2 AS (
  SELECT id, nlbl, row_number() OVER (PARTITION BY id
                                      ORDER BY n DESC, nlbl) AS vr
  FROM v2),
l2 AS (
  SELECT l1.id,
         CASE WHEN l1.id % 4 = 0 THEN l1.lbl
              ELSE COALESCE(t2.nlbl, l1.lbl) END AS lbl
  FROM l1 LEFT JOIN (SELECT id, nlbl FROM t2 WHERE vr = 1) t2 USING (id))
SELECT l2.id AS vec_id, l2.id % 4 = 0 AS is_seed, l2.lbl AS label_prop,
       e.label AS own_label, l2.lbl = e.label AS correct
FROM l2 JOIN embeddings e ON e.vec_id = l2.id
"""


QUERIES.update({
    "sim_label_propagation": QuerySpec(
        q_sim_label_propagation, ORACLE_LABEL_PROP,
        doc="semi-supervised 2-round k-NN label propagation, seeds frozen, n*k-bounded rounds",
    ),
})


# ---------------------------------------------------------------------------
# text_bpe_fit — BPE tokenizer fitting, SQL-unrolled oracle
# ---------------------------------------------------------------------------

def q_text_bpe_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 BPE merges learned from the documents corpus
    (operators/bpe.py): corpus → word-frequency table once, then every
    round is a vocab-sized pair count + argmax + greedy fold.  The
    oracle unrolls all six rounds in SQL — pair counts via position
    explode, the greedy merge application via a recursive-CTE fold per
    word — so an ITERATIVE tokenizer-training algorithm gets an exact
    hash-compared oracle, same as graph_pagerank's unrolled recurrence."""
    from fluvio_duck_spark.operators.bpe import bpe_fit

    return bpe_fit(load(spark, sf_dir, "documents"), n_merges=6)


def _bpe_oracle_ctes(n_merges: int = 6) -> str:
    """The merge-learning CTE chain (v1..best{n}) shared by the fit
    oracle and the encode oracle."""
    parts = ["""WITH RECURSIVE v1 AS MATERIALIZED (
  SELECT CAST(cnt AS BIGINT) AS cnt,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
  FROM (SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY word))"""]
    for r in range(1, n_merges + 1):
        parts.append(f"""best{r} AS MATERIALIZED (
  SELECT {r} AS round, a AS sym_a, b AS sym_b,
         CAST(SUM(cnt) AS BIGINT) AS pair_count
  FROM (SELECT cnt, syms[CAST(i.i AS INTEGER)] AS a,
               syms[CAST(i.i AS INTEGER) + 1] AS b
        FROM v{r}, (SELECT unnest(range(1, 1000)) AS i) i
        WHERE i.i < len(syms))
  GROUP BY a, b
  ORDER BY pair_count DESC, a, b LIMIT 1)""")
        if r < n_merges:
            parts.append(f"""f{r} AS (
  SELECT cnt, syms, 2 AS i, list_slice(syms, 1, 1) AS acc FROM v{r}
  UNION ALL
  SELECT cnt, syms, i + 1,
    CASE WHEN acc[len(acc)] = (SELECT sym_a FROM best{r})
              AND syms[i] = (SELECT sym_b FROM best{r})
         THEN list_append(list_slice(acc, 1, len(acc) - 1),
                          (SELECT sym_a || sym_b FROM best{r}))
         ELSE list_append(acc, syms[i]) END
  FROM f{r} WHERE i <= len(syms)),
v{r + 1} AS MATERIALIZED (SELECT cnt, acc AS syms FROM f{r} WHERE i = len(syms) + 1)""")
    return ",\n".join(parts)


def _bpe_oracle(n_merges: int = 6) -> str:
    tail = "\nUNION ALL\n".join(
        f"SELECT round, sym_a, sym_b, pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return _bpe_oracle_ctes(n_merges) + "\n" + tail


QUERIES.update({
    "text_bpe_fit": QuerySpec(
        q_text_bpe_fit, _bpe_oracle(6),
        doc="BPE tokenizer fit: 6 merges, one corpus pass + vocab-sized rounds; recursive-CTE-unrolled oracle",
    ),
})


# ---------------------------------------------------------------------------
# round-4 additions: DSIR importance weights, prefix-filtered exact Jaccard,
# BPE tokenizer application
# ---------------------------------------------------------------------------


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/dsir.py): every document
    scored by Σ n_f·[ln p̂_en(f) − ln p̂_corpus(f)] over 256 hashed
    bigram buckets, target slice = lang='en'.  One corpus-sized shuffle
    (per-doc sum); the feature tables are ≤256 rows and broadcast."""
    from fluvio_duck_spark.operators.dsir import dsir_logweights

    return dsir_logweights(
        load(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


def _oracle_dsir() -> str:
    from fluvio_duck_spark.operators.dsir import N_BUCKETS, hash_bucket_sql

    gram = ("list_extract(tk, CAST(i AS INTEGER)) || ' ' || "
            "list_extract(tk, CAST(i AS INTEGER) + 1)")
    b = N_BUCKETS
    return f"""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
bi AS (
  SELECT doc_id, lang, {hash_bucket_sql(gram)} AS bucket
  FROM (SELECT doc_id, lang, tk, unnest(range(1, len(tk))) AS i
        FROM t WHERE len(tk) >= 2) x),
cc AS (SELECT bucket, COUNT(*) AS cc FROM bi GROUP BY bucket),
ct AS (SELECT bucket, COUNT(*) AS ct FROM bi WHERE lang = 'en' GROUP BY bucket),
tot AS (SELECT (SELECT SUM(cc) FROM cc) AS nc,
               (SELECT COALESCE(SUM(ct), 0) FROM ct) AS nt),
lam AS (
  SELECT cc.bucket,
         ln(CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) / CAST(nt + {b} AS DOUBLE))
       - ln(CAST(cc.cc + 1 AS DOUBLE) / CAST(nc + {b} AS DOUBLE)) AS lam
  FROM cc LEFT JOIN ct USING (bucket) CROSS JOIN tot)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_grams,
       CAST(SUM(CAST(lam AS DECIMAL(28,12))) AS DOUBLE) AS dsir_logweight
FROM bi JOIN lam USING (bucket) GROUP BY doc_id
"""


def q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard pairs ≥ 4/5
    (operators/dedup.py::ngram_jaccard_pairs_prefix): the AllPairs/
    PPJoin bound — self-join only on each doc's rarest
    (n − ⌈t·n⌉ + 1) shingles, verify candidates with full intersection
    counts.  Same answer as the unbounded all-pairs join (the oracle IS
    the unbounded form), with join fan-out cut to the prefix."""
    from fluvio_duck_spark.operators.dedup import ngram_jaccard_pairs_prefix

    return ngram_jaccard_pairs_prefix(
        load(spark, sf_dir, "documents"), k=5,
        threshold_num=4, threshold_den=5,
    )


def q_dedup_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold calibration — the report a pipeline owner reads
    BEFORE choosing a near-dup cutoff: ONE pass of the prefix-filtered
    exact Jaccard machinery at the loosest candidate threshold (1/2),
    banded into the operating points ([0.5,0.7), [0.7,0.9), [0.9,1.0])
    with exact pair counts and the ppm-floored jaccard range per band.
    Band tests are pure integer arithmetic (10·common vs 7·union /
    9·union), so the banding is tie-free on both engines; the jaccard
    range is floor-ppm of identical doubles (trap #1).  Plan: the same
    PPJoin prefix bound as dedup_jaccard_prefix (wider prefix at t=0.5,
    still candidate-bounded), then a 3-row aggregate."""
    from fluvio_duck_spark.operators.dedup import ngram_jaccard_pairs_prefix

    pairs = ngram_jaccard_pairs_prefix(
        load(spark, sf_dir, "documents"), k=5,
        threshold_num=1, threshold_den=2, keep_counts=True,
    )
    u = F.col("na") + F.col("nb") - F.col("common")
    band = (
        F.when(F.lit(10) * F.col("common") >= F.lit(9) * u, "[0.9,1.0]")
        .when(F.lit(10) * F.col("common") >= F.lit(7) * u, "[0.7,0.9)")
        .otherwise("[0.5,0.7)")
    )
    jppm = F.floor(F.col("jaccard") * 1000000).cast("long")
    return (
        pairs.select(band.alias("band"), jppm.alias("jppm"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("jppm").alias("min_jaccard_ppm"),
            F.max("jppm").alias("max_jaccard_ppm"),
        )
    )


ORACLE_THRESHOLD_CALIBRATION = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 3, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))) AS s
  FROM w),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT c, (sa.n + sb.n - c) AS u,
         CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE 2 * c >= 1 * (sa.n + sb.n - c)),
banded AS (
  SELECT CASE WHEN 10 * c >= 9 * u THEN '[0.9,1.0]'
              WHEN 10 * c >= 7 * u THEN '[0.7,0.9)'
              ELSE '[0.5,0.7)' END AS band,
         CAST(floor(jaccard * 1000000) AS BIGINT) AS jppm
  FROM pairs)
SELECT band, COUNT(*) AS n_pairs,
       MIN(jppm) AS min_jaccard_ppm, MAX(jppm) AS max_jaccard_ppm
FROM banded GROUP BY band
"""


#: the UNBOUNDED exact form — prefix filtering must reproduce it exactly
ORACLE_JACCARD_PREFIX = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 3, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))) AS s
  FROM w),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 5 * c >= 4 * (sa.n + sb.n - c)
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION (operators/bpe.py::bpe_encode_tokens):
    fit 6 BPE merges on the corpus, then encode every document and
    report per-doc word/BPE-token counts.  The merge list is
    vocab-bounded driver state (kmeans-codebook precedent); encoding
    runs over the DISTINCT-word table as K boundary-safe string
    replaces — zero Python, two shuffles."""
    from fluvio_duck_spark.operators.bpe import bpe_encode_tokens, bpe_fit_merges

    docs = load(spark, sf_dir, "documents")
    merges = [
        (a, b) for _, a, b, _ in bpe_fit_merges(docs, n_merges=6)
    ]
    return bpe_encode_tokens(docs, merges)


def _bpe_encode_oracle(n_merges: int = 6) -> str:
    """Recompute the merges with the fit oracle's CTE chain, then apply
    them as nested boundary-safe replaces over the distinct-word table
    (scalar subqueries against best1..bestK)."""
    enc = "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')"
    for r in range(1, n_merges + 1):
        pat = (f"' ' || (SELECT sym_a FROM best{r}) || '  ' || "
               f"(SELECT sym_b FROM best{r}) || ' '")
        rep = f"' ' || (SELECT sym_a || sym_b FROM best{r}) || ' '"
        enc = f"replace({enc}, {pat}, {rep})"
    return _bpe_oracle_ctes(n_merges) + f""",
wrd AS MATERIALIZED (
  SELECT doc_id, word FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents) z
  WHERE word <> ''),
encw AS MATERIALIZED (
  SELECT word,
         len(string_split_regex(trim({enc}), ' +')) AS n_tok
  FROM (SELECT DISTINCT word FROM wrd) dw)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
FROM wrd JOIN encw USING (word) GROUP BY doc_id
"""


def q_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT shingle-containment pairs ≥ 9/10
    (operators/dedup.py::ngram_containment_pairs_prefix): doc-in-doc
    duplication — flags a doc mostly contained in another even when the
    container is much larger (symmetric Jaccard misses those).  The
    oracle is the unbounded all-ordered-pairs form; the prefix bound
    must reproduce it exactly."""
    from fluvio_duck_spark.operators.dedup import ngram_containment_pairs_prefix

    return ngram_containment_pairs_prefix(
        load(spark, sf_dir, "documents"), k=5,
        threshold_num=9, threshold_den=10,
    )


#: the UNBOUNDED exact ordered-pairs form — prefix filtering must match it
ORACLE_CONTAINMENT_PREFIX = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 3, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))) AS s
  FROM w),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(c AS DOUBLE) / sa.n AS containment
FROM common JOIN sizes sa ON sa.doc_id = doc_a
WHERE 10 * c >= 9 * sa.n
"""


def q_keep_drop_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation END ARTIFACT: one keep/drop decision per document
    with its reason, composing three gates in priority order —
    (1) ``exact_dup``: byte-identical (normalized md5), keep-earliest;
    (2) ``contained``: ≥9/10 of the doc's shingles inside another doc
    (ngram_containment_pairs_prefix), dropped unless every containing
    relationship is mutual with a HIGHER id (mutual near-identical
    pairs keep the earliest — consistent with exact dedup; one-way
    containment always drops the contained doc);
    (3) ``low_quality``: the classifier gate's integer-exact logit < 0.
    Survivors are ``keep``.  This is the table a 100 TB pipeline writes
    last and audits first; each component keeps its own scale shape
    (fingerprint shuffle, prefix join, map-only logit)."""
    docs = load(spark, sf_dir, "documents")

    from fluvio_duck_spark.operators.dedup import ngram_containment_pairs_prefix

    fp = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    )
    canon = fp.groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    exact_drop = (
        fp.join(canon, "fp")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
        .withColumn("r_exact", F.lit(1))
    )

    pairs = ngram_containment_pairs_prefix(
        docs, k=5, threshold_num=9, threshold_den=10
    ).select("doc_a", "doc_b").localCheckpoint(eager=False)
    # ^ lazy checkpoint of the candidate-pair table (pair-count-bounded):
    # it feeds BOTH the forward and the reversed (mutuality) side of the
    # left join below.  r13 measured no win at sf0.1 and left it to AQE
    # stage reuse; the r14 sf1 event-log profile showed reuse only
    # covers the EXCHANGE — the post-shuffle containment computation ran
    # twice (two ~30 s-CPU stages reading the same 49 MB shuffle).
    # Checkpointing materializes the pairs once: the duplicated ~30 s
    # stage disappears from the sf1 profile (61 → 31 s of stage CPU).
    rev = pairs.select(
        F.col("doc_a").alias("doc_b"), F.col("doc_b").alias("doc_a")
    ).withColumn("mutual", F.lit(1))
    contained_drop = (
        pairs.join(rev, ["doc_a", "doc_b"], "left")
        .filter(F.col("mutual").isNull() | (F.col("doc_b") < F.col("doc_a")))
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("r_cont", F.lit(1))
    )

    w = F.split(F.col("text"), " ")
    sw = F.size(
        F.filter(w, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is", "it"))
    )
    logit = (
        F.lit(-400000)
        + F.lit(45000) * sw
        + F.lit(10000) * F.size(F.array_distinct(w))
        - F.lit(1500) * F.size(w)
    )
    scored = docs.select("doc_id", (logit < 0).cast("int").alias("r_qual"))

    m = (
        scored.join(exact_drop, "doc_id", "left")
        .join(contained_drop, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("r_exact") == 1, "exact_dup")
            .when(F.col("r_cont") == 1, "contained")
            .when(F.col("r_qual") == 1, "low_quality")
            .otherwise("keep")
            .alias("reason"),
        )
    )
    return m.select(
        "doc_id",
        (F.col("reason") == "keep").alias("keep"),
        "reason",
    )


ORACLE_KEEP_DROP = """
WITH fp AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents),
canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM fp GROUP BY fp),
exact_drop AS (
  SELECT doc_id FROM fp JOIN canon USING (fp) WHERE doc_id <> canonical_id),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 3, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))) AS s
  FROM w),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b USING (s) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2),
p AS (
  SELECT doc_a, doc_b FROM common JOIN sizes sa ON sa.doc_id = doc_a
  WHERE 10 * c >= 9 * sa.n),
contained_drop AS (
  SELECT DISTINCT p.doc_a AS doc_id
  FROM p LEFT JOIN p q ON q.doc_a = p.doc_b AND q.doc_b = p.doc_a
  WHERE q.doc_a IS NULL OR p.doc_b < p.doc_a),
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
qual AS (
  SELECT doc_id,
         -400000
           + 45000 * len(list_filter(w,
               t -> t IN ('the','a','of','and','to','in','is','it')))
           + 10000 * len(list_distinct(w))
           - 1500 * len(w) AS logit_ppm
  FROM t),
m AS (
  SELECT d.doc_id,
         CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
              WHEN c.doc_id IS NOT NULL THEN 'contained'
              WHEN q.logit_ppm < 0 THEN 'low_quality'
              ELSE 'keep' END AS reason
  FROM documents d
  LEFT JOIN exact_drop e ON e.doc_id = d.doc_id
  LEFT JOIN contained_drop c ON c.doc_id = d.doc_id
  JOIN qual q ON q.doc_id = d.doc_id)
SELECT doc_id, reason = 'keep' AS keep, reason FROM m
"""


QUERIES.update({
    "curate_keep_drop_manifest": QuerySpec(
        q_keep_drop_manifest, ORACLE_KEEP_DROP,
        doc="curation end artifact: per-doc keep/drop decision + reason (exact dup > containment > quality gate), each gate at its own scale shape",
    ),
})


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY report — BPE tokens per word, by source: the
    number a tokenizer team watches per domain before committing a vocab
    (high fertility on a source = that domain is under-represented in
    the merges and trains slower).  Composes bpe_fit + bpe_encode_tokens
    (vocab-bounded driver state) with a per-source roll-up; fertility is
    an exact integer ratio surfaced as a 6-dp-rounded double so both
    engines agree at the hash level."""
    from fluvio_duck_spark.operators.bpe import bpe_encode_tokens, bpe_fit_merges

    docs = load(spark, sf_dir, "documents")
    merges = [
        (a, b) for _, a, b, _ in bpe_fit_merges(docs, n_merges=6)
    ]
    enc = bpe_encode_tokens(docs, merges).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return enc.groupBy("source").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.round(
            F.sum("n_bpe_tokens").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
    )


def _bpe_fertility_oracle(n_merges: int = 6) -> str:
    """Per-source roll-up over the same encode chain as the bpe_encode
    oracle (merges recomputed by the fit CTEs, applied as nested
    boundary-safe replaces over the distinct-word table)."""
    enc = "'  ' || regexp_replace(word, '(.)', '\\1  ', 'g')"
    for r in range(1, n_merges + 1):
        pat = (f"' ' || (SELECT sym_a FROM best{r}) || '  ' || "
               f"(SELECT sym_b FROM best{r}) || ' '")
        rep = f"' ' || (SELECT sym_a || sym_b FROM best{r}) || ' '"
        enc = f"replace({enc}, {pat}, {rep})"
    return _bpe_oracle_ctes(n_merges) + f""",
wrd AS MATERIALIZED (
  SELECT doc_id, word FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents) z
  WHERE word <> ''),
encw AS MATERIALIZED (
  SELECT word,
         len(string_split_regex(trim({enc}), ' +')) AS n_tok
  FROM (SELECT DISTINCT word FROM wrd) dw),
perdoc AS (
  SELECT doc_id, COUNT(*) AS n_words, SUM(n_tok) AS n_bpe
  FROM wrd JOIN encw USING (word) GROUP BY doc_id)
SELECT d.source, CAST(COUNT(*) AS INT) AS n_docs,
       CAST(SUM(p.n_words) AS BIGINT) AS n_words,
       CAST(SUM(p.n_bpe) AS BIGINT) AS n_bpe_tokens,
       round(CAST(SUM(p.n_bpe) AS DOUBLE) / SUM(p.n_words), 6) AS fertility
FROM perdoc p JOIN documents d USING (doc_id)
GROUP BY d.source
"""


def q_novelty_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document NOVELTY — the fraction of a doc's distinct 3-gram
    shingles whose FIRST corpus occurrence (minimum doc id, the arrival
    order) is this doc.  The content-contribution metric a dedup'd
    corpus is audited with: a near-copy of earlier material scores ~0,
    the first instance of boilerplate scores high while its repeats
    score 0 — prioritizing docs for keep/drop beyond binary dup flags.

    Plan: explode distinct shingles (map-only), ONE shingle-keyed agg
    for first-owner (min doc id, map-side combined), broadcast-free
    join back on the shingle (both sides already shuffled on s — one
    exchange each), one doc-keyed count agg.  Nothing is pairwise; the
    shuffles carry shingle instances, linear in corpus size."""
    docs = load(spark, sf_dir, "documents")
    from fluvio_duck_spark.operators.dedup import _exploded_shingles

    sh = _exploded_shingles(docs, "text", "doc_id", 3, None)
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_shingles"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("int"))
            .cast("int")
            .alias("n_novel"),
            F.round(
                F.sum((F.col("doc_id") == F.col("first_doc")).cast("int"))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
    )


ORACLE_NOVELTY = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 1, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS s
  FROM w),
first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_shingles,
       CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS INT)
         AS n_novel,
       round(CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty
FROM sh JOIN first USING (s)
GROUP BY doc_id
"""


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum manifest: difficulty-quartile bins (exact corpus
    quality percentiles, broadcast thresholds — the q_quality_gate
    pattern, NOT a percent_rank window that would sort a stratum in one
    task) plus a deterministic within-bin shuffle key.  A curriculum
    loader reads bins in order and shuffles within each — this query
    emits exactly that plan: (doc, bin, key).  Two-phase: one
    3-row threshold aggregate, then a map-only bin/key projection.

    The percentile runs over the QUANTIZED score (floor(q·1e6) ppm, a
    BIGINT), not the raw double: Spark's percentile() and DuckDB's
    quantile_cont interpolate with different arithmetic (lo+f·(hi−lo)
    vs lo·(1−f)+hi·f), which can differ in the last ulp on raw doubles
    and flip a >= bin comparison for a row sitting exactly at the
    threshold (ADVICE r5).  Over integers ≤ 1e6 with dyadic fractions
    (p ∈ {.25,.5,.75} ⇒ f ∈ {0,.25,.5,.75}) every term in BOTH
    formulations is exact in double, so the thresholds are bit-identical
    across engines by construction — tie-free, not just tie-unobserved."""
    from fluvio_duck_spark.functions.text import quality_score

    # floor, not round(q, 6): round hits the HALF_UP-vs-multiply tie on
    # dyadic scores like 0.5203125 (SCALE.md cross-engine trap #1).
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.floor(quality_score("text") * 1000000).cast("long").alias("qppm"),
    )
    thr = docs.agg(
        F.expr("percentile(qppm, 0.25)").alias("t1"),
        F.expr("percentile(qppm, 0.5)").alias("t2"),
        F.expr("percentile(qppm, 0.75)").alias("t3"),
    )
    # higher quality = easier: bin 0 (easiest) = top quartile.
    binned = docs.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        F.col("qppm").alias("quality_ppm"),
        F.when(F.col("qppm") >= F.col("t3"), 0)
        .when(F.col("qppm") >= F.col("t2"), 1)
        .when(F.col("qppm") >= F.col("t1"), 2)
        .otherwise(3)
        .cast("int")
        .alias("difficulty_bin"),
    )
    return binned.withColumn(
        "order_key",
        ((F.col("doc_id") + 1) * F.lit(2654435761 + 7 * 98765431))
        % F.lit(1000003),
    )


ORACLE_CURRICULUM = f"""
WITH t AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text,' '), t -> t IN {_STOPLIST_SQL})) AS DOUBLE)
      / len(string_split(text,' ')) AS sw,
    CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
      / len(string_split(text,' ')) AS mtl
  FROM documents),
q AS (SELECT doc_id,
             CAST(floor((least(sw * 4.0, 1.0) * 0.5
               + (1.0 - least(abs(mtl - 5.0) / 5.0, 1.0)) * 0.5) * 1000000)
             AS BIGINT) AS qppm
      FROM t),
thr AS (SELECT quantile_cont(qppm, 0.25) AS t1, quantile_cont(qppm, 0.5) AS t2,
               quantile_cont(qppm, 0.75) AS t3 FROM q)
SELECT doc_id, qppm AS quality_ppm,
       CAST(CASE WHEN qppm >= t3 THEN 0 WHEN qppm >= t2 THEN 1
                 WHEN qppm >= t1 THEN 2 ELSE 3 END AS INT) AS difficulty_bin,
       ((doc_id + 1) * {2654435761 + 7 * 98765431}) % 1000003 AS order_key
FROM q, thr
"""


QUERIES.update({
    "text_novelty_fraction": QuerySpec(
        q_novelty_fraction, ORACLE_NOVELTY,
        doc="per-doc novelty: fraction of shingles first seen in this doc (arrival order) — content-contribution audit",
    ),
    "curate_curriculum_order": QuerySpec(
        q_curriculum_order, ORACLE_CURRICULUM,
        doc="curriculum manifest: exact-percentile difficulty quartiles (broadcast thresholds) + deterministic within-bin shuffle key",
    ),
})


def q_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-CLASSIFIER gate — the fasttext-style linear filter every
    pretraining pipeline runs (CCNet/Gopher lineage), with the trained
    weights as literals: logit = w·(stopword count, distinct words,
    total words) + b, keep if logit ≥ 0, report per-source volumes and
    keep rates.  All features are integer counts and all weights are
    integer parts-per-million, so the logit is EXACT integer arithmetic
    on both engines — the portable-twin discipline applied to a scoring
    model (a real fasttext swaps in via a pandas UDF; the gate/report
    plumbing is identical).  Map-only scoring, one source-sized agg."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    sw = F.size(
        F.filter(w, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is", "it"))
    )
    feats = docs.select(
        "source",
        (
            F.lit(-400000)
            + F.lit(45000) * sw
            + F.lit(10000) * F.size(F.array_distinct(w))
            - F.lit(1500) * F.size(w)
        ).cast("long").alias("logit_ppm"),
    )
    kept = (F.col("logit_ppm") >= 0).cast("int")
    return feats.groupBy("source").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum(kept).cast("int").alias("n_kept"),
        F.round(F.sum(kept).cast("double") / F.count("*"), 6).alias("keep_rate"),
        F.sum("logit_ppm").alias("logit_sum_ppm"),
    )


ORACLE_CLASSIFIER_GATE = """
WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents),
f AS (
  SELECT source,
         -400000
           + 45000 * len(list_filter(w,
               t -> t IN ('the','a','of','and','to','in','is','it')))
           + 10000 * len(list_distinct(w))
           - 1500 * len(w) AS logit_ppm
  FROM t)
SELECT source, CAST(COUNT(*) AS INT) AS n_docs,
       CAST(SUM(CASE WHEN logit_ppm >= 0 THEN 1 ELSE 0 END) AS INT) AS n_kept,
       round(CAST(SUM(CASE WHEN logit_ppm >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS keep_rate,
       CAST(SUM(logit_ppm) AS BIGINT) AS logit_sum_ppm
FROM f GROUP BY source
"""


QUERIES.update({
    "curate_classifier_gate": QuerySpec(
        q_classifier_gate, ORACLE_CLASSIFIER_GATE,
        doc="linear quality-classifier gate (literal ppm weights, integer-exact logit): per-source keep-rate report",
    ),
    "text_bpe_fertility": QuerySpec(
        q_bpe_fertility, _bpe_fertility_oracle(6),
        doc="tokenizer fertility by source: BPE tokens per word under the fitted merges — vocab-planning report",
    ),
    "dedup_containment_prefix": QuerySpec(
        q_containment_prefix, ORACLE_CONTAINMENT_PREFIX,
        doc="prefix-filtered EXACT shingle-containment pairs (doc-in-doc dup; asymmetric) — equals the unbounded ordered-pairs result",
    ),
    "text_dsir_weights": QuerySpec(
        q_dsir_weights, _oracle_dsir(),
        doc="DSIR importance weights: hashed-bigram log-ratio vs target slice (one corpus shuffle; 256-row broadcast tables)",
    ),
    "dedup_jaccard_prefix": QuerySpec(
        q_jaccard_prefix, ORACLE_JACCARD_PREFIX,
        doc="prefix-filtered EXACT Jaccard pairs (AllPairs/PPJoin bound) — equals the unbounded all-pairs result",
    ),
    "dedup_threshold_calibration": QuerySpec(
        q_dedup_threshold_calibration, ORACLE_THRESHOLD_CALIBRATION,
        doc="near-dup threshold calibration: one prefix-join pass at t=0.5 banded into the candidate cutoffs, integer-tie-free",
    ),
    "text_bpe_encode": QuerySpec(
        q_bpe_encode, _bpe_encode_oracle(6),
        doc="BPE tokenizer application: per-doc token counts under the 6 fitted merges; distinct-word encode, boundary-safe replaces",
    ),
})


def q_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (operators/similarity.py::
    binary_hamming_topk): sign bits packed into two 32-bit words,
    Hamming candidate scan (xor + popcount over 16 bytes/row), exact
    cosine rerank of the 50 candidates.  Deterministic two-stage
    pipeline, replicated exactly by the oracle."""
    from fluvio_duck_spark.operators.similarity import binary_hamming_topk

    out = binary_hamming_topk(
        load(spark, sf_dir, "embeddings"), query_id=0, k=10, n_candidates=50
    )
    return out.select("vec_id", F.col("hamming").cast("int").alias("hamming"), "sim")


def _pack_sql(lo: int, hi: int) -> str:
    return (
        f"CAST(list_aggregate(list_transform(range({lo}, {hi} + 1), "
        f"i -> CASE WHEN embedding[CAST(i AS INTEGER)] >= 0 "
        f"THEN CAST(power(2, i - {lo}) AS BIGINT) ELSE 0 END), 'sum') AS BIGINT)"
    )


ORACLE_BINARY_HAMMING = f"""
WITH p AS (
  SELECT vec_id, embedding,
         {_pack_sql(1, 32)} AS w1,
         {_pack_sql(33, 64)} AS w2
  FROM embeddings),
q AS (SELECT embedding AS qv, w1 AS qw1, w2 AS qw2 FROM p WHERE vec_id = 0),
cand AS (
  SELECT vec_id, embedding, qv,
         CAST(bit_count(xor(w1, qw1)) + bit_count(xor(w2, qw2)) AS INTEGER)
           AS hamming
  FROM p, q WHERE vec_id <> 0
  ORDER BY hamming, vec_id LIMIT 50),
r AS (
  SELECT vec_id, hamming,
    list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM cand)
SELECT vec_id, hamming, sim FROM r ORDER BY sim DESC, vec_id LIMIT 10
"""


QUERIES.update({
    "sim_binary_hamming": QuerySpec(
        q_binary_hamming, ORACLE_BINARY_HAMMING,
        doc="binary-quantization ANN: sign-bit packing, xor+popcount Hamming scan, exact-cosine rerank of 50 candidates",
    ),
})


def q_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable MinHash+LSH (operators/dedup.py::
    minhash_lsh_pairs_portable): the same banded-signature plan as
    dedup_minhash_lsh, but the whole hash chain (md5 ascii-fold base,
    modular permutations, band folds) is reproducible in ANY SQL
    engine — so the APPROXIMATE pipeline itself is hash-compared
    end-to-end, not just its verified output."""
    from fluvio_duck_spark.operators.dedup import minhash_lsh_pairs_portable

    return minhash_lsh_pairs_portable(load(spark, sf_dir, "documents"))


def _oracle_minhash_portable() -> str:
    from fluvio_duck_spark.operators.dedup import (
        minhash_lsh_portable_oracle_sql,
    )

    return minhash_lsh_portable_oracle_sql()


QUERIES.update({
    "dedup_minhash_portable": QuerySpec(
        q_minhash_portable, _oracle_minhash_portable(),
        doc="portable-hash MinHash+LSH: md5-fold base + modular permutations — the approximate pipeline itself oracle-checked",
    ),
})


def _oracle_ann_lsh(n_planes: int = 8, seed: int = 42, dim: int = 64) -> str:
    """Oracle for the hyperplane-LSH ANN: the seeded plane matrix is
    deterministic driver state (like a trained codebook), so its floats
    embed in the generated SQL as exact repr() literals — DuckDB parses
    each back to the identical double, and both engines' sequential
    left-to-right projection folds agree bit-for-bit (the
    functions/vectors.py contract).  The hamming-≤1 multiprobe is
    written as bit_count(xor(sig, qsig)) <= 1, equivalent to the
    Spark side's explicit (sig == qsig) OR (sig == qsig ^ 2^i) chain.
    Upgrade path of VERDICT coverage: a formerly rows-only approximate
    family, now hash-compared end-to-end."""
    from fluvio_duck_spark.operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)
    bits = " + ".join(
        "(CASE WHEN list_aggregate(list_transform(range(1, {d} + 1), "
        "i -> CAST(embedding[i] AS DOUBLE) * ([{plane}])[i]), 'sum') >= 0 "
        "THEN {bit} ELSE 0 END)".format(
            d=dim,
            plane=", ".join(repr(float(x)) for x in plane),
            bit=1 << i,
        )
        for i, plane in enumerate(planes)
    )
    return f"""
WITH s AS (SELECT vec_id, embedding, CAST({bits} AS BIGINT) AS sig
           FROM embeddings),
q AS (SELECT embedding AS qv, sig AS qsig FROM s WHERE vec_id = 0),
cand AS (
  SELECT vec_id, embedding, qv FROM s, q
  WHERE vec_id <> 0 AND bit_count(xor(sig, qsig)) <= 1),
r AS (
  SELECT vec_id,
    list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM cand)
SELECT vec_id, sim FROM r ORDER BY sim DESC, vec_id LIMIT 10
"""


# upgrade: sim_ann_lsh from rows-only to oracle-paired (plane matrix is
# seeded deterministic state, embedded in the generated SQL as literals)
QUERIES["sim_ann_lsh"] = QuerySpec(
    q_ann_lsh, _oracle_ann_lsh(),
    doc="hyperplane-LSH ANN top-10, hamming-≤1 multiprobe — oracle-paired (plane literals in generated SQL) + recall-tested",
)


def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable JVM-only SimHash near-dups (operators/dedup.py::
    simhash_near_dup_pairs_portable): per-token bit votes as 60
    conditional SUM aggregates (codegen hash-agg — no pandas UDF, no
    materialization barrier), banded-hamming candidates, popcount
    filter.  The whole approximate pipeline hash-compared end-to-end."""
    from fluvio_duck_spark.operators.dedup import (
        simhash_near_dup_pairs_portable,
    )

    return simhash_near_dup_pairs_portable(
        load(spark, sf_dir, "documents"), max_hamming=3
    )


def _oracle_simhash_portable() -> str:
    from fluvio_duck_spark.operators.dedup import simhash_portable_oracle_sql

    return simhash_portable_oracle_sql(max_hamming=3)


QUERIES.update({
    "dedup_simhash_portable": QuerySpec(
        q_simhash_portable, _oracle_simhash_portable(),
        doc="portable JVM-only SimHash: 60 vote-sum aggregates, banded hamming — no Python, oracle-checked end-to-end",
    ),
})


def _oracle_near_dups_bucketed(
    n_planes: int = 6, seed: int = 42, dim: int = 64
) -> str:
    """Oracle for the LSH-bucketed near-dup join — same literal-plane
    embedding trick as _oracle_ann_lsh: the seeded signature is
    deterministic, so the bucket equi-join and the exact-cosine filter
    replicate exactly."""
    from fluvio_duck_spark.operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)
    bits = " + ".join(
        "(CASE WHEN list_aggregate(list_transform(range(1, {d} + 1), "
        "i -> CAST(embedding[i] AS DOUBLE) * ([{plane}])[i]), 'sum') >= 0 "
        "THEN {bit} ELSE 0 END)".format(
            d=dim,
            plane=", ".join(repr(float(x)) for x in plane),
            bit=1 << i,
        )
        for i, plane in enumerate(planes)
    )
    cos = """
    list_aggregate(list_transform(range(1, len(va)+1),
        i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(va)+1),
        i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(vb)+1),
        i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)), 'sum')))"""
    return f"""
WITH s AS (SELECT vec_id, embedding, CAST({bits} AS BIGINT) AS sig
           FROM embeddings),
j AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS va, b.embedding AS vb
  FROM s a JOIN s b USING (sig) WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, {cos} AS sim
FROM j WHERE {cos} >= 0.45
"""


# upgrade: sim_near_dups_bucketed from rows-only to oracle-paired
QUERIES["sim_near_dups_bucketed"] = QuerySpec(
    q_near_dups_bucketed, _oracle_near_dups_bucketed(),
    doc="LSH-bucketed near-dup pairs (scale path) — oracle-paired via plane literals + recall-tested",
)


def q_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-quantizer IVF ANN whose ENTIRE training run is
    oracle-checked (operators/kmeans.py::kmeans_fit_portable): Lloyd's
    iterations with in-row sequential-fold distances to centroid
    literals, DECIMAL(38,12) per-dimension sums (partial-aggregation-
    order-independent — the fit is bit-stable under any partitioning),
    fixed 3 iterations, then the cell-pruned cosine probe.  The oracle
    unrolls the identical fit in SQL — the iterative-ML analogue of the
    text_bpe_fit contract."""
    from fluvio_duck_spark.operators.kmeans import (
        ivf_topk_portable,
        kmeans_fit_portable,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = kmeans_fit_portable(emb, k=8, iters=3)
    return ivf_topk_portable(emb, cents, query_id=0, k=10)


def _oracle_ivf_portable() -> str:
    from fluvio_duck_spark.operators.kmeans import kmeans_portable_oracle_sql

    return kmeans_portable_oracle_sql(k=8, iters=3, dim=64, query_id=0, topk=10)


def q_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-balance report — the skew health check an ANN deployment
    runs before committing a codebook: per cell the vector count, corpus
    fraction, and ratio to the perfectly-balanced size (a hot cell is a
    hot partition at probe time, the direct 100-TB failure mode of an
    unbalanced quantizer).  Same oracle-checked portable fit as
    sim_ivf_kmeans_portable (shared CTE chain in the generated SQL);
    the report itself is one k-row aggregate."""
    from fluvio_duck_spark.operators.kmeans import (
        _argmin_cell,
        kmeans_fit_portable,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = kmeans_fit_portable(emb, k=8, iters=3)
    asg = emb.select(
        _argmin_cell(
            "transform(embedding, x -> CAST(x AS DOUBLE))", cents
        ).alias("cell")
    )
    counts = asg.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    tot = counts.agg(F.sum("n_vecs").alias("n"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "cell",
        F.col("n_vecs").cast("int").alias("n_vecs"),
        F.round(F.col("n_vecs").cast("double") / F.col("n"), 6).alias("frac"),
        F.round(
            F.col("n_vecs").cast("double") * 8 / F.col("n"), 6
        ).alias("balance_ratio"),
    )


def _oracle_ivf_cell_balance() -> str:
    from fluvio_duck_spark.operators.kmeans import kmeans_cells_oracle_sql

    return kmeans_cells_oracle_sql(k=8, iters=3, dim=64)


QUERIES.update({
    "sim_ivf_kmeans_portable": QuerySpec(
        q_ivf_portable, _oracle_ivf_portable(),
        doc="IVF ANN over a k-means codebook whose FIT is oracle-checked: decimal-sum Lloyd's unrolled in SQL (3 iters, k=8)",
    ),
    "sim_ivf_cell_balance": QuerySpec(
        q_ivf_cell_balance, _oracle_ivf_cell_balance(),
        doc="IVF cell-balance skew report over the oracle-checked portable fit (hot cell = hot partition at probe time)",
    ),
})


def q_power_iteration_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by portable
    POWER ITERATION (operators/pca.py): 3 fixed matvec steps, each one
    scan + a 64-value DECIMAL-summed aggregate (one partial state per
    task — the k-means iteration cost shape with d-vector driver
    state).  The anisotropy/whitening direction and its eigenvalue —
    the collapse metric an embedding pipeline monitors.  The oracle
    unrolls the identical fit (sequential-fold dots, left-chained norm,
    the same divisions), so every component double is hash-checked —
    the spectral member of the portable-twin program."""
    from fluvio_duck_spark.operators.pca import power_iteration_portable

    emb = load(spark, sf_dir, "embeddings")
    vec, eig = power_iteration_portable(emb, iters=3)
    return spark.createDataFrame(
        [(i, c, eig) for i, c in enumerate(vec)],
        "dim int, component double, eigenvalue double",
    )


def _oracle_power_iteration() -> str:
    from fluvio_duck_spark.operators.pca import power_iteration_oracle_sql

    return power_iteration_oracle_sql(iters=3)


def q_whiten_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitening planning report — what removing the dominant component
    (sim_power_iteration_portable's fit) would leave, by label: mean
    explained-variance fraction (x·v)²/‖x‖² and its residual.  The
    number that decides whether the anisotropy direction is worth
    projecting out before retrieval.  Map-only scoring against the
    broadcast eigenvector (in-row fixed-point dots), one label-sized
    aggregate of fixed-point fractions — cross-engine exact end to end."""
    from fluvio_duck_spark.operators.pca import (
        _dot_literal_sql,
        _fix,
        power_iteration_portable,
    )

    emb = load(spark, sf_dir, "embeddings")
    vec, _eig = power_iteration_portable(emb, iters=3)
    # SQL-text forms: identical expression trees to the Column loops,
    # parsed as two expressions instead of ~500 py4j round trips
    # (operators/pca.py::_dot_literal_sql)
    v_sql = "transform(embedding, x -> CAST(x AS DOUBLE))"
    d = emb.select(
        "label",
        F.expr(_dot_literal_sql(v_sql, vec)).alias("p"),
        F.expr(_dot_literal_self_sql(v_sql)).alias("n2"),
    )
    frac = F.col("p") * F.col("p") / F.col("n2")
    scored = d.select("label", _fix(frac).alias("f"))
    return scored.groupBy("label").agg(
        F.count("*").cast("int").alias("n_vecs"),
        (F.sum("f").cast("double") / F.lit(1e12) / F.count("*")).alias(
            "var_explained_mean"
        ),
        (
            F.lit(1.0)
            - F.sum("f").cast("double") / F.lit(1e12) / F.count("*")
        ).alias("resid_mean"),
    )


def _dot_literal_self_sql(v_sql: str) -> str:
    """Fixed-point ‖x‖² (dot of the column with itself) as SQL text —
    the same tree the Column form (transform → _fix → aggregate) built."""
    from fluvio_duck_spark.operators.pca import _SCALE_SQL, _fix_sql

    return (
        f"(CAST(aggregate(transform({v_sql}, x -> {_fix_sql('x * x')}), "
        f"CAST(0 AS BIGINT), (acc, t) -> acc + t) AS DOUBLE) "
        f"/ {_SCALE_SQL})"
    )


def _oracle_whiten_residual() -> str:
    from fluvio_duck_spark.operators.pca import power_iteration_oracle_sql

    fit = power_iteration_oracle_sql(iters=3)
    # keep the CTE chain, swap the final projection for the per-label report
    chain = fit[: fit.rindex("SELECT 0 AS dim")].rstrip()
    return chain + """,
emb2 AS (
  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
sc AS (
  SELECT label,
         CAST(list_aggregate(list_transform(range(1, 65),
              i -> CAST(round(v[i] * vt[i] * 1e12) AS BIGINT)), 'sum')
           AS DOUBLE) / 1e12 AS p,
         CAST(list_aggregate(list_transform(range(1, 65),
              i -> CAST(round(v[i] * v[i] * 1e12) AS BIGINT)), 'sum')
           AS DOUBLE) / 1e12 AS n2
  FROM emb2, (SELECT list_value(""" + ", ".join(
        f"(SELECT c{i} FROM it3)" for i in range(64)
    ) + """) AS vt) q),
fr AS (SELECT label, CAST(round(p * p / n2 * 1e12) AS BIGINT) AS f FROM sc)
SELECT label, CAST(COUNT(*) AS INT) AS n_vecs,
       CAST(SUM(f) AS DOUBLE) / 1e12 / COUNT(*) AS var_explained_mean,
       1.0 - CAST(SUM(f) AS DOUBLE) / 1e12 / COUNT(*) AS resid_mean
FROM fr GROUP BY label
"""


QUERIES.update({
    "sim_power_iteration_portable": QuerySpec(
        q_power_iteration_portable, _oracle_power_iteration(),
        doc="portable power-iteration PCA: dominant eigenvector + eigenvalue, DECIMAL-summed matvecs, fit unrolled in the oracle",
    ),
    "sim_whiten_residual": QuerySpec(
        q_whiten_residual, _oracle_whiten_residual(),
        doc="whitening planning report: per-label explained-variance fraction of the fitted top component (fixed-point exact)",
    ),
})


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end targeted-selection report: DSIR-score the corpus
    (text_dsir_weights machinery), keep each source's top-10 documents
    by importance weight (deterministic tie-break), report per-source
    kept counts, token budget, and mean weight.  The composition a
    mixture-retuning pipeline runs nightly: score → per-domain quota →
    budget report.  Per-source top-k is a bounded window (quota rows per
    source), never a global sort."""
    from pyspark.sql import Window as W

    from fluvio_duck_spark.functions.text import token_count
    from fluvio_duck_spark.operators.dsir import dsir_logweights

    docs = load(spark, sf_dir, "documents")
    w = dsir_logweights(docs, F.col("lang") == "en")
    joined = w.join(
        docs.select("doc_id", "source", token_count("text").alias("n_tok")),
        "doc_id",
    )
    kept = (
        joined.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(
                    F.desc("dsir_logweight"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("rk") <= 10)
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("int").alias("n_kept"),
        F.sum("n_tok").alias("token_budget"),
        (
            F.sum(F.col("dsir_logweight").cast("decimal(28,12)")).cast("double")
            / F.count("*")
        ).alias("mean_weight"),
    )


def _oracle_dsir_select() -> str:
    # reuse the scored-docs CTE body of the DSIR oracle as a subquery
    scores = _oracle_dsir().strip()
    return f"""
WITH w AS ({scores}),
j AS (
  -- string_split on ' ' mirrors the Spark side's token_count
  -- (split(text, ' '), no trim) exactly, incl. empty tokens (ADVICE r4)
  SELECT w.doc_id, w.dsir_logweight, d.source,
         len(string_split(d.text, ' ')) AS n_tok
  FROM w JOIN documents d USING (doc_id)),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source
                                 ORDER BY dsir_logweight DESC, doc_id) AS rk
    FROM j) z
  WHERE rk <= 10)
SELECT source, CAST(COUNT(*) AS INTEGER) AS n_kept,
       CAST(SUM(n_tok) AS BIGINT) AS token_budget,
       CAST(SUM(CAST(dsir_logweight AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
         AS mean_weight
FROM kept GROUP BY source
"""


QUERIES.update({
    "curate_dsir_select": QuerySpec(
        q_dsir_select, _oracle_dsir_select(),
        doc="targeted-selection report: DSIR score -> per-source top-10 quota -> budget/weight report (composition)",
    ),
})


def q_pq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized retrieval whose TRAINING is oracle-checked
    (operators/pq.py::pq_train_portable): 4 subspace codebooks from the
    decimal-accumulated portable k-means, per-row code assignment as
    in-row argmins, asymmetric distance as an explicit left-to-right
    4-term lookup sum (no float-order ambiguity), bounded-heap
    shortlist of 50, exact-cosine rerank.  The oracle unrolls all four
    subspace fits plus the ADC pipeline in SQL."""
    from fluvio_duck_spark.operators.pq import (
        pq_topk_portable,
        pq_train_portable,
    )

    emb = load(spark, sf_dir, "embeddings")
    books = pq_train_portable(emb, m=4, k=4, iters=2)
    return pq_topk_portable(emb, books, query_id=0, k_out=10, shortlist=50)


def _oracle_pq_portable() -> str:
    from fluvio_duck_spark.operators.pq import pq_portable_oracle_sql

    return pq_portable_oracle_sql(m=4, k=4, iters=2, dim=64,
                                  query_id=0, k_out=10, shortlist=50)


QUERIES.update({
    "sim_pq_portable": QuerySpec(
        q_pq_portable, _oracle_pq_portable(),
        doc="portable PQ/ADC retrieval: 4 oracle-checked subspace codebooks, explicit-order ADC sum, shortlist-50 + exact rerank",
    ),
})


def q_dedup_semantic_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup with ORACLE-CHECKED clustering (operators/semdedup.py::
    semantic_dup_pairs_portable): in-engine L2 normalization, the
    decimal-accumulated portable k-means (k=8, 2 iters), in-row cell
    assignment, same-cell exact-cosine pairs.  Planted duplicates as in
    dedup_semantic: vec_id<50 re-added at +100000 scaled by 2.0 (exact
    in IEEE — cosine exactly the self-cosine), so the pair set is
    nonempty and must recover every plant."""
    from fluvio_duck_spark.operators.semdedup import (
        semantic_dup_pairs_portable,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    return semantic_dup_pairs_portable(
        emb.unionAll(planted), k=8, iters=2, threshold=0.9
    )


def _oracle_semdedup_portable() -> str:
    from fluvio_duck_spark.operators.semdedup import (
        semdedup_portable_oracle_sql,
    )

    src = (
        "SELECT vec_id, embedding FROM embeddings "
        "UNION ALL "
        "SELECT vec_id + 100000 AS vec_id, "
        "list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 2.0 AS FLOAT))"
        " AS embedding "
        "FROM embeddings WHERE vec_id < 50"
    )
    return semdedup_portable_oracle_sql(
        k=8, iters=2, dim=64, threshold=0.9, source_sql=src
    )


QUERIES.update({
    "dedup_semantic_portable": QuerySpec(
        q_dedup_semantic_portable, _oracle_semdedup_portable(),
        doc="SemDedup with oracle-checked clustering: portable k-means cells + same-cell exact-cosine pairs (planted dups)",
    ),
})


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption planning (operators/chunking.py::
    span_corruption_plan): portable-hash span starts, trailing-window
    merge, per-doc mask statistics — all in-row HOFs, zero shuffles."""
    from fluvio_duck_spark.operators.chunking import span_corruption_plan

    return span_corruption_plan(load(spark, sf_dir, "documents"))


def _oracle_span_corruption(start_pct: int = 5, span_len: int = 3) -> str:
    from fluvio_duck_spark.operators.dsir import hash_bucket_sql

    key = "doc_id || ':' || CAST(i AS VARCHAR)"
    hb = hash_bucket_sql(f"({key})", 100)
    offs = " , ".join(
        f"CASE WHEN i - {o} >= 1 THEN st[CAST(i - {o} AS INTEGER)] ELSE 0 END"
        for o in range(span_len)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
s AS (
  SELECT doc_id, len(tk) AS n_tokens,
         list_transform(range(1, len(tk) + 1),
                        i -> CASE WHEN {hb} < {start_pct} THEN 1 ELSE 0 END)
           AS st
  FROM t WHERE len(tk) >= 1),
mk AS (
  SELECT doc_id, n_tokens,
         list_transform(range(1, n_tokens + 1),
                        i -> greatest({offs})) AS m
  FROM s)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(list_aggregate(list_transform(range(1, n_tokens + 1),
            i -> CASE WHEN m[CAST(i AS INTEGER)] = 1
                       AND (i = 1 OR m[CAST(i - 1 AS INTEGER)] = 0)
                      THEN 1 ELSE 0 END), 'sum') AS INTEGER) AS n_spans,
       CAST(list_aggregate(m, 'sum') AS INTEGER) AS n_masked,
       CAST(list_aggregate(m, 'sum') AS DOUBLE) / n_tokens AS mask_ratio
FROM mk
"""


QUERIES.update({
    "text_span_corruption": QuerySpec(
        q_span_corruption, _oracle_span_corruption(),
        doc="T5 span-corruption plan: portable-hash span starts, merged spans, per-doc mask stats — map-only",
    ),
})


def q_token_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planner — the decision table a pretraining
    run is configured from: per-source token counts, temperature-
    weighted (α=0.5) target shares, allocation against a 200k-token
    budget with a 4-epochs-per-source repetition cap (the data-
    constrained-scaling guardrail), and resulting epochs.  The
    normalizer sums in DECIMAL so the shares are partitioning-
    independent; every output rounds to fixed dp so both engines agree
    at the hash level.  Complements sample_temperature_mixture (doc-
    count allocation) with the token/epoch form."""
    docs = load(spark, sf_dir, "documents").select(
        "source", token_count("text").alias("nt")
    )
    c = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
    )
    w = c.select(
        "source", "n_docs", "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double")).alias("wgt"),
    )
    z = w.agg(
        F.sum(F.col("wgt").cast("decimal(28,12)")).cast("double").alias("z")
    )
    alloc = F.least(
        F.lit(200000) * F.col("wgt") / F.col("z"),
        F.lit(4.0) * F.col("n_tokens"),
    )
    return w.crossJoin(F.broadcast(z)).select(
        "source", "n_docs", "n_tokens",
        F.round(F.col("wgt") / F.col("z"), 6).alias("share"),
        F.round(alloc, 2).alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("epochs"),
    )


ORACLE_TOKEN_EPOCHS = """
WITH c AS (
  -- string_split on ' ' mirrors Spark token_count (split(text, ' '),
  -- no trim) exactly, incl. empty tokens on repeated spaces (ADVICE r4)
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
w AS (SELECT source, n_docs, n_tokens,
             sqrt(CAST(n_tokens AS DOUBLE)) AS wgt FROM c),
z AS (SELECT CAST(SUM(CAST(wgt AS DECIMAL(28,12))) AS DOUBLE) AS z FROM w)
SELECT source, n_docs, n_tokens,
       round(wgt / z, 6) AS share,
       round(least(200000 * wgt / z, 4.0 * n_tokens), 2) AS alloc_tokens,
       round(least(200000 * wgt / z, 4.0 * n_tokens) / n_tokens, 6) AS epochs
FROM w, z
"""


QUERIES.update({
    "curate_token_epochs": QuerySpec(
        q_token_epochs, ORACLE_TOKEN_EPOCHS,
        doc="token-budget epoch planner: temperature shares, budget allocation, 4-epoch repetition cap (decimal-safe normalizer)",
    ),
})


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-shard manifest — the planning table a webdataset-style
    training-data export is driven by: documents are packed in id order
    (the distributed two-level prefix sum of operators/chunking.py::
    concat_pack — NOT a single-task global window), each doc is assigned
    to shard ``cum_before div 16384`` (16k tokens/shard, whole docs
    never split), and the manifest reports per-shard doc count, token
    fill, fill ratio vs the budget, and the id range — what the writer
    process consumes to emit one tar per shard."""
    from fluvio_duck_spark.operators.chunking import concat_pack

    docs = load(spark, sf_dir, "documents")
    packed = concat_pack(
        docs, n_tokens=token_count("text"), seq_len=16384
    )
    shard = F.floor(F.col("cum_before") / 16384).cast("long")
    return (
        packed.select(shard.alias("shard_id"), "doc_id", "n_tokens")
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.round(
                F.sum("n_tokens").cast("double") / F.lit(16384.0), 6
            ).alias("fill_ratio"),
        )
    )


ORACLE_SHARD_MANIFEST = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t)
SELECT CAST(floor(cum_before / 16384.0) AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS INTEGER) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       round(CAST(SUM(n_tokens) AS DOUBLE) / 16384.0, 6) AS fill_ratio
FROM c GROUP BY 1
"""


QUERIES.update({
    "pack_shard_manifest": QuerySpec(
        q_shard_manifest, ORACLE_SHARD_MANIFEST,
        doc="export-shard manifest: distributed prefix-sum packing, 16k-token shards, per-shard fill report",
    ),
})


def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware SURVIVORSHIP: near-dup clusters keep their BEST
    member, not their first — per connected component the vector with
    the largest L2 energy survives (deterministic stand-in for 'keep
    the highest-quality copy'; ties break to the lower id).  The real
    curation decision dedup_components stops short of.  Energy is an
    in-row integer fixed-point fold (order-free, cross-engine exact —
    the operators/pca.py discipline); the survivor pick is one
    component-keyed window over cluster-sized groups."""
    from pyspark.sql import Window as W

    from fluvio_duck_spark.operators.dedup import connected_components
    from fluvio_duck_spark.operators.similarity import blocked_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    pairs = blocked_near_dup_pairs(emb, threshold=0.45)
    cc = connected_components(pairs)  # (id, component)
    e2 = emb.select(
        F.col("vec_id").alias("id"),
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(
                    x.cast("double") * x.cast("double") * F.lit(1e12), 0
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("energy_fix"),
    )
    ranked = cc.join(e2, "id").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("component").orderBy(
                F.desc("energy_fix"), F.asc("id")
            )
        ),
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.count("*").cast("int").alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("id"))).alias("survivor_id"),
        )
    )


def _oracle_dedup_survivorship() -> str:
    base = ORACLE_DEDUP_COMPONENTS.strip()
    # reuse the recursive-CTE components, add the energy argmax
    body = base[base.index("WITH RECURSIVE") : base.rindex("SELECT node AS id")]
    return (
        body.rstrip()
        + """,
cc AS (SELECT node AS id, MIN(reach) AS component FROM walk GROUP BY node),
e2 AS (
  SELECT vec_id AS id,
         list_aggregate(list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12)
                       AS BIGINT)), 'sum') AS energy_fix
  FROM embeddings),
r AS (
  SELECT cc.component, cc.id, e2.energy_fix,
         row_number() OVER (PARTITION BY cc.component
                            ORDER BY e2.energy_fix DESC, cc.id) AS rn
  FROM cc JOIN e2 USING (id))
SELECT component, CAST(COUNT(*) AS INT) AS n_members,
       MIN(CASE WHEN rn = 1 THEN id END) AS survivor_id
FROM r GROUP BY component
"""
    )


QUERIES.update({
    "dedup_survivorship": QuerySpec(
        q_dedup_survivorship, _oracle_dedup_survivorship(),
        doc="quality-aware survivorship: per near-dup cluster keep the highest-energy member (fixed-point exact; ties to lower id)",
    ),
})


def q_sim_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — top-10 cosine neighbors restricted to a
    metadata predicate (label = 3): the problem shape every modern
    vector store names 'filtered ANN'.  The exact form is the baseline
    and the scale lesson: the predicate applies BEFORE ranking (filter
    pushes to the scan — pre-filtering), never after (post-filtering a
    plain top-k under-fills the result when the predicate is selective).
    The plan is the brute-force GEMM shape on the filtered corpus;
    the IVF/Hamming paths compose the same way (filter inside the
    probed cells)."""
    from fluvio_duck_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("label") == 3).unionByName(
        emb.filter(F.col("vec_id") == 0)  # keep the query row reachable
    ).dropDuplicates(["vec_id"])
    return cosine_topk(corpus, query_id=0, k=10)


ORACLE_SIM_TOPK_FILTERED = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
    list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum')
    / (sqrt(list_aggregate(list_transform(range(1, len(embedding)+1),
        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(range(1, len(qv)+1),
        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))) AS sim
  FROM embeddings, q WHERE label = 3 AND vec_id <> 0)
SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id LIMIT 10
"""


QUERIES.update({
    "sim_topk_filtered": QuerySpec(
        q_sim_topk_filtered, ORACLE_SIM_TOPK_FILTERED,
        doc="filtered vector search: metadata predicate applied BEFORE ranking (pre-filter pushed to the scan), exact baseline",
    ),
})


def q_sim_topk_filtered_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN at SCALE — sim_topk_filtered's composition claim
    made real: the codebook fits on the FULL corpus (partitioning by
    cell is a corpus-level layout decision), the probe ranks only the
    query's cell AND the metadata predicate (label = 3) — the filter
    applies inside the probed cell, never post-ranking.  Same
    oracle-checked portable fit; the probe predicate is the only
    delta."""
    from fluvio_duck_spark.operators.kmeans import (
        ivf_topk_portable,
        kmeans_fit_portable,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = kmeans_fit_portable(emb, k=8, iters=3)
    filtered = emb.filter(
        (F.col("label") == 3) | (F.col("vec_id") == 0)
    )
    return ivf_topk_portable(filtered, cents, query_id=0, k=10)


def _oracle_topk_filtered_ivf() -> str:
    from fluvio_duck_spark.operators.kmeans import kmeans_portable_oracle_sql

    return kmeans_portable_oracle_sql(
        k=8, iters=3, dim=64, query_id=0, topk=10,
        probe_where=" AND e.label = 3",
    )


QUERIES.update({
    "sim_topk_filtered_ivf": QuerySpec(
        q_sim_topk_filtered_ivf, _oracle_topk_filtered_ivf(),
        doc="filtered ANN at scale: metadata predicate inside the probed IVF cell over the oracle-checked portable codebook",
    ),
})


# ---------------------------------------------------------------------------
# sample_reservoir_global — k-bounded global uniform draw (no shuffle)
# ---------------------------------------------------------------------------

def q_sample_reservoir_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global uniform 200-doc draw — the distributed reservoir sample
    (operators/sampling.py::global_sample): rank the corpus by a
    deterministic hash key and keep the k smallest.  Compiles to
    TakeOrderedAndProject — per-partition k-row heaps merged at the
    driver, NO shuffle of the corpus and state bounded by k everywhere
    (the mergeability that makes reservoir sampling scale, planned by
    Catalyst instead of hand-rolled).  Contrast sample_stratified_quota,
    whose per-stratum quota pays one shuffle on the strata key."""
    from fluvio_duck_spark.operators.sampling import global_sample, uniform_key

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return global_sample(docs, 200, uniform_key("doc_id", seed=11),
                         tiebreak=["doc_id"])


ORACLE_SAMPLE_RESERVOIR = """
SELECT doc_id, lang, source, n_chars FROM documents
ORDER BY ((doc_id + 1) * (2654435761 + 11 * 98765431)) % 1000003, doc_id
LIMIT 200
"""


QUERIES.update({
    "sample_reservoir_global": QuerySpec(
        q_sample_reservoir_global, ORACLE_SAMPLE_RESERVOIR,
        doc="global uniform k-draw via hash top-k (TakeOrderedAndProject: "
            "per-partition k-heaps, no corpus shuffle — the mergeable "
            "reservoir, Catalyst-planned)",
    ),
})
