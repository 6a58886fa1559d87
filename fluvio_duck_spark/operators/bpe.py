"""BPE tokenizer fitting in-engine (Sennrich et al., ACL 2016).

The tokenizer-training half of an LLM data pipeline, expressed so the
corpus is scanned ONCE: byte-pair-encoding merges are learned from the
word-frequency table, not the raw text — the standard construction — so
after one corpus shuffle every merge round runs over a |vocab|-sized
relation.

Per round r:
  1. adjacent symbol pairs explode from each word's symbol sequence,
     weighted by word count → ONE vocab-sized aggregation;
  2. the argmax pair (count desc, then lexicographic — fully
     deterministic ties) survives as a 1-row DataFrame;
  3. the merge applies to every word via a greedy left-to-right
     ``F.aggregate`` fold over the symbol array (JVM higher-order
     function, no UDF): the pair's occurrences collapse exactly the way
     a BPE tokenizer applies a learned merge ('aaaa' + merge(a,a) →
     [aa, aa], not [aa, a, a]).

Scale: corpus → vocab is the only corpus-sized shuffle; each of the K
rounds then costs one pair-count aggregation.  The 1-row argmax is
collected to the driver (model-sized tokenizer state, the
kmeans-codebook precedent — ``bpe_encode_tokens`` already holds the
merge list as driver state) and re-enters round r+1's plan as string
LITERALS, so no per-round broadcast exchange, no per-round eager
checkpoint round trip, and the output table is assembled once from the
collected rows instead of a K-way union of 1-row checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercase alpha tokens — the one corpus pass."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _apply_merge(syms_col, a_col, b_col):
    """Greedy left-to-right application of merge (a, b) to a symbol
    array: fold, replacing a trailing `a` by `ab` whenever `b` arrives —
    a freshly merged `ab` cannot chain into the same-round next merge,
    matching tokenizer semantics."""
    first = F.slice(syms_col, 1, 1)
    rest = F.slice(syms_col, 2, F.greatest(F.size(syms_col) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        first,
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == a_col) & (x == b_col),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a_col, b_col)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_fit(
    docs: DataFrame, n_merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns (round, sym_a,
    sym_b, pair_count) — the merge table a tokenizer ships."""
    return docs.sparkSession.createDataFrame(
        bpe_fit_merges(docs, n_merges, text_col),
        "round INT, sym_a STRING, sym_b STRING, pair_count BIGINT",
    )


def bpe_fit_merges(
    docs: DataFrame, n_merges: int = 6, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """The fit loop itself: (round, sym_a, sym_b, pair_count) tuples as
    driver state, for callers (``bpe_encode_tokens``) that consume the
    merge list directly instead of re-collecting a 6-row DataFrame."""
    vocab = word_vocab(docs, text_col).select(
        "cnt",
        F.split(F.col("word"), "").alias("syms"),
    ).localCheckpoint(eager=False)
    # ^ lazy checkpoint of the |vocab|-sized word table: it materializes
    # inside round 1's argmax job and every later round reads it back —
    # without it rounds 1-3 each re-ran the corpus scan + word groupBy
    # (the "scanned ONCE" contract this module's header promises; the
    # mid-loop cadence below only starts paying off at round 3)
    merges = []
    for r in range(1, n_merges + 1):
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("sym_a"), F.col("p.b").alias("sym_b"))
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("sym_a"), F.asc("sym_b"))
            .limit(1)
            .collect()
        )
        if not top:
            # degenerate corpus: no adjacent symbol pairs left (n_merges
            # exceeds what the corpus supports) — stop with the merges
            # found so far, matching the pre-r13 limit(1)+union form
            # which degraded to fewer output rows (ADVICE r13)
            break
        best = top[0]
        # ^ deterministic 1-row argmax (count desc, then lexicographic)
        # collected as driver state: one job, same as the eager
        # checkpoint it replaces, but the next round's plan gets string
        # literals instead of a broadcast crossJoin of the 1-row frame.
        merges.append((r, best.sym_a, best.sym_b, best.pair_count))
        vocab = vocab.select(
            "cnt",
            _apply_merge(
                F.col("syms"), F.lit(best.sym_a), F.lit(best.sym_b)
            ).alias("syms"),
        )
        if r % 2 == 0 and r < n_merges:
            vocab = vocab.localCheckpoint(eager=False)

    return merges


def _spaced(word_col):
    """Word → the boundary-safe symbol-sequence string: every symbol
    flanked by double spaces ('abc' → '  a  b  c  ').  Patterns below
    consume ONE space on each side of a merge pair, so two adjacent
    matches can both fire in a single left-to-right replace pass
    (' a  b  a  b ' → ' ab  ab '), and a pattern can never start
    mid-symbol (symbols contain no spaces)."""
    return F.concat(F.lit("  "), F.regexp_replace(word_col, "(.)", "$1  "))


def bpe_encode_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token counts per document under a learned BPE merge list.

    The tokenizer-APPLICATION half (pairs with ``bpe_fit``): ``merges``
    is the ordered (sym_a, sym_b) list — driver-held tokenizer state,
    vocab-bounded like the k-means codebook (operators/kmeans.py
    precedent), broadcast into the plan as literals.

    Applying merge (a, b) exhaustively left-to-right over a symbol
    sequence IS a single string ``replace(' a  b ', ' ab ')`` on the
    double-spaced representation (see ``_spaced``) — both engines'
    replace() scan left-to-right non-overlapping, which matches BPE's
    greedy convention exactly ('aaa' + merge(a,a) → [aa, a]).

    Scale shape: the K replaces run over the DISTINCT-WORD table (Heaps'
    law: vocab ≪ corpus), never per occurrence; per-doc counts then come
    from one word-level equi-join + one doc-id aggregation.  Zero Python,
    two shuffles total.
    """
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("word"),
    ).filter(F.col("word") != "")

    enc = _spaced(F.col("word"))
    for a, b in merges:
        enc = F.replace(
            enc, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
        )
    vocab_tok = (
        words.select("word").distinct()
        .select(
            "word",
            F.size(F.split(F.trim(enc), " +")).cast("long").alias("n_tok"),
        )
    )
    return (
        words.join(vocab_tok, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
        )
    )
