"""Text-analysis expressions for large-scale training-data pipelines.

All pure Catalyst column expressions (no Python in the hot path): token
counting, quality scoring, language-ID heuristics, document fingerprinting,
and w-shingling for near-dup detection.  Each is a building block used by
operators/dedup.py and the oracle-paired queries in queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic stopword list (language-ID + quality heuristics).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization — the only splitter the fixtures need; a
    BPE-ish fallback regex splitter is in token_count_bpe below."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("int")


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish proxy: count alnum runs and standalone punctuation marks the
    way a byte-pair tokenizer's pre-tokenizer splits."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(
            F.split(c, r"(?=[^\w])|(?<=[^\w])"), lambda t: (F.trim(t) != "")
        )
    ).cast("int")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("int")


def stopword_ratio(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return (hits.cast("double") / F.size(toks)).alias("stopword_ratio")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double") / F.length(c)


def mean_token_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    return (F.length(c) - F.size(toks) + 1).cast("double") / F.size(toks)


def quality_score(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    """Composite [0,1]-ish quality heuristic: stopword presence (fluency
    proxy) + reasonable mean token length.  Deterministic arithmetic only —
    reproducible across engines and cluster runs."""
    sw = stopword_ratio(col, stopwords)
    mtl = mean_token_len(col)
    len_term = 1.0 - F.least(F.abs(mtl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    return (F.least(sw * 4.0, F.lit(1.0)) * 0.5 + len_term * 0.5).alias("quality_score")


def lang_id(col: Column | str, en_threshold: float = 0.04) -> Column:
    """N-gram-free heuristic language ID: English stopword density.  The
    fixtures' text is synthetic, so this is the *shape* of a fastText-style
    classifier: per-language marker-token densities + argmax."""
    return F.when(stopword_ratio(col) >= en_threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def fingerprint(col: Column | str) -> Column:
    """Full-content fingerprint: md5 of the normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


def canonical_text(col: Column | str) -> Column:
    """Aggressive canonical form for near-trivial-variant dedup (the
    normalization pass CCNet/C4 run before exact hashing): lowercase,
    strip everything but word characters and spaces, collapse whitespace
    runs, trim.  Catches case / punctuation / spacing variants that a
    raw-content hash misses; pure JVM regex, map-only."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def prefix_fingerprint(col: Column | str, k: int = 3) -> Column:
    """Fingerprint of the first k tokens — a cheap rolling-hash-style key
    for blocking/canonicalization."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(col), 1, k)))


def winnow_fingerprints(col: Column | str, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every positional k-gram, slide a w-window over the
    hash sequence, keep each window's minimum, dedup.  Guarantees any
    shared run of >= k+w-1 tokens between two documents shares at least
    one fingerprint — the rolling-hash dedup primitive.

    Hashes are md5 hex strings compared lexicographically so the exact
    same selection is computable by any engine (the DuckDB oracle uses
    md5 + list min).  Pure per-row expression: no explode, no shuffle —
    map-only at any scale."""
    # Lambda-bind each intermediate array (transform over a 1-element
    # wrapper) before reusing it: higher-order functions evaluate
    # interpreted, with NO common-subexpression elimination, so a direct
    # reference to `tokens(col)` inside the gram transform re-splits the
    # text per element access, and a direct `grams` reference inside the
    # window transform re-hashes every gram per window position —
    # O(windows × grams) md5 calls per row (measured 343 s vs 4 s at
    # sf0.1).  Lambda variables are materialized once.
    grams = F.flatten(
        F.transform(
            F.array(tokens(col)),
            lambda t: F.when(
                F.size(t) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - k),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ", *[F.element_at(t, i + j + 1) for j in range(k)]
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    wins = F.flatten(
        F.transform(
            F.array(grams),
            lambda g: F.when(
                F.size(g) >= w,
                F.transform(
                    F.sequence(F.lit(0), F.size(g) - w),
                    lambda i: F.array_min(F.slice(g, i + 1, w)),
                ),
            )
            .when(F.size(g) > 0, F.array(F.array_min(g)))
            .otherwise(F.array().cast("array<string>")),
        )
    )
    return F.array_distinct(wins)


def shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct w-shingles (k-word n-grams) — the unit of Jaccard
    similarity for near-dup detection.  Pure expression: split + transform
    over an index sequence; guarded for texts shorter than k tokens."""
    # token array lambda-bound so element_at doesn't re-split the text
    # per access in the interpreted HOF path (see winnow_fingerprints)
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.array(tokens(col)),
                lambda t: F.when(
                    F.size(t) >= k,
                    F.transform(
                        F.sequence(F.lit(0), F.size(t) - k),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at(t, i + j + 1) for j in range(k)]
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        )
    )


#: Tiny deterministic char-trigram profiles (top trigrams of each
#: language's common function words) — the fastText-style n-gram profile
#: shape at toy size; swap for real trained profiles in production.
LANG_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "he ", " th", "ing", "nd ", " an", "and", " of", "of ",
           " to", "to ", " in", "ed ", "ion", " is", "is "),
    "es": ("de ", " de", "la ", " la", "el ", " el", "os ", "ión", " qu",
           "que", "ue ", " en", "en ", "ar ", " co", "con"),
}


def char_trigrams(col: Column | str) -> Column:
    """Distinct lowercase character trigrams — lambda-bound so the string
    is materialized once (see winnow_fingerprints on interpreted HOFs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.array(F.lower(c)),
                lambda s: F.when(
                    F.length(s) >= 3,
                    F.transform(
                        F.sequence(F.lit(0), F.length(s) - 3),
                        lambda i: F.substr(s, i + 1, F.lit(3)),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        )
    )


def lang_scores_ngram(col: Column | str, profiles=None) -> dict[str, Column]:
    """Per-language trigram-profile overlap scores in [0,1]:
    |trigrams(text) ∩ profile| / |profile|.  One trigram pass per row;
    each profile intersect is an in-row array op (codegen)."""
    profiles = profiles or LANG_TRIGRAM_PROFILES
    tg = char_trigrams(col)
    return {
        lang: (
            F.size(F.array_intersect(tg, F.array(*[F.lit(t) for t in prof])))
            .cast("double")
            / F.lit(float(len(prof)))
        )
        for lang, prof in profiles.items()
    }


def lang_id_ngram(col: Column | str, threshold: float = 0.25, profiles=None) -> Column:
    """Argmax over the n-gram profile scores; 'unknown' below threshold.
    The n-gram counterpart of the stopword-density lang_id above."""
    scores = lang_scores_ngram(col, profiles)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs]) if len(langs) > 1 else scores[langs[0]]
    out = F.lit("unknown")
    for lang in reversed(langs):
        out = F.when(
            (scores[lang] >= threshold) & (scores[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


# --- PII detection / redaction -------------------------------------------
#
# Training-data curation step: scrub contact information before a corpus
# ships.  The reference has no PII surface (its transforms are generic
# SmartModule specs, SURVEY §2.11 ST5); this is a brief-mandated pipeline
# extension.  Patterns are deliberately restricted to the regex subset
# that Java (Spark) and RE2 (DuckDB oracle) evaluate identically: no
# backreferences, no lookaround, ASCII classes only — so the operator is
# oracle-checkable end to end.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d\- ]{6,}\d"

#: Redaction order matters: emails first (they contain digits but can
#: never be half-eaten by the other patterns), then IPv4 (digit runs with
#: dots), then phone (requires a leading '+' so it cannot match an IP
#: remnant).
PII_PATTERNS = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (int columns ``n_emails``,
    ``n_ips``, ``n_phones``) — pure Catalyst expressions, one regex scan
    per category per row, all inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "n_emails": F.regexp_count(c, F.lit(PII_EMAIL)).cast("int"),
        "n_ips": F.regexp_count(c, F.lit(PII_IPV4)).cast("int"),
        "n_phones": F.regexp_count(c, F.lit(PII_PHONE)).cast("int"),
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its placeholder tag.  Chained
    ``regexp_replace`` — narrow (3 scans/row), shuffle-free, and scales
    as a map-only stage at any corpus size."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, tag)
    return c


def compression_ratio_udf():
    """Arrow-batched zlib compression ratio (compressed/raw bytes) — the
    RefinedWeb/C4-style boilerplate signal: templated or repetitive text
    compresses far below natural prose (≈0.3 vs ≈0.6+), so a low ratio
    flags machine-generated filler that token-level heuristics miss.

    A pandas UDF (not Catalyst) because zlib IS the feature — one
    vectorized Python pass, map-only, no shuffle; at 100 TB this rides
    the same scan as the other quality signals.  Rows-only in the oracle
    gate (no SQL zlib) — semantics pinned by tests instead."""
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ratio_fn(texts):
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8", errors="ignore")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return texts.map(one)

    return pandas_udf(_ratio_fn, DoubleType())
