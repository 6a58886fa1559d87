"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a named (spark_fn, oracle_sql) pair.  The driver runs the Spark side and
the DuckDB oracle side-by-side and hash-compares results (BASELINE.md t2).

Submodules register into their own ``QUERIES`` dict; ``all_queries()``
merges them.
"""

from __future__ import annotations

import glob
import json
import os
import re
from dataclasses import dataclass
from functools import lru_cache
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

#: Names whose latest receipt is stale-red or predates an oracle pairing
#: (none currently).  Kept as a hook: anything placed here jumps to the
#: front of the rotation.
_REVERIFY: frozenset[str] = frozenset()

#: The 8 documented rows-only (no-oracle) queries and their oracle-paired
#: twins (COVERAGE.md §rows-only).  When the rotation emits a rows-only
#: name into the driver's ~50-name sample window, its twin is pulled in
#: immediately after it (VERDICT r11 #5), so every CORRECTNESS file that
#: records a `no_oracle` row also contains the green hash-checked twin
#: that vouches for the shared math.
ROWS_ONLY_TWINS: dict[str, str] = {
    "dedup_minhash_lsh": "dedup_minhash_portable",
    "dedup_simhash": "dedup_simhash_portable",
    "dedup_semantic": "dedup_semantic_portable",
    "sim_pq_rerank": "sim_pq_portable",
    "sim_ivf_trained": "sim_ivf_kmeans_portable",
    "stream_neardup_gate": "stream_neardup_gate_portable",
    "mm_extract_features": "mm_extract_features_portable",
    "text_compression_ratio": "text_compressibility_companion",
}


@lru_cache(maxsize=1)
def latest_receipts() -> dict[str, int]:
    """Map each query name to the most recent driver round that GREEN-
    receipted it, read from the committed ``CORRECTNESS_r*.json``
    artifacts at the repo root (VERDICT r10 #8: rotation is derived from
    the recorded receipts, never hand-maintained again).

    A receipt counts as green when every recorded check passed — the
    documented rows-only names (``err == "no_oracle"``, spark_rows
    recorded) count, since rows-only IS their driver check.  A failed or
    errored row is NOT a refresh: the name keeps its previous round and
    therefore stays near the front of the rotation until re-receipted.

    Outside the repo (no artifacts found) this returns ``{}`` and
    ``all_queries()`` degrades to plain module order.

    Caching (ADVICE r11): the result is ``lru_cache``d for the process
    lifetime because the receipt files only change between rounds.  A
    process that WRITES a new ``CORRECTNESS_r*.json`` and then needs the
    refreshed ordering must call ``latest_receipts.cache_clear()`` first.
    The glob reads whatever receipt files are on disk — the committed
    set, in any clean checkout; an uncommitted receipt left in the
    working tree is picked up too, which is why round hygiene commits
    the driver artifacts as the round's first act.
    """
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, res in rows.items():
            if not isinstance(res, dict):
                continue
            err = res.get("err")
            green = (
                (err is None or err == "no_oracle")
                and res.get("rows_match") is not False
                and res.get("schema_match") is not False
                and res.get("hash_match") is not False
            )
            if green and rnd > latest.get(name, 0):
                latest[name] = rnd
    return latest


def all_queries() -> dict[str, QuerySpec]:
    from fluvio_duck_spark.queries import (
        consume_queries,
        llm,
        loopback_queries,
        multimodal_queries,
        pipeline,
        quality,
        relational,
        streaming_queries,
    )

    merged: dict[str, QuerySpec] = {}
    for module in (consume_queries, relational, llm, streaming_queries,
                   multimodal_queries, pipeline, quality, loopback_queries):
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(module.QUERIES)
    # Ordering for a time-bounded driver sample (~50 names): reverify
    # flags first, then never-green-receipted names (new registrations
    # lead automatically — no bookkeeping set to forget), then receipted
    # names ascending by latest green round (stalest first).  Stable
    # module order within each cohort.
    receipts = latest_receipts()
    ordered = {k: v for k, v in merged.items() if k in _REVERIFY}
    ordered.update(
        (k, v) for k, v in merged.items()
        if k not in receipts and k not in _REVERIFY
    )
    for k, v in sorted(
        ((k, v) for k, v in merged.items() if k in receipts),
        key=lambda kv: receipts[kv[0]],
    ):
        ordered.setdefault(k, v)
    # Twin pull-in (VERDICT r11 #5): re-emit the ordering with each
    # rows-only name immediately followed by its oracle-paired twin, so
    # any prefix sample that contains the no-oracle row also contains
    # the hash-checked twin.  A twin already emitted earlier stays put.
    final: dict[str, QuerySpec] = {}
    for k, v in ordered.items():
        if k in final:
            continue
        final[k] = v
        twin = ROWS_ONLY_TWINS.get(k)
        if twin is not None and twin not in final and twin in ordered:
            final[twin] = ordered[twin]
    return final
