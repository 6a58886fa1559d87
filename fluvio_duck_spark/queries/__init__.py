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
    return ordered
