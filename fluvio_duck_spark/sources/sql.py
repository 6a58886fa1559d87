"""``consume_sql`` — the reference's literal SQL surface over Spark SQL.

The documented way to use the reference is SQL text with table functions
inline (reference README.md:97-184)::

    SELECT avg(speed) FROM fluvio_consume('helsinki -B ...') GROUP BY route
    SELECT sum(LEO) FROM fluvio_partitions()

``spark.sql`` cannot call our DataFrame builders by name, and running the
scan inside a single UDTF worker would serialize it (sources/udtf.py keeps
UDTFs for the metadata-sized scans only).  ``consume_sql`` closes the gap
with a textual rewrite + parameterized binding:

1. each ``fluvio_consume('<opts>')`` / ``fluvio_topics()`` /
   ``fluvio_partitions()`` occurrence is replaced by a named ``{param}``
   table reference, and
2. the corresponding builder DataFrame is passed to
   ``spark.sql(rewritten, **params)`` — Spark substitutes the *logical
   plan*, so the scan stays fully distributed and Catalyst fuses it with
   the surrounding query (filters/projections still reach the parquet
   scan).

This is exactly how DuckDB treats the extension's table functions: the
function call binds to a relation, then the engine optimizes the whole
statement.  The option string must be a plain single-quoted literal
(no embedded ``'``) — the same restriction DuckDB's own call syntax has.

Known textual-rewrite caveats (inherent to string-level rewriting):

* a ``fluvio_consume('...')``/``fluvio_topics()`` occurrence inside a
  string literal or comment is still rewritten — don't put the function
  names in literals;
* literal ``{``/``}`` elsewhere in the statement are escaped (``{{``/
  ``}}``) before the parameterized ``spark.sql`` call, so brace
  characters in the surrounding SQL are safe.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from fluvio_duck_spark.sources.consume import DEFAULT_SF_DIR, fluvio_consume
from fluvio_duck_spark.sources.metadata import fluvio_partitions, fluvio_topics

#: fluvio_consume('<opts>')  — opts is a single-quoted literal.
_CONSUME_RE = re.compile(r"fluvio_consume\s*\(\s*'([^']*)'\s*\)", re.IGNORECASE)
#: fluvio_topics() / fluvio_partitions() — no-arg metadata scans.
_META_RE = re.compile(r"fluvio_(topics|partitions)\s*\(\s*\)", re.IGNORECASE)


def consume_sql(
    spark: SparkSession,
    sql: str,
    sf_dir: str = DEFAULT_SF_DIR,
    log_dir: str | None = None,
) -> DataFrame:
    """Run one SQL statement that may reference ``fluvio_consume('<opts>')``,
    ``fluvio_topics()``, and ``fluvio_partitions()`` as inline table
    functions, exactly like the reference's DuckDB surface.

    ``log_dir`` retargets every bound table function at a per-partition
    log (sources/pplog.py layout): ``fluvio_consume`` binds through the
    DataSource's log_dir mode (one InputPartition per partition
    directory, offsets anchored per partition — reference
    src/partition.rs:107-134) and the metadata functions list that log's
    partitions with footer-statistics LEO.  The statement text is
    unchanged — the same SQL a user runs against the stand-in runs
    against a real log snapshot."""
    params: dict[str, DataFrame] = {}

    def _bind_consume(m: re.Match) -> str:
        name = f"__fc{len(params)}"
        if log_dir is not None:
            from fluvio_duck_spark.options import parse_consume_opts
            from fluvio_duck_spark.sources.datasource import (
                register_fluvio_source,
            )

            register_fluvio_source(spark)
            opts_str = m.group(1)
            parsed = parse_consume_opts(opts_str)
            # strip the leading topic token: the log dir IS the topic
            args = (opts_str.split(None, 1)[1]
                    if " " in opts_str.strip() else "")
            if (parsed.columns or parsed.transform
                    or parsed.transforms_file or parsed.has_smartmodule):
                # transform chains / typed -c mappings live ABOVE the
                # transport seam: bind the raw per-partition log through
                # the DataSource, then let the builder apply the full
                # pipeline (offset algebra anchored per partition) —
                # otherwise a statement like
                # fluvio_consume('events -A -B -c kk:i=k') would
                # silently return the raw 4-column schema in log_dir
                # sessions while being mapped in stand-in sessions.
                # the raw whole log: -B alone carries the reference
                # CLI's default --rows 1000 budget (per partition in
                # log_dir mode), which would truncate the source
                # underneath the statement's own offset algebra
                raw = (
                    spark.read.format("fluvio")
                    .option("log_dir", log_dir)
                    .option("args", "-A -B --rows 1000000000")
                    .load()
                )
                params[name] = fluvio_consume(
                    spark, parsed, sf_dir=sf_dir, source=raw,
                    per_partition_offsets=True,
                )
            else:
                # plain scan: pure DataSource bind — offset algebra
                # resolves at plan time against footer LEO (the scale
                # path; connector record schema, as the pp oracles pin)
                params[name] = (
                    spark.read.format("fluvio")
                    .option("log_dir", log_dir)
                    .option("args", args)
                    .load()
                )
        else:
            params[name] = fluvio_consume(spark, m.group(1), sf_dir=sf_dir)
        return "{" + name + "}"

    def _bind_meta(m: re.Match) -> str:
        name = f"__fm{len(params)}"
        builder = fluvio_topics if m.group(1).lower() == "topics" else fluvio_partitions
        params[name] = builder(spark, sf_dir, log_dir=log_dir)
        return "{" + name + "}"

    # Escape literal braces FIRST: once any param binds, the whole
    # statement goes through the {}-style formatter, which would otherwise
    # choke on (or mis-substitute) pre-existing { } in the SQL text.  The
    # table-function regexes contain no braces, so matching is unaffected.
    escaped = sql.replace("{", "{{").replace("}", "}}")
    rewritten = _CONSUME_RE.sub(_bind_consume, escaped)
    rewritten = _META_RE.sub(_bind_meta, rewritten)
    if not params:
        return spark.sql(sql)
    return spark.sql(rewritten, **params)
