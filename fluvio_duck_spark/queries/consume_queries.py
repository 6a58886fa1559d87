"""Consume-surface queries (SURVEY §2.1, §2.3-2.5, §2.11) with DuckDB
oracles over the same parquet fixtures.

Every query exercises the ``fluvio_consume`` builder the way the reference's
README sessions exercise the table function, and every oracle states the
same semantics in ANSI SQL (``events`` view = the topic stand-in, offset =
``event_id``, payload = ``props``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluvio_duck_spark.queries import QuerySpec
from fluvio_duck_spark.sources.consume import fluvio_consume
from fluvio_duck_spark.sources.metadata import fluvio_partitions, fluvio_topics

_DEFAULT_COLS = 'event_id AS "offset", ts AS "timestamp", props AS "value"'

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
#: The reference's full transit spec, reproduced at examples/jolt.yaml.
JOLT_FULL_YAML = os.path.join(_REPO_ROOT, "examples", "jolt.yaml")

#: The 20 `-c` mappings of the reference's largest documented workload
#: (reference examples/README.md:40-44).  Only the six keys the jolt spec
#: shifts exist post-transform; the other 14 resolve to typed NULLs —
#: exactly what the reference produces for the same spec + command.
TRANSIT_COLUMN_FLAGS = [
    "-c", "lat:d=lat", "-c", "long:d=long", "-c", "vehicle:i=vehicle",
    "-c", "route=route", "-c", "speed:d=speed", "-c", "time:t=tst",
    "-c", "acc:d=acc", "-c", "line:i=line", "-c", "stop:i=stop",
    "-c", "desi=desi", "-c", "operator:i=oper", "-c", "dl:i=dl",
    "-c", "odo:i=odo", "-c", "drst:i=drst", "-c", "occu:i=occu",
    "-c", "hdg:i=hdg", "-c", "dir=dir", "-c", "tsi:i=tsi",
    "-c", "jrn:i=jrn", "-c", "start=start",
]


def transit_record_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A helsinki-shaped record log derived from the events fixture: each
    payload is the MQTT vehicle-position envelope ``{"payload": {"VP":
    {...}}}`` (reference examples/README.md:27-44), with the six VP fields
    computed deterministically from the event row.  Single partition, like
    the topic in the reference transcript."""
    from fluvio_duck_spark.sources.consume import read_events

    ev = read_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast(T.IntegerType())
    vp = F.struct(
        (F.lit(60.0) + (k % 100).cast("double") / F.lit(1000.0)).alias("lat"),
        (F.lit(24.0) + (k % 100).cast("double") / F.lit(1000.0)).alias("long"),
        (F.col("user_id") % 1000).cast(T.IntegerType()).alias("veh"),
        F.concat(F.lit("route_"), (k % 10).cast("string")).alias("route"),
        F.col("value").alias("spd"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("tst"),
    )
    return ev.select(
        F.col("event_id").cast(T.LongType()).alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast(T.IntegerType()).alias("partition"),
        F.to_json(F.struct(F.struct(vp.alias("VP")).alias("payload"))).alias("value"),
    )


def _transform_jolt_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's largest documented workload (examples/README.md:
    34-44): ``fluvio_consume('helsinki -B --rows=1859058
    --transforms-file=jolt.yaml -c ...×20')`` — the full transit view
    through the ported spec fixture.  Option surface, YAML loading, jolt
    interpretation, and all 20 typed mappings run the real pipeline; only
    the topic bytes are the stand-in."""
    argv = [
        "helsinki", "-B", "--rows=1859058",
        f"--transforms-file={JOLT_FULL_YAML}",
        *TRANSIT_COLUMN_FLAGS,
    ]
    return fluvio_consume(
        spark, argv, sf_dir=sf_dir, source=transit_record_log(spark, sf_dir)
    )


ORACLE_TRANSFORM_JOLT_FULL = """
WITH k AS (
  SELECT *, CAST(json_extract_string(props, '$.k') AS INTEGER) AS kk
  FROM events)
SELECT
  60.0 + CAST(kk % 100 AS DOUBLE) / 1000.0 AS lat,
  24.0 + CAST(kk % 100 AS DOUBLE) / 1000.0 AS "long",
  CAST(user_id % 1000 AS INTEGER) AS vehicle,
  'route_' || CAST(kk % 10 AS VARCHAR) AS route,
  value AS speed,
  ts AS "time",
  CAST(NULL AS DOUBLE) AS acc,
  CAST(NULL AS INTEGER) AS line,
  CAST(NULL AS INTEGER) AS stop,
  CAST(NULL AS VARCHAR) AS desi,
  CAST(NULL AS INTEGER) AS "operator",
  CAST(NULL AS INTEGER) AS dl,
  CAST(NULL AS INTEGER) AS odo,
  CAST(NULL AS INTEGER) AS drst,
  CAST(NULL AS INTEGER) AS occu,
  CAST(NULL AS INTEGER) AS hdg,
  CAST(NULL AS VARCHAR) AS dir,
  CAST(NULL AS INTEGER) AS tsi,
  CAST(NULL AS INTEGER) AS jrn,
  CAST(NULL AS VARCHAR) AS "start"
FROM k
"""


def _q(opts: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fluvio_consume(spark, opts, sf_dir=sf_dir)

    return run


def _q_udtf_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * FROM fluvio_consume('<opts>', sf_dir)` binding natively
    through the polymorphic UDTF (sources/udtf.py::FluvioConsumeUDTF)."""
    from fluvio_duck_spark.sources.udtf import register_sql_table_functions

    register_sql_table_functions(spark)
    return spark.sql(
        "SELECT * FROM fluvio_consume("
        "'events -A -B --rows 1000000 -c k:i=k -c ks=k -c kd:d=k -c kl:l=k',"
        f" '{sf_dir}')"
    )


def _chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 ordered chain: filter (k < 50) → jolt shift (k→n) → typed map.
    Order matters: the jolt renames k, so the filter must run first —
    exactly the reference's ordered SmartModule invocation list
    (reference src/consume.rs:650-673)."""
    argv = [
        "events", "-A", "-B", "--rows", "1000000",
        "--transform",
        '{"uses":"sql-filter","with":'
        '{"where":"cast(get_json_object(value, \'$.k\') as int) < 50"}}',
        "--transform",
        '{"uses":"infinyon/jolt@0.1.0","with":'
        '{"spec":[{"operation":"shift","spec":{"k":"n"}}]}}',
        "-c", "n:d=n",
    ]
    return fluvio_consume(spark, argv, sf_dir=sf_dir)


def _array_map_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 array-map kind: map builds a JSON array payload ``[k, k+1]``,
    then sql-array-map emits one record per element — the budget counts
    records EMITTED (post-SmartModule, like the reference's printed-row
    count), so it must exceed 2x the log or the fan-out truncates (the
    sf1 receipt is what catches a budget sized to the pre-fanout
    count)."""
    argv = [
        "events", "-A", "-B", "--rows", "10000000",
        "--transform",
        '{"uses":"sql-map","with":{"value":'
        '"concat(\'[\', get_json_object(value, \'$.k\'), \',\', '
        'cast(cast(get_json_object(value, \'$.k\') as long) + 1 as string), '
        '\']\')"}}',
        "--transform",
        '{"uses":"sql-array-map","with":{"path":"$"}}',
    ]
    return fluvio_consume(spark, argv, sf_dir=sf_dir)


def _sum_leo(spark: SparkSession, sf_dir: str) -> DataFrame:
    # README.md:73-83 demo: SELECT sum(LEO) FROM fluvio_partitions()
    return fluvio_partitions(spark, sf_dir).agg(
        F.sum("LEO").cast(T.LongType()).alias("sum_leo")
    )


def _compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log compaction over the topic stand-in: current state per user_id
    = the latest record's (ts, type, value), Kafka/Fluvio compacted-topic
    semantics.  max_by aggregate — map-side pre-compaction, one shuffle
    of one row per (mapper, key), no log-wide sort (the row_number-window
    form shuffles and sorts every record)."""
    from fluvio_duck_spark.operators.compaction import compact_latest
    from fluvio_duck_spark.sources.consume import read_events

    return compact_latest(
        read_events(spark, sf_dir),
        keys=["user_id"],
        order_by=["ts", "event_id"],
        payload=["ts", "event_type", "value"],
    )


ORACLE_COMPACT = """
WITH r AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, ts AS last_ts, event_type AS last_event_type,
       value AS last_value
FROM r WHERE rn = 1
"""


def _compact_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction with deletes: 'error' as the tombstone kind — a user
    whose LATEST record is a tombstone disappears from the compacted
    state (the null-payload delete convention of compacted logs)."""
    from fluvio_duck_spark.operators.compaction import tombstone_compact
    from fluvio_duck_spark.sources.consume import read_events

    ev = read_events(spark, sf_dir)
    return tombstone_compact(
        ev,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        payload=["ts", "event_type"],
        tombstone=F.col("event_type") == "error",
    )


ORACLE_COMPACT_TOMBSTONES = """
WITH r AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, ts AS last_ts, event_type AS last_event_type
FROM r WHERE rn = 1 AND event_type <> 'error'
"""


def _heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection (the signal that feeds operators/skew.py
    salting): daily top-5 users by event count.  Exact two-level form —
    a mergeable (day, user) pre-aggregation (one corpus shuffle with
    map-side combine), then the per-day top-k window runs over the
    pre-agg's |days|x|active users| rows, never over raw events."""
    from pyspark.sql import Window as W

    from fluvio_duck_spark.sources.consume import read_events

    ev = read_events(spark, sf_dir)
    day_user = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("user_id")
    ).agg(F.count("*").alias("n_events"))
    rn = F.row_number().over(
        W.partitionBy("day").orderBy(F.desc("n_events"), F.col("user_id"))
    )
    return (
        day_user.withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .select("day", "user_id", "n_events", "rn")
    )


ORACLE_HEAVY_HITTERS = """
WITH du AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2),
r AS (
  SELECT day, user_id, n_events,
         row_number() OVER (PARTITION BY day
                            ORDER BY n_events DESC, user_id) AS rn
  FROM du)
SELECT day, user_id, n_events, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= 5
"""


def _sql_avg_by_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal usage surface (README.md:171-184): SQL text
    with ``fluvio_consume('<opts>')`` inline, relational work around it.
    consume_sql rewrites the call to a parameterized plan reference, so
    Catalyst optimizes scan + aggregate as one statement."""
    from fluvio_duck_spark.sources.sql import consume_sql

    return consume_sql(
        spark,
        """
        SELECT k % 10 AS route, count(*) AS n, avg(kd) AS avg_k
        FROM fluvio_consume('events -A -B --rows 1000000 -c k:i=k -c kd:d=k')
        GROUP BY k % 10
        """,
        sf_dir=sf_dir,
    )


ORACLE_SQL_AVG_BY_ROUTE = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS route,
       count(*) AS n,
       avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS avg_k
FROM events GROUP BY 1
"""


def _sql_topic_leo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join of two inline table functions in one SQL statement — the
    view-free form of the README's metadata session (README.md:60-83)."""
    from fluvio_duck_spark.sources.sql import consume_sql

    return consume_sql(
        spark,
        """
        SELECT t.name, count(*) AS n_parts, sum(p.LEO) AS topic_leo
        FROM fluvio_topics() t JOIN fluvio_partitions() p ON t.name = p.topic
        GROUP BY t.name
        """,
        sf_dir=sf_dir,
    )


ORACLE_SQL_TOPIC_LEO = """
WITH p AS (
  SELECT event_type AS topic, user_id % 4 AS part,
         CAST(max(event_id) + 1 AS BIGINT) AS leo
  FROM events GROUP BY 1, 2)
SELECT topic AS name, count(*) AS n_parts,
       CAST(sum(leo) AS BIGINT) AS topic_leo
FROM p GROUP BY topic
"""


def _sql_join_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO ``fluvio_consume`` calls joined in one SQL statement — the
    cross-topic enrichment form of the reference's literal surface
    (each call rewrites to its own parameterized plan reference, so
    Catalyst plans the join + both scans as one statement: the
    per-topic aggregates collapse before the join)."""
    from fluvio_duck_spark.sources.sql import consume_sql

    return consume_sql(
        spark,
        """
        SELECT c.k AS route_key, c.n_clicks, p.n_purchases
        FROM (SELECT k, count(*) AS n_clicks
              FROM fluvio_consume('click -A -B --rows 1000000 -c k:i=k')
              GROUP BY k) c
        JOIN (SELECT k, count(*) AS n_purchases
              FROM fluvio_consume('purchase -A -B --rows 1000000 -c k:i=k')
              GROUP BY k) p
        ON c.k = p.k
        """,
        sf_dir=sf_dir,
    )


ORACLE_SQL_JOIN_TOPICS = """
WITH c AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1),
p AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT c.k AS route_key, c.n_clicks, p.n_purchases
FROM c JOIN p USING (k)
"""


QUERIES: dict[str, QuerySpec] = {
    # §2.13/§3 entry point 1: literal SQL with inline table functions
    "consume_sql_join_topics": QuerySpec(
        _sql_join_topics, ORACLE_SQL_JOIN_TOPICS,
        doc="SQL-text surface: TWO fluvio_consume scans joined in one statement (cross-topic enrichment)"),
    "consume_sql_avg_by_route": QuerySpec(
        _sql_avg_by_route, ORACLE_SQL_AVG_BY_ROUTE,
        doc="SQL-text surface: fluvio_consume('<opts>') inline in a GROUP BY statement (reference README.md:171-184)"),
    "consume_sql_topic_leo": QuerySpec(
        _sql_topic_leo, ORACLE_SQL_TOPIC_LEO,
        doc="SQL-text surface: join of fluvio_topics() and fluvio_partitions() in one statement"),
    "consume_heavy_hitters": QuerySpec(
        _heavy_hitters, ORACLE_HEAVY_HITTERS,
        doc="daily top-5 hot keys via pre-agg + window over the pre-agg (skew-salting input signal)"),
    "consume_compact_latest": QuerySpec(
        _compact, ORACLE_COMPACT,
        doc="log compaction: latest record per key via map-side max_by (no log-wide sort)"),
    "consume_compact_tombstones": QuerySpec(
        _compact_tombstones, ORACLE_COMPACT_TOMBSTONES,
        doc="compaction with tombstone deletes (latest-record tombstone removes the key)"),
    # F1/L2: tail — last 100 records of the whole log (offset >= LEO-100)
    "consume_tail_default": QuerySpec(
        _q("events -A -T 100"),
        f"""
        SELECT {_DEFAULT_COLS} FROM events
        WHERE event_id >= (SELECT max(event_id) + 1 - 100 FROM events)
        """,
        doc="default schema, -T tail positioning (reference src/consume.rs:598-599)",
    ),
    # F1 + L1: from beginning with a row budget (first 500 in log order)
    "consume_beginning_rows": QuerySpec(
        _q("events -A -B --rows 500"),
        f"""
        SELECT {_DEFAULT_COLS} FROM events ORDER BY event_id LIMIT 500
        """,
        doc="-B + --rows scan budget (reference src/consume.rs:75-93,:500-501)",
    ),
    # F1/F2: absolute start + inclusive end (end enforced — SURVEY §1.4.4 fix)
    "consume_start_end": QuerySpec(
        _q("events -A --start 100 --end 299 --rows 100000"),
        f"""
        SELECT {_DEFAULT_COLS} FROM events
        WHERE event_id >= 100 AND event_id <= 299
        """,
        doc="--start/--end offset range (reference src/consume.rs:503-505,:592-594)",
    ),
    # F1: head — skip the first 50 records, then a 200-row budget
    "consume_head_rows": QuerySpec(
        _q("events -A -H 50 --rows 200"),
        f"""
        SELECT {_DEFAULT_COLS} FROM events
        WHERE event_id >= 50 ORDER BY event_id LIMIT 200
        """,
        doc="-H head positioning (reference src/consume.rs:595-596)",
    ),
    # ST2 default: no position flag = Offset::end → empty in bounded mode
    "consume_default_end_empty": QuerySpec(
        _q("events -A"),
        f"SELECT {_DEFAULT_COLS} FROM events WHERE 1 = 0",
        doc="default Offset::end semantics (reference src/consume.rs:601-604)",
    ),
    # P4-P11: typed JSON column mapping, all numeric/string codes
    "consume_mapped_typed": QuerySpec(
        _q("events -A -B --rows 1000000 -c k:i=k -c ks=k -c kd:d=k -c kf:f=k -c kl:l=k"),
        """
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               json_extract_string(props, '$.k') AS ks,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS kd,
               CAST(json_extract_string(props, '$.k') AS FLOAT) AS kf,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS kl
        FROM events
        """,
        doc="-c name[:code]=path mapping (reference src/consume.rs:223-245,:311-443)",
    ),
    # P4-P11 through the POLYMORPHIC SQL table function (VERDICT r11 #6):
    # analyze() binds the -c mappings to the output schema at bind time
    # (reference src/consume.rs:184-187,:607-637); same oracle semantics
    # as consume_mapped_typed, so a green hash here + there proves
    # UDTF result == builder result cross-engine
    "consume_udtf_mapped": QuerySpec(
        _q_udtf_mapped,
        """
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               json_extract_string(props, '$.k') AS ks,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS kd,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS kl
        FROM events
        """,
        doc="fluvio_consume as a Spark 4 polymorphic UDTF: analyze() "
            "declares the mapping-dependent schema at bind time, SQL "
            "binds natively with no textual rewrite (sources/udtf.py)",
    ),
    # S1 topic + partition selection (fix of reference partition pinning)
    "consume_partition_select": QuerySpec(
        _q("click -p 2 -B --rows 1000000"),
        f"""
        SELECT {_DEFAULT_COLS} FROM events
        WHERE event_type = 'click' AND user_id % 4 = 2
        """,
        doc="topic + -p partition filter (SURVEY §1.4.2 fix of src/consume.rs:179)",
    ),
    # tail within a sub-topic: LEO computed over the topic's own log
    "consume_topic_tail": QuerySpec(
        _q("purchase -A -T 50 --rows 100000"),
        f"""
        SELECT {_DEFAULT_COLS} FROM events
        WHERE event_type = 'purchase'
          AND event_id >= (SELECT max(event_id) + 1 - 50 FROM events
                           WHERE event_type = 'purchase')
        """,
        doc="per-topic LEO for tail positioning",
    ),
    # ST5: jolt-shift transform chain rewriting the payload, then typed mapping
    "consume_transform_jolt": QuerySpec(
        _q(
            "events -A -B --rows 1000000 "
            "--transform '"
            '{"uses":"infinyon/jolt@0.1.0","with":{"spec":[{"operation":"shift","spec":{"k":"kk"}}]}}'
            "' -c kk:i=kk"
        ),
        """
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS kk FROM events
        """,
        doc="inline --transform jolt shift (reference src/consume.rs:655-660, examples/short.yaml)",
    ),
    # ST5 full-fidelity: the reference's examples/jolt.yaml spec + 20-col
    # mapped transit view (its largest documented workload)
    "consume_transform_jolt_full": QuerySpec(
        _transform_jolt_full, ORACLE_TRANSFORM_JOLT_FULL,
        doc="full transit parity: --transforms-file=examples/jolt.yaml + 20 typed -c mappings "
            "(reference examples/README.md:34-44, examples/jolt.yaml)",
    ),
    # ST5: ordered multi-transform chain (filter → jolt → map)
    "consume_transform_chain": QuerySpec(
        _chain,
        """
        SELECT CAST(json_extract_string(props, '$.k') AS DOUBLE) AS n
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) < 50
        """,
        doc="ordered transform chain: filter then jolt then typed mapping — ST5",
    ),
    # ST5/F3: filter-kind smartmodule (server-side predicate analogue)
    "consume_smartmodule_filter": QuerySpec(
        _q(
            "events -A -B --rows 1000000 --smartmodule sql-filter "
            "-e \"where=cast(get_json_object(value, '$.k') as int) >= 50\""
        ),
        f"""
        SELECT {_DEFAULT_COLS} FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
        """,
        doc="filter smartmodule as pushed-down predicate (reference SmartModuleKind, src/consume.rs:713-741)",
    ),
    # ST5: filter-map kind — rewrite-or-drop in ONE module (fn(record) ->
    # Option<record>, fluvio's standard filter-map; shipped opaquely as
    # SmartModuleKind::Generic by the reference, src/consume.rs:713-726).
    # Records with odd k produce NULL and are dropped; even k records
    # survive with a rewritten payload — a composition filter→map cannot
    # decide survival from the rewrite's own result.
    "consume_transform_filter_map": QuerySpec(
        _q(
            "events -A -B --rows 1000000 --smartmodule sql-filter-map "
            "-e \"value=case when cast(get_json_object(value, '$.k') as int) % 2 = 0 "
            "then concat('even:', get_json_object(value, '$.k')) end\""
        ),
        """
        SELECT event_id AS "offset", ts AS "timestamp",
               'even:' || json_extract_string(props, '$.k') AS "value"
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0
        """,
        doc="filter-map smartmodule kind: rewrite-or-drop in one pass — ST5",
    ),
    # ST5: array-map kind — one record per JSON-array element (fn(record)
    # -> Vec<record>).  The chain first builds '[k, k+1]' with a map
    # link, then sql-array-map unnests it: every event yields TWO
    # records sharing the parent's offset/timestamp, values 'k' and
    # 'k+1' per get_json_object's element rendering.
    "consume_transform_array_map": QuerySpec(
        _array_map_chain,
        """
        SELECT event_id AS "offset", ts AS "timestamp",
               json_extract_string(props, '$.k') AS "value"
        FROM events
        UNION ALL
        SELECT event_id AS "offset", ts AS "timestamp",
               CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1
                    AS VARCHAR) AS "value"
        FROM events
        """,
        doc="array-map smartmodule kind: one record per JSON-array element, "
            "parent offset inherited — ST5",
    ),
    # S2: fluvio_topics()
    "fluvio_topics": QuerySpec(
        lambda spark, sf_dir: fluvio_topics(spark, sf_dir),
        """
        SELECT event_type AS name,
               CAST(count(DISTINCT user_id % 4) AS INTEGER) AS partitions
        FROM events GROUP BY event_type
        """,
        doc="topics metadata scan (reference src/topic.rs:97-126)",
    ),
    # S3: fluvio_partitions()
    "fluvio_partitions": QuerySpec(
        lambda spark, sf_dir: fluvio_partitions(spark, sf_dir),
        """
        SELECT event_type AS topic,
               CAST(user_id % 4 AS VARCHAR) AS partition,
               CAST(max(event_id) + 1 AS BIGINT) AS "LEO"
        FROM events GROUP BY 1, 2
        """,
        doc="partitions metadata scan with LEO (reference src/partition.rs:97-140)",
    ),
    # README.md:73-83: sum of log-end offsets across partitions
    "partitions_sum_leo": QuerySpec(
        _sum_leo,
        """
        SELECT CAST(sum("LEO") AS BIGINT) AS sum_leo FROM (
          SELECT CAST(max(event_id) + 1 AS BIGINT) AS "LEO"
          FROM events GROUP BY event_type, user_id % 4
        )
        """,
        doc="aggregate over metadata scan (reference README.md:73-83)",
    ),
}


# ---------------------------------------------------------------------------
# Per-partition offset semantics (reference src/partition.rs:107-134): each
# partition log owns its own dense 0..LEO_p-1 sequence.  The queries below
# drive BOTH front ends over the genuinely multi-fragment fixture
# (sources/pplog.py) — builder with per_partition_offsets=True, and the
# DataSource's log_dir mode (one InputPartition per partition directory,
# per-partition footer-statistics LEO).
# ---------------------------------------------------------------------------

#: DuckDB derivation twin of sources.pplog.per_partition_log.
_PP_CTE = """
pp AS (
  SELECT ROW_NUMBER() OVER (PARTITION BY user_id % 4 ORDER BY event_id) - 1
           AS "offset",
         ts AS "timestamp",
         CAST(user_id % 4 AS INTEGER) AS "partition",
         props AS "value",
         COUNT(*) OVER (PARTITION BY user_id % 4) AS leo
  FROM events
)
"""


def _pp_consume(args: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from fluvio_duck_spark.sources.pplog import per_partition_log

        return fluvio_consume(
            spark, args, sf_dir=sf_dir,
            source=per_partition_log(spark, sf_dir),
            per_partition_offsets=True,
        )

    return run


def _q_source_pp_offsets_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataSource front end over the partition-per-directory log
    (``.option("log_dir", ...)``): tail and LEO anchor against each
    partition's OWN log end, resolved at plan time from that
    partition's parquet footer statistics — the per-replica leo read of
    reference src/partition.rs:131.  Two legs: ``-A -T 3`` (per-
    partition tail; max_offset+1 surfaces each partition's LEO) and a
    pinned ``-p 1 -H 10 --rows 25`` (head window budgeted within the
    one partition)."""
    from fluvio_duck_spark.sources.datasource import register_fluvio_source
    from fluvio_duck_spark.sources.pplog import write_pp_log_dir

    register_fluvio_source(spark)
    log_dir = write_pp_log_dir(spark, sf_dir)

    def leg(tag, args):
        df = (
            spark.read.format("fluvio")
            .option("log_dir", log_dir)
            .option("args", args)
            .load()
        )
        return df.groupBy("partition").agg(
            F.count("*").alias("n"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
            (F.max("offset") + 1).alias("leo"),
        ).select(F.lit(tag).alias("leg"), "*")

    return leg("pp_tail", "-A -T 3 --rows 1000000").unionAll(
        leg("pp_pinned_head", "-p 1 -H 10 --rows 25")
    )


def _q_pp_partitions_leo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 over the per-partition log layout: ``fluvio_partitions(log_dir=
    ...)`` lists the log's own ``partition=<k>`` directories with each
    partition's LEO read from ITS fragments' parquet footer statistics —
    the per-replica admin read of reference src/partition.rs:131 against
    the genuinely multi-fragment fixture.  Footer-only metadata; because
    every partition log is dense 0..LEO_p-1, the oracle's per-partition
    COUNT(*) equals the footer max(offset)+1 — any cross-partition
    offset bleed breaks the equality."""
    from fluvio_duck_spark.sources.pplog import write_pp_log_dir

    log_dir = write_pp_log_dir(spark, sf_dir)
    return fluvio_partitions(spark, sf_dir, log_dir=log_dir)


def _q_pp_transform_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 × per-partition offsets: the ordered SmartModule chain runs
    AFTER the per-partition tail bound resolves (the SPU applies modules
    to the records the offset window selected — reference
    src/consume.rs:645-673 over src/partition.rs:107-134).  Tail-40 of
    EACH partition log → sql-filter (k ≥ 50) → jolt shift (k→kk) → two
    typed mappings.  A global-LEO tail or a filter-before-tail ordering
    both change the row multiset."""
    from fluvio_duck_spark.sources.pplog import per_partition_log

    argv = [
        "events", "-A", "-T", "40", "--rows", "1000000",
        "--transform",
        '{"uses":"sql-filter","with":'
        '{"where":"cast(get_json_object(value, \'$.k\') as int) >= 50"}}',
        "--transform",
        '{"uses":"infinyon/jolt@0.1.0","with":'
        '{"spec":[{"operation":"shift","spec":{"k":"kk"}}]}}',
        "-c", "kk:i=kk", "-c", "kkd:d=kk",
    ]
    return fluvio_consume(
        spark, argv, sf_dir=sf_dir,
        source=per_partition_log(spark, sf_dir),
        per_partition_offsets=True,
    )


def _q_consume_sql_pp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SQL-text surface retargeted at a per-partition
    log: ONE statement joins a ``fluvio_consume`` scan with the
    ``fluvio_partitions()`` metadata function, both bound through
    ``log_dir`` (consume via the DataSource's per-partition planning,
    partitions via footer-statistics LEO).  The result cross-checks the
    two LEO sources — scan-derived max(offset)+1 must equal the footer
    metadata LEO for every partition, the invariant a live connector's
    admin API must preserve (reference src/partition.rs:131)."""
    from fluvio_duck_spark.sources.pplog import write_pp_log_dir
    from fluvio_duck_spark.sources.sql import consume_sql

    log_dir = write_pp_log_dir(spark, sf_dir)
    return consume_sql(
        spark,
        """
        SELECT /*+ BROADCAST(p) */ c.partition, COUNT(*) AS n,
               MAX(c.offset) + 1 AS leo_scan, MAX(p.LEO) AS leo_meta
        FROM fluvio_consume('events -A -B --rows 1000000') c
        JOIN fluvio_partitions() p ON c.partition = CAST(p.partition AS INT)
        GROUP BY c.partition
        """,
        sf_dir=sf_dir, log_dir=log_dir,
    )


def _q_consume_sql_pp_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 × per-partition offsets × ST5/P4: the SQL-text surface with
    typed ``-c`` mappings bound to a log_dir session.  The statement is
    byte-identical to what a stand-in session runs; the binder routes
    the mapped scan through the builder pipeline over a DataSource
    source so the projection still applies (ADVICE r7: a raw DataSource
    bind silently returned the unmapped 4-column schema).  Offsets are
    partition 2's OWN sequence — both the mapping AND the per-partition
    offset algebra must survive the SQL front end."""
    from fluvio_duck_spark.sources.pplog import write_pp_log_dir
    from fluvio_duck_spark.sources.sql import consume_sql

    log_dir = write_pp_log_dir(spark, sf_dir)
    return consume_sql(
        spark,
        """
        SELECT kk, kd FROM
          fluvio_consume('events -p 2 --start 5 --end 60 -c kk:i=k -c kd:d=k')
        """,
        sf_dir=sf_dir, log_dir=log_dir,
    )


QUERIES.update({
    # F1/L2 over per-partition offsets: tail anchors at EACH partition's
    # log end (builder front end, per_partition_offsets=True)
    "consume_pp_tail": QuerySpec(
        _pp_consume("events -A -T 3 --rows 1000000"),
        """
        WITH """ + _PP_CTE + """
        SELECT "offset", "timestamp", "value" FROM pp
        WHERE "offset" >= leo - 3
        """,
        doc="per-partition tail: -A -T 3 yields the last 3 records of EACH "
            "partition log (reference src/partition.rs:107-134 offset model)",
    ),
    # F1/F2 over per-partition offsets: pinned partition head window
    "consume_pp_partition_head": QuerySpec(
        _pp_consume("events -p 2 -H 5 --end 12 --rows 1000000"),
        """
        WITH """ + _PP_CTE + """
        SELECT "offset", "timestamp", "value" FROM pp
        WHERE "partition" = 2 AND "offset" BETWEEN 5 AND 12
        """,
        doc="pinned partition over its own offset sequence: -p 2 -H 5 --end 12",
    ),
    # L1 over per-partition offsets: --rows budgets each partition's
    # stream independently (deterministic form of the CLI's merged stop;
    # documented deviation in sources/consume.py::_pp_row_budget)
    "consume_pp_budget": QuerySpec(
        _pp_consume("events -A -B --rows 7"),
        """
        WITH """ + _PP_CTE + """
        SELECT "offset", "timestamp", "value" FROM pp
        WHERE "offset" < 7
        """,
        doc="per-partition --rows budget: first 7 records of each partition log",
    ),
    # S1b/S3 over per-partition offsets: DataSource log_dir mode with
    # per-partition footer-statistics LEO
    "source_pp_offsets_parity": QuerySpec(
        _q_source_pp_offsets_parity,
        """
        WITH """ + _PP_CTE + """
        SELECT 'pp_tail' AS leg, "partition", CAST(COUNT(*) AS BIGINT) AS n,
               MIN("offset") AS min_offset, MAX("offset") AS max_offset,
               MAX("offset") + 1 AS leo
        FROM pp WHERE "offset" >= leo - 3 GROUP BY 2
        UNION ALL
        SELECT 'pp_pinned_head' AS leg, "partition",
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN("offset") AS min_offset, MAX("offset") AS max_offset,
               MAX("offset") + 1 AS leo
        FROM (SELECT * FROM pp
              WHERE "partition" = 1 AND "offset" >= 10
              ORDER BY "offset" LIMIT 25)
        GROUP BY 2
        """,
        doc="DataSource log_dir mode: per-partition tail + pinned head, LEO "
            "from each partition's own footer statistics",
    ),
    # S3 over the per-partition log layout: footer-statistics LEO per
    # partition directory (admin-RPC analogue, metadata-only)
    "pp_partitions_leo": QuerySpec(
        _q_pp_partitions_leo,
        """
        SELECT 'events' AS topic, CAST(user_id % 4 AS VARCHAR) AS "partition",
               CAST(COUNT(*) AS BIGINT) AS "LEO"
        FROM events GROUP BY 2
        """,
        doc="fluvio_partitions(log_dir=...): per-partition LEO from each "
            "log's own parquet footer statistics (reference "
            "src/partition.rs:131 per-replica read)",
    ),
    # §2.12 × per-partition offsets: the SQL-text surface bound to a
    # per-partition log — scan LEO cross-checked against footer LEO
    "consume_sql_pp": QuerySpec(
        _q_consume_sql_pp,
        """
        WITH """ + _PP_CTE + """
        SELECT "partition", CAST(COUNT(*) AS BIGINT) AS n,
               MAX("offset") + 1 AS leo_scan,
               CAST(COUNT(*) AS BIGINT) AS leo_meta
        FROM pp GROUP BY 1
        """,
        doc="SQL-text surface over the per-partition log: fluvio_consume + "
            "fluvio_partitions() bound to log_dir in one statement; "
            "scan-derived LEO == footer-metadata LEO per partition",
    ),
    # §2.12 × per-partition offsets × typed mappings: the SQL text is
    # transport-invariant INCLUDING -c projections (ADVICE r7 fix)
    "consume_sql_pp_mapped": QuerySpec(
        _q_consume_sql_pp_mapped,
        """
        WITH """ + _PP_CTE + """
        SELECT CAST(json_extract_string("value", '$.k') AS INTEGER) AS kk,
               CAST(json_extract_string("value", '$.k') AS DOUBLE) AS kd
        FROM pp WHERE "partition" = 2 AND "offset" BETWEEN 5 AND 60
        """,
        doc="SQL front end over a per-partition log WITH typed -c mappings: "
            "the statement text is transport-invariant — mapping and "
            "per-partition offset algebra both survive the log_dir bind",
    ),
    # ST5 × per-partition offsets: ordered transform chain downstream of
    # the per-partition tail bound
    "consume_pp_transform_tail": QuerySpec(
        _q_pp_transform_tail,
        """
        WITH """ + _PP_CTE + """
        SELECT CAST(json_extract_string("value", '$.k') AS INTEGER) AS kk,
               CAST(json_extract_string("value", '$.k') AS DOUBLE) AS kkd
        FROM pp
        WHERE "offset" >= leo - 40
          AND CAST(json_extract_string("value", '$.k') AS INTEGER) >= 50
        """,
        doc="transform chain over per-partition tails: -A -T 40 resolves "
            "per partition log, THEN sql-filter -> jolt shift -> typed "
            "mappings (bounds-before-chain ordering)",
    ),
})
