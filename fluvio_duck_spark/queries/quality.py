"""Data-quality + time-series analytics extensions: expectation suites,
autocorrelation, MAD anomaly flags, per-group OLS trend (shared with its
streaming twin), market-basket lift, route distance over the transit
shape, calendar-spine linear interpolation, and the k-anonymity /
l-diversity privacy release gate.

These extend the analysis layer of SURVEY §2 (the reference's
SQL-over-views workflow, ``README.md:149-184``) with the validation /
monitoring queries a production ingest runs before training data ships.
All pure Catalyst; float results are made hash-stable by accumulating in
exact integer/DECIMAL state and spending at most ONE final double
expression per value (SCALE.md determinism notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fluvio_duck_spark.queries import QuerySpec
from fluvio_duck_spark.sources.tables import load

QUERIES: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# quality_expectations — deequ-style constraint suite in two jobs
# ---------------------------------------------------------------------------

def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over ``orders``: completeness, key uniqueness,
    value range, accepted values, and referential integrity — the checks
    a training-data ingest gates on (deequ/great-expectations shape).

    Scale: every metric except the FK check folds into ONE map-side-
    combined aggregation over orders (conditional counts — a single
    scan, no shuffle beyond the 1-row final combine).  The FK check is a
    LEFT SEMI against the distinct dim keys with NO forced broadcast —
    AQE broadcasts while the dim fits the budget and falls back to a
    co-partitioned SMJ when it outgrows it (an unconditional hint would
    be the unbounded-broadcast anti-pattern).  Output is one row per
    constraint: (check_name, metric ∈ [0,1], passed).
    """
    orders = load(spark, sf_dir, "orders")
    cust_keys = load(spark, sf_dir, "customer").select("c_custkey").distinct()

    fk_ok = (
        orders.join(
            cust_keys,
            orders.o_custkey == cust_keys.c_custkey,
            "left_semi",
        ).agg(F.count("*").alias("fk_matched"))
    )

    base = orders.agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_orderkey").alias("orderkey_distinct"),
        F.count(F.when(F.col("o_totalprice") > 0, 1)).alias("price_pos"),
        F.count(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("status_ok"),
    )

    # two 1-row locals cross-joined — no action at plan-build time
    m = base.crossJoin(fk_ok)

    def entry(name, cnt):
        # `passed` compares EXACT counts — a 6-dp-rounded ratio would
        # round real violations up to 1.0 once n exceeds ~2M rows
        return F.struct(
            F.lit(name).alias("check_name"),
            F.round(cnt.cast("double") / F.col("n").cast("double"), 6).alias(
                "metric"
            ),
            (cnt == F.col("n")).alias("passed"),
        )

    metrics = m.select(
        F.array(
            entry("completeness:o_custkey", F.col("custkey_nonnull")),
            entry("unique:o_orderkey", F.col("orderkey_distinct")),
            entry("range:o_totalprice>0", F.col("price_pos")),
            entry("accepted:o_orderstatus", F.col("status_ok")),
            entry("ref:o_custkey->customer", F.col("fk_matched")),
        ).alias("cs")
    ).select(F.explode("cs").alias("c"))
    return metrics.select("c.check_name", "c.metric", "c.passed")


ORACLE_EXPECTATIONS = """
WITH base AS (
  SELECT count(*) AS n,
         count(o_custkey) AS custkey_nonnull,
         count(DISTINCT o_orderkey) AS orderkey_distinct,
         count(*) FILTER (o_totalprice > 0) AS price_pos,
         count(*) FILTER (o_orderstatus IN ('O','F','P')) AS status_ok
  FROM orders
), fk AS (
  SELECT count(*) AS fk_matched FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM customer)
), m AS (SELECT * FROM base, fk),
rows_out AS (
  SELECT 'completeness:o_custkey' AS check_name,
         round(CAST(custkey_nonnull AS DOUBLE) / CAST(n AS DOUBLE), 6) AS metric,
         custkey_nonnull = n AS passed FROM m
  UNION ALL
  SELECT 'unique:o_orderkey', round(CAST(orderkey_distinct AS DOUBLE) / CAST(n AS DOUBLE), 6),
         orderkey_distinct = n FROM m
  UNION ALL
  SELECT 'range:o_totalprice>0', round(CAST(price_pos AS DOUBLE) / CAST(n AS DOUBLE), 6),
         price_pos = n FROM m
  UNION ALL
  SELECT 'accepted:o_orderstatus', round(CAST(status_ok AS DOUBLE) / CAST(n AS DOUBLE), 6),
         status_ok = n FROM m
  UNION ALL
  SELECT 'ref:o_custkey->customer', round(CAST(fk_matched AS DOUBLE) / CAST(n AS DOUBLE), 6),
         fk_matched = n FROM m
)
SELECT check_name, metric, passed FROM rows_out
"""


# ---------------------------------------------------------------------------
# ts_autocorr_hourly — lag-k autocorrelation from exact integer sums
# ---------------------------------------------------------------------------

def q_ts_autocorr_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of the hourly event count per type —
    the seasonality probe run before picking rollup grain.

    Raw→hourly is the only full-data shuffle (map-side combined count);
    the lag windows and the correlation run over the tiny hourly table.
    All sums stay in exact BIGINT; each acf spends ONE double division +
    sqrt at the end, so the value is bit-identical across engines and
    partial-agg orders.
    """
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        ).agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("event_type").orderBy("hour")
    lagged = hourly.select(
        "event_type",
        "cnt",
        *[F.lag("cnt", k).over(w).alias(f"lag{k}") for k in (1, 2, 3)],
    )
    pairs = lagged.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("cnt").alias("x"),
                        F.col(f"lag{k}").alias("y"),
                    )
                    for k in (1, 2, 3)
                ]
            )
        ).alias("p"),
    ).select("event_type", "p.lag", "p.x", "p.y").filter(
        F.col("y").isNotNull()
    )
    s = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "event_type",
        "lag",
        "n",
        F.round(num / F.sqrt(F.nullif(vx * vy, F.lit(0.0))), 6).alias("acf"),
    )


ORACLE_AUTOCORR = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, cnt,
         lag(cnt, 1) OVER w AS lag1,
         lag(cnt, 2) OVER w AS lag2,
         lag(cnt, 3) OVER w AS lag3
  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour)
), pairs AS (
  SELECT event_type, lag, x, y FROM (
    SELECT event_type, 1 AS lag, cnt AS x, lag1 AS y FROM lagged
    UNION ALL
    SELECT event_type, 2, cnt, lag2 FROM lagged
    UNION ALL
    SELECT event_type, 3, cnt, lag3 FROM lagged
  ) WHERE y IS NOT NULL
), s AS (
  SELECT event_type, lag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         sum(x*x) AS sxx, sum(y*y) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS INTEGER) AS lag, n,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / sqrt(nullif(CAST(n*sxx - sx*sx AS DOUBLE)
                           * CAST(n*syy - sy*sy AS DOUBLE), 0.0)), 6) AS acf
FROM s
"""


# ---------------------------------------------------------------------------
# ts_anomaly_mad — robust outlier hours via median absolute deviation
# ---------------------------------------------------------------------------

def q_ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event count deviates > 3 robust sigmas (1.4826·MAD)
    from the per-type median — the monitoring alarm over ingest volume.

    Exact medians over the HOURLY table (tiny after the one raw→hourly
    shuffle), joined back broadcast.  Counts are integers so the
    interpolated median is a x.0/x.5 double — exact in IEEE and
    identical across engines.  MAD==0 ⇒ no finite score (nullif guard).
    Emits the top-3 most-deviant hours per type with an ``is_anomaly``
    flag (score > 3) — a stable, non-empty report even when nothing
    trips the alarm.
    """
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("cnt"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(cnt, 0.5)").alias("med")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("cnt") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    scored = dev.join(F.broadcast(mad), "event_type").withColumn(
        "score",
        F.round(
            F.col("dev") / F.nullif(F.lit(1.4826) * F.col("mad"), F.lit(0.0)),
            6,
        ),
    )
    w = W.partitionBy("event_type").orderBy(
        F.desc_nulls_last("score"), "hour"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "event_type",
            "hour",
            "cnt",
            "score",
            F.coalesce(F.col("score") > 3.0, F.lit(False)).alias("is_anomaly"),
        )
    )


ORACLE_ANOMALY_MAD = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, quantile_cont(cnt, 0.5) AS med
  FROM hourly GROUP BY 1
), dev AS (
  SELECT h.event_type, h.hour, h.cnt, abs(h.cnt - m.med) AS dev
  FROM hourly h JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad
  FROM dev GROUP BY 1
), scored AS (
  SELECT d.event_type, d.hour, d.cnt,
         round(d.dev / nullif(1.4826 * m.mad, 0.0), 6) AS score
  FROM dev d JOIN mad m USING (event_type)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY score DESC NULLS LAST, hour
  ) AS rk
  FROM scored
)
SELECT event_type, hour, cnt, score,
       COALESCE(score > 3.0, FALSE) AS is_anomaly
FROM ranked WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# trend_ols_by_type — per-group OLS slope/intercept from DECIMAL sums
# ---------------------------------------------------------------------------

#: Fixed x-axis anchor: hours since this epoch keep the OLS sums small
#: and overflow-safe without a data-dependent driver action.
_TREND_ANCHOR = "2024-01-01"


def ols_sufficient_stats(ev: DataFrame) -> DataFrame:
    """Per-event-type OLS sufficient statistics (n, Σx, Σy, Σxy, Σxx)
    with x = whole hours since the fixed anchor and y rounded into
    DECIMAL(18,6) — plain mergeable aggregates, so the same expression
    serves batch AND a continuously-maintained stream aggregate."""
    # floor, not cast-truncation: matches the oracle for pre-anchor
    # timestamps (truncation rounds -0.5 → 0, floor → -1)
    x = F.floor(
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lit(_TREND_ANCHOR).cast("timestamp"))
        )
        / F.lit(3600.0)
    ).cast("long")
    yd = F.round(F.col("value"), 6).cast("decimal(18,6)")
    return ev.select(
        "event_type", x.alias("x"), yd.alias("y")
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )


def ols_finalize(s: DataFrame) -> DataFrame:
    """slope/intercept from exact sufficient statistics — one double
    expression each, so any accumulation order (batch partials, stream
    micro-batches) produces the identical result."""
    # nullif guard: a zero-variance group (all rows in one hour) must be
    # NULL in both engines — Spark's IEEE 0/0 is NaN, DuckDB's is NULL
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        F.lit(0.0),
    )
    s = s.withColumn("slope", slope)
    intercept = (
        F.col("sy").cast("double") / F.col("n").cast("double")
        - F.col("slope") * (F.col("sx").cast("double") / F.col("n").cast("double"))
    )
    return s.select(
        "event_type",
        "n",
        F.round("slope", 6).alias("slope_per_hour"),
        F.round(intercept, 6).alias("intercept"),
    )


def q_trend_ols_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of `value` over time (drift slope a
    monitoring pipeline alerts on): OLS fit y = a·x + b with x = hours
    since a fixed anchor.

    ONE map-side-combined aggregation — the five sufficient statistics
    accumulate exactly (x is an integer hour, y is DECIMAL(18,6)), so
    partial-agg order can't change a bit; slope/intercept spend one
    double expression each.
    """
    return ols_finalize(ols_sufficient_stats(load(spark, sf_dir, "events")))


ORACLE_TREND_OLS = f"""
WITH pts AS (
  SELECT event_type,
         CAST(floor(date_diff('second', TIMESTAMP '{_TREND_ANCHOR}', ts) / 3600.0) AS BIGINT) AS x,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS y
  FROM events
), s AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts GROUP BY 1
), fit AS (
  SELECT event_type, n, sx, sy,
         CAST(n*sxy - sx*sy AS DOUBLE)
           / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0) AS slope
  FROM s
)
SELECT event_type, n,
       round(slope, 6) AS slope_per_hour,
       round(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)
             - slope * (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)), 6) AS intercept
FROM fit
"""


# ---------------------------------------------------------------------------
# basket_copurchase_lift — market-basket pair mining over lineitem
# ---------------------------------------------------------------------------

def q_basket_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part pairs by lift = N·c(a,b) / (c(a)·c(b)) over order
    baskets — the association-mining shape (recs, co-occurrence
    curation).

    The pair explosion is a SELF-EQUI-JOIN on l_orderkey: both sides
    shuffle once on the same key (AQE plans one exchange each, then a
    co-partitioned SMJ), and fan-out is bounded by basket size squared
    (TPC-H baskets ≤ 7 lines), never |parts|².  Pair/item counts are
    map-side combined; lift is integers until one final division.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(F.count("*").alias("c1"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= 2)
    )
    out = (
        pairs.join(item.withColumnRenamed("l_partkey", "p1"), "p1")
        .withColumnRenamed("c1", "ca")
        .join(
            item.withColumnRenamed("l_partkey", "p2").withColumnRenamed(
                "c1", "cb"
            ),
            "p2",
        )
        .crossJoin(n_orders)
        .select(
            "p1",
            "p2",
            "c12",
            F.round(
                (F.col("n_orders") * F.col("c12")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.desc("lift"), F.desc("c12"), "p1", "p2"
    ).limit(50)


ORACLE_BASKET_LIFT = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM li
), item AS (
  SELECT l_partkey, count(*) AS c1 FROM li GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS c12
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT p1, p2, c12,
       round(CAST(n.n_orders * c12 AS DOUBLE)
             / CAST(ia.c1 * ib.c1 AS DOUBLE), 6) AS lift
FROM pairs
JOIN item ia ON ia.l_partkey = p1
JOIN item ib ON ib.l_partkey = p2
CROSS JOIN n
ORDER BY lift DESC, c12 DESC, p1, p2 LIMIT 50
"""


# ---------------------------------------------------------------------------
# geo_route_distance — per-route distance over the transit VP shape
# ---------------------------------------------------------------------------

def q_geo_route_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance traveled per route from consecutive vehicle positions —
    the reference's Helsinki VP demo domain (``examples/README.md:27-44``;
    lat/long per ping) taken to an analytics answer.

    Positions are the deterministic VP fields of the transit stand-in
    (``consume_queries.transit_record_log``).  City-scale planar
    approximation: km = 111.32·√(Δlat² + Δlong²) — every op (IEEE
    −,·,√) is correctly rounded, so per-step values are bit-identical
    across engines; per-route totals accumulate in DECIMAL so task
    order can't move a bit.  The lag window shuffles once on vehicle;
    route totals are map-side combined.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    pings = ev.select(
        (F.col("user_id") % 1000).alias("veh"),
        F.concat(F.lit("route_"), (k % 10).cast("string")).alias("route"),
        (F.lit(60.0) + (k % 100).cast("double") / F.lit(1000.0)).alias("lat"),
        (F.lit(24.0) + (k % 100).cast("double") / F.lit(1000.0)).alias("lng"),
        "ts",
        "event_id",
    )
    w = W.partitionBy("veh").orderBy("ts", "event_id")
    steps = pings.select(
        "route",
        (F.col("lat") - F.lag("lat").over(w)).alias("dlat"),
        (F.col("lng") - F.lag("lng").over(w)).alias("dlng"),
    ).filter(F.col("dlat").isNotNull())
    km = F.lit(111.32) * F.sqrt(
        F.col("dlat") * F.col("dlat") + F.col("dlng") * F.col("dlng")
    )
    return (
        steps.select("route", km.cast("decimal(38,12)").alias("step_km"))
        .groupBy("route")
        .agg(
            F.count("*").alias("n_steps"),
            F.round(F.sum("step_km").cast("double"), 3).alias("total_km"),
        )
    )


ORACLE_GEO_ROUTE = """
WITH pings AS (
  SELECT user_id % 1000 AS veh,
         'route_' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS VARCHAR) AS route,
         CAST(60.0 AS DOUBLE) + CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 100 AS DOUBLE) / CAST(1000.0 AS DOUBLE) AS lat,
         CAST(24.0 AS DOUBLE) + CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 100 AS DOUBLE) / CAST(1000.0 AS DOUBLE) AS lng,
         ts, event_id
  FROM events
), steps AS (
  SELECT route,
         lat - lag(lat) OVER w AS dlat,
         lng - lag(lng) OVER w AS dlng
  FROM pings WINDOW w AS (PARTITION BY veh ORDER BY ts, event_id)
)
SELECT route, count(*) AS n_steps,
       round(CAST(sum(CAST(CAST(111.32 AS DOUBLE)
                 * sqrt(dlat*dlat + dlng*dlng) AS DECIMAL(38,12))) AS DOUBLE), 3) AS total_km
FROM steps WHERE dlat IS NOT NULL
GROUP BY route
"""


# ---------------------------------------------------------------------------
# rollup_gapfill_interp — linear interpolation over the calendar spine
# ---------------------------------------------------------------------------

def q_rollup_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly average purchase value on a dense calendar spine, holes
    repaired by time-weighted linear interpolation (trailing holes LOCF,
    leading holes NULL) — the series-repair step between LOCF
    (``window_locf_fill``) and a model consuming the series.

    The spine build is the gap-fill contract (1-row span agg, no driver
    action); interpolation adds one key shuffle with two mirrored O(1)
    running frames.  The hourly average is DECIMAL-exact before
    rounding, and the interpolation is a single row-local double
    expression over those identical inputs — engine-reproducible.
    """
    from fluvio_duck_spark.operators.timeseries import (
        calendar_gapfill,
        interp_fill,
    )

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    dense = calendar_gapfill(
        ev,
        "event_type",
        "ts",
        step="1 hour",
        agg={
            "s": F.sum(F.round("value", 6).cast("decimal(18,6)")),
            "n": F.count("*"),
        },
        fill={"s": None, "n": 0},
    )
    hourly = dense.select(
        "event_type",
        "bucket",
        F.when(
            F.col("n") > 0,
            F.round(F.col("s").cast("double") / F.col("n"), 6),
        ).alias("avg_value"),
    )
    out = interp_fill(hourly, "event_type", "bucket", "avg_value")
    return out.select(
        "event_type",
        "bucket",
        F.round("filled", 6).alias("avg_filled"),
        F.col("filled_src").alias("src"),
    )


ORACLE_GAPFILL_INTERP = """
WITH ev AS (
  SELECT * FROM events WHERE event_type = 'purchase'
), obs AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS s, count(*) AS n
  FROM ev GROUP BY 1, 2
), span AS (
  SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
  FROM ev
), spine AS (
  SELECT k.event_type, t.bucket
  FROM (SELECT unnest(generate_series((SELECT lo FROM span),
                                      (SELECT hi FROM span),
                                      INTERVAL 1 HOUR)) AS bucket) t
  CROSS JOIN (SELECT DISTINCT event_type FROM ev) k
), hourly AS (
  SELECT s.event_type, s.bucket,
         CASE WHEN o.n > 0
              THEN round(CAST(o.s AS DOUBLE) / o.n, 6) END AS avg_value
  FROM spine s LEFT JOIN obs o
    ON s.event_type = o.event_type AND s.bucket = o.bucket
), marked AS (
  SELECT event_type, bucket, avg_value,
         CAST(epoch(bucket) AS BIGINT) AS t,
         last_value(avg_value IGNORE NULLS) OVER back AS prev_v,
         last_value(CASE WHEN avg_value IS NOT NULL
                         THEN CAST(epoch(bucket) AS BIGINT) END IGNORE NULLS)
           OVER back AS prev_t,
         first_value(avg_value IGNORE NULLS) OVER fwd AS next_v,
         first_value(CASE WHEN avg_value IS NOT NULL
                          THEN CAST(epoch(bucket) AS BIGINT) END IGNORE NULLS)
           OVER fwd AS next_t
  FROM hourly
  WINDOW back AS (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket,
       round(CASE WHEN avg_value IS NOT NULL THEN avg_value
                  WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                  THEN prev_v + (next_v - prev_v)
                       * (CAST(t - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
                  WHEN prev_v IS NOT NULL THEN prev_v END, 6) AS avg_filled,
       CASE WHEN avg_value IS NOT NULL THEN 'obs'
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interp'
            WHEN prev_v IS NOT NULL THEN 'locf'
            ELSE 'none' END AS src
FROM marked
"""


QUERIES.update(
    {
        "quality_expectations": QuerySpec(
            q_quality_expectations,
            ORACLE_EXPECTATIONS,
            doc="deequ-style constraint suite: completeness/unique/range/accepted/FK in 2 jobs",
        ),
        "ts_autocorr_hourly": QuerySpec(
            q_ts_autocorr_hourly,
            ORACLE_AUTOCORR,
            doc="lag-1..3 autocorrelation of hourly counts per type, exact-integer sums",
        ),
        "ts_anomaly_mad": QuerySpec(
            q_ts_anomaly_mad,
            ORACLE_ANOMALY_MAD,
            doc="robust volume-anomaly hours: |cnt − median| > 3·1.4826·MAD per type",
        ),
        "trend_ols_by_type": QuerySpec(
            q_trend_ols_by_type,
            ORACLE_TREND_OLS,
            doc="per-type OLS drift slope/intercept from one pass of DECIMAL-exact sufficient stats",
        ),
        "basket_copurchase_lift": QuerySpec(
            q_basket_copurchase_lift,
            ORACLE_BASKET_LIFT,
            doc="market-basket pair lift over order baskets; basket-bounded self-join",
        ),
        "geo_route_distance": QuerySpec(
            q_geo_route_distance,
            ORACLE_GEO_ROUTE,
            doc="per-route distance from consecutive VP pings (transit demo domain)",
        ),
        "rollup_gapfill_interp": QuerySpec(
            q_rollup_gapfill_interp,
            ORACLE_GAPFILL_INTERP,
            doc="calendar-spine repair: time-weighted linear interpolation with LOCF tail",
        ),
    }
)


# ---------------------------------------------------------------------------
# privacy_k_anonymity — quasi-identifier re-identification risk report
# ---------------------------------------------------------------------------

def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gating privacy report over customer: for the
    quasi-identifier tuple (nation, market segment), the k-anonymity
    group sizes and the l-diversity of the sensitive account-balance
    band — the checks run before a table leaves a governed zone.

    ONE map-side-combined aggregation over the table (group sizes and
    distinct-band counts per QI cell; the distinct adds its rewrite
    exchange), then a cell-count-sized summary: k = min group size,
    violator cells under k=5, worst (least-diverse) l.  No row ever
    leaves the engine — the report is |QI cells|-bounded.
    """
    cust = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long")
    cells = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(
        F.count("*").alias("group_size"),
        F.countDistinct(band).alias("l_diversity"),
    )
    return cells.agg(
        F.count("*").alias("n_cells"),
        F.min("group_size").alias("k_anonymity"),
        F.count(F.when(F.col("group_size") < 5, 1)).alias("cells_under_k5"),
        F.min("l_diversity").alias("worst_l_diversity"),
        F.sum(
            F.when(F.col("group_size") < 5, F.col("group_size")).otherwise(
                F.lit(0)
            )
        ).alias("rows_at_risk"),
    )


ORACLE_K_ANONYMITY = """
WITH cells AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         count(*) AS group_size,
         count(DISTINCT CAST(floor(c_acctbal / CAST(1000.0 AS DOUBLE)) AS BIGINT))
           AS l_diversity
  FROM customer GROUP BY 1, 2
)
SELECT count(*) AS n_cells,
       min(group_size) AS k_anonymity,
       count(*) FILTER (group_size < 5) AS cells_under_k5,
       min(l_diversity) AS worst_l_diversity,
       CAST(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END) AS BIGINT) AS rows_at_risk
FROM cells
"""


def q_privacy_k_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the release transform the k-anonymity report implies:
    suppress every row whose quasi-identifier cell has fewer than k=5
    members, then PROVE the released table is k-anonymous by re-running
    the audit on the released rows.  This closes the report→release
    loop (the report above only measures): the released table's min
    group size must be ≥ 5 by construction, and the suppressed count
    must equal the report's rows_at_risk.

    Plan: the cell-size table is |QI cells|-bounded, so the suppression
    join is a BROADCAST of the violator cell list against the table —
    one scan, no data-sized shuffle; the re-audit is the same
    map-side-combined aggregation as the report.  At 100 TB the release
    costs one pass.  Output one row: n_input, n_released, n_suppressed,
    released_k (≥ 5), released_cells."""
    cust = load(spark, sf_dir, "customer")
    cells = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(F.count("*").alias("group_size"))
    violators = cells.filter(F.col("group_size") < 5).select(
        "nationkey", "mktsegment"
    )
    released = cust.join(
        F.broadcast(violators),
        (F.col("c_nationkey") == F.col("nationkey"))
        & (F.col("c_mktsegment") == F.col("mktsegment")),
        "left_anti",
    )
    re_audit = released.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("gs")
    )
    total = cust.agg(F.count("*").alias("n_input"))
    summary = re_audit.agg(
        F.sum("gs").cast("long").alias("n_released"),
        F.min("gs").cast("long").alias("released_k"),
        F.count("*").cast("long").alias("released_cells"),
    )
    return (
        total.crossJoin(F.broadcast(summary))
        .select(
            F.col("n_input").cast("long").alias("n_input"),
            "n_released",
            (F.col("n_input") - F.col("n_released"))
            .cast("long").alias("n_suppressed"),
            "released_k",
            "released_cells",
        )
    )


ORACLE_K_SUPPRESSION = """
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS group_size
  FROM customer GROUP BY 1, 2),
released AS (
  SELECT c.* FROM customer c
  JOIN cells g ON g.c_nationkey = c.c_nationkey
              AND g.c_mktsegment = c.c_mktsegment
  WHERE g.group_size >= 5),
re_audit AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS gs
  FROM released GROUP BY 1, 2),
summary AS (
  SELECT CAST(sum(gs) AS BIGINT) AS n_released,
         CAST(min(gs) AS BIGINT) AS released_k,
         CAST(count(*) AS BIGINT) AS released_cells
  FROM re_audit)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_input,
       n_released,
       (SELECT CAST(count(*) AS BIGINT) FROM customer) - n_released
         AS n_suppressed,
       released_k, released_cells
FROM summary
"""


QUERIES.update(
    {
        "privacy_k_anonymity": QuerySpec(
            q_privacy_k_anonymity,
            ORACLE_K_ANONYMITY,
            doc="k-anonymity / l-diversity release gate over quasi-identifier cells",
        ),
        "privacy_k_suppression": QuerySpec(
            q_privacy_k_suppression,
            ORACLE_K_SUPPRESSION,
            doc="execute the k=5 suppression release: broadcast violator-"
                "cell anti-join, re-audit proves released_k >= 5 and "
                "suppressed == rows_at_risk",
        ),
    }
)
