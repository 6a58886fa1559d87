"""SURVEY §1.4 quirk-divergence tests: each reference bug/quirk we chose
to FIX, asserted explicitly so the divergence is documented and pinned.
One test per §1.4 item."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluvio_duck_spark.options import ConsumeOptError, parse_consume_opts
from fluvio_duck_spark.sources.consume import fluvio_consume


def test_quirk_1_offset_is_long_not_int32(spark, sf_dir):
    """§1.4.1: reference truncates offset i64→u32→int32 (src/consume.rs:272);
    we keep LongType so logs past 2^31 records work."""
    df = fluvio_consume(spark, "events -A -B --rows 5", sf_dir=sf_dir)
    assert df.schema["offset"].dataType == T.LongType()


def test_quirk_2_partition_flags_honored(spark, sf_dir):
    """§1.4.2: reference hard-codes partition 0 despite parsing -p/-A
    (src/consume.rs:179); we filter by the requested partition."""
    p2 = fluvio_consume(spark, "events -p 2 -B --rows 100000", sf_dir=sf_dir)
    all_p = fluvio_consume(spark, "events -A -B --rows 100000", sf_dir=sf_dir)
    assert 0 < p2.count() < all_p.count()
    # every returned record is from the requested partition: re-derive it
    opts = parse_consume_opts("events -p 2 -B")
    assert opts.partition == 2


def test_quirk_3_json_null_becomes_sql_null(spark):
    """§1.4.3: reference writes 0 / 0.0 / the 4-char string "null" for JSON
    null depending on declared type (src/consume.rs:402-428) and the jql
    error message for missing paths (:330-336); we emit SQL NULL."""
    from fluvio_duck_spark.mappings import mapped_column

    df = spark.createDataFrame(
        [('{"a": null}',), ('{"b": 1}',), ("not json",)], "value string"
    )
    for spec in ["x:i", "x:d", "x:s"]:
        vals = [r.x for r in df.select(mapped_column(F.col("value"), spec, "a")).collect()]
        assert vals == [None, None, None], spec


def test_quirk_4_end_is_enforced_inclusive(spark, sf_dir):
    """§1.4.4: reference parses --end but never truncates the stream
    (src/consume.rs:503-505); we enforce offset <= end (inclusive)."""
    df = fluvio_consume(spark, "events -A --start 10 --end 19", sf_dir=sf_dir)
    offsets = sorted(r.offset for r in df.collect())
    assert offsets == list(range(10, 20))


def test_quirk_5_default_is_bounded_dash_d_is_continuous():
    """§1.4.5: flag help text is inverted in the reference; the behavior
    (default bounded, -d → continuous) is what we model."""
    assert parse_consume_opts("events").continuous is False
    assert parse_consume_opts("events -d").continuous is True


def test_quirk_6_bad_rfc3339_timestamp_is_null(spark):
    """§1.4.6: reference leaves the vector cell uninitialized on RFC-3339
    parse failure (src/consume.rs:351-354); we emit NULL."""
    from fluvio_duck_spark.mappings import mapped_column

    df = spark.createDataFrame(
        [('{"t": "2024-01-02T03:04:05Z"}',), ('{"t": "not-a-time"}',)],
        "value string",
    )
    vals = [r.ts for r in df.select(mapped_column(F.col("value"), "ts:t", "t")).collect()]
    assert vals[0] is not None and vals[1] is None


def test_quirk_7_l_code_is_long_not_uinteger(spark):
    """§1.4.7: reference declares UINTEGER (32-bit) for code `l` but
    writes u64 — memory corruption; we declare LongType."""
    from fluvio_duck_spark.mappings import parse_column_spec

    assert parse_column_spec("n:l")[1] == T.LongType()
    # and a value beyond u32 range survives
    df = spark.createDataFrame([('{"n": 5000000000}',)], "value string")
    from fluvio_duck_spark.mappings import mapped_column

    assert df.select(mapped_column(F.col("value"), "n:l", "n")).collect()[0].n == 5_000_000_000


def test_quirk_8_maxbytes_is_transport_surface_noop(spark, sf_dir):
    """§1.4.8: --maxbytes is a fetch-size knob, not query semantics —
    accepted, no effect on results."""
    a = fluvio_consume(spark, "events -A -B --rows 50", sf_dir=sf_dir).collect()
    b = fluvio_consume(spark, "events -A -B --rows 50 --maxbytes 1", sf_dir=sf_dir).collect()
    assert a == b


def test_crossing_offsets_error_matches_reference_shape():
    """Reference validates end >= start at bind time
    (src/consume.rs:580-590); same error surface here."""
    with pytest.raises(ConsumeOptError, match="greater than or equal"):
        parse_consume_opts("events --start 10 --end 3")


def test_dash_d_batch_is_bounded_noop(spark, sf_dir):
    """-d over the bounded stand-in returns the same rows as the bounded
    read (the 'wait for more' tail of continuous mode has nothing to wait
    for on a static log); unbounded mode is fluvio_consume_stream."""
    a = fluvio_consume(spark, "events -A -B --rows 40", sf_dir=sf_dir).collect()
    b = fluvio_consume(spark, "events -A -B --rows 40 -d", sf_dir=sf_dir).collect()
    assert a == b
