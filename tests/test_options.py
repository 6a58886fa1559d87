"""Option-parser tests mirroring the reference's clap surface
(reference src/consume.rs:466-571) — FIXTURES.md §5 case table."""

from __future__ import annotations

import pytest

from fluvio_duck_spark.options import (
    ConsumeOptError,
    StartPosition,
    parse_consume_opts,
)


def test_defaults():
    opts = parse_consume_opts("helsinki")
    assert opts.topic == "helsinki"
    assert opts.partition == 0
    assert not opts.all_partitions
    assert opts.rows == 1000  # reference src/consume.rs:500-501
    assert not opts.continuous  # default bounded (SURVEY §1.4.5)
    assert opts.calculate_start() == StartPosition("end")


def test_positions():
    assert parse_consume_opts("t -B").calculate_start() == StartPosition("beginning")
    assert parse_consume_opts("t -H 7").calculate_start() == StartPosition("head", 7)
    assert parse_consume_opts("t -T 5").calculate_start() == StartPosition("tail", 5)
    assert parse_consume_opts("t --start 42").calculate_start() == StartPosition("start", 42)


@pytest.mark.parametrize(
    "flags",
    ["-B -H 1", "-B -T 1", "-B --start 1", "-H 1 -T 1", "-H 1 --start 2", "-T 1 --start 2"],
)
def test_position_flags_mutually_exclusive(flags):
    # reference conflicts_with_all on beginning/head/tail/start (src/consume.rs:484-498)
    with pytest.raises(ConsumeOptError):
        parse_consume_opts(f"t {flags}")


def test_crossing_offsets_rejected():
    # reference src/consume.rs:580-590
    with pytest.raises(ConsumeOptError, match="end-offset must be greater"):
        parse_consume_opts("t --start 10 --end 5")
    # equal start/end is allowed (end inclusive)
    parse_consume_opts("t --start 5 --end 5")


def test_partition_conflicts_with_all_partitions():
    with pytest.raises(ConsumeOptError):
        parse_consume_opts("t -p 1 -A")
    assert parse_consume_opts("t -A").all_partitions
    assert parse_consume_opts("t -p 3").partition == 3


def test_params_require_smartmodule():
    # reference: -e requires smartmodule_group (src/consume.rs:518-527)
    with pytest.raises(ConsumeOptError, match="requires a smartmodule"):
        parse_consume_opts("t -e k=v")
    opts = parse_consume_opts("t --smartmodule sql-filter -e k=v -e x=1")
    assert opts.params == [("k", "v"), ("x", "1")]


def test_aggregate_initial_requires_smartmodule():
    with pytest.raises(ConsumeOptError, match="requires an aggregate"):
        parse_consume_opts("t --aggregate-initial 0")
    assert parse_consume_opts("t --sm agg --aggregate-initial 0").aggregate_initial == "0"


def test_transform_conflicts():
    # reference: --transform conflicts with smartmodule group and
    # --transforms-file (src/consume.rs:559)
    with pytest.raises(ConsumeOptError):
        parse_consume_opts("t --transform {} --transforms-file f.yaml")
    with pytest.raises(ConsumeOptError):
        parse_consume_opts("t --transform {} --smartmodule m")
    with pytest.raises(ConsumeOptError):
        parse_consume_opts("t --transforms-file f.yaml --smartmodule m")
    with pytest.raises(ConsumeOptError):
        parse_consume_opts("t --smartmodule m --smartmodule-path p.wasm")


def test_help_propagates_usage_text():
    # reference src/consume.rs:574-578 + README.md:114-119
    with pytest.raises(ConsumeOptError) as exc:
        parse_consume_opts("--help")
    assert "usage:" in str(exc.value).lower()
    assert "--rows" in str(exc.value)


def test_column_mappings_parse():
    opts = parse_consume_opts("t -c ph=contact.ph -c lat:d=lat -c veh:i=vehicle")
    assert opts.columns == [("ph", "contact.ph"), ("lat:d", "lat"), ("veh:i", "vehicle")]


def test_bad_key_val_rejected():
    with pytest.raises(ConsumeOptError, match="no `=`"):
        parse_consume_opts("t -c novalue")


def test_isolation_values():
    assert parse_consume_opts("t --isolation read_committed").isolation == "read_committed"
    assert parse_consume_opts("t --isolation ReadUncommitted").isolation == "read_uncommitted"
    with pytest.raises(ConsumeOptError):
        parse_consume_opts("t --isolation bogus")


def test_misc_flags():
    opts = parse_consume_opts("t -d -b 1048576 --rows 99 --end 5")
    assert opts.continuous
    assert opts.max_bytes == 1048576
    assert opts.rows == 99
    assert opts.end == 5


def test_no_duplicate_query_registrations_within_modules():
    """all_queries() raises on cross-module duplicates, but a repeated
    name WITHIN one module silently overwrites the earlier QuerySpec
    (dict update) — this pins source-level uniqueness so a re-registered
    name can never shadow an existing query again."""
    import re
    from collections import Counter
    from pathlib import Path

    qdir = Path(__file__).resolve().parents[1] / "fluvio_duck_spark" / "queries"
    for mod in qdir.glob("*.py"):
        names = re.findall(
            r'^    "([a-z0-9_]+)": QuerySpec', mod.read_text(), re.M
        )
        dups = [n for n, c in Counter(names).items() if c > 1]
        assert not dups, f"{mod.name}: duplicate registrations {dups}"


def test_wasm_path_rejection_contract(spark):
    """CONNECTOR.md §wasm: a .wasm smartmodule path parses (surface
    parity) but applying the chain raises the documented TransformError
    naming both escape hatches — never a silent skip."""
    import pytest

    from fluvio_duck_spark.options import parse_consume_opts
    from fluvio_duck_spark.transforms import (
        TransformError,
        apply_transform_chain,
        load_transform_chain,
    )

    opts = parse_consume_opts("events -B --smartmodule-path mod.wasm")
    assert opts.smartmodule_path == "mod.wasm"
    chain = load_transform_chain(opts)
    assert len(chain) == 1 and chain[0].uses == "mod.wasm"
    df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS value")
    with pytest.raises(TransformError, match="wasmtime|register_smartmodule"):
        apply_transform_chain(df, chain)
