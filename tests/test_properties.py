"""Property-based tests (hypothesis) for the pure-Python surfaces: the
option parser round-trips and the offset algebra's invariants.  These are
driver-side only — no SparkSession — so they run in milliseconds and can
explore thousands of cases."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluvio_duck_spark.options import (
    ConsumeOptError,
    parse_consume_opts,
)

TOPIC = st.sampled_from(["events", "clicks", "transit-topic"])
NONNEG = st.integers(min_value=0, max_value=2**40)


@given(topic=TOPIC, n=NONNEG)
def test_head_parses_to_absolute_start(topic, n):
    opts = parse_consume_opts(f"{topic} -H {n}")
    start = opts.calculate_start()
    assert (start.kind, start.n) == ("head", n)


@given(topic=TOPIC, n=st.integers(min_value=1, max_value=2**40))
def test_tail_round_trip(topic, n):
    opts = parse_consume_opts([topic, "-T", str(n)])
    start = opts.calculate_start()
    assert (start.kind, start.n) == ("tail", n)


@given(topic=TOPIC, s=NONNEG, e=NONNEG)
def test_start_end_crossing_always_rejected(topic, s, e):
    """--end < --start must raise, any other combination must parse."""
    argv = [topic, "--start", str(s), "--end", str(e)]
    if e < s:
        with pytest.raises(ConsumeOptError):
            parse_consume_opts(argv)
    else:
        opts = parse_consume_opts(argv)
        assert opts.calculate_start().n == s
        assert opts.end == e


@given(
    topic=TOPIC,
    flags=st.lists(
        st.sampled_from(["-B", "-H 5", "-T 5", "--start 5"]),
        min_size=2,
        max_size=4,
        unique=True,
    ),
)
def test_position_flags_pairwise_exclusive(topic, flags):
    with pytest.raises(ConsumeOptError):
        parse_consume_opts(f"{topic} {' '.join(flags)}")


_IDENT = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)


@given(
    name=_IDENT,
    code=st.sampled_from(["i", "l", "f", "d", "s", "t"]),
    path=st.lists(_IDENT, min_size=1, max_size=3).map(".".join),
)
def test_column_mapping_round_trip(name, code, path):
    from fluvio_duck_spark.mappings import TYPE_CODES, parse_column_spec

    opts = parse_consume_opts(["events", "-c", f"{name}:{code}={path}"])
    ((spec, got_path),) = opts.columns
    assert got_path == path
    got_name, got_type = parse_column_spec(spec)
    assert got_name == name
    assert got_type == TYPE_CODES[code]


@given(name=_IDENT, path=_IDENT)
def test_column_mapping_unknown_code_is_varchar(name, path):
    """Reference parity: any unknown type code falls back to VARCHAR
    (reference src/consume.rs:235-240)."""
    from pyspark.sql import types as T

    from fluvio_duck_spark.mappings import parse_column_spec

    opts = parse_consume_opts(["events", "-c", f"{name}:zz={path}"])
    ((spec, _),) = opts.columns
    assert parse_column_spec(spec)[1] == T.StringType()


@given(rows=NONNEG)
def test_rows_budget_preserved(rows):
    assert parse_consume_opts(["events", "--rows", str(rows)]).rows == rows


@given(data=st.data())
def test_parse_never_crashes_on_flag_soup(data):
    """Fuzzing the parser with arbitrary flag combinations must either
    parse or raise ConsumeOptError — never any other exception type."""
    parts = data.draw(
        st.lists(
            st.sampled_from(
                ["events", "-B", "-H", "-T", "--start", "--end", "--rows",
                 "-c", "k:i=k", "7", "-p", "-A", "-d", "--maxbytes", "100",
                 "--isolation", "read_committed", "--smartmodule", "jolt",
                 "-e", "a=b", "--bogus"]
            ),
            min_size=1,
            max_size=8,
        )
    )
    try:
        parse_consume_opts(parts)
    except ConsumeOptError:
        pass


@settings(max_examples=30, deadline=None)
@given(
    toks=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=30),
    k=st.integers(min_value=2, max_value=6),
    w=st.integers(min_value=2, max_value=5),
)
def test_winnow_selection_is_subset_of_gram_hashes(toks, k, w):
    """Pure-python re-implementation check of the winnowing invariant:
    every selected fingerprint is the min of some w-window, and the
    number of selected fingerprints is <= number of windows."""
    import hashlib

    text = " ".join(toks)
    grams = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ] if len(toks) >= k else []
    if not grams:
        expected: set[str] = set()
    elif len(grams) < w:
        expected = {min(grams)}
    else:
        expected = {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}

    # compare against the Spark expression evaluated locally via pyspark's
    # expression-on-literal path (needs a session; reuse the shared one)
    from fluvio_duck_spark.functions.text import winnow_fingerprints
    from fluvio_duck_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("props", master="local[2]", shuffle_partitions=2)
    row = (
        spark.range(1)
        .select(winnow_fingerprints(F.lit(text), k=k, w=w).alias("fps"))
        .collect()[0]
    )
    assert set(row.fps) == expected
