"""Column mapping: ``-c name[:code]=json.path`` → typed Spark columns.

The reference implements this as per-record mapper objects writing into
DuckDB vectors (``MappingTrait`` dispatch, reference src/consume.rs:248-258;
``JqlMapper`` JSON-path walk + type dispatch :311-443; column-spec parser
:223-245; default schema synthesis :607-637).  Here each mapping becomes one
Catalyst expression — ``get_json_object`` plus a cast — so extraction stays
JVM-side inside whole-stage codegen; no Python runs per record.

Type codes (reference src/consume.rs:227-241):
  ``i``→int, ``l``→long (reference declares UINTEGER but writes u64 —
  width bug, SURVEY §1.4.7 — we widen), ``f``→float, ``d``→double,
  ``t``→timestamp (RFC-3339 input), ``s`` or anything else→string.

Documented divergences from the reference (SURVEY §1.4):
  * JSON ``null`` / missing path / parse failure → SQL NULL (the reference
    writes 0 / 0.0 / the literal string "null" / the jql error message).
  * default ``offset`` column is LONG (the reference truncates i64→u32).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# type-code → Spark type, mirroring reference src/consume.rs:227-241
TYPE_CODES: dict[str, T.DataType] = {
    "i": T.IntegerType(),
    "l": T.LongType(),
    "f": T.FloatType(),
    "d": T.DoubleType(),
    "t": T.TimestampType(),
    "s": T.StringType(),
}

#: Names of the default (no ``-c``) output columns — reference
#: src/consume.rs:607-637.
DEFAULT_COLUMN_NAMES = ("offset", "timestamp", "value")


def parse_column_spec(name_spec: str) -> tuple[str, T.DataType]:
    """``"speed:d"`` → ``("speed", DoubleType)``; unknown/missing code →
    string (reference src/consume.rs:237-240 falls through to VARCHAR)."""
    name, sep, code = name_spec.partition(":")
    if not sep:
        return name, T.StringType()
    return name, TYPE_CODES.get(code, T.StringType())


def json_path_expr(path: str) -> str:
    """A jql-style dot path (``contact.ph``) → a JsonPath (``$.contact.ph``).

    The reference walks the payload with the jql crate
    (reference src/consume.rs:329-336); ``get_json_object`` gives the same
    leaf-extraction semantics, including re-serializing non-leaf values to
    JSON text (reference src/consume.rs:429-438)."""
    if path.startswith("$"):
        return path
    return "$." + path


def mapped_column(value_col: Column, name_spec: str, path: str) -> Column:
    """Build the typed extraction expression for one ``-c`` mapping."""
    name, dtype = parse_column_spec(name_spec)
    raw = F.get_json_object(value_col, json_path_expr(path))
    # try_cast everywhere: malformed input → NULL, not an ANSI runtime error.
    # For `t` columns this matches RFC-3339 parsing with NULL on failure
    # (reference src/consume.rs:346-354 logs and skips — SURVEY §1.4.6);
    # for numeric codes it gives SQL NULL where the reference writes 0 /
    # "null" / an error message (SURVEY §1.4.3, documented divergence).
    return raw.try_cast(dtype).alias(name)


def mapped_columns(columns: list[tuple[str, str]], value_col: Column) -> list[Column]:
    return [mapped_column(value_col, name_spec, path) for name_spec, path in columns]


def default_columns() -> list[Column]:
    """The default ``(offset, timestamp, value)`` projection over the
    record-log columns (reference src/consume.rs:607-637).

    ``offset`` stays LONG (divergence: reference truncates to int32 via
    ``record.offset() as u32``, src/consume.rs:272)."""
    return [
        F.col("offset").cast(T.LongType()).alias("offset"),
        F.col("timestamp").alias("timestamp"),
        F.col("value").cast(T.StringType()).alias("value"),
    ]


def projection(columns: list[tuple[str, str]]) -> list[Column]:
    """Full output projection: user mappings if any ``-c`` was given, else
    the default three columns."""
    if columns:
        return mapped_columns(columns, F.col("value"))
    return default_columns()


def infer_value_schema(df, value_col: str = "value", sample: int = 1000):
    """Schema inference over the JSON payload column — the extension
    SURVEY §1.2 allows beyond the reference's explicit-mappings-only
    surface (the reference never infers; fidelity mode is ``-c`` flags).

    Inference is inherently a bounded-sample, driver-side decision: we
    read ``sample`` payloads and let Spark's JSON reader unify their
    types.  The *application* of the schema (``from_json``) is still a
    distributed JVM expression — only the tiny sample crosses to the
    driver, never the data."""
    spark = df.sparkSession
    strings = df.select(value_col).limit(sample).rdd.map(lambda r: r[0] or "{}")
    return spark.read.json(strings).schema


def expand_value(df, value_col: str = "value", schema=None, sample: int = 1000):
    """``value`` JSON text → one typed column per inferred/given field,
    keeping all non-value columns.  ``from_json`` + star-expansion runs
    in codegen; malformed payloads yield NULL fields (PERMISSIVE)."""
    schema = schema or infer_value_schema(df, value_col, sample)
    others = [c for c in df.columns if c != value_col]
    return df.select(
        *others, F.from_json(F.col(value_col), schema).alias("__j")
    ).select(*others, "__j.*")
