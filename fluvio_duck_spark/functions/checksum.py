"""Portable order-insensitive table checksums for cross-engine audits.

The migration/ingest-validation primitive this whole repo is implicitly
built on, packaged as an operator: a checksum over a table's rows that
(a) ignores row order and partitioning, (b) is computable bit-identically
by ANY engine with md5/ascii/substr — so a Spark cluster and a DuckDB
warehouse can each hash their copy of a 100 TB table and compare ONE
number, and (c) flips on any single changed/missing/duplicated row.

Construction: per row, md5 of a '|'-joined canonical string of the
selected columns; the 32 hex chars fold to an integer as
``Σ ascii(char_i) · w_i`` with fixed odd weights (i·2654435761 mod
1000003) — max ≈ 3.9e9 per row, so a DECIMAL(38,0) sum stays exact past
10^27 rows.  Restrict input columns to integers/strings (their canonical
string form is engine-independent; float/timestamp formatting is not —
cast or round them to strings explicitly first if needed).

The same fold is emitted as SQL text (``checksum_sql``) from the same
weight table, so the two engines run literally the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-position weights for the 32 md5 hex chars — fixed forever (a
#: checksum is only useful if every engine/version agrees on it)
_WEIGHTS = [(i * 2654435761) % 1000003 for i in range(1, 33)]


def row_checksum(cols: list[str]) -> Column:
    """BIGINT fold of md5(col1|col2|...): order-sensitive per row,
    engine-portable.  NULLs encode as the literal string ``\\N`` (so NULL
    and '' differ)."""
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    )
    h = F.md5(canon)
    term = None
    for i, w in enumerate(_WEIGHTS, start=1):
        t = F.ascii(F.substring(h, i, 1)).cast("long") * F.lit(w)
        term = t if term is None else term + t
    return term


def table_checksum(df: DataFrame, cols: list[str], label: str) -> DataFrame:
    """One row: (table, n_rows, checksum) — the order/partitioning-
    insensitive audit triple."""
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum(row_checksum(cols).cast("decimal(38,0)"))
        .cast("long")
        .alias("checksum"),
    ).select(F.lit(label).alias("table_name"), "n_rows", "checksum")


def checksum_sql(table: str, cols: list[str], label: str | None = None) -> str:
    """The identical fold as ANSI SQL (DuckDB-ready) — built from the
    same weight table so both engines run the same arithmetic.  ``table``
    may be a parenthesized subquery; ``label`` overrides the emitted
    table_name (defaults to ``table``)."""
    canon = ", ".join(f"COALESCE(CAST({c} AS VARCHAR), '\\N')" for c in cols)
    terms = " + ".join(
        f"CAST(ascii(substr(h, {i}, 1)) AS BIGINT) * {w}"
        for i, w in enumerate(_WEIGHTS, start=1)
    )
    return f"""
SELECT '{label or table}' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM(CAST({terms} AS DECIMAL(38,0))) AS BIGINT) AS checksum
FROM (SELECT md5(concat_ws('|', {canon})) AS h FROM {table})
"""
