"""Deterministic floating aggregates via exact DECIMAL accumulation.

Summing doubles is order-dependent; on a 1000-executor cluster the partial
aggregation order is nondeterministic run-to-run, so a double SUM is not
reproducible — and cannot be hash-compared against any oracle.  The fix
costs nothing semantically for money-like columns: cast to DECIMAL, sum
exactly (Spark widens precision, overflow-checked), cast the final value
to double.  Identical bits on every run and on every engine.

The reference inherits this determinism from DuckDB's HUGEINT/decimal
aggregates (e.g. the sum(leo) README demo returns int128); this module is
the Spark-side counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact sum of a float column: decimal-accumulate, emit double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum divided by count in double
    arithmetic (one double division — identical across engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def dmul(a: Column, b: Column, scale_a: int = 2, scale_b: int = 4) -> Column:
    """Exact product of two float columns for use under dsum — e.g.
    ``l_extendedprice * (1 - l_discount)`` with money/rate scales."""
    return a.cast(f"decimal(18,{scale_a})") * b.cast(f"decimal(9,{scale_b})")


def r12(col: Column) -> Column:
    """Round to 12 decimals as ``floor(x*1e12 + 0.5)/1e12`` — spelled out
    in IEEE double ops so Spark and any SQL oracle compute bit-identical
    results (engine-native ``round()`` differs in the last ulp between
    BigDecimal-based and multiply-based implementations, which iterated
    fixpoints amplify into visible divergence).  DOMAIN: |x| must stay
    below ~9.2e6 — ``floor`` on a double yields LongType in Spark and
    saturates at 2^63-1 where DuckDB's floor stays DOUBLE, so the two
    engines diverge past x*1e12 ≈ 2^63.  Normalize the iterated quantity
    into O(1) range first (PageRank values are probabilities; the
    Bradley–Terry fit divides its win/game counts by the total game
    count — the MM fixpoint is scale-invariant, so normalization changes
    nothing but the safe range)."""
    return F.floor(col * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)
