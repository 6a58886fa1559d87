"""Portable power iteration: the dominant principal direction of the
embedding corpus, with every float ENGINE-REPRODUCIBLE — the spectral
member of the portable-twin family (operators/kmeans.py, operators/pq.py
precedents).

Why a pipeline wants it: the top component of an embedding corpus is the
anisotropy direction (mean-offset + dominant variance); whitening it out
improves retrieval, and its eigenvalue share is the collapse metric a
training run monitors.  Exact PCA needs only matvecs against the data —
v ← Σ_i x_i·(x_i·v) — so each power-iteration step is ONE scan + a
64-value integer-summed aggregate: the same cost shape as a k-means
iteration, with k×d driver state replaced by a d-vector.

Determinism contract — INTEGER FIXED-POINT, learned the hard way:
* DOUBLE folds are out: engine-internal list folds reassociate (DuckDB
  ``list_aggregate('sum')`` diverges from a sequential fold in the last
  ulp — measured at sf0.1).
* DECIMAL casts of arbitrary doubles are ALSO out: Spark quantizes a
  double via its shortest decimal repr (``BigDecimal.valueOf``), DuckDB
  via multiply-and-round — they disagree on ~1-in-40 K values at scale
  12 (measured: 8 of 320 K at sf0.1).
* What IS cross-engine exact: ``round(x * 1e12)`` to an integer.  The
  scaled product is the same double on both engines (one correctly-
  rounded multiply); rounding a double to an INTEGER is
  representation-independent (a non-tie double and its shortest repr
  always sit on the same side of a representable half-integer, and both
  engines break exact .5 ties away from zero).  Every cross-engine
  reduction here is therefore a SUM of BIGINT fixed-point values —
  exact, order-free, partitioning-independent.
* start vector = 1/8 per dimension (1/√64 — exactly representable);
  FIXED iteration count (no tolerance exit); √ and divisions are
  correctly-rounded doubles of identical inputs.

At 100 TB: per iteration one corpus scan + a 64-value (one partial
state per task) shuffle; driver state is one d-vector.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
SCALE = 1e12  # fixed-point scale: 12 decimal digits


def _fix(col):
    """double → BIGINT fixed-point at 1e-12 (cross-engine exact)."""
    return F.round(col * F.lit(SCALE), 0).cast("long")


# SQL spelling of F.lit(SCALE): repr('1000000000000.0') parses back to
# the identical IEEE double (operators/kmeans.py::_dist2_sql contract).
_SCALE_SQL = f"CAST('{SCALE!r}' AS DOUBLE)"


def _fix_sql(col_sql: str) -> str:
    """The SQL spelling of :func:`_fix` — identical expression tree."""
    return f"CAST(round(({col_sql}) * {_SCALE_SQL}, 0) AS BIGINT)"


def _dot_literal_sql(v_sql: str, vec: list[float]) -> str:
    """The SQL spelling of :func:`_dot_literal`: the d-term literal dot
    tree as ONE parseable string instead of ~4·d py4j round trips of
    Column construction (double literals round-trip through ``repr``)."""
    lits = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
    return (
        f"(CAST(aggregate(zip_with({v_sql}, array({lits}), "
        f"(x, y) -> {_fix_sql('x * y')}), CAST(0 AS BIGINT), "
        f"(acc, t) -> acc + t) AS DOUBLE) / {_SCALE_SQL})"
    )


def _pyfix(x: float) -> int:
    """The driver-side twin of ``_fix``/SQL ``round(x*1e12)``: half-away
    ties on the exact double value."""
    return int(
        Decimal(x * SCALE).to_integral_value(rounding=ROUND_HALF_UP)
    )


def _dot_literal(v, vec: list[float]):
    """Order-independent dot product of array column ``v`` with a
    literal vector: per-element products in BIGINT fixed-point, summed
    exactly, then back to double."""
    lits = F.array(*[F.lit(c) for c in vec])
    prods = F.zip_with(v, lits, lambda a, b: _fix(a * b))
    return (
        F.aggregate(prods, F.lit(0).cast("long"), lambda a, x: a + x)
        .cast("double")
        / F.lit(SCALE)
    )


def power_iteration_portable(
    df: DataFrame,
    iters: int = 3,
    vec_col: str = "embedding",
) -> tuple[list[float], float]:
    """Dominant eigenvector of Xᵀ X (uncentered — the anisotropy
    direction incl. the mean offset) by ``iters`` fixed power steps.
    Returns (unit vector, eigenvalue estimate = final pre-normalization
    norm).  Driver state: one d-vector per step."""
    emb = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    v = [0.125] * DIM  # 1/sqrt(64), exactly representable
    eig = 0.0
    for _ in range(iters):
        # project the per-row dot once (the oracle's d{t} CTE does the
        # same), then 64 small fixed-point sums — identical per-row
        # doubles, but the expression tree shrinks from 64 inlined
        # d-term dots to one, and each piece parses as SQL text instead
        # of ~500 py4j round trips of Column construction per iteration
        # (see kmeans.py::_argmin_cell)
        proj = emb.select("v", F.expr(_dot_literal_sql("v", v)).alias("d"))
        aggs = [
            F.expr(
                f"sum({_fix_sql(f'element_at(v, {j + 1}) * d')})"
            ).alias(f"w{j}")
            for j in range(DIM)
        ]
        row = proj.agg(*aggs).collect()[0]
        # w_j: float(int)/1e12 — both steps correctly rounded, matching
        # the engine's CAST(SUM AS DOUBLE)/1e12
        w = [float(int(row[f"w{j}"])) / SCALE for j in range(DIM)]
        n2_fix = 0
        for x in w:
            n2_fix += _pyfix(x * x)
        eig = math.sqrt(float(n2_fix) / SCALE)
        v = [x / eig for x in w]
    return v, eig


def power_iteration_oracle_sql(iters: int = 3, dim: int = DIM) -> str:
    """The identical fit unrolled as DuckDB SQL: the same fixed-point
    reductions (round(x*1e12) → BIGINT sums), the same normalization —
    then the (dim, component, eigenvalue) projection the Spark query
    emits."""
    parts = ["""WITH emb AS MATERIALIZED (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings)"""]
    prev = None  # None → literal 0.125 start vector
    for t in range(1, iters + 1):
        if prev is None:
            vt = "[" + ", ".join(["0.125"] * dim) + "]::DOUBLE[]"
        else:
            vt = "list_value(" + ", ".join(
                f"(SELECT c{i} FROM {prev})" for i in range(dim)
            ) + ")"
        sums = ",\n         ".join(
            f"CAST(SUM(CAST(round(v[{j + 1}] * dt * 1e12) AS BIGINT))"
            f" AS DOUBLE) / 1e12 AS w{j}"
            for j in range(dim)
        )
        wl = "list_value(" + ", ".join(f"w{j}" for j in range(dim)) + ")"
        comps = ", ".join(f"wl[{j + 1}] / eig AS c{j}" for j in range(dim))
        parts.append(f"""v{t} AS (SELECT {vt} AS vt),
d{t} AS (
  SELECT v, CAST(list_aggregate(list_transform(range(1, {dim} + 1),
                i -> CAST(round(v[i] * vt[i] * 1e12) AS BIGINT)), 'sum')
            AS DOUBLE) / 1e12 AS dt
  FROM emb, v{t}),
w{t} AS MATERIALIZED (
  SELECT {sums}
  FROM d{t}),
n{t} AS (SELECT wl,
                sqrt(CAST(list_aggregate(list_transform(range(1, {dim} + 1),
                     j -> CAST(round(wl[j] * wl[j] * 1e12) AS BIGINT)), 'sum')
                     AS DOUBLE) / 1e12) AS eig
         FROM (SELECT {wl} AS wl FROM w{t}) z),
it{t} AS (SELECT {comps}, eig FROM n{t})""")
        prev = f"it{t}"
    cols = " UNION ALL ".join(
        f"SELECT {j} AS dim, c{j} AS component, eig AS eigenvalue FROM {prev}"
        for j in range(dim)
    )
    return ",\n".join(parts) + f"\n{cols}\n"
