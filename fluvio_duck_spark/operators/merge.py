"""MERGE INTO semantics (upsert + delete apply) as one Catalyst plan.

The reference's surface has no mutation path (its output is COPY TO /
views, reference README.md:149-205); a landed-topic warehouse still needs
the maintenance half of the story: applying a batch of keyed changes —
updates, deletes, inserts — onto a base snapshot, i.e. ANSI
``MERGE INTO base USING changes ON key WHEN MATCHED ... WHEN NOT
MATCHED ...``, the same rewrite Delta/Iceberg execute underneath.

Design for 100 TB — two branches, because join strategy is the whole
game when ``|changes| ≪ |base|``:

* **matched/carry-through branch**: ``base LEFT JOIN changes`` — a LEFT
  join CAN broadcast its build side (full-outer cannot: Spark has no
  broadcast-hash full-outer), so the base table streams map-only past a
  broadcast change set; it is never sorted, shuffled, or rewritten
  wholesale.
* **insert branch**: ``changes LEFT ANTI JOIN base`` on the key — only
  the base's KEY COLUMN shuffles (Catalyst prunes the projection to the
  join key), and AQE turns even that into a broadcast when the change
  side is small.

Row classification is a CASE over the join null-sides (JVM codegen);
the operator is deterministic and partitioning-independent: output rows
depend only on (base row, change row) pairs, never on layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: change-operation codes, Debezium-style
OP_UPSERT = "U"
OP_DELETE = "D"
OP_INSERT = "I"


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "_op",
    set_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Apply ``changes`` (one row per key, ``op_col`` ∈ U/D/I) onto
    ``base``.

    ``set_cols`` maps base column → change column holding its new value
    for U/I rows; base columns not in the mapping keep their old value on
    update and become NULL on insert (unless the change side carries a
    same-named column).

    Semantics (ANSI MERGE):
      * U with a match   → base row with mapped columns replaced (a NULL
        new value means SET NULL — a feed narrowing a value to NULL must
        round-trip)
      * U without match  → inserted (upsert reading of U)
      * D with a match   → row removed;  D without match → no-op
      * I without match  → inserted;     I with a match  → treated as U
        (idempotent re-apply of a change feed never duplicates keys)
    """
    set_cols = set_cols or {}
    change_names = set(changes.columns) - {op_col}
    op = F.col(f"c.{op_col}")
    has_change = F.col(f"c.{key}").isNotNull()

    def new_value(name: str) -> Column | None:
        new_name = set_cols.get(name, name if name in change_names else None)
        return None if new_name is None else F.col(f"c.{new_name}")

    b = base.alias("b")
    c = changes.alias("c")

    # matched / carry-through branch: LEFT join — broadcastable build
    # side (AQE sizes it at runtime; callers may F.broadcast the changes
    # frame themselves when its bound is known a priori)
    matched = b.join(
        c, F.col(f"b.{key}") == F.col(f"c.{key}"), "left"
    ).filter(~has_change | (op != OP_DELETE))
    m_cols = [F.col(f"b.{key}").alias(key)]
    for name in base.columns:
        if name == key:
            continue
        nv = new_value(name)
        if nv is None:
            m_cols.append(F.col(f"b.{name}").alias(name))
        else:
            m_cols.append(
                F.when(has_change & (op != OP_DELETE), nv)
                .otherwise(F.col(f"b.{name}"))
                .alias(name)
            )
    kept = matched.select(*m_cols)

    # insert branch: changes with no base match — only base's key column
    # reaches this join (projection pruning)
    unmatched = c.join(
        b.select(F.col(f"b.{key}")),
        F.col(f"c.{key}") == F.col(f"b.{key}"),
        "left_anti",
    ).filter(op != OP_DELETE)
    i_cols = [F.col(f"c.{key}").alias(key)]
    for name in base.columns:
        if name == key:
            continue
        nv = new_value(name)
        i_cols.append(
            (F.lit(None) if nv is None else nv)
            .cast(base.schema[name].dataType)
            .alias(name)
        )
    inserted = unmatched.select(*i_cols)

    return kept.unionAll(inserted)
