"""MERGE INTO semantics (upsert + delete apply) as one Catalyst plan.

The reference's surface has no mutation path (its output is COPY TO /
views, reference README.md:149-205); a landed-topic warehouse still needs
the maintenance half of the story: applying a batch of keyed changes —
updates, deletes, inserts — onto a base snapshot, i.e. ANSI
``MERGE INTO base USING changes ON key WHEN MATCHED ... WHEN NOT
MATCHED ...`` expressed as a full-outer join + row classification, the
same rewrite Delta/Iceberg execute underneath.

Design for 100 TB:

* ONE full-outer join on the key is the whole plan — the base table is
  never sorted or rewritten wholesale, and when ``|changes| ≪ |base|``
  AQE turns the join into a broadcast, so the base scan is map-only.
* Classification is a CASE over the join's null-sides (JVM codegen):
  matched+U → updated row, matched+D → dropped, unmatched-change+I →
  inserted, unmatched-base → carried through.
* The operator is deterministic and partitioning-independent: output
  rows depend only on (base row, change row) pairs, never on layout.
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
      * U with a match   → base row with mapped columns replaced
      * U without match  → inserted (upsert reading of U)
      * D with a match   → row removed;  D without match → no-op
      * I without match  → inserted;     I with a match  → treated as U
        (idempotent re-apply of a change feed never duplicates keys)
    """
    set_cols = set_cols or {}
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")

    has_base = F.col(f"b.{key}").isNotNull()
    has_change = F.col(f"c.{key}").isNotNull()
    op = F.col(f"c.{op_col}")

    keep = has_base & (~has_change | (op != OP_DELETE))
    insert = ~has_base & has_change & (op != OP_DELETE)
    survives = keep | insert

    change_names = set(changes.columns) - {op_col}

    def out_col(name: str) -> Column:
        new_name = set_cols.get(name, name if name in change_names else None)
        base_val = F.col(f"b.{name}")
        if new_name is None:
            return base_val.alias(name)
        new_val = F.col(f"c.{new_name}")
        # matched U/I -> new value (NULL means SET NULL, per ANSI MERGE —
        # a change feed that narrows a value to NULL must round-trip);
        # matched D is already filtered; plain carry-through -> old value
        return (
            F.when(has_change & (op != OP_DELETE), new_val)
            .otherwise(base_val)
            .alias(name)
        )

    key_col = F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    others = [out_col(n) for n in base.columns if n != key]
    return joined.filter(survives).select(key_col, *others)
