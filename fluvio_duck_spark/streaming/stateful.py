"""Stateful aggregate over the stream — the SmartModule *aggregate* kind
(A1): a fold with a user-provided initial accumulator running server-side
in the reference (``SmartModuleContextData::Aggregate``, reference
src/consume.rs:687-695, seeded by ``--aggregate-initial`` :511-513).

Spark-native: ``applyInPandasWithState`` keeps one accumulator per group
across micro-batches; state lives in the state store (checkpointable,
executor-local) — the 100 TB path for arbitrary custom folds.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType()),
        T.StructField("acc", T.LongType()),
        T.StructField("n_records", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("acc", T.LongType()), T.StructField("n", T.LongType())]
)


def aggregate_fold_stream(
    stream: DataFrame,
    initial: int = 0,
    json_field: str = "k",
    group_col: str = "partition",
) -> DataFrame:
    """Per-partition running fold: acc := acc + payload[json_field], seeded
    with ``initial``; emits the accumulator after each micro-batch."""
    extracted = stream.withColumn(
        "__x",
        F.get_json_object(F.col("value"), f"$.{json_field}").try_cast("long"),
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            acc, n = state.get
        else:
            acc, n = initial, 0
        for pdf in pdfs:
            vals = pdf["__x"].dropna()
            acc += int(vals.sum()) if len(vals) else 0
            n += len(pdf)
        state.update((acc, n))
        yield pd.DataFrame({"partition": [key[0]], "acc": [acc], "n_records": [n]})

    return extracted.groupBy(group_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)
EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("ewma", T.DoubleType()), T.StructField("n", T.LongType())]
)


def ewma_stream(
    stream: DataFrame,
    alpha: float = 0.2,
    json_field: str = "k",
    group_col: str = "partition",
) -> DataFrame:
    """Per-group streaming EWMA — the order-sensitive recursive fold
    ``applyInPandasWithState`` exists for: state is (ewma, n), each
    micro-batch folds its rows in OFFSET order (the log order the
    offset-cursor sources deliver; rows are sorted within the batch, and
    batch boundaries arrive in cursor order by contract).  The arithmetic
    is the same IEEE a*x + (1-a)*acc sequence as the batch fold, so the
    stream converges to bit-identical values."""
    extracted = stream.withColumn(
        "__x",
        F.get_json_object(F.col("value"), f"$.{json_field}").try_cast("double"),
    )

    def fold(key, pdfs, state: GroupState):
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = 0.0, 0
        chunks = [pdf for pdf in pdfs]
        if chunks:
            batch = pd.concat(chunks).sort_values("offset")
            for x in batch["__x"].tolist():
                if x != x or x is None:  # NaN/None guard
                    continue
                ewma = x if n == 0 else alpha * x + (1.0 - alpha) * ewma
                n += 1
        state.update((ewma, n))
        yield pd.DataFrame(
            {"partition": [key[0]], "n_records": [n], "ewma": [ewma]}
        )

    return extracted.groupBy(group_col).applyInPandasWithState(
        fold,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
