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
