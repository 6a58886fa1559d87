"""Johnson-Lindenstrauss random projection for embedding columns.

The dimensionality-reduction scale path for similarity work: project
``array<float>`` vectors ``d → out_dim`` with a seeded Gaussian matrix,
then run any of operators/similarity.py's searches in the reduced space
(cheaper GEMMs, smaller shuffles, same top-k candidates to re-rank
exactly in the original space).  JL: pairwise distances are preserved
within ±ε for out_dim = O(log n / ε²), independent of d.

Design for 100 TB: ``mapInPandas`` — one Arrow-batched numpy GEMM per
input batch, zero shuffles, output partitioning inherits input.  The
projection matrix is *regenerated inside each task* from the seed
(``np.random.RandomState(seed)`` is specified to be reproducible across
platforms/processes), so there is no broadcast, no closure capture of a
d×out_dim array, and any two clusters produce bit-identical projections.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def projection_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """The (out_dim × in_dim) Gaussian projection, scaled 1/√out_dim so
    expected squared norms are preserved.  float32 to match the column."""
    rng = np.random.RandomState(seed)
    return (
        rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)
    ).astype(np.float32)


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 7,
    out_col: str | None = None,
) -> DataFrame:
    """Replace/add a reduced-dimension vector column.

    ``out_col`` defaults to replacing ``vec_col``.  Null vectors project
    to null.  Input dim is read from the first non-null vector of each
    batch and must be constant (a ragged column raises inside the task).
    """
    out_col = out_col or vec_col
    fields = [f for f in df.schema.fields if f.name != out_col]
    schema = T.StructType(
        fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    names = [f.name for f in fields]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat: np.ndarray | None = None
        for pdf in batches:
            vecs = pdf[vec_col]
            mask = vecs.notna()
            out = pd.Series([None] * len(pdf), dtype=object)
            if mask.any():
                x = np.asarray(
                    [np.asarray(v, dtype=np.float32) for v in vecs[mask]]
                )
                if mat is None:
                    mat = projection_matrix(x.shape[1], out_dim, seed)
                y = x @ mat.T  # (batch × out_dim) — one GEMM per batch
                out[mask.to_numpy().nonzero()[0]] = list(y)
            res = pdf[names].copy()
            res[out_col] = out
            yield res

    return df.mapInPandas(project, schema=schema)
