"""Distributed Lloyd's k-means over an embedding column — the trained
coarse quantizer for IVF ANN (``similarity.ivf_topk``'s production
codebook), and the house example of an *iterative* algorithm done
Spark-right.

Per iteration:

* centroids (k×d floats, a few KB) broadcast to every task as plan
  literals — never a shuffle;
* assignment + per-cell partial sums computed inside one Arrow-batched
  ``mapInPandas`` pass: each task emits at most k rows (cell, sum-vector,
  count) regardless of input size — the map-side-combine shape;
* partials (≤ tasks×k rows) collect to the driver and reduce in numpy —
  the treeAggregate pattern; driver memory is O(k·d), not O(n).

So a 100 TB fit shuffles *nothing*: each iteration is one scan + a
driver-side reduction of a few thousand tiny rows.  State that must not
be recomputed (the input projection) should be cached by the caller.

Determinism: init picks the k lowest-id vectors (no RNG), ties in
assignment break toward the lower cell index, iteration count and tol
are fixed — same data → same codebook on any cluster size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_normalize(m: np.ndarray) -> np.ndarray:
    """Unit-L2 rows (zero rows pass through) — numpy-side so callers can
    cluster in cosine geometry without stacking a higher-order-function
    expression under the pandas UDF input (Spark cannot evaluate a
    Python UDF whose argument embeds lambda expressions once a filter is
    pushed below the projection)."""
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def _partial_sums_fn(centroids: np.ndarray, vec_col: str, normalize: bool = False):
    k, d = centroids.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                m = _row_normalize(m)
            # pairwise squared L2 via the expansion trick; argmin returns
            # the lowest index on ties (deterministic)
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * (m @ centroids.T)
                + (centroids * centroids).sum(axis=1)[None, :]
            )
            cells = np.argmin(d2, axis=1)
            for c in np.unique(cells):
                sel = cells == c
                sums[c] += m[sel].sum(axis=0)
                counts[c] += int(sel.sum())
        yield pd.DataFrame(
            {
                "cell": np.arange(k),
                "vsum": list(sums),
                "cnt": counts,
            }
        )

    return run


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 20,
    tol: float = 1e-6,
    normalize: bool = False,
) -> np.ndarray:
    """Fit a k×d codebook.  Returns the centroid matrix (numpy, driver
    side — it is broadcast state, not data).  ``normalize=True`` fits in
    cosine geometry (unit-L2 rows; see :func:`_row_normalize`)."""
    init_rows = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = np.stack([np.asarray(r[0], dtype=np.float64) for r in init_rows])
    if normalize:
        centroids = _row_normalize(centroids)
    schema = "cell int, vsum array<double>, cnt long"
    vecs = df.select(vec_col)
    for _ in range(max_iter):
        partials = vecs.mapInPandas(
            _partial_sums_fn(centroids, vec_col, normalize=normalize),
            schema=schema,
        ).collect()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in partials:
            sums[r.cell] += np.asarray(r.vsum)
            counts[r.cell] += r.cnt
        nonempty = counts > 0
        new_centroids = centroids.copy()  # empty cells keep their position
        new_centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift < tol:
            break
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    normalize: bool = False,
) -> DataFrame:
    """Map-only cell assignment (argmin over the broadcast codebook) —
    appends ``cell_col``; at scale this is the column the table is
    partitioned/bucketed by so IVF probes become partition-pruned scans."""
    cent = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        if normalize:
            m = _row_normalize(m)
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return df.withColumn(cell_col, assign(F.col(vec_col)))
