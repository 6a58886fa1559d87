from fluvio_duck_spark.operators.asof import (
    asof_broadcast_join,
    asof_join,
    range_band_join,
    scd2_intervals,
)
from fluvio_duck_spark.operators.chunking import chunk_documents, tokenize
from fluvio_duck_spark.operators.drift import psi_by_group
from fluvio_duck_spark.operators.events import (
    cdc_apply,
    cohort_retention,
    funnel_stages,
)
from fluvio_duck_spark.operators.intervals import interval_overlap_join
from fluvio_duck_spark.operators.lm import unigram_fit, unigram_logprob_scores
from fluvio_duck_spark.operators.projection import (
    projection_matrix,
    random_projection,
)
from fluvio_duck_spark.operators.zorder import write_zordered, zorder_key
from fluvio_duck_spark.operators.dedup import (
    connected_components,
    edit_distance_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from fluvio_duck_spark.operators.grouped import (
    minmax_scale_grouped,
    robust_scale_grouped,
)
from fluvio_duck_spark.operators.multimodal import (
    attach_binary_content,
    extract_features,
    resize_content,
    sample_frames,
)
from fluvio_duck_spark.operators.graph import pagerank
from fluvio_duck_spark.operators.kmeans import kmeans_assign, kmeans_fit
from fluvio_duck_spark.operators.profiling import profile_columns
from fluvio_duck_spark.operators.rollup import (
    Measure,
    cascade_rollup,
    finalize_rollup,
    hypertable_rollup,
    time_bucket,
)
from fluvio_duck_spark.operators.sessions import session_stats, sessionize
from fluvio_duck_spark.operators.timeseries import calendar_gapfill, locf_fill
from fluvio_duck_spark.operators.sampling import (
    negative_samples,
)
from fluvio_duck_spark.operators.similarity import (
    ann_lsh_topk,
    blocked_near_dup_pairs,
    cosine_topk,
    embedding_near_dup_pairs,
    group_centroids,
    hard_negatives,
    ivf_topk,
)
from fluvio_duck_spark.operators.skew import salted_agg_count, salted_join

__all__ = [
    "ann_lsh_topk",
    "asof_broadcast_join",
    "asof_join",
    "chunk_documents",
    "interval_overlap_join",
    "projection_matrix",
    "random_projection",
    "scd2_intervals",
    "tokenize",
    "unigram_fit",
    "unigram_logprob_scores",
    "write_zordered",
    "zorder_key",
    "blocked_near_dup_pairs",
    "attach_binary_content",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "edit_distance_pairs",
    "calendar_gapfill",
    "locf_fill",
    "extract_features",
    "ivf_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "minmax_scale_grouped",
    "robust_scale_grouped",
    "cdc_apply",
    "cohort_retention",
    "funnel_stages",
    "group_centroids",
    "hard_negatives",
    "negative_samples",
    "pagerank",
    "profile_columns",
    "psi_by_group",
    "ngram_jaccard_pairs",
    "range_band_join",
    "resize_content",
    "Measure",
    "cascade_rollup",
    "connected_components",
    "finalize_rollup",
    "hypertable_rollup",
    "kmeans_assign",
    "kmeans_fit",
    "time_bucket",
    "salted_agg_count",
    "salted_join",
    "sample_frames",
    "session_stats",
    "sessionize",
    "simhash",
    "simhash_near_dup_pairs",
]
