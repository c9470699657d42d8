from model_presto_spark.operators.asof import asof_join
from model_presto_spark.operators.bucketing import bucketed_join, write_bucketed
from model_presto_spark.operators.contamination import ngram_contamination
from model_presto_spark.operators.dedup import (
    dedup_corpus,
    embedding_dup_pairs,
    exact_dedup,
    keep_representatives,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from model_presto_spark.operators.layout import (
    write_zordered,
    zorder_key,
)
from model_presto_spark.operators.mixing import (
    apply_mix,
    apply_mix_epochs,
    mix_plan,
)
from model_presto_spark.operators.grid import (
    bilinear_resample,
    positional_concat,
    terrain_derivatives,
)
from model_presto_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    keep_cluster_representatives,
)
from model_presto_spark.operators.knn import (
    ann_lsh_join,
    build_ivf_index,
    ivf_index_search,
    ivf_knn_join,
    knn_classify,
    knn_join,
    quantize_vectors,
    quantized_knn_join,
)
from model_presto_spark.operators.compaction import (
    compact_parquet,
    compaction_stats,
    equi_depth_histogram,
    plan_compaction,
)
from model_presto_spark.operators.bpe import (
    apply_bpe,
    train_bpe_merges,
    word_freqs,
)
from model_presto_spark.operators.lm import (
    perplexity_scores,
    tfidf_top_terms,
)
from model_presto_spark.operators.packing import pack_sequences, prefix_sum
from model_presto_spark.operators.profile import (
    check_constraints,
    profile_columns,
)
from model_presto_spark.operators.pq import (
    build_ivfpq_index,
    ivfpq_search,
    pq_encode,
    pq_knn_join,
    train_pq_codebooks,
)
from model_presto_spark.operators.skew import salted_count, salted_join
from model_presto_spark.operators.splits import (
    balanced_sample,
    group_split,
    hash_rank_sample,
    hash_split,
    per_class_capped_split,
    ratio_split,
    seeded_shuffle,
    stratified_split,
)
from model_presto_spark.operators.temporal import (
    interval_join,
    session_stats,
    sessionize,
)
from model_presto_spark.operators.timeseries import (
    monthly_composite,
    month_spine,
    pad_series,
    patch_pool,
    stride_sample,
)

from model_presto_spark.operators.dedup import (
    remove_dup_spans,
    span_dup_stats,
    window_hashes,
)
from model_presto_spark.operators.graph import (
    adamic_adar,
    bfs_levels,
    pagerank,
    triangle_stats,
)
from model_presto_spark.operators.linkage import (
    blocked_fuzzy_join,
    linkage_clusters,
)
from model_presto_spark.operators.lm import bm25_scores
from model_presto_spark.operators.privacy import (
    diff_snapshots,
    k_anonymity_stats,
    k_anonymize,
)
from model_presto_spark.operators.assoc import (
    cooccurrence_pmi,
    frequent_itemsets,
)
from model_presto_spark.operators.splits import (
    kfold,
    token_budget_truncate,
)
from model_presto_spark.operators.temporal import (
    cohort_retention,
    transition_matrix,
)
from model_presto_spark.operators.timeseries import (
    cusum,
    ewma,
    mad_outliers,
    rolling_zscore,
)

__all__ = [
    "frequent_itemsets",
    "bfs_levels",
    "token_budget_truncate",
    "adamic_adar",
    "triangle_stats",
    "transition_matrix",
    "cooccurrence_pmi",
    "kfold",
    "cusum",
    "mad_outliers",
    "remove_dup_spans",
    "span_dup_stats",
    "window_hashes",
    "pagerank",
    "blocked_fuzzy_join",
    "linkage_clusters",
    "bm25_scores",
    "diff_snapshots",
    "k_anonymity_stats",
    "k_anonymize",
    "cohort_retention",
    "ewma",
    "rolling_zscore",

    "ann_lsh_join",
    "apply_mix",
    "apply_mix_epochs",
    "mix_plan",
    "asof_join",
    "build_ivf_index",
    "ivf_index_search",
    "ngram_contamination",
    "dedup_corpus",
    "apply_bpe",
    "compact_parquet",
    "compaction_stats",
    "equi_depth_histogram",
    "plan_compaction",
    "train_bpe_merges",
    "word_freqs",
    "pack_sequences",
    "pq_encode",
    "build_ivfpq_index",
    "ivfpq_search",
    "check_constraints",
    "profile_columns",
    "pq_knn_join",
    "train_pq_codebooks",
    "perplexity_scores",
    "prefix_sum",
    "tfidf_top_terms",
    "quantize_vectors",
    "quantized_knn_join",
    "connected_components",
    "dedup_clusters",
    "ivf_knn_join",
    "keep_cluster_representatives",
    "balanced_sample",
    "bilinear_resample",
    "bucketed_join",
    "embedding_dup_pairs",
    "exact_dedup",
    "group_split",
    "hash_rank_sample",
    "hash_split",
    "interval_join",
    "session_stats",
    "sessionize",
    "keep_representatives",
    "knn_classify",
    "knn_join",
    "minhash_lsh_pairs",
    "month_spine",
    "monthly_composite",
    "ngram_jaccard_pairs",
    "pad_series",
    "patch_pool",
    "per_class_capped_split",
    "positional_concat",
    "ratio_split",
    "salted_count",
    "salted_join",
    "seeded_shuffle",
    "simhash_signatures",
    "stratified_split",
    "stride_sample",
    "terrain_derivatives",
    "write_bucketed",
    "write_zordered",
    "zorder_key",
]
