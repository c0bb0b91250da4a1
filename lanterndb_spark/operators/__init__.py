from lanterndb_spark.operators.knn import knn, knn_join
from lanterndb_spark.operators.hybrid import weighted_vector_search
from lanterndb_spark.operators.ivf import build_ivf, ivf_search, ivf_search_batch, ivfpq_search
from lanterndb_spark.operators.lsh import build_srp, srp_search, srp_search_batch
from lanterndb_spark.operators.bm25 import build_postings, search_bm25, bm25_score
from lanterndb_spark.operators.pq import train_codebook, quantize, dequantize, adc_knn
from lanterndb_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    embedding_near_dup_pairs,
    connected_components,
    dedup_keep_representatives,
)
from lanterndb_spark.operators.embed import embed, complete
from lanterndb_spark.operators.autotune import autotune_ivf, validate_ann
from lanterndb_spark.operators.maintenance import apply_tombstones, with_deltas, compact
from lanterndb_spark.operators.paragraphs import (
    remove_duplicate_paragraphs,
    split_paragraphs,
    tag_duplicate_paragraphs,
)
from lanterndb_spark.operators.curate import curate
from lanterndb_spark.operators.dedup import containment_pairs, jaccard_pairs_prefix
from lanterndb_spark.operators.lm import bigram_score, build_bigram_counts, build_vocab, unigram_score
from lanterndb_spark.operators.scd import scd2_history, scd2_snapshot
from lanterndb_spark.operators.profile import (
    check_constraints,
    histogram,
    mad_outliers,
    profile_table,
    psi_drift,
    zipf_fit,
)
from lanterndb_spark.operators.sampling import (
    cap_per_group,
    hash_bucket,
    hash_split,
    mix_to_weights,
    stratified_sample,
    temperature_weights,
)
from lanterndb_spark.operators.spans import (
    mask_repeated_spans,
    repeated_spans,
    span_postings,
)
from lanterndb_spark.operators.project import (
    gaussian_projection,
    pca_fit,
    pca_project,
    pca_reconstruction_error,
    project_embeddings,
    projected_knn,
    build_proj,
    proj_apply,
    projected_knn_batch,
)
from lanterndb_spark.operators.classifier import (
    binary_auc,
    logreg_fit,
    logreg_score,
    quality_classifier,
    text_quality_features,
)

__all__ = [
    "split_paragraphs", "tag_duplicate_paragraphs", "remove_duplicate_paragraphs",
    "hash_bucket", "hash_split", "stratified_sample", "cap_per_group", "curate",
    "knn", "knn_join", "weighted_vector_search",
    "build_ivf", "ivf_search", "ivf_search_batch", "ivfpq_search",
    "build_srp", "srp_search", "srp_search_batch",
    "build_postings", "search_bm25", "bm25_score",
    "train_codebook", "quantize", "dequantize", "adc_knn",
    "exact_dedup", "jaccard_pairs", "minhash_lsh_pairs", "simhash_pairs",
    "embedding_near_dup_pairs", "connected_components", "dedup_keep_representatives",
    "embed", "complete", "autotune_ivf", "validate_ann",
    "apply_tombstones", "with_deltas", "compact",
    "jaccard_pairs_prefix", "containment_pairs", "bigram_score", "build_bigram_counts",
    "build_vocab", "unigram_score", "scd2_history", "scd2_snapshot",
    "profile_table", "check_constraints", "histogram", "mad_outliers",
    "psi_drift", "zipf_fit",
    "repeated_spans", "mask_repeated_spans", "span_postings",
    "mix_to_weights", "temperature_weights",
    "gaussian_projection", "project_embeddings", "pca_fit", "pca_project",
    "pca_reconstruction_error", "projected_knn", "build_proj", "proj_apply", "projected_knn_batch",
    "text_quality_features", "logreg_fit", "logreg_score",
    "quality_classifier", "binary_auc",
]
