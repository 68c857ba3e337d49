from .cms import cms_build, cms_estimate, cms_merge
from .graph import connected_components
from .kmv import bottom_k, kmv_estimate, kmv_hash, kmv_merge, kmv_sketch
from .multimodal import (
    MEDIA_SCHEMA,
    decode_stub,
    image_feature_stats,
    resize_images,
    sample_video_frames,
)
from .pca import covariance_stats, pca_components, pca_project, project_embeddings
from .pq import pq_adc_topk, pq_encode, train_pq_codebooks
from .ranking import global_row_number, ntile_from_rank
from .simhash import simhash_neardup_pairs, simhash_signatures
from .similarity import ann_lsh_topk, hyperplane_buckets

__all__ = [
    "simhash_signatures",
    "simhash_neardup_pairs",
    "ann_lsh_topk",
    "hyperplane_buckets",
    "connected_components",
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "kmv_hash",
    "bottom_k",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "global_row_number",
    "ntile_from_rank",
    "covariance_stats",
    "pca_components",
    "pca_project",
    "project_embeddings",
    "train_pq_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "MEDIA_SCHEMA",
    "decode_stub",
    "image_feature_stats",
    "resize_images",
    "sample_video_frames",
]
