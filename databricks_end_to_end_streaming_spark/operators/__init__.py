from .simhash import simhash_signatures, simhash_neardup_pairs
from .similarity import ann_lsh_topk, hyperplane_buckets
from .multimodal import (
    MEDIA_SCHEMA,
    decode_stub,
    image_feature_stats,
    resize_images,
    sample_video_frames,
)

__all__ = [
    "simhash_signatures",
    "simhash_neardup_pairs",
    "ann_lsh_topk",
    "hyperplane_buckets",
    "MEDIA_SCHEMA",
    "decode_stub",
    "image_feature_stats",
    "resize_images",
    "sample_video_frames",
]
