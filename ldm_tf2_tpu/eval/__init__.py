"""Sample-quality evaluation: FID (Fréchet distance over deep features)
and CLIP score (weights-gated)."""

from ldm_tf2_tpu.eval.fid import (
    clip_score,
    compute_statistics,
    fid_from_features,
    frechet_distance,
    vgg_feature_extractor,
)
from ldm_tf2_tpu.eval.inception import inception_feature_extractor

__all__ = [
    "frechet_distance",
    "compute_statistics",
    "fid_from_features",
    "vgg_feature_extractor",
    "clip_score",
    "inception_feature_extractor",
]
