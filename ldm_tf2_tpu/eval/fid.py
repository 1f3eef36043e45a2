"""Fréchet distance sample-quality metric (FID harness).

The reference proves sample quality qualitatively only (README.md:156-188:
`samples/` grids and `assets/{original,recon}.png` eyeballing).  This module
adds the quantitative harness: Fréchet distance between deep-feature
Gaussians of a generated set and a real set — the FID recipe of Heusel et
al. (arXiv:1706.08500) with a pluggable feature extractor:

* ``vgg_feature_extractor`` (default, always available offline): spatially
  pooled stage-4/5 features of the framework's VGG16 trunk (models/lpips.py)
  with the LPIPS checkpoint's weights — a perceptual "VGG-FID".  With
  random (untrained) weights the distance is still a valid two-sample
  discrepancy (random-projection Fréchet distance), useful for smoke
  tests and regression tracking, not comparable across papers.
* an Inception-v3 extractor can be plugged in by passing any
  ``features(images) -> [N, D]`` callable to ``fid_from_features`` when
  pretrained pool3 weights are available locally (standard published FID).

CLIP score needs pretrained CLIP weights (no offline fallback exists that
is meaningful); `clip_score` raises with instructions unless a local
weights path is supplied.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def compute_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mean [D], covariance [D, D]) of a feature matrix [N, D]."""
    features = np.asarray(features, dtype=np.float64)
    if features.ndim != 2:
        raise ValueError(f"expected [N, D] features, got {features.shape}")
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray,
    mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)).

    The matrix square root is taken on the symmetrized product via an
    eigendecomposition of s1^(1/2) s2 s1^(1/2) (numerically stabler than
    scipy.linalg.sqrtm on near-singular covariances; small negative
    eigenvalues from float error are clipped).
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)

    diff = mu1 - mu2
    # s1^(1/2) via symmetric eigendecomposition
    w1, v1 = np.linalg.eigh(sigma1)
    sqrt_s1 = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    inner = sqrt_s1 @ sigma2 @ sqrt_s1
    w = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_sqrt = np.sum(np.sqrt(np.clip(w, 0.0, None)))
    d2 = float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt
    )
    return max(d2, 0.0)


def fid_from_features(
    real_features: np.ndarray, generated_features: np.ndarray
) -> float:
    m1, s1 = compute_statistics(real_features)
    m2, s2 = compute_statistics(generated_features)
    return frechet_distance(m1, s1, m2, s2)


def vgg_feature_extractor(
    lpips_params, batch_size: int = 16
) -> Callable[[np.ndarray], np.ndarray]:
    """features(images [N,H,W,3] in [-1,1]) -> [N, 1024] pooled VGG stage
    4+5 activations, using the LPIPS checkpoint's VGG16 trunk."""
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu.models.lpips import SCALE, SHIFT, VGG16

    vgg = VGG16()
    vgg_params = lpips_params["vgg16"]

    @jax.jit
    def _features(images):
        x = (images - SHIFT.astype(images.dtype)) / SCALE.astype(images.dtype)
        feats = vgg.apply({"params": vgg_params}, x)
        # global-average-pool the two deepest stages (512 + 512 channels)
        pooled = [jnp.mean(f, axis=(1, 2)) for f in feats[-2:]]
        return jnp.concatenate(pooled, axis=-1)

    def features(images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32)
        out = []
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(_features(images[i:i + batch_size])))
        return np.concatenate(out, axis=0)

    return features


def clip_score(
    images: np.ndarray,
    prompts: list[str],
    clip_weights_path: str | None = None,
    batch_size: int = 16,
) -> float:
    """Mean CLIP text-image cosine similarity (the standard CLIP score,
    Hessel et al. arXiv:2104.08718, without the 2.5x rescale).

    Requires a local transformers-format CLIP checkpoint (e.g.
    openai/clip-vit-base-patch32 downloaded into a directory): a random
    text/image encoder measures nothing about alignment, so there is no
    offline fallback.

    Args:
      images: [N, H, W, 3] uint8 (or float in [0, 255]).
      prompts: N strings (or 1 string, tiled).
    """
    if clip_weights_path is None:
        raise RuntimeError(
            "CLIP score needs pretrained weights. Download "
            "openai/clip-vit-base-patch32 (transformers format) and pass "
            "clip_weights_path=<dir>."
        )
    import torch
    from transformers import CLIPModel, CLIPProcessor

    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = np.clip(images, 0, 255).astype(np.uint8)
    if isinstance(prompts, str):
        prompts = [prompts]
    if len(prompts) == 1:
        prompts = prompts * len(images)
    if len(prompts) != len(images):
        raise ValueError(
            f"{len(prompts)} prompts for {len(images)} images"
        )

    model = CLIPModel.from_pretrained(clip_weights_path).eval()
    processor = CLIPProcessor.from_pretrained(clip_weights_path)
    sims = []
    with torch.no_grad():
        for i in range(0, len(images), batch_size):
            inputs = processor(
                text=prompts[i:i + batch_size],
                images=list(images[i:i + batch_size]),
                return_tensors="pt",
                padding=True,
                truncation=True,
            )
            out = model(**inputs)
            img = out.image_embeds / out.image_embeds.norm(
                dim=-1, keepdim=True
            )
            txt = out.text_embeds / out.text_embeds.norm(
                dim=-1, keepdim=True
            )
            sims.append((img * txt).sum(dim=-1).cpu().numpy())
    return float(np.mean(np.concatenate(sims)))
