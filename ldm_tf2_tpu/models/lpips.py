"""LPIPS perceptual loss (Zhang et al., arXiv:1801.03924).

Counterpart of /root/reference/lpips.py:19-72: a from-scratch VGG16 feature
extractor (5 conv stages, explicit [[1,1],[1,1]] pad + VALID 3x3 convs,
2x2 max-pool between stages) with per-stage Dense(1, no-bias) linear heads.
Input shift/scale constants (lpips.py:11-12), channelwise unit-normalized
features (lpips.py:14-16), squared difference, spatial mean, summed over the
five stages.

LPIPS is *frozen* during autoencoder training (lpips.py:51): the trainers
treat its params as constants (no gradients are taken w.r.t. them), which in
the functional JAX paradigm just means they are never handed to the
optimizer.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# numpy (not jnp) on purpose: module-level device arrays would initialize
# the JAX backend at import time — before a CLI main() can honor
# JAX_PLATFORMS=cpu (parallel/mesh.py) — and cost an eager device
# round-trip through the TPU tunnel on every process start.  Inside jit
# these fold to compile-time constants either way.
SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

_STAGE_CHANNELS = (64, 128, 256, 512, 512)
_STAGE_DEPTHS = (2, 2, 3, 3, 3)


def _normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class VGG16(nn.Module):
    """Feature maps from the five VGG16 conv stages (lpips.py:19-45)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = []
        for i, (channels, depth) in enumerate(zip(_STAGE_CHANNELS, _STAGE_DEPTHS)):
            if i > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
            for j in range(depth):
                x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
                x = nn.Conv(
                    channels,
                    (3, 3),
                    padding="VALID",
                    dtype=self.dtype,
                    name=f"conv{i}_{j}",
                )(x)
                x = nn.relu(x)
            features.append(x)
        return features


class LPIPS(nn.Module):
    """Perceptual dissimilarity [B,1,1,1] between two image batches
    (lpips.py:48-72)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images1, images2):
        shift = SHIFT.astype(images1.dtype)
        scale = SCALE.astype(images1.dtype)
        vgg = VGG16(dtype=self.dtype, name="vgg16")
        feats1 = vgg((images1 - shift) / scale)
        feats2 = vgg((images2 - shift) / scale)

        total = 0.0
        for i in range(5):
            diff = (_normalize(feats1[i]) - _normalize(feats2[i])) ** 2
            proj = nn.Dense(
                1, use_bias=False, dtype=self.dtype, name=f"proj_{i}"
            )(diff)
            total = total + jnp.mean(proj, axis=(1, 2), keepdims=True)
        return total
