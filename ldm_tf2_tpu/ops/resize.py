"""Resize primitives with TF `ResizeNearestNeighbor(align_corners=False)`
semantics.

The reference upsamples exclusively by an exact factor of 2
(/root/reference/unet.py:42-48, autoencoder.py:150-156).  For integer
upscale factors, TF's nearest-neighbor resize with ``align_corners=False``
maps output pixel ``o`` to input pixel ``floor(o / scale)`` — i.e. each input
pixel is replicated ``scale`` times.  ``jnp.repeat`` reproduces this exactly
(bit-identical), and XLA lowers it to a cheap broadcast-reshape rather than a
gather, which is what we want on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample of an NHWC tensor.

    Bit-identical to ``tf.raw_ops.ResizeNearestNeighbor(images, [2H, 2W],
    align_corners=False)`` (unet.py:44): each pixel becomes a 2x2 block.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def nearest_resize(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """General nearest-neighbor resize (align_corners=False, half_pixel off).

    Matches ``tf.image.resize(method=NEAREST_NEIGHBOR)`` as used by the data
    pipeline (dataset.py:134-135).  TF2's resize uses *half-pixel centers*:
    source index = floor((dst + 0.5) * src_size / dst_size), clipped to the
    valid range.  (The raw op in the U-Net upsample path does NOT use
    half-pixel centers — see `nearest_upsample_2x`.)
    """
    h, w = x.shape[-3], x.shape[-2]
    rows = jnp.clip(
        jnp.floor((jnp.arange(height) + 0.5) * (h / height)).astype(jnp.int32),
        0,
        h - 1,
    )
    cols = jnp.clip(
        jnp.floor((jnp.arange(width) + 0.5) * (w / width)).astype(jnp.int32),
        0,
        w - 1,
    )
    return x[..., rows[:, None], cols[None, :], :]
