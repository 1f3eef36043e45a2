"""Vector quantization layer (VQ-VAE / VQ-GAN codebook).

Counterpart of /root/reference/quantize.py:5-90.  The nearest-codebook
search is an [N, K] squared-L2 distance (x^2 + e^2 - 2 x e^T) whose dominant
cost, the [N, hidden] x [hidden, K] matmul, lands on the MXU; at the
reference scale (K=16384, hidden=4) the whole lookup is tiny.  The
straight-through estimator uses `jax.lax.stop_gradient` exactly as the
reference uses `tf.stop_gradient` (quantize.py:80-88).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class VectorQuantizer(nn.Module):
    """Codebook [vocab_size, hidden_size]; returns (quantized, loss, indices).

    Attributes mirror quantize.py:6-25.
    """

    vocab_size: int
    hidden_size: int
    beta: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latents: jnp.ndarray):
        codebook = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (self.vocab_size, self.hidden_size),
            jnp.float32,
        )
        flat = latents.reshape(-1, self.hidden_size).astype(jnp.float32)

        # Squared pairwise distances [N, vocab_size] (quantize.py:65-69).
        distances = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)
            - 2.0 * jnp.dot(flat, codebook.T, preferred_element_type=jnp.float32)
        )
        indices = jnp.argmin(distances, axis=1)

        quantized = jnp.take(codebook, indices, axis=0).reshape(latents.shape)
        quantized = quantized.astype(latents.dtype)

        sg = jax.lax.stop_gradient
        codebook_loss = jnp.mean(
            (sg(quantized) - latents) ** 2
        ) + self.beta * jnp.mean((quantized - sg(latents)) ** 2)

        # Straight-through: decoder gradients flow to the encoder unchanged.
        quantized = latents + sg(quantized - latents)
        return quantized, codebook_loss, indices
