"""PatchGAN discriminator for adversarial autoencoder training.

Counterpart of /root/reference/discriminator.py:7-37 (pix2pix-style): N
4x4-stride-2 conv layers with explicit [[1,1],[1,1]] pads, BatchNorm
(eps 1e-5, momentum 0.9) on all but the first, LeakyReLU(0.2), then a
stride-1 conv block and a final 1-channel conv.

BatchNorm is the one piece of mutable state in the stack: linen keeps the
running moments in a `batch_stats` collection which the trainer threads
through `apply(..., mutable=["batch_stats"])`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class Discriminator(nn.Module):
    channels: int = 64
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        pad = lambda y: jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)])
        lrelu = lambda y: nn.leaky_relu(y, negative_slope=0.2)
        norm = lambda name: nn.BatchNorm(
            use_running_average=not training,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )

        x = nn.Conv(
            self.channels, (4, 4), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv_0",
        )(pad(x))
        x = lrelu(x)

        for n in range(1, self.num_layers):
            x = nn.Conv(
                min(2**n, 8) * self.channels,
                (4, 4),
                strides=(2, 2),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv_{n}",
            )(pad(x))
            x = lrelu(norm(f"bn_{n}")(x))

        multiplier = min(2**self.num_layers, 8)
        x = nn.Conv(
            multiplier * self.channels,
            (4, 4),
            strides=(1, 1),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name=f"conv_{self.num_layers}",
        )(pad(x))
        x = lrelu(norm(f"bn_{self.num_layers}")(x))

        x = nn.Conv(
            1, (4, 4), strides=(1, 1), padding="VALID", dtype=self.dtype,
            name="conv_out",
        )(pad(x))
        return x
