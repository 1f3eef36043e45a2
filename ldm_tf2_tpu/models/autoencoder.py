"""KL- and VQ-regularized convolutional autoencoders (first stage of LDM).

TPU-native (flax/linen, NHWC) counterpart of /root/reference/autoencoder.py.
Numerics preserved exactly:

* GroupNorm(32, eps=1e-6) throughout (autoencoder.py:11);
* encoder Downsample pads **asymmetrically** [[0,1],[0,1]] before the
  stride-2 VALID conv (autoencoder.py:133) — note this differs from the
  U-Net's symmetric [[1,1],[1,1]] pad (unet.py:26);
* decoder Upsample is nearest-neighbor 2x (align_corners=False) + 3x3 SAME
  conv (autoencoder.py:150-156);
* attention blocks fire when the *spatial size* is in
  ``attention_resolutions`` (autoencoder.py:117) — e.g. (32,) for the VQ
  config (all_in_one_config.yaml:84);
* the residual shortcut is a Dense (pointwise) projection created only when
  the channel count changes (autoencoder.py:53-54), matching the lazily
  built Keras variable set for checkpoint parity.

Known reference bug fixed, not ported: ``AutoencoderVQ.decode(
force_quantize=True)`` assigned the 3-tuple returned by the quantizer to
``latents`` (autoencoder.py:430-432), crashing the VQ sampling path; here we
unpack the quantized tensor.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

import jax

from ldm_tf2_tpu.models.distribution import DiagonalGaussian
from ldm_tf2_tpu.models.quantize import VectorQuantizer
from ldm_tf2_tpu.ops.attention import dot_product_attention
from ldm_tf2_tpu.ops.fused_conv import (
    Conv3x3Params,
    GNParams,
    conv3x3,
    gn_silu_conv3x3,
)
from ldm_tf2_tpu.ops.group_norm import GroupNorm, group_norm
from ldm_tf2_tpu.ops.resize import nearest_upsample_2x

GROUP_NORM_EPS = 1e-6


class ResidualBlock(nn.Module):
    """GN-swish-conv x2 with optional time injection (autoencoder.py:13-58)."""

    channels: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time=None, *, training: bool = False):
        cin = x.shape[-1]
        x = x.astype(self.dtype)
        g1_scale, g1_bias = GNParams(cin, name="group_norm1")()
        k1, b1 = Conv3x3Params(self.channels, cin, name="conv1")()
        t = None
        if time is not None:
            t = nn.Dense(self.channels, dtype=self.dtype, name="dense_time")(
                nn.swish(time)
            )
        # quant_ok=False: the AE runs once per batch and its decoder path
        # produces the final pixel map — int8 sampling quantizes only the
        # U-Net ResBlocks (ops/quant_conv.py).
        h = gn_silu_conv3x3(
            x, g1_scale, g1_bias, k1, b1, time_add=t,
            num_groups=32, eps=GROUP_NORM_EPS, quant_ok=False,
        )

        g2_scale, g2_bias = GNParams(self.channels, name="group_norm2")()
        k2, b2 = Conv3x3Params(self.channels, self.channels, name="conv2")()
        shortcut = x
        if cin != self.channels:
            shortcut = nn.Dense(
                self.channels, dtype=self.dtype, name="shortcut"
            )(x)
        if training and self.dropout_rate > 0.0:
            # Dropout sits between GN/SiLU and the second conv — the chain
            # cannot fuse; use the identical unfused composition (conv as
            # 9 dots: immune to the conv-emitter lottery, fused_conv.py).
            h = group_norm(
                h, g2_scale, g2_bias, num_groups=32, eps=GROUP_NORM_EPS,
                activate=True,
            )
            h = nn.Dropout(self.dropout_rate, deterministic=False)(h)
            h = conv3x3(h, k2, b2)
            return shortcut + h
        return gn_silu_conv3x3(
            h, g2_scale, g2_bias, k2, b2, residual_add=shortcut,
            num_groups=32, eps=GROUP_NORM_EPS, quant_ok=False,
        )


class AttentionBlock(nn.Module):
    """Single-head spatial self-attention (autoencoder.py:61-97).

    The reference's 5-D einsum ``bhwc,bHWc->bhwHW`` is the same computation
    as single-head attention over H*W tokens; we flatten and route through
    the shared attention op so large decodes (64x64 -> 4096 tokens) can use
    the Pallas flash kernel.
    """

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm(
            num_groups=32, epsilon=GROUP_NORM_EPS, dtype=self.dtype,
            name="group_norm",
        )(x)
        q = nn.Dense(c, dtype=self.dtype, name="query")(y)
        k = nn.Dense(c, dtype=self.dtype, name="key")(y)
        v = nn.Dense(c, dtype=self.dtype, name="value")(y)
        # [B, HW, 1, C]: one head of width `channels`, scale c**-0.5
        # (autoencoder.py:86-93).
        out = dot_product_attention(
            q.reshape(b, h * w, 1, c),
            k.reshape(b, h * w, 1, c),
            v.reshape(b, h * w, 1, c),
            scale=c**-0.5,
        ).reshape(b, h, w, c)
        out = nn.Dense(c, dtype=self.dtype, name="output")(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (or avg-pool) (autoencoder.py:122-138)."""

    channels: int
    resample_with_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resample_with_conv:
            x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
            return nn.Conv(
                self.channels,
                (3, 3),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")


class Upsample(nn.Module):
    """Nearest 2x + 3x3 SAME conv (autoencoder.py:141-156)."""

    channels: int
    resample_with_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.resample_with_conv:
            x = nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name="conv",
            )(x)
        return x


class ResAttnBlock(nn.Module):
    """Residual block + optional spatial attention (Down/UpBlock,
    autoencoder.py:100-119, :159-178)."""

    channels: int
    attention_resolutions: Sequence[int] = ()
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time=None, *, training: bool = False):
        x = ResidualBlock(
            self.channels, self.dropout_rate, dtype=self.dtype, name="residual"
        )(x, time, training=training)
        if x.shape[1] in self.attention_resolutions:
            x = AttentionBlock(self.channels, dtype=self.dtype, name="attention")(x)
        return x


class MiddleBlock(nn.Module):
    """res - attn - res bottleneck (autoencoder.py:181-195)."""

    channels: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time=None, *, training: bool = False):
        x = ResidualBlock(
            self.channels, self.dropout_rate, dtype=self.dtype, name="residual1"
        )(x, time, training=training)
        x = AttentionBlock(self.channels, dtype=self.dtype, name="attention")(x)
        x = ResidualBlock(
            self.channels, self.dropout_rate, dtype=self.dtype, name="residual2"
        )(x, time, training=training)
        return x


class Encoder(nn.Module):
    """conv_in -> {blocks, downsample} per level -> middle -> GN/swish/conv_out
    (autoencoder.py:198-249)."""

    channels: int
    num_blocks: int = 2
    latent_channels: int = 4
    attention_resolutions: Sequence[int] = ()
    dropout_rate: float = 0.0
    multipliers: Sequence[int] = (1, 2, 4, 8)
    resample_with_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = nn.Conv(
            self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in"
        )(x)
        num_resolutions = len(self.multipliers)
        idx = 0
        for i, mult in enumerate(self.multipliers):
            for _ in range(self.num_blocks):
                x = ResAttnBlock(
                    self.channels * mult,
                    self.attention_resolutions,
                    self.dropout_rate,
                    dtype=self.dtype,
                    name=f"down_{idx}",
                )(x, training=training)
                idx += 1
            if i < num_resolutions - 1:
                x = Downsample(
                    self.channels * mult,
                    self.resample_with_conv,
                    dtype=self.dtype,
                    name=f"down_{idx}",
                )(x)
                idx += 1
        x = MiddleBlock(
            self.channels * self.multipliers[-1],
            self.dropout_rate,
            dtype=self.dtype,
            name="middle",
        )(x, training=training)
        x = GroupNorm(
            num_groups=32, epsilon=GROUP_NORM_EPS, dtype=self.dtype,
            name="group_norm", activation="silu",
        )(x)
        x = nn.Conv(
            self.latent_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="conv_out",
        )(x)
        return x


class Decoder(nn.Module):
    """conv_in -> middle -> {blocks, upsample} per level (reversed) -> out
    (autoencoder.py:252-298)."""

    channels: int
    out_channels: int = 3
    num_blocks: int = 2
    dropout_rate: float = 0.0
    resample_with_conv: bool = True
    attention_resolutions: Sequence[int] = ()
    multipliers: Sequence[int] = (1, 2, 4, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        channels_list = [self.channels * m for m in self.multipliers]
        x = nn.Conv(
            channels_list[-1], (3, 3), padding="SAME", dtype=self.dtype,
            name="conv_in",
        )(x)
        x = MiddleBlock(
            channels_list[-1], self.dropout_rate, dtype=self.dtype, name="middle"
        )(x, training=training)
        idx = 0
        for i in reversed(range(len(self.multipliers))):
            for _ in range(self.num_blocks + 1):
                x = ResAttnBlock(
                    channels_list[i],
                    self.attention_resolutions,
                    self.dropout_rate,
                    dtype=self.dtype,
                    name=f"up_{idx}",
                )(x, training=training)
                idx += 1
            if i > 0:
                x = Upsample(
                    channels_list[i],
                    self.resample_with_conv,
                    dtype=self.dtype,
                    name=f"up_{idx}",
                )(x)
                idx += 1
        x = GroupNorm(
            num_groups=32, epsilon=GROUP_NORM_EPS, dtype=self.dtype,
            name="group_norm", activation="silu",
        )(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="conv_out",
        )(x)
        return x


class AutoencoderKL(nn.Module):
    """KL-regularized autoencoder, f8 at the default config
    (autoencoder.py:301-367; config all_in_one_config.yaml:67-74)."""

    latent_channels: int = 4
    channels: int = 128
    num_blocks: int = 2
    attention_resolutions: Sequence[int] = ()
    dropout_rate: float = 0.0
    multipliers: Sequence[int] = (1, 2, 4, 4)
    resample_with_conv: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            channels=self.channels,
            num_blocks=self.num_blocks,
            latent_channels=self.latent_channels * 2,
            attention_resolutions=(),
            dropout_rate=self.dropout_rate,
            multipliers=self.multipliers,
            resample_with_conv=self.resample_with_conv,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Dense(
            self.latent_channels * 2, dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Dense(
            self.latent_channels, dtype=self.dtype, name="post_quant_conv"
        )
        self.decoder = Decoder(
            channels=self.channels,
            out_channels=3,
            num_blocks=self.num_blocks,
            multipliers=self.multipliers,
            resample_with_conv=self.resample_with_conv,
            attention_resolutions=(),
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )

    def encode(self, x, *, training: bool = False) -> DiagonalGaussian:
        h = self.encoder(x, training=training)
        h = self.quant_conv(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return DiagonalGaussian.create(mean, logvar)

    def decode(self, z, *, training: bool = False):
        return self.decoder(self.post_quant_conv(z), training=training)

    def __call__(self, x, *, sample_posterior: bool = True, training: bool = False):
        posterior = self.encode(x, training=training)
        if sample_posterior:
            z = posterior.sample(self.make_rng("sample"))
        else:
            z = posterior.mode()
        return self.decode(z, training=training), posterior

    @staticmethod
    def last_layer_path() -> tuple[str, ...]:
        """Param-tree path of the decoder's final conv kernel, used for the
        adaptive GAN weight (autoencoder.py:366-367)."""
        return ("decoder", "conv_out", "kernel")


class AutoencoderVQ(nn.Module):
    """VQ-regularized autoencoder (autoencoder.py:370-447; config
    all_in_one_config.yaml:80-89)."""

    latent_channels: int = 4
    channels: int = 128
    num_blocks: int = 2
    dropout_rate: float = 0.0
    multipliers: Sequence[int] = (1, 2, 2, 4)
    resample_with_conv: bool = True
    attention_resolutions: Sequence[int] = (32,)
    vocab_size: int = 16384
    beta: float = 0.25
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            channels=self.channels,
            num_blocks=self.num_blocks,
            latent_channels=self.latent_channels,
            attention_resolutions=self.attention_resolutions,
            dropout_rate=self.dropout_rate,
            multipliers=self.multipliers,
            resample_with_conv=self.resample_with_conv,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Dense(
            self.latent_channels, dtype=self.dtype, name="quant_conv"
        )
        self.quantize = VectorQuantizer(
            vocab_size=self.vocab_size,
            hidden_size=self.latent_channels,
            beta=self.beta,
            dtype=self.dtype,
        )
        self.post_quant_conv = nn.Dense(
            self.latent_channels, dtype=self.dtype, name="post_quant_conv"
        )
        self.decoder = Decoder(
            channels=self.channels,
            out_channels=3,
            num_blocks=self.num_blocks,
            multipliers=self.multipliers,
            resample_with_conv=self.resample_with_conv,
            attention_resolutions=self.attention_resolutions,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )

    def encode(self, x, *, only_encode: bool = False, training: bool = False):
        z = self.quant_conv(self.encoder(x, training=training))
        if only_encode:
            return z
        return self.quantize(z)  # (quantized, codebook_loss, indices)

    def decode(self, z, *, force_quantize: bool = False, training: bool = False):
        if force_quantize:
            # Reference bug (autoencoder.py:431) assigned the whole 3-tuple;
            # we keep only the quantized latents.
            z, _, _ = self.quantize(z)
        return self.decoder(self.post_quant_conv(z), training=training)

    def __call__(self, x, *, return_indices: bool = False, training: bool = False):
        z, codebook_loss, indices = self.encode(x, training=training)
        out = self.decode(z, training=training)
        if return_indices:
            return out, codebook_loss, indices
        return out, codebook_loss

    @staticmethod
    def last_layer_path() -> tuple[str, ...]:
        return ("decoder", "conv_out", "kernel")
