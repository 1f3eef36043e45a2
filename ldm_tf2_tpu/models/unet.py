"""Epsilon-prediction U-Net backbone (the hot model: ~0.87B params).

TPU-native counterpart of /root/reference/unet.py.  Structure (unet.py:51-138):
conv_in -> 11 input blocks (2 residual(+spatial-transformer) blocks per level
x 4 levels, channel_mult [1,2,4,4], downsample between levels) -> middle
(res - spatial-transformer - res) -> 12 output blocks with U-skip concat ->
GroupNorm/SiLU/conv_out.  Spatial transformers run on every level except the
last (unet.py:85 ``use_spatial_transformer=i < len(channel_mult)-1``), with
8 heads x (40*mult) per head so the attention width always equals the block
channel count.

Numerics preserved exactly:
* U-Net Downsample pads **symmetrically** [[1,1],[1,1]] before its stride-2
  VALID conv (unet.py:26) — differs from the autoencoder's [[0,1],[0,1]];
* Upsample = nearest 2x (align_corners=False) + 3x3 SAME conv (unet.py:42-48);
* GroupNorm eps 1e-5 in residual blocks and the output head (unet.py:115,
  :374) but 1e-6 inside SpatialTransformer (unet.py:354);
* time embedding is sinusoidal with **cos before sin** (unet.py:413-418),
  then Dense(4C)+SiLU, Dense(4C) (unet.py:72-73, :126-127);
* attention logits scale is ``size_per_head ** -0.5`` applied post-matmul
  (unet.py:281).

The attention einsums route through `ldm_tf2_tpu.ops.dot_product_attention`
so self-attention over 1024-4096 spatial tokens can use the Pallas flash
kernel while the 77-token cross-attention stays on the fused XLA path.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ldm_tf2_tpu.models.transformer import Projection
from ldm_tf2_tpu.ops.attention import dot_product_attention
from ldm_tf2_tpu.ops.fused_conv import (
    Conv3x3Params,
    GNParams,
    conv3x3,
    gn_silu_conv3x3,
)
from ldm_tf2_tpu.ops.group_norm import GroupNorm, group_norm
from ldm_tf2_tpu.ops.resize import nearest_upsample_2x


def get_time_embedding(
    time: jnp.ndarray, channels: int, max_time: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, cos-first (unet.py:401-422).

    Args:
      time: [batch] float or int timesteps.
      channels: embedding width.
    Returns:
      [batch, channels] float32 embedding.
    """
    half = channels // 2
    freqs = jnp.exp(
        -jnp.log(jnp.float32(max_time))
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = time.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if channels % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


class Downsample(nn.Module):
    """Symmetric-pad stride-2 conv (or avg-pool) (unet.py:15-30)."""

    channels: int
    resample_with_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resample_with_conv:
            x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
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
    """Nearest 2x + 3x3 SAME conv (unet.py:33-48)."""

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


class ResidualBlock(nn.Module):
    """GN(1e-5)/SiLU/conv + time-MLP broadcast + GN/SiLU/dropout/conv with
    Dense shortcut on channel change (unet.py:368-398).

    Both GN/SiLU/conv chains route through `ops.fused_conv.gn_silu_conv3x3`
    — impl-switchable between the XLA conv emitter, 9-shifted-MXU-dots
    (dodges the emitter's nondeterministic ~4 TF/s cliff on the decoder's
    concat-conv shapes, see ops/fused_conv.py), and the whole-chain Pallas
    kernel.  Params are declared through the raw-param holders, so the
    checkpoint tree is unchanged."""

    channels: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_embedding, *, training: bool = False):
        cin = x.shape[-1]
        x = x.astype(self.dtype)
        g1_scale, g1_bias = GNParams(cin, name="group_norm_1")()
        k1, b1 = Conv3x3Params(self.channels, cin, name="conv2d_1")()
        t = nn.Dense(self.channels, dtype=self.dtype, name="dense")(
            nn.silu(time_embedding)
        )
        h = gn_silu_conv3x3(
            x, g1_scale, g1_bias, k1, b1, time_add=t, num_groups=32, eps=1e-5
        )

        g2_scale, g2_bias = GNParams(self.channels, name="group_norm_2")()
        k2, b2 = Conv3x3Params(self.channels, self.channels,
                               name="conv2d_2")()
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
                h, g2_scale, g2_bias, num_groups=32, eps=1e-5, activate=True
            )
            h = nn.Dropout(self.dropout_rate, deterministic=False)(h)
            h = conv3x3(h, k2, b2)
            return shortcut + h
        return gn_silu_conv3x3(
            h, g2_scale, g2_bias, k2, b2, residual_add=shortcut,
            num_groups=32, eps=1e-5,
        )


class CrossAttention(nn.Module):
    """q from query, k/v from context (self-attention when context is None)
    (unet.py:248-292)."""

    num_heads: int = 8
    size_per_head: int = 64
    dropout_rate: float = 0.0
    hidden_size: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, context=None, *, training: bool = False):
        # Self-attention over long spatial token sequences takes the packed
        # flash path; cross-attention against the short (77-token) text
        # context takes the packed single-block kernel
        # (ops/cross_attention.py).  Either way the projections emit the
        # kernel's flat [B,T,H*Sp] layout directly (pad folded into the
        # weights; heads minor-axis blocked), so q/k/v/out projections are
        # plain matmuls with zero activation relayout on either side.
        from ldm_tf2_tpu.ops.attention import (
            use_packed_cross,
            use_packed_flash,
        )
        from ldm_tf2_tpu.ops.tp import tp_attention_claims, tp_state

        is_self = context is None
        context = query if context is None else context
        if is_self:
            packed = use_packed_flash(
                query.shape[1], query.shape[1], self.num_heads
            )
        else:
            packed = use_packed_cross(
                query.shape[1], context.shape[1], self.num_heads
            )
        # Tensor parallelism: packed kernel attention decomposes over the
        # model axis by head (ops/tp.py shard_map wrappers).  When the
        # head/batch counts do not divide the mesh, drop to the unpacked
        # einsum path, which GSPMD partitions natively — a packed Pallas
        # call would otherwise be replicated (all-gathered) per shard.
        tp_ok = tp_state() is not None and tp_attention_claims(
            self.num_heads, query.shape[0]
        )
        if tp_state() is not None and not tp_ok:
            packed = False
        q = Projection(
            self.num_heads,
            self.size_per_head,
            self.num_heads * self.size_per_head,
            mode="split",
            dtype=self.dtype,
            name="query",
        )(query, packed=packed)
        k = Projection(
            self.num_heads,
            self.size_per_head,
            self.hidden_size,
            mode="split",
            dtype=self.dtype,
            name="key",
        )(context, packed=packed)
        v = Projection(
            self.num_heads,
            self.size_per_head,
            self.hidden_size,
            mode="split",
            dtype=self.dtype,
            name="value",
        )(context, packed=packed)
        if packed and is_self:
            if tp_ok:
                from ldm_tf2_tpu.ops.tp import tp_flash_attention_flat

                out = tp_flash_attention_flat(
                    q, k, v, self.size_per_head**-0.5, self.num_heads
                )
            else:
                from ldm_tf2_tpu.ops.flash_attention import (
                    flash_attention_flat,
                )

                out = flash_attention_flat(
                    q, k, v, self.size_per_head**-0.5, self.num_heads
                )
        elif packed:
            if tp_ok:
                from ldm_tf2_tpu.ops.tp import tp_cross_attention_flat

                out = tp_cross_attention_flat(
                    q, k, v, self.size_per_head**-0.5, self.num_heads
                )
            else:
                from ldm_tf2_tpu.ops.cross_attention import (
                    cross_attention_flat,
                )

                out = cross_attention_flat(
                    q, k, v, self.size_per_head**-0.5, self.num_heads
                )
        else:
            out = dot_product_attention(
                q, k, v, scale=self.size_per_head**-0.5
            )
        out = Projection(
            self.num_heads,
            self.size_per_head,
            self.num_heads * self.size_per_head,
            use_bias=True,
            mode="merge",
            dtype=self.dtype,
            name="output",
        )(out, packed=packed)
        return nn.Dropout(self.dropout_rate, deterministic=not training)(out)


class _DenseParams(nn.Module):
    """Parameter holder shaped/initialized exactly like ``nn.Dense`` (so
    checkpoints are interchangeable) that returns the raw kernel/bias
    instead of applying them — the caller decides between the fused
    Pallas FFN kernel and the unfused XLA chain."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class _LayerNormParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm`` (scale/bias of [C])."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param(
            "scale", nn.initializers.ones, (features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), jnp.float32
        )
        return scale, bias


class GEGLU(nn.Module):
    """value-Dense(C) * gelu(gate-Dense(C)) (unet.py:317-325).  Exposes the
    dense params so FeedForward can route through the fused kernel.

    The reference stores ONE fused [D, 2C] kernel and splits the
    activation (value columns first, gate second); we store TWO leaves
    (``value``/``gate``) computing the identical function.  Rationale:
    under tensor parallelism a column-sharded fused kernel puts the value
    and gate halves on disjoint device groups, so the activation split
    forces a GSPMD reshard mid-FFN; separate leaves column-shard cleanly
    (true Megatron column parallelism, no collective before the product).
    Legacy checkpoints with the fused ``geglu/dense`` leaf are migrated on
    load (checkpoints/manager.py migrate_legacy_params)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def params(self, in_features: int):
        wv, bv = _DenseParams(self.channels, name="value")(in_features)
        wg, bg = _DenseParams(self.channels, name="gate")(in_features)
        return wv, bv, wg, bg

    def __call__(self, x):
        wv, bv, wg, bg = self.params(x.shape[-1])
        v = jnp.dot(x, wv.astype(self.dtype)) + bv.astype(self.dtype)
        g = jnp.dot(x, wg.astype(self.dtype)) + bg.astype(self.dtype)
        return v * nn.gelu(g, approximate=False)


class FeedForward(nn.Module):
    """LN -> GEGLU(4C) -> dropout -> Dense(C) -> +residual
    (unet.py:308-338, the ffn arm of BasicTransformerBlock).

    The LayerNorm params live in the parent block (``layernorm3``) for
    checkpoint parity; their values are passed in.  When dropout is
    inactive and the shape fits, the whole chain runs as one Pallas
    kernel (ops/fused_ffn.py); otherwise the unfused XLA math is used —
    both compute the same function.
    """

    channels: int
    multiplier: int = 4
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ln_scale, ln_bias, *, training: bool = False):
        from ldm_tf2_tpu.ops.fused_ffn import fused_ffn, use_fused_ffn
        from ldm_tf2_tpu.ops.tp import tp_ffn_claims, tp_fused_ffn, tp_state

        hidden = self.channels * self.multiplier
        geglu = GEGLU(hidden, dtype=self.dtype, name="geglu")
        wv, bv, wg, bg = geglu.params(x.shape[-1])
        w2, b2 = _DenseParams(self.channels, name="dense")(hidden)

        dropout_active = training and self.dropout_rate > 0.0
        b, t, d = x.shape
        if not dropout_active and tp_state() is not None:
            # Tensor parallelism: the Pallas kernel composes through the
            # shard_map column x row decomposition (ops/tp.py); when the
            # shard shapes decline, fall through to the unfused math,
            # which GSPMD partitions natively — never a replicated
            # Pallas call.
            if tp_ffn_claims(b, t, d, hidden):
                return tp_fused_ffn(
                    x,
                    ln_scale,
                    ln_bias,
                    wv.astype(self.dtype),
                    bv.astype(self.dtype),
                    wg.astype(self.dtype),
                    bg.astype(self.dtype),
                    w2.astype(self.dtype),
                    b2.astype(self.dtype),
                )
        elif not dropout_active and use_fused_ffn(b, t, d):
            return fused_ffn(
                x,
                ln_scale,
                ln_bias,
                wv.astype(self.dtype),
                bv.astype(self.dtype),
                wg.astype(self.dtype),
                bg.astype(self.dtype),
                w2.astype(self.dtype),
                b2.astype(self.dtype),
            )

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mu),
            0.0,
        )
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        y = (y * ln_scale + ln_bias).astype(self.dtype)
        a = jnp.dot(y, wv.astype(self.dtype)) + bv.astype(self.dtype)
        g = jnp.dot(y, wg.astype(self.dtype)) + bg.astype(self.dtype)
        h = a * nn.gelu(g, approximate=False)
        h = nn.Dropout(self.dropout_rate, deterministic=not training)(h)
        out = jnp.dot(h, w2.astype(self.dtype)) + b2.astype(self.dtype)
        return out + x


class BasicTransformerBlock(nn.Module):
    """Pre-LN(1e-5): self-attn, cross-attn(context), GEGLU FFN — each with
    residual add (unet.py:295-314)."""

    num_heads: int = 8
    size_per_head: int = 64
    dropout_rate: float = 0.1
    hidden_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, training: bool = False):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = (
            CrossAttention(
                self.num_heads,
                self.size_per_head,
                self.dropout_rate,
                dtype=self.dtype,
                name="att_layer1",
            )(ln("layernorm1")(x), training=training)
            + x
        )
        x = (
            CrossAttention(
                self.num_heads,
                self.size_per_head,
                self.dropout_rate,
                self.hidden_size,
                dtype=self.dtype,
                name="att_layer2",
            )(ln("layernorm2")(x), context, training=training)
            + x
        )
        ln3_scale, ln3_bias = _LayerNormParams(name="layernorm3")(
            x.shape[-1]
        )
        # dropout_rate stays at FeedForward's 0.0 default: the reference
        # constructs its ffn with default dropout (unet.py:303, :328)
        x = FeedForward(
            self.num_heads * self.size_per_head,
            dtype=self.dtype,
            name="ffn",
        )(x, ln3_scale, ln3_bias, training=training)
        return x


class SpatialTransformer(nn.Module):
    """GN(1e-6) -> proj_in -> [B,HW,C] transformer block -> proj_out -> +res
    (unet.py:341-365).  proj in/out are Dense layers (the PyTorch 1x1 convs
    squeezed, convert_ckpt_pytorch_to_tf2.py:109,131)."""

    num_heads: int = 8
    size_per_head: int = 40
    hidden_size: int = 512
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, training: bool = False):
        b, h, w, c = x.shape
        y = GroupNorm(
            num_groups=32, epsilon=1e-6, dtype=self.dtype, name="group_norm"
        )(x)
        y = nn.Dense(
            self.num_heads * self.size_per_head, dtype=self.dtype, name="proj_in"
        )(y)
        y = y.reshape(b, h * w, c)
        y = BasicTransformerBlock(
            self.num_heads,
            self.size_per_head,
            self.dropout_rate,
            self.hidden_size,
            dtype=self.dtype,
            name="block",
        )(y, context, training=training)
        y = y.reshape(b, h, w, c)
        y = nn.Dense(
            self.num_heads * self.size_per_head, dtype=self.dtype, name="proj_out"
        )(y)
        return x + y


class InputBlock(nn.Module):
    """Residual(+spatial transformer) or downsample (unet.py:141-175)."""

    channels: int
    dropout_rate: float = 0.1
    use_spatial_transformer: bool = False
    use_downsample: bool = False
    num_heads: int = 8
    size_per_head: int = 40
    hidden_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_embedding=None, context=None, *, training=False):
        if self.use_downsample:
            return Downsample(self.channels, dtype=self.dtype, name="downsample")(x)
        x = ResidualBlock(
            self.channels, self.dropout_rate, dtype=self.dtype, name="residual"
        )(x, time_embedding, training=training)
        if self.use_spatial_transformer:
            x = SpatialTransformer(
                self.num_heads,
                self.size_per_head,
                self.hidden_size,
                self.dropout_rate,
                dtype=self.dtype,
                name="spatial_transformer",
            )(x, context, training=training)
        return x


class MiddleBlock(nn.Module):
    """res -> spatial transformer -> res (unet.py:178-209)."""

    channels: int
    context_channels: int = 1280
    num_heads: int = 8
    size_per_head: int = 160
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_embedding, context, *, training=False):
        x = ResidualBlock(
            self.channels, self.dropout_rate, dtype=self.dtype, name="residual1"
        )(x, time_embedding, training=training)
        x = SpatialTransformer(
            self.num_heads,
            self.size_per_head,
            self.context_channels,
            self.dropout_rate,
            dtype=self.dtype,
            name="spatial_transformer",
        )(x, context, training=training)
        x = ResidualBlock(
            self.channels, self.dropout_rate, dtype=self.dtype, name="residual2"
        )(x, time_embedding, training=training)
        return x


class OutputBlock(nn.Module):
    """Residual(+spatial transformer)(+upsample) (unet.py:212-245)."""

    channels: int
    dropout_rate: float = 0.1
    use_spatial_transformer: bool = False
    use_upsample: bool = False
    num_heads: int = 8
    size_per_head: int = 40
    hidden_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_embedding, context=None, *, training=False):
        x = ResidualBlock(
            self.channels, self.dropout_rate, dtype=self.dtype, name="residual"
        )(x, time_embedding, training=training)
        if self.use_spatial_transformer:
            x = SpatialTransformer(
                self.num_heads,
                self.size_per_head,
                self.hidden_size,
                self.dropout_rate,
                dtype=self.dtype,
                name="spatial_transformer",
            )(x, context, training=training)
        if self.use_upsample:
            x = Upsample(self.channels, dtype=self.dtype, name="upsample")(x)
        return x


class UNet(nn.Module):
    """Text-conditioned epsilon predictor (unet.py:51-138; config
    all_in_one_config.yaml:95-102).

    ``attention_resolutions`` is kept for config-surface parity but — like
    the reference — the actual placement rule is "spatial transformers on
    every level except the deepest" (unet.py:85,110).
    """

    model_channels: int = 320
    out_channels: int = 4
    num_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    dropout_rate: float = 0.1
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    context_channels: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        time,
        context=None,
        *,
        training: bool = False,
        shallow_cache=None,
        return_cache: bool = False,
        cache_levels: int = 1,
    ):
        """
        Args:
          x: [batch, height, width, in_channels] noisy latents (NHWC).
          time: [batch] timesteps.
          context: [batch, seq_len, context_channels] text embeddings.
          shallow_cache: optional cached deep-feature tensor from a previous
            ``return_cache=True`` call.  When given, only the shallowest
            ``cache_levels`` levels (input blocks, output blocks, in/out
            convs) are computed and the cached tensor substitutes for the
            entire deep sub-U-Net — the DeepCache / encoder-propagation
            acceleration (Ma et al. 2023; Li et al., arXiv:2312.09608):
            deep features change slowly across adjacent denoise steps, so
            reuse them for a few steps and refresh periodically.
          return_cache: when True (full pass), additionally return the deep
            boundary feature to feed later shallow passes.
          cache_levels: how many shallow levels stay fresh (static; 1 =
            only the outermost resolution level).
        Returns:
          [batch, height, width, out_channels] predicted noise; with
          ``return_cache=True``, a ``(noise, cache)`` tuple.
        """
        num_levels = len(self.channel_mult)
        shallow = shallow_cache is not None
        if shallow or return_cache:
            if not 1 <= cache_levels <= num_levels - 1:
                raise ValueError(
                    f"cache_levels must be in [1, {num_levels - 1}], got "
                    f"{cache_levels}"
                )
        if shallow and return_cache:
            raise ValueError("a shallow pass cannot produce a cache")

        h = nn.Conv(
            self.model_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="conv_in",
        )(x)

        t = get_time_embedding(time, self.model_channels)
        t = nn.Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_dense1"
        )(t.astype(self.dtype))
        t = nn.Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_dense2"
        )(nn.silu(t))

        # Input trunk: skip activations pushed after every block
        # (unet.py:129-132).  Block outputs are tagged with
        # `checkpoint_name` (identity outside jax.checkpoint) so the
        # trainer's selective-remat policy can keep exactly the per-block
        # boundary activations and recompute only block interiors
        # (training/ldm_trainer.py remat_unet="blocks").
        hiddens = [h]
        idx = 0
        for i, mult in enumerate(self.channel_mult):
            if shallow and i >= cache_levels:
                break
            for _ in range(self.num_blocks):
                h = InputBlock(
                    channels=self.model_channels * mult,
                    dropout_rate=self.dropout_rate,
                    use_spatial_transformer=i < num_levels - 1,
                    num_heads=self.num_heads,
                    size_per_head=(self.model_channels // self.num_heads) * mult,
                    hidden_size=self.context_channels,
                    dtype=self.dtype,
                    name=f"input_block_{idx}",
                )(h, t, context, training=training)
                h = checkpoint_name(h, "unet_block")
                hiddens.append(h)
                idx += 1
            # A shallow pass skips level cache_levels-1's downsample: its
            # output is a skip input only to the (cached) deeper levels.
            if i < num_levels - 1 and not (shallow and i == cache_levels - 1):
                h = InputBlock(
                    channels=self.model_channels * mult,
                    use_downsample=True,
                    dtype=self.dtype,
                    name=f"input_block_{idx}",
                )(h)
                h = checkpoint_name(h, "unet_block")
                hiddens.append(h)
                idx += 1

        if not shallow:
            h = MiddleBlock(
                channels=self.model_channels * self.channel_mult[-1],
                context_channels=self.context_channels,
                num_heads=self.num_heads,
                size_per_head=(self.model_channels // self.num_heads)
                * self.channel_mult[-1],
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name="middle_block",
            )(h, t, context, training=training)
            h = checkpoint_name(h, "unet_block")

        # Output trunk: skip concat then block (unet.py:134-136).  Block
        # numbering counts from the deepest level so shallow passes bind
        # the same param names as full passes.
        cache_out = None
        levels = list(enumerate(self.channel_mult))[::-1]
        idx = 0
        if shallow:
            levels = levels[num_levels - cache_levels:]
            idx = (num_levels - cache_levels) * (self.num_blocks + 1)
            h = shallow_cache.astype(self.dtype)
        for i, mult in levels:
            if return_cache and i == cache_levels - 1 and cache_out is None:
                # Deep boundary: everything above here is what a later
                # shallow pass recomputes; everything below is the cache.
                cache_out = h
            for j in range(self.num_blocks + 1):
                h = jnp.concatenate([h, hiddens.pop()], axis=-1)
                h = OutputBlock(
                    channels=self.model_channels * mult,
                    dropout_rate=self.dropout_rate,
                    use_spatial_transformer=i < num_levels - 1,
                    use_upsample=i > 0 and j == self.num_blocks,
                    num_heads=self.num_heads,
                    size_per_head=(self.model_channels // self.num_heads) * mult,
                    hidden_size=self.context_channels,
                    dtype=self.dtype,
                    name=f"output_block_{idx}",
                )(h, t, context, training=training)
                h = checkpoint_name(h, "unet_block")
                idx += 1

        h = GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=self.dtype, name="group_norm",
            activation="silu",
        )(h)
        out = nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="conv_out",
        )(h)
        if return_cache:
            return out, cache_out
        return out
