"""BERT-style pre-LN text encoder (the LDM condition-stage model).

Counterpart of /root/reference/transformer.py:218-272.  Production config
(all_in_one_config.yaml:57-65): 32 layers, hidden 1280, 8 heads x 64 — note
the attention width (8*64=512) is intentionally narrower than the hidden
size, faithful to the CompVis checkpoint.

The head-split/merge projections keep the reference's exact kernel layouts —
split: [hidden, heads, size_per_head], merge: [heads, size_per_head, hidden]
(transformer.py:43-50) — because this layout **is the checkpoint contract**:
the PyTorch converter reshapes `[out, in]` matrices into it
(convert_ckpt_pytorch_to_tf2.py:28-41), and we preserve the same tensor
layout in our Orbax checkpoints.

The reference's unused `_logits_layer` (transformer.py:251) and its
never-taken `attention_mask` path referencing an undefined ``NEG_INF``
(transformer.py:110) are dropped — SURVEY.md §7 "bugs to fix, not port".
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ldm_tf2_tpu.ops.attention import dot_product_attention

LAYER_NORM_EPS = 1e-5


class Projection(nn.Module):
    """Head split/merge einsum dense (transformer.py:14-73).

    mode="split":  [B,T,D] x [D,H,S] -> [B,T,H,S]
    mode="merge":  [B,T,H,S] x [H,S,D] -> [B,T,D]

    ``packed=True`` (call-time) emits/consumes the flash kernel's flat
    layout [B,T,H*Sp] with each head's dim zero-padded to the 128-lane
    tile and heads laid out along the minor axis — the NATURAL output
    layout of the projection matmul, so neither side needs any activation
    relayout (the earlier [B,H,T,Sp] packed layout still cost one XLA
    transpose per projection: "ntd,dhs->nhts" lowers to matmul + 0.61 ms
    copy at the 256^2 b32 L0 shape).  The pad is folded into the
    projection weights (a few-hundred-KB weight copy).  Param shapes are
    identical in both modes (checkpoint contract preserved — see this
    repo's checkpoints/convert_pytorch.py, which mirrors the reference
    repo's converter, convert_ckpt_pytorch_to_tf2.py:28-41).
    """

    num_heads: int
    size_per_head: int
    hidden_size: int | None = None
    use_bias: bool = False
    mode: str = "split"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, packed: bool = False):
        if self.mode not in ("split", "merge"):
            raise ValueError('"mode" must be either "split" or "merge".')
        hidden = (
            self.num_heads * self.size_per_head
            if self.hidden_size is None
            else self.hidden_size
        )
        if packed:
            from ldm_tf2_tpu.ops.flash_attention import lane_pad

            pad = lane_pad(self.size_per_head) - self.size_per_head
        if self.mode == "merge":
            kernel = self.param(
                "kernel",
                nn.initializers.glorot_uniform(batch_axis=(0,)),
                (self.num_heads, self.size_per_head, hidden),
                jnp.float32,
            )
            if packed:
                kernel = jnp.pad(kernel, ((0, 0), (0, pad), (0, 0)))
                kernel = kernel.reshape(
                    self.num_heads * (self.size_per_head + pad), hidden
                )
                out = jnp.einsum(
                    "ntk,kd->ntd", x, kernel.astype(self.dtype)
                )
            else:
                out = jnp.einsum(
                    "nths,hsd->ntd", x, kernel.astype(self.dtype)
                )
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (hidden,), jnp.float32
                )
                out = out + bias.astype(self.dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.glorot_uniform(batch_axis=(2,)),
                (hidden, self.num_heads, self.size_per_head),
                jnp.float32,
            )
            if packed:
                kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad)))
                kernel = kernel.reshape(
                    hidden, self.num_heads * (self.size_per_head + pad)
                )
                out = jnp.einsum(
                    "ntd,dk->ntk", x, kernel.astype(self.dtype)
                )
            else:
                out = jnp.einsum(
                    "ntd,dhs->nths", x, kernel.astype(self.dtype)
                )
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.size_per_head,),
                    jnp.float32,
                )
                if packed:
                    bias = jnp.tile(jnp.pad(bias, (0, pad)),
                                    (self.num_heads,))
                out = out + bias.astype(self.dtype)
        return out


class Attention(nn.Module):
    """Multi-head self-attention with Projection-shaped params
    (transformer.py:76-120)."""

    num_heads: int
    size_per_head: int
    dropout_rate: float = 0.0
    hidden_size: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, context, *, training: bool = False):
        proj = lambda name, mode, bias=False: Projection(
            self.num_heads,
            self.size_per_head,
            self.hidden_size,
            use_bias=bias,
            mode=mode,
            dtype=self.dtype,
            name=name,
        )
        q = proj("query", "split")(query)
        k = proj("key", "split")(context)
        v = proj("value", "split")(context)
        out = dot_product_attention(q, k, v, scale=self.size_per_head**-0.5)
        out = proj("output", "merge", bias=True)(out)
        return out


class FeedForwardNetwork(nn.Module):
    """dense(filter, gelu) -> dropout -> dense(hidden)
    (transformer.py:123-145)."""

    hidden_size: int
    filter_size: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = nn.Dense(self.filter_size, dtype=self.dtype, name="filter")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(x)


class EncoderLayer(nn.Module):
    """Pre-LN: LN -> MHA -> dropout -> +res; LN -> FFN -> dropout -> +res
    (transformer.py:148-182)."""

    hidden_size: int
    num_heads: int
    size_per_head: int
    filter_size: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        y = nn.LayerNorm(
            epsilon=LAYER_NORM_EPS, dtype=self.dtype, name="layernorm_mha"
        )(x)
        y = Attention(
            self.num_heads,
            self.size_per_head,
            self.dropout_rate,
            self.hidden_size,
            dtype=self.dtype,
            name="mha",
        )(y, y, training=training)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(y) + x

        y = nn.LayerNorm(
            epsilon=LAYER_NORM_EPS, dtype=self.dtype, name="layernorm_ffn"
        )(x)
        y = FeedForwardNetwork(
            self.hidden_size,
            self.filter_size,
            self.dropout_rate,
            dtype=self.dtype,
            name="ffn",
        )(y, training=training)
        return nn.Dropout(self.dropout_rate, deterministic=not training)(y) + x


class TransformerModel(nn.Module):
    """Token + learned positional embeddings -> N pre-LN layers -> final LN
    (transformer.py:218-272).  Output [B, seq, hidden] is the U-Net
    cross-attention context."""

    vocab_size: int
    encoder_stack_size: int = 6
    hidden_size: int = 512
    num_heads: int = 8
    size_per_head: int = 64
    max_seq_len: int = 77
    filter_size: int = 2048
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, *, training: bool = False):
        seq_len = token_ids.shape[1]
        x = nn.Embed(
            self.vocab_size,
            self.hidden_size,
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="token_embedding",
        )(token_ids)
        pos = nn.Embed(
            self.max_seq_len,
            self.hidden_size,
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="positional_embedding",
        )(jnp.arange(seq_len)[None])
        x = x + pos
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        for i in range(self.encoder_stack_size):
            x = EncoderLayer(
                self.hidden_size,
                self.num_heads,
                self.size_per_head,
                self.filter_size,
                self.dropout_rate,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, training=training)
        return nn.LayerNorm(
            epsilon=LAYER_NORM_EPS, dtype=self.dtype, name="layernorm_out"
        )(x)
