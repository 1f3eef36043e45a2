"""Single-kv-block fused attention for short context lengths (Pallas).

Counterpart of the reference's cross-attention math
(/root/reference/unet.py:269-287: q from the spatial tokens, k/v from the
77-token text context) — specialized for the case where the WHOLE key/value
sequence fits one VMEM block, so none of the flash kernel's online-softmax
machinery (f32 accumulator, running max/sum rescales, multi-step kv grid)
is needed: one QK dot, one in-register softmax, one PV dot, output written
once.

Why it exists (round-2 session-6 trace, 256^2 CFG b32 eval,
tools/roofline_report.py + HLO op_name attribution): the XLA path for the
kv=77 cross-attentions materializes the f32 [B,H,T,77] logits to HBM twice
around the softmax in a transposed {2,3,1,0} layout and emits the QK
contraction as a reduce-window convolution — 2.28 ms/eval across the five
level-0 sites (0.46 ms/site) against a ~0.1 ms/site compute+bandwidth
bound.  The generic flash kernel measured 0.94 ms at this shape
(tools/ab_attn_dispatch.py) — its per-step scratch traffic dwarfs the tiny
kv block — hence this dedicated kernel.

Layout: the zero-copy flat packed convention of
ops/flash_attention.py::flash_attention_flat — q [B, Tq, H*Sp],
k/v [B, C, H*Sp] with each head's Sp = lane_pad(size_per_head) column block
zero-padded into the projection weights (models/transformer.py Projection,
packed=True).  Zero lane padding is self-consistent here: padded q/k lanes
contribute nothing to the QK contraction and padded v lanes produce zero
output columns, which the packed merge projection's zero weight rows fold
away.  Padded kv POSITIONS (C -> 128 sublanes) do need explicit masking —
zero-padded k rows give logit 0, not -inf — applied before the softmax.

Backward: custom_vjp recomputing through the XLA reference math (the
pattern of ops/fused_ffn.py) — sampling never differentiates this, the
trainer pays one cheap recompute.

MEASURED NEGATIVE at the 256^2 shapes — default OFF (ops/attention.py
``_PACKED_CROSS_ENABLED``).  v5e, 2026-08-18:

* microbench (tools/ab_cross_attention.py, B=48): kernel loses at every
  level — L0 0.485 vs 0.431 ms, L1 0.287 vs 0.032, L2 0.227 vs 0.032;
  worse still sandwiched between projections.
* pipeline (bench.py A/B): 6.39 img/s with the kernel vs 6.78 without.

Why: with head dim 40 the packed layout pays 3.2x lane-padded q/o HBM
traffic (200 MB vs 63 MB unpadded at L0 CFG b48) plus strided
head-column DMA — more than the f32 logits round-trip it saves.  The
XLA path's in-program cost (~0.46 ms/site at L0, scan-body HLO) is
within ~1.5x of its own formulation's bandwidth bound, and the
alternatives are all worse on paper: an unpadded-q kernel needs
40-lane-offset slicing Mosaic cannot address; a block-diagonal
all-heads-at-once formulation wastes 8-13x MXU cycles (K=320 against
per-head 40 — same economics as the earlier head-dim-packing negative);
3-heads-per-128-lane packing lands at ~0.35 ms/site best-case, inside
the noise of XLA's 0.46.  ALSO: XLA's loop-invariant code motion
already hoists all 16 sites' context k/v projections out of the
sampler's 50-step scan (verified in the pipeline while-body carried
state: bf16[B,77,8,{40,80,160}] tuple elements), so precomputing kv
buys nothing either.

The kernel stays as a tested opt-in (`set_packed_cross(True)`): at head
dims near the 128-lane tile (e.g. the middle block's 160, or any
config with size_per_head >= 96) the padding penalty shrinks and the
fusion wins cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldm_tf2_tpu.ops.flash_attention import _LANE, _round_up

_NEG_INF = -1e30

# Whole-kv block must fit the VMEM working set alongside the q tile; 512
# lanes of f32 logits at block_q 1024 is 2 MiB — comfortable.  77 (text
# context) and 256 (level-1 spatial self-attention) both qualify.
MAX_KV_PAD = 512


def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, kv_pad):
    q = q_ref[0]  # [TQ, Sp]
    k = k_ref[0]  # [KVp, Sp]
    v = v_ref[0]  # [KVp, Sp]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, KVp]
    s = s * scale
    if kv_len != kv_pad:
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= kv_len
        s = jnp.where(mask, _NEG_INF, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, Sp]
    o_ref[0] = o.astype(o_ref.dtype)


def _pick_block_q(q_len: int, kv_pad: int, sp: int) -> int:
    """Largest power-of-two q tile that divides q_len and keeps the
    working set (q + o + f32 logits + f32 exp) under ~8 MiB."""
    budget = 8 * 1024 * 1024
    for tq in (1024, 512, 256, 128, 64, 32, 16, 8):
        if q_len % tq:
            continue
        working = tq * sp * 2 * 2 + 2 * tq * kv_pad * 4 + 2 * kv_pad * sp * 2
        if working <= budget:
            return tq
    return 8


def _block_attention_flat(q, k, v, scale, h, block_q=None):
    b, q_len, hsp = q.shape
    kv_len = k.shape[1]
    sp = hsp // h
    kv_pad = max(_round_up(kv_len, _LANE), _LANE)
    assert kv_pad <= MAX_KV_PAD, (kv_len, kv_pad)
    if kv_pad != kv_len:
        k = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    tq = block_q or _pick_block_q(q_len, kv_pad, sp)
    sel_q = lambda bh, i: (bh // h, i, bh % h)
    sel_kv = lambda bh, i: (bh // h, 0, bh % h)
    q_spec = pl.BlockSpec((1, tq, sp), sel_q, memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, kv_pad, sp), sel_kv, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _cross_kernel, scale=scale, kv_len=kv_len, kv_pad=kv_pad
        ),
        grid=(b * h, q_len // tq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * q_len * kv_pad * sp,
            bytes_accessed=2 * q.size * q.dtype.itemsize
            + (k.size + v.size) * k.dtype.itemsize,
            transcendentals=b * h * q_len * kv_pad,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


def _xla_reference_flat(q, k, v, scale, h):
    """Identical math through XLA on the flat layout (vjp recompute path)."""
    b, q_len, hsp = q.shape
    kv_len = k.shape[1]
    sp = hsp // h
    qh = q.reshape(b, q_len, h, sp)
    kh = k.reshape(b, kv_len, h, sp)
    vh = v.reshape(b, kv_len, h, sp)
    logits = jnp.einsum(
        "bqhs,bchs->bhqc", qh, kh, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqc,bchs->bqhs", weights, vh)
    return out.reshape(b, q_len, hsp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cross_attention_flat(q, k, v, scale, num_heads):
    """Fused short-kv attention on the flat packed layout.

    Args:
      q: [B, Tq, H*Sp] queries (packed projections, lane pad zeroed).
      k, v: [B, C, H*Sp] with C <= MAX_KV_PAD (77 for the text context).
      scale: logit scale (size_per_head ** -0.5 — the REAL head dim,
        not the padded Sp).
      num_heads: H.
    """
    return _block_attention_flat(q, k, v, scale, num_heads)


def _fwd(q, k, v, scale, h):
    return _block_attention_flat(q, k, v, scale, h), (q, k, v)


def _bwd(scale, h, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference_flat(q, k, v, scale, h), q, k, v
    )
    return vjp(g)


cross_attention_flat.defvjp(_fwd, _bwd)
