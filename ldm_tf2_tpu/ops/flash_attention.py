"""Blockwise online-softmax (flash) attention — Pallas TPU kernel.

Purpose: the U-Net's spatial self-attention runs over H*W tokens — 1024 at
256x256 sampling, 4096 at 512x512, 16384 at 1024x1024 (SURVEY.md §5
long-context row).  The XLA path materializes the [B, H, Q, C] logits tensor
in HBM; this kernel keeps everything in VMEM with the standard
one-pass online softmax, so memory is O(Q·S) instead of O(Q·C) and the two
matmuls stay back-to-back on the MXU.

Layout contract matches `ldm_tf2_tpu.ops.attention`:
  q [B, Q, H, S], k/v [B, C, H, S] -> out [B, Q, H, S].

TPU specifics:
* head dim S is zero-padded to a multiple of 128 (lane width).  Zero-pad of
  q/k leaves the logits unchanged; zero-pad of v adds zero output columns
  that are sliced off.  The model family's head dims (40/80/160) make this
  up to 3.2x redundant FLOPs on the QK matmul, but flash only engages at
  large Q·C where HBM traffic, not MXU time, dominates.
* KV is processed in BK-sized VMEM blocks via fori_loop with (acc, m, l)
  carries — no data-dependent control flow, fully unrollable by Mosaic.
* grid = (B*H, Q/BQ): each program owns one q-block of one batch-head.

Differentiation: gradients fall back to the XLA attention vjp via
custom_vjp (mathematically identical attention; the backward recomputes
instead of saving the logits).  A fused flash backward kernel is a later
optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k):
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, Sp]
    block_q, sp = q.shape
    num_kv_blocks = k_ref.shape[1] // block_k

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        # [BQ, BK] logits on the MXU
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # mask padded keys (kv_len may not be a BK multiple)
        key_idx = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(key_idx < kv_len, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((block_q, sp), jnp.float32)
    m = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale):
    b, q_len, h, s = q.shape
    kv_len = k.shape[1]
    sp = _round_up(s, _LANE)
    block_q = min(512, _round_up(q_len, 8))
    block_k = min(1024, _round_up(kv_len, _LANE))
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def to_bh(x, length, pad_len):
        # [B, T, H, S] -> [B*H, pad_T, Sp]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, s)
        return jnp.pad(x, ((0, 0), (0, pad_len - length), (0, sp - s)))

    qt = to_bh(q, q_len, q_pad)
    kt = to_bh(k, kv_len, kv_pad)
    vt = to_bh(v, kv_len, kv_pad)

    grid = (b * h, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=kv_len, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, sp), lambda bh, i: (bh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kv_pad, sp), lambda bh, i: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kv_pad, sp), lambda bh, i: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, sp), lambda bh, i: (bh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, q_pad, sp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * q_len * kv_len * sp,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize * (q_pad // block_q)
                + v.size * v.dtype.itemsize * (q_pad // block_q)
            ),
            transcendentals=b * h * q_len * kv_len,
        ),
    )(qt, kt, vt)

    out = out[:, :q_len, :s].reshape(b, h, q_len, s)
    return jnp.transpose(out, (0, 2, 1, 3))


def _xla_reference(q, k, v, scale):
    logits = jnp.einsum(
        "bqhs,bchs->bhqc", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqc,bchs->bqhs", weights, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale):
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
