"""Blockwise online-softmax (flash) attention — Pallas TPU kernel.

Purpose: the U-Net's spatial self-attention and the autoencoder's
single-head attention run over H*W tokens — 1024 at 256x256, 4096 at
512x512, 16384 at 1024x1024 (SURVEY.md §5 long-context row).  The XLA path
materializes the [B, H, Q, C] logits tensor in HBM; this kernel streams
KV blocks through VMEM with the one-pass online softmax, so HBM traffic is
O(Q·S + C·S) and the working set is a few blocks regardless of sequence
length.

Layout contract matches `ldm_tf2_tpu.ops.attention`:
  q [B, Q, H, S], k/v [B, C, H, S] -> out [B, Q, H, S].

Kernel structure:
* grid = (B*H, Q/BQ, C/BK).  TPU grids execute sequentially with the last
  axis minor, so each (bh, qi) pair sweeps its KV blocks in order while the
  (acc, m, l) state lives in VMEM scratch (scratch persists across grid
  steps); the normalized output is written once on the final KV block via
  `pl.when`.
* Pipelining of the k/v block HBM->VMEM copies is automatic via BlockSpecs.
* head dim S is zero-padded to the 128 lane width (zero-pad of q/k leaves
  logits unchanged; zero columns of v are sliced off the output).

Differentiation: gradients fall back to the XLA attention vjp via
custom_vjp (mathematically the same function; backward recomputes instead
of saving logits).  A fused flash backward kernel is a later optimization.
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


def _pick_blocks(sp: int) -> tuple[int, int]:
    """Largest (block_q, block_k) whose VMEM working set fits.

    Block-size sweep on v5e (tools/bench_flash.py): 1024/1024 is ~30-35%
    faster than 512/512 at 1024-4096 tokens with sp=128 (fewer grid steps,
    fewer KV re-reads: KV HBM traffic scales with q_len/block_q); at
    sp=512 the same blocks overflow VMEM (remote compile failure), and
    1024/512 is the measured best that fits.  Working-set model:
    (block_q + 2*block_k) * sp * 8 bytes [f32 q+acc, f32 k+v, double
    buffering] against a ~9 MiB budget.
    """
    budget = 9 * 1024 * 1024
    for bq, bk in ((1024, 1024), (1024, 512), (512, 512), (512, 256),
                   (256, 256), (256, 128), (128, 128)):
        if (bq + 2 * bk) * sp * 8 <= budget:
            return bq, bk
    return 128, 128


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, kv_len,
    block_k, masked,
):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, Sp]
    k = k_ref[0].astype(jnp.float32)  # [BK, Sp]
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    if masked:
        # Only reached when kv_len is not a block_k multiple: the padded
        # tail keys must not contribute.  Static-skipped otherwise — the
        # iota/compare/where over the full [BQ, BK] logits block is pure
        # VPU work repeated every grid step.
        key_idx = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(key_idx < kv_len, s, _NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kv_idx == num_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, block_q=None, block_k=None):
    b, q_len, h, s = q.shape
    kv_len = k.shape[1]
    # Head dim IS explicitly padded to the 128 lane width: measured ~18%
    # faster than letting Mosaic mask a sub-128 minor dim per-op (5.2 vs
    # 6.1 ms for [32,1024,8,40] bf16 on v5e), i.e. the one extra HBM pass
    # of jnp.pad is cheaper than implicit lane masking in the inner loop.
    sp = _round_up(s, _LANE)
    if block_q is None or block_k is None:
        auto_q, auto_k = _pick_blocks(sp)
        block_q = block_q or min(auto_q, _round_up(q_len, 8))
        block_k = block_k or min(auto_k, _round_up(kv_len, _LANE))
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def to_bh(x, length, pad_len):
        # [B, T, H, S] -> [B*H, pad_T, Sp]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, s)
        return jnp.pad(x, ((0, 0), (0, pad_len - length), (0, sp - s)))

    qt = to_bh(q, q_len, q_pad)
    kt = to_bh(k, kv_len, kv_pad)
    vt = to_bh(v, kv_len, kv_pad)

    grid = (b * h, q_pad // block_q, kv_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
            masked=kv_len != kv_pad,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, sp), lambda bh, qi, ki: (bh, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, sp), lambda bh, qi, ki: (bh, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, sp), lambda bh, qi, ki: (bh, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, sp), lambda bh, qi, ki: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, q_pad, sp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, sp), jnp.float32),  # acc
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * q_len * kv_len * sp,
            bytes_accessed=(
                qt.size * qt.dtype.itemsize
                + (kt.size + vt.size) * kt.dtype.itemsize
                * (q_pad // block_q)
                + qt.size * qt.dtype.itemsize
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
