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

Differentiation: a fused Pallas backward (FlashAttention-2 recipe) is the
default — the forward additionally saves the per-row logsumexp (broadcast
over a 128-lane minor dim, the layout jax's own TPU flash kernels use),
``di = rowsum(dO*O)`` is precomputed by XLA, and two kernels stream KV
(resp. Q) blocks through VMEM: dq accumulates over KV blocks, dk/dv over Q
blocks.  ``set_flash_backward("xla")`` restores the recompute-via-XLA vjp
for A/B testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG_INF = -1e30

# Serving-only switch: run the flash forward's PV contraction in int8
# (p as 7-bit fixed point — exp(s - m) is in [0, 1] so the scale is the
# constant 1/127 — and the v block quantized per kv-block in-kernel).
# The QK dot stays bf16: its contraction is the lane-padded head dim
# (128), too shallow for the int8 MXU mode to pay (tools/
# probe_int8_attn.py: qk_s8 ties/loses, pv_s8 1.7-3x bare).
#
# MEASURED NEGATIVE on v5e — NOT dispatched by default int8 mode
# (tools/ab_pv_int8.py, full kernel, device profiler):
#   256^2 L0 b48 t1024   bf16 1.538   int8pv 1.959  (-27%)
#   512^2 L0 b32 t4096       14.684          14.759  (tie)
#   256^2 L1 b48 t256         0.467           0.402  (XLA path anyway)
# The bare PV dot's 3x evaporates: the in-kernel p round/astype over the
# [BQ, BK] block plus the v-block quantize are VPU work that serializes
# against the MXU dots — the same VPU-bound failure mode as the bf16
# whole-chain conv kernel (ops/fused_conv.py finding #2).  Kept as a
# tested opt-in (`tpu.quantize_attention: int8pv`) for future hardware
# where the VPU:MXU ratio differs; gradients are NOT routed through it
# (the custom_vjp backward recomputes in bf16/f32 — sampling takes no
# gradients).
_PV_INT8 = False


def set_flash_pv_int8(enabled: bool) -> None:
    global _PV_INT8
    _PV_INT8 = bool(enabled)


def get_flash_pv_int8() -> bool:
    return _PV_INT8


def _pallas_call(*args, **kwargs):
    """pl.pallas_call with the classic interpreter on non-TPU backends
    (like every other kernel module) — the newer
    `force_tpu_interpret_mode` machinery deadlocks in its
    _allocate_buffer io_callbacks when a kernel executes under a
    multi-device shard_map on the CPU mesh (observed jax 0.9, 8 virtual
    devices), which the TP composition tests exercise."""
    kwargs.setdefault("interpret", jax.default_backend() != "tpu")
    return pl.pallas_call(*args, **kwargs)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_blocks(sp: int, kv_len: int = 0) -> tuple[int, int]:
    """Largest (block_q, block_k) whose VMEM working set fits.

    Block-size sweep on v5e (tools/bench_flash.py): 1024/1024 is ~30-35%
    faster than 512/512 at 1024-4096 tokens with sp=128 (fewer grid steps,
    fewer KV re-reads: KV HBM traffic scales with q_len/block_q); at
    sp=512 the same blocks overflow VMEM (remote compile failure), and
    1024/512 is the measured best that fits.  Working-set model:
    (block_q + 2*block_k) * sp * 8 bytes [f32 q+acc, f32 k+v, double
    buffering] against a ~9 MiB budget.

    Round-2 flat-layout re-sweep (tools/sweep_flash_fwd.py, profiler
    timer, v5e): at the 512^2-L0 shape (b32 t4096 sp128) (1024, 2048)
    beats (1024, 1024) 14.68 vs 15.07 ms (−2.6%: halving the q-stream
    KV re-reads still wins at these lengths); (1024, 4096) and (2048, *)
    fail to compile.  At t=1024 (256^2 L0, CFG b48) (1024, 1024) remains
    best (1.538 ms; k512 3.11, q512 1.78).  So bk=2048 is claimed only
    when the kv stream is long enough to amortize it.
    """
    budget = 9 * 1024 * 1024
    blocks = ((1024, 1024), (1024, 512), (512, 512), (512, 256),
              (256, 256), (256, 128), (128, 128))
    if kv_len >= 2048:
        blocks = ((1024, 2048),) + blocks
    for bq, bk in blocks:
        if (bq + 2 * bk) * sp * 8 <= budget:
            return bq, bk
    return 128, 128


def _pick_blocks_bwd(sp: int, q_len: int = 4096) -> tuple[int, int]:
    """(block_q, block_k) for the backward kernels.

    sp=128 sizes come from an on-device sweep (/tmp-tooling recorded in
    NEXT.md): at 1024 tokens (512, 1024) is 27% faster than (1024, 512) —
    two grid steps per stream let the input pipeline double-buffer, where
    a single-step grid cannot overlap; at 4096 tokens (1024, 1024) wins.
    Larger head dims fall back to the VMEM residency model (measured
    optimal (512, 256) at sp=512): the dq kernel keeps q/do/dq_acc/lse/di
    per q-block and streams k,v; the dkv kernel keeps k/v/dk_acc/dv_acc
    per kv-block and streams q/do/lse/di; whichever is larger must fit
    the ~9 MiB budget used by the forward's `_pick_blocks`.
    """
    if sp <= 128:
        return (512, 1024) if q_len <= 1024 else (1024, 1024)
    budget = 9 * 1024 * 1024
    for bq, bk in ((1024, 512), (512, 512), (512, 256), (256, 256),
                   (256, 128), (128, 128)):
        dq_set = (3 * bq * sp + 2 * bq * _LANE + 4 * bk * sp + bq * sp) * 4
        dkv_set = (6 * bk * sp + 2 * (2 * bq * sp + 2 * bq * _LANE)) * 4
        if max(dq_set, dkv_set) <= budget:
            return bq, bk
    return 128, 128


def _flash_kernel(
    q_ref, k_ref, v_ref, *rest, scale, kv_len, block_k, masked,
    save_residuals, pv_int8=False,
):
    if save_residuals:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
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
    if pv_int8:
        # PV in the MXU's 2x int8 mode: p in [0, 1] quantizes to 7-bit
        # fixed point with the CONSTANT scale 1/127 (no amax pass);
        # the v block gets a per-kv-block dynamic scale (one VPU reduce
        # over [BK, Sp] — 8x smaller than the exp above).  The
        # normalizer l sums the SAME quantized p (dequantized), keeping
        # numerator and denominator consistent: attention weights below
        # the 1/254 rounding threshold drop from BOTH, so the output is
        # a correctly-normalized average over the surviving keys rather
        # than an attenuated one (dropping them from the numerator only
        # would shrink the output by the truncated mass — unbounded
        # relative error in diffuse-attention rows).
        p8 = jnp.round(p * 127.0).astype(jnp.int8)
        pq = p8.astype(jnp.float32) * (1.0 / 127.0)
        l_new = l_prev * alpha + jnp.sum(pq, axis=-1, keepdims=True)
        sv = jnp.maximum(jnp.max(jnp.abs(v)), 1e-8) * (1.0 / 127.0)
        v8 = jnp.clip(jnp.round(v * (1.0 / sv)), -127.0, 127.0).astype(
            jnp.int8
        )
        pv = jax.lax.dot_general(
            p8, v8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sv * (1.0 / 127.0))
    else:
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kv_idx == num_kv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if save_residuals:
            lse = m_ref[:] + jnp.log(l_ref[:])  # [BQ, 1]
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _forward_packed(qt, kt, vt, scale, block_q=None, block_k=None,
                    save_residuals=False):
    """Core forward on the packed layout: qt [BH, Q, Sp], kt/vt [BH, KV, Sp]
    with Sp a 128 multiple.  Pads Q/KV up to block multiples internally
    (a no-op for the model's power-of-two spatial token counts)."""
    bh, q_len, sp = qt.shape
    kv_len = kt.shape[1]
    if block_q is None or block_k is None:
        auto_q, auto_k = _pick_blocks(sp, kv_len)
        block_q = block_q or min(auto_q, _round_up(q_len, 8))
        block_k = block_k or min(auto_k, _round_up(kv_len, _LANE))
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)
    if q_pad != q_len:
        qt = jnp.pad(qt, ((0, 0), (0, q_pad - q_len), (0, 0)))
    if kv_pad != kv_len:
        kt = jnp.pad(kt, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, kv_pad - kv_len), (0, 0)))

    grid = (bh, q_pad // block_q, kv_pad // block_k)
    out_specs = pl.BlockSpec(
        (1, block_q, sp), lambda bh, qi, ki: (bh, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((bh, q_pad, sp), qt.dtype)
    if save_residuals:
        out_specs = [out_specs, pl.BlockSpec(
            (1, block_q, _LANE), lambda bh, qi, ki: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [out_shape, jax.ShapeDtypeStruct(
            (bh, q_pad, _LANE), jnp.float32)]
    out = _pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
            masked=kv_len != kv_pad, save_residuals=save_residuals,
            pv_int8=_PV_INT8,
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, sp), jnp.float32),  # acc
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_len * kv_len * sp,
            bytes_accessed=(
                qt.size * qt.dtype.itemsize
                + (kt.size + vt.size) * kt.dtype.itemsize
                * (q_pad // block_q)
                + qt.size * qt.dtype.itemsize
            ),
            transcendentals=bh * q_len * kv_len,
        ),
    )(qt, kt, vt)

    if save_residuals:
        out, lse = out
        return out[:, :q_len], lse
    return out[:, :q_len]


def _flash_forward(q, k, v, scale, block_q=None, block_k=None,
                   save_residuals=False):
    """[B, T, H, S] layout entry: relayout to [B*H, T, Sp] + lane pad,
    run the packed core, relayout back.

    Head dim IS explicitly padded to the 128 lane width: measured ~18%
    faster than letting Mosaic mask a sub-128 minor dim per-op (5.2 vs
    6.1 ms for [32,1024,8,40] bf16 on v5e), i.e. the one extra HBM pass
    of jnp.pad is cheaper than implicit lane masking in the inner loop.
    (The packed entry `flash_attention_packed` avoids this relayout
    entirely by having the q/k/v projections emit the packed layout.)
    """
    b, q_len, h, s = q.shape
    kv_len = k.shape[1]
    sp = _round_up(s, _LANE)

    def to_bh(x, length):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, s)
        return jnp.pad(x, ((0, 0), (0, 0), (0, sp - s)))

    out = _forward_packed(
        to_bh(q, q_len), to_bh(k, kv_len), to_bh(v, kv_len), scale,
        block_q=block_q, block_k=block_k, save_residuals=save_residuals,
    )
    if save_residuals:
        out, lse = out
        o = jnp.transpose(
            out[:, :, :s].reshape(b, h, q_len, s), (0, 2, 1, 3)
        )
        return o, lse
    out = out[:, :, :s].reshape(b, h, q_len, s)
    return jnp.transpose(out, (0, 2, 1, 3))


def _xla_reference(q, k, v, scale):
    logits = jnp.einsum(
        "bqhs,bchs->bhqc", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqc,bchs->bqhs", weights, v)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_acc, *,
    scale, block_k, kv_len, masked,
):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    reps = block_k // _LANE
    lse = jnp.tile(lse_ref[0], (1, reps))  # [BQ, BK]
    di = jnp.tile(di_ref[0], (1, reps))

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK]
    if masked:
        # Padded tail keys: their k/v rows are zero so their columns never
        # contribute to dq, BUT p = exp(0 - lse) can overflow to inf for
        # extremely negative lse, and inf * 0 = NaN inside the ds @ k
        # matmul would poison real rows.  Mask like the forward does.
        key_idx = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(key_idx < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    ds = p * (dp - di)
    dq_acc[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv - 1)
    def _():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, do_ref, lse_ref, di_ref, k_ref, v_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, block_k, kv_len, masked,
):
    q_idx = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    reps = block_k // _LANE
    lse = jnp.tile(lse_ref[0], (1, reps))
    di = jnp.tile(di_ref[0], (1, reps))

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK]
    # Zero-padded tail q rows carry do == 0 and di == 0, so both the p^T@do
    # and ds^T@q contributions from them vanish without masking.  Padded
    # tail KEY columns do need the same overflow guard as _dq_kernel
    # (their dk/dv rows are sliced off, but inf would NaN the row-slice
    # boundary via 0*inf in the accumulating matmuls).
    if masked:
        kv_idx = pl.program_id(1)
        key_idx = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(key_idx < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, Sp]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, Sp]

    @pl.when(q_idx == num_q - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _backward_packed(qt, kt, vt, ot, lse, dot, scale,
                     block_q=None, block_k=None):
    """Core backward on the packed layout ([BH, T, Sp] operands)."""
    bh, q_len, sp = qt.shape
    kv_len = kt.shape[1]
    auto_q, auto_k = _pick_blocks_bwd(sp, q_len)
    block_q = min(block_q or auto_q, _round_up(q_len, 8))
    block_k = min(block_k or auto_k, _round_up(kv_len, _LANE))
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def pad_t(x, pad_len):
        return jnp.pad(x, ((0, 0), (0, pad_len - x.shape[1]), (0, 0)))

    qt = pad_t(qt, q_pad)
    kt = pad_t(kt, kv_pad)
    vt = pad_t(vt, kv_pad)
    dot = pad_t(dot, q_pad)
    ot = pad_t(ot, q_pad)

    di = jnp.sum(dot.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[:, :, None], (bh, q_pad, _LANE))
    # lse from the forward is [B*H, fwd_q_pad, 128]; re-pad to this q_pad.
    if lse.shape[1] < q_pad:
        lse = jnp.pad(lse, ((0, 0), (0, q_pad - lse.shape[1]), (0, 0)))
    else:
        lse = lse[:, :q_pad]

    q_spec = pl.BlockSpec((1, block_q, sp), lambda bh, i, j: (bh, i, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, _LANE), lambda bh, i, j: (bh, i, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, sp), lambda bh, i, j: (bh, j, 0),
                           memory_space=pltpu.VMEM)

    flops_qk = 2 * bh * q_len * kv_len * sp
    dq = _pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=kv_len, masked=kv_len != kv_pad),
        grid=(bh, q_pad // block_q, kv_pad // block_k),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, sp), qt.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, sp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_qk,
            bytes_accessed=(qt.size + dot.size) * qt.dtype.itemsize
            + (kt.size + vt.size) * kt.dtype.itemsize * (q_pad // block_q)
            + qt.size * qt.dtype.itemsize,
            transcendentals=bh * q_len * kv_len,
        ),
    )(qt, kt, vt, dot, lse, di)

    # dkv grid: kv-blocks major, q-blocks minor (scratch accumulates over q).
    q_spec_t = pl.BlockSpec((1, block_q, sp), lambda bh, j, i: (bh, i, 0),
                            memory_space=pltpu.VMEM)
    row_spec_t = pl.BlockSpec(
        (1, block_q, _LANE), lambda bh, j, i: (bh, i, 0),
        memory_space=pltpu.VMEM)
    kv_spec_t = pl.BlockSpec((1, block_k, sp), lambda bh, j, i: (bh, j, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = _pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_k=block_k,
                          kv_len=kv_len, masked=kv_len != kv_pad),
        grid=(bh, kv_pad // block_k, q_pad // block_q),
        in_specs=[q_spec_t, q_spec_t, row_spec_t, row_spec_t,
                  kv_spec_t, kv_spec_t],
        out_specs=[kv_spec_t, kv_spec_t],
        out_shape=[jax.ShapeDtypeStruct((bh, kv_pad, sp), kt.dtype),
                   jax.ShapeDtypeStruct((bh, kv_pad, sp), vt.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, sp), jnp.float32),
                        pltpu.VMEM((block_k, sp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * flops_qk,
            bytes_accessed=(kt.size + vt.size) * kt.dtype.itemsize
            + (qt.size + dot.size) * qt.dtype.itemsize
            * (kv_pad // block_k)
            + 2 * kt.size * kt.dtype.itemsize,
            transcendentals=bh * q_len * kv_len,
        ),
    )(qt, dot, lse, di, kt, vt)

    return dq[:, :q_len], dk[:, :kv_len], dv[:, :kv_len]


def _flash_backward(q, k, v, o, lse, do, scale):
    b, q_len, h, s = q.shape
    kv_len = k.shape[1]
    sp = _round_up(s, _LANE)

    def to_bh(x, length):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, s)
        return jnp.pad(x, ((0, 0), (0, 0), (0, sp - s)))

    dq, dk, dv = _backward_packed(
        to_bh(q, q_len), to_bh(k, kv_len), to_bh(v, kv_len),
        to_bh(o, q_len), lse, to_bh(do, q_len), scale,
    )

    def from_bh(x, length):
        x = x[:, :length, :s].reshape(b, h, length, s)
        return jnp.transpose(x, (0, 2, 1, 3))

    return from_bh(dq, q_len), from_bh(dk, kv_len), from_bh(dv, kv_len)


_FLASH_BACKWARD = "pallas"


def set_flash_backward(impl: str) -> None:
    """Select the flash-attention vjp: "pallas" (fused) or "xla"."""
    global _FLASH_BACKWARD
    if impl not in ("pallas", "xla"):
        raise ValueError(f"unknown flash backward impl: {impl!r}")
    _FLASH_BACKWARD = impl


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale):
    return _flash_forward(q, k, v, scale)


def _require_exact_forward():
    """custom_vjp forwards run only under differentiation; int8-PV is a
    sampling-only mode whose backward would recompute p in f32 against a
    quantized forward — silently inconsistent gradients.  Fail loudly
    instead (the int8 conv path fails the same way under grad)."""
    if _PV_INT8:
        raise NotImplementedError(
            "flash attention int8-PV (set_flash_pv_int8/"
            "tpu.quantize_attention) is a sampling-only serving mode and "
            "does not support differentiation; disable it for training."
        )


def _fwd(q, k, v, scale):
    _require_exact_forward()
    if _FLASH_BACKWARD == "pallas":
        o, lse = _flash_forward(q, k, v, scale, save_residuals=True)
        return o, (q, k, v, o, lse)
    return _flash_forward(q, k, v, scale), (q, k, v, None, None)


def _bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    if lse is not None:
        return _flash_backward(q, k, v, o, lse, g, scale)
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------- packed --
# Head-major packed entry: operands in [B, H, T, Sp] with the head dim
# lane-padded (Sp % 128 == 0).  Removes the transpose+pad HBM passes of
# `flash_attention` (~4.4 ms per 512^2 U-Net eval), but XLA still pays a
# matmul-output transpose per projection to PRODUCE this layout — the
# `flash_attention_flat` entry below removes that too and is what the
# models' packed=True projections now feed.  Kept as the layout A/B
# reference (tools/ab_packed_layout.py).

def lane_pad(s: int) -> int:
    """Head dim padded to the 128-lane tile width."""
    return _round_up(s, _LANE)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_packed(q, k, v, scale):
    """q [B, H, Tq, Sp], k/v [B, H, Tkv, Sp] -> [B, H, Tq, Sp].

    Sp must be a 128 multiple; the valid head dim occupies the leading
    lanes and the rest MUST be zero (zero pad lanes of q/k leave logits
    unchanged; zero lanes of v yield zero output lanes).
    """
    b, h, t, sp = q.shape
    kv = k.shape[2]
    out = _forward_packed(
        q.reshape(b * h, t, sp), k.reshape(b * h, kv, sp),
        v.reshape(b * h, kv, sp), scale,
    )
    return out.reshape(b, h, t, sp)


def _fwd_packed(q, k, v, scale):
    _require_exact_forward()
    b, h, t, sp = q.shape
    kv = k.shape[2]
    if _FLASH_BACKWARD == "pallas":
        o, lse = _forward_packed(
            q.reshape(b * h, t, sp), k.reshape(b * h, kv, sp),
            v.reshape(b * h, kv, sp), scale, save_residuals=True,
        )
        return o.reshape(b, h, t, sp), (q, k, v, o.reshape(b, h, t, sp), lse)
    return flash_attention_packed(q, k, v, scale), (q, k, v, None, None)


def _bwd_packed(scale, residuals, g):
    q, k, v, o, lse = residuals
    b, h, t, sp = q.shape
    kv = k.shape[2]
    if lse is not None:
        dq, dk, dv = _backward_packed(
            q.reshape(b * h, t, sp), k.reshape(b * h, kv, sp),
            v.reshape(b * h, kv, sp), o.reshape(b * h, t, sp), lse,
            g.reshape(b * h, t, sp), scale,
        )
        return (dq.reshape(b, h, t, sp), dk.reshape(b, h, kv, sp),
                dv.reshape(b, h, kv, sp))

    def ref(q, k, v):
        perm = (0, 2, 1, 3)  # [B,H,T,Sp] <-> [B,T,H,Sp]
        out = _xla_reference(
            jnp.transpose(q, perm), jnp.transpose(k, perm),
            jnp.transpose(v, perm), scale,
        )
        return jnp.transpose(out, perm)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention_packed.defvjp(_fwd_packed, _bwd_packed)


# ------------------------------------------------------------------ flat --
# Zero-copy packed entry: operands in [B, T, H*Sp] — the NATURAL output
# layout of the q/k/v projection matmuls ("ntd,dk->ntk" with the [D,H,S]
# kernel lane-padded and flattened to [D, H*Sp]).  The [B,H,T,Sp] entry
# above still costs one XLA transpose per projection (einsum
# "ntd,dhs->nhts" lowers to matmul + copy — 0.61 ms per L0 tensor on the
# 256^2 b32 eval, tools/profile_op.py trace 2026-08-18); this layout needs
# none on either side, and the merge projection consumes the kernel output
# directly ("ntk,kd->ntd").  Each head's 128-lane column block is sliced by
# the BlockSpec index map (block column index = bh % H), so the kernel
# bodies are shared with the packed path unchanged.  The DMA for a
# (block_q, Sp) tile out of [T, H*Sp] is strided (Sp*2-byte rows every
# H*Sp*2 bytes) where the [BH, T, Sp] layout is contiguous — measured on
# device before switching the models over (tools/ab_packed_layout.py).

def _flat_specs(h, block_q, block_k, sp, transposed_grid=False):
    """BlockSpecs slicing head bh%h's lane-column block from flat arrays.

    Grid is (B*H, i, j); ``transposed_grid`` swaps which of i/j indexes the
    q-block dim (the dkv kernel iterates kv-blocks major, q minor)."""
    if transposed_grid:
        qsel = lambda bh, j, i: (bh // h, i, bh % h)
        ksel = lambda bh, j, i: (bh // h, j, bh % h)
    else:
        qsel = lambda bh, i, j: (bh // h, i, bh % h)
        ksel = lambda bh, i, j: (bh // h, j, bh % h)
    q_spec = pl.BlockSpec((1, block_q, sp), qsel, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, _LANE), qsel,
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, sp), ksel, memory_space=pltpu.VMEM)
    return q_spec, row_spec, kv_spec


def _forward_flat(qf, kf, vf, scale, h, block_q=None, block_k=None,
                  save_residuals=False):
    """Forward on the flat layout: qf [B, Q, H*Sp], kf/vf [B, KV, H*Sp]."""
    b, q_len, hsp = qf.shape
    kv_len = kf.shape[1]
    sp = hsp // h
    if block_q is None or block_k is None:
        auto_q, auto_k = _pick_blocks(sp, kv_len)
        block_q = block_q or min(auto_q, _round_up(q_len, 8))
        block_k = block_k or min(auto_k, _round_up(kv_len, _LANE))
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)
    if q_pad != q_len:
        qf = jnp.pad(qf, ((0, 0), (0, q_pad - q_len), (0, 0)))
    if kv_pad != kv_len:
        kf = jnp.pad(kf, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, kv_pad - kv_len), (0, 0)))

    q_spec, row_spec, kv_spec = _flat_specs(h, block_q, block_k, sp)
    grid = (b * h, q_pad // block_q, kv_pad // block_k)
    out_specs = q_spec
    out_shape = jax.ShapeDtypeStruct((b, q_pad, hsp), qf.dtype)
    if save_residuals:
        out_specs = [out_specs, row_spec]
        out_shape = [out_shape, jax.ShapeDtypeStruct(
            (b, q_pad, h * _LANE), jnp.float32)]
    out = _pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
            masked=kv_len != kv_pad, save_residuals=save_residuals,
            pv_int8=_PV_INT8,
        ),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, sp), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * q_len * kv_len * sp,
            bytes_accessed=(
                qf.size * qf.dtype.itemsize
                + (kf.size + vf.size) * kf.dtype.itemsize
                * (q_pad // block_q)
                + qf.size * qf.dtype.itemsize
            ),
            transcendentals=b * h * q_len * kv_len,
        ),
    )(qf, kf, vf)
    if save_residuals:
        out, lse = out
        return out[:, :q_len], lse
    return out[:, :q_len]


def _backward_flat(qf, kf, vf, of, lse, dof, scale, h,
                   block_q=None, block_k=None):
    """Backward on the flat layout (same kernel bodies as packed)."""
    b, q_len, hsp = qf.shape
    kv_len = kf.shape[1]
    sp = hsp // h
    auto_q, auto_k = _pick_blocks_bwd(sp, q_len)
    block_q = min(block_q or auto_q, _round_up(q_len, 8))
    block_k = min(block_k or auto_k, _round_up(kv_len, _LANE))
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def pad_t(x, pad_len):
        return jnp.pad(x, ((0, 0), (0, pad_len - x.shape[1]), (0, 0)))

    qf = pad_t(qf, q_pad)
    kf = pad_t(kf, kv_pad)
    vf = pad_t(vf, kv_pad)
    dof = pad_t(dof, q_pad)
    of = pad_t(of, q_pad)

    # Per-head di = rowsum(dO*O): reshape-only (memory order preserved).
    di = (dof.astype(jnp.float32) * of.astype(jnp.float32)).reshape(
        b, q_pad, h, sp
    ).sum(-1)
    di = jnp.broadcast_to(
        di[..., None], (b, q_pad, h, _LANE)
    ).reshape(b, q_pad, h * _LANE)
    if lse.shape[1] < q_pad:
        lse = jnp.pad(lse, ((0, 0), (0, q_pad - lse.shape[1]), (0, 0)))
    else:
        lse = lse[:, :q_pad]

    q_spec, row_spec, kv_spec = _flat_specs(h, block_q, block_k, sp)
    flops_qk = 2 * b * h * q_len * kv_len * sp
    dq = _pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=kv_len, masked=kv_len != kv_pad),
        grid=(b * h, q_pad // block_q, kv_pad // block_k),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, q_pad, hsp), qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, sp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_qk,
            bytes_accessed=(qf.size + dof.size) * qf.dtype.itemsize
            + (kf.size + vf.size) * kf.dtype.itemsize * (q_pad // block_q)
            + qf.size * qf.dtype.itemsize,
            transcendentals=b * h * q_len * kv_len,
        ),
    )(qf, kf, vf, dof, lse, di)

    q_spec_t, row_spec_t, kv_spec_t = _flat_specs(
        h, block_q, block_k, sp, transposed_grid=True
    )
    dk, dv = _pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_k=block_k,
                          kv_len=kv_len, masked=kv_len != kv_pad),
        grid=(b * h, kv_pad // block_k, q_pad // block_q),
        in_specs=[q_spec_t, q_spec_t, row_spec_t, row_spec_t,
                  kv_spec_t, kv_spec_t],
        out_specs=[kv_spec_t, kv_spec_t],
        out_shape=[jax.ShapeDtypeStruct((b, kv_pad, hsp), kf.dtype),
                   jax.ShapeDtypeStruct((b, kv_pad, hsp), vf.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, sp), jnp.float32),
                        pltpu.VMEM((block_k, sp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * flops_qk,
            bytes_accessed=(kf.size + vf.size) * kf.dtype.itemsize
            + (qf.size + dof.size) * qf.dtype.itemsize
            * (kv_pad // block_k)
            + 2 * kf.size * kf.dtype.itemsize,
            transcendentals=b * h * q_len * kv_len,
        ),
    )(qf, dof, lse, di, kf, vf)

    return dq[:, :q_len], dk[:, :kv_len], dv[:, :kv_len]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_flat(q, k, v, scale, num_heads):
    """q [B, Tq, H*Sp], k/v [B, Tkv, H*Sp] -> [B, Tq, H*Sp].

    Sp = (H*Sp)/num_heads must be a 128 multiple; within each head's
    column block the valid head dim occupies the leading lanes and the
    rest MUST be zero (same contract as `flash_attention_packed`)."""
    return _forward_flat(q, k, v, scale, num_heads)


def _fwd_flat(q, k, v, scale, num_heads):
    _require_exact_forward()
    if _FLASH_BACKWARD == "pallas":
        o, lse = _forward_flat(q, k, v, scale, num_heads,
                               save_residuals=True)
        return o, (q, k, v, o, lse)
    return _forward_flat(q, k, v, scale, num_heads), (q, k, v, None, None)


def _bwd_flat(scale, num_heads, residuals, g):
    q, k, v, o, lse = residuals
    if lse is not None:
        return _backward_flat(q, k, v, o, lse, g, scale, num_heads)

    b, t, hsp = q.shape
    kv = k.shape[1]
    sp = hsp // num_heads

    def ref(q, k, v):
        def split(x, length):
            return x.reshape(b, length, num_heads, sp)

        out = _xla_reference(
            split(q, t), split(k, kv), split(v, kv), scale
        )
        return out.reshape(b, t, hsp)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention_flat.defvjp(_fwd_flat, _bwd_flat)
