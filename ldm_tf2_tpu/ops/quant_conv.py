"""W8A8 int8 ResBlock conv chain for sampling: GN+SiLU+quantize -> s8 conv.

The v5e MXU runs int8 at 2x the bf16 rate (394 TOP/s datasheet;
tools/probe_int8.py measured 380 TOP/s = 1.93x through an XLA s8 dot and
261 TOP/s through the s8 conv emitter on the hot U-Net shape, with the
dequant epilogue free).  But quantizing *inside* the conv's fused
prologue loses: the GN normalize + round/clip chain is recomputed per
conv-window tap and the chain goes VPU-bound (tools/probe_int8_chain.py:
fused int8_dyn is SLOWER than bf16 at the 32x32 shapes).  The win only
materializes as a two-stage structure:

  stage 1  GN(f32 stats) + SiLU + per-example dynamic quantization,
           materializing the activation as int8 (HALF the HBM bytes of
           the bf16 activation it replaces)
  stage 2  bare s8xs8->s32 conv emitter + dequant/bias/time/residual
           epilogue (fused by XLA, measured free)

Measured on v5e (probe_int8_chain.py, CFG batch 48, device profiler):

  shape                bf16 chain   2-stage int8   speedup
  32x32  640-> 320       1.487 ms       1.266 ms     1.17x
  16x16 1280->1280       2.342 ms       1.557 ms     1.50x
  32x32  320-> 320       0.866 ms       0.725 ms     1.19x

Stage 1 is a Pallas kernel for two reasons: (a) it is a single in-VMEM
pass (the XLA 2-jit version re-reads x for the stats pass), and (b) a
`pallas_call` is opaque to XLA fusion, which *enforces* the two-stage
split inside one jitted program — with plain XLA ops the compiler fuses
the quantize back into the conv prologue and reproduces the slow case.

Quantization scheme (standard W8A8 symmetric, cf. Q-Diffusion /
SmoothQuant-style serving stacks):
  * activations: per-example dynamic scale sa[b] = max|y[b]| / 127,
    computed on the GN+SiLU output inside the kernel.  Dynamic per
    example sidesteps the timestep-dependent activation-range problem
    of static calibration in diffusion samplers.
  * weights: per-output-channel scale ws[co] = max|w[:,:,:,co]| / 127,
    quantized INLINE in the jitted program from the f32 params — the
    DDIM `lax.scan` treats it as loop-invariant, so XLA hoists one
    weight-quantization pass per pipeline call (amortized over all
    denoise steps); the checkpoint/param tree is unchanged.
  * accumulation in s32, dequant out = acc * (sa[b] * ws[co]) + bias.

Scope: sampling only (the trainers never enable it), U-Net ResBlock
chains only (the AE decoder stays bf16 — its output is the final pixel
map and it runs once per batch).  Enable with
`set_conv_quant("int8")` or config `tpu.quantize: int8`.  Output images
differ from the bf16 path by the quantization noise, so this is an
opt-in serving mode like DeepCache — the parity/headline path stays
bf16.

Reference provenance: the chain being quantized is the reference's
ResBlock GN->SiLU->3x3-conv hot path (/root/reference/unet.py:368-398).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QUANT = "none"  # "none" | "int8"


def set_conv_quant(mode: str) -> None:
    if mode not in ("none", "int8"):
        raise ValueError(f"unknown conv quant mode: {mode!r}")
    global _QUANT
    _QUANT = mode


def get_conv_quant() -> str:
    return _QUANT


def _gn_silu_quant_kernel(x_ref, gamma_ref, beta_ref, o_ref, sa_ref, *,
                          num_groups, eps, group_size):
    """One image per grid step: f32 GN stats -> normalize -> SiLU ->
    per-example amax -> symmetric s8 quantize, all VMEM-resident."""
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    hw, c = x.shape

    # GN stats via one-hot channel->group matmuls (MXU), same formulation
    # as ops/group_norm._gn_kernel.
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    m = (ch // group_size == gr).astype(jnp.float32)
    s1 = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    g1 = jax.lax.dot_general(
        s1, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g2 = jax.lax.dot_general(
        s2, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    n = float(hw * group_size)
    mean_g = g1 / n
    var_g = jnp.maximum(g2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jax.lax.dot_general(
        mean_g, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rstd_c = jax.lax.dot_general(
        rstd_g, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    y = (x - mean_c) * (rstd_c * gamma_ref[:].astype(jnp.float32))
    y = y + beta_ref[:].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)

    sa = jnp.maximum(jnp.max(jnp.abs(y)), 1e-8) * (1.0 / 127.0)
    o_ref[0] = jnp.clip(jnp.round(y * (1.0 / sa)), -127.0, 127.0).astype(
        jnp.int8
    )
    # sa_ref holds the whole [B, 1] scale array (un-gridded block — TPU
    # tiling forbids a (1, 1) block); each step writes its image's row
    # as a (1, 1) store (scalar stores to VMEM are not lowerable).
    sa_ref[pl.ds(pl.program_id(0), 1), :] = sa.reshape(1, 1)


def gn_silu_quant(x, gamma, beta, num_groups: int = 32, eps: float = 1e-5):
    """GN + SiLU + per-example symmetric int8 quantization.

    Returns (y8 [B,H,W,C] int8, sa [B] f32) with
    y8 * sa[b] ~= silu(group_norm(x)).
    """
    b, h, w, c = x.shape
    hw = h * w
    out8, sa = pl.pallas_call(
        functools.partial(
            _gn_silu_quant_kernel,
            num_groups=num_groups,
            eps=eps,
            group_size=c // num_groups,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * b * hw * c,
            bytes_accessed=x.size * 2 + b * hw * c,
            transcendentals=b * hw * c,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x.reshape(b, hw, c),
        gamma.reshape(1, c),
        beta.reshape(1, c),
    )
    return out8.reshape(b, h, w, c), sa.reshape(b)


def quantize_weight(w):
    """Per-output-channel symmetric s8 quantization of an HWIO kernel.

    Runs inside the jitted program on the f32 params; loop-invariant, so
    the sampler's `lax.scan` hoists it to one pass per pipeline call."""
    wf = w.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    return w8, ws


def _vmem_bytes(hw: int, c: int) -> int:
    """Worst-case VMEM footprint of one grid step of the quant kernel:
    double-buffered bf16 input block, f32 normalize temporaries, and the
    double-buffered int8 output block."""
    pc = (c + 127) // 128 * 128
    return hw * pc * (2 * 2 + 4 + 4 + 1 * 2)


_VMEM_BUDGET = int(12.5 * 1024 * 1024)


def use_int8_conv(shape, num_groups: int = 32,
                  on_tpu: bool | None = None) -> bool:
    """Shape gate: quant mode on, channels group-divisible, and the
    whole-image quant kernel fits VMEM (large 512^2 low-level shapes
    decline and stay bf16)."""
    if _QUANT != "int8":
        return False
    b, h, w, c = shape
    if c % num_groups != 0:
        return False
    return _vmem_bytes(h * w, c) <= _VMEM_BUDGET


def gn_silu_conv3x3_int8(
    x, gamma, beta, w, b, *, time_add=None, residual_add=None,
    num_groups: int = 32, eps: float = 1e-5,
):
    """The int8 twin of `ops.fused_conv.gn_silu_conv3x3` (sampling only).

    GN+SiLU+quantize (Pallas, stage 1) -> s8 3x3 SAME conv (XLA emitter,
    stage 2) -> f32 dequant * (sa[b] * ws[co]) + bias + optional
    time/residual adds, cast back to x.dtype.
    """
    y8, sa = gn_silu_quant(x, gamma, beta, num_groups, eps)
    w8, ws = quantize_weight(w)
    acc = jax.lax.conv_general_dilated(
        y8, w8, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sa[:, None, None, None] * ws)
    out = out + b.astype(jnp.float32)
    if time_add is not None:
        out = out + time_add[:, None, None, :].astype(jnp.float32)
    if residual_add is not None:
        out = out + residual_add.astype(jnp.float32)
    return out.astype(x.dtype)
