"""Fused GroupNorm(+SiLU) — Pallas TPU kernel with XLA fallback.

Motivation: profiling one CFG U-Net eval on v5e (tools/profile_pipeline.py)
showed ~17% of device time in XLA's ``convert_reduce_fusion`` chains — the
GroupNorm mean/variance passes with their bf16<->f32 converts.  This kernel
does stats + normalize + affine + activation in one VMEM round trip: read x
once, write y once.

**Measured outcome (v5e, 256^2 U-Net eval, batch 32): both variants lose
to XLA.**  The fully fused kernel is itself fast (~3.4 ms/eval for every
GN in the U-Net) and removes the convert_reduce fusions (9.5 -> 2.3
ms/eval), but materializing its output breaks XLA's normalize-into-conv
consumer fusion: 57 -> 61 ms/eval.  A stats-only hybrid (Pallas one-pass
mean/rstd + XLA normalize, intended to keep the consumer fusion) also
regresses to ~60 ms/eval — with stats arriving from a Pallas call, XLA
compiles the normalize chains as standalone fusions instead of folding
them into the convolutions.  ``"auto"`` therefore resolves to the XLA
path; ``set_groupnorm_impl("pallas"|"stats")`` remain as explicit opt-ins
for shapes where no consumer fusion exists.  Kept as the worked example of
profile-driven kernel evaluation: measure, don't assume.

**Round-2 follow-up (device-profiler traces, tools/roofline_report.py,
b16 CFG eval = 51.3 ms):** the GN stat reduces fuse into the *producer*
convolutions (``convert_reduce_fusion``), and those convs run at
113-140 TF/s while the only two GN-free convs in the program (the
upsample convs) hit 180-187 TF/s.  Three attempts to detach the stats,
all same-process A/B'd at the eval level:

* ``barrier`` — ``optimization_barrier`` between conv and GN: **dead
  neutral** (51.33 vs 51.27 ms).  Zero opt-barrier ops survive in the
  optimized HLO on this backend; the pass pipeline strips them before
  fusion.
* ``dotstats`` — stat sums as dots against a runtime-poisoned ones
  vector (un-fusable by construction): **52.30 ms, loses 1 ms.**  The
  standalone dots + extra HBM re-read of x cost more than the epilogue
  stall they remove.
* ``pallas`` (fully fused GN, re-measured on current code): 51.98 ms,
  still behind.

Conclusion: XLA's conv+stats epilogue fusion is already the cheapest
available formulation; the 113-140 TF/s on GN-convs is dominated by the
normalize+SiLU *prologue* recompute inside the conv window iteration
(both prologue-free convs hit 187), and every way of removing that
prologue pays a materialization that outweighs the win.  The conv side
of the 256^2 eval is at XLA's floor for this architecture.

Kernel notes:
* Layout [B, HW, C]; grid (B,), one batch row per grid step (double-
  buffered automatically).  All stats math is f32 in VMEM.
* Per-group reduction without lane reshapes: reduce spatially to a [1, C]
  vector, then aggregate channels->groups and broadcast groups->channels
  with two tiny one-hot matmuls (M[c,g] = 1 iff c in group g) — MXU ops on
  [C, G] data instead of Mosaic relayouts.
* The group-count contract matches flax/Keras GroupNorm: channels are
  split into ``num_groups`` contiguous blocks.
* Backward: custom_vjp recomputes through the XLA reference (same math),
  like ops/flash_attention.py.

Dispatch: ``set_groupnorm_impl("auto"|"xla"|"pallas")``.  "auto" uses the
kernel on TPU when the f32 working set fits VMEM (UNet-scale feature maps;
the 256^2 autoencoder's 65536-token maps fall back to XLA).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMPL = "auto"

# f32 copy of one [HW, C] slab + bf16 in/out blocks must fit VMEM with
# headroom; 6 MiB of f32 slab (~12 MiB total footprint) is safe on v5e.
_VMEM_SLAB_LIMIT = 6 * 1024 * 1024


def set_groupnorm_impl(impl: str) -> None:
    """"auto"/"barrier": MXU-einsum stats behind an optimization_barrier
    (keeps the stat reduces out of the producer conv fusion — see
    _mxu_stats_group_norm). "mxu": same without the barrier. "stats":
    Pallas one-pass stats hybrid. "pallas": fully fused kernel. "xla":
    reference path."""
    global _IMPL
    if impl not in (
        "auto", "xla", "pallas", "stats", "mxu", "barrier", "dotstats"
    ):
        raise ValueError(f"unknown groupnorm impl: {impl!r}")
    _IMPL = impl


def get_groupnorm_impl() -> str:
    return _IMPL


def _xla_group_norm(x, gamma, beta, num_groups, eps, activate):
    """Reference implementation (flax.linen.GroupNorm semantics: f32 stats
    over (spatial..., channels-in-group), affine, optional SiLU)."""
    b, *spatial, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if activate:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, num_groups, eps,
               activate, group_size):
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    hw, c = x.shape

    # one-hot channel->group membership [C, G], built from iota (f32 so the
    # reductions ride the MXU)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    m = (ch // group_size == gr).astype(jnp.float32)

    s1 = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    g1 = jax.lax.dot_general(
        s1, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [1, G]
    g2 = jax.lax.dot_general(
        s2, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    n = float(hw * group_size)
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast groups -> channels: [1, G] @ M^T -> [1, C]
    mean_c = jax.lax.dot_general(
        mean_g, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rstd_c = jax.lax.dot_general(
        rstd_g, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    gamma = gamma_ref[:].astype(jnp.float32)  # [1, C]
    beta = beta_ref[:].astype(jnp.float32)
    y = (x - mean_c) * (rstd_c * gamma) + beta
    if activate:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_group_norm(x, gamma, beta, num_groups, eps, activate):
    b, *spatial, c = x.shape
    hw = 1
    for s in spatial:
        hw *= s
    xr = x.reshape(b, hw, c)
    gamma2 = gamma.reshape(1, c)
    beta2 = beta.reshape(1, c)

    out = pl.pallas_call(
        functools.partial(
            _gn_kernel,
            num_groups=num_groups,
            eps=eps,
            activate=activate,
            group_size=c // num_groups,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * hw * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * hw * c if activate else 0,
        ),
    )(xr, gamma2, beta2)
    return out.reshape(x.shape)


def _gn_stats_kernel(x_ref, mean_ref, rstd_ref, s1_ref, s2_ref, *,
                     num_groups, eps, group_size, n_total):
    """Streaming one-pass stats: accumulate sum / sum-of-squares over
    spatial blocks in VMEM scratch, emit per-channel mean/rstd on the last
    block.  The normalize/affine/activation stays outside (XLA fuses it
    into the consuming conv)."""
    sb_idx = pl.program_id(1)
    n_sb = pl.num_programs(1)

    @pl.when(sb_idx == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    x = x_ref[0].astype(jnp.float32)  # [SB, C]
    s1_ref[:] += jnp.sum(x, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(sb_idx == n_sb - 1)
    def _():
        c = x.shape[-1]
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch // group_size == gr).astype(jnp.float32)
        g1 = jax.lax.dot_general(
            s1_ref[:], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g2 = jax.lax.dot_general(
            s2_ref[:], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean_g = g1 / n_total
        var_g = g2 / n_total - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_ref[0] = jax.lax.dot_general(
            mean_g, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rstd_ref[0] = jax.lax.dot_general(
            rstd_g, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _spatial_block(hw: int, c: int) -> int | None:
    """Largest divisor of hw (multiple of 8) whose f32 slab fits VMEM."""
    c_padded = (c + 127) // 128 * 128
    max_rows = _VMEM_SLAB_LIMIT // (4 * c_padded)
    if max_rows < 8:
        return None
    if hw <= max_rows:
        return hw
    sb = (max_rows // 8) * 8
    while sb >= 8:
        if hw % sb == 0:
            return sb
        sb -= 8
    return None


def _pallas_group_stats(x, num_groups, eps):
    """[B, spatial..., C] -> per-channel (mean, rstd) of shape [B, C], f32,
    with rstd = rsqrt(var + eps)."""
    b, *spatial, c = x.shape
    hw = 1
    for s in spatial:
        hw *= s
    sb = _spatial_block(hw, c)
    xr = x.reshape(b, hw, c)
    group_size = c // num_groups

    mean, rstd = pl.pallas_call(
        functools.partial(
            _gn_stats_kernel,
            num_groups=num_groups,
            eps=eps,
            group_size=group_size,
            n_total=float(hw * group_size),
        ),
        grid=(b, hw // sb),
        in_specs=[
            pl.BlockSpec((1, sb, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * hw * c,
            bytes_accessed=x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xr)
    return mean.reshape(b, c), rstd.reshape(b, c)


def _mxu_stats_group_norm(x, gamma, beta, num_groups, eps, activate,
                          barrier=False):
    """GroupNorm with stats computed as einsums against the one-hot
    channel->group matrix: the sums ride the MXU as [HW,C]x[C,G] dots
    (~1.3 GFLOP per U-Net eval — negligible) instead of XLA's VPU
    convert+reduce chains (~11 ms/eval measured), while staying plain XLA
    so the normalize/affine/SiLU chain still fuses into the consuming
    conv.  Pure function — differentiable without a custom vjp.

    ``barrier=True`` puts an ``optimization_barrier`` between ``x`` and
    everything this function computes.  Device traces of the 256^2 U-Net
    eval (tools/roofline_report.py) show XLA fusing the stat reductions
    into the *producer* convolution (``convert_reduce_fusion``), dragging
    those convs to ~120 TF/s while reduce-free conv fusions on the same
    program hit ~187 TF/s: the VPU reduce epilogue stalls the MXU.  The
    barrier keeps the producer conv clean; the stats re-read x from HBM
    (bf16, bandwidth-bound, ~30 us per GN — cheap next to a multi-100-us
    MXU stall)."""
    b, *spatial, c = x.shape
    if barrier:
        x = jax.lax.optimization_barrier(x)
    # NOTE: optimization_barrier does NOT survive to fusion on this TPU
    # backend (zero opt-barrier ops in the optimized HLO; A/B dead
    # neutral) — kept only so the intent is visible.  The variant that
    # actually detaches the stat reduces from the producer conv is
    # "dotstats" below.
    group_size = c // num_groups
    hw = 1
    for s in spatial:
        hw *= s
    xf = x.astype(jnp.float32).reshape(b, hw, c)
    m = (
        jnp.arange(c)[:, None] // group_size
        == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)

    n = float(hw * group_size)
    s1 = jnp.einsum("bhc,cg->bg", xf, m, preferred_element_type=jnp.float32)
    s2 = jnp.einsum(
        "bhc,cg->bg", xf * xf, m, preferred_element_type=jnp.float32
    )
    mean_g = s1 / n
    var_g = jnp.maximum(s2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, group_size, axis=-1)  # [B, C]
    rstd_c = jnp.repeat(rstd_g, group_size, axis=-1)

    shape = (b,) + (1,) * len(spatial) + (c,)
    y = (x.astype(jnp.float32) - mean_c.reshape(shape)) * (
        rstd_c.reshape(shape) * gamma.astype(jnp.float32)
    ) + beta.astype(jnp.float32)
    if activate:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _dot_stats_group_norm(x, gamma, beta, num_groups, eps, activate):
    """GroupNorm whose stat sums are true MXU dots XLA cannot fuse away.

    Device traces (tools/roofline_report.py, 256^2 CFG eval) show the
    default path's stat reductions decomposed by XLA into per-channel
    HW-reduces that fuse into the *producer* convolution's epilogue
    (``convert_reduce_fusion``), dragging those convs from ~187 to
    ~113-140 TF/s — the VPU reduce serializes against the MXU inside the
    fusion.  An ``optimization_barrier`` does not survive to fusion on
    this backend, so instead the HW-reduce here is a dot_general against
    a *runtime-dependent* ones vector (``1 + 0*x[...]`` — float mul by
    zero is not constant-folded because of NaN semantics), which XLA
    must keep as a standalone MXU dot: the producer conv compiles clean,
    and the stats re-read x from HBM (bandwidth-bound, ~50 us per GN).
    """
    b, *spatial, c = x.shape
    group_size = c // num_groups
    hw = 1
    for s in spatial:
        hw *= s
    xf = x.astype(jnp.float32).reshape(b, hw, c)
    # [HW, 8] ones the simplifier can't prove constant (see docstring);
    # 8 lanes so the dot output is tile-aligned.
    ones = 1.0 + 0.0 * jax.lax.broadcast_in_dim(
        xf[0, :, 0], (hw, 8), (0,)
    )
    # [B, C, 8] <- contract HW;  column 0 is the sum.
    s1 = jax.lax.dot_general(
        xf, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]
    s2 = jax.lax.dot_general(
        xf * xf, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]
    m = (
        jnp.arange(c)[:, None] // group_size
        == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)
    n = float(hw * group_size)
    mean_g = jnp.einsum("bc,cg->bg", s1, m) / n
    var_g = jnp.maximum(
        jnp.einsum("bc,cg->bg", s2, m) / n - mean_g * mean_g, 0.0
    )
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, group_size, axis=-1)
    rstd_c = jnp.repeat(rstd_g, group_size, axis=-1)
    shape = (b,) + (1,) * len(spatial) + (c,)
    y = (x.astype(jnp.float32) - mean_c.reshape(shape)) * (
        rstd_c.reshape(shape) * gamma.astype(jnp.float32)
    ) + beta.astype(jnp.float32)
    if activate:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _stats_hybrid_group_norm(x, gamma, beta, num_groups, eps, activate):
    """Pallas one-pass stats + XLA normalize (consumer-fusable)."""
    b, *spatial, c = x.shape
    mean, rstd = _pallas_group_stats(x, num_groups, eps)
    shape = (b,) + (1,) * len(spatial) + (c,)
    xf = x.astype(jnp.float32)
    y = (xf - mean.reshape(shape)) * (
        rstd.reshape(shape) * gamma.astype(jnp.float32)
    ) + beta.astype(jnp.float32)
    if activate:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _pallas_shape_ok(x) -> bool:
    b, *spatial, c = x.shape
    hw = 1
    for s in spatial:
        hw *= s
    # sublane alignment; lanes may be any multiple of 8 (Mosaic pads the
    # minor dim to 128 internally)
    if c % 8 != 0 or hw % 8 != 0:
        return False
    c_padded = (c + 127) // 128 * 128
    return hw * c_padded * 4 <= _VMEM_SLAB_LIMIT


def _stats_shape_ok(x) -> bool:
    b, *spatial, c = x.shape
    hw = 1
    for s in spatial:
        hw *= s
    if c % 8 != 0 or hw % 8 != 0:
        return False
    return _spatial_block(hw, c) is not None


def _make_custom_vjp(forward_impl):
    """custom_vjp wrapper: given forward impl, backward recomputes through
    the XLA reference (mathematically the same function)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
    def fn(x, gamma, beta, num_groups, eps, activate):
        return forward_impl(x, gamma, beta, num_groups, eps, activate)

    def fwd(x, gamma, beta, num_groups, eps, activate):
        return (
            forward_impl(x, gamma, beta, num_groups, eps, activate),
            (x, gamma, beta),
        )

    def bwd(num_groups, eps, activate, residuals, g):
        x, gamma, beta = residuals
        _, vjp = jax.vjp(
            lambda x, gamma, beta: _xla_group_norm(
                x, gamma, beta, num_groups, eps, activate
            ),
            x, gamma, beta,
        )
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


_fused_group_norm = _make_custom_vjp(_pallas_group_norm)
_hybrid_group_norm = _make_custom_vjp(_stats_hybrid_group_norm)


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    activate: bool = False,
) -> jnp.ndarray:
    """GroupNorm over [B, spatial..., C] with optional fused SiLU."""
    if x.shape[-1] % num_groups != 0:
        raise ValueError(
            f"channels {x.shape[-1]} not divisible by groups {num_groups}"
        )
    # Both Pallas kernels measured slower end-to-end on v5e because they
    # break XLA's normalize-into-conv consumer fusion (see module
    # docstring); they remain available as explicit opt-ins.  "auto" uses
    # the MXU-stats variant (einsum reductions, plain XLA, fusion kept).
    if _IMPL == "pallas" and _pallas_shape_ok(x):
        return _fused_group_norm(x, gamma, beta, num_groups, eps, activate)
    if _IMPL == "stats" and _stats_shape_ok(x):
        return _hybrid_group_norm(x, gamma, beta, num_groups, eps, activate)
    if _IMPL == "dotstats":
        return _dot_stats_group_norm(x, gamma, beta, num_groups, eps, activate)
    if _IMPL == "barrier":
        return _mxu_stats_group_norm(
            x, gamma, beta, num_groups, eps, activate, barrier=True
        )
    if _IMPL in ("auto", "mxu"):
        return _mxu_stats_group_norm(x, gamma, beta, num_groups, eps, activate)
    return _xla_group_norm(x, gamma, beta, num_groups, eps, activate)


class GroupNorm(nn.Module):
    """Drop-in for ``flax.linen.GroupNorm`` (same param names/shapes —
    ``scale``/``bias`` of [C] — so checkpoints are interchangeable) that
    routes through the fused kernel and can absorb the SiLU that follows
    every GN in the reference's residual blocks / output heads
    (unet.py:382-391, autoencoder.py:13-58)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    activation: str | None = None  # None or "silu"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(
            x.astype(self.dtype),
            scale,
            bias,
            num_groups=self.num_groups,
            eps=self.epsilon,
            activate=self.activation == "silu",
        )
