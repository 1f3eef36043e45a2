"""Fused transformer-FFN Pallas kernel: LN -> GEGLU -> Dense -> +residual.

Motivation (round-2 profile, tools/profile_pipeline.py unet @ CFG batch 32):
the SpatialTransformer FFN chain costs ~12 ms of a 54 ms U-Net eval.  XLA
splits it into a GEGLU dot that writes the [B,T,8d] pre-activation to HBM
(168 MB at level 0) and an `add_add_fusion` that re-reads it, applies the
exact gelu on the VPU, and emits the output dot in a transposed {1,2,0}
layout at ~29% MXU efficiency.  This kernel keeps the whole chain in VMEM:
x is read once, the output written once, and the gelu overlaps the MXU
work instead of serializing against it.

Math (matches models/unet.py BasicTransformerBlock ffn branch,
reference unet.py:308-338):

    y  = LayerNorm(x; scale, bias, eps)            # f32 stats
    a  = y @ w1v + b1v                             # w1v: [d, 4d] (value)
    g  = y @ w1g + b1g                             # w1g: [d, 4d] (gate)
    u  = a * gelu_exact(g)                         # f32
    out = u @ w2 + b2 + x                          # w2: [4d, d]

Grid: (M tiles, J column-blocks of the 4d hidden dim).  The LayerNorm is
computed once per M tile (at j==0) into a VMEM scratch; each j step does
two [TM,d]x[d,NB] dots (a and gate columns), the gelu-gate product, and
accumulates u @ w2_j into an f32 [TM,d] accumulator; the last j adds bias
and residual and writes bf16.  Weights are streamed block-by-block, so the
kernel handles d=1280 (w1 = 26 MB) without exceeding VMEM.

Backward: custom_vjp that recomputes through the XLA reference (identical
math) — the same pattern as ops/group_norm.py.  The sampler never
differentiates this; the trainer pays one extra recompute, which remat
was paying anyway.

Dispatch: ``fused_ffn`` falls back to the XLA reference when shapes don't
fit the kernel's tiling (reference parity is bit-for-bit unaffected by
dispatch: tests assert kernel-vs-XLA max error at bf16 resolution).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMPL = "auto"  # "auto" | "xla" | "pallas"


def set_fused_ffn_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown fused_ffn impl: {impl!r}")
    _IMPL = impl


def get_fused_ffn_impl() -> str:
    return _IMPL


def _erf_f32(x):
    """erf for Mosaic (no erf primitive): Abramowitz & Stegun 7.1.26
    rational approximation, |abs err| <= 1.5e-7 — below bf16 resolution,
    so kernel-vs-XLA parity is limited by bf16 rounding, not by this."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(x):
    # 0.5 * x * (1 + erf(x / sqrt(2))) — matches jax.nn.gelu(approximate=False)
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


# Degree-9 Chebyshev fit (power basis) of h(x) = x*erf(x/sqrt(2)) in
# t = x^2 on |x| <= 4; h is even, so gelu(x) = 0.5*x + 0.5*h(x) needs no
# sign handling.  Max |gelu_poly - gelu_exact| = 2.3e-5 on the fit range
# and 1.3e-4 at the |x| = 4 clamp edge (h := |x| outside) — both below
# bf16 rounding of the FFN outputs.  vs the A&S erf (exp + divide): the
# VPU chain drops from ~25 to ~14 ops, measured +16% on the d=320 FFN
# class (tools/probe_ffn_gelu.py: 1.083 -> 0.934 ms; the gate-mul floor
# is 0.847, so this recovers ~2/3 of the gelu overhead).
_GELU_POLY_CS = (
    1.17001125700400e-05, 7.97724482796235e-01, -1.32617207955768e-01,
    1.96232925549133e-02, -2.22546161701489e-03, 1.90177605018239e-04,
    -1.17833702310525e-05, 4.93687027647959e-07, -1.23685744320984e-08,
    1.38723939155963e-10,
)


def _gelu_poly_f32(x):
    """gelu(approximate=False) to 2.3e-5 abs via an even polynomial —
    no exp, no divide; the kernels' default gelu (see _GELU_POLY_CS)."""
    ax = jnp.abs(x)
    t = jnp.square(jnp.minimum(ax, 4.0))
    p = _GELU_POLY_CS[-1]
    for c in _GELU_POLY_CS[-2::-1]:
        p = p * t + c
    h = jnp.where(ax > 4.0, ax, p)
    return 0.5 * x + 0.5 * h


def _xla_ffn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2, eps):
    """Reference implementation (exactly the unfused model math:
    nn.LayerNorm(f32 stats) -> value/gate Dense -> v*gelu(g) -> Dense -> +x)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    # fast variance (mean of squares minus squared mean): matches the
    # flax.linen.LayerNorm default the unfused model path uses
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu),
        0.0,
    )
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = y.astype(x.dtype)
    a = jnp.dot(y, w1v) + b1v
    g = jnp.dot(y, w1g) + b1g
    u = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(u, w2) + b2 + x


def _ffn_kernel(x_ref, lns_ref, lnb_ref, w1a_ref, w1b_ref, b1a_ref,
                b1b_ref, w2_ref, b2_ref, o_ref, ln_ref, acc_ref, *, eps,
                residual=True):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)  # [TM, d]
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mu),
            0.0,
        )
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(
            jnp.float32
        )
        ln_ref[:] = y.astype(ln_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    y = ln_ref[:]
    a = (
        jnp.dot(y, w1a_ref[:], preferred_element_type=jnp.float32)
        + b1a_ref[:].astype(jnp.float32)
    )
    g = (
        jnp.dot(y, w1b_ref[:], preferred_element_type=jnp.float32)
        + b1b_ref[:].astype(jnp.float32)
    )
    u = (a * _gelu_poly_f32(g)).astype(y.dtype)
    acc_ref[:] += jnp.dot(
        u, w2_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(j == n_j - 1)
    def _():
        out = acc_ref[:].astype(o_ref.dtype) + b2_ref[:].astype(o_ref.dtype)
        if residual:
            out = out + x_ref[:]
        o_ref[:] = out


def _ffn_kernel_int8(x_ref, lns_ref, lnb_ref, w1a_ref, w1b_ref, b1a_ref,
                     b1b_ref, s1a_ref, s1b_ref, w2_ref, b2_ref, s2_ref,
                     o_ref, ln8_ref, sy_ref, acc_ref, *, eps):
    """W8A8 variant of `_ffn_kernel` (sampling only, ops/quant_conv.py
    policy): per-ROW dynamic activation scales — exact granularity for a
    row-contraction matmul — with per-column weight scales supplied by
    the caller.  LN output is quantized once per M tile into an s8
    scratch; the GEGLU hidden u is quantized per (row, j-block), each
    j's contribution dequantized into the f32 accumulator with its own
    row scales, so the result is the same math as the bf16 kernel up to
    quantization noise.  Mosaic runs the s8 dots at ~312 TOP/s = 1.59x
    the bf16 peak (tools/probe_mosaic_int8.py)."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)  # [TM, d]
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mu),
            0.0,
        )
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(
            jnp.float32
        )
        sy = jnp.maximum(
            jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-8
        ) * (1.0 / 127.0)
        sy_ref[:] = sy
        ln8_ref[:] = jnp.clip(
            jnp.round(y * (1.0 / sy)), -127.0, 127.0
        ).astype(jnp.int8)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    y8 = ln8_ref[:]
    sy = sy_ref[:]
    a = jnp.dot(y8, w1a_ref[:], preferred_element_type=jnp.int32)
    a = a.astype(jnp.float32) * (sy * s1a_ref[:]) + b1a_ref[:].astype(
        jnp.float32
    )
    g = jnp.dot(y8, w1b_ref[:], preferred_element_type=jnp.int32)
    g = g.astype(jnp.float32) * (sy * s1b_ref[:]) + b1b_ref[:].astype(
        jnp.float32
    )
    u = a * _gelu_poly_f32(g)
    su = jnp.maximum(
        jnp.max(jnp.abs(u), axis=-1, keepdims=True), 1e-8
    ) * (1.0 / 127.0)
    u8 = jnp.clip(jnp.round(u * (1.0 / su)), -127.0, 127.0).astype(
        jnp.int8
    )
    acc = jnp.dot(u8, w2_ref[:], preferred_element_type=jnp.int32)
    acc_ref[:] += acc.astype(jnp.float32) * (su * s2_ref[:])

    @pl.when(j == n_j - 1)
    def _():
        out = acc_ref[:].astype(o_ref.dtype)
        o_ref[:] = out + b2_ref[:].astype(o_ref.dtype) + x_ref[:]


def _quant_cols(wm):
    """Per-column (output-feature) symmetric s8 quantization of a 2-D
    kernel; runs in XLA outside the Pallas call (loop-invariant in the
    sampler scan, so LICM hoists one pass per pipeline call)."""
    wf = wm.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return w8, s.reshape(1, -1)


def _pick_tiles(m: int, d: int):
    """(TM, NB) from on-device sweeps (tools/bench_ffn.py, then
    tools/sweep_ffn_tm.py with the profiler timer, v5e): full-width
    NB=4d with a single j-step wins everywhere it compiles (weight
    blocks have a constant index so Mosaic keeps them resident).
    d=320 @ m=32768: TM 1024 > 512 > 256 > 128 (104.2/102.2/99.0/94.1
    TF/s — the shape is capped by K=320 lane padding plus the erf-gelu
    VPU load, not the tile); TM=2048 fails to compile.  d=640 @ m=8192:
    512 ≈ 256 (158.8/158.6); 1024 fails."""
    h4 = 4 * d
    tms = (1024, 512, 256, 128) if d <= 320 else (512, 256, 128)
    # LDM_FFN_TM caps the M tile: escape hatch for compile environments
    # whose scoped-vmem limit rejects the swept optimum (observed on the
    # axon local-AOT fallback at d=640 TM=512: 17.11M vs a 16M limit,
    # while the primary compile service accepts the same kernel).
    cap = int(os.environ.get("LDM_FFN_TM", "0") or 0)
    if cap:
        tms = tuple(t for t in tms if t <= cap) or (cap,)
    for tm in tms:
        if m % tm == 0:
            return tm, h4
    return None


def _pallas_ffn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2, eps,
                tiles=None, residual=True):
    b, t, d = x.shape
    m = b * t
    # hidden width from the kernel leaf, not 4*d: under tensor
    # parallelism each shard holds F/n columns (ops/tp.py tp_fused_ffn)
    h4 = w1v.shape[1]
    tiles = tiles or _pick_tiles(m, d)
    assert tiles is not None
    tm, nb = min(tiles[0], m), min(tiles[1], h4)
    n_j = h4 // nb

    x2 = x.reshape(m, d)
    w1a, w1b = w1v, w1g
    b1a, b1b = b1v.reshape(1, h4), b1g.reshape(1, h4)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps, residual=residual),
        grid=(m // tm, n_j),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln scale
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln bias
            pl.BlockSpec((d, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w1a
            pl.BlockSpec((d, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w1b
            pl.BlockSpec((1, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b1a
            pl.BlockSpec((1, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b1b
            pl.BlockSpec((nb, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, d), x.dtype),      # LN(x) tile
            pltpu.VMEM((tm, d), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * 3 * d * h4,
            bytes_accessed=2 * m * d * 2 + 3 * d * h4 * 2,
            transcendentals=m * h4,
        ),
        # CPU tests exercise the kernel via the interpreter
        interpret=jax.default_backend() != "tpu",
    )(
        x2,
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        w1a,
        w1b,
        b1a,
        b1b,
        w2,
        b2.reshape(1, d),
    )
    return out.reshape(b, t, d)


def _pallas_ffn_int8(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2,
                     eps, tiles=None):
    b, t, d = x.shape
    m = b * t
    tiles = tiles or _pick_tiles(m, d)
    assert tiles is not None
    tm, nb = tiles
    h4 = 4 * d
    n_j = h4 // nb

    x2 = x.reshape(m, d)
    w1a8, s1a = _quant_cols(w1v)
    w1b8, s1b = _quant_cols(w1g)
    w28, s2 = _quant_cols(w2)
    b1a, b1b = b1v.reshape(1, h4), b1g.reshape(1, h4)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel_int8, eps=eps),
        grid=(m // tm, n_j),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln scale
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln bias
            pl.BlockSpec((d, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w1a8
            pl.BlockSpec((d, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w1b8
            pl.BlockSpec((1, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b1a
            pl.BlockSpec((1, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b1b
            pl.BlockSpec((1, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # s1a
            pl.BlockSpec((1, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # s1b
            pl.BlockSpec((nb, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),  # w28
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # s2
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, d), jnp.int8),     # quantized LN(x) tile
            pltpu.VMEM((tm, 1), jnp.float32),  # per-row LN scales
            pltpu.VMEM((tm, d), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * 12 * d * d,
            bytes_accessed=2 * m * d * 2 + 3 * d * h4,
            transcendentals=m * h4,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x2,
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        w1a8,
        w1b8,
        b1a,
        b1b,
        s1a,
        s1b,
        w28,
        b2.reshape(1, d),
        s2,
    )
    return out.reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_ffn_pallas(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2,
                      eps):
    return _pallas_ffn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2,
                       eps)


def _fused_fwd(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2, eps):
    return (
        _pallas_ffn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2, eps),
        (x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2),
    )


def _fused_bwd(eps, residuals, g):
    x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2 = residuals
    _, vjp = jax.vjp(
        lambda *a: _xla_ffn(*a, eps), x, ln_scale, ln_bias, w1v, b1v, w1g,
        b1g, w2, b2
    )
    return vjp(g)


_fused_ffn_pallas.defvjp(_fused_fwd, _fused_bwd)


def use_fused_ffn(b: int, t: int, d: int, on_tpu: bool | None = None) -> bool:
    """True when the Pallas kernel handles this shape (and we're on TPU)."""
    if _IMPL == "xla":
        return False
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if _IMPL == "auto" and not on_tpu:
        return False
    # d=1280 (deepest level + middle block): XLA already runs the chain at
    # ~90% of the MXU roofline there (tools/bench_ffn.py) — keep it.
    if _IMPL == "auto" and d > 640:
        return False
    # NB = 4d must tile the 128-lane minor dim (d=320 -> NB=1280 is fine)
    if (4 * d) % 128 != 0:
        return False
    return _pick_tiles(b * t, d) is not None


def fused_ffn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2, eps=1e-5):
    """LN -> GEGLU -> Dense -> +residual over [B, T, d].

    Args:
      x: [B, T, d] activations (bf16 or f32).
      ln_scale, ln_bias: [d] LayerNorm affine (f32).
      w1v, w1g: [d, 4d] GEGLU value/gate kernels (separate leaves — see
        models/unet.py GEGLU: TP column-shards each cleanly).
      b1v, b1g: [4d]; w2: [4d, d]; b2: [d].
    """
    b, t, d = x.shape
    if use_fused_ffn(b, t, d):
        # NOTE: a W8A8 variant exists (`_pallas_ffn_int8`, per-row act
        # scales + per-col weight scales) but is NOT dispatched: the
        # d=320 FFN class is lane-pad/VPU-bound, not MXU-bound, so the
        # 2x int8 MXU rate measured dead neutral (1.030 vs 1.011 ms at
        # m=49152, v5e device profiler) while adding quantization noise.
        # Kept as an opt-in building block for wider-d serving configs.
        return _fused_ffn_pallas(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g,
                                 w2, b2, eps)
    return _xla_ffn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2, eps)
