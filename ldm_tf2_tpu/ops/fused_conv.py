"""ResBlock GN+SiLU+3x3-conv chain: 9-dots XLA formulation + Pallas kernel.

The reference hot chain (unet.py:368-398) is GN -> SiLU -> 3x3 conv
(twice per residual block, the FLOPs majority of a U-Net eval).  Two
findings from on-device measurement (tools/probe_concat_conv.py,
tools/calibrate_fused_conv.py, v5e):

1. **XLA's conv emitter is a lottery on concat-conv shapes.**  The same
   [16,32,32,640]->320 GN+conv graph compiles to sub-ms in one process
   and 14-16 ms (~4 TF/s) in another — nondeterministically.  Expressing
   the 3x3 SAME conv as 9 shifted [B,H,W,Ci]x[Ci,Co] `dot_general`s
   (`conv3x3_dots`) bypasses the emitter and never draws the cliff.
   CORRECTION (tools/profile_op.py): the scan-chain timer that once
   credited dots with 378 TF/s was invalid — conv is linear, so XLA
   hoists the loop-invariant term and the chain degenerates (378 > the
   chip's 197 TF/s bf16 peak).  Device-profiler numbers on the cliff
   shape, same process: dots 0.486 ms (124 TF/s), emitter 0.510 ms
   (118 TF/s), peak-matmul control 192 TF/s — i.e. when the emitter
   does NOT draw the cliff the two are within 5%.
   **Whole-pipeline A/B (v5e, same session): emitter 6.50 img/s, dots
   5.66, dots3 5.44 at 256^2 b16** — `auto` therefore stays on the
   emitter; set_fused_conv_impl("dots") is the deterministic escape
   hatch when a given process's compile DOES draw the ~4 TF/s cliff
   (detectable: a 256^2 U-Net eval far above ~30 ms).

2. **The whole-chain Pallas kernel is NOT faster than dots+XLA-fusion at
   the hot shapes.**  It holds one image per grid step in VMEM — GN stats
   via one-hot channel->group matmuls, normalize+SiLU into a zero-padded
   row slab, the conv as 9 shifted slab dots, epilogue adds — with the
   cout dimension block-gridded so large-channel shapes fit VMEM.
   Calibrated at 104-237 TF/s on the CFG-batch-32 32x32/16x16 shapes
   (the VPU normalize chain serializes against the MXU dots, which XLA's
   multi-image pipelining hides better), 386 TF/s at 16x16 1280->1280
   blk128.  Kept as an opt-in (`set_fused_conv_impl("pallas")`) reference
   implementation; the dispatch gate (`use_gn_silu_conv`) + VMEM estimate
   are calibrated so every claimed shape is Mosaic-compilable.

Numerics match the unfused path: f32 stats/normalize/SiLU, bf16 tap dots
with f32 accumulation, bf16 epilogue adds.

Backward: custom_vjp recomputing through the 9-dots XLA composition
(identical math; dot VJPs are dots, so the conv-gradient emitter and its
lottery never enter the backward either).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMPL = "auto"  # "auto" | "xla" | "dots" | "dots3" | "pallas"


def set_fused_conv_impl(impl: str) -> None:
    global _IMPL
    if impl not in ("auto", "xla", "dots", "dots3", "pallas"):
        raise ValueError(f"unknown fused_conv impl: {impl!r}")
    _IMPL = impl


def get_fused_conv_impl() -> str:
    return _IMPL


def conv3x3_tap_dots(y, w, preferred_element_type):
    """Core of the emitter-bypass 3x3 SAME conv: 9 shifted
    [B,H,W,Cin]x[Cin,Cout] dot_generals over a zero-padded input,
    accumulated in ``preferred_element_type`` (f32 for the bf16 path,
    s32 for the W8A8 path — ops/quant_conv._s8_conv3x3_dots).  Kernel
    taps are cast to the activation dtype (a no-op when they already
    match, e.g. s8).  XLA fuses the pad+slice into the dot operands, so
    no 9x activation materialization occurs."""
    bsz, h, wd, cin = y.shape
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(
                yp, (0, dy, dx, 0), (bsz, h, wd, cin)
            )
            d = jax.lax.dot_general(
                tap, w[dy, dx].astype(tap.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=preferred_element_type,
            )
            out = d if out is None else out + d
    return out


def conv3x3_dots(y, w, b):
    """3x3 SAME conv as 9 shifted [B,H,W,Cin]x[Cin,Cout] dots.

    Bypasses XLA's convolution emitter, which on v5e compiles some U-Net
    concat-conv shapes (e.g. [16,32,32,640]->320) to a ~4 TF/s program —
    nondeterministically across compiles — while this formulation measures
    at ~378 TF/s (~96% of the bf16 MXU roofline) on the same shape
    (tools/probe_concat_conv.py)."""
    out = conv3x3_tap_dots(y, w, jnp.float32)
    return out.astype(y.dtype) + b.astype(y.dtype)


def conv3x3_dots3(y, w, b):
    """3x3 SAME conv as 3 row-grouped [B,H,W,3*Cin]x[3*Cin,Cout] dots.

    Same emitter-bypass as `conv3x3_dots` but with the three dx taps of
    each kernel row concatenated along the contraction dim, cutting the
    dot_general count from 9 to 3 per conv.  Built for compile time: the
    9-dots U-Net body (~450 dots) compiled pathologically slowly on the
    tunneled v5e (>25 min), and XLA's compile cost scales with op count.
    The concat materializes a 3x-channel activation copy per row group,
    so per-op efficiency is slightly below the 9-dots form — prefer dots
    unless compile time is the blocker."""
    bsz, h, wd, cin = y.shape
    cout = w.shape[-1]
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        row = jax.lax.dynamic_slice(
            yp, (0, dy, 0, 0), (bsz, h, wd + 2, cin)
        )
        taps = jnp.concatenate(
            [
                jax.lax.dynamic_slice(row, (0, 0, dx, 0), (bsz, h, wd, cin))
                for dx in range(3)
            ],
            axis=-1,
        )
        # w[dy] is [3, Cin, Cout] (dx-major) — reshape matches the concat.
        wk = w[dy].reshape(3 * cin, cout)
        d = jax.lax.dot_general(
            taps, wk.astype(taps.dtype),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out.astype(y.dtype) + b.astype(y.dtype)


def conv3x3(y, w, b):
    """3x3 SAME conv honoring the module impl policy (emitter vs dots)."""
    if _IMPL == "dots":
        return conv3x3_dots(y, w, b)
    if _IMPL == "dots3":
        return conv3x3_dots3(y, w, b)
    return jax.lax.conv_general_dilated(
        y, w.astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(y.dtype)


def _xla_ref(x, gamma, beta, w, b, t, add, num_groups, eps,
             conv_impl="emitter"):
    """Unfused reference: exactly the model's GN(+SiLU) -> conv -> adds."""
    from ldm_tf2_tpu.ops.group_norm import _mxu_stats_group_norm

    y = _mxu_stats_group_norm(x, gamma, beta, num_groups, eps, True)
    if conv_impl == "dots":
        out = conv3x3_dots(y, w, b)
    elif conv_impl == "dots3":
        out = conv3x3_dots3(y, w, b)
    else:
        out = jax.lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(y.dtype)
    if t is not None:
        out = out + t[:, None, None, :].astype(out.dtype)
    if add is not None:
        out = out + add.astype(out.dtype)
    return out


def _kernel(x_ref, gamma_ref, beta_ref, w_ref, b_ref, t_ref, add_ref,
            o_ref, pad_ref, *, h, w, num_groups, group_size, eps,
            has_t, has_add):
    hw = h * w

    # --- GN stats + normalize + SiLU into the zero-padded row slab; the
    # slab scratch persists across the cout-block grid dim, so this runs
    # once per image (grid iterates cout blocks fastest) ---
    @pl.when(pl.program_id(1) == 0)
    def _fill_slab():
        x = x_ref[0].astype(jnp.float32)  # [HW, C]
        c = x.shape[-1]
        # GroupNorm stats via one-hot channel->group matmuls (MXU)
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch // group_size == gr).astype(jnp.float32)
        s1 = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
        s2 = jnp.sum(x * x, axis=0, keepdims=True)
        g1 = jax.lax.dot_general(
            s1, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g2 = jax.lax.dot_general(
            s2, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
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
        pad_ref[: w + 1] = jnp.zeros((w + 1, c), pad_ref.dtype)
        pad_ref[pl.ds(w + 1, hw)] = y.astype(pad_ref.dtype)
        pad_ref[pl.ds(w + 1 + hw, w + 1)] = jnp.zeros(
            (w + 1, c), pad_ref.dtype
        )

    # --- 3x3 SAME conv: 9 shifted dots; out[p] += y[p + dy*W + dx] @ W_tap
    # (slab row offset of out row p is p + W + 1) ---
    row = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    left_edge = row % w == 0       # out column w=0: no dx=-1 tap
    right_edge = row % w == w - 1  # out column w=W-1: no dx=+1 tap
    acc = jnp.zeros((hw, o_ref.shape[-1]), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            start = (1 + dy) * w + 1 + dx
            tap = pad_ref[pl.ds(start, hw), :]
            if dx == -1:
                tap = jnp.where(left_edge, jnp.zeros_like(tap), tap)
            elif dx == 1:
                tap = jnp.where(right_edge, jnp.zeros_like(tap), tap)
            acc += jax.lax.dot_general(
                tap, w_ref[dy + 1, dx + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    out = acc.astype(o_ref.dtype) + b_ref[:].astype(o_ref.dtype)
    if has_t:
        out = out + t_ref[0].astype(o_ref.dtype)
    if has_add:
        out = out + add_ref[0]
    o_ref[0, :, :] = out


def _vmem_bytes(hw: int, w: int, cin: int, blk: int, n_blk: int,
                has_t: bool, has_add: bool) -> int:
    """Worst-case VMEM footprint of one grid step at cout-block size
    ``blk``, counting the double buffering Pallas applies to grid-mapped
    in/out blocks (v5e has ~16 MB of VMEM per core; the gate budgets
    13 MB to leave compiler headroom)."""
    pad = lambda c: (c + 127) // 128 * 128
    slab = (hw + 2 * (w + 1)) * pad(cin) * 2        # padded act, bf16
    xs = hw * pad(cin) * (2 * 2 + 4 + 4)            # x bf16 x2, 2 f32 tmps
    # weights double-buffer only when the block index actually varies
    weights = 9 * pad(cin) * pad(blk) * 2 * (2 if n_blk > 1 else 1)
    accs = hw * pad(blk) * (4 + 2 * 2)              # acc f32, out bf16 x2
    if has_add:
        accs += hw * pad(blk) * 2 * 2               # residual blocks x2
    return slab + xs + weights + accs


# Calibrated on v5e (tools/calibrate_fused_conv.py): with the estimator
# above, every observed Mosaic compile failure estimates >= 13.2 MB and
# every success that the gate should keep estimates <= 12.1 MB.
_VMEM_BUDGET = int(12.5 * 1024 * 1024)


def _pick_cout_block(hw, w, cin, cout, has_t, has_add):
    """Largest cout block (full, else a 128-multiple divisor) whose grid
    step fits the VMEM budget; None when even the smallest does not."""
    cands = [cout] + [
        m * 128 for m in (8, 4, 2, 1) if m * 128 < cout and cout % (m * 128) == 0
    ]
    for blk in cands:
        if _vmem_bytes(hw, w, cin, blk, cout // blk, has_t, has_add) \
                <= _VMEM_BUDGET:
            return blk
    return None


def use_gn_silu_conv(
    shape, cout: int, num_groups: int = 32, on_tpu: bool | None = None,
    has_t: bool = True, has_add: bool = True,
) -> bool:
    """Shape gate (conservative: assumes both epilogues unless told)."""
    if _IMPL == "xla":
        return False
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if _IMPL == "auto" and not on_tpu:
        return False
    b, h, w, cin = shape
    if cin % num_groups != 0 or h * w < 256 or w % 8 != 0:
        return False
    return _pick_cout_block(h * w, w, cin, cout, has_t, has_add) is not None


def _pallas_call(x, gamma, beta, w, b, t, add, num_groups, eps, blk=None):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    hw = h * wd
    has_t = t is not None
    has_add = add is not None
    if blk is None:
        blk = _pick_cout_block(hw, wd, cin, cout, has_t, has_add)
    if blk is None:  # dispatch gate should have declined; be safe
        return _xla_ref(x, gamma, beta, w, b, t, add, num_groups, eps)
    n_blk = cout // blk
    x2 = x.reshape(bsz, hw, cin)
    t2 = (t if has_t else jnp.zeros((bsz, cout), x.dtype)).reshape(
        bsz, 1, cout
    )
    add2 = (add if has_add else jnp.zeros((1, 1, 1, cout), x.dtype)).reshape(
        (bsz, hw, cout) if has_add else (1, 1, cout)
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, h=h, w=wd, num_groups=num_groups,
            group_size=cin // num_groups, eps=eps, has_t=has_t,
            has_add=has_add,
        ),
        grid=(bsz, n_blk),
        in_specs=[
            pl.BlockSpec((1, hw, cin), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, blk), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, blk),
                (lambda i, j: (i, 0, j)) if has_t
                else (lambda i, j: (0, 0, j)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hw, blk) if has_add else (1, 1, blk),
                (lambda i, j: (i, 0, j)) if has_add
                else (lambda i, j: (0, 0, j)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, hw, blk), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hw, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hw + 2 * (wd + 1), cin), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * hw * cin * cout,
            bytes_accessed=(x.size + bsz * hw * cout) * 2
            + 9 * cin * cout * 2,
            transcendentals=bsz * hw * cin,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x2,
        gamma.reshape(1, cin),
        beta.reshape(1, cin),
        w,
        b.reshape(1, cout),
        t2,
        add2,
    )
    return out.reshape(bsz, h, wd, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x, gamma, beta, w, b, t, add, num_groups, eps):
    return _pallas_call(x, gamma, beta, w, b, t, add, num_groups, eps)


def _fused_fwd(x, gamma, beta, w, b, t, add, num_groups, eps):
    return (
        _pallas_call(x, gamma, beta, w, b, t, add, num_groups, eps),
        (x, gamma, beta, w, b, t, add),
    )


def _fused_bwd(num_groups, eps, residuals, g):
    x, gamma, beta, w, b, t, add = residuals
    diff = [x, gamma, beta, w, b]
    if t is not None:
        diff.append(t)
    if add is not None:
        diff.append(add)

    def ref(*args):
        xx, gg, bb, ww, bias = args[:5]
        idx = 5
        tt = None
        aa = None
        if t is not None:
            tt = args[idx]
            idx += 1
        if add is not None:
            aa = args[idx]
        # 9-dots conv: its VJP is more dots — the conv-gradient emitter
        # (and its perf lottery, see conv3x3_dots) never enters the bwd.
        return _xla_ref(
            xx, gg, bb, ww, bias, tt, aa, num_groups, eps, conv_impl="dots"
        )

    _, vjp = jax.vjp(ref, *diff)
    grads = list(vjp(g))
    out = grads[:5]
    out.append(grads[5] if t is not None else None)
    out.append(grads[5 + (t is not None)] if add is not None else None)
    return tuple(out)


_fused.defvjp(_fused_fwd, _fused_bwd)


class GNParams(nn.Module):
    """Declares a GroupNorm's ``scale``/``bias`` params (same names/shapes
    as `ops.group_norm.GroupNorm` — checkpoint-identical) and returns them
    raw so the fused GN+SiLU+conv kernel can consume them directly."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "scale", nn.initializers.ones, (self.features,), jnp.float32
            ),
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ),
        )


class Conv3x3Params(nn.Module):
    """Declares a 3x3 `flax.linen.Conv`'s ``kernel``/``bias`` params (same
    names/shapes/inits — checkpoint-identical) and returns them raw."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (3, 3, self.in_features, self.features),
                jnp.float32,
            ),
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ),
        )


def gn_silu_conv3x3(
    x, gamma, beta, w, b, *, time_add=None, residual_add=None,
    num_groups: int = 32, eps: float = 1e-5, quant_ok: bool = True,
):
    """GroupNorm -> SiLU -> 3x3 SAME conv (+bias, +optional epilogues).

    Impl policy (set_fused_conv_impl): "xla"/"auto" (current default) =
    GN + conv emitter; "dots" = GN + 9-shifted-dots conv; "pallas" = the
    fused whole-chain kernel where the shape gate claims (else emitter).

    Why dots exists: XLA's conv emitter compiles some concat-conv shapes
    to ~4 TF/s nondeterministically across compiles, while the 9-dots
    formulation measures ~378 TF/s on the same shape.  The whole-pipeline
    A/B settled the default: emitter 6.50 vs dots 5.66 img/s at 256^2
    b16 (see module docstring) — emitter stays; dots is the escape hatch
    for a cliff compile.  The
    Pallas whole-chain kernel (stats+normalize+SiLU+conv+epilogues in one
    VMEM pass) was calibrated on-device (tools/calibrate_fused_conv.py)
    at 104-237 TF/s on the hot CFG-batch-32 shapes — consistently below
    the dots path — and large-cin shapes exceed VMEM entirely; it is kept
    as an opt-in reference implementation and for future hw-block tiling
    work, not as the default.

    Args:
      x: [B, H, W, Cin] input (the GN operand).
      gamma, beta: [Cin] GN affine.
      w: [3, 3, Cin, Cout] HWIO conv kernel; b: [Cout].
      time_add: optional [B, Cout] broadcast add (ResBlock conv1 + t).
      residual_add: optional [B, H, W, Cout] add (ResBlock conv2 + skip).
      quant_ok: whether this call site may take the W8A8 int8 path when
        `ops.quant_conv.set_conv_quant("int8")` is active (the U-Net
        ResBlocks opt in; the AE decoder passes False — its output is the
        final pixel map).  Sampling-only: int8 has no backward.
    """
    from ldm_tf2_tpu.ops.quant_conv import (
        gn_silu_conv3x3_int8,
        use_int8_conv,
    )

    if quant_ok and use_int8_conv(
        x.shape, w.shape[-1], num_groups,
        has_add=residual_add is not None,
    ):
        return gn_silu_conv3x3_int8(
            x, gamma, beta, w, b, time_add=time_add,
            residual_add=residual_add, num_groups=num_groups, eps=eps,
        )
    if _IMPL == "pallas" and use_gn_silu_conv(
        x.shape, w.shape[-1], num_groups,
        has_t=time_add is not None, has_add=residual_add is not None,
    ):
        return _fused(
            x, gamma, beta, w.astype(x.dtype), b, time_add, residual_add,
            num_groups, eps,
        )
    # "auto" resolves to the conv emitter: the on-TPU pipeline A/B
    # measured emitter 6.50 / dots 5.66 / dots3 5.44 img/s (256^2 b16,
    # one session), so the emitter keeps the default.
    conv_impl = _IMPL if _IMPL in ("dots", "dots3") else "emitter"
    return _xla_ref(
        x, gamma, beta, w, b, time_add, residual_add, num_groups, eps,
        conv_impl=conv_impl,
    )
