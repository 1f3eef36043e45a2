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

IN-MODEL FINDING (v5e, device profiler): the 2-stage split that wins at
probe level (1.17-1.50x) decays to noise inside the real U-Net — the
XLA conv emitter keeps its activations in a {3,0,2,1} layout while every
Pallas custom call demands row-major, so each chain pays layout copies
at both boundaries, and the dequant epilogue un-fuses from the conv
(11.9 ms/eval of separate `add_convert_fusion` at CFG batch 48).  The
shipped default is therefore the **whole-chain kernel**
(`_chain_kernel`): one custom call per chain doing GN stats, normalize+
SiLU, per-example quantize into an s8 row slab, the 3x3 conv as 9
shifted s8 slab dots (Mosaic runs s8xs8->s32 at 312 TOP/s = 1.59x the
bf16 peak, tools/probe_mosaic_int8.py), and the dequant/bias/time/
residual epilogue — all VMEM-resident.  Per-chain device times
(tools/ab_int8_chain.py, CFG batch 48):

  shape                 epi   bf16 chain   2-stage   fused    speedup
  32x32  640-> 320      res     1.540 ms    1.211    0.963      1.60x
  32x32  320-> 320      t       0.866 ms    0.980    0.536      1.62x
  16x16 1280->1280      t       2.341 ms    1.742    1.316      1.78x
  16x16 1280->1280      res     2.340 ms    1.746    1.340      1.75x
  8x8   1280->1280      t       0.560 ms    0.501    0.990      --
  64x64  320-> 320      t       2.232 ms    2.021    VMEM       --

Dispatch: fused where hw >= 256 and VMEM fits; the 8x8/4x4 levels and
64x64 VMEM-decline shapes use the 2-stage composition, whose stage-2 s8
conv is the 9-shifted-dots form at (hw 64, cin <= 1280) — 0.361 vs the
emitter's 0.501 ms at [48,8,8,1280->1280], and dot_general epilogues
fuse natively where the emitter custom call cannot — and the emitter
elsewhere (hw-256 dots won probes but measured -0.9% on the 512^2
pipeline; see `use_fused_int8_chain` NOTE).  Whole-pipeline (same-day
A/B pairs): 256^2 b24 50-step txt2img 6.88 -> 7.44 img/s (+8.2%);
512^2 b16 0.333 -> 0.348 (+4.5%).

Stage 1 of the 2-stage fallback is a Pallas kernel for two reasons:
(a) it is a single in-VMEM pass, and (b) a `pallas_call` is opaque to
XLA fusion, which *enforces* the two-stage split inside one jitted
program — with plain XLA ops the compiler fuses the quantize back into
the conv prologue and reproduces the slow case.

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
    # tiling forbids a (1, 1) block); each step writes its own row via a
    # masked read-modify-write (scalar and pl.ds stores both fail to
    # lower on at least one backend; B is tiny).
    row = jax.lax.broadcasted_iota(jnp.int32, sa_ref.shape, 0)
    sa_ref[:] = jnp.where(row == pl.program_id(0), sa, sa_ref[:])


def gn_silu_quant(x, gamma, beta, num_groups: int = 32, eps: float = 1e-5):
    """GN + SiLU + per-example symmetric int8 quantization.

    Returns (y8 [B,H,W,C] int8, sa [B] f32) with
    y8 * sa[b] ~= silu(group_norm(x)).

    Dispatch: the one-pass per-image kernel when the [HW, C] slab fits
    VMEM, else the 3-phase streaming kernel (512^2-class shapes).
    """
    b, h, w, c = x.shape
    hw = h * w
    if _vmem_bytes(hw, c) > _VMEM_BUDGET:
        hb = _stream_block(hw, c)
        if hb is None:
            raise ValueError(
                f"gn_silu_quant: no VMEM-fitting block for shape {x.shape}"
            )
        return _gn_silu_quant_stream(x, gamma, beta, num_groups, eps, hb)
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


def _gn_silu_quant_stream_kernel(x_ref, gamma_ref, beta_ref, o_ref, sa_ref,
                                 s12_ref, mr_ref, am_ref, *,
                                 num_groups, eps, group_size, hw):
    """Streaming 3-phase variant for images whose [HW, C] slab exceeds
    VMEM (512^2-class shapes).  Grid (B, 3, n_blocks), phases over the
    middle dim: 0 = accumulate per-channel sum/sum-sq, reduce to group
    mean/rstd on the last block; 1 = recompute normalize per block,
    accumulate the per-example amax; 2 = normalize + quantize + write.
    x is read three times (bandwidth cost), which only the shapes the
    one-pass kernel cannot hold pay."""
    p = pl.program_id(1)
    j = pl.program_id(2)
    n_j = pl.num_programs(2)
    # bound outside the pl.when bodies: program_id inside a when-closure
    # fails to lower on the interpret path
    img_row_mask = (
        jax.lax.broadcasted_iota(jnp.int32, sa_ref.shape, 0)
        == pl.program_id(0)
    )

    @pl.when((p == 0) & (j == 0))
    def _zero_stats():
        s12_ref[:] = jnp.zeros_like(s12_ref)

    @pl.when(p == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)
        s12_ref[0:1] += jnp.sum(x, axis=0, keepdims=True)
        s12_ref[1:2] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when((p == 0) & (j == n_j - 1))
    def _finalize_stats():
        c = s12_ref.shape[-1]
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch // group_size == gr).astype(jnp.float32)
        g1 = jax.lax.dot_general(
            s12_ref[0:1], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g2 = jax.lax.dot_general(
            s12_ref[1:2], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        n = float(hw * group_size)
        mean_g = g1 / n
        var_g = jnp.maximum(g2 / n - mean_g * mean_g, 0.0)
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mr_ref[0:1] = jax.lax.dot_general(
            mean_g, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mr_ref[1:2] = jax.lax.dot_general(
            rstd_g, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        am_ref[0, 0] = 0.0

    def _normalized():
        x = x_ref[0].astype(jnp.float32)
        y = (x - mr_ref[0:1]) * (
            mr_ref[1:2] * gamma_ref[:].astype(jnp.float32)
        )
        y = y + beta_ref[:].astype(jnp.float32)
        return y * jax.nn.sigmoid(y)

    @pl.when(p == 1)
    def _amax():
        am_ref[0, 0] = jnp.maximum(
            am_ref[0, 0], jnp.max(jnp.abs(_normalized()))
        )

    @pl.when(p == 2)
    def _quantize():
        sa = jnp.maximum(am_ref[0, 0], 1e-8) * (1.0 / 127.0)
        o_ref[0] = jnp.clip(
            jnp.round(_normalized() * (1.0 / sa)), -127.0, 127.0
        ).astype(jnp.int8)

    @pl.when((p == 2) & (j == 0))
    def _write_scale():
        sa = jnp.maximum(am_ref[0, 0], 1e-8) * (1.0 / 127.0)
        sa_ref[:] = jnp.where(img_row_mask, sa, sa_ref[:])


def _stream_block(hw: int, c: int) -> int | None:
    """Largest hw block (divisor of hw) whose grid step fits the VMEM
    budget; None when hw has no suitable divisor."""
    pc = (c + 127) // 128 * 128
    for hb in (2048, 1024, 512, 256, 128):
        if hw % hb == 0 and hb * pc * (2 * 2 + 4 + 4 + 1 * 2) \
                <= _VMEM_BUDGET:
            return hb
    return None


def _gn_silu_quant_stream(x, gamma, beta, num_groups, eps, hb):
    b, h, w, c = x.shape
    hw = h * w
    out8, sa = pl.pallas_call(
        functools.partial(
            _gn_silu_quant_stream_kernel,
            num_groups=num_groups,
            eps=eps,
            group_size=c // num_groups,
            hw=hw,
        ),
        grid=(b, 3, hw // hb),
        in_specs=[
            pl.BlockSpec((1, hb, c), lambda i, p, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # revisited at phases 0/1 without being written — the interim
            # flushes write garbage that phase 2 overwrites
            pl.BlockSpec((1, hb, c), lambda i, p, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c), jnp.float32),  # s1 / s2 accumulators
            pltpu.VMEM((2, c), jnp.float32),  # mean / rstd
            pltpu.SMEM((1, 1), jnp.float32),  # running amax
        ],
        cost_estimate=pl.CostEstimate(
            flops=20 * b * hw * c,
            bytes_accessed=3 * x.size * 2 + b * hw * c,
            transcendentals=2 * b * hw * c,
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


def use_int8_conv(shape, cout: int | None = None, num_groups: int = 32,
                  has_add: bool = False,
                  on_tpu: bool | None = None) -> bool:
    """Shape gate: quant mode on, channels group-divisible, and the
    shape belongs to a measured-win class:

      * hw == 64 (8x8): the 2-stage emitter composition, exercised
        end-to-end by the good 256^2 pipeline (0.501 vs bf16 0.561 ms);
      * hw >= 256 where the whole-chain Pallas kernel claims.

    Everything else stays bf16.  In particular the 64x64 (512^2 L0)
    classes are EXCLUDED even though isolated A/Bs showed the streaming
    2-stage winning ~10% there: the s8 conv emitter inherits the bf16
    emitter's nondeterministic ~4 TF/s compile lottery (ops/
    fused_conv.py), and the first 512^2 int8 pipeline ran >6x slower
    than bf16 — a catastrophic tail not worth the modest win.  Pallas
    chains are deterministic; the emitter is only trusted where a full
    pipeline measurement has covered it."""
    if _QUANT != "int8":
        return False
    b, h, w, c = shape
    if c % num_groups != 0:
        return False
    hw = h * w
    if hw == 64:
        # 8x8-class: 2-stage needs a quant-kernel fit (always true at
        # these sizes) — 4x4 (hw=16) stays bf16 (measured tie/loss)
        return _vmem_bytes(hw, c) <= _VMEM_BUDGET
    if cout is None:
        return False
    return use_fused_int8_chain(hw, w, c, cout, has_add)


def _chain_kernel(x_ref, gamma_ref, beta_ref, w8_ref, ws_ref, b_ref,
                  t_ref, add_ref, o_ref, slab_ref, sa_ref, *, h, w,
                  num_groups, group_size, eps, has_t, has_add, rc):
    """Whole-chain W8A8 kernel: GN stats + normalize + SiLU + per-image
    quantize into an s8 row slab (once per image, j==0), then the 3x3
    conv as 9 shifted s8 slab dots (Mosaic runs s8xs8->s32 at ~312 TOP/s,
    tools/probe_mosaic_int8.py) with the dequant/bias/time/residual
    epilogue applied in VMEM.  One custom call per chain — the two-stage
    XLA composition loses its probe-level win to layout copies at every
    custom-call boundary plus an unfused dequant pass (see module
    docstring, "in-model measurement").

    The fill phase is row-chunked (``rc`` rows per chunk, three passes:
    stats -> amax -> quantize, recomputing the normalize): f32 temps
    shrink from 8*HW*C to 8*rc*C bytes, which is what lets the large-cin
    decoder concat shapes ([48,32,32,640]->320 + residual) fit VMEM."""
    hw = h * w

    @pl.when(pl.program_id(1) == 0)
    def _fill_slab():
        c = x_ref.shape[-1]
        n_chunks = hw // rc

        # chunk loops are STATICALLY unrolled: Mosaic rejects dynamic
        # (fori_loop-traced) slab store offsets on the s8 slab, while the
        # same offsets as constants compile fine
        s1 = jnp.zeros((1, c), jnp.float32)
        s2 = jnp.zeros((1, c), jnp.float32)
        for k in range(n_chunks):
            xk = x_ref[0, pl.ds(k * rc, rc), :].astype(jnp.float32)
            s1 = s1 + jnp.sum(xk, axis=0, keepdims=True)
            s2 = s2 + jnp.sum(xk * xk, axis=0, keepdims=True)
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        m = (ch // group_size == gr).astype(jnp.float32)
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
        scale_c = rstd_c * gamma_ref[:].astype(jnp.float32)
        beta_f = beta_ref[:].astype(jnp.float32)

        def _norm_chunk(k):
            xk = x_ref[0, pl.ds(k * rc, rc), :].astype(jnp.float32)
            yk = (xk - mean_c) * scale_c + beta_f
            return yk * jax.nn.sigmoid(yk)

        slab_ref[: w + 1] = jnp.zeros((w + 1, c), slab_ref.dtype)
        slab_ref[pl.ds(w + 1 + hw, w + 1)] = jnp.zeros(
            (w + 1, c), slab_ref.dtype
        )

        if n_chunks == 1:
            # fast path: keep the single y chunk live instead of
            # recomputing the normalize for the amax and quantize passes
            y = _norm_chunk(0)
            sa = jnp.maximum(jnp.max(jnp.abs(y)), 1e-8) * (1.0 / 127.0)
            sa_ref[0, 0] = sa
            slab_ref[pl.ds(w + 1, hw)] = jnp.clip(
                jnp.round(y * (1.0 / sa)), -127.0, 127.0
            ).astype(slab_ref.dtype)
        else:
            amax = jnp.float32(0.0)
            for k in range(n_chunks):
                amax = jnp.maximum(amax, jnp.max(jnp.abs(_norm_chunk(k))))
            sa = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
            sa_ref[0, 0] = sa
            inv_sa = 1.0 / sa
            for k in range(n_chunks):
                y8 = jnp.clip(
                    jnp.round(_norm_chunk(k) * inv_sa), -127.0, 127.0
                ).astype(slab_ref.dtype)
                slab_ref[pl.ds(w + 1 + k * rc, rc)] = y8

    row = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    left_edge = row % w == 0
    right_edge = row % w == w - 1
    acc = jnp.zeros((hw, o_ref.shape[-1]), jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            start = (1 + dy) * w + 1 + dx
            tap = slab_ref[pl.ds(start, hw), :]
            if dx == -1:
                tap = jnp.where(left_edge, jnp.zeros_like(tap), tap)
            elif dx == 1:
                tap = jnp.where(right_edge, jnp.zeros_like(tap), tap)
            acc += jax.lax.dot_general(
                tap, w8_ref[dy + 1, dx + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    out = acc.astype(jnp.float32) * (sa_ref[0, 0] * ws_ref[:]) + b_ref[:]
    if has_t:
        out = out + t_ref[0].astype(jnp.float32)
    if has_add:
        out = out + add_ref[0].astype(jnp.float32)
    o_ref[0, :, :] = out.astype(o_ref.dtype)


def _chain_vmem_bytes(hw: int, w: int, cin: int, blk: int, n_blk: int,
                      rc: int, has_add: bool) -> int:
    """Worst-case VMEM of one chain-kernel grid step.

    Calibrated against the compiler's scoped-vmem accounting (512^2
    bisect): the fill's three passes reuse identical expressions, so
    Mosaic CSEs BOTH the f32 conversion of x and the normalized y across
    passes — two full-hw f32 arrays live regardless of the row-chunk
    size; only the SiLU/product temporaries shrink with ``rc``.  With
    xs = hw*pc*12 + rc*pc*4 the [1024,960->640]+t failure estimates
    18.2 MiB vs the compiler's reported 18.35 MiB scoped OOM, and every
    measured-good shape estimates <= 15.3 MiB, against the 16 MiB scoped
    limit — the 15.5 MiB budget splits them."""
    pad = lambda c: (c + 127) // 128 * 128
    slab = (hw + 2 * (w + 1)) * pad(cin)                 # s8 slab
    # x bf16 x2 + full-hw f32 x (CSE) + full-hw f32 y (CSE)
    xs = hw * pad(cin) * (2 * 2 + 4 + 4)
    xs += rc * pad(cin) * 4                              # SiLU chunk temp
    weights = 9 * pad(cin) * pad(blk) * (2 if n_blk > 1 else 1)  # s8
    accs = hw * pad(blk) * (4 + 2 * 2)                   # s32 acc, out bf16 x2
    if has_add:
        accs += hw * pad(blk) * 2 * 2
    return slab + xs + weights + accs


_CHAIN_VMEM_BUDGET = int(15.5 * 1024 * 1024)


def use_fused_int8_chain(hw, w, cin, cout, has_add) -> bool:
    """Dispatch gate for the whole-chain kernel: measured to win 1.5-1.8x
    at hw >= 256 (tools/ab_int8_chain.py); at 8x8 (hw=64) the grid
    overhead loses to the 2-stage path, and VMEM-overflow shapes
    decline via `_chain_pick`.

    NOTE: at [32,16,16,2560->1280] (512^2 L2 concat) the chunked fill +
    blk-128 dots measure 2.59 ms vs the 2-stage's 2.16 at PROBE level,
    but routing cin >= 2560 to the 2-stage(dots) path measured -0.9% on
    the full 512^2 pipeline (0.3478 -> 0.3447, same day) — the probe
    ordering did not survive in-model, so fused keeps the claim (the
    session-8 lesson again: trust pipeline A/Bs over probes for 2-stage
    paths)."""
    return hw >= 256 and _chain_pick(hw, w, cin, cout, has_add) is not None


def _chain_pick(hw, w, cin, cout, has_add):
    """(cout block, fill row-chunk) preferring the whole image per chunk
    (single-pass fill) and the largest cout block; None when no
    combination fits the VMEM budget."""
    blk_cands = [cout] + [
        m * 128 for m in (8, 4, 2, 1)
        if m * 128 < cout and cout % (m * 128) == 0
    ]
    # cap the fill unroll at 4 chunks: the 8-chunk fill at
    # [32x32, 1280->640] crashed Mosaic (512^2 bisect); shapes needing
    # deeper chunking decline to the 2-stage path, which beats bf16 on
    # exactly those large-cin classes anyway
    rc_cands = [hw] + [
        r for r in (512, 256, 128)
        if r < hw and hw % r == 0 and hw // r <= 4
    ]
    for rc in rc_cands:
        for blk in blk_cands:
            if _chain_vmem_bytes(hw, w, cin, blk, cout // blk, rc,
                                 has_add) <= _CHAIN_VMEM_BUDGET:
                return blk, rc
    return None


def gn_silu_conv3x3_int8_fused(
    x, gamma, beta, w, b, *, time_add=None, residual_add=None,
    num_groups: int = 32, eps: float = 1e-5, blk=None,
):
    """Whole-chain variant of `gn_silu_conv3x3_int8` (one Pallas call)."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    hw = h * wd
    has_t = time_add is not None
    has_add = residual_add is not None
    if blk is None:
        picked = _chain_pick(hw, wd, cin, cout, has_add)
        assert picked is not None, "dispatch gate should have declined"
        blk, rc = picked
    else:
        rc = hw
    n_blk = cout // blk

    w8, ws = quantize_weight(w)
    x2 = x.reshape(bsz, hw, cin)
    t2 = (time_add if has_t else jnp.zeros((bsz, cout), x.dtype)).reshape(
        bsz, 1, cout
    )
    add2 = (
        residual_add if has_add else jnp.zeros((1, 1, 1, cout), x.dtype)
    ).reshape((bsz, hw, cout) if has_add else (1, 1, cout))

    out = pl.pallas_call(
        functools.partial(
            _chain_kernel, h=h, w=wd, num_groups=num_groups,
            group_size=cin // num_groups, eps=eps, has_t=has_t,
            has_add=has_add, rc=rc,
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
            pltpu.VMEM((hw + 2 * (wd + 1), cin), jnp.int8),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * hw * cin * cout,
            bytes_accessed=(x.size + bsz * hw * cout) * 2
            + 9 * cin * cout,
            transcendentals=bsz * hw * cin,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x2,
        gamma.reshape(1, cin),
        beta.reshape(1, cin),
        w8,
        ws.reshape(1, cout).astype(jnp.float32),
        b.reshape(1, cout).astype(jnp.float32),
        t2,
        add2,
    )
    return out.reshape(bsz, h, wd, cout)


def gn_silu_conv3x3_int8(
    x, gamma, beta, w, b, *, time_add=None, residual_add=None,
    num_groups: int = 32, eps: float = 1e-5,
):
    """The int8 twin of `ops.fused_conv.gn_silu_conv3x3` (sampling only).

    Dispatch (measured, tools/ab_int8_chain.py on v5e):
      * whole-chain Pallas kernel where it claims (hw >= 256 + VMEM fit):
        1.6-1.8x over the bf16 chain at the 256^2 hot shapes;
      * else the 2-stage composition: GN+SiLU+quantize (Pallas, stage 1)
        -> s8 3x3 SAME conv (XLA emitter, stage 2) -> dequant epilogue.
        Wins at 8x8 (0.50 vs 0.56 ms) and the large-cin VMEM-decline
        shapes (640-concat 1.21 vs 1.54; 64x64 2.02 vs 2.23).
    """
    cout = w.shape[-1]
    hw, cin = x.shape[1] * x.shape[2], x.shape[3]
    if use_fused_int8_chain(
        hw, x.shape[2], cin, cout, residual_add is not None,
    ):
        return gn_silu_conv3x3_int8_fused(
            x, gamma, beta, w, b, time_add=time_add,
            residual_add=residual_add, num_groups=num_groups, eps=eps,
        )
    # Stage-2 impl per measured class (tools/ab_int8_chain.py, v5e):
    # 9-shifted s8 dots beat the s8 emitter at hw 64 with cin <= 1280
    # (0.361 vs 0.501 ms at [48,8,8,1280->1280]) — and the win survived
    # the 256^2 pipeline A/B (int8 7.352 -> 7.438 img/s same-day, bf16
    # stable).  The emitter keeps hw 64 cin 2560 (0.694 vs 1.072) and
    # hw >= 1024 (2.297 vs 2.969 at [32,32,32,1280]).  hw 256 dots won
    # at probe level too (1.983 vs 2.155 at cin 2560) but measured
    # NEGATIVE on the 512^2 pipeline (0.3478 -> 0.3447 combined with the
    # cin-2560 fused decline), so 2-stage hw 256 stays on the emitter.
    stage2 = "dots" if (hw == 64 and cin <= 1280) else "emitter"
    return gn_silu_conv3x3_int8_two_stage(
        x, gamma, beta, w, b, time_add=time_add,
        residual_add=residual_add, num_groups=num_groups, eps=eps,
        stage2=stage2,
    )


def _batched_conv_kernel(y8p_ref, rsa_ref, w8_ref, ws_ref, b_ref, t_ref,
                         add_ref, o_ref, *, hw, w, n_rows, has_t, has_add):
    """Batched s8 conv for small-hw levels (8x8/4x4): every image's rows
    stacked in one [B*HW, C] operand so the 9 tap dots run at full MXU
    width instead of 48 tiny per-image grid steps.  Taps that would cross
    an image boundary (top/bottom w-row bands for dy = -/+1, left/right
    columns for dx) are masked to zero; the operand carries w+1 global
    zero-pad rows on each end so every static tap slice is in-bounds."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    li = row % hw   # row index local to its image
    left_edge = row % w == 0
    right_edge = row % w == w - 1
    top_band = li < w
    bottom_band = li >= hw - w

    acc = jnp.zeros((n_rows, o_ref.shape[-1]), jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            start = _BATCH_PAD + dy * w + dx
            tap = y8p_ref[pl.ds(start, n_rows), :]
            mask = None
            if dy == -1:
                mask = top_band
            elif dy == 1:
                mask = bottom_band
            if dx == -1:
                mask = left_edge if mask is None else mask | left_edge
            elif dx == 1:
                mask = right_edge if mask is None else mask | right_edge
            d = jax.lax.dot_general(
                tap, w8_ref[dy + 1, dx + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if mask is not None:
                # masking is per OUT row, so zero the dot result rather
                # than the s8 operand: the [rows, blk] temp is ~10x
                # smaller than a masked [rows, cin] tap copy (which blew
                # VMEM at 8x8x1280)
                d = jnp.where(mask, jnp.zeros_like(d), d)
            acc += d

    out = acc.astype(jnp.float32) * (rsa_ref[:] * ws_ref[:]) + b_ref[:]
    if has_t:
        out = out + t_ref[:].astype(jnp.float32)
    if has_add:
        out = out + add_ref[:].astype(jnp.float32)
    o_ref[:, :] = out.astype(o_ref.dtype)


# global zero-pad rows on each end of the stacked operand: >= w+1 for
# tap reach and a multiple of 32 so every s8 tile boundary stays aligned
_BATCH_PAD = 32


def _batched_vmem_bytes(n_rows: int, cin: int, blk: int, n_blk: int,
                        has_t: bool, has_add: bool) -> int:
    pad = lambda c: (c + 127) // 128 * 128
    y8p = (n_rows + 2 * _BATCH_PAD) * pad(cin)           # s8, single buffer
    weights = 9 * pad(cin) * pad(blk) * (2 if n_blk > 1 else 1)
    accs = n_rows * pad(blk) * (4 + 2 * 2)               # s32 acc + out x2
    if has_t:
        accs += n_rows * pad(blk) * 2 * 2
    if has_add:
        accs += n_rows * pad(blk) * 2 * 2
    return y8p + weights + accs


def _batched_pick_blk(n_rows, cin, cout, has_t, has_add):
    cands = [cout] + [
        m * 128 for m in (8, 4, 2, 1)
        if m * 128 < cout and cout % (m * 128) == 0
    ]
    for blk in cands:
        if _batched_vmem_bytes(n_rows, cin, blk, cout // blk, has_t,
                               has_add) <= _VMEM_BUDGET:
            return blk
    return None


def _s8_conv3x3_batched(y8, sa, w8, ws, b, time_add, residual_add,
                        out_dtype, blk):
    """XLA glue for `_batched_conv_kernel`: flatten to [B*HW, C], pad
    w+1 zero rows per end, expand per-image scales/time rows."""
    bsz, h, wd, cin = y8.shape
    cout = w8.shape[-1]
    hw = h * wd
    n_rows = bsz * hw
    has_t = time_add is not None
    has_add = residual_add is not None
    n_blk = cout // blk

    y8f = y8.reshape(n_rows, cin)
    y8p = jnp.pad(y8f, ((_BATCH_PAD, _BATCH_PAD), (0, 0)))
    rsa = jnp.repeat(sa, hw)[:, None]                     # [n_rows, 1]
    t_rows = (
        jnp.repeat(time_add, hw, axis=0)
        if has_t else jnp.zeros((1, cout), jnp.bfloat16)
    )
    add_rows = (
        residual_add.reshape(n_rows, cout)
        if has_add else jnp.zeros((1, cout), jnp.bfloat16)
    )

    out = pl.pallas_call(
        functools.partial(
            _batched_conv_kernel, hw=hw, w=wd, n_rows=n_rows,
            has_t=has_t, has_add=has_add,
        ),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((n_rows + 2 * _BATCH_PAD, cin), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, blk), lambda j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_rows, blk) if has_t else (1, blk),
                (lambda j: (0, j)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_rows, blk) if has_add else (1, blk),
                (lambda j: (0, j)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((n_rows, blk), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n_rows * cin * cout,
            bytes_accessed=n_rows * cin + n_rows * cout * 2
            + 9 * cin * cout,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        y8p,
        rsa.astype(jnp.float32),
        w8,
        ws.reshape(1, cout).astype(jnp.float32),
        b.reshape(1, cout).astype(jnp.float32),
        t_rows,
        add_rows,
    )
    return out.reshape(bsz, h, wd, cout)


def _s8_conv3x3_dots(y8, w8):
    """3x3 SAME s8 conv as 9 shifted s8 x s8 -> s32 dot_generals.

    The integer twin of ``ops.fused_conv.conv3x3_dots`` (same shared
    tap-enumeration core, `fused_conv.conv3x3_tap_dots`): bypasses XLA's
    convolution emitter, which inherits the bf16 emitter's
    nondeterministic ~4 TF/s compile lottery (ops/fused_conv.py finding
    #1).  dot_general s8xs8->s32 measures 380 TOP/s on v5e
    (tools/probe_int8.py) and has never drawn a cliff.  Integer-exact vs
    the emitter (same taps, same s32 accumulation; zero-pad border
    matches SAME semantics)."""
    from ldm_tf2_tpu.ops.fused_conv import conv3x3_tap_dots

    return conv3x3_tap_dots(y8, w8, jnp.int32)


# Stage-2 s8 conv impl for the 2-stage path: "auto" (default — the
# per-class measured choice made by `gn_silu_conv3x3_int8`) | "emitter"
# (force the XLA s8 conv) | "dots" (force the 9 shifted s8 dots — the
# deterministic-compile escape hatch if a process draws the emitter's
# compile-lottery cliff on a claimed class).
_STAGE2 = "auto"


def set_int8_stage2(impl: str) -> None:
    global _STAGE2
    if impl not in ("auto", "emitter", "dots"):
        raise ValueError(f"unknown int8 stage-2 impl: {impl!r}")
    _STAGE2 = impl


def gn_silu_conv3x3_int8_two_stage(
    x, gamma, beta, w, b, *, time_add=None, residual_add=None,
    num_groups: int = 32, eps: float = 1e-5, stage2: str | None = None,
):
    """2-stage W8A8 composition (fallback where the whole-chain kernel
    declines): Pallas GN+SiLU+quantize -> s8 3x3 SAME conv (XLA emitter,
    or 9-shifted-dots via ``stage2="dots"`` / ``set_int8_stage2``) ->
    dequant.

    The batched small-hw Pallas conv (`_s8_conv3x3_batched`) is a
    MEASURED NEGATIVE as a dispatch target and is kept opt-in only:
    at 4x4 it ties the emitter (0.144 vs 0.147 ms) or loses on concats
    (0.448 vs bf16's 0.293), and at 8x8x1280 — the one shape with a
    real prize — Mosaic crashes on the misaligned 3072-row s8 tap
    slices (tools/ab_int8_chain.py v5).  The emitter 2-stage wins at
    8x8 (0.501 vs bf16 0.561)."""
    y8, sa = gn_silu_quant(x, gamma, beta, num_groups, eps)
    w8, ws = quantize_weight(w)
    # The global policy (set_int8_stage2) force-overrides when not
    # "auto"; else the caller's per-class choice; else the emitter.
    impl = _STAGE2 if _STAGE2 != "auto" else (stage2 or "emitter")
    if impl == "dots":
        acc = _s8_conv3x3_dots(y8, w8)
    else:
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
