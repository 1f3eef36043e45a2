"""im2col+single-dot probe for the 64x64 320-ch conv class (512^2 L0).

At [b32, 64, 64, 320->320] neither the 9-dots formulation (k = 320 is
MXU-shallow: 5.9 ms) nor the fused Pallas chain (VMEM decline) claims,
and the bf16 emitter sits at ~108 TF/s (2.23 ms) — the one hot class
with no measured alternative.  An im2col patch slab makes the
contraction k = 9*Cin = 2880 (MXU-deep) at the cost of a 9x activation
materialization; this probe measures whether XLA fuses the patch
construction into the dot well enough to win.

Formulations (all behind the exact in-model GN+SiLU prologue and
time/residual epilogue, so the numbers are chain-for-chain comparable
with tools/ab_int8_chain.py):

  emitter   lax.conv_general_dilated                    (the incumbent)
  dots      9 shifted k=Cin dots                        (known loser here)
  im2col    concat 9 shifted slices -> one [BHW, 9Cin] x [9Cin, Cout] dot
  patches   lax.conv_general_dilated_patches -> the same dot

  python tools/probe_im2col.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_op import TRACE_DIR, device_ms_by_case
from ldm_tf2_tpu.ops import fused_conv

SHAPES = [
    (32, 64, 64, 320, 320, "t"),     # 512^2 L0 transformer-side conv
    (32, 64, 64, 640, 320, "res"),   # 512^2 L0 concat/res conv
    (8, 128, 128, 320, 320, "t"),    # 1024^2 L0 (CFG b8)
]


def conv3x3_im2col(y, w, b):
    """One [B,H,W,9Cin] patch slab (kh,kw,cin tap order — matches
    w.reshape) contracted in a single deep dot."""
    bsz, h, wd, cin = y.shape
    cout = w.shape[-1]
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.concatenate(
        [
            jax.lax.dynamic_slice(yp, (0, dy, dx, 0), (bsz, h, wd, cin))
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )
    wk = w.reshape(9 * cin, cout)
    out = jax.lax.dot_general(
        taps, wk.astype(taps.dtype),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(y.dtype) + b.astype(y.dtype)


def conv3x3_patches(y, w, b):
    """XLA's own im2col: conv_general_dilated_patches emits the patch
    slab (cin-major tap order), then the same single deep dot."""
    bsz, h, wd, cin = y.shape
    cout = w.shape[-1]
    taps = jax.lax.conv_general_dilated_patches(
        y, (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H, W, cin*9] with (cin, kh, kw) channel order
    wk = jnp.transpose(w, (2, 0, 1, 3)).reshape(9 * cin, cout)
    out = jax.lax.dot_general(
        taps, wk.astype(taps.dtype),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(y.dtype) + b.astype(y.dtype)


def main():
    rng = np.random.RandomState(0)
    n = 8
    print(f"{'shape':26} {'emitter':>8} {'dots':>8} {'im2col':>8} "
          f"{'patches':>8}  (ms/call, device)")
    for bsz, h, w, cin, cout, epi in SHAPES:
        x = jnp.asarray(rng.randn(bsz, h, w, cin), jnp.bfloat16)
        gamma = jnp.asarray(1 + 0.1 * rng.randn(cin), jnp.float32)
        beta = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
        t = (jnp.asarray(rng.randn(bsz, cout), jnp.bfloat16)
             if epi == "t" else None)
        res = (jnp.asarray(rng.randn(bsz, h, w, cout), jnp.bfloat16)
               if epi == "res" else None)

        def chain(conv):
            from ldm_tf2_tpu.ops.group_norm import _mxu_stats_group_norm

            def f(x):
                y = _mxu_stats_group_norm(x, gamma, beta, 32, 1e-5, True)
                out = conv(y, wk, bias)
                if t is not None:
                    out = out + t[:, None, None, :].astype(out.dtype)
                if res is not None:
                    out = out + res.astype(out.dtype)
                return out

            return f

        def chain_emitter(x):
            return chain(fused_conv.conv3x3)(x)

        def chain_dots(x):
            return chain(fused_conv.conv3x3_dots)(x)

        def chain_im2col(x):
            return chain(conv3x3_im2col)(x)

        def chain_patches(x):
            return chain(conv3x3_patches)(x)

        cases = [("emitter", chain_emitter), ("dots", chain_dots),
                 ("im2col", chain_im2col), ("patches", chain_patches)]
        jitted, outs0 = [], {}
        for name, fn in cases:
            g = jax.jit(fn)
            try:
                o = g(x)
                jax.block_until_ready(o)
                outs0[name] = np.asarray(o[:2, :4, :4, :8], np.float32)
            except Exception as e:  # noqa: BLE001
                print(f"  {name} FAILED: {type(e).__name__}: {e}")
                continue
            jitted.append((name, fn, g))
        # numerics: every formulation must match the emitter
        for name in outs0:
            if name != "emitter":
                d = np.abs(outs0[name] - outs0["emitter"]).max()
                assert d < 0.25, (name, d)  # bf16 tap-order resum noise
        with jax.profiler.trace(TRACE_DIR):
            for name, fn, g in jitted:
                outs = [g(x) for _ in range(n)]
                for o in outs:
                    float(jnp.sum(o[:1, :1, :1, :1].astype(jnp.float32)))
        per = device_ms_by_case(TRACE_DIR, n)
        row = {}
        for name, fn, g in jitted:
            k = f"jit_{fn.__name__}"
            row[name] = f"{per[k][0]:8.3f}" if k in per else "??"
        tag = f"{h}x{w} {cin}->{cout} {epi} b{bsz}"
        print(f"{tag:26} {row.get('emitter','--'):>8} "
              f"{row.get('dots','--'):>8} {row.get('im2col','--'):>8} "
              f"{row.get('patches','--'):>8}")


if __name__ == "__main__":
    main()
