"""Probe: W8A8 int8 on the REAL ResBlock chain shapes — is the 2x real?

tools/probe_int8.py established the primitives: s8 dots hit 1.93x the
bf16 peak, the dequant epilogue is free, and the XLA conv emitter accepts
s8 convs at 261 TOP/s on the bare hot shape (vs ~133 TF/s for the bf16
conv bucket).  This probe measures the full chain the model actually
runs — GN(f32 stats) + SiLU + [quantize] + 3x3 conv + dequant/bias +
time-add — at the 256^2 CFG-batch-48 shapes, to see how much of the 2x
survives the VPU prologue (the bf16 chain is already prologue-bound on
some shapes, NEXT.md session 7).

Variants per shape:
  bf16        GN+SiLU -> bf16 emitter conv            (current default)
  int8_dyn    GN+SiLU -> per-tensor dynamic s8 quant -> s8 conv ->
              *(sa*ws_c) dequant (per-out-channel weight scales)
  int8_static same, but a fixed activation scale (isolates the amax
              reduce cost; not a shippable quality choice by itself)

  python tools/probe_int8_chain.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_op import TRACE_DIR, device_ms_by_case
from ldm_tf2_tpu.ops.group_norm import _mxu_stats_group_norm

# 256^2 b24 CFG -> batch 48 U-Net evals; the three FLOPs-heaviest conv
# shape classes (decoder concat-convs and the 16^2 trunk).
SHAPES = [
    (48, 32, 32, 640, 320),
    (48, 16, 16, 1280, 1280),
    (48, 32, 32, 320, 320),
]


def _quant_w(wk):
    ws = jnp.max(jnp.abs(wk), axis=(0, 1, 2)) / 127.0  # per-out-channel
    w8 = jnp.clip(jnp.round(wk / ws), -127, 127).astype(jnp.int8)
    return w8, ws


def make_cases(b, h, w, cin, cout, rng):
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
    gamma = jnp.asarray(rng.randn(cin), jnp.float32)
    beta = jnp.asarray(rng.randn(cin), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    ta = jnp.asarray(rng.randn(b, cout), jnp.bfloat16)
    w8, ws = _quant_w(wk)
    wbf = wk.astype(jnp.bfloat16)

    def s8conv(y8):
        return jax.lax.conv_general_dilated(
            y8, w8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def chain_bf16(x, ta):
        y = _mxu_stats_group_norm(x, gamma, beta, 32, 1e-5, True)
        out = jax.lax.conv_general_dilated(
            y, wbf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(y.dtype)
        return out + ta[:, None, None, :].astype(out.dtype)

    def chain_int8_dyn(x, ta):
        y = _mxu_stats_group_norm(x, gamma, beta, 32, 1e-5, True)
        yf = y.astype(jnp.float32)
        sa = jnp.maximum(jnp.max(jnp.abs(yf)), 1e-8) / 127.0
        y8 = jnp.clip(jnp.round(yf / sa), -127, 127).astype(jnp.int8)
        acc = s8conv(y8)
        out = acc.astype(jnp.float32) * (sa * ws) + bias
        return (out + ta[:, None, None, :].astype(out.dtype)).astype(x.dtype)

    def chain_int8_static(x, ta):
        y = _mxu_stats_group_norm(x, gamma, beta, 32, 1e-5, True)
        sa = jnp.float32(4.0 / 127.0)
        y8 = jnp.clip(
            jnp.round(y.astype(jnp.float32) / sa), -127, 127
        ).astype(jnp.int8)
        acc = s8conv(y8)
        out = acc.astype(jnp.float32) * (sa * ws) + bias
        return (out + ta[:, None, None, :].astype(out.dtype)).astype(x.dtype)

    # 2-stage: materialize the quantized activation (separate jits; device
    # times summed by the caller).  Stage 1 = GN+SiLU+per-example quant
    # (int8 write = half the bf16 HBM bytes); stage 2 = bare s8 conv (the
    # 261 TOP/s regime from probe_int8.py) + dequant/bias/ta epilogue.
    def gn_quant_stage(x):
        y = _mxu_stats_group_norm(x, gamma, beta, 32, 1e-5, True)
        yf = y.astype(jnp.float32)
        amax = jnp.max(jnp.abs(yf), axis=(1, 2, 3))  # per example
        sa = jnp.maximum(amax, 1e-8) / 127.0
        y8 = jnp.clip(
            jnp.round(yf / sa[:, None, None, None]), -127, 127
        ).astype(jnp.int8)
        return y8, sa

    def s8conv_stage(y8, sa, ta):
        acc = s8conv(y8)
        out = acc.astype(jnp.float32) * (sa[:, None, None, None] * ws) + bias
        return (out + ta[:, None, None, :].astype(out.dtype)).astype(
            jnp.bfloat16
        )

    y8_c, sa_c = jax.jit(gn_quant_stage)(x)

    return [
        ("bf16", chain_bf16, (x, ta)),
        ("int8_dyn", chain_int8_dyn, (x, ta)),
        ("int8_static", chain_int8_static, (x, ta)),
        ("gn_quant_stage", gn_quant_stage, (x,)),
        ("s8conv_stage", s8conv_stage, (y8_c, sa_c, ta)),
    ]


def main():
    rng = np.random.RandomState(0)
    n_iters = 8
    rows = []
    for b, h, w, cin, cout in SHAPES:
        flops = 2 * b * h * w * cin * cout * 9
        cases = make_cases(b, h, w, cin, cout, rng)
        jitted = []
        for name, fn, args in cases:
            tag = f"{name}_{h}x{w}_{cin}_{cout}"
            g = jax.jit(fn)
            jax.block_until_ready(g(*args))
            jitted.append((tag, fn.__name__, g, args, flops))
        # one trace per shape keeps module-name keys unambiguous
        with jax.profiler.trace(TRACE_DIR):
            for tag, fname, g, args, _ in jitted:
                outs = [g(*args) for _ in range(n_iters)]
                for o in outs:
                    leaf = o[0] if isinstance(o, tuple) else o
                    float(jnp.sum(leaf[:1, :1, :1].astype(jnp.float32)))
        per = device_ms_by_case(TRACE_DIR, n_iters)
        for tag, fname, g, args, fl in jitted:
            key = f"jit_{fname}"
            if key not in per:
                rows.append((tag, None, None))
                continue
            ms, n = per[key]
            rows.append((tag, ms, fl / (ms * 1e-3) / 1e12))

    print(f"{'case':28} {'ms/call':>9} {'T(FL)OP/s':>10}")
    for tag, ms, tfs in rows:
        if ms is None:
            print(f"{tag:28} -- no trace slice")
        else:
            print(f"{tag:28} {ms:9.3f} {tfs:10.1f}")


if __name__ == "__main__":
    main()
