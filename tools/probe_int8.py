"""Probe: does int8 actually reach the v5e's 2x MXU mode through XLA?

v5e datasheet: 197 bf16 TFLOP/s vs 394 int8 TOP/s.  NEXT.md (round-2
session 7) concluded the conv bucket's remaining 2x lever is precision;
before building a quantized inference path, verify that
  (a) an s8 x s8 -> s32 jnp.dot hits ~2x the bf16 dot rate,
  (b) the dequant epilogue (s32 -> f32 scale multiply) doesn't eat the win,
  (c) the same holds for the U-Net's hot conv shape expressed as the
      9-shifted-dots formulation (ops/fused_conv.conv3x3_dots), and
  (d) whether the XLA conv emitter accepts s8 convolutions at all.

Timer: device profiler per-module slices (tools/profile_op.py), the only
timer that survives the axon tunnel.

  python tools/probe_int8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_op import TRACE_DIR, device_ms_by_case

N = 4096


def peak_bf16(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def peak_int8(a8, b8):
    return jnp.dot(a8, b8, preferred_element_type=jnp.int32)


def int8_dequant(a8, b8, sa, sb):
    acc = jnp.dot(a8, b8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sa * sb)


def int8_dyn_quant(a, b8, sb):
    """Realistic serving path: bf16 activation -> dynamic per-tensor s8
    quantize -> s8 dot vs pre-quantized weight -> dequant."""
    amax = jnp.max(jnp.abs(a.astype(jnp.float32)))
    sa = amax / 127.0
    a8 = jnp.clip(
        jnp.round(a.astype(jnp.float32) / sa), -127, 127
    ).astype(jnp.int8)
    acc = jnp.dot(a8, b8, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sa * sb)


def conv_dots(x, wk, dtype, acc_t):
    """3x3 conv as 9 shifted dots (the fused_conv 'dots' formulation),
    parameterized by operand dtype so bf16 vs int8 compile identically."""
    b, h, w, cin = x.shape
    cout = wk.shape[-1]
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xs = jnp.roll(x, (-dy, -dx), axis=(1, 2))
            t = jnp.einsum(
                "bhwc,co->bhwo",
                xs,
                wk[dy + 1, dx + 1],
                preferred_element_type=acc_t,
            )
            acc = t if acc is None else acc + t
    return acc


def main():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(N, N), jnp.bfloat16)
    b = jnp.asarray(rng.randn(N, N), jnp.bfloat16)
    a8 = jnp.asarray(rng.randint(-127, 128, (N, N)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (N, N)), jnp.int8)
    sa = jnp.float32(0.01)
    sb = jnp.float32(0.02)

    # hot U-Net conv shape at CFG batch (256^2 L1): [32,32,32,640]->320
    cb, ch, cw, cin, cout = 32, 32, 32, 640, 320
    xc = jnp.asarray(rng.randn(cb, ch, cw, cin), jnp.bfloat16)
    xc8 = jnp.asarray(rng.randint(-127, 128, (cb, ch, cw, cin)), jnp.int8)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    wk8 = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)

    def conv_dots_bf16(x, w):
        return conv_dots(x, w, jnp.bfloat16, jnp.float32)

    def conv_dots_int8(x, w):
        return conv_dots(x, w, jnp.int8, jnp.int32)

    def conv_emitter_int8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    dot_flops = 2 * N**3
    conv_flops = 2 * cb * ch * cw * cin * cout * 9
    cases = [
        ("peak_bf16", peak_bf16, (a, b), dot_flops),
        ("peak_int8", peak_int8, (a8, b8), dot_flops),
        ("int8_dequant", int8_dequant, (a8, b8, sa, sb), dot_flops),
        ("int8_dyn_quant", int8_dyn_quant, (a, b8, sb), dot_flops),
        ("conv_dots_bf16", conv_dots_bf16, (xc, wk), conv_flops),
        ("conv_dots_int8", conv_dots_int8, (xc8, wk8), conv_flops),
        ("conv_emitter_int8", conv_emitter_int8, (xc8, wk8), conv_flops),
    ]

    n_iters = 8
    jitted = []
    for name, fn, args, flops in cases:
        g = jax.jit(fn)
        try:
            g(*args).block_until_ready()
        except Exception as e:  # noqa: BLE001 — emitter may reject s8
            print(f"{name:18} FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
            continue
        jitted.append((name, fn, g, args, flops))

    with jax.profiler.trace(TRACE_DIR):
        for name, fn, g, args, flops in jitted:
            outs = [g(*args) for _ in range(n_iters)]
            for o in outs:
                float(jnp.sum(o[:1, :1].astype(jnp.float32)))

    per = device_ms_by_case(TRACE_DIR, n_iters)
    print(f"{'case':18} {'ms/call':>9} {'T(FL)OP/s':>10} {'vs 197 bf16':>12}")
    for name, fn, g, args, flops in jitted:
        key = f"jit_{fn.__name__}"
        if key not in per:
            print(f"{name:18} -- no trace slice")
            continue
        ms, n = per[key]
        tfs = flops / (ms * 1e-3) / 1e12
        print(f"{name:18} {ms:9.3f} {tfs:10.1f} {tfs / 197:11.2f}x  (n={n})")


if __name__ == "__main__":
    main()
