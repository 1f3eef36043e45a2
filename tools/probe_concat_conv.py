"""Isolate the XLA cliff seen on the b16 32x32 GN(640)->SiLU->conv640->320
chain (tools/bench_fused_conv.py measured 16.6 ms vs 0.19 ms for the
320->320 sibling).  Times variants to find the trigger, using the
scan-chain timer (one scalar fetch per measurement; tunnel RTT subtracted).
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tf2_tpu.ops import fused_conv as fc
from tools.bench_fused_conv import timed_call

VARIANTS = [
    # (b, h, w, cin, cout, has_t, mode)  mode: gn|conv|dots|gndots
    (16, 32, 32, 640, 320, True, "gn"),     # the cliff
    (16, 32, 32, 640, 320, True, "dots"),   # conv as 9 shifted dots (XLA)
    (16, 32, 32, 640, 320, True, "gndots"),  # GN+SiLU + 9-dot conv (XLA)
    (32, 32, 32, 640, 320, True, "gn"),     # real CFG batch at headline
    (32, 32, 32, 640, 320, True, "gndots"),
    (16, 32, 32, 640, 320, True, "conv"),   # conv only, no GN
    (16, 32, 32, 640, 640, True, "gn"),     # same cin, cout=640
    (16, 32, 32, 320, 320, True, "gn"),     # control
]


def conv_as_dots(y, wk, bias):
    """3x3 SAME conv expressed as 9 shifted [B,H,W,Cin]x[Cin,Cout] dots —
    bypasses XLA's convolution emitter entirely."""
    b, h, w, cin = y.shape
    cout = wk.shape[-1]
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, h, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(yp, (0, dy, dx, 0), (b, h, w, cin))
            out = out + jax.lax.dot_general(
                tap, wk[dy, dx].astype(tap.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return out.astype(y.dtype) + bias.astype(y.dtype)


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()}")
    for b, h, w, cin, cout, has_t, mode in VARIANTS:
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        gamma = jnp.asarray(rng.randn(cin), jnp.float32)
        beta = jnp.asarray(rng.randn(cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)
        ta = jnp.asarray(rng.randn(b, cout), jnp.bfloat16) if has_t else None

        if mode == "gn":
            def fn(x, gamma=gamma, beta=beta, wk=wk, bias=bias, ta=ta):
                return fc._xla_ref(x, gamma, beta, wk, bias, ta, None, 32, 1e-5)
        elif mode == "conv":
            def fn(x, wk=wk, bias=bias, ta=ta):
                out = jax.lax.conv_general_dilated(
                    x, wk.astype(x.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias.astype(x.dtype)
                if ta is not None:
                    out = out + ta[:, None, None, :]
                return out
        elif mode == "dots":
            def fn(x, wk=wk, bias=bias, ta=ta):
                out = conv_as_dots(x, wk, bias)
                if ta is not None:
                    out = out + ta[:, None, None, :]
                return out
        else:  # gndots
            def fn(x, gamma=gamma, beta=beta, wk=wk, bias=bias, ta=ta):
                from ldm_tf2_tpu.ops.group_norm import _mxu_stats_group_norm

                y = _mxu_stats_group_norm(x, gamma, beta, 32, 1e-5, True)
                out = conv_as_dots(y, wk, bias)
                if ta is not None:
                    out = out + ta[:, None, None, :]
                return out

        t = timed_call(jax.jit(fn), (x,))
        flops = 2 * 9 * b * h * w * cin * cout
        print(
            f"b{b} {h}x{w} {cin}->{cout} t={int(has_t)} {mode}: "
            f"{t:8.3f} ms ({flops/t/1e9:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()
