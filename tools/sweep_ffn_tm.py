"""On-device TM sweep for the fused FFN kernel (ops/fused_ffn.py).

The shipped picker chose TM=256 at d=320 from an early sweep that never
tried larger tiles; the roofline trace shows that shape class at
108 TF/s vs 167 for d=640.  Times each candidate via XLA-Module trace
slices (tools/profile_op.py — the only tunnel-proof timer).

  python tools/sweep_ffn_tm.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from profile_op import device_ms_by_case

TRACE_DIR = "/tmp/ldm_ffn_sweep"


def main():
    from ldm_tf2_tpu.ops import fused_ffn as ff

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    cases = [
        ("L0", 32, 1024, 320, (128, 256, 512, 1024, 2048)),
        ("L1", 32, 256, 640, (256, 512, 1024, 2048)),
    ]
    jitted = []
    for name, b, t, d, tms in cases:
        x = jax.random.normal(key, (b, t, d)).astype(dtype)
        p = {
            "ln_scale": jnp.ones((d,), jnp.float32),
            "ln_bias": jnp.zeros((d,), jnp.float32),
            "w1v": (jax.random.normal(key, (d, 4 * d)) * d ** -0.5).astype(dtype),
            "b1v": jnp.zeros((4 * d,), dtype),
            "w1g": (jax.random.normal(key, (d, 4 * d)) * d ** -0.5).astype(dtype),
            "b1g": jnp.zeros((4 * d,), dtype),
            "w2": (jax.random.normal(key, (4 * d, d)) * d ** -0.5).astype(dtype),
            "b2": jnp.zeros((d,), dtype),
        }
        flops = 2 * b * t * 12 * d * d
        for tm in tms:
            if (b * t) % tm:
                continue

            def run(p, x, _tm=tm, _d=d):
                return ff._pallas_ffn(
                    x, p["ln_scale"], p["ln_bias"], p["w1v"], p["b1v"],
                    p["w1g"], p["b1g"], p["w2"], p["b2"], 1e-5,
                    tiles=(_tm, 4 * _d),
                )

            run.__name__ = f"ffn_{name}_tm{tm}"
            fn = jax.jit(run)
            try:
                fn(p, x).block_until_ready()
            except Exception as e:
                print(f"{run.__name__}: FAILED {type(e).__name__}", flush=True)
                continue
            jitted.append((run.__name__, fn, (p, x), flops))
            print(f"compiled {run.__name__}", flush=True)

    n_iters = 8
    with jax.profiler.trace(TRACE_DIR):
        for name, fn, args, _ in jitted:
            outs = [fn(*args) for _ in range(n_iters)]
            for o in outs:
                float(jnp.sum(o.astype(jnp.float32)[:1, :1, :1]))

    per = device_ms_by_case(TRACE_DIR, n_iters)
    for name, fn, args, flops in jitted:
        key_ = f"jit_{name}"
        if key_ not in per:
            print(f"{name}: no slice")
            continue
        ms, n = per[key_]
        print(f"{name:18} {ms:7.3f} ms  {flops/(ms*1e-3)/1e12:6.1f} TF/s"
              f"  ({flops/(ms*1e-3)/1e12/1.97:4.1f}% of 197)  n={n}")


if __name__ == "__main__":
    main()
