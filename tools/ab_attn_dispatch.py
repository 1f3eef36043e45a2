"""Flash-vs-XLA A/B at the attention shapes the dispatch gate excludes.

The 256^2 eval trace shows 11 of 16 self-attentions (T=256/64) and all
16 cross-attentions (kv=77) running the unfused XLA path with f32
logits materialized to HBM, because ops/attention.py gates flash on
q_len>=1024 AND kv_len>=1024.  The kernel itself handles short/unequal
lengths via padding+masking, so the gate is the only thing in the way.
Times both paths per shape via XLA-Module trace slices (the
tunnel-proof timer, tools/profile_op.py).

  python tools/ab_attn_dispatch.py

MEASURED (v5e, 2026-08-18, B=32 H=8 S=40, device-trace ms/call):

  shape              XLA     flash   verdict
  self  T=1024     3.176    1.540    flash 2.1x  (already dispatched)
  self  T=256      0.047    0.364    XLA 7.7x    (keep gate)
  self  T=64       0.013    0.157    XLA 12x     (keep gate)
  cross 1024/77    0.108    0.937    XLA 8.7x    (keep gate)
  cross  256/77    0.021    0.211    XLA 10x     (keep gate)
  cross   64/77    0.022    0.159    XLA 7.2x    (keep gate)

NEGATIVE RESULT — the >=1024 gate is correct as-is.  At short seq the
flash kernel's grid launch + lane padding (kv=77 pads to 128; head 40
pads to 128 lanes) dwarfs the matmul, while XLA's unfused path is tiny
because the f32 logits fit comfortable fusion sizes.  The "~8-10 ms of
unfused attention" read off the roofline trace was misattributed bucket
time (projection einsums + residual adds tagged into the same region),
not softmax materialization.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from profile_op import device_ms_by_case

TRACE_DIR = "/tmp/ldm_attn_ab"


def main():
    from ldm_tf2_tpu.ops.attention import _xla_attention
    from ldm_tf2_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    B, H, S = 32, 8, 40
    cases = [  # (name, q_len, kv_len)
        ("self_L0", 1024, 1024),
        ("self_L1", 256, 256),
        ("self_L2", 64, 64),
        ("cross_L0", 1024, 77),
        ("cross_L1", 256, 77),
        ("cross_L2", 64, 77),
    ]
    jitted = []
    for name, ql, kl in cases:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (B, ql, H, S)).astype(dtype)
        k = jax.random.normal(ks[1], (B, kl, H, S)).astype(dtype)
        v = jax.random.normal(ks[2], (B, kl, H, S)).astype(dtype)
        scale = S ** -0.5
        for impl, fn0 in (("xla", _xla_attention), ("flash", flash_attention)):

            def run(q, k, v, _fn=fn0, _s=scale):
                return _fn(q, k, v, _s)

            run.__name__ = f"attn_{name}_{impl}"
            f = jax.jit(run)
            try:
                f(q, k, v).block_until_ready()
            except Exception as e:
                print(f"{run.__name__}: FAILED {type(e).__name__}: {e}"[:200],
                      flush=True)
                continue
            jitted.append((run.__name__, f, (q, k, v)))
            print(f"compiled {run.__name__}", flush=True)

    n_iters = 8
    with jax.profiler.trace(TRACE_DIR):
        for name, f, args in jitted:
            outs = [f(*args) for _ in range(n_iters)]
            for o in outs:
                float(jnp.sum(o.astype(jnp.float32)[:1, :1, :1]))

    per = device_ms_by_case(TRACE_DIR, n_iters)
    for name, f, args in jitted:
        k_ = f"jit_{name}"
        if k_ not in per:
            print(f"{name}: no slice")
            continue
        ms, n = per[k_]
        print(f"{name:22} {ms:7.3f} ms  n={n}")


if __name__ == "__main__":
    main()
