"""On-device block-size sweep for the flash-attention FORWARD on the flat
packed layout, at the shapes the samplers actually dispatch.

The shipped `_pick_blocks` (VMEM-budget rule: (1024, 1024) at sp=128) came
from a round-1 sweep on the [B,H,T,Sp] layout at CFG batch 32; the default
batch is now 24 (CFG 48) and the models feed the kernel the FLAT layout
whose q/o DMAs are strided — re-sweep both hot shapes with the profiler
timer (tools/profile_op.py, the tunnel-proof one).

  python tools/sweep_flash_fwd.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from profile_op import device_ms_by_case

TRACE_DIR = "/tmp/ldm_flash_fwd_sweep"


def main():
    from ldm_tf2_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    H, S = 8, 40
    Sp = fa.lane_pad(S)
    cases = [
        # (name, B, T): 256^2 L0 at CFG b48; 512^2 L0 at CFG b32
        ("b48_t1024", 48, 1024),
        ("b32_t4096", 32, 4096),
    ]
    blocks = [
        (1024, 1024), (1024, 512), (512, 1024), (512, 512),
        (256, 1024), (1024, 256), (2048, 1024), (1024, 2048),
    ]
    jitted = []
    for name, b, t in cases:
        ks = jax.random.split(key, 3)
        qf = jax.random.normal(ks[0], (b, t, H * Sp)).astype(dtype)
        kf = jax.random.normal(ks[1], (b, t, H * Sp)).astype(dtype)
        vf = jax.random.normal(ks[2], (b, t, H * Sp)).astype(dtype)
        scale = S ** -0.5
        for bq, bk in blocks:
            if bq > t or bk > t:
                continue

            def run(qf, kf, vf, _bq=bq, _bk=bk):
                return fa._forward_flat(
                    qf, kf, vf, scale, H, block_q=_bq, block_k=_bk
                )

            run.__name__ = f"ff_{name}_q{bq}_k{bk}"
            f = jax.jit(run)
            try:
                f(qf, kf, vf).block_until_ready()
            except Exception as e:
                print(f"{run.__name__}: FAILED {type(e).__name__}: {e}"[:160],
                      flush=True)
                continue
            jitted.append((run.__name__, f, (qf, kf, vf)))
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
        print(f"{name:26} {ms:7.3f} ms  n={n}")


if __name__ == "__main__":
    main()
