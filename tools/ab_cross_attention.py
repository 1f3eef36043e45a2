"""XLA-vs-single-block-kernel A/B for short-kv attention
(ops/cross_attention.py), at the U-Net's exact dispatch shapes.

Unlike tools/ab_attn_dispatch.py (which timed the generic flash kernel and
recorded the negative result that motivated this specialized kernel), the
XLA arm here is timed both bare and *sandwiched between two matmuls* —
the isolated einsum chain measured 0.108 ms at the L0 cross shape while
the same math inside the full U-Net program costs ~0.46 ms (transposed
f32 logits layout + reduce-window QK emission chosen only when producers/
consumers fuse around it), so a bare-op A/B understates the kernel's
in-program win.  The definitive number is still the bench.py pipeline A/B
(LDM_BENCH_PACKED_CROSS=0/1).

  python tools/ab_cross_attention.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from profile_op import device_ms_by_case

TRACE_DIR = "/tmp/ldm_cross_ab"


def main():
    from ldm_tf2_tpu.ops.attention import _xla_attention
    from ldm_tf2_tpu.ops.cross_attention import cross_attention_flat
    from ldm_tf2_tpu.ops.flash_attention import lane_pad

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    B, H, S = 48, 8, 40  # CFG batch at the batch-24 default
    Sp = lane_pad(S)
    scale = S ** -0.5
    cases = [  # (name, q_len, kv_len, d_model of the surrounding projs)
        ("cross_L0", 1024, 77, 320),
        ("cross_L1", 256, 77, 640),
        ("cross_L2", 64, 77, 1280),
    ]
    jitted = []
    for name, ql, kl, d in cases:
        ks = jax.random.split(key, 6)
        q = jax.random.normal(ks[0], (B, ql, H, S)).astype(dtype)
        k = jax.random.normal(ks[1], (B, kl, H, S)).astype(dtype)
        v = jax.random.normal(ks[2], (B, kl, H, S)).astype(dtype)
        qf = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Sp - S))).reshape(
            B, ql, H * Sp
        )
        kf = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, Sp - S))).reshape(
            B, kl, H * Sp
        )
        vf = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, Sp - S))).reshape(
            B, kl, H * Sp
        )
        # surrounding projections, to reproduce the in-program fusion
        # context: x -> q proj -> attention -> out proj
        x = jax.random.normal(ks[3], (B, ql, d)).astype(dtype)
        wq = (jax.random.normal(ks[4], (d, H * S)) * d ** -0.5).astype(dtype)
        wo = (jax.random.normal(ks[5], (H * S, d)) * d ** -0.5).astype(dtype)
        wqf = jnp.pad(
            wq.reshape(d, H, S), ((0, 0), (0, 0), (0, Sp - S))
        ).reshape(d, H * Sp)
        wof = jnp.pad(
            wo.reshape(H, S, d), ((0, 0), (0, Sp - S), (0, 0))
        ).reshape(H * Sp, d)

        def xla_bare(q, k, v):
            return _xla_attention(q, k, v, scale)

        def kern_bare(qf, kf, vf):
            return cross_attention_flat(qf, kf, vf, scale, H)

        def xla_prog(x, k, v):
            qq = jnp.dot(x, wq).reshape(B, ql, H, S)
            o = _xla_attention(qq, k, v, scale)
            return jnp.dot(o.reshape(B, ql, H * S), wo)

        def kern_prog(x, kf, vf):
            qq = jnp.dot(x, wqf)
            o = cross_attention_flat(qq, kf, vf, scale, H)
            return jnp.dot(o, wof)

        for impl, fn0, args in (
            ("xla_bare", xla_bare, (q, k, v)),
            ("kern_bare", kern_bare, (qf, kf, vf)),
            ("xla_prog", xla_prog, (x, k, v)),
            ("kern_prog", kern_prog, (x, kf, vf)),
        ):
            fn0.__name__ = f"ca_{name}_{impl}"
            f = jax.jit(fn0)
            try:
                f(*args).block_until_ready()
            except Exception as e:
                print(f"{fn0.__name__}: FAILED {type(e).__name__}: {e}"[:200],
                      flush=True)
                continue
            jitted.append((fn0.__name__, f, args))
            print(f"compiled {fn0.__name__}", flush=True)

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
