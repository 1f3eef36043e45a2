"""Same-process A/B of GroupNorm impls at the U-Net-eval level.

Times one CFG U-Net eval (jit module slices from a device trace — the
only timer that survives the tunnel, tools/profile_op.py) with each
GroupNorm dispatch variant.  Motivation: roofline traces show the GN
stat reduces fused into producer convs drag them from ~187 to ~120 TF/s
(ops/group_norm.py `_mxu_stats_group_norm` docstring).

  python tools/ab_gn_barrier.py [batch] [latent] [impl ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/ldm_gn_ab_trace"


def main():
    from ldm_tf2_tpu.models import UNet
    from ldm_tf2_tpu.ops.group_norm import set_groupnorm_impl

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_op import device_ms_by_case

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    latent = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    impls = sys.argv[3:] or ["mxu", "barrier"]

    dtype = jnp.bfloat16
    unet = UNet(dtype=dtype)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2 * batch, latent, latent, 4), dtype)
    t = jnp.zeros((2 * batch,), jnp.float32)
    ctx = jnp.zeros((2 * batch, 77, 1280), dtype)
    params = jax.jit(unet.init)(key, x, t, ctx)["params"]
    params = jax.tree.map(lambda a: a.astype(dtype), params)

    jitted = {}
    for impl in impls:
        set_groupnorm_impl(impl)

        # A fresh, distinctly named callable per impl: the global is read
        # at trace time (forces a retrace) and the name keys the trace's
        # XLA-Module slices ("jit_eval_<impl>").
        def eval_fn(p, x, t, c):
            return unet.apply({"params": p}, x, t, c)

        eval_fn.__name__ = f"eval_{impl}"
        fn = jax.jit(eval_fn)
        print(f"[ab] compiling impl={impl} ...", flush=True)
        fn(params, x, t, ctx).block_until_ready()
        jitted[impl] = fn

    n_iters = 6
    with jax.profiler.trace(TRACE_DIR):
        for impl, fn in jitted.items():
            outs = [fn(params, x, t, ctx) for _ in range(n_iters)]
            for o in outs:
                float(jnp.sum(o.astype(jnp.float32)[:1, :1, :1, :1]))

    per = device_ms_by_case(TRACE_DIR, n_iters)
    print(f"{'module':24} {'ms/eval':>9}")
    for k, (ms, n) in sorted(per.items()):
        print(f"{k:24} {ms:9.2f}  (n={n})")


if __name__ == "__main__":
    main()
