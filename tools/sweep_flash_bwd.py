"""On-device block-size sweep for the fused flash-attention BACKWARD.

The forward's sweep bought +9% headline throughput (NEXT.md r1); the
backward block sizes were analytic until now (VERDICT r1 next-item #6).
Times `_backward_packed` with explicit (block_q, block_k) over the model's
real shapes and prints a table; `_pick_blocks_bwd` is then updated from the
measured winners.

  python tools/sweep_flash_bwd.py

Timing is tunnel-proof (see tools/bench_flash.py): dispatch batches chained
on device, differenced between two batch sizes to cancel RTT.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_tf2_tpu.ops import flash_attention as fa


def timed_call(fn, args):
    def run_batch(iters):
        outs = [fn(*args) for _ in range(iters)]
        jax.tree.map(lambda x: None, outs)
        float(jnp.sum(outs[-1][0].astype(jnp.float32)))

    run_batch(3)   # compile + warm-up
    run_batch(5)   # absorb first-use dispatch burst

    def t(iters):
        t0 = time.perf_counter()
        run_batch(iters)
        return time.perf_counter() - t0

    return (t(30) - t(10)) / 20 * 1e3


def main():
    # (label, bh, q_len, kv_len, sp) — backward shapes the train step hits:
    # U-Net self-attn levels (packed heads: bh = batch*heads, sp = 128-lane
    # padded head dim) and the AE bottleneck attention.
    cases = [
        ("256^2 L0 b32 (h8 s40)", 256, 1024, 1024, 128),
        ("512^2 L0 b8  (h8 s40)", 64, 4096, 4096, 128),
        ("512^2 L1 b8  (h8 s80)", 64, 1024, 1024, 128),
        ("AE mid 256^2 b16 (1h s512)", 16, 1024, 1024, 512),
    ]
    candidates = [
        (256, 256), (256, 512), (512, 256), (512, 512),
        (512, 1024), (1024, 512), (1024, 1024), (2048, 512), (512, 2048),
    ]

    for label, bh, q_len, kv_len, sp in cases:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        qt = jax.random.normal(ks[0], (bh, q_len, sp), jnp.bfloat16)
        kt = jax.random.normal(ks[1], (bh, kv_len, sp), jnp.bfloat16)
        vt = jax.random.normal(ks[2], (bh, kv_len, sp), jnp.bfloat16)
        dot = jax.random.normal(ks[3], (bh, q_len, sp), jnp.bfloat16)
        scale = 0.125
        o, lse = fa._forward_packed(qt, kt, vt, scale, save_residuals=True)
        o, lse = jax.device_put(o), jax.device_put(lse)

        auto = fa._pick_blocks_bwd(sp, q_len)
        flops = 7 * 2 * bh * q_len * kv_len * sp
        print(f"\n== {label}: bh={bh} t={q_len} sp={sp} "
              f"(current pick {auto})")
        results = []
        for bq, bk in candidates:
            if bq > q_len or bk > kv_len:
                continue
            try:
                fn = jax.jit(
                    lambda q, k, v, o, l, g, _bq=bq, _bk=bk:
                    fa._backward_packed(q, k, v, o, l, g, scale,
                                        block_q=_bq, block_k=_bk)
                )
                ms = timed_call(fn, (qt, kt, vt, o, lse, dot))
                results.append((ms, bq, bk))
                mark = " <== current" if (bq, bk) == auto else ""
                print(f"  bq={bq:5d} bk={bk:5d}: {ms:8.3f} ms "
                      f"({flops/ms/1e9:6.1f} GF/ms-ish){mark}", flush=True)
            except Exception as e:
                print(f"  bq={bq:5d} bk={bk:5d}: FAILED "
                      f"({type(e).__name__}: {str(e)[:80]})", flush=True)
        if results:
            best = min(results)
            print(f"  BEST: bq={best[1]} bk={best[2]} {best[0]:.3f} ms")


if __name__ == "__main__":
    main()
