"""Microbenchmark the flash-attention kernel vs the XLA path on-device.

  python tools/bench_flash.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_tf2_tpu.ops.attention import _xla_attention
from ldm_tf2_tpu.ops.flash_attention import flash_attention


def bench(fn, args, iters=10):
    """Dispatch iters calls chained into one reduction, sync once: immune
    to tunnel RTT (per-call sync) and to early-return block_until_ready.
    Runs one full DISCARDED batch first — the first timed batch after
    compile was measured ~17x slower on the axon tunnel (lazy program
    upload/warm-up), poisoning single-warmup harnesses."""
    def run_batch():
        acc = 0.0
        for _ in range(iters):
            acc = acc + jnp.sum(fn(*args))
        float(acc)

    float(jnp.sum(fn(*args)))  # compile
    run_batch()  # discard: absorbs first-use warm-up
    t0 = time.perf_counter()
    run_batch()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cases = [
        # (b, t, kv, h, s)  — U-Net levels at 256^2 and 512^2, AE middle
        (32, 1024, 1024, 8, 40),
        (32, 256, 256, 8, 80),
        (8, 4096, 4096, 8, 40),
        (8, 4096, 4096, 1, 512),
    ]
    for (b, t, kv, h, s) in cases:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, t, h, s), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, kv, h, s), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, kv, h, s), jnp.bfloat16)
        scale = s**-0.5
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
        x = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))
        tf_ms = bench(f, (q, k, v))
        tx_ms = bench(x, (q, k, v))
        flops = 4 * b * h * t * kv * s
        print(
            f"b{b} t{t} kv{kv} h{h} s{s}: flash {tf_ms:7.3f} ms "
            f"({flops/tf_ms/1e9:6.1f} TF/s)  xla {tx_ms:7.3f} ms "
            f"({flops/tx_ms/1e9:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()
