"""Calibrate achievable MXU throughput for the U-Net's matmul shapes.

Pure bf16 matmuls at the FFN / projection / conv-as-GEMM shapes, timed
with the dispatch-batch differencing method (median of repeats).  Gives
the realistic per-shape ceiling that tools/bench_ffn.py efficiencies
should be judged against (the 197 TF/s paper peak is not reachable for
skinny-K/N shapes).

  python tools/bench_mxu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_scalar(fn, args, batch_lo=10, batch_hi=40, repeats=5):
    # nonlinear reduction: sum(out^2) — a plain sum(dot(...)) can be
    # algebraically collapsed by XLA into per-operand sums
    g = jax.jit(
        lambda *a: jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))
    )

    def run_batch(iters):
        outs = [g(*args) for _ in range(iters)]
        float(outs[-1])

    def timed(iters):
        t0 = time.perf_counter()
        run_batch(iters)
        return time.perf_counter() - t0

    run_batch(5)
    run_batch(5)
    deltas = []
    for _ in range(repeats):
        tl, th = timed(batch_lo), timed(batch_hi)
        deltas.append((th - tl) / (batch_hi - batch_lo) * 1e3)
    deltas.sort()
    return deltas[len(deltas) // 2]


def main():
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cases = [
        # (label, M, K, N)
        ("square 4k", 4096, 4096, 4096),
        ("square 8k", 8192, 8192, 8192),
        ("ffn1 L0", 32768, 320, 2560),
        ("ffn2 L0", 32768, 1280, 320),
        ("ffn1 L1", 8192, 640, 5120),
        ("ffn2 L1", 8192, 2560, 640),
        ("ffn2 L2", 2048, 5120, 1280),
        ("qkv  L0", 32768, 320, 320),
        ("qkv3 L0", 32768, 320, 960),
        ("conv L0 as gemm", 32768, 2880, 320),
        ("conv L1 as gemm", 8192, 5760, 640),
    ]
    for label, m, k, n in cases:
        a = jax.random.normal(key, (m, k)).astype(dtype)
        b = jax.random.normal(key, (k, n)).astype(dtype)
        ms = bench_scalar(lambda a, b: jnp.dot(a, b), (a, b))
        fl = 2 * m * k * n
        print(f"{label:18s} M{m:6d} K{k:5d} N{n:5d}: {ms:7.3f} ms "
              f"{fl/ms/1e9:7.1f} GF/ms ({fl/ms/1e9/197:4.0%} of 197TF/s)")


if __name__ == "__main__":
    main()
