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


def main(mode="fwd"):
    cases = [
        # (b, t, kv, h, s)  — U-Net levels at 256^2 and 512^2, AE middle
        (32, 1024, 1024, 8, 40),
        (32, 256, 256, 8, 80),
        (8, 4096, 4096, 8, 40),
        (8, 4096, 4096, 1, 512),
        # cross-attention (kv = 77 text tokens) and short self-attn levels
        (32, 1024, 77, 8, 40),
        (32, 256, 77, 8, 80),
        (32, 64, 77, 8, 160),
        (32, 64, 64, 8, 160),
    ]
    from ldm_tf2_tpu.ops import flash_attention as fa

    for (b, t, kv, h, s) in cases:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, t, h, s), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, kv, h, s), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, kv, h, s), jnp.bfloat16)
        scale = s**-0.5
        if mode == "fwd":
            f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
            x = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))
            flops = 4 * b * h * t * kv * s
        else:
            # grad wrt q/k/v: fwd + 5-matmul bwd.  Trace EAGERLY (lower())
            # under each backward-impl flag — jit defers tracing to first
            # call, which would otherwise see the restored global.
            def make(impl):
                fa.set_flash_backward(impl)
                grad_fn = jax.grad(
                    lambda q, k, v: jnp.sum(
                        flash_attention(q, k, v, scale).astype(jnp.float32)
                        ** 2
                    ),
                    argnums=(0, 1, 2),
                )

                def summed(q, k, v):
                    gs = grad_fn(q, k, v)
                    return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

                out = jax.jit(summed).lower(q, k, v).compile()
                fa.set_flash_backward("pallas")
                return out

            f = make("pallas")
            x = make("xla")
            flops = (4 + 10) * b * h * t * kv * s

        if mode == "fwd":
            def total(fn, args):
                # same dispatch-batch differencing as the bwd path: the
                # chained-eager `bench` helper pays one tunnel RTT per
                # iteration and was measuring ~5 ms for ~1 ms kernels.
                # sum(out^2): a linear reduction of a final dot can be
                # algebraically collapsed by XLA.
                g = jax.jit(
                    lambda *a: jnp.sum(
                        jnp.square(fn(*a).astype(jnp.float32))
                    )
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
                for _ in range(5):
                    t10, t40 = timed(10), timed(40)
                    deltas.append((t40 - t10) / 30 * 1e3)
                deltas.sort()
                return deltas[len(deltas) // 2]
        else:
            def total(fn, args):
                # Tunnel-proof timing: no eager ops between compiled calls
                # (each is a synchronous round-trip here) and no
                # block_until_ready (early-returns on this platform).  The
                # device executes dispatches in order, so one host
                # transfer of the LAST scalar syncs the whole batch; the
                # constant RTT cancels by differencing two batch sizes.
                def run_batch(iters):
                    outs = [fn(*args) for _ in range(iters)]
                    float(outs[-1])

                def timed(iters):
                    t0 = time.perf_counter()
                    run_batch(iters)
                    return time.perf_counter() - t0

                run_batch(5)   # compile/warm-up
                run_batch(5)   # absorbs first-use dispatch burst
                t10, t30 = timed(10), timed(30)
                return (t30 - t10) / 20 * 1e3

        tf_ms = total(f, (q, k, v))
        tx_ms = total(x, (q, k, v))
        print(
            f"b{b} t{t} kv{kv} h{h} s{s}: flash-{mode} {tf_ms:7.3f} ms "
            f"({flops/tf_ms/1e9:6.1f} TF/s)  xla-bwd/ref {tx_ms:7.3f} ms "
            f"({flops/tx_ms/1e9:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fwd")
