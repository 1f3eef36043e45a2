"""Microbenchmark the SpatialTransformer FFN chain (LN -> GEGLU -> Dense
-> +residual) at U-Net 256^2 shapes, comparing XLA restructurings.

Motivation: the round-2 U-Net eval profile (tools/profile_pipeline.py unet)
shows the FFN output dense fusions (`add_add_fusion.*`) at ~29% MXU
efficiency and the whole FFN at ~12 ms of a 54 ms eval (CFG batch 32).
The fused op reads the [B,T,8d] GEGLU pre-activation from HBM, applies
gelu, matmuls to [B,T,d] and writes a transposed {1,2,0} layout.

Variants:
  v0  current FeedForward: Dense(8d) -> split -> x*gelu -> Dense(d)
  v1  two-dot GEGLU: kernel pre-sliced to Wa/Wb [d,4d]; halves the HBM
      intermediate and kills the minor-dim split
  v2  v1 with tokens flattened to 2D [B*T, d] around the chain
  v3  fused Pallas kernel (ops/fused_ffn.py) when present

  python tools/bench_ffn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp


def bench_scalar(fn, args):
    """Tunnel-proof timing (see tools/bench_flash.py `total`): compile a
    scalar-returning wrapper, enqueue dispatch batches with no intervening
    eager ops, sync once via the last scalar, and difference two batch
    sizes so the constant RTT cancels."""
    # nonlinear reduction: sum(out^2) — a plain sum of a final dot can be
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

    run_batch(5)  # compile/warm-up
    run_batch(5)  # absorbs first-use dispatch burst
    deltas = []
    for _ in range(5):
        t10, t40 = timed(10), timed(40)
        deltas.append((t40 - t10) / 30 * 1e3)
    deltas.sort()
    return deltas[len(deltas) // 2]


def make_params(key, d, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    s = d ** -0.5
    return {
        "ln_scale": jnp.ones((d,), jnp.float32),
        "ln_bias": jnp.zeros((d,), jnp.float32),
        "w1": (jax.random.normal(k1, (d, 8 * d)) * s).astype(dtype),
        "b1": jnp.zeros((8 * d,), dtype),
        "w2": (jax.random.normal(k2, (4 * d, d)) * s).astype(dtype),
        "b2": jnp.zeros((d,), dtype),
    }


def layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


def v0(p, x):
    y = layer_norm(x, p["ln_scale"], p["ln_bias"])
    h = jnp.dot(y, p["w1"]) + p["b1"]
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(h, p["w2"]) + p["b2"] + x


def v1(p, x):
    d = x.shape[-1]
    y = layer_norm(x, p["ln_scale"], p["ln_bias"])
    wa, wb = p["w1"][:, : 4 * d], p["w1"][:, 4 * d :]
    ba, bb = p["b1"][: 4 * d], p["b1"][4 * d :]
    a = jnp.dot(y, wa) + ba
    g = jnp.dot(y, wb) + bb
    h = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(h, p["w2"]) + p["b2"] + x


def v2(p, x):
    b, t, d = x.shape
    x2 = x.reshape(b * t, d)
    y = layer_norm(x2, p["ln_scale"], p["ln_bias"])
    wa, wb = p["w1"][:, : 4 * d], p["w1"][:, 4 * d :]
    ba, bb = p["b1"][: 4 * d], p["b1"][4 * d :]
    a = jnp.dot(y, wa) + ba
    g = jnp.dot(y, wb) + bb
    h = a * jax.nn.gelu(g, approximate=False)
    return (jnp.dot(h, p["w2"]) + p["b2"] + x2).reshape(b, t, d)


def v0_tanh(p, x):
    y = layer_norm(x, p["ln_scale"], p["ln_bias"])
    h = jnp.dot(y, p["w1"]) + p["b1"]
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(g, approximate=True)
    return jnp.dot(h, p["w2"]) + p["b2"] + x


def main():
    dtype = jnp.bfloat16
    cases = [
        ("L0 b32 t1024 d320", 32, 1024, 320),
        ("L1 b32 t256 d640", 32, 256, 640),
        ("L2 b32 t64 d1280", 32, 64, 1280),
    ]
    variants = [("v0 baseline", v0), ("v1 two-dot", v1),
                ("v2 2d two-dot", v2), ("v0 tanh-gelu", v0_tanh)]
    try:
        from ldm_tf2_tpu.ops.fused_ffn import fused_ffn

        def v3(p, x):
            h4 = p["w2"].shape[0]
            return fused_ffn(
                x, p["ln_scale"], p["ln_bias"], p["w1"][:, :h4],
                p["b1"][:h4], p["w1"][:, h4:], p["b1"][h4:],
                p["w2"], p["b2"],
            )

        variants.append(("v3 pallas", v3))
    except ImportError:
        pass

    key = jax.random.PRNGKey(0)
    for name, b, t, d in cases:
        x = jax.random.normal(key, (b, t, d)).astype(dtype)
        p = make_params(key, d, dtype)
        flops = 2 * b * t * 12 * d * d
        print(f"== {name}  ({flops/1e9:.1f} GF)")
        ref = None
        for vname, fn in variants:
            f = jax.jit(fn)
            out = f(p, x)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            ms = bench_scalar(fn, (p, x))
            print(f"  {vname:16s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} GF/ms"
                  f"  ({flops/ms/1e9/197:4.0%} peak)  maxerr {err:.2e}")


if __name__ == "__main__":
    main()
