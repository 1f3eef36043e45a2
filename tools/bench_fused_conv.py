"""A/B the fused GN+SiLU+conv3x3 Pallas kernel vs the XLA composition on
the real TPU, at the U-Net ResBlock shapes that dominate 256^2/512^2
sampling.  Uses the dispatch-batch differencing timer (tunnel-proof: no
eager ops between compiled calls — see NEXT.md "variance")."""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tf2_tpu.ops import fused_conv as fc

SHAPES = [
    # (b, h, w, cin, cout, has_t, has_add)  — CFG batch 16 at 256^2
    (16, 32, 32, 320, 320, True, False),   # L1 conv1
    (16, 32, 32, 320, 320, False, True),   # L1 conv2 (+residual)
    (16, 32, 32, 640, 320, True, False),   # L1 up concat conv1
    (16, 16, 16, 640, 640, False, True),   # L2 conv2
    (16, 16, 16, 960, 640, True, False),   # L2 up concat conv1
    (8, 64, 64, 320, 320, True, False),    # 512^2 L1 conv1 (CFG b8)
    (8, 32, 32, 640, 640, False, True),    # 512^2 L2 conv2
]


_RTT_MS = None


def _rtt_ms():
    """Median wall time of fetching one scalar from a trivial jitted fn —
    the per-call host<->device round-trip through the tunnel."""
    global _RTT_MS
    if _RTT_MS is None:
        g = jax.jit(lambda s: s + 1.0)
        s = jnp.float32(0.0)
        float(g(s))
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            s = g(s)
            float(s)
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        _RTT_MS = ts[len(ts) // 2]
        print(f"tunnel RTT: {_RTT_MS:.3f} ms")
    return _RTT_MS


def timed_call(fn, args, n=32):
    """Time one call of `fn(*args)` by chaining n serial evaluations inside
    ONE jitted scan (a scalar from each output perturbs the next input, so
    XLA can neither elide nor overlap them), fetching a single scalar, and
    subtracting the separately measured tunnel RTT.  block_until_ready
    early-returns through the tunnel (NEXT.md) and per-call scalar fetches
    measure RTT, so neither is usable here."""
    x, rest = args[0], args[1:]

    def step(s, _):
        out = fn(x + s.astype(x.dtype), *rest)
        return out.reshape(-1)[0].astype(jnp.float32) * 1e-20, None

    g = jax.jit(
        lambda: jax.lax.scan(step, jnp.float32(0.0), None, length=n)[0]
    )
    float(g())  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(g())
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return max(ts[len(ts) // 2] - _rtt_ms(), 1e-6) / n


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()}")
    for b, h, w, cin, cout, has_t, has_add in SHAPES:
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        gamma = jnp.asarray(rng.randn(cin), jnp.float32)
        beta = jnp.asarray(rng.randn(cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)
        ta = jnp.asarray(rng.randn(b, cout), jnp.bfloat16) if has_t else None
        ra = (
            jnp.asarray(rng.randn(b, h, w, cout), jnp.bfloat16)
            if has_add
            else None
        )

        def xla_fn(x, gamma, beta, wk, bias):
            return fc._xla_ref(x, gamma, beta, wk, bias, ta, ra, 32, 1e-5)

        def pallas_fn(x, gamma, beta, wk, bias):
            return fc._fused(
                x, gamma, beta, wk.astype(x.dtype), bias, ta, ra, 32, 1e-5
            )

        args = (x, gamma, beta, wk, bias)
        claims = fc.use_gn_silu_conv((b, h, w, cin), cout, 32, on_tpu=True)
        t_xla = timed_call(jax.jit(xla_fn), args)
        if not claims:
            print(
                f"b{b} {h}x{w} {cin}->{cout} t={int(has_t)} add={int(has_add)}"
                f": xla {t_xla:7.3f} ms  (pallas: no-claim)"
            )
            continue
        t_pl = timed_call(jax.jit(pallas_fn), args)
        # on-device numeric parity (the unit tests only cover interpret
        # mode on CPU; this is the real-Mosaic check)
        err = float(
            jnp.max(
                jnp.abs(
                    jax.jit(pallas_fn)(*args).astype(jnp.float32)
                    - jax.jit(xla_fn)(*args).astype(jnp.float32)
                )
            )
        )
        flops = 2 * 9 * b * h * w * cin * cout
        print(
            f"b{b} {h}x{w} {cin}->{cout} t={int(has_t)} add={int(has_add)}: "
            f"xla {t_xla:7.3f} ms ({flops/t_xla/1e9:6.1f} TF/s)  "
            f"pallas {t_pl:7.3f} ms ({flops/t_pl/1e9:6.1f} TF/s)  "
            f"speedup {t_xla/t_pl:5.2f}x  maxerr {err:.2e}"
        )


if __name__ == "__main__":
    main()
