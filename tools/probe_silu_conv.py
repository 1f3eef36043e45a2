"""Does the SiLU in the GN->SiLU->conv prologue cost MXU throughput?

The roofline report has conv fusions at 133 TF/s (68% MXU) while the two
GN-free upsample convs hit 180-187; ops/group_norm.py attributes the gap
to the normalize+SiLU prologue recomputed per conv-window tap.  This
probe isolates how much of that prologue is the *activation* by timing
the emitter conv chain at hot shapes with successively cheaper bodies:

  bare      conv only (no GN, no SiLU)            — prologue-free ceiling
  gn        GN normalize, no activation           — normalize-only floor
  exact     GN + y*sigmoid(y)                     — the current default
  tanhform  GN + 0.5*y*(1+tanh(0.5*y))            — one jnp.tanh, no divide
  poly      GN + u+h(u) deg-9 poly (3.3e-3 abs)   — no transcendental at all

  python tools/probe_silu_conv.py

Times are device-profiler XLA-Module sums (host timers are unreliable
through the tunnel, NEXT.md "Timing through the tunnel").
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_op import device_ms_by_case

TRACE_DIR = "/tmp/ldm_silu_probe"

# deg-9 Chebyshev power-basis fit of h(u) = u*tanh(u) in t = u^2 on
# [0, 16]; silu(x) = u + h(u), u = x/2, h := |u| for |u| > 4.  Max abs
# err 3.3e-3 (tanh's pole at u = i*pi/2 limits the fit; timing probe
# only — accuracy would need the rational form).
_SILU_CS = (
    3.32817413681985e-03, 9.72462376693149e-01, -2.73329323225918e-01,
    7.08974764283765e-02, -1.31399733247724e-02, 1.64773352597688e-03,
    -1.35205753982228e-04, 6.91772517219856e-06, -1.99629691537879e-07,
    2.47667590294830e-09,
)


def _act(y, mode):
    if mode == "exact":
        return y * jax.nn.sigmoid(y)
    if mode == "tanhform":
        return 0.5 * y * (1.0 + jnp.tanh(0.5 * y))
    if mode == "poly":
        u = 0.5 * y
        au = jnp.abs(u)
        t = jnp.square(jnp.minimum(au, 4.0))
        p = _SILU_CS[-1]
        for c in _SILU_CS[-2::-1]:
            p = p * t + c
        return u + jnp.where(au > 4.0, au, p)
    raise ValueError(mode)


def make_chain(mode, gamma, beta, wk, bias, name):
    from ldm_tf2_tpu.ops.group_norm import _mxu_stats_group_norm

    def chain(x):
        if mode == "bare":
            y = x
        else:
            y = _mxu_stats_group_norm(x, gamma, beta, 32, 1e-5, False)
            if mode != "gn":
                y = _act(y, mode).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            y, wk.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(y.dtype)

    chain.__name__ = name
    return jax.jit(chain)


def main():
    rng = np.random.RandomState(0)
    # hot CFG-b24 shapes: decoder concat-conv class, L2 wide, L0 narrow
    shapes = [
        (48, 32, 32, 640, 320),
        (48, 16, 16, 1280, 1280),
        (48, 32, 32, 320, 320),
    ]
    iters = 30
    for (b, h, w, cin, cout) in shapes:
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        gamma = jnp.asarray(rng.randn(cin), jnp.float32)
        beta = jnp.asarray(rng.randn(cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)
        flops = 2 * b * h * w * 9 * cin * cout
        fns = []
        for mode in ("bare", "gn", "exact", "tanhform", "poly"):
            name = f"c{mode}_{cin}x{cout}s{h}"
            fns.append((name, make_chain(mode, gamma, beta, wk, bias, name)))
        ref = dict(fns)[f"cexact_{cin}x{cout}s{h}"](x)
        got = dict(fns)[f"cpoly_{cin}x{cout}s{h}"](x)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        for _, fn in fns:
            fn(x).block_until_ready()  # compile
        with jax.profiler.trace(TRACE_DIR):
            for _, fn in fns:
                o = None
                for _ in range(iters):
                    o = fn(x)
                o.block_until_ready()
        times = device_ms_by_case(TRACE_DIR, iters)
        print(f"shape b{b} {h}x{w} {cin}->{cout}  poly-vs-exact max abs "
              f"err {err:.2e}", flush=True)
        for name, _ in fns:
            hit = [(ms, n) for mod, (ms, n) in times.items()
                   if name in mod]
            if not hit:
                print(f"  {name:>24s}  (no trace slice)")
                continue
            ms, n = hit[0]
            per = ms * n / iters  # total device ms across iters / iters
            tfs = flops / (per * 1e-3) / 1e12
            print(f"  {name:>24s}  {per:7.3f} ms  {tfs:6.1f} TF/s",
                  flush=True)
        shutil.rmtree(TRACE_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
