"""Profiler-timed micro-benchmarks: per-op device durations from a trace.

The tunnel makes host-side timing of single ops unreliable (NEXT.md
"Timing through the tunnel"), and the scan-chain timer has a linearity
hole: for a LINEAR op f, f(x + s*1) = f(x) + s*f(1), so XLA may hoist
the loop-invariant f(x) out of the chain and the "timed" iterations
degenerate (this produced the impossible 378 TF/s bf16 "measurement" on
a 197 TF/s chip — see the correction in ops/fused_conv.py).  The device
profiler sidesteps both: XLA-Ops slices carry `device_duration_ps`
straight from the hardware tracer.

  python tools/profile_op.py            # cliff-shape conv variants + peak matmul
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/ldm_op_trace"


def device_ms_by_case(trace_dir, n_iters):
    """Sum XLA-Ops slice durations per traced case (donated marker names)."""
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    tnames = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    # XLA Modules slices are named after the jitted function -> one bucket
    # per case; divide by iteration count for per-call time.
    by_mod = defaultdict(float)
    n_mod = defaultdict(int)
    for e in ev:
        if e.get("ph") != "X":
            continue
        if tnames.get((e["pid"], e["tid"])) != "XLA Modules":
            continue
        # strip ".suffix" and the "(fingerprint)" some jax versions append
        name = e["name"].split(".")[0].split("(")[0]
        by_mod[name] += e.get("dur", 0) / 1e3
        n_mod[name] += 1
    return {k: (v / max(n_mod[k], 1), n_mod[k]) for k, v in by_mod.items()}


def main():
    from ldm_tf2_tpu.ops import fused_conv as fc

    rng = np.random.RandomState(0)
    b, h, w, cin, cout = 16, 32, 32, 640, 320
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
    gamma = jnp.asarray(rng.randn(cin), jnp.float32)
    beta = jnp.asarray(rng.randn(cin), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    ta = jnp.asarray(rng.randn(b, cout), jnp.bfloat16)
    m = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)

    def chain_emitter(x):
        return fc._xla_ref(
            x, gamma, beta, wk, bias, ta, None, 32, 1e-5, conv_impl="emitter"
        )

    def chain_dots(x):
        return fc._xla_ref(
            x, gamma, beta, wk, bias, ta, None, 32, 1e-5, conv_impl="dots"
        )

    def peak_matmul(a):
        return jnp.dot(a, a, preferred_element_type=jnp.float32)

    conv_flops = 2 * b * h * w * cin * cout * 9
    cases = [
        ("chain_emitter", chain_emitter, (x,), conv_flops),
        ("chain_dots", chain_dots, (x,), conv_flops),
        ("peak_matmul", peak_matmul, (m,), 2 * 4096**3),
    ]

    n_iters = 8
    jitted = {}
    for name, fn, args, _ in cases:
        g = jax.jit(fn)
        g(*args).block_until_ready()
        jitted[name] = (g, args)

    with jax.profiler.trace(TRACE_DIR):
        for name, (g, args) in jitted.items():
            outs = [g(*args) for _ in range(n_iters)]
            for o in outs:
                float(jnp.sum(o.astype(jnp.float32)[:1, :1]))

    per = device_ms_by_case(TRACE_DIR, n_iters)
    print(f"{'case':16} {'ms/call':>9} {'TF/s':>8} {'%bf16 peak (197)':>17}")
    for name, fn, args, flops in cases:
        # jit(fn) modules are named jit_<fn.__name__>
        key = f"jit_{fn.__name__}"
        if key not in per:
            print(f"{name:16} -- no trace slice (keys: {list(per)})")
            continue
        ms, n = per[key]
        tfs = flops / (ms * 1e-3) / 1e12
        print(f"{name:16} {ms:9.3f} {tfs:8.1f} {100 * tfs / 197:16.1f}%  (n={n})")


if __name__ == "__main__":
    main()
