"""What limits the d=320 FFN kernel (104-108 TF/s vs 167 at d=640)?

Hypotheses from the fused_ffn docstring: (a) the erf-gelu VPU chain
serializes against the MXU dots; (b) the K=320 lane pad (320 -> 384,
83% K utilization) caps the w1 dots.  Probe by swapping the gelu for
successively cheaper bodies in an otherwise identical kernel at the hot
L0 shape (CFG b48: m = 48*1024, d = 320) and, separately, running the
pure-dot chain at d=320 vs d=384 (pre-padded).

  python tools/probe_ffn_gelu.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_op import device_ms_by_case

TRACE_DIR = "/tmp/ldm_ffn_gelu_probe"


def make_kernel(gelu_mode):
    from ldm_tf2_tpu.ops.fused_ffn import _gelu_exact_f32

    def kern(x_ref, w1a_ref, w1b_ref, w2_ref, o_ref, acc_ref):
        y = x_ref[:]
        a = jnp.dot(y, w1a_ref[:], preferred_element_type=jnp.float32)
        g = jnp.dot(y, w1b_ref[:], preferred_element_type=jnp.float32)
        if gelu_mode == "exact":
            u = (a * _gelu_exact_f32(g)).astype(y.dtype)
        elif gelu_mode == "tanh":
            c = 0.7978845608028654
            u = (a * (0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))))).astype(y.dtype)
        elif gelu_mode == "poly":
            # deg-9 Chebyshev-fit polynomial in u = g^2 of g*erf(g/sqrt2)
            # on |g| <= 4 (max abs err 2.3e-5; outside, gelu(g) = max(g,0)
            # to 1.3e-4): no exp, no divide, no sign.
            cs = (1.17001125700400e-05, 7.97724482796235e-01,
                  -1.32617207955768e-01, 1.96232925549133e-02,
                  -2.22546161701489e-03, 1.90177605018239e-04,
                  -1.17833702310525e-05, 4.93687027647959e-07,
                  -1.23685744320984e-08, 1.38723939155963e-10)
            ag = jnp.abs(g)
            gc = jnp.minimum(ag, 4.0)
            t = gc * gc
            p = cs[-1]
            for c in cs[-2::-1]:
                p = p * t + c
            p = jnp.where(ag > 4.0, ag, p)
            u = (a * (0.5 * g + 0.5 * p)).astype(y.dtype)
        elif gelu_mode == "mul":
            u = (a * g).astype(y.dtype)
        elif gelu_mode == "none":
            u = a.astype(y.dtype)
        acc_ref[:] = jnp.dot(u, w2_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


def run_probe(name, gelu_mode, m, d, tm):
    h4 = 4 * d
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (m, d)).astype(jnp.bfloat16)
    w1a = jax.random.normal(ks[1], (d, h4)).astype(jnp.bfloat16) * 0.02
    w1b = jax.random.normal(ks[2], (d, h4)).astype(jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (h4, d)).astype(jnp.bfloat16) * 0.02

    def run(x, w1a, w1b, w2):
        return pl.pallas_call(
            make_kernel(gelu_mode),
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h4, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
            scratch_shapes=[pltpu.VMEM((tm, d), jnp.float32)],
        )(x, w1a, w1b, w2)

    run.__name__ = name
    f = jax.jit(run)
    try:
        f(x, w1a, w1b, w2).block_until_ready()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}"[:140], flush=True)
        return None
    print(f"compiled {name}", flush=True)
    return f, (x, w1a, w1b, w2)


def main():
    m = 48 * 1024
    flops = {}
    jitted = []
    for d in (320, 384):
        for mode in ("exact", "poly", "tanh", "mul", "none"):
            name = f"ffn_d{d}_{mode}"
            r = run_probe(name, mode, m, d, 1024)
            if r:
                jitted.append((name, *r))
                flops[name] = 2 * m * 12 * d * d

    n_iters = 8
    with jax.profiler.trace(TRACE_DIR):
        for name, f, args in jitted:
            outs = [f(*args) for _ in range(n_iters)]
            for o in outs:
                float(jnp.sum(o.astype(jnp.float32)[:1, :1]))

    per = device_ms_by_case(TRACE_DIR, n_iters)
    for name, f, args in jitted:
        k_ = f"jit_{name}"
        if k_ not in per:
            print(f"{name}: no slice")
            continue
        ms, n = per[k_]
        tfs = flops[name] / (ms * 1e-3) / 1e12
        print(f"{name:24} {ms:7.3f} ms  {tfs:6.1f} TF/s  n={n}")


if __name__ == "__main__":
    main()
