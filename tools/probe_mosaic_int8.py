"""Probe: does Mosaic lower s8 x s8 -> s32 `jnp.dot` inside a Pallas
kernel at the MXU's 2x int8 rate?

Gates the int8 variant of the fused FFN kernel (ops/fused_ffn.py): the
XLA-level probe (tools/probe_int8.py) showed 380 TOP/s through jnp.dot,
but Pallas goes through Mosaic's own matmul lowering, which may (a)
reject int8 operands or (b) emulate them at bf16 rate.

  python tools/probe_mosaic_int8.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.profile_op import TRACE_DIR, device_ms_by_case

M = N = K = 2048
TM = 512


def _kernel_bf16(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def _kernel_int8(a_ref, b_ref, o_ref):
    acc = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * 0.01).astype(jnp.bfloat16)


def make(kernel, a_dtype):
    def fn(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        )(a, b)

    return fn


def pallas_bf16(a, b):
    return make(_kernel_bf16, jnp.bfloat16)(a, b)


def pallas_int8(a, b):
    return make(_kernel_int8, jnp.int8)(a, b)


def main():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    b = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)

    flops = 2 * M * N * K
    cases = [
        ("pallas_bf16", pallas_bf16, (a, b)),
        ("pallas_int8", pallas_int8, (a8, b8)),
    ]
    n_iters = 16
    jitted = []
    for name, fn, args in cases:
        g = jax.jit(fn)
        try:
            jax.block_until_ready(g(*args))
        except Exception as e:  # noqa: BLE001 — Mosaic may reject s8
            print(f"{name:14} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            continue
        jitted.append((name, fn, g, args))

    with jax.profiler.trace(TRACE_DIR):
        for name, fn, g, args in jitted:
            outs = [g(*args) for _ in range(n_iters)]
            for o in outs:
                float(jnp.sum(o[:1, :1].astype(jnp.float32)))

    per = device_ms_by_case(TRACE_DIR, n_iters)
    for name, fn, g, args in jitted:
        key = f"jit_{fn.__name__}"
        if key not in per:
            print(f"{name:14} -- no trace slice")
            continue
        ms, n = per[key]
        tfs = flops / (ms * 1e-3) / 1e12
        print(f"{name:14} {ms:8.3f} ms {tfs:8.1f} T(FL)OP/s "
              f"({tfs / 197:4.2f}x bf16 peak, n={n})")


if __name__ == "__main__":
    main()
