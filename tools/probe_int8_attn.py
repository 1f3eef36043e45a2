"""Probe: would int8 QK / PV dots pay inside the flash-attention kernel?

Attention is 10% of the 256^2 U-Net eval (roofline_report) and ~31% at
512^2.  Before building a SageAttention-style quantized flash kernel,
measure the bare batched dots at the kernel's real shapes:

  * QK: [BH, T, Sp] x [BH, Sp, T] — contraction over the LANE-PADDED
    head dim Sp=128 (real 40/80) — a SHALLOW contraction, exactly the
    regime where the 64x64-class s8 conv dots lost (k=n=320 -> 5.9 ms
    vs 2.0; NEXT.md session 9), and
  * PV: [BH, T, T] x [BH, T, Sp] — contraction over kv tokens (1024 /
    4096), the deep-contraction regime where s8 wins.

If the QK s8 speedup is < ~1.4x the kernel work is not worth it: QK and
PV are each ~half the attention FLOPs, softmax/quantize overhead eats
single-digit wins, and PV-only quantization (per-block p in [0,1] has a
clean fixed-point representation but v needs scales) saves at most half
the bucket.

  python tools/probe_int8_attn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_op import TRACE_DIR, device_ms_by_case

# (label, bh, t, sp): 256^2 L0 (h8 sp40->128), 512^2 L0, 256^2 L1
# (sp80->128).  bh is scaled DOWN from the CFG-batch values (384/256)
# so the materialized [bh, t, t] logits fit HBM with n calls in flight
# — the per-batch-element dot shape (what sets MXU utilization) is
# unchanged, so the s8:bf16 ratio is representative.
CASES = [
    ("256^2 L0 t1024 sp128", 96, 1024, 128),
    ("512^2 L0 t4096 sp128", 16, 4096, 128),
    ("256^2 L1 t256 sp128", 96, 256, 128),
]


def qk_bf16(q, k):
    return jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def qk_s8(q8, k8):
    return jax.lax.dot_general(
        q8, k8, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def pv_bf16(p, v):
    return jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def pv_s8(p8, v8):
    return jax.lax.dot_general(
        p8, v8, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def main():
    rng = np.random.RandomState(0)
    n = 4
    print(f"{'case':24} {'qk_bf16':>8} {'qk_s8':>8} {'pv_bf16':>8} "
          f"{'pv_s8':>8}  (ms/call, device)")
    for label, bh, t, sp in CASES:
        q = jnp.asarray(rng.randn(bh, t, sp), jnp.bfloat16)
        k = jnp.asarray(rng.randn(bh, t, sp), jnp.bfloat16)
        p = jnp.asarray(rng.rand(bh, t, t), jnp.bfloat16)
        v = jnp.asarray(rng.randn(bh, t, sp), jnp.bfloat16)
        q8 = jnp.asarray(rng.randint(-127, 128, (bh, t, sp)), jnp.int8)
        k8 = jnp.asarray(rng.randint(-127, 128, (bh, t, sp)), jnp.int8)
        p8 = jnp.asarray(rng.randint(0, 128, (bh, t, t)), jnp.int8)
        v8 = jnp.asarray(rng.randint(-127, 128, (bh, t, sp)), jnp.int8)

        cases = [
            ("qk_bf16", qk_bf16, (q, k)),
            ("qk_s8", qk_s8, (q8, k8)),
            ("pv_bf16", pv_bf16, (p, v)),
            ("pv_s8", pv_s8, (p8, v8)),
        ]
        jitted = []
        for name, fn, args in cases:
            g = jax.jit(fn)
            try:
                jax.block_until_ready(g(*args))
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAIL {type(e).__name__}: {e}")
                continue
            jitted.append((name, fn, g, args))
        with jax.profiler.trace(TRACE_DIR):
            for name, fn, g, args in jitted:
                outs = [g(*args) for _ in range(n)]
                for o in outs:
                    float(jnp.sum(o[:1, :1, :1].astype(jnp.float32)))
        per = device_ms_by_case(TRACE_DIR, n)
        row = {}
        for name, fn, g, args in jitted:
            kk = f"jit_{fn.__name__}"
            row[name] = f"{per[kk][0]:8.3f}" if kk in per else "??"
        print(f"{label:24} {row.get('qk_bf16','--'):>8} "
              f"{row.get('qk_s8','--'):>8} {row.get('pv_bf16','--'):>8} "
              f"{row.get('pv_s8','--'):>8}")


if __name__ == "__main__":
    main()
