"""A/B the int8-PV flash forward vs the bf16 forward at model shapes.

The probe (tools/probe_int8_attn.py) showed the bare PV dot at 1.7-3x in
s8; this times the full flash kernel (where the exp/max VPU chain and
the QK dot still run in f32/bf16) with `set_flash_pv_int8` on/off.

  python tools/ab_pv_int8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_op import TRACE_DIR, device_ms_by_case
from ldm_tf2_tpu.ops import flash_attention as fa

# (label, b, t, h): flat-layout self-attention shapes (sp40 -> 128).
CASES = [
    ("256^2 L0 b48 t1024", 48, 1024, 8),
    ("512^2 L0 b32 t4096", 32, 4096, 8),
    ("256^2 L1 b48 t256", 48, 256, 8),
]


def main():
    rng = np.random.RandomState(0)
    n = 8
    sp = 128
    print(f"{'case':24} {'bf16':>8} {'int8pv':>8}  (ms/call, device)")
    for label, b, t, h in CASES:
        qf = jnp.asarray(rng.randn(b, t, h * sp), jnp.bfloat16)
        kf = jnp.asarray(rng.randn(b, t, h * sp), jnp.bfloat16)
        vf = jnp.asarray(rng.randn(b, t, h * sp), jnp.bfloat16)
        scale = 40.0**-0.5

        def fwd_bf16(q, k, v):
            fa.set_flash_pv_int8(False)
            return fa._forward_flat(q, k, v, scale, h)

        def fwd_int8pv(q, k, v):
            fa.set_flash_pv_int8(True)
            try:
                return fa._forward_flat(q, k, v, scale, h)
            finally:
                fa.set_flash_pv_int8(False)

        jitted = []
        for name, fn in (("bf16", fwd_bf16), ("int8pv", fwd_int8pv)):
            g = jax.jit(fn)
            try:
                jax.block_until_ready(g(qf, kf, vf))
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAIL {type(e).__name__}: {e}")
                continue
            jitted.append((name, fn, g))
        with jax.profiler.trace(TRACE_DIR):
            for name, fn, g in jitted:
                outs = [g(qf, kf, vf) for _ in range(n)]
                for o in outs:
                    float(jnp.sum(o[:1, :1, :8].astype(jnp.float32)))
        per = device_ms_by_case(TRACE_DIR, n)
        row = {}
        for name, fn, g in jitted:
            kk = f"jit_{fn.__name__}"
            row[name] = f"{per[kk][0]:8.3f}" if kk in per else "??"
        print(f"{label:24} {row.get('bf16','--'):>8} "
              f"{row.get('int8pv','--'):>8}")


if __name__ == "__main__":
    main()
