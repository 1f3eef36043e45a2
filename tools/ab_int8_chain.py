"""A/B the whole-chain int8 Pallas kernel vs the 2-stage path vs bf16.

Per-shape device-profiler microbench at the 256^2 CFG-batch-48 ResBlock
shapes (+ a 512^2-class shape).  The 2-stage path's probe-level win
evaporated in-model to layout copies + an unfused dequant (NEXT.md); the
whole-chain kernel is one custom call, so its microbench number is also
its in-model number (modulo the single boundary copy both paths pay).

  python tools/ab_int8_chain.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_op import TRACE_DIR, device_ms_by_case
from ldm_tf2_tpu.ops import fused_conv
from ldm_tf2_tpu.ops.quant_conv import (
    _chain_pick,
    gn_silu_conv3x3_int8_fused,
    gn_silu_conv3x3_int8_two_stage,
    set_int8_stage2,
)

SHAPES = [
    # 256^2 b24 CFG hot classes (with residual/time epilogues as in-model)
    (48, 32, 32, 640, 320, "res"),
    (48, 32, 32, 320, 320, "t"),
    (48, 16, 16, 1280, 1280, "t"),
    (48, 16, 16, 1280, 1280, "res"),
    (48, 8, 8, 1280, 1280, "t"),
    (48, 4, 4, 1280, 1280, "t"),
    (48, 4, 4, 2560, 1280, "res"),
    (48, 64, 64, 320, 320, "t"),   # 512^2-class L0 (CFG b32 -> use 32)
]

# 512^2 CFG-b32 classes (`python tools/ab_int8_chain.py 512`): the L0
# 64x64 rows are the emitter-lottery classes (use_int8_conv excludes
# them; the 2s-dots column is the deterministic candidate), the
# 16x16/8x8 concat rows are the fused/2-stage classes the restricted
# policy already claims.
SHAPES_512 = [
    (32, 64, 64, 320, 320, "t"),
    (32, 64, 64, 640, 320, "res"),
    (32, 32, 32, 640, 640, "t"),
    (32, 32, 32, 1280, 640, "res"),
    (32, 16, 16, 1280, 1280, "t"),
    (32, 16, 16, 2560, 1280, "res"),
    (32, 16, 16, 1920, 1280, "res"),
    (32, 8, 8, 2560, 1280, "res"),
]


def main():
    rng = np.random.RandomState(0)
    n = 8
    shapes = SHAPES_512 if "512" in sys.argv[1:] else SHAPES
    print(f"{'shape':26} {'bf16':>8} {'2stage':>8} {'2s-dots':>8} "
          f"{'fused':>8} {'blk':>5}  (ms/call, device)")
    for bsz, h, w, cin, cout, epi in shapes:
        if h == 64 and shapes is SHAPES:
            bsz = 32
        x = jnp.asarray(rng.randn(bsz, h, w, cin), jnp.bfloat16)
        gamma = jnp.asarray(1 + 0.1 * rng.randn(cin), jnp.float32)
        beta = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
        t = (jnp.asarray(rng.randn(bsz, cout), jnp.bfloat16)
             if epi == "t" else None)
        res = (jnp.asarray(rng.randn(bsz, h, w, cout), jnp.bfloat16)
               if epi == "res" else None)

        def chain_bf16(x):
            return fused_conv._xla_ref(
                x, gamma, beta, wk, bias, t, res, 32, 1e-5,
            )

        def chain_2stage(x):
            return gn_silu_conv3x3_int8_two_stage(
                x, gamma, beta, wk, bias, time_add=t, residual_add=res,
            )

        def chain_fused(x):
            return gn_silu_conv3x3_int8_fused(
                x, gamma, beta, wk, bias, time_add=t, residual_add=res,
            )

        def chain_2stage_dots(x):
            set_int8_stage2("dots")
            try:
                return gn_silu_conv3x3_int8_two_stage(
                    x, gamma, beta, wk, bias, time_add=t, residual_add=res,
                )
            finally:
                set_int8_stage2("emitter")

        picked = _chain_pick(h * w, w, cin, cout, res is not None)
        blk = f"{picked[0]}/{picked[1]}" if picked else None
        cases = [("bf16", chain_bf16), ("2stage", chain_2stage),
                 ("2s-dots", chain_2stage_dots)]
        if picked is not None:
            cases.append(("fused", chain_fused))
        jitted = []
        ok = {}
        for name, fn in cases:
            g = jax.jit(fn)
            try:
                jax.block_until_ready(g(x))
            except Exception as e:  # noqa: BLE001
                ok[name] = f"FAIL:{type(e).__name__}"
                continue
            jitted.append((name, fn, g))
        with jax.profiler.trace(TRACE_DIR):
            for name, fn, g in jitted:
                outs = [g(x) for _ in range(n)]
                for o in outs:
                    float(jnp.sum(o[:1, :1, :1, :1].astype(jnp.float32)))
        per = device_ms_by_case(TRACE_DIR, n)
        for name, fn, g in jitted:
            k = f"jit_{fn.__name__}"
            ok[name] = f"{per[k][0]:8.3f}" if k in per else "??"
        tag = f"{h}x{w} {cin}->{cout} {epi} b{bsz}"
        print(f"{tag:26} {ok.get('bf16','--'):>8} "
              f"{ok.get('2stage','--'):>8} {ok.get('2s-dots','--'):>8} "
              f"{ok.get('fused','--'):>8} {blk if blk else '--':>9}")


if __name__ == "__main__":
    main()
