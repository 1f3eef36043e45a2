"""Empirical VMEM/perf calibration of ops/fused_conv.py on the real chip.

For every ResBlock GN+SiLU+conv3x3 shape the U-Net hits at 256^2 (CFG
batch 32) and 512^2 (CFG batch 8) sampling, tries the Pallas kernel at
each candidate cout block size: does Mosaic compile it (VMEM), what does
it run at, and does it match the XLA composition numerically.  The
`use_gn_silu_conv` gate constants (_VMEM_BUDGET, hw/channel bounds) are
set from this table — the analytic estimate alone proved ~1-2 MB off.

  python tools/calibrate_fused_conv.py [quick]
"""

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
from tools.bench_fused_conv import timed_call

# (b, h, w, cin, cout, has_t, has_add) — epilogue variant per conv site
SHAPES_256 = [
    (32, 32, 32, 320, 320, True, False),    # L1 conv1
    (32, 32, 32, 320, 320, False, True),    # L1 conv2
    (32, 32, 32, 640, 320, True, False),    # L1-up concat conv1 (the cliff)
    (32, 16, 16, 320, 640, True, False),    # L2 first conv1
    (32, 16, 16, 640, 640, True, False),    # L2 conv1
    (32, 16, 16, 640, 640, False, True),    # L2 conv2
    (32, 16, 16, 960, 640, True, False),    # L2-up concat conv1
    (32, 16, 16, 1280, 640, True, False),   # L2-up concat conv1 (from L3)
]
SHAPES_512 = [
    (8, 64, 64, 320, 320, True, False),
    (8, 64, 64, 320, 320, False, True),
    (8, 64, 64, 640, 320, True, False),
    (8, 32, 32, 640, 640, True, False),
    (8, 32, 32, 640, 640, False, True),
    (8, 32, 32, 960, 640, True, False),
    (8, 32, 32, 1280, 640, True, False),
    (8, 16, 16, 1280, 1280, False, True),
    (8, 16, 16, 1920, 1280, True, False),
]


def blk_candidates(cout):
    return [cout] + [
        m * 128
        for m in (8, 4, 2, 1)
        if m * 128 < cout and cout % (m * 128) == 0
    ]


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    shapes = SHAPES_256 if quick else SHAPES_256 + SHAPES_512
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()}")
    for b, h, w, cin, cout, has_t, has_add in shapes:
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
        gamma = jnp.asarray(1 + 0.1 * rng.randn(cin), jnp.float32)
        beta = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
        ta = (
            jnp.asarray(rng.randn(b, cout), jnp.bfloat16) if has_t else None
        )
        ra = (
            jnp.asarray(rng.randn(b, h, w, cout), jnp.bfloat16)
            if has_add
            else None
        )
        tag = (
            f"b{b} {h}x{w} {cin:4d}->{cout:4d} t={int(has_t)} "
            f"add={int(has_add)}"
        )
        ref = jax.jit(
            lambda x: fc._xla_ref(x, gamma, beta, wk, bias, ta, ra, 32, 1e-5)
        )(x)
        for blk in blk_candidates(cout):
            est = fc._vmem_bytes(
                h * w, w, cin, blk, cout // blk, has_t, has_add
            )
            try:
                fn = jax.jit(
                    lambda x, blk=blk: fc._pallas_call(
                        x, gamma, beta, wk, bias, ta, ra, 32, 1e-5, blk=blk
                    )
                )
                got = fn(x)
                err = float(
                    jnp.max(
                        jnp.abs(
                            got.astype(jnp.float32) - ref.astype(jnp.float32)
                        )
                    )
                )
                scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
                t_ms = timed_call(fn, (x,), n=16)
                flops = 2 * 9 * b * h * w * cin * cout
                print(
                    f"{tag} blk{blk:4d} est{est/2**20:5.1f}M: "
                    f"{t_ms:7.3f} ms ({flops/t_ms/1e9:6.1f} TF/s) "
                    f"relerr {err/max(scale,1e-9):.1e}",
                    flush=True,
                )
                break  # largest working blk wins
            except Exception as e:
                msg = str(e).split("\n")[0][:90]
                print(
                    f"{tag} blk{blk:4d} est{est/2**20:5.1f}M: FAIL {msg}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
