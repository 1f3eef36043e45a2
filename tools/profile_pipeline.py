"""Capture a device trace of the txt2img pipeline (or one CFG U-Net eval)
and print a per-op time breakdown.

  python tools/profile_pipeline.py [unet|pipeline] [outdir]

Writes a jax.profiler trace (xplane + perfetto json) under outdir
(default /tmp/ldm_trace) and, when the perfetto json is present, prints
the top op groups by total device time.
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


def build_unet_eval(batch=16, latent=32):
    from ldm_tf2_tpu.models import UNet

    dtype = jnp.bfloat16
    unet = UNet(dtype=dtype)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2 * batch, latent, latent, 4), dtype)
    t = jnp.zeros((2 * batch,), jnp.float32)
    ctx = jnp.zeros((2 * batch, 77, 1280), dtype)
    params = jax.jit(unet.init)(key, x, t, ctx)["params"]
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    fn = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
    return fn, (params, x, t, ctx)


def summarize_perfetto(trace_dir):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(f"[profile] no perfetto trace under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device slices: pid/tid named via metadata; aggregate complete events
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        # group fusions by leading op kind
        key = name.split(".")[0].split("(")[0]
        by_op[key] += dur
        total += dur
    print(f"[profile] {path}")
    print(f"[profile] total device slice time: {total:.1f} ms")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v:10.2f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")


def build_train_step(batch=8, image=256):
    """Full LDM train step (frozen-AE encode + cond fwd + U-Net fwd/bwd +
    AdamW), same construction as tools/bench_train.py.  The step donates
    its state, so the closure threads it internally."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_train

    step, state, ae_params, images, ids, key = bench_train.build_ldm_step(
        batch=batch, image=image, remat=True
    )
    holder = {"state": state}

    def fn():
        new_state, metrics = step(
            holder["state"], ae_params, images, ids, key
        )
        holder["state"] = new_state
        return metrics

    return fn, ()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "unet"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ldm_trace"
    if mode == "unet24":
        # the 256^2 b24 headline serving shape (CFG batch 48)
        fn, args = build_unet_eval(batch=24, latent=32)
    elif mode == "unet512":
        fn, args = build_unet_eval(batch=4, latent=64)
    elif mode == "unet1024":
        # the `bench.py ultra` serving shape: 128x128 latents, CFG batch
        # 2x2 (16384-token L0 self-attention through the flash kernel)
        fn, args = build_unet_eval(batch=2, latent=128)
    elif mode == "unet":
        fn, args = build_unet_eval()
    elif mode == "train":
        fn, args = build_train_step()
    else:
        raise SystemExit(
            f"unknown mode {mode!r} (use: unet | unet512 | unet1024 | train)"
        )
    print("[profile] compiling...", flush=True)
    out = fn(*args)
    jax.block_until_ready(out)
    print("[profile] tracing...", flush=True)
    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(jnp.ravel(leaf)[0]))
    summarize_perfetto(outdir)


if __name__ == "__main__":
    main()
