"""Measure the TF2 reference's CPU cost for the headline benchmark.

The reference publishes no numbers (BASELINE.md), so we measure them here by
running the reference implementation (imported from /root/reference) at the
production scale on this host's CPU: one transformer context encode, one
CFG-double-batched U-Net denoise call, one KL-AE decode — all at the default
sampling config ([4,32,32,4] latents, batch 4 -> U-Net batch 8,
all_in_one_config.yaml:25-26).  The 50-step pipeline cost is
  t_transformer + 50 * t_unet + t_decode
which matches the reference's execution structure exactly
(model_runners.py:474-509: context once, while_loop of ddim_sample, decode
once).

Writes baseline_measurement.json next to this script.

Run:  TF_USE_LEGACY_KERAS=1 python tools/measure_reference_baseline.py
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

sys.path.insert(0, "/root/reference")

import numpy as np
import tensorflow as tf

BATCH = 4
STEPS = 50


def timed(fn, *args, repeats=2):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        if hasattr(out, "numpy"):
            out.numpy()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from autoencoder import AutoencoderKL
    from transformer import TransformerModel
    from unet import UNet

    print("[measure] building full-size models...", flush=True)
    transformer = TransformerModel(
        vocab_size=30522,
        encoder_stack_size=32,
        hidden_size=1280,
        num_heads=8,
        size_per_head=64,
        max_seq_len=77,
        filter_size=5120,
        dropout_rate=0.1,
    )
    unet = UNet()
    autoencoder = AutoencoderKL()

    ids = tf.constant(np.zeros((2 * BATCH, 77), np.int64))
    x = tf.constant(np.random.randn(2 * BATCH, 32, 32, 4).astype(np.float32))
    t = tf.constant(np.full((2 * BATCH,), 981.0, np.float32))
    z = tf.constant(np.random.randn(BATCH, 32, 32, 4).astype(np.float32))

    unet_fn = tf.function(lambda x, t, c: unet(x, t, c))
    transformer_fn = tf.function(lambda ids: transformer(ids))
    decode_fn = tf.function(lambda z: autoencoder.decode(z))

    print("[measure] timing transformer context encode...", flush=True)
    ctx = transformer_fn(ids)
    t_transformer = timed(transformer_fn, ids)
    print(f"  t_transformer = {t_transformer:.2f}s", flush=True)

    print("[measure] timing U-Net denoise call (batch 8, 32x32x4)...",
          flush=True)
    unet_fn(x, t, ctx)  # trace + warmup
    t_unet = timed(unet_fn, x, t, ctx)
    print(f"  t_unet = {t_unet:.2f}s", flush=True)

    print("[measure] timing KL-AE 256x256 decode (batch 4)...", flush=True)
    decode_fn(z)
    t_decode = timed(decode_fn, z)
    print(f"  t_decode = {t_decode:.2f}s", flush=True)

    pipeline_s = t_transformer + STEPS * t_unet + t_decode
    result = {
        "host_cpus": os.cpu_count(),
        "tf_version": tf.__version__,
        "batch": BATCH,
        "ddim_steps": STEPS,
        "t_transformer_s": round(t_transformer, 3),
        "t_unet_call_s": round(t_unet, 3),
        "t_decode_s": round(t_decode, 3),
        "pipeline_s": round(pipeline_s, 2),
        "images_per_sec": round(BATCH / pipeline_s, 6),
        "p50_per_image_latency_s": round(pipeline_s / BATCH, 2),
    }
    out = os.path.join(os.path.dirname(__file__), "baseline_measurement.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
