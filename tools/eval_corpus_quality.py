"""Corpus-level quality eval: VGG-FID per serving mode on the demo model.

Scales the demo's 16-image quality check up to a corpus: S seeds x all 16
captions per mode, so the serving-menu rows carry corpus-level FID numbers
instead of grid-level ones.  Sampling goes through the serving loop
(cli/serve_ldm.py): ONE compile per mode, micro-batched JSONL requests —
also an end-to-end exercise of the server's request packing at scale.

Mode grammar (composable serving-menu rows):
  bf16          the full-quality default path
  int8          tpu.quantize: int8
  deepcacheN    ldm_sampling.cache_interval = N
  dpmN          sampler: dpm_solver_pp_2m at N steps (few-step solver)
  plmsN         sampler: plms at N steps
  <mode>-karras / <mode>-trailing
                ldm.timestep_spacing for the mode (e.g. dpm20-karras)
  a+b           composed mechanisms (e.g. int8+dpm8-karras — the
                recommended latency-mode stack; int8+deepcache3)

Requires the /tmp/ldm_demo workdir from tools/run_demo.py (trained
checkpoints + patched config).

  python tools/eval_corpus_quality.py [--seeds 8] \
      [--modes bf16,int8,deepcache2,deepcache3,dpm20]

Prints one FID row per mode (vs a 1024-image slice of the training
corpus) plus per-pixel deltas vs the bf16 corpus.
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.make_demo_dataset import COLORS, SHAPES  # noqa: E402

DEMO = os.path.expanduser(
    os.environ.get("LDM_DEMO_DIR", "/tmp/ldm_demo"))
CFG_PATCHED = os.path.join(DEMO, "demo_config_patched.yaml")
REAL_N = 1024


def patch_config(mode: str) -> str:
    # Optional "-karras"/"-trailing" suffix on any mode selects the DDIM
    # sub-sequence spacing (ldm.timestep_spacing), e.g. "dpm20-karras".
    # "+" composes mechanisms, e.g. "int8+dpm8-karras" — the recommended
    # latency-mode stack — or "int8+deepcache3".
    base, spacing = mode, "uniform"
    for suffix in ("karras", "trailing"):
        if mode.endswith("-" + suffix):
            base, spacing = mode[: -len(suffix) - 1], suffix
    parts = base.split("+")
    with open(CFG_PATCHED) as f:
        raw = yaml.safe_load(f)
    tpu = raw.setdefault("tpu", {})
    tpu["quantize"] = "int8" if "int8" in parts else "none"
    raw["ldm"]["timestep_spacing"] = spacing
    sampling = raw["ldm_sampling"]
    sampling["cache_interval"] = 1
    for part in parts:
        if part.startswith("deepcache"):
            sampling["cache_interval"] = int(part[len("deepcache"):])
        elif part.startswith("dpm"):
            sampling["sampler"] = "dpm_solver_pp_2m"
            raw["ldm"]["num_ddim_steps"] = int(part[len("dpm"):])
        elif part.startswith("plms"):
            sampling["sampler"] = "plms"
            raw["ldm"]["num_ddim_steps"] = int(part[len("plms"):])
    path = os.path.join(DEMO, f"corpus_cfg_{mode}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)
    return path


def sample_mode(mode: str, prompts: list, seeds: int) -> np.ndarray:
    """All seeds x prompts through one serve_ldm process (one compile)."""
    out_dir = os.path.join(DEMO, "corpus", mode)
    os.makedirs(out_dir, exist_ok=True)
    requests = "".join(
        json.dumps({"prompt": prompts, "seed": s, "out": f"s{s:03d}"}) + "\n"
        for s in range(seeds)
    )
    cfg = patch_config(mode)
    print(f"\n[corpus-eval] {mode}: {seeds} requests x {len(prompts)} "
          f"prompts through serve_ldm", flush=True)
    proc = subprocess.run(
        [sys.executable, "-m", "ldm_tf2_tpu.cli.serve_ldm",
         "--config_path", cfg, "--output_dir", out_dir],
        input=requests, capture_output=True, text=True, cwd=REPO,
    )
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        raise RuntimeError(f"serve_ldm failed for {mode}")
    resps = [json.loads(l) for l in proc.stdout.splitlines()]
    assert len(resps) == seeds and all(r["ok"] for r in resps), resps
    latencies = [r["latency_s"] for r in resps]
    gen = np.concatenate(
        [np.load(os.path.join(out_dir, f"s{s:03d}.npy"))
         for s in range(seeds)]
    )
    np.save(os.path.join(DEMO, f"corpus_generated_{mode}.npy"), gen)
    print(f"[corpus-eval] {mode}: corpus {gen.shape}, serve wave "
          f"latencies p50 {np.median(latencies):.3f}s", flush=True)
    return gen


def real_corpus(image_size: int) -> np.ndarray:
    from ldm_tf2_tpu.data.indexed import create_indexed_dataset

    files = sorted(glob.glob(os.path.join(DEMO, "data", "*.tfrecord")))
    it = create_indexed_dataset(
        files, batch_size=REAL_N, image_size=image_size, keys=("image",),
        num_workers=4,
    )
    return np.asarray(next(it), np.float32)


def main(argv):
    seeds = 8
    modes = ["bf16", "int8", "deepcache2", "deepcache3"]
    reuse = False
    for a in argv:
        if a.startswith("--seeds"):
            seeds = int(a.split("=", 1)[1])
        elif a.startswith("--modes"):
            modes = a.split("=", 1)[1].split(",")
        elif a == "--reuse":
            # recompute metrics from corpus_generated_<mode>.npy saved by a
            # prior run instead of re-sampling
            reuse = True

    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.configs import load_config
    from ldm_tf2_tpu.eval import fid_from_features, vgg_feature_extractor

    prompts = [f"a {c} {s}" for c in COLORS for s in SHAPES]
    config = load_config(CFG_PATCHED)
    features = vgg_feature_extractor(load_params(config["lpips_ckpt_path"]))

    image_size = int(yaml.safe_load(open(CFG_PATCHED))[
        "autoencoder_training"]["params"]["image_size"])
    real = real_corpus(image_size)
    real_feats = features(real)
    print(f"[corpus-eval] real corpus {real.shape}")

    results, corpora = {}, {}
    for mode in modes:
        saved = os.path.join(DEMO, f"corpus_generated_{mode}.npy")
        if reuse and os.path.exists(saved):
            gen = np.load(saved)
            print(f"[corpus-eval] {mode}: reusing {saved} {gen.shape}")
        else:
            gen = sample_mode(mode, prompts, seeds)
        corpora[mode] = gen
        # the extractor expects [-1, 1] (same convention as cli/run_eval.py
        # load_images); the server writes uint8
        results[mode] = fid_from_features(
            real_feats, features(gen.astype(np.float32) / 127.5 - 1.0)
        )

    print(f"\n[corpus-eval] VGG-FID vs {REAL_N} training images "
          f"({seeds * len(prompts)} samples/mode):")
    for mode in modes:
        line = f"  {mode:12s} {results[mode]:.4f}"
        if mode != "bf16" and "bf16" in corpora:
            d = np.abs(corpora[mode].astype(np.float64)
                       - corpora["bf16"].astype(np.float64))
            line += (f"   |d| vs bf16: mean {d.mean():.2f} "
                     f"p99 {np.percentile(d, 99):.0f} max {d.max():.0f}")
        print(line)


if __name__ == "__main__":
    main(sys.argv[1:])
