"""Int8-sampling quality eval on the framework-trained demo model.

Reuses the /tmp/ldm_demo workdir produced by tools/run_demo.py (trained
checkpoints + real.npy + the bf16 generated.npy) to answer: how much
does `tpu.quantize: int8` (ops/quant_conv.py) move sample quality?

  1. samples the same 4 prompts through the real sampler CLI with a
     config copy that sets tpu.quantize: int8 (seed 7, as the demo run)
  2. VGG-FID of the int8 samples vs the training slice (compare with the
     bf16 run's FID recorded in NEXT.md)
  3. per-pixel deltas between the int8 and bf16 sample stacks

  python tools/eval_int8_quality.py
"""

import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEMO = os.path.expanduser(
    os.environ.get("LDM_DEMO_DIR", "/tmp/ldm_demo"))
CFG_PATCHED = os.path.join(DEMO, "demo_config_patched.yaml")


def run(cmd, **kw):
    print(f"\n[int8-eval] $ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def main():
    prompts = [
        "a red circle", "a green square", "a blue triangle",
        "a yellow cross",
    ]
    gen_stack = []
    for prompt in prompts:
        with open(CFG_PATCHED) as f:
            raw = yaml.safe_load(f)
        raw["ldm_sampling"]["text_prompt"] = prompt
        raw.setdefault("tpu", {})["quantize"] = "int8"
        cfg_p = os.path.join(DEMO, "sample_cfg_int8.yaml")
        with open(cfg_p, "w") as f:
            yaml.safe_dump(raw, f)
        run([sys.executable, "-m", "ldm_tf2_tpu.cli.run_ldm_sampler",
             "--config_path", cfg_p, "--seed", "7"])
        gen_stack.append(np.load(os.path.join(REPO, "images.npy")))
    gen = np.concatenate(gen_stack, axis=0)
    np.save(os.path.join(DEMO, "generated_int8.npy"), gen)

    bf16 = np.load(os.path.join(DEMO, "generated.npy"))
    if bf16.shape == gen.shape:
        d = np.abs(gen.astype(np.float64) - bf16.astype(np.float64))
        print(f"[int8-eval] vs bf16 samples: mean |d| {d.mean():.4f}, "
              f"p99 {np.percentile(d, 99):.4f}, max {d.max():.4f} "
              f"(uint8 pixel units)")

    run([sys.executable, "-m", "ldm_tf2_tpu.cli.run_quality_eval",
         "--config_path", CFG_PATCHED,
         "--real", os.path.join(DEMO, "real.npy"),
         "--generated", os.path.join(DEMO, "generated_int8.npy")])


if __name__ == "__main__":
    main()
