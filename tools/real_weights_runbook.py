"""One-command real-weights drop-in runbook (VERDICT r3 next #7).

Chains the full reference README workflow (README.md:33-45, :85-188) for
the day the real artifacts land on this host:

  1. validate  — `convert_ckpt_pytorch_to_jax --validate_only` diffs the
                 checkpoint's keys/shapes against the committed CompVis
                 key manifest (go/no-go without converting);
  2. convert   — full PyTorch -> Orbax conversion into the 3-artifact
                 split (transformer-1 / unet-1 / autoencoder-1) with
                 structural verification + checksum manifest;
  3. lpips     — optional `lpips.ckpt-1` TF -> JAX conversion
                 (tools/convert_lpips_tf_to_jax.py), needed for AE
                 training and VGG-FID;
  4. sample    — txt2img prompt grid through run_ldm_sampler at the
                 production 256^2 / 50-step / CFG-5 config;
  5. eval      — optional Inception-pool3 FID via run_eval when
                 --inception_weights_path and a reference image dir are
                 supplied.

Every stage is artifact-gated: when an input is missing the runbook
prints exactly what to download and where to put it, and exits 0 without
doing anything destructive — so the script is safe to run speculatively
and becomes the single entry point the moment weights appear.

Usage (all paths optional — defaults probe ./artifacts):
  python tools/real_weights_runbook.py \
      --pytorch_ckpt artifacts/txt2img-f8-large.ckpt \
      --lpips_tf_ckpt artifacts/lpips.ckpt-1 \
      --inception_weights artifacts/pt_inception-2015-12-05.pth \
      --real_images /data/coco_val_images.npy \
      --workdir /tmp/real_weights \
      --prompt "a virus monster is playing guitar, oil on canvas"
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOWNLOAD_HELP = {
    "pytorch_ckpt": (
        "CompVis txt2img-f8-large checkpoint (~5.7 GB):\n"
        "    wget -O artifacts/txt2img-f8-large.ckpt https://ommer-lab.com/"
        "files/latent-diffusion/nitro/txt2img-f8-large/model.ckpt\n"
        "  (reference README.md:33-45)"
    ),
    "lpips_tf_ckpt": (
        "LPIPS VGG16 weights `lpips.ckpt-1` (the reference distributes "
        "them out-of-band,\n  reference README.md:118-121); place the "
        "checkpoint prefix files under artifacts/."
    ),
    "inception_weights": (
        "pytorch-fid Inception weights for literature-comparable FID:\n"
        "    wget -O artifacts/pt_inception-2015-12-05.pth https://github."
        "com/mseitzer/pytorch-fid/releases/download/fid_weights/"
        "pt_inception-2015-12-05-6726825d.pth"
    ),
}


def run(cmd: list[str], cwd: str = REPO) -> None:
    print(f"\n$ {' '.join(shlex.quote(c) for c in cmd)}", flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(cmd, check=True, cwd=cwd, env=env)


def gate(path: str | None, what: str) -> bool:
    """True when the artifact exists; otherwise print the download
    instructions and return False."""
    if path and (os.path.exists(path) or os.path.exists(path + ".index")):
        return True
    print(f"\n[GATED] {what}: artifact not found"
          + (f" at {path!r}" if path else " (no path given)"))
    print("  To obtain it:\n  " + DOWNLOAD_HELP[what.split()[0]])
    return False


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--pytorch_ckpt",
                   default=os.path.join(REPO, "artifacts",
                                        "txt2img-f8-large.ckpt"))
    p.add_argument("--lpips_tf_ckpt",
                   default=os.path.join(REPO, "artifacts", "lpips.ckpt-1"))
    p.add_argument("--inception_weights",
                   default=os.path.join(
                       REPO, "artifacts", "pt_inception-2015-12-05.pth"))
    p.add_argument("--real_images", default="",
                   help=".npy stack (or dir of stacks) of real images for "
                        "the FID stage (run_eval --real format).")
    p.add_argument("--workdir", default="/tmp/real_weights")
    p.add_argument("--config_path",
                   default=os.path.join(
                       REPO, "ldm_tf2_tpu", "configs",
                       "all_in_one_config.yaml"))
    p.add_argument("--prompt",
                   default="a virus monster is playing guitar, oil on canvas")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--skip_sample", action="store_true")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    py = sys.executable

    # ---- stage 1+2: validate, then convert ----
    if not gate(args.pytorch_ckpt, "pytorch_ckpt (txt2img-f8-large)"):
        print("\nNothing converted; re-run once the checkpoint exists.")
        return 0
    run([py, "-m", "ldm_tf2_tpu.cli.convert_ckpt_pytorch_to_jax",
         "--pytorch_ckpt_path", args.pytorch_ckpt,
         "--config_path", args.config_path,
         "--validate_only"])
    artifacts_dir = os.path.join(args.workdir, "converted")
    run([py, "-m", "ldm_tf2_tpu.cli.convert_ckpt_pytorch_to_jax",
         "--pytorch_ckpt_path", args.pytorch_ckpt,
         "--config_path", args.config_path,
         "--out_dir", artifacts_dir])

    # ---- stage 3: LPIPS (optional — only gates AE training / VGG-FID) ----
    lpips_out = os.path.join(args.workdir, "lpips-1")
    if gate(args.lpips_tf_ckpt, "lpips_tf_ckpt (lpips.ckpt-1)"):
        run([py, os.path.join(REPO, "tools", "convert_lpips_tf_to_jax.py"),
             "--tf_ckpt", args.lpips_tf_ckpt, "--out_dir", lpips_out])

    # ---- stage 4: sample a prompt grid with the real weights ----
    if not args.skip_sample:
        import yaml

        with open(args.config_path) as f:
            config = yaml.safe_load(f)
        config["pre_ckpt_paths"] = {
            "cond_stage_model": os.path.join(artifacts_dir, "transformer-1"),
            "unet": os.path.join(artifacts_dir, "unet-1"),
            "autoencoder": os.path.join(artifacts_dir, "autoencoder-1"),
        }
        config["ldm_sampling"]["prompt"] = args.prompt
        config["ldm_sampling"]["batch_size"] = args.batch_size
        sample_config = os.path.join(args.workdir, "sample_config.yaml")
        with open(sample_config, "w") as f:
            yaml.safe_dump(config, f)
        run([py, "-m", "ldm_tf2_tpu.cli.run_ldm_sampler",
             "--config_path", sample_config], cwd=args.workdir)
        print(f"\n[OK] samples written under {args.workdir} (images.npy)")

    # ---- stage 5: literature FID (optional) ----
    if args.real_images and gate(
        args.inception_weights, "inception_weights (pt_inception)"
    ):
        run([py, "-m", "ldm_tf2_tpu.cli.run_eval",
             "--extractor", "inception",
             "--inception_weights_path", args.inception_weights,
             "--real", args.real_images,
             "--generated", os.path.join(args.workdir, "images.npy")])
    else:
        print("\n[GATED] FID stage skipped (needs --real_images and "
              "Inception weights).")

    print("\nRunbook complete.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
