"""Sample-quality evaluation CLI: FID (and optional CLIP score).

The reference proves sample quality only qualitatively (README.md:156-188
sample grids); this CLI closes the loop quantitatively:

  python -m ldm_tf2_tpu.cli.run_eval \\
      --generated images.npy --real real_images.npy \\
      --lpips_ckpt_path lpips.ckpt-jax \\
      [--clip_weights_path <dir> --prompts_path prompts.txt]

Inputs are .npy image stacks ([N, H, W, 3], uint8 or float in [-1, 1])
or directories of .npy stacks (concatenated).  `--extractor vgg`
(default) uses the LPIPS checkpoint's VGG16 trunk — a perceptual
"VGG-FID" that is always available offline but NOT comparable to
published numbers; `--extractor inception --inception_weights_path
<pth>` computes the paper-standard InceptionV3 pool3 FID
(eval/inception.py).  Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
from absl import app, flags

from ldm_tf2_tpu.cli._flags import define_string

define_string("generated", None, ".npy stack (or dir of stacks) of generated images.")
define_string("real", None, ".npy stack (or dir of stacks) of real images.")
define_string("lpips_ckpt_path", None,
              "LPIPS checkpoint (converted, orbax) for the VGG trunk.")
define_string("clip_weights_path", None,
              "Optional local transformers-format CLIP dir for CLIP score.")
define_string("prompts_path", None,
              "Optional text file, one prompt per line (for CLIP score).")
define_string("extractor", "vgg",
              "Feature extractor: 'vgg' (always available, LPIPS-trunk "
              "VGG-FID — NOT comparable to published numbers) or "
              "'inception' (the paper-standard InceptionV3 pool3 FID; "
              "needs --inception_weights_path).")
define_string("inception_weights_path", None,
              "Local torchvision inception_v3 / pytorch-fid state_dict "
              "(.pth) for --extractor inception.")

FLAGS = flags.FLAGS


def _as_batch(arr: np.ndarray, src: str) -> np.ndarray:
    """Promote one loaded array to [N, H, W, 3]."""
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"{src}: expected [N, H, W, 3], got {arr.shape}")
    return arr


def load_images(path: str) -> np.ndarray:
    """[N, H, W, 3] float32 in [-1, 1] from a .npy stack or a directory."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.npy")))
        if not files:
            raise ValueError(f"no .npy files under {path}")
        # promote each file BEFORE concatenating: a directory of
        # single-image [H, W, 3] files would otherwise concatenate along
        # H into one corrupt mega-image that still passes the 4-D check
        stack = np.concatenate(
            [_as_batch(np.load(f), f) for f in files], axis=0
        )
    else:
        stack = _as_batch(np.load(path), path)
    if stack.dtype == np.uint8:
        stack = stack.astype(np.float32) / 127.5 - 1.0
    return np.asarray(stack, np.float32)


def main(_):
    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.configs.loader import _TPU_DEFAULTS
    from ldm_tf2_tpu.eval import (
        clip_score,
        fid_from_features,
        vgg_feature_extractor,
    )
    from ldm_tf2_tpu.factory import enable_compile_cache

    # no YAML here (pure flag-driven eval) — use the default cache dir so
    # repeat evals skip the extractor compile
    enable_compile_cache(_TPU_DEFAULTS["compile_cache_dir"])

    if FLAGS.clip_weights_path and not FLAGS.prompts_path:
        # validate BEFORE the (expensive) FID pass: failing at the CLIP
        # block after feature extraction would lose the whole eval
        raise ValueError("--clip_weights_path requires --prompts_path")
    if FLAGS.extractor not in ("vgg", "inception"):
        raise ValueError(
            f"--extractor must be vgg|inception, got {FLAGS.extractor!r}"
        )

    generated = load_images(FLAGS.generated)
    real = load_images(FLAGS.real)
    if generated.shape[1:] != real.shape[1:]:
        raise ValueError(
            f"shape mismatch: generated {generated.shape[1:]} vs real "
            f"{real.shape[1:]}"
        )

    if FLAGS.extractor == "vgg" and not FLAGS.lpips_ckpt_path:
        raise ValueError("--extractor vgg requires --lpips_ckpt_path")
    if FLAGS.extractor == "inception":
        from ldm_tf2_tpu.eval.inception import inception_feature_extractor

        # raises with download instructions when the weights are absent
        features = inception_feature_extractor(FLAGS.inception_weights_path)
    else:
        lpips_params = load_params(FLAGS.lpips_ckpt_path)
        features = vgg_feature_extractor(lpips_params)
    fid = fid_from_features(features(real), features(generated))

    result = {
        "metric": "vgg_fid" if FLAGS.extractor == "vgg" else "inception_fid",
        "fid": round(fid, 6),
        "num_generated": int(generated.shape[0]),
        "num_real": int(real.shape[0]),
    }
    if FLAGS.clip_weights_path:
        with open(FLAGS.prompts_path) as f:
            prompts = [line.strip() for line in f if line.strip()]
        result["clip_score"] = round(
            clip_score(
                (generated + 1.0) * 127.5,
                prompts,
                clip_weights_path=FLAGS.clip_weights_path,
            ),
            6,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    flags.mark_flag_as_required("generated")
    flags.mark_flag_as_required("real")
    app.run(main)
