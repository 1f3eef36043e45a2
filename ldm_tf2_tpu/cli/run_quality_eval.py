"""Sample-quality evaluation CLI: FID between a generated and a real set.

Beyond-reference capability (the reference's quality story is eyeballing
sample grids, README.md:156-188).  Feature extractor: the LPIPS
checkpoint's VGG16 trunk (always available offline — "VGG-FID"); plug an
Inception extractor into ldm_tf2_tpu.eval.fid_from_features for the
paper-standard number when pool3 weights are present locally.

  python -m ldm_tf2_tpu.cli.run_quality_eval \
      --config_path config.yaml \
      --real images_real.npy --generated images.npy

Inputs are [N,H,W,3] uint8 (0..255) or float (-1..1) .npy stacks, e.g. the
sampler CLI's images.npy output.
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

from ldm_tf2_tpu.cli._flags import define_string

define_string("config_path", None, "Path to yaml config file.")
define_string("real", None, "Path to the real image set (.npy [N,H,W,3]).")
define_string("generated", None,
              "Path to the generated image set (.npy [N,H,W,3]).")

FLAGS = flags.FLAGS


def _load_images(path: str) -> np.ndarray:
    # shared loader (handles dirs of stacks + single-image promotion too)
    from ldm_tf2_tpu.cli.run_eval import load_images

    return load_images(path)


def main(_):
    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.configs import load_config
    from ldm_tf2_tpu.eval import fid_from_features, vgg_feature_extractor

    config = load_config(FLAGS.config_path)
    factory.apply_tpu_settings(config)
    lpips_params = load_params(config["lpips_ckpt_path"])
    features = vgg_feature_extractor(lpips_params)

    real = _load_images(FLAGS.real)
    generated = _load_images(FLAGS.generated)
    print(f"[INFO] real {real.shape}, generated {generated.shape}")
    fid = fid_from_features(features(real), features(generated))
    print(f"[INFO] VGG-FID: {fid:.4f}")


if __name__ == "__main__":
    flags.mark_flag_as_required("config_path")
    flags.mark_flag_as_required("real")
    flags.mark_flag_as_required("generated")
    app.run(main)
