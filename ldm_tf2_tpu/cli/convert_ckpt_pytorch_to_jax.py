"""PyTorch (CompVis txt2img-f8-large) -> JAX/Orbax checkpoint conversion CLI.

Counterpart of /root/reference/convert_ckpt_pytorch_to_tf2.py.  Emits the
same three artifacts (transformer / unet / autoencoder, the
`pre_ckpt_paths` contract) as Orbax param trees, with per-tensor checksums
written to a manifest for verification (SURVEY.md §3.4's recommended
verification pass).

  python -m ldm_tf2_tpu.cli.convert_ckpt_pytorch_to_jax \
      --pytorch_ckpt_path model.ckpt --config_path config.yaml --out_dir .
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
from absl import app, flags

flags.DEFINE_string("pytorch_ckpt_path", None, "Path to pytorch ckpt.")
flags.DEFINE_string("config_path", None, "Path to yaml config file.")
flags.DEFINE_string("out_dir", ".", "Output directory for artifacts.")
flags.DEFINE_bool(
    "verify", True, "Init models and verify structural coverage before saving."
)
flags.DEFINE_bool(
    "validate_only", False,
    "Diff the state_dict's keys/shapes against the committed CompVis key "
    "manifest and print a go/no-go verdict WITHOUT converting or saving — "
    "the one-command rehearsal for the day the real txt2img-f8-large "
    "checkpoint is available (exit 0 = go).",
)
flags.DEFINE_string(
    "key_manifest_path", "",
    "Key manifest for --validate_only (default: the committed "
    "tests/goldens/compvis_key_manifest.json).",
)

FLAGS = flags.FLAGS


def default_manifest_path() -> str:
    import ldm_tf2_tpu

    return os.path.join(
        os.path.dirname(os.path.dirname(ldm_tf2_tpu.__file__)),
        "tests", "goldens", "compvis_key_manifest.json",
    )


def validate_state_dict(sd, manifest: dict):
    """Diff `sd` (mapping key -> array-like with .shape) against the key
    manifest produced by tools/crosscheck_converter.py.

    Returns (ok, report_lines): ok is True when every model key the
    reference converter reads (convert_ckpt_pytorch_to_tf2.py:23-372) is
    present at the expected shape.  Keys the converter ignores (schedule
    buffers, LitEma shadows) and unknown extras are reported but do not
    block — the conversion never reads them.
    """
    expected = manifest["model_keys"]
    ignored = set(manifest["ignored_keys"])
    lines = []

    def shape_of(v):
        return list(getattr(v, "shape", np.shape(v)))

    missing = sorted(k for k in expected if k not in sd)
    mismatched = sorted(
        k for k in expected
        if k in sd and shape_of(sd[k]) != list(expected[k])
    )
    extra = sorted(k for k in sd if k not in expected and k not in ignored)

    for k in missing:
        lines.append(f"MISSING  {k}  expected shape {expected[k]}")
    for k in mismatched:
        lines.append(
            f"SHAPE    {k}  expected {expected[k]}, "
            f"got {shape_of(sd[k])}"
        )
    for k in extra:
        lines.append(f"EXTRA    {k}  (unknown key; conversion ignores it)")

    ok = not missing and not mismatched
    lines.append(
        f"{len(expected) - len(missing) - len(mismatched)}/{len(expected)} "
        f"model keys match; {len(missing)} missing, {len(mismatched)} "
        f"shape mismatches, {len(extra)} unknown extras"
    )
    lines.append("GO: state_dict matches the CompVis manifest — run the "
                 "conversion" if ok else
                 "NO-GO: state_dict does not match the CompVis manifest")
    return ok, lines


def get_state_dict(path: str):
    """torch.load -> {key: np.ndarray} (convert_ckpt:16-20)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _checksum_manifest(params) -> dict:
    import jax

    manifest = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(k.key) for k in path)
        arr = np.asarray(leaf)
        manifest[name] = {
            "shape": list(arr.shape),
            "dtype": str(arr.dtype),
            "sha256": hashlib.sha256(arr.tobytes()).hexdigest()[:16],
            "sum": float(arr.sum()),
        }
    return manifest


def main(_):
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.convert_pytorch import (
        convert_autoencoder_kl,
        convert_autoencoder_vq,
        convert_transformer,
        convert_unet,
    )
    from ldm_tf2_tpu.checkpoints.manager import save_params
    from ldm_tf2_tpu.configs import load_config

    if FLAGS.validate_only:
        sd = get_state_dict(FLAGS.pytorch_ckpt_path)
        print(f"[INFO] Loaded state_dict with {len(sd)} tensors.")
        manifest_path = FLAGS.key_manifest_path or default_manifest_path()
        with open(manifest_path) as f:
            manifest = json.load(f)
        ok, lines = validate_state_dict(sd, manifest)
        for line in lines:
            print(f"[VALIDATE] {line}")
        raise SystemExit(0 if ok else 1)

    config = load_config(FLAGS.config_path)
    sd = get_state_dict(FLAGS.pytorch_ckpt_path)
    print(f"[INFO] Loaded state_dict with {len(sd)} tensors.")

    cond_cfg = config["cond_stage_model"]
    unet_cfg = config["unet"]
    ae_type = config["ldm_sampling"]["autoencoder_type"]

    refs = {"transformer": None, "unet": None, "autoencoder": None}
    if FLAGS.verify:
        print("[INFO] Initializing models for structural verification...")
        key = jax.random.PRNGKey(0)
        cond_model = factory.build_cond_model(config, dtype=jnp.float32)
        refs["transformer"] = cond_model.init(
            key, jnp.zeros((1, cond_cfg["max_seq_len"]), jnp.int32)
        )["params"]
        unet = factory.build_unet(config, dtype=jnp.float32)
        refs["unet"] = unet.init(
            key,
            jnp.zeros((1, 32, 32, unet_cfg["out_channels"])),
            jnp.zeros((1,)),
            jnp.zeros((1, 1, cond_cfg["hidden_size"])),
        )["params"]
        autoencoder = factory.build_autoencoder(config, ae_type,
                                                dtype=jnp.float32)
        if ae_type == "kl":
            refs["autoencoder"] = autoencoder.init(
                {"params": key, "sample": key}, jnp.zeros((1, 256, 256, 3))
            )["params"]
        else:
            refs["autoencoder"] = autoencoder.init(
                key, jnp.zeros((1, 256, 256, 3))
            )["params"]

    print("[INFO] Converting transformer...")
    transformer_params = convert_transformer(
        sd,
        num_layers=cond_cfg["encoder_stack_size"],
        num_heads=cond_cfg["num_heads"],
        reference_params=refs["transformer"],
    )
    print("[INFO] Converting unet...")
    unet_params = convert_unet(
        sd,
        num_blocks=unet_cfg["num_blocks"],
        channel_mult=tuple(unet_cfg["channel_mult"]),
        num_heads=unet_cfg["num_heads"],
        reference_params=refs["unet"],
    )
    print(f"[INFO] Converting autoencoder ({ae_type})...")
    ae_cfg = config["autoencoder_kl" if ae_type == "kl" else "autoencoder_vq"]
    convert_ae = (
        convert_autoencoder_kl if ae_type == "kl" else convert_autoencoder_vq
    )
    ae_params = convert_ae(
        sd,
        num_blocks=ae_cfg["num_blocks"],
        multipliers=tuple(ae_cfg["multipliers"]),
        reference_params=refs["autoencoder"],
    )

    artifacts = {
        config["pre_ckpt_paths"]["cond_stage_model"]: transformer_params,
        config["pre_ckpt_paths"]["unet"]: unet_params,
        config["pre_ckpt_paths"]["autoencoder"]: ae_params,
    }
    manifest = {}
    for name, params in artifacts.items():
        out = os.path.join(FLAGS.out_dir, name)
        print(f"[INFO] Saving {out} ...")
        save_params(out, params)
        manifest[name] = _checksum_manifest(params)

    manifest_path = os.path.join(FLAGS.out_dir, "conversion_manifest.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"[INFO] Wrote per-tensor checksum manifest to {manifest_path}")


if __name__ == "__main__":
    flags.mark_flag_as_required("pytorch_ckpt_path")
    flags.mark_flag_as_required("config_path")
    app.run(main)
