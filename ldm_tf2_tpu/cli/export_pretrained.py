"""Export pretrained sampling artifacts from an LDM training checkpoint.

Pulls the U-Net weights — EMA weights when the run was trained with
``ldm_training.ema_decay`` (the standard weights for diffusion sampling),
live weights otherwise — out of the newest train-state checkpoint under
``ldm_training.ckpt_path`` and saves them in the 3-artifact
``pre_ckpt_paths`` format the sampler CLI consumes (the reference's
equivalent flow re-points `unet` at the `ddpm-N` training checkpoint,
run_ldm_sampler.py:70-75 + README).

  python -m ldm_tf2_tpu.cli.export_pretrained \
      --config_path config.yaml --out_dir exported [--use_ema=false]
  python -m ldm_tf2_tpu.cli.export_pretrained \
      --config_path config.yaml --which autoencoder --out_dir exported
"""

from __future__ import annotations

import os

from absl import app, flags

from ldm_tf2_tpu.cli._flags import define_bool, define_string

define_string("config_path", None, "Path to yaml config file.")
define_string("out_dir", "exported", "Output directory for the artifacts.")
define_string(
    "which", "ldm",
    "What to export: ldm (unet + cond model from the training ckpt), "
    "autoencoder (from the AE training ckpt), or serving (re-save the "
    "three existing pre_ckpt_paths artifacts — with --dtype bfloat16 "
    "this produces half-size serving artifacts that restore ~2x faster).",
)
define_bool(
    "use_ema", True,
    "Prefer EMA weights when present in the checkpoint (recommended).",
)
define_string(
    "dtype", "",
    "Optional export cast: '' keeps checkpoint dtypes; 'bfloat16' casts "
    "float32 leaves on save.  A bf16 artifact halves the restore bytes "
    "and samples IDENTICALLY to loading f32 + tpu.weights_dtype: "
    "bfloat16 (same rounding, applied once at export instead of every "
    "load).",
)

FLAGS = flags.FLAGS


def _restore_latest(ckpt_dir: str):
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {ckpt_dir}")
    # Restore without a target tree: we only need a few subtrees and the
    # checkpoint's own structure/dtypes are authoritative here.
    state = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    print(f"[INFO] Restored training checkpoint at step {step}.")
    return state


def _cast_tree(params):
    """Apply --dtype to a host-numpy param tree (f32 leaves only)."""
    import jax
    import numpy as np

    if not FLAGS.dtype:
        return params
    if FLAGS.dtype not in ("bfloat16", "float32"):
        raise SystemExit(f"--dtype must be ''|bfloat16|float32, "
                         f"got {FLAGS.dtype!r}")
    import ml_dtypes

    dtype = (ml_dtypes.bfloat16 if FLAGS.dtype == "bfloat16"
             else np.float32)
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if np.asarray(a).dtype == np.float32 else a,
        params,
    )


def main(_):
    import jax
    import numpy as np

    from ldm_tf2_tpu.checkpoints.manager import save_params
    from ldm_tf2_tpu.configs import load_config

    config = load_config(FLAGS.config_path)

    if FLAGS.which == "serving":
        from ldm_tf2_tpu.checkpoints.manager import load_params

        os.makedirs(FLAGS.out_dir, exist_ok=True)
        for key, name in (("cond_stage_model", "transformer-1"),
                          ("unet", "unet-1"),
                          ("autoencoder", "autoencoder-1")):
            params = load_params(config["pre_ckpt_paths"][key])
            out = os.path.join(FLAGS.out_dir, name)
            print(f"[INFO] Saving {out} (dtype={FLAGS.dtype or 'as-is'})...")
            save_params(
                out, _cast_tree(jax.tree.map(np.asarray, params)),
                overwrite=True,
            )
        print("[INFO] Done. Point pre_ckpt_paths at these artifacts.")
        return

    if FLAGS.which == "autoencoder":
        state = _restore_latest(config["autoencoder_training"]["ckpt_path"])
        out = os.path.join(FLAGS.out_dir, "autoencoder-1")
        os.makedirs(FLAGS.out_dir, exist_ok=True)
        print(f"[INFO] Saving {out} ...")
        save_params(
            out, _cast_tree(jax.tree.map(np.asarray, state["ae_params"])),
            overwrite=True,
        )
        print("[INFO] Done. Point pre_ckpt_paths.autoencoder at this "
              "artifact.")
        return
    if FLAGS.which != "ldm":
        raise SystemExit(
            f"--which must be ldm|autoencoder|serving, got {FLAGS.which}"
        )

    state = _restore_latest(config["ldm_training"]["ckpt_path"])

    ema = state.get("ema_params") if isinstance(state, dict) else None
    if FLAGS.use_ema and ema is not None:
        print("[INFO] Exporting EMA weights.")
        unet_params = ema["unet"]
        cond_params = ema.get("cond", state["cond_params"])
    else:
        if FLAGS.use_ema:
            print("[INFO] No EMA in checkpoint; exporting live weights.")
        unet_params = state["unet_params"]
        cond_params = state["cond_params"]

    os.makedirs(FLAGS.out_dir, exist_ok=True)
    for name, params in (("unet-1", unet_params),
                         ("transformer-1", cond_params)):
        out = os.path.join(FLAGS.out_dir, name)
        print(f"[INFO] Saving {out} ...")
        # materialize to host numpy: strips the training run's mesh
        # sharding so the artifact loads on any topology
        save_params(out, _cast_tree(jax.tree.map(np.asarray, params)),
                    overwrite=True)
    print(
        "[INFO] Done. Point pre_ckpt_paths.unet / .cond_stage_model at these "
        "artifacts (the autoencoder artifact is unchanged by LDM training)."
    )


if __name__ == "__main__":
    flags.mark_flag_as_required("config_path")
    app.run(main)
