"""Text-to-image sampling CLI.

Counterpart of /root/reference/run_ldm_sampler.py: one YAML in, images.npy
out.  The whole pipeline — text-transformer context, S-step DDIM scan with
CFG, autoencoder decode — is one jitted program on the TPU (the reference
runs tokenizer and decode on host/eager, model_runners.py:474-509).

Outputs:
  images.npy                       [B, 256, 256, 3] uint8
  sample_prog.npy / pred_x0_prog.npy  when ldm_sampling.sample_save_progress
  (per-image min-max normalized to uint8, run_ldm_sampler.py:18-25)
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

from ldm_tf2_tpu.cli._flags import define_integer, define_string

define_string("config_path", None, "Path to yaml config file.")
define_integer("seed", 0, "PRNG seed for sampling noise.")

FLAGS = flags.FLAGS


def tensor_to_image(x: np.ndarray) -> np.ndarray:
    """Per-image min-max normalize to uint8 (run_ldm_sampler.py:18-25)."""
    x = np.asarray(x, dtype=np.float32)
    flat = x.reshape(x.shape[0], -1)
    lo = flat.min(axis=1).reshape(-1, *([1] * (x.ndim - 1)))
    hi = flat.max(axis=1).reshape(-1, *([1] * (x.ndim - 1)))
    return ((x - lo) / (hi - lo) * 255).astype(np.uint8)


def main(_):
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.configs import load_config
    from ldm_tf2_tpu.data.tokenizer import cfg_token_ids, load_tokenizer
    from ldm_tf2_tpu.diffusion.sampler import (
        ddim_img2img_loop,
        ddim_sample_loop,
        ddim_sample_loop_deepcache,
        ddim_sample_loop_progressive,
        ddpm_sample_loop,
    )
    from ldm_tf2_tpu.diffusion.solvers import (
        dpm_solver_pp_2m_sample_loop,
        dpm_solver_pp_2m_sample_loop_deepcache,
        plms_sample_loop,
    )
    from ldm_tf2_tpu.models import AutoencoderKL, AutoencoderVQ
    from ldm_tf2_tpu.parallel import (
        create_mesh,
        maybe_initialize_distributed,
        replicate,
        shard_batch,
    )

    maybe_initialize_distributed()
    config = load_config(FLAGS.config_path)
    factory.apply_tpu_settings(config)
    sampling = config["ldm_sampling"]
    ae_type = sampling["autoencoder_type"]

    cond_model = factory.build_cond_model(config)
    unet = factory.build_unet(config)
    autoencoder = factory.build_autoencoder(config, ae_type)
    schedule = factory.build_schedule(config)
    scale_factor = config["ldm"]["scale_factor"]

    print("[INFO] Restoring pretrained checkpoints...")
    cond_params, unet_params, ae_params = factory.cast_inference_params(
        config,
        (
            load_params(config["pre_ckpt_paths"]["cond_stage_model"]),
            load_params(config["pre_ckpt_paths"]["unet"]),
            load_params(config["pre_ckpt_paths"]["autoencoder"]),
        ),
    )

    tokenizer = load_tokenizer(sampling["vocab_dir"])
    shape = tuple(sampling["latent_shape"])
    token_ids = jnp.asarray(
        cfg_token_ids(
            tokenizer,
            sampling["text_prompt"],
            shape[0],
            config["cond_stage_model"]["max_seq_len"],
            negative_prompt=sampling.get("negative_prompt", ""),
        )
    )
    guidance_scale = float(sampling["guidance_scale"])
    # Additive (diffusion/sampler.py apply_cfg): CFG rescale phi, Lin et
    # al. 2023 — corrects over-exposure at high guidance scales; 0.0 is
    # the exact reference CFG combine.
    guidance_rescale = float(sampling.get("guidance_rescale", 0.0))
    save_progress = bool(sampling.get("sample_save_progress", False))
    # Additive config key: the reference CLI only exposes DDIM
    # (model_runners.py:474); we add ancestral DDPM and the higher-order
    # PLMS / DPM-Solver++(2M) solvers (diffusion/solvers.py).
    sample_loops = {
        "ddim": ddim_sample_loop,
        "ddpm": ddpm_sample_loop,
        "plms": plms_sample_loop,
        "dpm_solver_pp_2m": dpm_solver_pp_2m_sample_loop,
    }
    sampler_name = sampling.get("sampler", "ddim")
    if sampler_name not in sample_loops:
        raise ValueError(
            f"ldm_sampling.sampler must be one of {sorted(sample_loops)}, "
            f"got {sampler_name!r}"
        )
    if save_progress and sampler_name != "ddim":
        raise ValueError(
            "ldm_sampling.sample_save_progress only supports sampler: ddim"
        )
    sample_loop = sample_loops[sampler_name]
    # DeepCache (additive, diffusion/sampler.py ddim_sample_loop_deepcache):
    # full U-Net every cache_interval steps, shallow-levels-only in between.
    cache_interval = int(sampling.get("cache_interval", 1))
    cache_levels = int(sampling.get("cache_levels", 1))
    if cache_interval > 1 and save_progress:
        raise ValueError(
            "ldm_sampling.cache_interval > 1 does not support "
            "sample_save_progress"
        )
    # img2img / inpainting (additive; diffusion/sampler.py
    # ddim_img2img_loop): init_image_path = .npy [B|1, H, W, 3] uint8;
    # mask_path = .npy [H, W] / [B, H, W] float (1 = regenerate, 0 = keep),
    # resized to the latent grid with nearest.
    init_image_path = sampling.get("init_image_path")
    mask_path = sampling.get("mask_path")
    strength = float(sampling.get("strength", 0.75))
    if init_image_path and (
        sampler_name != "ddim" or save_progress or cache_interval > 1
    ):
        raise ValueError(
            "ldm_sampling.init_image_path requires sampler: ddim without "
            "sample_save_progress or cache_interval"
        )
    if mask_path and not init_image_path:
        raise ValueError(
            "ldm_sampling.mask_path requires init_image_path"
        )

    def decode(ae_params, latents):
        latents = latents / scale_factor
        if ae_type == "kl":
            return autoencoder.apply(
                {"params": ae_params}, latents, method=AutoencoderKL.decode
            )
        return autoencoder.apply(
            {"params": ae_params},
            latents,
            force_quantize=True,
            method=AutoencoderVQ.decode,
        )

    def eps_model_of(unet_params):
        return lambda x, t, c: unet.apply({"params": unet_params}, x, t, c)

    if save_progress:

        def pipeline(params, token_ids, key):
            cond_p, unet_p, ae_p = params
            context = cond_model.apply({"params": cond_p}, token_ids)
            x0, sample_prog, pred_x0_prog = ddim_sample_loop_progressive(
                eps_model_of(unet_p),
                schedule,
                context,
                shape,
                key,
                guidance_scale,
                guidance_rescale=guidance_rescale,
            )
            num_records = sample_prog.shape[1]
            flat = lambda p: p.reshape(shape[0] * num_records, *shape[1:])
            unflat = lambda img: img.reshape(
                shape[0], num_records, *img.shape[1:]
            )
            return (
                decode(ae_p, x0),
                unflat(decode(ae_p, flat(sample_prog))),
                unflat(decode(ae_p, flat(pred_x0_prog))),
            )

    elif init_image_path:
        init_image = np.load(init_image_path)
        if init_image.ndim == 3:
            init_image = init_image[None]
        if init_image.dtype == np.uint8:
            init_image = init_image.astype(np.float32) / 127.5 - 1.0
        if init_image.shape[0] == 1 and shape[0] > 1:
            init_image = np.tile(init_image, (shape[0], 1, 1, 1))
        if init_image.shape[0] != shape[0]:
            raise ValueError(
                f"init image batch {init_image.shape[0]} != latent batch "
                f"{shape[0]}"
            )
        # the AE downsamples by 2^(levels-1); the encoded latent must land
        # exactly on ldm_sampling.latent_shape
        ae_key = "autoencoder_kl" if ae_type == "kl" else "autoencoder_vq"
        factor = 2 ** (len(config[ae_key]["multipliers"]) - 1)
        want_hw = (shape[1] * factor, shape[2] * factor)
        if init_image.shape[1:3] != want_hw:
            raise ValueError(
                f"init image is {init_image.shape[1:3]}, but latent_shape "
                f"{shape[1:3]} with the f{factor} autoencoder needs "
                f"{want_hw}"
            )
        init_image = jnp.asarray(init_image)
        mask = None
        if mask_path:
            m = np.load(mask_path).astype(np.float32)
            if m.ndim == 2:
                m = m[None]
            m = jax.image.resize(
                jnp.asarray(m), (m.shape[0], shape[1], shape[2]), "nearest"
            )[..., None]
            mask = m

        def pipeline(params, token_ids, key):
            cond_p, unet_p, ae_p = params
            context = cond_model.apply({"params": cond_p}, token_ids)
            key, enc_key = jax.random.split(key)
            if ae_type == "kl":
                posterior = autoencoder.apply(
                    {"params": ae_p}, init_image,
                    method=AutoencoderKL.encode,
                )
                init_latent = posterior.sample(enc_key)
            else:
                init_latent = autoencoder.apply(
                    {"params": ae_p}, init_image, only_encode=True,
                    method=AutoencoderVQ.encode,
                )
            init_latent = init_latent * scale_factor
            x0 = ddim_img2img_loop(
                eps_model_of(unet_p), schedule, context, init_latent, key,
                strength=strength, guidance_scale=guidance_scale, mask=mask,
                guidance_rescale=guidance_rescale,
            )
            return decode(ae_p, x0)

    elif cache_interval > 1:
        # DeepCache composes with DDIM and with DPM-Solver++(2M)
        # (diffusion/solvers.py dpm_solver_pp_2m_sample_loop_deepcache —
        # fewer U-Net evals x cheaper evals); loader validation rejects
        # other samplers.
        cache_loop = (
            ddim_sample_loop_deepcache
            if sampler_name == "ddim"
            else dpm_solver_pp_2m_sample_loop_deepcache
        )

        def pipeline(params, token_ids, key):
            cond_p, unet_p, ae_p = params
            context = cond_model.apply({"params": cond_p}, token_ids)
            eps_full = lambda x, t, c: unet.apply(
                {"params": unet_p}, x, t, c,
                return_cache=True, cache_levels=cache_levels,
            )
            eps_shallow = lambda x, t, c, cache: unet.apply(
                {"params": unet_p}, x, t, c,
                shallow_cache=cache, cache_levels=cache_levels,
            )
            x0 = cache_loop(
                eps_full, eps_shallow, schedule, context, shape, key,
                guidance_scale, cache_interval=cache_interval,
                guidance_rescale=guidance_rescale,
            )
            return decode(ae_p, x0)

    else:

        def pipeline(params, token_ids, key):
            cond_p, unet_p, ae_p = params
            context = cond_model.apply({"params": cond_p}, token_ids)
            x0 = sample_loop(
                eps_model_of(unet_p), schedule, context, shape, key,
                guidance_scale,
                guidance_rescale=guidance_rescale,
            )
            return decode(ae_p, x0)

    # Data-parallel sampling on the mesh (the reference is single-device):
    # params replicated, the CFG-doubled token batch sharded over `data`
    # whenever it divides evenly (the 2B token rows and B latent rows shard
    # consistently since both are multiples of B).
    params = (cond_params, unet_params, ae_params)
    mesh = create_mesh(config["tpu"]["mesh"])
    if config["tpu"]["quantize"] == "int8":
        from ldm_tf2_tpu.ops.quant_conv import set_conv_quant

        print("[INFO] W8A8 int8 U-Net convs (tpu.quantize: int8; "
              "per-example activation scales, per-channel weight scales).")
        set_conv_quant("int8")
    if config["tpu"]["quantize_attention"] == "int8pv":
        from ldm_tf2_tpu.ops.flash_attention import set_flash_pv_int8

        print("[INFO] int8 PV flash attention "
              "(tpu.quantize_attention: int8pv).")
        set_flash_pv_int8(True)
    params_placed = False
    if config["tpu"]["sequence_parallel"]:
        from ldm_tf2_tpu.ops.attention import enable_sequence_parallel

        print("[INFO] Ulysses sequence-parallel attention over 'model' "
              f"axis (size {mesh.shape['model']}).")
        enable_sequence_parallel(mesh)
        params = replicate(params, mesh)
        params_placed = True
    if config["tpu"]["tensor_parallel"]:
        from ldm_tf2_tpu.ops.tp import enable_tensor_parallel
        from ldm_tf2_tpu.parallel.sharding import shard_params_tp

        print("[INFO] Tensor-parallel params over 'model' axis "
              f"(size {mesh.shape.get('model', 1)}); Pallas kernels "
              "composed per-shard (ops/tp.py).")
        enable_tensor_parallel(mesh)
        params = tuple(shard_params_tp(p, mesh) for p in params)
        params_placed = True
    n_data = mesh.shape["data"]
    if shape[0] % n_data == 0:
        print(f"[INFO] Sampling data-parallel over mesh {mesh}.")
        if not params_placed:
            params = replicate(params, mesh)
        token_ids = shard_batch(token_ids, mesh)
    elif n_data > 1:
        if params_placed:
            # params are already mesh-placed (TP/SP-sharded or
            # replicated); only the batch sharding is skipped.  The TP
            # kernel-composition claims require batch % data == 0, so the
            # per-shard Pallas kernels decline and the unfused XLA math
            # (GSPMD-partitioned over the model axis) runs instead
            # (ADVICE r4 — the old message claimed single-device).
            print(
                f"[INFO] Batch {shape[0]} not divisible by data axis "
                f"{n_data}; batch stays unsharded (params remain "
                "mesh-placed; Pallas kernel composition disabled for "
                "this batch size)."
            )
        else:
            print(
                f"[INFO] Batch {shape[0]} not divisible by data axis "
                f"{n_data}; sampling on a single device."
            )
    key = jax.random.PRNGKey(FLAGS.seed)
    cache_note = (
        f", deepcache interval {cache_interval} (levels {cache_levels})"
        if cache_interval > 1
        else ""
    )
    if init_image_path:
        cache_note += (
            f", img2img strength {strength}"
            + (" + mask" if mask_path else "")
        )
    print(
        f"[INFO] Sampling: {sampler_name}, {schedule.num_ddim_steps} steps, "
        f"eta {schedule.eta}, guidance {guidance_scale}{cache_note}..."
    )
    out = jax.jit(pipeline)(params, token_ids, key)

    if save_progress:
        images, sample_prog, pred_x0_prog = jax.tree.map(np.asarray, out)
        print("[INFO] Saving generated images to 'images.npy'...")
        np.save("images.npy", tensor_to_image(images))
        print("[INFO] Saving progressive samples to 'sample_prog.npy'...")
        np.save("sample_prog.npy", tensor_to_image(sample_prog))
        print("[INFO] Saving progressive pred_x0 to 'pred_x0_prog.npy'...")
        np.save("pred_x0_prog.npy", tensor_to_image(pred_x0_prog))
    else:
        images = np.asarray(out)
        print("[INFO] Saving generated images to 'images.npy'...")
        np.save("images.npy", tensor_to_image(images))


if __name__ == "__main__":
    flags.mark_flag_as_required("config_path")
    app.run(main)
