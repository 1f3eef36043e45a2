"""Persistent text-to-image serving CLI (beyond reference).

The reference's sampler (run_ldm_sampler.py) pays model load + compile on
every invocation.  For serving, that cost must be paid ONCE: this CLI
loads the checkpoints, jits the full pipeline (text encode -> DDIM scan ->
AE decode, one XLA program), then answers requests from stdin until EOF —
the TPU-native "model server" loop.

Protocol: one JSON object per line on stdin; one JSON response per line on
stdout (logs go to stderr so stdout stays machine-readable).

  request:  {"prompt": "a cat" | ["p1", ...], "negative_prompt": "",
             "seed": 0,
             "guidance_scale": 5.0, "out": "name"}
  response: {"ok": true, "out": "<dir>/name.npy", "latency_s": 1.23,
             "shape": [B, H, W, 3]}
  errors:   {"ok": false, "error": "..."}

`prompt` may be one string (tiled over the batch) or `latent_shape[0]`
strings (per-example prompts in one CFG batch).  `guidance_scale` is a
traced scalar — changing it does NOT recompile.  Batch shape and DDIM step
count are compile-time constants from the YAML (static shapes keep XLA's
single compiled program; vary them per-config, not per-request).
"""

from __future__ import annotations

import itertools
import json
import sys
import time

import numpy as np
from absl import app, flags

from ldm_tf2_tpu.cli._flags import define_string

define_string("config_path", None, "Path to yaml config file.")
define_string("output_dir", ".", "Directory for generated .npy images.")

FLAGS = flags.FLAGS


def build_server(config):
    """Returns (handle_request, warmup): a request handler closure over one
    jitted pipeline, and a warmup compile trigger."""
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.cli.run_ldm_sampler import tensor_to_image
    from ldm_tf2_tpu.data.tokenizer import cfg_token_ids, load_tokenizer
    from ldm_tf2_tpu.diffusion.sampler import (
        ddim_sample_loop,
        ddim_sample_loop_deepcache,
        ddpm_sample_loop,
    )
    from ldm_tf2_tpu.diffusion.solvers import (
        dpm_solver_pp_2m_sample_loop,
        plms_sample_loop,
    )
    from ldm_tf2_tpu.models import AutoencoderKL, AutoencoderVQ
    from ldm_tf2_tpu.parallel import create_mesh, replicate, shard_batch

    factory.apply_tpu_settings(config)
    sampling = config["ldm_sampling"]
    ae_type = sampling["autoencoder_type"]
    shape = tuple(sampling["latent_shape"])
    max_seq_len = config["cond_stage_model"]["max_seq_len"]
    scale_factor = config["ldm"]["scale_factor"]

    cond_model = factory.build_cond_model(config)
    unet = factory.build_unet(config)
    autoencoder = factory.build_autoencoder(config, ae_type)
    schedule = factory.build_schedule(config)

    print("[serve] restoring pretrained checkpoints...", file=sys.stderr)
    params = factory.cast_inference_params(
        config,
        (
            load_params(config["pre_ckpt_paths"]["cond_stage_model"]),
            load_params(config["pre_ckpt_paths"]["unet"]),
            load_params(config["pre_ckpt_paths"]["autoencoder"]),
        ),
    )
    tokenizer = load_tokenizer(sampling["vocab_dir"])

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

    # ldm_sampling.cache_interval > 1: serve with DeepCache acceleration
    cache_interval = int(sampling.get("cache_interval", 1))
    cache_levels = int(sampling.get("cache_levels", 1))

    # same sampler selection (and validation) as run_ldm_sampler, so one
    # YAML produces the same samples through either CLI
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
    if cache_interval > 1 and sampler_name != "ddim":
        raise ValueError(
            "ldm_sampling.cache_interval > 1 requires sampler: ddim, got "
            f"{sampler_name!r}"
        )
    sample_loop = sample_loops[sampler_name]

    if config["tpu"]["quantize"] == "int8":
        from ldm_tf2_tpu.ops.quant_conv import set_conv_quant

        print("[serve] W8A8 int8 U-Net convs (tpu.quantize: int8)",
              file=sys.stderr)
        set_conv_quant("int8")
    if config["tpu"]["quantize_attention"] == "int8pv":
        from ldm_tf2_tpu.ops.flash_attention import set_flash_pv_int8

        print("[serve] int8 PV flash attention "
              "(tpu.quantize_attention: int8pv)", file=sys.stderr)
        set_flash_pv_int8(True)

    def pipeline(params, token_ids, key, guidance_scale):
        cond_p, unet_p, ae_p = params
        context = cond_model.apply({"params": cond_p}, token_ids)
        if cache_interval > 1:
            x0 = ddim_sample_loop_deepcache(
                lambda x, t, c: unet.apply(
                    {"params": unet_p}, x, t, c,
                    return_cache=True, cache_levels=cache_levels,
                ),
                lambda x, t, c, cache: unet.apply(
                    {"params": unet_p}, x, t, c,
                    shallow_cache=cache, cache_levels=cache_levels,
                ),
                schedule, context, shape, key, guidance_scale,
                cache_interval=cache_interval,
            )
        else:
            eps_model = lambda x, t, c: unet.apply(
                {"params": unet_p}, x, t, c
            )
            x0 = sample_loop(
                eps_model, schedule, context, shape, key, guidance_scale
            )
        return decode(ae_p, x0)

    mesh = create_mesh(config["tpu"]["mesh"])
    sp_on = bool(config["tpu"]["sequence_parallel"])
    if sp_on:
        # same Ulysses dispatch as run_ldm_sampler — the server must not
        # silently waste the mesh's model axis
        from ldm_tf2_tpu.ops.attention import enable_sequence_parallel

        print("[serve] Ulysses sequence-parallel attention over 'model' "
              f"axis (size {mesh.shape['model']})", file=sys.stderr)
        enable_sequence_parallel(mesh)
        params = replicate(params, mesh)
    n_data = mesh.shape["data"]
    data_parallel = shape[0] % n_data == 0
    if data_parallel and not sp_on:
        print(f"[serve] data-parallel over mesh {mesh}", file=sys.stderr)
        params = replicate(params, mesh)
    elif not sp_on:
        # place the weight tree on device ONCE — otherwise every request
        # re-transfers the ~GB params host-to-device through jit
        params = jax.device_put(params)
    jitted = jax.jit(pipeline)

    def run(prompt, seed, guidance_scale, negative_prompt=""):
        token_ids = jnp.asarray(
            cfg_token_ids(
                tokenizer, prompt, shape[0], max_seq_len,
                negative_prompt=negative_prompt,
            )
        )
        if data_parallel:
            token_ids = shard_batch(token_ids, mesh)
        out = jitted(
            params,
            token_ids,
            jax.random.PRNGKey(int(seed)),
            jnp.float32(guidance_scale),
        )
        return tensor_to_image(np.asarray(out))

    request_seq = itertools.count()

    def handle_request(req: dict, output_dir: str) -> dict:
        t0 = time.perf_counter()
        prompt = req.get("prompt", sampling["text_prompt"])
        images = run(
            prompt,
            req.get("seed", 0),
            req.get("guidance_scale", sampling["guidance_scale"]),
            negative_prompt=req.get(
                "negative_prompt", sampling.get("negative_prompt", "")
            ),
        )
        # default name: wall time + per-process counter (perf_counter has
        # an arbitrary epoch and same-second requests would overwrite)
        default = f"images_{int(time.time())}_{next(request_seq)}"
        name = str(req.get("out", default)).replace("/", "_")
        path = f"{output_dir}/{name}.npy"
        np.save(path, images)
        return {
            "ok": True,
            "out": path,
            "latency_s": round(time.perf_counter() - t0, 4),
            "shape": list(images.shape),
        }

    def warmup():
        t0 = time.perf_counter()
        run(sampling["text_prompt"], 0, sampling["guidance_scale"])
        print(
            f"[serve] compiled + warm in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    return handle_request, warmup


def serve(config, input_stream, output_stream, output_dir: str = "."):
    """The request loop, separated from main() so tests can drive it with
    in-memory streams."""
    handle_request, warmup = build_server(config)
    warmup()
    print("[serve] ready", file=sys.stderr)
    for line in input_stream:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if req == "exit" or req.get("cmd") == "exit":
                break
            resp = handle_request(req, output_dir)
        except Exception as e:  # serve loop must survive bad requests
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        output_stream.write(json.dumps(resp) + "\n")
        output_stream.flush()


def main(_):
    from ldm_tf2_tpu.configs import load_config
    from ldm_tf2_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    config = load_config(FLAGS.config_path)
    serve(config, sys.stdin, sys.stdout, FLAGS.output_dir)


if __name__ == "__main__":
    flags.mark_flag_as_required("config_path")
    app.run(main)
