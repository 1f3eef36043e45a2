"""Persistent text-to-image serving CLI (beyond reference).

The reference's sampler (run_ldm_sampler.py) pays model load + compile on
every invocation.  For serving, that cost must be paid ONCE: this CLI
loads the checkpoints, jits the full pipeline (text encode -> DDIM scan ->
AE decode, one XLA program), then answers requests from stdin until EOF —
the TPU-native "model server" loop.

Protocol: one JSON object per line on stdin; one JSON response per line on
stdout (logs go to stderr so stdout stays machine-readable).

  request:  {"prompt": "a cat" | ["p1", ...], "negative_prompt": "",
             "seed": 0, "n": 1,
             "guidance_scale": 5.0, "out": "name"}
  response: {"ok": true, "out": "<dir>/name.npy", "latency_s": 1.23,
             "shape": [n, H, W, 3], "batched_requests": 3}
  errors:   {"ok": false, "error": "..."}

`prompt` may be one string or a list; `n` is the number of images the
request wants (default: the full compiled batch for a single string —
the reference semantics — or `len(prompt)` for a list).  The compiled
batch shape and DDIM step count are compile-time constants from the YAML;
everything else is traced per-slot, so NOTHING below recompiles:

**Micro-batching.**  Requests asking for fewer than `latent_shape[0]`
images are coalesced: the loop drains every request already buffered on
the input (plus an optional `--batch_window_ms` wait on a live stdin),
packs their slots into full compiled batches — per-slot prompt, per-slot
negative prompt, and per-slot guidance scale (a traced [B,1,1,1] operand
broadcast through the CFG mix) — and answers each request with its own
slice, in request order.  Requests sharing one packed batch must share a
`seed` (the PRNG key is per-pipeline-call), so slots are grouped by seed;
a request larger than the compiled batch spans several calls.  Note
images depend on slot placement: request R's pixels are reproducible for
the same *request stream*, not in isolation (submit a full-batch request
for composition-independent determinism).
"""

from __future__ import annotations

import itertools
import json
import sys
import time

import numpy as np
from absl import app, flags

from ldm_tf2_tpu.cli._flags import define_integer, define_string

define_string("config_path", None, "Path to yaml config file.")
define_string("output_dir", ".", "Directory for generated .npy images.")
define_integer(
    "batch_window_ms", 0,
    "How long to wait for more stdin requests to micro-batch with the one "
    "just received (0 = pack only what is already buffered).",
)
define_string(
    "aot_cache", "",
    "Path for a serialized compiled-executable cache: a restarted server "
    "deserializes the pipeline executable instead of re-tracing and "
    "re-compiling (stale/mismatched artifacts fall back to a fresh "
    "compile). Empty disables.",
)
define_string(
    "params_blob", "",
    "Path prefix for a single-blob mmap-able params artifact "
    "(checkpoints/blob.py): a restarted server restores all three "
    "pretrained trees with ONE host->device transfer instead of an "
    "Orbax restore of ~1,350 leaves. First start with this flag writes "
    "the blob (post weights-dtype cast); later starts load it. Empty "
    "disables.",
)

FLAGS = flags.FLAGS


def build_server(config, aot_cache_path: str = "",
                 params_blob_path: str = ""):
    """Returns (run_batch, warmup, batch_size): a packed-slot batch runner
    closure over one jitted pipeline, a warmup compile trigger, and the
    compiled batch size."""
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.cli.run_ldm_sampler import tensor_to_image
    from ldm_tf2_tpu.data.tokenizer import (
        load_tokenizer,
        packed_cfg_token_ids,
    )
    from ldm_tf2_tpu.diffusion.sampler import (
        ddim_sample_loop,
        ddim_sample_loop_deepcache,
        ddpm_sample_loop,
    )
    from ldm_tf2_tpu.diffusion.solvers import (
        dpm_solver_pp_2m_sample_loop,
        dpm_solver_pp_2m_sample_loop_deepcache,
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

    # Overlap the independent halves of a warm start: the AOT artifact's
    # file read + unpickle runs on a worker thread while this thread
    # restores the multi-GB param artifacts (VERDICT r3 next #3 — they
    # were serial before).  Only the jax-free half overlaps: the
    # device-side bind stays on the main thread in warmup() because
    # concurrent device access from two threads deadlocks the
    # axon-tunnel PJRT client (factory.aot_read docstring).
    aot_future = None
    if aot_cache_path:
        from concurrent.futures import ThreadPoolExecutor

        # shutdown(wait=False) right after submit: the worker thread
        # self-terminates once aot_read returns even if build_server
        # raises mid-restore before warmup consumes the future (ADVICE
        # r4 — a lingering non-daemon worker delayed interpreter exit).
        # aot_read converts its own errors to None, so .result() in
        # warmup() never raises from the thread.
        _aot_pool = ThreadPoolExecutor(max_workers=1)
        aot_future = _aot_pool.submit(
            factory.aot_read,
            aot_cache_path,
            lambda m: print(f"[serve] {m}", file=sys.stderr),
        )
        _aot_pool.shutdown(wait=False)

    from ldm_tf2_tpu.checkpoints.blob import (
        blob_exists,
        export_blob,
        load_blob,
    )

    blob_note = lambda m: print(f"[serve] {m}", file=sys.stderr)
    t_restore = time.perf_counter()
    if params_blob_path and blob_exists(params_blob_path):
        # fast path: one streaming transfer + jitted unpack (the unpack
        # program itself is a persistent-compile-cache hit on restarts)
        print("[serve] restoring params from single-blob artifact...",
              file=sys.stderr)
        trees = load_blob(params_blob_path, note=blob_note)
        # no-op when the blob was written post-cast; protects against a
        # stale blob after a tpu.weights_dtype config change
        params = factory.cast_inference_params(
            config,
            (trees["cond_stage_model"], trees["unet"], trees["autoencoder"]),
        )
    else:
        print("[serve] restoring pretrained checkpoints...", file=sys.stderr)
        params = factory.cast_inference_params(
            config,
            (
                load_params(config["pre_ckpt_paths"]["cond_stage_model"]),
                load_params(config["pre_ckpt_paths"]["unet"]),
                load_params(config["pre_ckpt_paths"]["autoencoder"]),
            ),
        )
        if params_blob_path:
            # self-priming (like --aot_cache): write the post-cast trees
            # so the NEXT restart takes the fast path
            print("[serve] writing params blob for future restarts...",
                  file=sys.stderr)
            export_blob(
                params_blob_path,
                {
                    "cond_stage_model": params[0],
                    "unet": params[1],
                    "autoencoder": params[2],
                },
            )
    print(
        f"[serve] params ready in {time.perf_counter() - t_restore:.1f}s",
        file=sys.stderr,
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
    # CFG rescale phi (diffusion/sampler.py apply_cfg) — pipeline-static
    guidance_rescale = float(sampling.get("guidance_rescale", 0.0))

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
    if cache_interval > 1 and sampler_name not in (
        "ddim", "dpm_solver_pp_2m",
    ):
        raise ValueError(
            "ldm_sampling.cache_interval > 1 requires sampler: ddim or "
            f"dpm_solver_pp_2m, got {sampler_name!r}"
        )
    sample_loop = sample_loops[sampler_name]
    cache_loop = (
        ddim_sample_loop_deepcache
        if sampler_name == "ddim"
        else dpm_solver_pp_2m_sample_loop_deepcache
    )

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
            x0 = cache_loop(
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
                guidance_rescale=guidance_rescale,
            )
        else:
            eps_model = lambda x, t, c: unet.apply(
                {"params": unet_p}, x, t, c
            )
            x0 = sample_loop(
                eps_model, schedule, context, shape, key, guidance_scale,
                guidance_rescale=guidance_rescale,
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
    # exec_ref["fn"] is the pipeline executable: a plain jit by default,
    # swapped for a deserialized AOT executable by warmup() when
    # --aot_cache hits (both take/return identical pytrees)
    exec_ref = {"fn": jax.jit(pipeline)}

    def prep_inputs(prompts, negatives, guidances, seed):
        token_ids = jnp.asarray(
            packed_cfg_token_ids(tokenizer, prompts, negatives, max_seq_len)
        )
        guidance = jnp.asarray(
            np.asarray(guidances, np.float32).reshape(shape[0], 1, 1, 1)
        )
        if data_parallel:
            token_ids, guidance = shard_batch((token_ids, guidance), mesh)
        return token_ids, jax.random.PRNGKey(int(seed)), guidance

    def run_batch(prompts, negatives, guidances, seed):
        """One compiled pipeline call on a packed slot batch: length-B
        prompt/negative/guidance lists → uint8 [B, H, W, 3]."""
        token_ids, key, guidance = prep_inputs(
            prompts, negatives, guidances, seed
        )
        out = exec_ref["fn"](params, token_ids, key, guidance)
        return tensor_to_image(np.asarray(out))

    def warmup():
        t0 = time.perf_counter()
        b = shape[0]
        warm_args = (
            [sampling["text_prompt"]] * b,
            [sampling.get("negative_prompt", "")] * b,
            [sampling["guidance_scale"]] * b,
        )
        how = "compiled"
        if aot_cache_path:
            token_ids, key, guidance = prep_inputs(*warm_args, 0)
            jit_fn = exec_ref["fn"]
            exec_ref["fn"], how = factory.aot_compile_or_load(
                jit_fn,
                (params, token_ids, key, guidance),
                aot_cache_path,
                note=lambda m: print(f"[serve] {m}", file=sys.stderr),
                # artifact bytes were read concurrently with the param
                # restore; bind to devices here on the main thread
                preloaded=factory.aot_try_load(
                    aot_cache_path,
                    lambda m: print(f"[serve] {m}", file=sys.stderr),
                    payload=aot_future.result(),
                ),
            )
            if how == "aot-cache":
                # the warm call doubles as verification: an artifact can
                # deserialize yet fail at execute (e.g. loaded into a
                # process whose runtime state clashes) — fall back to a
                # fresh compile rather than serving errors
                try:
                    run_batch(*warm_args, 0)
                except Exception as e:
                    print(
                        f"[serve] AOT executable failed at run "
                        f"({type(e).__name__}); recompiling",
                        file=sys.stderr,
                    )
                    exec_ref["fn"], how = jit_fn, "compiled"
                    run_batch(*warm_args, 0)
            else:
                run_batch(*warm_args, 0)
        else:
            run_batch(*warm_args, 0)
        label = {"aot-cache": "AOT warm start", "compiled": "compiled"}[how]
        print(
            f"[serve] {label} + warm in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    return run_batch, warmup, shape[0]


def _expand_request(req: dict, sampling: dict, batch_size: int) -> dict:
    """Validate one request into a slot spec: n per-slot prompts + a
    shared negative/guidance/seed."""
    if not isinstance(req, dict):
        raise ValueError(f"request must be a JSON object, got {req!r}")
    prompt = req.get("prompt", sampling["text_prompt"])
    if isinstance(prompt, str):
        # single string: default n = full compiled batch (the reference
        # semantics — one prompt tiled over the batch)
        n = int(req.get("n", batch_size))
        prompts = [prompt] * n
    else:
        prompts = [str(p) for p in prompt]
        n = int(req.get("n", len(prompts)))
        if n != len(prompts):
            raise ValueError(
                f'"n": {n} conflicts with a {len(prompts)}-prompt list'
            )
    if n < 1:
        raise ValueError(f'"n" must be >= 1, got {n}')
    return {
        "prompts": prompts,
        "negative": str(
            req.get("negative_prompt", sampling.get("negative_prompt", ""))
        ),
        "guidance": float(
            req.get("guidance_scale", sampling["guidance_scale"])
        ),
        "seed": int(req.get("seed", 0)),
        "out": req.get("out"),
    }


def _read_wave(input_stream, window_s: float):
    """Block for one request line, then drain everything else already
    buffered (or arriving within ``window_s`` on a selectable stream).

    Returns (lines, done): the raw lines of the wave, and whether the
    stream hit EOF / an exit command (exit stops the drain; earlier lines
    of the wave still run)."""
    import select

    def selectable():
        try:
            input_stream.fileno()
            return True
        except Exception:
            return False  # in-memory stream: drain greedily to EOF

    lines, done, block = [], False, True
    is_pipe = selectable()
    while True:
        if not block and is_pipe:
            ready, _, _ = select.select([input_stream], [], [], window_s)
            if not ready:
                break
        line = input_stream.readline()
        if not line:  # EOF
            done = True
            break
        block = False
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if req == "exit" or (isinstance(req, dict)
                                 and req.get("cmd") == "exit"):
                done = True
                break
        except Exception:
            pass  # malformed line joins the wave; answered with an error
        lines.append(line)
    return lines, done


def serve(config, input_stream, output_stream, output_dir: str = ".",
          batch_window_ms: int = 0, aot_cache_path: str = "",
          params_blob_path: str = ""):
    """The micro-batching request loop, separated from main() so tests can
    drive it with in-memory streams.

    Each wave of buffered requests is packed into full compiled batches
    (slots grouped by seed — the PRNG key is per-call); responses are
    written in request order."""
    run_batch, warmup, batch_size = build_server(
        config, aot_cache_path, params_blob_path
    )
    sampling = config["ldm_sampling"]
    warmup()
    print("[serve] ready", file=sys.stderr)
    request_seq = itertools.count()

    while True:
        wave, done = _read_wave(input_stream, batch_window_ms / 1000.0)
        responses = [None] * len(wave)
        specs = []  # (wave_index, spec)
        for i, line in enumerate(wave):
            try:
                specs.append(
                    (i, _expand_request(json.loads(line), sampling,
                                        batch_size))
                )
            except Exception as e:
                responses[i] = {
                    "ok": False, "error": f"{type(e).__name__}: {e}"
                }

        # pack slots by seed: seed -> [(wave_index, slot_pos, prompt,
        # negative, guidance)]
        groups: dict = {}
        results = {i: [None] * len(s["prompts"]) for i, s in specs}
        for i, s in specs:
            for j, p in enumerate(s["prompts"]):
                groups.setdefault(s["seed"], []).append(
                    (i, j, p, s["negative"], s["guidance"])
                )
        t0 = time.perf_counter()
        try:
            for seed, slots in groups.items():
                for lo in range(0, len(slots), batch_size):
                    chunk = slots[lo:lo + batch_size]
                    pad = batch_size - len(chunk)
                    chunk = chunk + [chunk[-1]] * pad  # pad slots discarded
                    images = run_batch(
                        [c[2] for c in chunk],
                        [c[3] for c in chunk],
                        [c[4] for c in chunk],
                        seed,
                    )
                    for k, (i, j, *_rest) in enumerate(chunk[:len(chunk) - pad]):
                        results[i][j] = images[k]
        except Exception as e:
            err = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            for i, _ in specs:
                responses[i] = dict(err)
        latency = round(time.perf_counter() - t0, 4)

        for i, spec in specs:
            if responses[i] is not None:
                continue  # batch-level failure already recorded
            images = np.stack(results[i])
            # default name: wall time + per-process counter (perf_counter
            # has an arbitrary epoch; same-second requests would overwrite)
            default = f"images_{int(time.time())}_{next(request_seq)}"
            name = str(spec["out"] or default).replace("/", "_")
            path = f"{output_dir}/{name}.npy"
            np.save(path, images)
            responses[i] = {
                "ok": True,
                "out": path,
                "latency_s": latency,
                "shape": list(images.shape),
                "batched_requests": len(specs),
            }
        for resp in responses:
            output_stream.write(json.dumps(resp) + "\n")
        output_stream.flush()
        if done:
            break


def main(_):
    from ldm_tf2_tpu.configs import load_config
    from ldm_tf2_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    config = load_config(FLAGS.config_path)
    serve(config, sys.stdin, sys.stdout, FLAGS.output_dir,
          batch_window_ms=FLAGS.batch_window_ms,
          aot_cache_path=FLAGS.aot_cache,
          params_blob_path=FLAGS.params_blob)


if __name__ == "__main__":
    flags.mark_flag_as_required("config_path")
    app.run(main)
