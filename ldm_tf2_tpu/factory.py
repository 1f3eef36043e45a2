"""Model assembly from the all-in-one config (the reference wires this
inline in each run_*.py script; we centralize it)."""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from ldm_tf2_tpu.configs.loader import compute_dtype
from ldm_tf2_tpu.diffusion.schedule import DiffusionSchedule, make_schedule
from ldm_tf2_tpu.models import (
    AutoencoderKL,
    AutoencoderVQ,
    Discriminator,
    LPIPS,
    TransformerModel,
    UNet,
)
from ldm_tf2_tpu.ops.attention import set_attention_impl


def enable_compile_cache(
    cache_dir: str | None, min_compile_seconds: float = 1.0
) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    The XLA compile of the full sampling pipeline is multi-minute on the
    0.87B U-Net (BENCH r02: 1292 s warmup); with the on-disk cache a
    restarted server/trainer/sampler fetches the compiled executable
    instead of re-compiling, turning every warm process start into
    seconds.  The JAX_COMPILATION_CACHE_DIR env var overrides; None (or
    empty) disables.  Returns the directory actually in effect.
    """
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir
    if not cache_dir:
        return None
    cache_dir = os.path.expanduser(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    changed = jax.config.jax_compilation_cache_dir != cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_seconds
    )
    # cache regardless of entry size — the pipeline executables we care
    # about are all large, and tiny helper fns are filtered by time above
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if changed:
        # the cache object is a lazily-initialized singleton: once any
        # compile has touched the OLD dir, a config update alone is
        # silently ignored — reset so the new dir takes effect
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
    return cache_dir


_AOT_UNSET = object()


def aot_read(path: str, note=None):
    """Read + unpickle a serialized AOT executable artifact, or None.

    Pure file IO — NO jax/device calls — so it is safe to run on a
    worker thread concurrently with the (multi-GB) Orbax param restore
    (cli/serve_ldm.py overlaps the two).  The device-side bind
    (`aot_try_load`) must stay on the main thread: concurrent device
    access from two threads deadlocked the axon-tunnel PJRT client
    (observed round 4 — aot-warm hung >25 min with flat CPU).
    """
    import pickle

    note = note or (lambda msg: None)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:
        note(f"AOT cache read failed ({type(e).__name__}: {e}); "
             "recompiling")
        return None


def aot_try_load(path: str, note=None, payload=_AOT_UNSET):
    """Deserialize-and-load a serialized AOT executable, or None.

    ``payload``: the result of an earlier (possibly concurrent)
    `aot_read` — pass it to skip the file read here."""
    from jax.experimental import serialize_executable

    note = note or (lambda msg: None)
    if payload is _AOT_UNSET:
        payload = aot_read(path, note)
    if payload is None:
        return None
    try:
        exe, in_tree, out_tree, device_ids = payload
        # re-bind to the SAME device assignment the executable was
        # compiled for — the default (all local devices) breaks when
        # it was compiled for a subset (e.g. single-device jit on an
        # 8-device host)
        by_id = {d.id: d for d in jax.devices()}
        return serialize_executable.deserialize_and_load(
            exe, in_tree, out_tree,
            execution_devices=[by_id[i] for i in device_ids],
        )
    except Exception as e:  # stale/incompatible artifact: recompile
        note(f"AOT cache load failed ({type(e).__name__}: {e}); "
             "recompiling")
        return None


def aot_compile_or_load(jit_fn, example_args, path: str, note=None,
                        preloaded=_AOT_UNSET):
    """Ahead-of-time executable cache: load a serialized compiled
    executable from ``path``, or compile ``jit_fn`` at ``example_args``
    and save it there.

    The persistent compilation cache (enable_compile_cache) skips the XLA
    compile on restart but still re-traces the pipeline; this skips BOTH —
    a restarted server deserializes the executable directly.  The artifact
    embeds device topology, shapes, and jax version; any mismatch (driver
    upgrade, different batch, different chip) fails the load and falls
    back to a fresh compile that overwrites the artifact atomically.

    ``preloaded``: the result of an earlier (possibly concurrent)
    `aot_try_load` — pass it to skip the load here.

    Returns (callable, source) with source "aot-cache" | "compiled".
    """
    import pickle

    from jax.experimental import serialize_executable

    note = note or (lambda msg: None)
    fn = aot_try_load(path, note) if preloaded is _AOT_UNSET else preloaded
    if fn is not None:
        return fn, "aot-cache"
    compiled = jit_fn.lower(*example_args).compile()
    try:
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        device_ids = [
            d.id
            for d in compiled._executable.xla_executable.local_devices()
        ]
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, device_ids), f)
        os.replace(tmp, path)
    except Exception as e:  # backend without serialization support
        note(f"AOT serialize failed ({type(e).__name__}: {e}); "
             "executable cache not written")
    return compiled, "compiled"


def apply_tpu_settings(config: dict) -> None:
    enable_compile_cache(config["tpu"].get("compile_cache_dir"))
    set_attention_impl(config["tpu"]["attention_impl"])


def cast_inference_params(config: dict, params: Any) -> Any:
    """Cast float32 leaves of a restored param tree to tpu.weights_dtype.

    Inference-only: bf16 weight storage halves per-step HBM weight traffic
    (the 0.87B U-Net reads its full weights every denoise step of the scan).
    No-op when tpu.weights_dtype is null.
    """
    name = config["tpu"].get("weights_dtype")
    if name is None:
        return params
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        params,
    )


def build_cond_model(config: dict, dtype=None) -> TransformerModel:
    kwargs = dict(config["cond_stage_model"])
    return TransformerModel(
        **kwargs, dtype=dtype or compute_dtype(config)
    )


def build_unet(config: dict, dtype=None) -> UNet:
    kwargs = dict(config["unet"])
    return UNet(
        **kwargs,
        context_channels=config["cond_stage_model"]["hidden_size"],
        dtype=dtype or compute_dtype(config),
    )


def build_autoencoder(config: dict, ae_type: str, dtype=None):
    dtype = dtype or compute_dtype(config)
    if ae_type == "kl":
        return AutoencoderKL(**config["autoencoder_kl"], dtype=dtype)
    if ae_type == "vq":
        return AutoencoderVQ(**config["autoencoder_vq"], dtype=dtype)
    raise NotImplementedError(f"invalid autoencoder type {ae_type!r}")


def build_discriminator(config: dict, ae_type: str, dtype=None) -> Discriminator:
    key = "ae_kl_discriminator" if ae_type == "kl" else "ae_vq_discriminator"
    return Discriminator(**config[key], dtype=dtype or compute_dtype(config))


def build_lpips(config: dict, dtype=None) -> LPIPS:
    return LPIPS(dtype=dtype or compute_dtype(config))


def build_schedule(config: dict) -> DiffusionSchedule:
    ldm = config["ldm"]
    return make_schedule(
        num_steps=ldm["num_steps"],
        beta_start=ldm["beta_start"],
        beta_end=ldm["beta_end"],
        v_posterior=ldm["v_posterior"],
        eta=ldm["eta"],
        num_ddim_steps=ldm["num_ddim_steps"],
        timestep_spacing=ldm.get("timestep_spacing", "uniform"),
    )
