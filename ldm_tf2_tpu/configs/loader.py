"""YAML config loading + validation.

The reference splats `yaml.safe_load` sections straight into constructors
(run_ldm_sampler.py:50-59); we keep that exact key surface but validate it
up front (unknown autoencoder types, malformed meshes, and missing sections
fail loudly at load time instead of deep inside a jit trace).  The additive
`tpu:` section is ours (mesh/dtype/attention settings).
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import yaml

_REQUIRED_SECTIONS = (
    "cond_stage_model",
    "unet",
    "autoencoder_kl",
    "autoencoder_vq",
    "ldm",
)

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}

_TPU_DEFAULTS: dict[str, Any] = {
    "mesh": {"data": -1},
    "compute_dtype": "bfloat16",
    # Inference-only weight *storage* dtype: "bfloat16" halves the HBM
    # weight traffic of the 0.87B U-Net per denoise step. null keeps the
    # checkpoint's dtype (training always keeps float32 masters).
    "weights_dtype": None,
    # Storage dtype for FROZEN models during LDM training (the cond
    # transformer when train_cond_model is false, and the AE): they need
    # no f32 masters; "bfloat16" frees ~1.6 GB HBM on the full config
    # (what makes 512^2 training fit on one v5e chip).
    "frozen_weights_dtype": None,
    "attention_impl": "auto",
    # Ulysses sequence-parallel attention over the mesh's "model" axis for
    # self-attention >= 4096 tokens (1024^2+ sampling). Requires a model
    # axis of size > 1 in tpu.mesh.
    "sequence_parallel": False,
    # Megatron-style tensor parallelism over the mesh's "model" axis:
    # params sharded by the parallel/sharding.py rules, Pallas kernels
    # composed per-shard via ops/tp.py shard_map wrappers. Requires a
    # model axis of size > 1 in tpu.mesh.
    "tensor_parallel": False,
    "remat": False,
    # Resumable index-based input pipeline (data/indexed.py): batch at
    # step s is a pure function of (seed, s), so restarts resume mid-epoch
    # deterministically. Off by default (the streaming loader mirrors the
    # reference's shuffle-buffer semantics).
    "deterministic_data": False,
    # Serialize the frozen-AE encode over N sub-batches in the LDM train
    # step (transient-activation peak divider for 512^2+; zero FLOP cost).
    "encode_chunks": 1,
    "persist_per_iterations": None,
    "log_per_iterations": 100,
    # Persistent XLA compilation cache directory: every CLI process start
    # (server restart, trainer resume, A/B rerun) reuses on-disk compiled
    # executables instead of paying the multi-minute pipeline compile
    # again. Shared across CLIs — the sampler warm-starts from a compile
    # the server did and vice versa. null disables; the
    # JAX_COMPILATION_CACHE_DIR env var overrides. The default must be a
    # DURABLE directory (never /tmp — wiped between sessions on some
    # hosts, which turns every fresh session into a multi-minute cold
    # compile; measured 472 s vs 26 s warm on the 0.87B pipeline).
    "compile_cache_dir": "~/.cache/ldm_tf2_tpu/xla",
    # W8A8 int8 U-Net ResBlock convs during sampling (ops/quant_conv.py):
    # ~2x MXU rate on the conv bucket; per-example dynamic activation
    # scales + per-channel weight scales. Opt-in serving mode — output
    # differs from bf16 by quantization noise ("none" is the exact path).
    "quantize": "none",
    # int8 PV contraction inside the flash-attention forward (the QK dot
    # stays bf16 — its 128-lane contraction is too shallow to pay; see
    # ops/flash_attention.py set_flash_pv_int8). Same opt-in serving
    # semantics as tpu.quantize.
    "quantize_attention": "none",
}


def _is_int(x: Any) -> bool:
    """True for real ints only — bool is an int subclass, and YAML `true`
    silently passing an int check turns a type error into phi=1.0 etc."""
    return isinstance(x, int) and not isinstance(x, bool)


def _is_number(x: Any) -> bool:
    return _is_int(x) or isinstance(x, float)


def load_config(path: str) -> dict:
    """Load + validate the all-in-one YAML; fills tpu-section defaults."""
    with open(path) as f:
        config = yaml.safe_load(f)

    missing = [s for s in _REQUIRED_SECTIONS if s not in config]
    if missing:
        raise ValueError(f"{path}: missing config sections {missing}")

    for section in ("autoencoder_training", "ldm_training", "ldm_sampling"):
        ae_type = config.get(section, {}).get("autoencoder_type")
        if ae_type is not None and ae_type not in ("kl", "vq"):
            raise ValueError(
                f"{section}.autoencoder_type must be 'kl' or 'vq', got "
                f"{ae_type!r}"
            )

    # Additive DeepCache keys (diffusion/sampler.py
    # ddim_sample_loop_deepcache): cache_interval=1 (default) is the exact
    # reference path; >1 reuses deep U-Net features across steps.
    sampling = config.get("ldm_sampling") or {}
    cache_interval = sampling.get("cache_interval", 1)
    cache_levels = sampling.get("cache_levels", 1)
    if not _is_int(cache_interval) or cache_interval < 1:
        raise ValueError(
            "ldm_sampling.cache_interval must be an int >= 1, got "
            f"{cache_interval!r}"
        )
    if not _is_int(cache_levels) or cache_levels < 1:
        raise ValueError(
            "ldm_sampling.cache_levels must be an int >= 1, got "
            f"{cache_levels!r}"
        )
    if cache_interval > 1 and sampling.get("sampler", "ddim") not in (
        "ddim", "dpm_solver_pp_2m",
    ):
        raise ValueError(
            "ldm_sampling.cache_interval > 1 requires sampler: ddim or "
            f"dpm_solver_pp_2m, got {sampling.get('sampler')!r}"
        )
    rescale = sampling.get("guidance_rescale", 0.0)
    if not _is_number(rescale) or not 0.0 <= rescale <= 1.0:
        raise ValueError(
            "ldm_sampling.guidance_rescale must be in [0, 1], got "
            f"{rescale!r}"
        )
    strength = sampling.get("strength", 0.75)
    if not _is_number(strength) or not 0.0 <= strength <= 1.0:
        raise ValueError(
            f"ldm_sampling.strength must be in [0, 1], got {strength!r}"
        )
    if sampling.get("mask_path") and not sampling.get("init_image_path"):
        raise ValueError(
            "ldm_sampling.mask_path requires ldm_sampling.init_image_path"
        )

    # Additive schedule key (diffusion/schedule.py make_schedule): DDIM
    # sub-sequence spacing; "uniform" is the exact reference rule.
    spacing = config.get("ldm", {}).get("timestep_spacing", "uniform")
    if spacing not in ("uniform", "trailing", "karras"):
        raise ValueError(
            "ldm.timestep_spacing must be uniform|trailing|karras, got "
            f"{spacing!r}"
        )

    # Additive trainer key (training/ldm_trainer.py make_optimizer):
    # average gradients over N micro-batches per AdamW update.
    accum = config.get("ldm_training", {}).get("grad_accum_steps", 1)
    if not _is_int(accum) or accum < 1:
        raise ValueError(
            f"ldm_training.grad_accum_steps must be an int >= 1, got "
            f"{accum!r}"
        )

    tpu = dict(_TPU_DEFAULTS)
    tpu.update(config.get("tpu") or {})
    if tpu["compute_dtype"] not in _DTYPES:
        raise ValueError(
            f"tpu.compute_dtype must be one of {sorted(_DTYPES)}, got "
            f"{tpu['compute_dtype']!r}"
        )
    for key in ("weights_dtype", "frozen_weights_dtype"):
        if tpu[key] is not None and tpu[key] not in _DTYPES:
            raise ValueError(
                f"tpu.{key} must be null or one of {sorted(_DTYPES)}, "
                f"got {tpu[key]!r}"
            )
    if tpu["attention_impl"] not in ("auto", "xla", "flash"):
        raise ValueError(
            f"tpu.attention_impl must be auto|xla|flash, got "
            f"{tpu['attention_impl']!r}"
        )
    if not isinstance(tpu["sequence_parallel"], bool):
        raise ValueError(
            f"tpu.sequence_parallel must be a bool, got "
            f"{tpu['sequence_parallel']!r}"
        )
    if tpu["sequence_parallel"] and tpu["mesh"].get("model", 1) in (0, 1):
        raise ValueError(
            "tpu.sequence_parallel requires a 'model' axis of size > 1 "
            f"in tpu.mesh, got {tpu['mesh']}"
        )
    if not isinstance(tpu["tensor_parallel"], bool):
        raise ValueError(
            f"tpu.tensor_parallel must be a bool, got "
            f"{tpu['tensor_parallel']!r}"
        )
    if tpu["tensor_parallel"] and tpu["mesh"].get("model", 1) in (0, 1):
        raise ValueError(
            "tpu.tensor_parallel requires a 'model' axis of size > 1 "
            f"in tpu.mesh, got {tpu['mesh']}"
        )
    if tpu["tensor_parallel"] and tpu["sequence_parallel"]:
        raise ValueError(
            "tpu.tensor_parallel and tpu.sequence_parallel both claim the "
            "'model' mesh axis — enable at most one"
        )
    if tpu["tensor_parallel"] and tpu["quantize"] != "none":
        raise ValueError(
            "tpu.quantize int8 is a single-chip serving mode: the W8A8 "
            "whole-chain conv kernels are not decomposed over the model "
            "axis (ops/tp.py covers attention + FFN only) — disable one "
            "of tpu.tensor_parallel / tpu.quantize"
        )
    if tpu["quantize"] not in ("none", "int8"):
        raise ValueError(
            f"tpu.quantize must be 'none' or 'int8', got {tpu['quantize']!r}"
        )
    if tpu["quantize_attention"] not in ("none", "int8pv"):
        raise ValueError(
            "tpu.quantize_attention must be 'none' or 'int8pv', got "
            f"{tpu['quantize_attention']!r}"
        )
    if tpu["compile_cache_dir"] is not None and not isinstance(
        tpu["compile_cache_dir"], str
    ):
        raise ValueError(
            "tpu.compile_cache_dir must be null or a directory path, got "
            f"{tpu['compile_cache_dir']!r}"
        )
    config["tpu"] = tpu
    return config


def compute_dtype(config: dict):
    return _DTYPES[config["tpu"]["compute_dtype"]]


def default_config_path() -> str:
    return os.path.join(os.path.dirname(__file__), "all_in_one_config.yaml")
