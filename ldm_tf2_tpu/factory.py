"""Model assembly from the all-in-one config (the reference wires this
inline in each run_*.py script; we centralize it)."""

from __future__ import annotations

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


def apply_tpu_settings(config: dict) -> None:
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
