"""Beta schedule and DDIM coefficient tables.

Reproduces the schedule math of the reference's ``LatentDiffusionModel``
(/root/reference/model_runners.py:352-423) as a host-side float64 numpy
precompute, materialized once into float32 arrays that live in device memory
for the whole run.  On TPU there is no float64, so — unlike the reference,
which builds the tables as float64 TF tensors — we compute everything in
numpy float64 on the host and only then cast, which preserves the reference's
numerics bit-for-bit at f32 resolution.

The "scaled-linear" schedule is ``linspace(sqrt(b0), sqrt(b1), T)**2``
(model_runners.py:379-382), the CompVis latent-diffusion default.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable container of schedule tables (all numpy float32 on host).

    Tables over the full ``num_steps`` training timeline:
      betas, alphas, alphas_cumprod, alphas_cumprod_prev,
      sqrt_alphas_cumprod, sqrt_one_minus_alphas_cumprod,
      log_one_minus_alphas_cumprod, sqrt_recip_alphas_cumprod,
      sqrt_recipm1_alphas_cumprod, posterior_variance,
      posterior_log_variance_clipped, posterior_mean_coef1/2
      (model_runners.py:379-404).

    Tables over the DDIM sub-sequence (length ``num_ddim_steps``):
      ddim_steps (int32 timestep ids), ddim_alphas_cumprod,
      ddim_alphas_cumprod_prev, ddim_sigmas,
      ddim_sqrt_recip_alphas_cumprod, ddim_sqrt_recipm1_alphas_cumprod
      (model_runners.py:406-423).

    Arrays are plain numpy so the schedule can be closed over by a jitted
    function (they become compile-time constants) or indexed with
    ``jnp.take`` after ``jnp.asarray``.
    """

    num_steps: int
    num_ddim_steps: int
    eta: float
    v_posterior: float

    betas: np.ndarray
    alphas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    ddim_steps: np.ndarray
    ddim_alphas_cumprod: np.ndarray
    ddim_alphas_cumprod_prev: np.ndarray
    ddim_sigmas: np.ndarray
    ddim_sqrt_recip_alphas_cumprod: np.ndarray
    ddim_sqrt_recipm1_alphas_cumprod: np.ndarray


def make_schedule(
    num_steps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    v_posterior: float = 0.0,
    eta: float = 0.0,
    num_ddim_steps: int = 50,
) -> DiffusionSchedule:
    """Build all schedule tables (defaults mirror model_runners.py:354-365).

    The production config uses beta_start=0.00085, beta_end=0.012
    (all_in_one_config.yaml:104-111 in the reference).
    """
    # "scaled-linear": linspace in sqrt-beta space, then squared
    # (model_runners.py:379-382), float64 throughout.
    betas = (
        np.linspace(beta_start**0.5, beta_end**0.5, num_steps, dtype=np.float64)
        ** 2
    )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = (
        (1.0 - v_posterior)
        * betas
        * (1.0 - alphas_cumprod_prev)
        / (1.0 - alphas_cumprod)
        + v_posterior * betas
    )

    # DDIM sub-sequence: range(0, T, T//S), shifted by +1 when subsampling
    # (model_runners.py:406-409).  For T=1000, S=50: [1, 21, ..., 981].
    ddim_steps = np.arange(0, num_steps, num_steps // num_ddim_steps, dtype=np.int32)
    if num_ddim_steps < num_steps:
        ddim_steps = ddim_steps + 1

    ddim_alphas_cumprod = alphas_cumprod[ddim_steps]
    ddim_alphas_cumprod_prev = np.concatenate(
        [[alphas_cumprod[0]], alphas_cumprod[ddim_steps[:-1]]]
    )
    # sigma_t = eta * sqrt((1-acp_prev)/(1-acp) * (1-acp/acp_prev))
    # (model_runners.py:416-419).
    ddim_sigmas = eta * np.sqrt(
        (1.0 - ddim_alphas_cumprod_prev)
        / (1.0 - ddim_alphas_cumprod)
        * (1.0 - ddim_alphas_cumprod / ddim_alphas_cumprod_prev)
    )

    sqrt_recip_alphas_cumprod = np.sqrt(1.0 / alphas_cumprod)
    sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / alphas_cumprod - 1.0)

    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return DiffusionSchedule(
        num_steps=num_steps,
        num_ddim_steps=num_ddim_steps,
        eta=eta,
        v_posterior=v_posterior,
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(sqrt_recip_alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=f32(sqrt_recipm1_alphas_cumprod),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev)
            * np.sqrt(alphas)
            / (1.0 - alphas_cumprod)
        ),
        ddim_steps=ddim_steps.astype(np.int32),
        ddim_alphas_cumprod=f32(ddim_alphas_cumprod),
        ddim_alphas_cumprod_prev=f32(ddim_alphas_cumprod_prev),
        ddim_sigmas=f32(ddim_sigmas),
        ddim_sqrt_recip_alphas_cumprod=f32(sqrt_recip_alphas_cumprod[ddim_steps]),
        ddim_sqrt_recipm1_alphas_cumprod=f32(
            sqrt_recipm1_alphas_cumprod[ddim_steps]
        ),
    )
