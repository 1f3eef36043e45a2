"""Higher-order ODE solvers for the reverse diffusion process.

Capability extension beyond the reference (which implements only DDIM and
ancestral DDPM, /root/reference/model_runners.py:437-575): deterministic
multistep solvers that reach the same sample quality in fewer U-Net
evaluations — the dominant serving cost is NFE x U-Net time, so a solver
that halves the steps roughly halves txt2img latency.

* ``plms_sample_loop`` — Pseudo Linear Multi-Step (PNDM, Liu et al. 2022).
  Reuses the last <=3 eps predictions in an Adams-Bashforth combination
  (orders ramp 1->4 over the first steps), then applies the deterministic
  DDIM update with the combined eps.
* ``dpm_solver_pp_2m_sample_loop`` — DPM-Solver++(2M) (Lu et al. 2022),
  data-prediction multistep variant: second order with ONE model call per
  step, the de-facto standard fast sampler for CFG-guided latent diffusion.

Both are single jitted ``lax.scan`` loops over the DDIM timestep
sub-sequence (schedule.ddim_steps), with classifier-free guidance via the
same [2B] double-batch trick as ``sampler.ddim_step``.  Everything stays
on-device; the eps history lives in the scan carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldm_tf2_tpu.diffusion.sampler import EpsModel, apply_cfg
from ldm_tf2_tpu.diffusion.schedule import DiffusionSchedule


def _cfg_eps(eps_model, schedule, xt, cond, index, guidance_scale,
             guidance_rescale=0.0):
    """One CFG-guided eps prediction at ddim index (sampler.ddim_step
    semantics, model_runners.py:451-453)."""
    ddim_steps = jnp.asarray(schedule.ddim_steps)
    t = jnp.full((xt.shape[0] * 2,), ddim_steps[index], dtype=jnp.float32)
    return apply_cfg(
        eps_model(jnp.concatenate([xt, xt], axis=0), t, cond),
        guidance_scale,
        guidance_rescale,
    )


def _ddim_update(schedule, xt, eps, index, clip_denoised):
    """Deterministic (eta=0) DDIM transition with a given eps."""
    take = lambda tbl: jnp.take(jnp.asarray(tbl), index).astype(xt.dtype)
    pred_x0 = (
        take(schedule.ddim_sqrt_recip_alphas_cumprod) * xt
        - take(schedule.ddim_sqrt_recipm1_alphas_cumprod) * eps
    )
    if clip_denoised:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    acp_prev = take(schedule.ddim_alphas_cumprod_prev)
    return jnp.sqrt(acp_prev) * pred_x0 + jnp.sqrt(1.0 - acp_prev) * eps


def plms_sample_loop(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    context: jnp.ndarray,
    shape: tuple[int, ...],
    key: jax.Array,
    guidance_scale: float = 5.0,
    clip_denoised: bool = False,
    init_noise: jnp.ndarray | None = None,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """PLMS/PNDM sampling: one model call per step, eps history of 3.

    Order ramps 1 -> 4 (Adams-Bashforth coefficients) as the history
    fills; thereafter each step uses
      eps' = (55 e - 59 e1 + 37 e2 - 9 e3) / 24.
    """
    num_steps = len(schedule.ddim_steps)
    if init_noise is None:
        xt = jax.random.normal(key, shape, dtype=context.dtype)
    else:
        xt = init_noise

    def order1(e, e1, e2, e3):
        return e

    def order2(e, e1, e2, e3):
        return (3.0 * e - e1) / 2.0

    def order3(e, e1, e2, e3):
        return (23.0 * e - 16.0 * e1 + 5.0 * e2) / 12.0

    def order4(e, e1, e2, e3):
        return (55.0 * e - 59.0 * e1 + 37.0 * e2 - 9.0 * e3) / 24.0

    def body(carry, index):
        xt, eps_buf, count = carry
        e = _cfg_eps(eps_model, schedule, xt, context, index, guidance_scale,
                     guidance_rescale)
        e1, e2, e3 = eps_buf[0], eps_buf[1], eps_buf[2]
        e_prime = jax.lax.switch(
            jnp.minimum(count, 3), (order1, order2, order3, order4),
            e, e1, e2, e3,
        )
        x_prev = _ddim_update(schedule, xt, e_prime, index, clip_denoised)
        new_buf = jnp.stack([e, e1, e2])
        return (x_prev, new_buf, count + 1), None

    eps_buf0 = jnp.zeros((3, *shape), dtype=context.dtype)
    (x0, _, _), _ = jax.lax.scan(
        body,
        (xt, eps_buf0, jnp.int32(0)),
        jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32),
    )
    return x0


def dpm_solver_pp_2m_sample_loop(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    context: jnp.ndarray,
    shape: tuple[int, ...],
    key: jax.Array,
    guidance_scale: float = 5.0,
    clip_denoised: bool = False,
    init_noise: jnp.ndarray | None = None,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """DPM-Solver++(2M): second-order multistep in data-prediction form.

    With lambda = log(alpha/sigma) (alpha = sqrt(acp), sigma = sqrt(1-acp)),
    each transition from the current ddim index to its 'prev' entry is
      x <- (sigma_prev/sigma) x - alpha_prev (exp(-h) - 1) D,
      h = lambda_prev - lambda,
      D = (1 + 1/(2r)) x0 - 1/(2r) x0_last,   r = h_last / h
    (first step: D = x0).  One model call per step.
    """
    num_steps = len(schedule.ddim_steps)
    if init_noise is None:
        xt = jax.random.normal(key, shape, dtype=context.dtype)
    else:
        xt = init_noise

    acp = jnp.asarray(schedule.ddim_alphas_cumprod, jnp.float32)
    acp_prev = jnp.asarray(schedule.ddim_alphas_cumprod_prev, jnp.float32)
    alpha, sigma = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
    alpha_p, sigma_p = jnp.sqrt(acp_prev), jnp.sqrt(1.0 - acp_prev)
    lam = jnp.log(alpha / sigma)
    lam_p = jnp.log(alpha_p / sigma_p)

    def body(carry, index):
        xt, x0_last, h_last, count = carry
        e = _cfg_eps(eps_model, schedule, xt, context, index, guidance_scale,
                     guidance_rescale)

        a_i = alpha[index].astype(xt.dtype)
        s_i = sigma[index].astype(xt.dtype)
        x0 = (xt - s_i * e) / a_i
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)

        h = lam_p[index] - lam[index]
        r = h_last / h
        coef = 1.0 / (2.0 * r)
        d_multistep = (1.0 + coef).astype(xt.dtype) * x0 - coef.astype(
            xt.dtype
        ) * x0_last
        d = jnp.where(count == 0, x0, d_multistep)

        x_next = (
            (sigma_p[index] / sigma[index]).astype(xt.dtype) * xt
            - (alpha_p[index] * jnp.expm1(-h)).astype(xt.dtype) * d
        )
        return (x_next, x0, h, count + 1), None

    (x0, _, _, _), _ = jax.lax.scan(
        body,
        (xt, jnp.zeros(shape, context.dtype), jnp.float32(1.0), jnp.int32(0)),
        jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32),
    )
    return x0


def dpm_solver_pp_2m_sample_loop_deepcache(
    eps_model_full,
    eps_model_shallow,
    schedule: DiffusionSchedule,
    context: jnp.ndarray,
    shape: tuple[int, ...],
    key: jax.Array,
    guidance_scale: float = 5.0,
    cache_interval: int = 2,
    clip_denoised: bool = False,
    init_noise: jnp.ndarray | None = None,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """DPM-Solver++(2M) with DeepCache deep-feature reuse — the two
    fastest serving mechanisms composed: the solver cuts the *number* of
    U-Net evaluations (e.g. 20 instead of 50 DDIM steps), DeepCache cuts
    the *cost* of ``cache_interval - 1`` of every ``cache_interval`` of
    them (full U-Net at the group base, shallow levels against the cached
    deep boundary feature in between — models/unet.py shallow_cache).

    Same group/scan skeleton as ``sampler.ddim_sample_loop_deepcache`` but
    with the deterministic DPM-Solver++ multistep transition (the
    (x0_last, h_last) history threads through full and shallow steps
    alike), so no per-step PRNG keys are consumed.  ``cache_interval=1``
    is exactly ``dpm_solver_pp_2m_sample_loop``.

    Args:
      eps_model_full: (xt2 [2B], t [2B], context) -> (eps [2B], cache).
      eps_model_shallow: (xt2, t, context, cache) -> eps.
    """
    num_steps = len(schedule.ddim_steps)
    interval = max(int(cache_interval), 1)
    if init_noise is None:
        xt = jax.random.normal(key, shape, dtype=context.dtype)
    else:
        xt = init_noise
    ddim_steps = jnp.asarray(schedule.ddim_steps)

    acp = jnp.asarray(schedule.ddim_alphas_cumprod, jnp.float32)
    acp_prev = jnp.asarray(schedule.ddim_alphas_cumprod_prev, jnp.float32)
    alpha, sigma = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
    alpha_p, sigma_p = jnp.sqrt(acp_prev), jnp.sqrt(1.0 - acp_prev)
    lam = jnp.log(alpha / sigma)
    lam_p = jnp.log(alpha_p / sigma_p)

    def cfg(eps2):
        return apply_cfg(eps2, guidance_scale, guidance_rescale)

    def update(carry, index, e):
        """The dpm_solver_pp_2m_sample_loop transition with a given eps."""
        xt, x0_last, h_last, count = carry
        a_i = alpha[index].astype(xt.dtype)
        s_i = sigma[index].astype(xt.dtype)
        x0 = (xt - s_i * e) / a_i
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        h = lam_p[index] - lam[index]
        r = h_last / h
        coef = 1.0 / (2.0 * r)
        d_multistep = (1.0 + coef).astype(xt.dtype) * x0 - coef.astype(
            xt.dtype
        ) * x0_last
        d = jnp.where(count == 0, x0, d_multistep)
        x_next = (
            (sigma_p[index] / sigma[index]).astype(xt.dtype) * xt
            - (alpha_p[index] * jnp.expm1(-h)).astype(xt.dtype) * d
        )
        return (x_next, x0, h, count + 1)

    def t_of(carry, index):
        return jnp.full((carry[0].shape[0] * 2,), ddim_steps[index],
                        jnp.float32)

    def group(carry, base_index, n_steps):
        xt2 = jnp.concatenate([carry[0], carry[0]], axis=0)
        eps2, cache = eps_model_full(xt2, t_of(carry, base_index), context)
        carry = update(carry, base_index, cfg(eps2))
        for j in range(1, n_steps):
            index = base_index - j
            xt2 = jnp.concatenate([carry[0], carry[0]], axis=0)
            eps2 = eps_model_shallow(xt2, t_of(carry, index), context, cache)
            carry = update(carry, index, cfg(eps2))
        return carry

    num_groups, tail = divmod(num_steps, interval)
    carry0 = (xt, jnp.zeros(shape, context.dtype), jnp.float32(1.0),
              jnp.int32(0))

    def body(carry, g):
        base = num_steps - 1 - g * interval
        return group(carry, base, interval), None

    carry, _ = jax.lax.scan(
        body, carry0, jnp.arange(num_groups, dtype=jnp.int32)
    )
    if tail:
        carry = group(carry, jnp.int32(tail - 1), tail)
    return carry[0]
