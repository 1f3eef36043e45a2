"""DDIM/DDPM reverse-process sampling with classifier-free guidance.

TPU-native re-design of the reference's sampler
(/root/reference/model_runners.py:437-575).  Key differences from the
reference, all motivated by the XLA compilation model:

* The whole pipeline — text encoding, the S-step denoising loop, and the
  autoencoder decode — is **one jitted function**; the loop is a
  ``lax.scan`` over the DDIM index (the reference uses a graph-level
  ``tf.while_loop`` and leaves text encode + decode outside any
  ``tf.function``, model_runners.py:474-509).
* PRNG state is an explicit key threaded through the scan carry (the
  reference calls stateful ``tf.random.normal`` per step,
  model_runners.py:466).
* Classifier-free guidance runs as one U-Net call on a [2B] batch per step
  (same double-batch trick as model_runners.py:451-452): the conditional /
  unconditional halves share all weights, so batching them doubles MXU
  utilization instead of doubling latency.
* The uncond/cond split is derived from the context shape instead of the
  reference's hard-coded ``context[:4]`` (model_runners.py:480-481 — a
  latent batch-size-4 assumption; SURVEY.md §7 "bugs to fix, not port").
* The progressive-capture variant records every ``record_freq``-th step with
  the same one-hot insert-mask trick (model_runners.py:543-551) but works —
  the reference's version calls a nonexistent method and has never run
  (model_runners.py:535).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ldm_tf2_tpu.diffusion.schedule import DiffusionSchedule

# An epsilon-model: (xt_doubled [2B,H,W,C], t [2B], context [2B,S,D]) -> eps.
EpsModel = Callable[..., jnp.ndarray]


def apply_cfg(eps2, guidance_scale, guidance_rescale=0.0):
    """Classifier-free-guidance combine over a doubled batch.

    ``eps2`` is the U-Net output on the [2B] CFG batch, uncond half first;
    returns ``eps_u + s * (eps_c - eps_u)`` (model_runners.py:451-453).
    The ``jnp.asarray(..., dtype)`` casts keep a *traced* f32 operand
    (serve_ldm's per-slot [B,1,1,1] arrays) from upcasting bf16 eps and
    breaking the scan-carry dtype.

    ``guidance_rescale`` (phi in Lin et al. 2023, "Common Diffusion Noise
    Schedules and Sample Steps are Flawed", §3.4 — additive beyond the
    reference) rescales the guided eps toward the per-example std of the
    conditional eps, correcting CFG's over-exposure at high scales:
    ``phi * eps_cfg * (std(eps_c)/std(eps_cfg)) + (1-phi) * eps_cfg``.
    A static 0.0 (the default) compiles to the exact reference path.
    """
    eps_uncond, eps_cond = jnp.split(eps2, 2, axis=0)
    scale = jnp.asarray(guidance_scale, dtype=eps_cond.dtype)
    eps = eps_uncond + scale * (eps_cond - eps_uncond)
    if isinstance(guidance_rescale, (int, float)) and guidance_rescale == 0.0:
        return eps
    axes = tuple(range(1, eps.ndim))
    std_cond = jnp.std(eps_cond, axis=axes, keepdims=True)
    std_cfg = jnp.maximum(
        jnp.std(eps, axis=axes, keepdims=True),
        jnp.asarray(1e-6, eps.dtype),
    )
    phi = jnp.asarray(guidance_rescale, dtype=eps.dtype)
    return phi * (eps * (std_cond / std_cfg)) + (1.0 - phi) * eps


def ddim_step(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    xt: jnp.ndarray,
    cond: jnp.ndarray,
    index: jnp.ndarray,
    key: jax.Array,
    guidance_scale: float = 1.0,
    clip_denoised: bool = False,
    guidance_rescale: float = 0.0,
    noise: jnp.ndarray | None = None,
):
    """One DDIM reverse step with CFG (model_runners.py:438-472).

    Args:
      eps_model: callable producing predicted noise for a doubled batch.
      xt: [B, h, w, c] current latents.
      cond: [2B, seq, d] context, uncond half first.
      index: scalar int32 index into the DDIM tables.
      key: PRNG key for the stochastic (eta > 0) term.
      noise: injected sigma-noise for trajectory-parity tests (the
        reference author's noise{index}.npy method, model_runners.py:467).
    Returns:
      (sample, pred_x0)
    """
    ddim_steps = jnp.asarray(schedule.ddim_steps)
    t = jnp.full((xt.shape[0] * 2,), ddim_steps[index], dtype=jnp.float32)

    eps = apply_cfg(
        eps_model(jnp.concatenate([xt, xt], axis=0), t, cond),
        guidance_scale,
        guidance_rescale,
    )
    return ddim_update(schedule, xt, eps, index, key, clip_denoised, noise)


def ddim_update(
    schedule: DiffusionSchedule,
    xt: jnp.ndarray,
    eps: jnp.ndarray,
    index: jnp.ndarray,
    key: jax.Array,
    clip_denoised: bool = False,
    noise: jnp.ndarray | None = None,
):
    """The post-epsilon DDIM update (model_runners.py:455-468): pred_x0
    from the recip-alpha tables, DDIM mean, eta-noise."""
    take = lambda tbl: jnp.take(jnp.asarray(tbl), index).astype(xt.dtype)
    pred_x0 = (
        take(schedule.ddim_sqrt_recip_alphas_cumprod) * xt
        - take(schedule.ddim_sqrt_recipm1_alphas_cumprod) * eps
    )
    if clip_denoised:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

    acp_prev = take(schedule.ddim_alphas_cumprod_prev)
    sigma = take(schedule.ddim_sigmas)
    mean = (
        jnp.sqrt(acp_prev) * pred_x0
        + jnp.sqrt(1.0 - acp_prev - sigma**2) * eps
    )
    if noise is None:
        noise = jax.random.normal(key, xt.shape, dtype=xt.dtype)
    return mean + sigma * noise, pred_x0


def ddim_sample_loop(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    context: jnp.ndarray,
    shape: tuple[int, ...],
    key: jax.Array,
    guidance_scale: float = 5.0,
    clip_denoised: bool = False,
    init_noise: jnp.ndarray | None = None,
    guidance_rescale: float = 0.0,
    step_noises: jnp.ndarray | None = None,
    return_trajectory: bool = False,
) -> jnp.ndarray:
    """Full S-step DDIM reverse process as a single lax.scan
    (model_runners.py:474-509, re-expressed on-device).

    Args:
      context: [2B, seq, d] text embeddings, uncond half first.
      shape: latent shape [B, h, w, c].
      key: PRNG key; split per step for the eta-noise.
      step_noises: [S, B, h, w, c] injected per-step sigma-noise in loop
        order (index S-1 .. 0) for eta>0 trajectory parity vs the
        reference (its author's noise{index}.npy hook,
        model_runners.py:467).  None draws from ``key`` per step.
      return_trajectory: also return the [S, B, h, w, c] per-step latent
        trajectory (drift-curve parity checks); zero cost when False.
    Returns:
      x0 latents [B, h, w, c]; with return_trajectory, (x0, trajectory).
    """
    num_steps = len(schedule.ddim_steps)
    key, init_key = jax.random.split(key)
    if init_noise is None:
        xt = jax.random.normal(init_key, shape, dtype=context.dtype)
    else:
        xt = init_noise  # injected for trajectory-parity tests
        # (the reference author did the same, model_runners.py:477)

    def body(carry, xs):
        index, noise = xs
        xt, key = carry
        key, step_key = jax.random.split(key)
        sample, _ = ddim_step(
            eps_model,
            schedule,
            xt,
            context,
            index,
            step_key,
            guidance_scale,
            clip_denoised,
            guidance_rescale,
            noise,
        )
        return (sample, key), (sample if return_trajectory else None)

    indices = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    (x0, _), traj = jax.lax.scan(body, (xt, key), (indices, step_noises))
    if return_trajectory:
        return x0, traj
    return x0


def ddim_sample_loop_deepcache(
    eps_model_full: EpsModel,
    eps_model_shallow: EpsModel,
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
    """DDIM loop with deep-feature caching (DeepCache, Ma et al. 2023 /
    encoder propagation, arXiv:2312.09608 — see PAPERS.md).

    The U-Net's deep levels change slowly across adjacent denoise steps.
    Every ``cache_interval``-th step runs the full U-Net and captures the
    deep boundary feature; the following ``cache_interval - 1`` steps run
    only the shallow levels against that cached feature (models/unet.py
    ``shallow_cache``/``return_cache``).  Measured on v5e at 256² b16
    (full pipeline, same session as the 6.50 img/s baseline): interval 2
    → 8.70 img/s (1.34×), interval 3 → 9.73 img/s (1.50×), at a small
    quality cost — an *opt-in* acceleration
    (``ldm_sampling.cache_interval``); the default path stays
    bit-identical to the reference semantics.

    Args:
      eps_model_full: (xt2 [2B], t [2B], context) -> (eps [2B], cache).
      eps_model_shallow: (xt2, t, context, cache) -> eps.
      cache_interval: run the full U-Net every this-many steps (1 = every
        step; equivalent to ``ddim_sample_loop``).
    """
    num_steps = len(schedule.ddim_steps)
    interval = max(int(cache_interval), 1)
    key, init_key = jax.random.split(key)
    if init_noise is None:
        xt = jax.random.normal(init_key, shape, dtype=context.dtype)
    else:
        xt = init_noise
    ddim_steps = jnp.asarray(schedule.ddim_steps)

    def cfg(eps2):
        return apply_cfg(eps2, guidance_scale, guidance_rescale)

    def full_step(xt, index, step_key):
        t = jnp.full((xt.shape[0] * 2,), ddim_steps[index], jnp.float32)
        eps2, cache = eps_model_full(
            jnp.concatenate([xt, xt], axis=0), t, context
        )
        sample, _ = ddim_update(
            schedule, xt, cfg(eps2), index, step_key, clip_denoised
        )
        return sample, cache

    def shallow_step(xt, cache, index, step_key):
        t = jnp.full((xt.shape[0] * 2,), ddim_steps[index], jnp.float32)
        eps2 = eps_model_shallow(
            jnp.concatenate([xt, xt], axis=0), t, context, cache
        )
        sample, _ = ddim_update(
            schedule, xt, cfg(eps2), index, step_key, clip_denoised
        )
        return sample

    def group(xt, key, base_index, n_steps):
        """One full step at ``base_index`` + n_steps-1 shallow steps
        (statically unrolled; n_steps <= interval)."""
        key, k0 = jax.random.split(key)
        xt, cache = full_step(xt, base_index, k0)
        for j in range(1, n_steps):
            key, kj = jax.random.split(key)
            xt = shallow_step(xt, cache, base_index - j, kj)
        return xt, key

    num_groups, tail = divmod(num_steps, interval)

    def body(carry, g):
        xt, key = carry
        base = num_steps - 1 - g * interval
        xt, key = group(xt, key, base, interval)
        return (xt, key), None

    (xt, key), _ = jax.lax.scan(
        body, (xt, key), jnp.arange(num_groups, dtype=jnp.int32)
    )
    if tail:
        xt, key = group(
            xt, key, jnp.int32(tail - 1), tail
        )
    return xt


def ddim_img2img_loop(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    context: jnp.ndarray,
    init_latent: jnp.ndarray,
    key: jax.Array,
    strength: float = 0.75,
    guidance_scale: float = 5.0,
    clip_denoised: bool = False,
    mask: jnp.ndarray | None = None,
    init_noise: jnp.ndarray | None = None,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """SDEdit-style image-to-image + latent inpainting (additive — the
    reference CLI is txt2img-only; semantics follow SDEdit, Meng et al.
    2021, and the CompVis img2img script).

    Diffuses ``init_latent`` forward to ``round(strength * S)`` DDIM steps
    of noise (q_sample on the full-timeline tables), then runs only those
    reverse steps.  With ``mask`` (1 = regenerate, 0 = keep), the kept
    region is re-imposed after every step at that step's exact noise level
    (freshly drawn forward noise), so the composite stays on the forward
    marginal and the final output's kept region is the init latent at the
    near-zero terminal noise level.

    Args:
      context: [2B, seq, d] text embeddings, uncond half first.
      init_latent: [B, h, w, c] init-image latents, already multiplied by
        ``scale_factor``.
      strength: fraction of the DDIM schedule to traverse (0 = return
        ``init_latent`` unchanged, 1 = start from almost-pure noise).
      mask: optional latent-resolution float mask broadcastable to
        ``init_latent`` (1 = regenerate, 0 = keep).
      init_noise: injected forward noise for trajectory tests.
    Returns:
      x0 latents [B, h, w, c].
    """
    num_steps = len(schedule.ddim_steps)
    if not 0.0 <= strength <= 1.0:
        raise ValueError(f"strength must be in [0, 1], got {strength}")
    t_enc = int(round(float(strength) * num_steps))
    if t_enc == 0:
        return init_latent
    key, noise_key = jax.random.split(key)
    noise0 = (
        jax.random.normal(noise_key, init_latent.shape, init_latent.dtype)
        if init_noise is None
        else init_noise
    )
    from ldm_tf2_tpu.diffusion.losses import q_sample

    t_start = jnp.full(
        (init_latent.shape[0],),
        int(schedule.ddim_steps[t_enc - 1]),
        jnp.int32,
    )
    xt = q_sample(
        jnp.asarray(schedule.sqrt_alphas_cumprod),
        jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod),
        init_latent,
        t_start,
        noise0,
    )

    def body(carry, index):
        xt, key = carry
        key, step_key, blend_key = jax.random.split(key, 3)
        sample, _ = ddim_step(
            eps_model,
            schedule,
            xt,
            context,
            index,
            step_key,
            guidance_scale,
            clip_denoised,
            guidance_rescale,
        )
        if mask is not None:
            acp_prev = jnp.take(
                jnp.asarray(schedule.ddim_alphas_cumprod_prev), index
            ).astype(sample.dtype)
            keep_noise = jax.random.normal(
                blend_key, sample.shape, sample.dtype
            )
            keep = (
                jnp.sqrt(acp_prev) * init_latent.astype(sample.dtype)
                + jnp.sqrt(jnp.maximum(1.0 - acp_prev, 0.0)) * keep_noise
            )
            # cast: an f32 mask must not upcast a bf16 scan carry
            m = mask.astype(sample.dtype)
            sample = m * sample + (1.0 - m) * keep
        return (sample, key), None

    (x0, _), _ = jax.lax.scan(
        body, (xt, key), jnp.arange(t_enc - 1, -1, -1, dtype=jnp.int32)
    )
    if mask is not None:
        # Terminal exactness: the kept region is the init latent itself
        # (the loop leaves it at the acp_prev[0] ~ 1 noise level).
        m = mask.astype(x0.dtype)
        x0 = m * x0 + (1.0 - m) * init_latent.astype(x0.dtype)
    return x0


def ddim_sample_loop_progressive(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    context: jnp.ndarray,
    shape: tuple[int, ...],
    key: jax.Array,
    guidance_scale: float = 5.0,
    record_freq: int = 5,
    clip_denoised: bool = False,
    guidance_rescale: float = 0.0,
):
    """DDIM loop that additionally records every ``record_freq``-th
    intermediate sample and pred_x0 (model_runners.py:511-575, fixed).

    Returns:
      (x0, sample_progress, pred_x0_progress) where the progress tensors are
      [B, num_records, h, w, c] (latent space; the caller decodes).
    """
    num_steps = len(schedule.ddim_steps)
    num_records = num_steps // record_freq
    key, init_key = jax.random.split(key)
    xt = jax.random.normal(init_key, shape, dtype=context.dtype)

    sample_progress = jnp.zeros(
        (shape[0], num_records, *shape[1:]), dtype=context.dtype
    )
    pred_x0_progress = jnp.zeros_like(sample_progress)

    def body(carry, index):
        xt, key, sample_prog, pred_x0_prog = carry
        key, step_key = jax.random.split(key)
        sample, pred_x0 = ddim_step(
            eps_model,
            schedule,
            xt,
            context,
            index,
            step_key,
            guidance_scale,
            clip_denoised,
            guidance_rescale,
        )
        # One-hot insert into the record slot index // record_freq
        # (model_runners.py:543-551).
        insert_mask = (
            (index // record_freq) == jnp.arange(num_records)
        ).astype(sample.dtype)
        mask = insert_mask.reshape(1, num_records, *([1] * (sample.ndim - 1)))
        sample_prog = mask * sample[:, None] + (1.0 - mask) * sample_prog
        pred_x0_prog = mask * pred_x0[:, None] + (1.0 - mask) * pred_x0_prog
        return (sample, key, sample_prog, pred_x0_prog), None

    (x0, _, sample_prog, pred_x0_prog), _ = jax.lax.scan(
        body,
        (xt, key, sample_progress, pred_x0_progress),
        jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32),
    )
    return x0, sample_prog, pred_x0_prog


def ddpm_step(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    xt: jnp.ndarray,
    cond: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    guidance_scale: float = 1.0,
    clip_denoised: bool = True,
    guidance_rescale: float = 0.0,
):
    """One ancestral (DDPM) reverse step using the posterior tables
    (model_runners.py:392-404).  Provided for schedule completeness; the
    reference CLI only exercises DDIM."""
    t_vec = jnp.full((xt.shape[0] * 2,), t, dtype=jnp.float32)
    eps = apply_cfg(
        eps_model(jnp.concatenate([xt, xt], axis=0), t_vec, cond),
        guidance_scale,
        guidance_rescale,
    )

    take = lambda tbl: jnp.take(jnp.asarray(tbl), t).astype(xt.dtype)
    pred_x0 = (
        take(schedule.sqrt_recip_alphas_cumprod) * xt
        - take(schedule.sqrt_recipm1_alphas_cumprod) * eps
    )
    if clip_denoised:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

    mean = (
        take(schedule.posterior_mean_coef1) * pred_x0
        + take(schedule.posterior_mean_coef2) * xt
    )
    log_var = take(schedule.posterior_log_variance_clipped)
    noise = jax.random.normal(key, xt.shape, dtype=xt.dtype)
    nonzero = (t > 0).astype(xt.dtype)
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise, pred_x0


def ddpm_sample_loop(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    context: jnp.ndarray,
    shape: tuple[int, ...],
    key: jax.Array,
    guidance_scale: float = 5.0,
    clip_denoised: bool = True,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """Full T-step ancestral sampling loop as a lax.scan."""
    key, init_key = jax.random.split(key)
    xt = jax.random.normal(init_key, shape, dtype=context.dtype)

    def body(carry, t):
        xt, key = carry
        key, step_key = jax.random.split(key)
        sample, _ = ddpm_step(
            eps_model, schedule, xt, context, t, step_key, guidance_scale,
            clip_denoised, guidance_rescale,
        )
        return (sample, key), None

    (x0, _), _ = jax.lax.scan(
        body,
        (xt, key),
        jnp.arange(schedule.num_steps - 1, -1, -1, dtype=jnp.int32),
    )
    return x0
