"""Sampler math + integration tests (SURVEY.md §4 strategy #1/#3)."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tf2_tpu.diffusion import make_schedule
from ldm_tf2_tpu.diffusion.sampler import (
    ddim_sample_loop,
    ddim_sample_loop_progressive,
    ddim_step,
    ddpm_sample_loop,
)


import pytest
pytestmark = pytest.mark.fast  # per-session green-check tier

def zero_eps_model(xt, t, cond):
    return jnp.zeros_like(xt)


def test_ddim_step_closed_form():
    """With eps == 0 and eta == 0: sample = sqrt(acp_prev) * sqrt(1/acp) * xt
    (model_runners.py:455-464)."""
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    xt = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    cond = jnp.zeros((4, 7, 8))
    index = jnp.int32(5)
    sample, pred_x0 = ddim_step(
        zero_eps_model, schedule, xt, cond, index, jax.random.PRNGKey(1)
    )
    c_recip = schedule.ddim_sqrt_recip_alphas_cumprod[5]
    acp_prev = schedule.ddim_alphas_cumprod_prev[5]
    np.testing.assert_allclose(pred_x0, c_recip * xt, rtol=1e-5)
    np.testing.assert_allclose(
        sample, np.sqrt(acp_prev) * c_recip * np.asarray(xt), rtol=1e-5
    )


def test_ddim_step_cfg_mixing():
    """eps = eps_uncond + s * (eps_cond - eps_uncond) (model_runners.py:453)."""
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    xt = jnp.ones((2, 2, 2, 1))

    def eps_model(x2, t, cond):
        # uncond half predicts 0, cond half predicts 1
        b = x2.shape[0] // 2
        return jnp.concatenate(
            [jnp.zeros_like(x2[:b]), jnp.ones_like(x2[b:])], axis=0
        )

    cond = jnp.zeros((4, 3, 4))
    idx = jnp.int32(3)
    s = 5.0
    sample, pred_x0 = ddim_step(
        eps_model, schedule, xt, cond, idx, jax.random.PRNGKey(0),
        guidance_scale=s,
    )
    # effective eps = 0 + 5*(1-0) = 5
    c_recip = schedule.ddim_sqrt_recip_alphas_cumprod[3]
    c_recipm1 = schedule.ddim_sqrt_recipm1_alphas_cumprod[3]
    np.testing.assert_allclose(
        pred_x0, c_recip * np.asarray(xt) - c_recipm1 * 5.0, rtol=1e-5
    )


def test_apply_cfg_rescale():
    """guidance_rescale (Lin et al. 2023): phi=0 is the exact CFG combine;
    phi=1 restores the conditional eps's per-example std; intermediate phi
    interpolates."""
    from ldm_tf2_tpu.diffusion.sampler import apply_cfg

    key = jax.random.PRNGKey(0)
    ku, kc = jax.random.split(key)
    eps_u = jax.random.normal(ku, (3, 4, 4, 2))
    eps_c = 2.5 * jax.random.normal(kc, (3, 4, 4, 2))
    eps2 = jnp.concatenate([eps_u, eps_c], axis=0)
    s = 7.5

    plain = np.asarray(eps_u + s * (eps_c - eps_u))
    np.testing.assert_array_equal(apply_cfg(eps2, s), plain)
    np.testing.assert_array_equal(apply_cfg(eps2, s, 0.0), plain)

    full = np.asarray(apply_cfg(eps2, s, 1.0))
    std_c = np.asarray(eps_c).std(axis=(1, 2, 3))
    np.testing.assert_allclose(
        full.std(axis=(1, 2, 3)), std_c, rtol=2e-2
    )

    half = np.asarray(apply_cfg(eps2, s, 0.5))
    rescaled = plain * (
        np.asarray(eps_c).std(axis=(1, 2, 3), keepdims=True)[..., None, None]
        / plain.std(axis=(1, 2, 3), keepdims=True)[..., None, None]
    ).reshape(3, 1, 1, 1)
    np.testing.assert_allclose(
        half, 0.5 * rescaled + 0.5 * plain, rtol=1e-4, atol=1e-5
    )


def test_apply_cfg_rescale_preserves_bf16_and_traced_phi():
    """A traced f32 phi (serve-style operand) must not upcast bf16 eps."""
    from ldm_tf2_tpu.diffusion.sampler import apply_cfg

    eps2 = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 1)).astype(
        jnp.bfloat16
    )

    out = jax.jit(
        lambda e, phi: apply_cfg(e, jnp.float32(5.0), phi)
    )(eps2, jnp.float32(0.7))
    assert out.dtype == jnp.bfloat16


def test_ddim_loop_guidance_rescale_changes_output():
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)

    def eps_model(x2, t, cond):
        b = x2.shape[0] // 2
        return jnp.concatenate([0.1 * x2[:b], 0.3 * x2[b:]], axis=0)

    context = jnp.zeros((4, 3, 4), jnp.float32)
    kwargs = dict(guidance_scale=5.0)
    base = ddim_sample_loop(
        eps_model, schedule, context, (2, 4, 4, 1), jax.random.PRNGKey(0),
        **kwargs,
    )
    resc = ddim_sample_loop(
        eps_model, schedule, context, (2, 4, 4, 1), jax.random.PRNGKey(0),
        guidance_rescale=0.7, **kwargs,
    )
    zero = ddim_sample_loop(
        eps_model, schedule, context, (2, 4, 4, 1), jax.random.PRNGKey(0),
        guidance_rescale=0.0, **kwargs,
    )
    np.testing.assert_array_equal(base, zero)  # 0.0 is the exact path
    assert not np.array_equal(np.asarray(base), np.asarray(resc))
    assert np.isfinite(np.asarray(resc)).all()


def test_ddim_loop_shapes_and_determinism():
    schedule = make_schedule(num_steps=50, num_ddim_steps=5)
    context = jnp.zeros((4, 7, 8))  # 2B with B=2
    shape = (2, 4, 4, 3)
    key = jax.random.PRNGKey(42)
    x0 = ddim_sample_loop(zero_eps_model, schedule, context, shape, key)
    assert x0.shape == shape
    x0b = ddim_sample_loop(zero_eps_model, schedule, context, shape, key)
    np.testing.assert_array_equal(x0, x0b)
    # jits cleanly
    jitted = jax.jit(
        lambda ctx, k: ddim_sample_loop(zero_eps_model, schedule, ctx, shape, k)
    )
    np.testing.assert_allclose(jitted(context, key), x0, rtol=2e-5, atol=1e-6)


def test_ddim_progressive_records():
    schedule = make_schedule(num_steps=50, num_ddim_steps=10)
    context = jnp.zeros((2, 7, 8))
    shape = (1, 4, 4, 2)
    x0, sample_prog, pred_prog = ddim_sample_loop_progressive(
        zero_eps_model, schedule, context, shape, jax.random.PRNGKey(0),
        record_freq=5,
    )
    assert x0.shape == shape
    assert sample_prog.shape == (1, 2, 4, 4, 2)
    assert pred_prog.shape == (1, 2, 4, 4, 2)
    # slot 0 records index 0..4's last write (index 0, the final step) ==
    # the returned x0
    np.testing.assert_allclose(sample_prog[:, 0], x0, rtol=1e-6)


def test_ddpm_loop_runs():
    schedule = make_schedule(num_steps=10, num_ddim_steps=10)
    context = jnp.zeros((2, 7, 8))
    shape = (1, 4, 4, 2)
    x0 = ddpm_sample_loop(
        zero_eps_model, schedule, context, shape, jax.random.PRNGKey(0)
    )
    assert x0.shape == shape
    assert np.all(np.isfinite(x0))


def test_traced_guidance_array_keeps_bf16_carry():
    """serve_ldm passes guidance as a traced f32 [B,1,1,1] operand; the CFG
    mix must not upcast bf16 latents (regression: scan carry dtype mismatch
    under compute_dtype bfloat16 — caught by the corpus eval's bf16 serve
    run, tools/eval_corpus_quality.py)."""
    from ldm_tf2_tpu.diffusion.sampler import ddim_sample_loop_deepcache
    from ldm_tf2_tpu.diffusion.solvers import (
        dpm_solver_pp_2m_sample_loop,
        plms_sample_loop,
    )

    schedule = make_schedule(num_steps=10, num_ddim_steps=5)
    shape = (2, 4, 4, 2)
    context = jnp.zeros((4, 7, 8), jnp.bfloat16)
    guidance = jnp.full((2, 1, 1, 1), 5.0, jnp.float32)  # traced, f32

    def eps_model(x2, t, cond):
        return x2 * jnp.bfloat16(0.01)

    loops = [ddim_sample_loop, plms_sample_loop, dpm_solver_pp_2m_sample_loop]
    for loop in loops:
        x0 = jax.jit(
            lambda g, loop=loop: loop(
                eps_model, schedule, context, shape, jax.random.PRNGKey(0), g
            )
        )(guidance)
        assert x0.dtype == jnp.bfloat16, loop.__name__
        assert np.all(np.isfinite(np.asarray(x0, np.float32)))

    def eps_full(x2, t, cond):
        return eps_model(x2, t, cond), x2[:, :2]

    def eps_shallow(x2, t, cond, cache):
        return eps_model(x2, t, cond)

    x0 = jax.jit(
        lambda g: ddim_sample_loop_deepcache(
            eps_full, eps_shallow, schedule, context, shape,
            jax.random.PRNGKey(0), g, cache_interval=2,
        )
    )(guidance)
    assert x0.dtype == jnp.bfloat16
