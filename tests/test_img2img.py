"""img2img / latent inpainting (diffusion/sampler.py ddim_img2img_loop).

Invariants:
  * strength 0 returns the init latent unchanged (no model call);
  * strength 1 runs the full schedule (matches ddim_sample_loop when fed
    the q_sampled start explicitly);
  * intermediate strength runs exactly round(strength*S) reverse steps;
  * an all-keep mask (0 everywhere) returns the init latent exactly;
  * a partial mask keeps the masked-out region exactly while the
    regenerate region actually changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.diffusion import make_schedule
from ldm_tf2_tpu.diffusion.losses import q_sample
from ldm_tf2_tpu.diffusion.sampler import (
    ddim_img2img_loop,
    ddim_sample_loop,
)


def _setup(num_ddim_steps=8, batch=2, size=8, c=4, d=16):
    rng = np.random.RandomState(0)
    schedule = make_schedule(
        beta_start=0.00085, beta_end=0.012, num_ddim_steps=num_ddim_steps
    )
    context = jnp.asarray(rng.randn(2 * batch, 3, d), jnp.float32)
    init_latent = jnp.asarray(rng.randn(batch, size, size, c), jnp.float32)

    calls = []

    def eps_model(x, t, ctx):
        calls.append(1)
        # cheap deterministic pseudo-model: keeps the loop numerics honest
        return 0.1 * x + 0.01 * t[:, None, None, None].astype(x.dtype)

    return schedule, context, init_latent, eps_model, calls


def test_strength_zero_is_identity():
    schedule, context, init_latent, eps_model, calls = _setup()
    out = ddim_img2img_loop(
        eps_model, schedule, context, init_latent, jax.random.PRNGKey(0),
        strength=0.0,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(init_latent))
    assert not calls


@pytest.mark.parametrize("strength,expected", [(0.5, 4), (0.8, 6), (1.0, 8)])
def test_step_count_matches_strength(strength, expected):
    assert int(round(strength * 8)) == expected  # the loop's t_enc rule
    schedule, context, init_latent, eps_model, _ = _setup()
    out = ddim_img2img_loop(
        eps_model, schedule, context, init_latent, jax.random.PRNGKey(0),
        strength=strength,
    )
    assert out.shape == init_latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_full_strength_matches_plain_loop_given_same_start():
    """strength=1 == ddim_sample_loop when both start from the identical
    q_sampled latent and PRNG carry."""
    schedule, context, init_latent, eps_model, _ = _setup()
    key = jax.random.PRNGKey(7)

    out_i2i = ddim_img2img_loop(
        eps_model, schedule, context, init_latent, key,
        strength=1.0, guidance_scale=2.0,
    )

    # replicate the img2img start: split once for the forward noise
    key2, noise_key = jax.random.split(key)
    noise0 = jax.random.normal(noise_key, init_latent.shape,
                               init_latent.dtype)
    t_start = jnp.full(
        (init_latent.shape[0],),
        int(schedule.ddim_steps[-1]),
        jnp.int32,
    )
    xt = q_sample(
        jnp.asarray(schedule.sqrt_alphas_cumprod),
        jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod),
        init_latent, t_start, noise0,
    )
    # plain loop consumes (key, init_key) then scans; img2img consumes
    # (key, noise_key) then scans with 3-way splits.  PRNG sequences differ
    # by design, so compare only the deterministic (eta=0) trajectory.
    assert schedule.eta == 0.0
    out_plain = ddim_sample_loop(
        eps_model, schedule, context, init_latent.shape, key2,
        guidance_scale=2.0, init_noise=xt,
    )
    np.testing.assert_allclose(
        np.asarray(out_i2i), np.asarray(out_plain), rtol=0, atol=1e-5
    )


def test_all_keep_mask_returns_init():
    schedule, context, init_latent, eps_model, _ = _setup()
    mask = jnp.zeros_like(init_latent[..., :1])
    out = ddim_img2img_loop(
        eps_model, schedule, context, init_latent, jax.random.PRNGKey(1),
        strength=1.0, mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(init_latent), rtol=0, atol=1e-6
    )


def test_partial_mask_keeps_and_regenerates():
    schedule, context, init_latent, eps_model, _ = _setup()
    mask = jnp.zeros((1, 8, 8, 1), jnp.float32)
    mask = mask.at[:, :4].set(1.0)  # top half regenerated
    out = ddim_img2img_loop(
        eps_model, schedule, context, init_latent, jax.random.PRNGKey(2),
        strength=1.0, mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(out[:, 4:]), np.asarray(init_latent[:, 4:]),
        rtol=0, atol=1e-6,
    )
    top_delta = float(jnp.max(jnp.abs(out[:, :4] - init_latent[:, :4])))
    assert top_delta > 0.1, top_delta


def test_invalid_strength_raises():
    schedule, context, init_latent, eps_model, _ = _setup()
    with pytest.raises(ValueError, match="strength"):
        ddim_img2img_loop(
            eps_model, schedule, context, init_latent,
            jax.random.PRNGKey(0), strength=1.5,
        )


def test_img2img_bf16_carry_with_f32_mask():
    """An f32 latent mask must not upcast a bf16 scan carry (same
    regression class as the serve guidance operand: the mask blend runs
    inside the scan body under compute_dtype bfloat16)."""
    schedule, context, init_latent, eps_model, _ = _setup()
    context = context.astype(jnp.bfloat16)
    init_latent = init_latent.astype(jnp.bfloat16)
    mask = jnp.zeros(init_latent.shape[:3] + (1,), jnp.float32).at[
        :, :4
    ].set(1.0)  # f32 on purpose
    x0 = jax.jit(
        lambda lat, m: ddim_img2img_loop(
            eps_model, schedule, context, lat, jax.random.PRNGKey(0),
            strength=0.5, guidance_scale=2.0, mask=m,
        )
    )(init_latent, mask)
    assert x0.dtype == jnp.bfloat16
    # kept region is the init latent exactly
    np.testing.assert_array_equal(
        np.asarray(x0[:, 4:], np.float32),
        np.asarray(init_latent[:, 4:], np.float32),
    )
