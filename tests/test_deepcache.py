"""DeepCache-style deep-feature reuse (models/unet.py shallow_cache /
diffusion/sampler.py ddim_sample_loop_deepcache).

Key invariants:
  * a shallow pass fed a *fresh* cache is exactly the full pass (the
    shallow levels recompute identically and the boundary feature is the
    same tensor);
  * the cached sample loop at interval 1 equals ddim_sample_loop exactly
    (same PRNG splitting sequence);
  * interval > 1 stays close to the exact trajectory (the acceleration's
    quality contract);
  * the param tree is unchanged (cache args are call-time only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.diffusion import make_schedule
from ldm_tf2_tpu.diffusion.sampler import (
    ddim_sample_loop,
    ddim_sample_loop_deepcache,
)
from ldm_tf2_tpu.models.unet import UNet


def _tiny_unet(num_levels=3):
    return UNet(
        model_channels=32,
        out_channels=4,
        num_blocks=2,
        channel_mult=(1, 2, 4, 4)[:num_levels],
        num_heads=4,
        context_channels=32,
        dropout_rate=0.0,
    )


def _inputs(batch=2, size=16, seq=5, ctx_dim=32):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, size, size, 4), jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (batch,)), jnp.float32)
    ctx = jnp.asarray(rng.randn(batch, seq, ctx_dim), jnp.float32)
    return x, t, ctx


@pytest.mark.parametrize("num_levels,cache_levels", [
    (3, 1), (3, 2),
    # production depth: the full config's 4-level channel_mult
    (4, 1), (4, 3),
])
def test_shallow_with_fresh_cache_equals_full(num_levels, cache_levels):
    unet = _tiny_unet(num_levels)
    x, t, ctx = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    full = unet.apply({"params": params}, x, t, ctx)
    out, cache = unet.apply(
        {"params": params}, x, t, ctx,
        return_cache=True, cache_levels=cache_levels,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(full))
    shallow = unet.apply(
        {"params": params}, x, t, ctx,
        shallow_cache=cache, cache_levels=cache_levels,
    )
    np.testing.assert_array_equal(np.asarray(shallow), np.asarray(full))


def test_cache_is_stale_tolerant():
    """A shallow pass with the cache from a *different* xt still produces
    finite output of the right shape (the acceleration's approximation)."""
    unet = _tiny_unet()
    x, t, ctx = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    _, cache = unet.apply(
        {"params": params}, x, t, ctx, return_cache=True
    )
    x2 = x + 0.1
    out = unet.apply(
        {"params": params}, x2, t, ctx, shallow_cache=cache
    )
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_param_tree_unchanged():
    unet = _tiny_unet()
    x, t, ctx = _inputs()
    p_plain = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    p_cache = unet.init(
        jax.random.PRNGKey(0), x, t, ctx, return_cache=True
    )["params"]
    assert jax.tree.structure(p_plain) == jax.tree.structure(p_cache)
    chex = jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p_plain, p_cache
    )
    assert all(jax.tree.leaves(chex))


def test_invalid_cache_levels():
    unet = _tiny_unet()
    x, t, ctx = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    with pytest.raises(ValueError):
        unet.apply(
            {"params": params}, x, t, ctx,
            return_cache=True, cache_levels=3,
        )


def _eps_models(unet, params):
    eps_full = lambda x, t, c: unet.apply(
        {"params": params}, x, t, c, return_cache=True
    )
    eps_shallow = lambda x, t, c, cache: unet.apply(
        {"params": params}, x, t, c, shallow_cache=cache
    )
    eps_plain = lambda x, t, c: unet.apply({"params": params}, x, t, c)
    return eps_full, eps_shallow, eps_plain


@pytest.mark.parametrize("num_ddim_steps", [6, 7])
def test_interval_one_equals_exact_loop(num_ddim_steps):
    unet = _tiny_unet()
    x, t, ctx = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    eps_full, eps_shallow, eps_plain = _eps_models(unet, params)
    schedule = make_schedule(
        beta_start=0.00085, beta_end=0.012, num_ddim_steps=num_ddim_steps
    )
    context = jnp.concatenate([ctx, ctx], axis=0)
    key = jax.random.PRNGKey(3)
    shape = (2, 16, 16, 4)

    exact = ddim_sample_loop(
        eps_plain, schedule, context, shape, key, guidance_scale=3.0
    )
    cached = ddim_sample_loop_deepcache(
        eps_full, eps_shallow, schedule, context, shape, key,
        guidance_scale=3.0, cache_interval=1,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(exact), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("interval", [2, 3])
def test_interval_gt_one_tracks_exact_loop(interval):
    """Quality contract: with a tiny model the cached trajectory must stay
    much closer to the exact trajectory than the raw-noise scale."""
    unet = _tiny_unet()
    x, t, ctx = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    eps_full, eps_shallow, eps_plain = _eps_models(unet, params)
    schedule = make_schedule(
        beta_start=0.00085, beta_end=0.012, num_ddim_steps=7
    )
    context = jnp.concatenate([ctx, ctx], axis=0)
    key = jax.random.PRNGKey(3)
    shape = (2, 16, 16, 4)

    exact = ddim_sample_loop(
        eps_plain, schedule, context, shape, key, guidance_scale=3.0
    )
    cached = ddim_sample_loop_deepcache(
        eps_full, eps_shallow, schedule, context, shape, key,
        guidance_scale=3.0, cache_interval=interval,
    )
    assert bool(jnp.all(jnp.isfinite(cached)))
    err = float(jnp.sqrt(jnp.mean((cached - exact) ** 2)))
    scale = float(jnp.sqrt(jnp.mean(exact**2)))
    assert err < 0.5 * scale, (err, scale)


@pytest.mark.parametrize("num_ddim_steps", [6, 7])
def test_dpm_deepcache_interval_one_equals_exact_loop(num_ddim_steps):
    """DeepCache composed with DPM-Solver++(2M)
    (diffusion/solvers.py dpm_solver_pp_2m_sample_loop_deepcache):
    interval 1 is exactly the plain dpm loop."""
    from ldm_tf2_tpu.diffusion.solvers import (
        dpm_solver_pp_2m_sample_loop,
        dpm_solver_pp_2m_sample_loop_deepcache,
    )

    unet = _tiny_unet()
    x, t, ctx = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    eps_full, eps_shallow, eps_plain = _eps_models(unet, params)
    schedule = make_schedule(
        beta_start=0.00085, beta_end=0.012, num_ddim_steps=num_ddim_steps
    )
    context = jnp.concatenate([ctx, ctx], axis=0)
    key = jax.random.PRNGKey(3)
    shape = (2, 16, 16, 4)

    exact = dpm_solver_pp_2m_sample_loop(
        eps_plain, schedule, context, shape, key, guidance_scale=3.0
    )
    cached = dpm_solver_pp_2m_sample_loop_deepcache(
        eps_full, eps_shallow, schedule, context, shape, key,
        guidance_scale=3.0, cache_interval=1,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(exact), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("interval", [2, 3])
def test_dpm_deepcache_interval_gt_one_tracks_exact_loop(interval):
    """Composed quality contract: cached dpm trajectory stays much closer
    to the exact dpm trajectory than the signal scale."""
    from ldm_tf2_tpu.diffusion.solvers import (
        dpm_solver_pp_2m_sample_loop,
        dpm_solver_pp_2m_sample_loop_deepcache,
    )

    unet = _tiny_unet()
    x, t, ctx = _inputs()
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    eps_full, eps_shallow, eps_plain = _eps_models(unet, params)
    schedule = make_schedule(
        beta_start=0.00085, beta_end=0.012, num_ddim_steps=8
    )
    context = jnp.concatenate([ctx, ctx], axis=0)
    key = jax.random.PRNGKey(3)
    shape = (2, 16, 16, 4)

    exact = dpm_solver_pp_2m_sample_loop(
        eps_plain, schedule, context, shape, key, guidance_scale=3.0
    )
    cached = dpm_solver_pp_2m_sample_loop_deepcache(
        eps_full, eps_shallow, schedule, context, shape, key,
        guidance_scale=3.0, cache_interval=interval,
    )
    assert bool(jnp.all(jnp.isfinite(cached)))
    err = float(jnp.sqrt(jnp.mean((cached - exact) ** 2)))
    scale = float(jnp.sqrt(jnp.mean(exact**2)))
    assert err < 0.5 * scale, (err, scale)
