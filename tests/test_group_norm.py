"""Fused GroupNorm kernel vs XLA reference and vs flax.linen.GroupNorm
(interpret mode on CPU; the kernel compiles natively on TPU — exercised by
bench.py / tools/profile_pipeline.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ldm_tf2_tpu.ops.group_norm import (
    GroupNorm,
    _pallas_group_norm,
    _xla_group_norm,
    group_norm,
    set_groupnorm_impl,
)


@pytest.mark.parametrize(
    "b,h,w,c,groups,activate",
    [
        (2, 8, 8, 128, 32, False),
        (2, 8, 8, 128, 32, True),
        (1, 32, 32, 256, 32, True),
        (2, 4, 4, 512, 32, False),
    ],
)
def test_pallas_matches_xla(b, h, w, c, groups, activate):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.float32) * 2.0 + 0.3
    gamma = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1

    expected = _xla_group_norm(x, gamma, beta, groups, 1e-5, activate)
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_group_norm(x, gamma, beta, groups, 1e-5, activate)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_matches_flax_groupnorm():
    """The XLA fallback (and hence the kernel, by the test above) must be a
    drop-in for flax.linen.GroupNorm's numerics."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 8, 8, 64), jnp.float32)
    flax_gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    variables = flax_gn.init(key, x)
    expected = flax_gn.apply(variables, x)
    got = _xla_group_norm(
        x,
        variables["params"]["scale"],
        variables["params"]["bias"],
        32,
        1e-6,
        False,
    )
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_module_param_compat_and_dispatch():
    """ops.GroupNorm module exposes the same params as nn.GroupNorm
    (scale/bias of [C]) and its silu fusion equals GN followed by silu."""
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 64), jnp.float32)
    mod = GroupNorm(num_groups=32, epsilon=1e-5, activation="silu")
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert set(variables["params"]) == {"scale", "bias"}
    assert variables["params"]["scale"].shape == (64,)

    got = mod.apply(variables, x)
    ref_mod = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    expected = nn.silu(ref_mod.apply(variables, x))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    c = 128
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, c), jnp.float32)
    gamma = jnp.ones((c,)) * 1.1
    beta = jnp.zeros((c,)) + 0.05

    def loss_ref(x, gamma, beta):
        return jnp.sum(_xla_group_norm(x, gamma, beta, 32, 1e-5, True) ** 2)

    def loss_fused(x, gamma, beta):
        set_groupnorm_impl("pallas")
        try:
            return jnp.sum(group_norm(x, gamma, beta, 32, 1e-5, True) ** 2)
        finally:
            set_groupnorm_impl("auto")

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "b,hw,c,groups,activate",
    [
        (2, 64, 128, 32, True),        # single spatial block
        (1, 16384, 512, 32, False),    # forces streaming spatial blocks
        (2, 1024, 320, 32, True),      # non-128-multiple channels
    ],
)
def test_stats_hybrid_matches_xla(b, hw, c, groups, activate):
    from ldm_tf2_tpu.ops.group_norm import _stats_hybrid_group_norm

    x = jax.random.normal(jax.random.PRNGKey(6), (b, hw, 1, c), jnp.float32)
    gamma = jax.random.normal(jax.random.PRNGKey(7), (c,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(8), (c,)) * 0.1

    expected = _xla_group_norm(x, gamma, beta, groups, 1e-5, activate)
    with pltpu.force_tpu_interpret_mode():
        got = _stats_hybrid_group_norm(x, gamma, beta, groups, 1e-5, activate)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_channels_not_divisible_raises():
    x = jnp.zeros((1, 4, 4, 100))
    with pytest.raises(ValueError):
        group_norm(x, jnp.ones((100,)), jnp.zeros((100,)), num_groups=32)


def test_mxu_stats_variant_matches_flax():
    """The einsum-stats GroupNorm (default on 'auto') must match
    flax.linen.GroupNorm numerics."""
    from ldm_tf2_tpu.ops.group_norm import _mxu_stats_group_norm

    for c, groups in ((64, 32), (320, 32), (128, 16)):
        x = jax.random.normal(
            jax.random.PRNGKey(c), (2, 8, 8, c), jnp.float32
        ) * 1.7 + 0.4
        gamma = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
        beta = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
        flax_gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
        expected = flax_gn.apply(
            {"params": {"scale": gamma, "bias": beta}}, x
        )
        got = _mxu_stats_group_norm(x, gamma, beta, groups, 1e-5, False)
        np.testing.assert_allclose(got, expected, rtol=3e-5, atol=3e-5)
