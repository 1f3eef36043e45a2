"""Flash-attention kernel vs XLA reference (interpret mode on CPU; the same
kernel compiles natively on TPU — exercised by bench.py / __graft_entry__)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ldm_tf2_tpu.ops.attention import _xla_attention
from ldm_tf2_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "b,q_len,kv_len,h,s",
    [
        (1, 256, 256, 2, 40),   # self-attention, odd head dim (pad to 128)
        (2, 128, 77, 2, 64),    # cross-attention shape (kv 77)
        (1, 130, 130, 1, 128),  # non-multiple q/kv lengths
    ],
)
def test_flash_matches_xla(b, q_len, kv_len, h, s):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, q_len, h, s), jnp.float32)
    k = jax.random.normal(keys[1], (b, kv_len, h, s), jnp.float32)
    v = jax.random.normal(keys[2], (b, kv_len, h, s), jnp.float32)
    scale = s**-0.5

    expected = _xla_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_xla():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    b, t, h, s = 1, 64, 2, 32
    q = jax.random.normal(keys[0], (b, t, h, s))
    k = jax.random.normal(keys[1], (b, t, h, s))
    v = jax.random.normal(keys[2], (b, t, h, s))
    scale = s**-0.5

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)
