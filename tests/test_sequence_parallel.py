"""Ulysses sequence-parallel attention == single-device attention on the
virtual 8-device mesh (SURVEY.md §2.4 SP row; the head-shard/all_to_all
pattern for >=1024^2 spatial self-attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.ops.attention import dot_product_attention
from ldm_tf2_tpu.ops.sequence_parallel import sequence_parallel_attention
from ldm_tf2_tpu.parallel import create_mesh


@pytest.mark.parametrize(
    "b,tq,tkv,h,s",
    [
        (2, 256, 256, 8, 40),   # self-attention, U-Net level-0 head dim
        (1, 512, 512, 16, 64),  # more heads than devices
    ],
)
def test_matches_single_device(b, tq, tkv, h, s):
    mesh = create_mesh({"model": 8})
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, tq, h, s), jnp.float32)
    k = jax.random.normal(keys[1], (b, tkv, h, s), jnp.float32)
    v = jax.random.normal(keys[2], (b, tkv, h, s), jnp.float32)

    expected = dot_product_attention(q, k, v)
    got = sequence_parallel_attention(q, k, v, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )
    # output really is sequence-sharded over the axis
    assert "model" in str(got.sharding.spec)


def test_rejects_indivisible_heads():
    mesh = create_mesh({"model": 8})
    x = jnp.zeros((1, 64, 4, 16))  # 4 heads on 8 devices
    with pytest.raises(ValueError):
        sequence_parallel_attention(x, x, x, mesh)


def test_model_level_dispatch_matches_local():
    """enable_sequence_parallel routes a full UNet forward through Ulysses
    attention (self-attn only; kv=77 cross-attn falls through the guards)
    and the result matches the local path."""
    from ldm_tf2_tpu.models import UNet
    from ldm_tf2_tpu.ops.attention import (
        disable_sequence_parallel,
        enable_sequence_parallel,
    )

    mesh = create_mesh({"data": 1, "model": 8})
    unet = UNet(
        model_channels=32, out_channels=4, num_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=8, context_channels=24, dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 24))
    params = unet.init(jax.random.PRNGKey(2), x, t, ctx)

    expected = unet.apply(params, x, t, ctx)
    enable_sequence_parallel(mesh, min_seq_len=64)
    try:
        got = unet.apply(params, x, t, ctx)
    finally:
        disable_sequence_parallel()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_gradients_flow():
    mesh = create_mesh({"model": 8})
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (1, 64, 8, 16), jnp.float32)
    k = jax.random.normal(keys[1], (1, 64, 8, 16), jnp.float32)
    v = jax.random.normal(keys[2], (1, 64, 8, 16), jnp.float32)

    def loss_sp(q, k, v):
        return jnp.sum(sequence_parallel_attention(q, k, v, mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v) ** 2)

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )
