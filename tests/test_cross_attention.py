"""Single-block cross-attention kernel vs XLA reference (interpret mode on
CPU; the kernel compiles natively on TPU — exercised by bench.py and the
sampler CLI through the packed dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.ops.attention import _xla_attention
from ldm_tf2_tpu.ops.cross_attention import (
    _pick_block_q,
    _xla_reference_flat,
    cross_attention_flat,
)
from ldm_tf2_tpu.ops.flash_attention import lane_pad


def _make_flat(key, b, t, kv, h, s, dtype):
    """Random [B,T,H,S] q/k/v plus their zero-lane-padded flat packings."""
    keys = jax.random.split(key, 3)
    q = jax.random.normal(keys[0], (b, t, h, s), jnp.float32).astype(dtype)
    k = jax.random.normal(keys[1], (b, kv, h, s), jnp.float32).astype(dtype)
    v = jax.random.normal(keys[2], (b, kv, h, s), jnp.float32).astype(dtype)

    sp = lane_pad(s)

    def flatten(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, sp - s)))
        return x.reshape(x.shape[0], x.shape[1], h * sp)

    return (q, k, v), (flatten(q), flatten(k), flatten(v)), sp


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "b,t,kv,h,s",
    [
        (2, 256, 77, 2, 40),   # the U-Net text cross-attention shape class
        (1, 1024, 77, 2, 40),  # level-0 length (multi q-tile grid)
        (2, 128, 128, 2, 64),  # kv already a lane multiple (no masking)
        (1, 64, 33, 1, 128),   # ragged short kv, full-lane head
    ],
)
def test_cross_matches_xla(dtype, b, t, kv, h, s):
    (q, k, v), (qf, kf, vf), sp = _make_flat(
        jax.random.PRNGKey(0), b, t, kv, h, s, dtype
    )
    scale = s**-0.5

    expected = _xla_attention(q, k, v, scale)
    got = cross_attention_flat(qf, kf, vf, scale, h)
    got = got.reshape(b, t, h, sp)[..., :s]

    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        got.astype(jnp.float32), expected.astype(jnp.float32),
        rtol=tol, atol=tol,
    )
    # the zero lane padding must survive the kernel (the packed merge
    # projection relies on it only via zero weight rows, but keeping the
    # invariant exact catches masking mistakes)
    pad_cols = got_pad = cross_attention_flat(qf, kf, vf, scale, h)
    pad_cols = got_pad.reshape(b, t, h, sp)[..., s:]
    np.testing.assert_array_equal(np.asarray(pad_cols), 0.0)


def test_cross_gradients_match_reference():
    b, t, kv, h, s = 2, 128, 77, 2, 64
    (q, k, v), (qf, kf, vf), sp = _make_flat(
        jax.random.PRNGKey(1), b, t, kv, h, s, jnp.float32
    )
    cot = jax.random.normal(jax.random.PRNGKey(2), (b, t, h * sp))
    scale = s**-0.5

    def loss_kernel(qf, kf, vf):
        return jnp.sum(cross_attention_flat(qf, kf, vf, scale, h) * cot)

    def loss_ref(qf, kf, vf):
        return jnp.sum(_xla_reference_flat(qf, kf, vf, scale, h) * cot)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(qf, kf, vf)
    expected = jax.grad(loss_ref, argnums=(0, 1, 2))(qf, kf, vf)
    for g, e in zip(got, expected):
        np.testing.assert_allclose(g, e, rtol=2e-5, atol=2e-5)


def test_pick_block_q_divides_and_fits():
    for q_len in (64, 256, 1024, 4096):
        for kv_pad in (128, 256, 512):
            tq = _pick_block_q(q_len, kv_pad, 128)
            assert q_len % tq == 0
            working = tq * 128 * 4 + 2 * tq * kv_pad * 4 + 2 * kv_pad * 128 * 2
            assert working <= 8 * 1024 * 1024


def test_unet_dispatch_parity_when_forced():
    """The model's packed-cross dispatch computes the same function as the
    XLA path (CPU: force the gate on both ways via monkeypatching the
    backend check is avoided — instead compare the two attention ops the
    dispatch selects between, at the model's exact shapes)."""
    b, t, kv, h, s = 2, 256, 77, 8, 40
    (q, k, v), (qf, kf, vf), sp = _make_flat(
        jax.random.PRNGKey(3), b, t, kv, h, s, jnp.float32
    )
    scale = s**-0.5
    a = _xla_attention(q, k, v, scale)
    bflat = cross_attention_flat(qf, kf, vf, scale, h)
    bres = bflat.reshape(b, t, h, sp)[..., :s]
    np.testing.assert_allclose(a, bres, rtol=2e-5, atol=2e-5)
