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


@pytest.mark.parametrize("backward", ["pallas", "xla"])
@pytest.mark.parametrize(
    "b,q_len,kv_len,h,s",
    [
        (1, 64, 64, 2, 32),     # tiny self-attention
        (2, 128, 77, 2, 64),    # cross-attention shape (kv 77)
        (1, 256, 200, 2, 40),   # ragged kv length, odd head dim
    ],
)
def test_flash_gradients_match_xla(backward, b, q_len, kv_len, h, s):
    from ldm_tf2_tpu.ops import flash_attention as fa

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(keys[0], (b, q_len, h, s))
    k = jax.random.normal(keys[1], (b, kv_len, h, s))
    v = jax.random.normal(keys[2], (b, kv_len, h, s))
    cot = jax.random.normal(keys[3], (b, q_len, h, s))
    scale = s**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * cot)

    fa.set_flash_backward(backward)
    try:
        # The context must wrap the grad call: the custom_vjp backward (a
        # Pallas kernel pair) executes after the forward returns.
        with pltpu.force_tpu_interpret_mode():
            g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.set_flash_backward("pallas")
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_flash_packed_matches_reference():
    """Packed entry ([B,H,T,Sp] zero-lane-padded) fwd + grads vs XLA."""
    from ldm_tf2_tpu.ops.flash_attention import (
        flash_attention_packed,
        lane_pad,
    )

    b, t, h, s = 1, 128, 2, 40
    sp = lane_pad(s)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(keys[0], (b, t, h, s))
    k = jax.random.normal(keys[1], (b, t, h, s))
    v = jax.random.normal(keys[2], (b, t, h, s))
    cot = jax.random.normal(keys[3], (b, t, h, s))
    scale = s**-0.5

    def pack(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, sp - s)))

    def loss_packed(q, k, v):
        out = flash_attention_packed(pack(q), pack(k), pack(v), scale)
        return jnp.sum(jnp.transpose(out[..., :s], (0, 2, 1, 3)) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * cot)

    with pltpu.force_tpu_interpret_mode():
        out_packed = flash_attention_packed(pack(q), pack(k), pack(v), scale)
        g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    expected = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_packed)[..., :s], (0, 2, 1, 3)),
        expected, rtol=2e-5, atol=2e-5,
    )
    # zero pad lanes stay zero through the kernel
    np.testing.assert_array_equal(np.asarray(out_packed)[..., s:], 0.0)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_packed, g_ref):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_flash_flat_matches_reference():
    """Flat entry ([B,T,H*Sp], heads minor-blocked) fwd + grads vs XLA."""
    from ldm_tf2_tpu.ops.flash_attention import (
        flash_attention_flat,
        lane_pad,
    )

    b, t, h, s = 1, 128, 2, 40
    sp = lane_pad(s)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(keys[0], (b, t, h, s))
    k = jax.random.normal(keys[1], (b, t, h, s))
    v = jax.random.normal(keys[2], (b, t, h, s))
    cot = jax.random.normal(keys[3], (b, t, h, s))
    scale = s**-0.5

    def flatten(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, sp - s)))
        return x.reshape(b, t, h * sp)

    def unflatten(x):
        return x.reshape(b, t, h, sp)[..., :s]

    def loss_flat(q, k, v):
        out = flash_attention_flat(
            flatten(q), flatten(k), flatten(v), scale, h
        )
        return jnp.sum(unflatten(out) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * cot)

    with pltpu.force_tpu_interpret_mode():
        out_flat = flash_attention_flat(
            flatten(q), flatten(k), flatten(v), scale, h
        )
        g_flat = jax.grad(loss_flat, argnums=(0, 1, 2))(q, k, v)
    expected = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(unflatten(out_flat)), expected, rtol=2e-5, atol=2e-5
    )
    # zero pad lanes stay zero through the kernel
    pad_lanes = np.asarray(out_flat).reshape(b, t, h, sp)[..., s:]
    np.testing.assert_array_equal(pad_lanes, 0.0)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flat, g_ref):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_flash_flat_xla_fallback_backward():
    """The flat entry's non-pallas vjp (xla recompute) matches too."""
    from ldm_tf2_tpu.ops import flash_attention as fa
    from ldm_tf2_tpu.ops.flash_attention import flash_attention_flat

    b, t, h, s = 1, 64, 2, 128  # s already lane-aligned
    keys = jax.random.split(jax.random.PRNGKey(4), 4)
    q = jax.random.normal(keys[0], (b, t, h * s))
    k = jax.random.normal(keys[1], (b, t, h * s))
    v = jax.random.normal(keys[2], (b, t, h * s))
    cot = jax.random.normal(keys[3], (b, t, h * s))
    scale = s**-0.5

    def loss_flat(q, k, v):
        return jnp.sum(flash_attention_flat(q, k, v, scale, h) * cot)

    def loss_ref(q, k, v):
        def split(x):
            return x.reshape(b, t, h, s)

        out = _xla_attention(split(q), split(k), split(v), scale)
        return jnp.sum(out.reshape(b, t, h * s) * cot)

    fa.set_flash_backward("xla")
    try:
        with pltpu.force_tpu_interpret_mode():
            g_flat = jax.grad(loss_flat, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.set_flash_backward("pallas")
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flat, g_ref):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_unet_packed_path_matches_xla():
    """A UNet forward via the packed flash path == the XLA attention path
    (same params; packed engages on the spatial self-attention)."""
    from ldm_tf2_tpu.models import UNet
    from ldm_tf2_tpu.ops import attention as attn

    unet = UNet(
        model_channels=32, out_channels=4, num_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=2, context_channels=24, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    t = jnp.array([5], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 24))
    params = unet.init(jax.random.PRNGKey(2), x, t, ctx)

    expected = unet.apply(params, x, t, ctx)
    attn.set_attention_impl("flash")
    try:
        with pltpu.force_tpu_interpret_mode():
            got = unet.apply(params, x, t, ctx)
    finally:
        attn.set_attention_impl("auto")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-4
    )


def test_flash_backward_extreme_logits_ragged_kv():
    """Padded tail keys + extremely negative lse: without masking in the
    backward kernels, p = exp(0 - lse) overflows and 0*inf NaNs the real
    gradients.  kv=100 pads to 128, logits ~ -1.4e3."""
    b, t, kv, h, s = 1, 128, 100, 1, 32
    q = jnp.full((b, t, h, s), 5.0)
    k = jnp.full((b, kv, h, s), -5.0)
    v = jnp.ones((b, kv, h, s))
    scale = s**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale))

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale))

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)


def test_flash_pv_int8_close_to_reference():
    """int8-PV serving mode (`set_flash_pv_int8`): p is 7-bit fixed point
    (exact scale 1/127 since p in [0,1]) and v per-kv-block s8; the
    normalizer sums the SAME quantized p, so sub-threshold attention
    weights drop from numerator and denominator consistently and the
    output stays a correctly-normalized average (bounded error)."""
    from ldm_tf2_tpu.ops.flash_attention import (
        flash_attention_flat,
        get_flash_pv_int8,
        lane_pad,
        set_flash_pv_int8,
    )

    b, t, h, s = 1, 256, 2, 40
    sp = lane_pad(s)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(keys[0], (b, t, h, s))
    k = jax.random.normal(keys[1], (b, t, h, s))
    v = jax.random.normal(keys[2], (b, t, h, s))
    scale = s**-0.5

    def flatten(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, sp - s)))
        return x.reshape(b, t, h * sp)

    expected = _xla_attention(q, k, v, scale)
    assert not get_flash_pv_int8()
    set_flash_pv_int8(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_flat(
                flatten(q), flatten(k), flatten(v), scale, h
            )
    finally:
        set_flash_pv_int8(False)
    out = np.asarray(out).reshape(b, t, h, sp)[..., :s]
    # v values are O(1) normals: per-element error is bounded by the p
    # quantization step (1/254 of the value range) times the value
    # magnitude plus the v step; 0.02 absolute is ~5 quantization steps.
    np.testing.assert_allclose(out, expected, atol=0.02)
    # and it must NOT be bit-identical (the quantization actually ran)
    assert np.abs(out - np.asarray(expected)).max() > 1e-6
