"""W8A8 int8 conv chain (ops/quant_conv.py): numerics, dispatch, model use.

The Pallas quant kernel runs in interpret mode on the CPU test backend.
Reference chain for comparison is the model's exact bf16 path
(ops.fused_conv._xla_ref)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.ops import fused_conv
from ldm_tf2_tpu.ops.quant_conv import (
    get_conv_quant,
    gn_silu_conv3x3_int8,
    gn_silu_quant,
    quantize_weight,
    set_conv_quant,
    use_int8_conv,
)


@pytest.fixture
def int8_mode():
    set_conv_quant("int8")
    yield
    set_conv_quant("none")


def _ref_gn_silu(x, gamma, beta, num_groups, eps):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * gamma + beta
    return y * jax.nn.sigmoid(y)


def test_gn_silu_quant_dequantizes_to_reference(rng):
    b, h, w, c = 3, 8, 8, 64
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    gamma = jnp.asarray(rng.randn(c), jnp.float32)
    beta = jnp.asarray(rng.randn(c), jnp.float32)

    y8, sa = gn_silu_quant(x, gamma, beta, num_groups=32, eps=1e-5)
    assert y8.dtype == jnp.int8
    assert sa.shape == (b,)

    ref = _ref_gn_silu(x, gamma, beta, 32, 1e-5)
    deq = y8.astype(jnp.float32) * sa[:, None, None, None]
    # symmetric round-to-nearest: error bounded by half an lsb per example
    err = jnp.max(jnp.abs(deq - ref), axis=(1, 2, 3))
    assert np.all(np.asarray(err) <= np.asarray(sa) * 0.51 + 1e-6)
    # scales actually are per-example amax/127
    amax = jnp.max(jnp.abs(ref), axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(amax) / 127.0,
                               rtol=1e-5)


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.randn(3, 3, 32, 48), jnp.float32)
    w8, ws = quantize_weight(w)
    assert w8.dtype == jnp.int8
    assert ws.shape == (48,)
    err = jnp.max(jnp.abs(w8.astype(jnp.float32) * ws - w), axis=(0, 1, 2))
    assert np.all(np.asarray(err) <= np.asarray(ws) * 0.51)
    # every output channel uses its full s8 range
    assert np.all(np.asarray(jnp.max(jnp.abs(w8), axis=(0, 1, 2))) == 127)


def test_int8_chain_close_to_bf16_chain(rng):
    b, h, w, cin, cout = 2, 8, 8, 64, 32
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(cin), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
    t = jnp.asarray(rng.randn(b, cout), jnp.float32)

    ref = fused_conv._xla_ref(x, gamma, beta, wk, bias, t, None, 32, 1e-5)
    out = gn_silu_conv3x3_int8(
        x, gamma, beta, wk, bias, time_add=t, num_groups=32, eps=1e-5
    )
    assert out.shape == ref.shape
    r = np.asarray(ref, np.float64).ravel()
    o = np.asarray(out, np.float64).ravel()
    cos = np.dot(r, o) / (np.linalg.norm(r) * np.linalg.norm(o))
    assert cos > 0.999
    # quantization noise stays small relative to the activation scale
    assert np.max(np.abs(r - o)) < 0.05 * np.max(np.abs(r))


def test_residual_add_epilogue(rng):
    b, h, w, c = 2, 8, 8, 64
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    res = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)

    base = gn_silu_conv3x3_int8(x, gamma, beta, wk, bias, num_groups=32)
    with_res = gn_silu_conv3x3_int8(
        x, gamma, beta, wk, bias, residual_add=res, num_groups=32
    )
    np.testing.assert_allclose(
        np.asarray(with_res), np.asarray(base + res), atol=1e-5
    )


def test_gate_and_dispatch(rng, int8_mode):
    assert get_conv_quant() == "int8"
    # gate: one-pass kernel claims 256^2-class shapes; VMEM-breaking
    # 512^2 shapes claim via the streaming kernel; non-group-divisible
    # channels decline
    # fused-chain classes claim; 8x8 claims (2-stage); 64x64 and 4x4
    # decline (emitter-lottery tail / measured bf16 win)
    assert use_int8_conv((48, 32, 32, 640), 320, has_add=True)
    assert use_int8_conv((48, 16, 16, 1280), 1280)
    assert use_int8_conv((48, 8, 8, 1280), 1280)
    assert not use_int8_conv((32, 64, 64, 2560), 1280)
    assert not use_int8_conv((48, 4, 4, 1280), 1280)
    assert not use_int8_conv((2, 8, 8, 60), 60)   # 60 % 32 != 0

    b, h, w, c = 2, 8, 8, 64
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    routed = fused_conv.gn_silu_conv3x3(x, gamma, beta, wk, bias)
    direct = gn_silu_conv3x3_int8(x, gamma, beta, wk, bias)
    np.testing.assert_array_equal(np.asarray(routed), np.asarray(direct))

    # quant_ok=False (the AE call sites) stays on the bf16 path
    opted_out = fused_conv.gn_silu_conv3x3(
        x, gamma, beta, wk, bias, quant_ok=False
    )
    ref = fused_conv._xla_ref(x, gamma, beta, wk, bias, None, None, 32, 1e-5)
    np.testing.assert_array_equal(np.asarray(opted_out), np.asarray(ref))

    set_conv_quant("none")
    off = fused_conv.gn_silu_conv3x3(x, gamma, beta, wk, bias)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(ref))


def test_streaming_kernel_matches_one_pass(rng):
    """The 3-phase streaming kernel (big-shape path) agrees with the
    one-pass kernel: identical scales (up to f32 accumulation order) and
    dequantized values within one quantization lsb."""
    from ldm_tf2_tpu.ops.quant_conv import _gn_silu_quant_stream

    b, h, w, c = 2, 16, 16, 64
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(c), jnp.float32)

    y8, sa = gn_silu_quant(x, gamma, beta, num_groups=32, eps=1e-5)
    y8s, sas = _gn_silu_quant_stream(x, gamma, beta, 32, 1e-5, hb=128)

    np.testing.assert_allclose(np.asarray(sas), np.asarray(sa), rtol=1e-5)
    deq = np.asarray(y8, np.float32) * np.asarray(sa)[:, None, None, None]
    deqs = np.asarray(y8s, np.float32) * np.asarray(sas)[:, None, None, None]
    assert np.max(np.abs(deq - deqs)) <= float(np.max(sa)) * 1.01


def test_fused_chain_matches_two_stage(rng):
    """The whole-chain Pallas kernel computes the same quantized math as
    the 2-stage composition (identical scales and rounding; only f32
    epilogue ordering differs)."""
    from ldm_tf2_tpu.ops.quant_conv import gn_silu_conv3x3_int8_fused

    b, h, w, cin, cout = 2, 8, 8, 64, 64
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(cin), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
    t = jnp.asarray(rng.randn(b, cout), jnp.float32)
    res = jnp.asarray(rng.randn(b, h, w, cout), jnp.float32)

    for kwargs in ({"time_add": t}, {"residual_add": res}, {}):
        a = gn_silu_conv3x3_int8(x, gamma, beta, wk, bias, **kwargs)
        f = gn_silu_conv3x3_int8_fused(x, gamma, beta, wk, bias, **kwargs)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(f), atol=2e-5
        )


def test_batched_conv_matches_emitter(rng):
    """The batched small-hw s8 conv kernel (images stacked in one
    [B*HW, C] operand, inter-image taps masked) produces exactly the
    emitter's s8 conv + dequant result — integer accumulation, so any
    masking bug is a hard mismatch, not a tolerance blur."""
    from ldm_tf2_tpu.ops.quant_conv import (
        _batched_pick_blk,
        _s8_conv3x3_batched,
        quantize_weight,
    )

    for h in (4, 8):
        b, c, cout = 3, 64, 64
        y8 = jnp.asarray(
            rng.randint(-127, 128, (b, h, h, c)), jnp.int8
        )
        sa = jnp.asarray(np.abs(rng.randn(b)) * 0.01 + 0.01, jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, c, cout) * 0.1, jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
        t = jnp.asarray(rng.randn(b, cout), jnp.float32)
        w8, ws = quantize_weight(wk)

        acc = jax.lax.conv_general_dilated(
            y8, w8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        ref = acc.astype(jnp.float32) * (sa[:, None, None, None] * ws)
        ref = ref + bias + t[:, None, None, :]

        blk = _batched_pick_blk(b * h * h, c, cout, True, False)
        assert blk is not None
        out = _s8_conv3x3_batched(
            y8, sa, w8, ws, bias, t, None, jnp.float32, blk
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_s8_dots_conv_matches_emitter(rng):
    """The 9-shifted-dots s8 conv (`_s8_conv3x3_dots`, the deterministic
    stage-2 alternative to the emitter's compile lottery) is integer-exact
    vs the emitter's s8 SAME conv on non-square and channel-odd shapes."""
    from ldm_tf2_tpu.ops.quant_conv import _s8_conv3x3_dots, quantize_weight

    for (b, h, w, c, cout) in ((2, 8, 8, 64, 32), (1, 5, 7, 96, 64)):
        y8 = jnp.asarray(rng.randint(-127, 128, (b, h, w, c)), jnp.int8)
        wk = jnp.asarray(rng.randn(3, 3, c, cout) * 0.1, jnp.float32)
        w8, _ = quantize_weight(wk)
        ref = jax.lax.conv_general_dilated(
            y8, w8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = _s8_conv3x3_dots(y8, w8)
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_two_stage_dots_impl_matches_emitter_impl(rng):
    """`set_int8_stage2("dots")` produces the same 2-stage result as the
    default emitter stage-2 (identical integer accumulation + epilogue)."""
    from ldm_tf2_tpu.ops.quant_conv import (
        gn_silu_conv3x3_int8_two_stage,
        set_int8_stage2,
    )

    b, h, c, cout = 2, 8, 64, 64
    x = jnp.asarray(rng.randn(b, h, h, c), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, c, cout) * 0.1, jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(cout), jnp.float32)
    ref = gn_silu_conv3x3_int8_two_stage(x, gamma, beta, wk, bias)
    set_int8_stage2("dots")
    try:
        out = gn_silu_conv3x3_int8_two_stage(x, gamma, beta, wk, bias)
    finally:
        set_int8_stage2("auto")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_invalid_mode_rejected():
    with pytest.raises(ValueError):
        set_conv_quant("int4")


def test_unet_forward_with_int8(rng, int8_mode):
    """Small UNet forward: int8 sampling path runs and stays close to
    the bf16 result."""
    from ldm_tf2_tpu.models.unet import UNet

    model = UNet(
        model_channels=64,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=2,
        context_channels=48,
    )
    x = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    tt = jnp.asarray([3.0, 7.0], jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 7, 48), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, tt, ctx)

    out8 = model.apply(params, x, tt, ctx)
    set_conv_quant("none")
    ref = model.apply(params, x, tt, ctx)

    r = np.asarray(ref, np.float64).ravel()
    o = np.asarray(out8, np.float64).ravel()
    cos = np.dot(r, o) / (np.linalg.norm(r) * np.linalg.norm(o))
    assert cos > 0.99
    assert not np.array_equal(r, o)  # int8 actually engaged
