"""Fused FFN kernel (ops/fused_ffn.py): kernel-vs-XLA parity, gradients,
dispatch predicate, and model integration (param tree unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.ops import fused_ffn as ff


def _make(key, b, t, d, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, t, d)).astype(dtype)
    lns = jax.random.normal(ks[1], (d,)).astype(jnp.float32) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (d,)).astype(jnp.float32) * 0.1
    w1 = (jax.random.normal(ks[3], (d, 8 * d)) * d**-0.5).astype(dtype)
    b1 = jnp.linspace(-0.1, 0.1, 8 * d).astype(dtype)
    w2 = (jax.random.normal(ks[4], (4 * d, d)) * (4 * d) ** -0.5).astype(
        dtype
    )
    b2 = jnp.linspace(-0.1, 0.1, d).astype(dtype)
    h4 = 4 * d
    return x, lns, lnb, w1[:, :h4], b1[:h4], w1[:, h4:], b1[h4:], w2, b2


@pytest.mark.parametrize(
    "b,t,d", [(2, 1024, 320), (4, 256, 640), (2, 64, 1280), (1, 512, 128)]
)
def test_kernel_matches_xla(b, t, d):
    args = _make(jax.random.PRNGKey(0), b, t, d)
    ref = ff._xla_ffn(*args, 1e-5)
    out = ff._pallas_ffn(*args, 1e-5)  # interpret mode on CPU
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    # one-ulp bf16 differences from accumulation order / the erf
    # approximation (|abs err| <= 1.5e-7 in f32, below bf16 resolution)
    assert err <= 0.08 * max(scale, 1.0), (err, scale)


@pytest.mark.parametrize("b,t,d", [(2, 256, 320), (1, 512, 128)])
def test_int8_kernel_close_to_xla(b, t, d):
    """W8A8 FFN kernel (per-row act scales, per-col weight scales): same
    math as the bf16 kernel up to quantization noise."""
    args = _make(jax.random.PRNGKey(1), b, t, d)
    ref = ff._xla_ffn(*args, 1e-5)
    out = ff._pallas_ffn_int8(*args, 1e-5)
    r = np.asarray(ref, np.float64).ravel()
    o = np.asarray(out, np.float64).ravel()
    cos = np.dot(r, o) / (np.linalg.norm(r) * np.linalg.norm(o))
    assert cos > 0.999, cos
    assert np.max(np.abs(r - o)) < 0.05 * max(np.max(np.abs(r)), 1.0)


def test_int8_ffn_not_dispatched():
    """The int8 FFN kernel is a measured NEGATIVE (d=320 class is
    VPU/lane-pad-bound — 1.030 vs 1.011 ms on v5e) and must stay out of
    dispatch even with the global quant switch on."""
    from ldm_tf2_tpu.ops.quant_conv import set_conv_quant

    args = _make(jax.random.PRNGKey(2), 1, 512, 128)
    try:
        set_conv_quant("int8")
        ff.set_fused_ffn_impl("pallas")
        routed = ff.fused_ffn(*args)
        bf16 = ff._pallas_ffn(*args, 1e-5)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(bf16))
    finally:
        set_conv_quant("none")
        ff.set_fused_ffn_impl("auto")


def test_erf_approximation_accuracy():
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    got = np.asarray(ff._erf_f32(x))
    want = np.asarray(jax.lax.erf(x))
    # 1.5e-7 analytic bound + f32 rounding in the polynomial evaluation
    assert np.max(np.abs(got - want)) < 1e-6


def test_gelu_poly_accuracy():
    """The kernel's polynomial gelu: <=2.4e-5 abs inside the fit range,
    <=1.3e-4 at the |x|=4 clamp edge, exact far outside (h := |x|).
    The contract is ABSOLUTE error below bf16 rounding of the FFN's O(1)
    outputs — tiny |gelu| values (|x| > 4 tail) carry large RELATIVE
    error by design; their contribution to the w2 dot is ~1e-5 absolute."""
    x = jnp.linspace(-12.0, 12.0, 48001, dtype=jnp.float32)
    got = np.asarray(ff._gelu_poly_f32(x))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.max(np.abs(got - want)) < 1.5e-4
    inner = np.abs(x) <= 3.9
    assert np.max(np.abs(got[inner] - want[inner])) < 3e-5
    far = np.abs(x) >= 8.0
    assert np.max(np.abs(got[far] - want[far])) < 1e-6


def test_gradients_match_xla_reference():
    args = _make(jax.random.PRNGKey(1), 1, 256, 128, dtype=jnp.float32)

    def loss_fused(*a):
        return jnp.sum(jnp.square(ff.fused_ffn(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(ff._xla_ffn(*a, 1e-5)))

    prev = ff.get_fused_ffn_impl()
    ff.set_fused_ffn_impl("pallas")
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 3, 5, 7))(*args)
    finally:
        ff.set_fused_ffn_impl(prev)
    g_ref = jax.grad(loss_ref, argnums=(0, 3, 5, 7))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3, atol=2e-3
        )


def test_dispatch_predicate():
    # CPU + auto -> XLA path
    assert not ff.use_fused_ffn(2, 1024, 320, on_tpu=False)
    # TPU + auto: levels 0/1 fused, d=1280 stays XLA
    assert ff.use_fused_ffn(2, 1024, 320, on_tpu=True)
    assert ff.use_fused_ffn(2, 256, 640, on_tpu=True)
    assert not ff.use_fused_ffn(2, 64, 1280, on_tpu=True)
    # forced off
    ff.set_fused_ffn_impl("xla")
    try:
        assert not ff.use_fused_ffn(2, 1024, 320, on_tpu=True)
    finally:
        ff.set_fused_ffn_impl("auto")


def test_model_param_tree_unchanged():
    """The FeedForward/LayerNorm refactor must keep the exact checkpoint
    param paths (layernorm3/{scale,bias}, ffn/geglu/{value,gate}/
    {kernel,bias}, ffn/dense/{kernel,bias}) with nn.Dense/nn.LayerNorm
    shapes+dtypes."""
    import flax

    from ldm_tf2_tpu.models.unet import BasicTransformerBlock

    block = BasicTransformerBlock(
        num_heads=4, size_per_head=16, hidden_size=32, dtype=jnp.float32
    )
    x = jnp.ones((2, 16, 64))
    ctx = jnp.ones((2, 7, 32))
    params = block.init(jax.random.PRNGKey(0), x, ctx)["params"]
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    expect = {
        "layernorm3/scale": (64,),
        "layernorm3/bias": (64,),
        "ffn/geglu/value/kernel": (64, 256),
        "ffn/geglu/value/bias": (256,),
        "ffn/geglu/gate/kernel": (64, 256),
        "ffn/geglu/gate/bias": (256,),
        "ffn/dense/kernel": (256, 64),
        "ffn/dense/bias": (64,),
    }
    for k, shape in expect.items():
        assert k in flat, (k, sorted(flat))
        assert flat[k].shape == shape, (k, flat[k].shape)
        assert flat[k].dtype == jnp.float32
