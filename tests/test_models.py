"""Per-module shape/dtype and invariant tests (SURVEY.md §4 strategy #1).

Tiny configs keep CPU runtime low; full-size configs are exercised on TPU by
bench.py and the golden parity suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.models import (
    AutoencoderKL,
    AutoencoderVQ,
    DiagonalGaussian,
    Discriminator,
    LPIPS,
    TransformerModel,
    UNet,
    VectorQuantizer,
)
from ldm_tf2_tpu.models.unet import get_time_embedding
from ldm_tf2_tpu.ops.resize import nearest_upsample_2x


pytestmark = pytest.mark.fast  # per-session green-check tier

def test_time_embedding_cos_first():
    emb = get_time_embedding(jnp.array([0.0, 1.0]), 8)
    assert emb.shape == (2, 8)
    # At t=0: cos(0)=1 for the first half, sin(0)=0 for the second half.
    np.testing.assert_allclose(emb[0, :4], 1.0)
    np.testing.assert_allclose(emb[0, 4:], 0.0)
    # freqs[0] == 1 so emb[1, 0] == cos(1), emb[1, 4] == sin(1)
    np.testing.assert_allclose(emb[1, 0], np.cos(1.0), rtol=1e-6)
    np.testing.assert_allclose(emb[1, 4], np.sin(1.0), rtol=1e-6)


def test_nearest_upsample_2x_exact():
    x = jnp.arange(2 * 2 * 2 * 1, dtype=jnp.float32).reshape(1, 2, 2, 2)
    y = nearest_upsample_2x(x)
    assert y.shape == (1, 4, 4, 2)
    # each pixel becomes a 2x2 block
    np.testing.assert_array_equal(y[0, :2, :2, 0], x[0, 0, 0, 0])
    np.testing.assert_array_equal(y[0, 2:, 2:, 1], x[0, 1, 1, 1])


def test_diagonal_gaussian():
    key = jax.random.PRNGKey(0)
    mean = jnp.ones((2, 4, 4, 3))
    logvar = jnp.zeros((2, 4, 4, 3))
    d = DiagonalGaussian.create(mean, logvar)
    assert d.sample(key).shape == (2, 4, 4, 3)
    assert d.kl().shape == (2,)
    # KL(N(1,1) || N(0,1)) per dim = 0.5; 48 dims -> 24
    np.testing.assert_allclose(d.kl(), 24.0, rtol=1e-6)
    np.testing.assert_allclose(d.mode(), mean)
    # logvar clipping (distribution.py:16)
    d2 = DiagonalGaussian.create(mean, jnp.full_like(logvar, 100.0))
    assert float(d2.logvar.max()) == 20.0
    # nll of the mean is the entropy-like term only
    nll = d.nll(mean)
    np.testing.assert_allclose(nll, 0.5 * np.log(2 * np.pi) * 48, rtol=1e-4)


def test_vector_quantizer():
    vq = VectorQuantizer(vocab_size=16, hidden_size=4, beta=0.25)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 4))
    params = vq.init(jax.random.PRNGKey(0), x)
    quantized, loss, indices = vq.apply(params, x)
    assert quantized.shape == x.shape
    assert loss.shape == ()
    assert indices.shape == (2 * 3 * 3,)
    assert int(indices.max()) < 16
    # straight-through: gradient of sum(quantized) w.r.t. x is all-ones
    g = jax.grad(lambda x: vq.apply(params, x)[0].sum())(x)
    np.testing.assert_allclose(g, 1.0)
    # quantized values come from the codebook
    codebook = params["params"]["kernel"]
    np.testing.assert_allclose(
        quantized.reshape(-1, 4), np.asarray(codebook)[np.asarray(indices)],
        rtol=1e-6,
    )


@pytest.fixture(scope="module")
def tiny_ae_kwargs():
    return dict(channels=32, num_blocks=1, multipliers=(1, 2), latent_channels=4)


def test_autoencoder_kl(tiny_ae_kwargs):
    ae = AutoencoderKL(**tiny_ae_kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = ae.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )
    out, posterior = ae.apply(params, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.shape == (2, 16, 16, 3)
    # one downsample level -> f2
    assert posterior.mean.shape == (2, 8, 8, 4)
    # encode/decode round-trip via method calls
    post = ae.apply(params, x, method=AutoencoderKL.encode)
    rec = ae.apply(params, post.mode(), method=AutoencoderKL.decode)
    assert rec.shape == (2, 16, 16, 3)


def test_autoencoder_vq(tiny_ae_kwargs):
    ae = AutoencoderVQ(
        **tiny_ae_kwargs, vocab_size=32, beta=0.25, attention_resolutions=(8,)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = ae.init(jax.random.PRNGKey(0), x)
    out, codebook_loss = ae.apply(params, x)
    assert out.shape == (2, 16, 16, 3)
    assert codebook_loss.shape == ()
    # only_encode path used by LDM training (autoencoder.py:421-428)
    z = ae.apply(params, x, only_encode=True, method=AutoencoderVQ.encode)
    assert z.shape == (2, 8, 8, 4)
    # force_quantize decode path (reference bug fixed: autoencoder.py:431)
    rec = ae.apply(params, z, force_quantize=True, method=AutoencoderVQ.decode)
    assert rec.shape == (2, 16, 16, 3)


def test_transformer():
    model = TransformerModel(
        vocab_size=100,
        encoder_stack_size=2,
        hidden_size=64,
        num_heads=2,
        size_per_head=16,
        max_seq_len=16,
        filter_size=128,
    )
    ids = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 4, 64)
    # projection kernel layout is the checkpoint contract
    k = params["params"]["layer_0"]["mha"]["query"]["kernel"]
    assert k.shape == (64, 2, 16)  # [hidden, heads, size_per_head]
    km = params["params"]["layer_0"]["mha"]["output"]["kernel"]
    assert km.shape == (2, 16, 64)  # [heads, size_per_head, hidden]
    # dropout changes outputs only in training mode
    out2 = model.apply(
        params, ids, training=True, rngs={"dropout": jax.random.PRNGKey(7)}
    )
    assert not np.allclose(out, out2)


def test_unet():
    model = UNet(
        model_channels=32,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=2,
        context_channels=64,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([1.0, 981.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 8, 8, 4)
    # deterministic in eval mode
    out2 = model.apply(params, x, t, ctx)
    np.testing.assert_array_equal(out, out2)


def test_lpips():
    model = LPIPS()
    x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x1, x2)
    d = model.apply(params, x1, x2)
    assert d.shape == (2, 1, 1, 1)
    # self-similarity is exactly zero
    np.testing.assert_allclose(model.apply(params, x1, x1), 0.0, atol=1e-6)


def test_discriminator():
    model = Discriminator(channels=16, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    logits = model.apply(variables, x)
    # 32 -> 16 -> 8 spatial after 2 stride-2 convs, then two stride-1 convs
    # with pad 1 and kernel 4 each shrink by 1.
    assert logits.shape == (2, 6, 6, 1)
    # training mode mutates batch_stats
    logits2, new_state = model.apply(
        x=x, variables=variables, training=True, mutable=["batch_stats"]
    )
    assert logits2.shape == logits.shape
    bs_old = variables["batch_stats"]["bn_1"]["mean"]
    bs_new = new_state["batch_stats"]["bn_1"]["mean"]
    assert not np.allclose(bs_old, bs_new)
