"""Integration tests: train steps decrease loss / update params, and the
data-parallel sharded step matches the single-device step (SURVEY.md §4
strategies #3 and #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.diffusion import make_schedule
from ldm_tf2_tpu.models import (
    AutoencoderKL,
    Discriminator,
    LPIPS,
    TransformerModel,
    UNet,
)
from ldm_tf2_tpu.parallel import create_mesh, replicate, shard_batch
from ldm_tf2_tpu.training.ae_trainer import (
    init_ae_train_state,
    make_adam,
    make_ae_train_steps,
)
from ldm_tf2_tpu.training.ldm_trainer import (
    init_ldm_train_state,
    make_ldm_train_step,
    make_optimizer,
)

IMG = 16  # tiny image size, f2 latents


@pytest.fixture(scope="module")
def tiny_ldm():
    unet = UNet(
        model_channels=32,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=2,
        context_channels=32,
        dropout_rate=0.0,
    )
    cond = TransformerModel(
        vocab_size=64,
        encoder_stack_size=1,
        hidden_size=32,
        num_heads=2,
        size_per_head=8,
        max_seq_len=8,
        filter_size=64,
        dropout_rate=0.0,
    )
    ae = AutoencoderKL(channels=32, num_blocks=1, multipliers=(1, 2))
    key = jax.random.PRNGKey(0)
    images = jnp.zeros((2, IMG, IMG, 3))
    ids = jnp.zeros((2, 8), jnp.int32)
    latents = jnp.zeros((2, IMG // 2, IMG // 2, 4))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 8, 32))

    unet_params = unet.init(key, latents, t, ctx)["params"]
    cond_params = cond.init(key, ids)["params"]
    ae_params = ae.init({"params": key, "sample": key}, images)["params"]
    return unet, cond, ae, unet_params, cond_params, ae_params


def build_step(tiny_ldm, schedule, optimizer, **kwargs):
    unet, cond, ae, *_ = tiny_ldm

    def unet_apply(params, xt, t, ctx, rngs, training):
        return unet.apply(
            {"params": params}, xt, t, ctx, training=training, rngs=rngs
        )

    def cond_apply(params, ids, rngs, training):
        return cond.apply(
            {"params": params}, ids, training=training, rngs=rngs
        )

    def encode_latents(ae_params, images, key):
        posterior = ae.apply(
            {"params": ae_params}, images, method=AutoencoderKL.encode
        )
        return posterior.sample(key)

    return make_ldm_train_step(
        unet_apply,
        cond_apply,
        encode_latents,
        schedule,
        optimizer,
        condition_dropout_rate=0.1,
        null_token_ids=jnp.array([2, 3] + [0] * 6, jnp.int32),
        **kwargs,
    )


def test_ldm_train_step_updates(tiny_ldm):
    _, _, _, unet_params, cond_params, ae_params = tiny_ldm
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    optimizer = make_optimizer(learning_rate=1e-3)
    step_fn = jax.jit(build_step(tiny_ldm, schedule, optimizer))

    state = init_ldm_train_state(unet_params, cond_params, optimizer)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)

    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, ae_params, images, ids,
                                 jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    # params actually moved
    leaf0 = jax.tree.leaves(unet_params)[0]
    leaf1 = jax.tree.leaves(state.unet_params)[0]
    assert not np.allclose(leaf0, leaf1)
    # cond model frozen by default
    c0 = jax.tree.leaves(cond_params)[0]
    c1 = jax.tree.leaves(state.cond_params)[0]
    np.testing.assert_array_equal(c0, c1)


def test_ldm_train_step_ema(tiny_ldm):
    """ema_decay keeps an EMA of the trainable tree: after one step
    ema == decay * init + (1-decay) * new params, and it trails the live
    params thereafter."""
    _, _, _, unet_params, cond_params, ae_params = tiny_ldm
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    optimizer = make_optimizer(learning_rate=1e-3)
    decay = 0.9
    step_fn = jax.jit(
        build_step(tiny_ldm, schedule, optimizer, ema_decay=decay)
    )

    state = init_ldm_train_state(
        unet_params, cond_params, optimizer, ema_decay=decay
    )
    images = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)

    state1, _ = step_fn(state, ae_params, images, ids, jax.random.PRNGKey(0))
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    expected = decay * leaf(unet_params) + (1 - decay) * leaf(
        state1.unet_params
    )
    np.testing.assert_allclose(
        leaf(state1.ema_params["unet"]), expected, rtol=1e-6, atol=1e-7
    )

    state2, _ = step_fn(state1, ae_params, images, ids, jax.random.PRNGKey(0))
    # EMA trails the live params (moved, but not equal to either endpoint)
    assert not np.allclose(leaf(state2.ema_params["unet"]), leaf(unet_params))
    assert not np.allclose(
        leaf(state2.ema_params["unet"]), leaf(state2.unet_params)
    )


def test_ldm_optimizer_schedule_and_clipping(tiny_ldm):
    """Warmup schedule: step-0 update is ~zero (lr starts at 0); clipping
    bounds the global update norm."""
    _, _, _, unet_params, cond_params, ae_params = tiny_ldm
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)
    rng = jax.random.PRNGKey(0)
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])

    warm_opt = make_optimizer(learning_rate=1e-3, warmup_steps=100)
    step_fn = jax.jit(build_step(tiny_ldm, schedule, warm_opt))
    state = init_ldm_train_state(unet_params, cond_params, warm_opt)
    state1, _ = step_fn(state, ae_params, images, ids, rng)
    # first step at lr ~ 1e-3/100: updates tiny vs fixed-lr run
    fixed_opt = make_optimizer(learning_rate=1e-3)
    step_fixed = jax.jit(build_step(tiny_ldm, schedule, fixed_opt))
    statef = init_ldm_train_state(unet_params, cond_params, fixed_opt)
    statef1, _ = step_fixed(statef, ae_params, images, ids, rng)
    d_warm = np.abs(leaf(state1.unet_params) - leaf(unet_params)).max()
    d_fixed = np.abs(leaf(statef1.unet_params) - leaf(unet_params)).max()
    assert d_warm < d_fixed / 10, (d_warm, d_fixed)

    # cosine decay builds and runs
    cos_opt = make_optimizer(
        learning_rate=1e-3, warmup_steps=2, decay_steps=10
    )
    step_cos = jax.jit(build_step(tiny_ldm, schedule, cos_opt))
    statec = init_ldm_train_state(unet_params, cond_params, cos_opt)
    statec, m = step_cos(statec, ae_params, images, ids, rng)
    assert np.isfinite(float(m["loss"]))

    # clipping: with a tiny max norm, total update magnitude shrinks
    clip_opt = make_optimizer(learning_rate=1e-3, clip_grad_norm=1e-6)
    step_clip = jax.jit(build_step(tiny_ldm, schedule, clip_opt))
    statecl = init_ldm_train_state(unet_params, cond_params, clip_opt)
    statecl, _ = step_clip(statecl, ae_params, images, ids, rng)
    d_clip = np.abs(leaf(statecl.unet_params) - leaf(unet_params)).max()
    assert d_clip <= d_fixed, (d_clip, d_fixed)


def test_ldm_train_step_remat_matches(tiny_ldm):
    """Every remat policy (full, per-block boundaries, dots) must run
    (regression: jax.checkpoint static_argnums needs `training`
    positional) and produce the same loss/update as the non-remat step —
    rematerialization changes memory, not math."""
    _, _, _, unet_params, cond_params, ae_params = tiny_ldm
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    optimizer = make_optimizer(learning_rate=1e-3)
    step_plain = jax.jit(build_step(tiny_ldm, schedule, optimizer))

    images = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)
    rng = jax.random.PRNGKey(0)

    state0 = init_ldm_train_state(unet_params, cond_params, optimizer)
    state1, m1 = step_plain(state0, ae_params, images, ids, rng)
    l1 = jax.tree.leaves(state1.unet_params)[0]

    for policy in (True, "blocks", "dots"):
        step_remat = jax.jit(
            build_step(tiny_ldm, schedule, optimizer, remat_unet=policy)
        )
        state2, m2 = step_remat(state0, ae_params, images, ids, rng)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5,
            err_msg=str(policy),
        )
        l2 = jax.tree.leaves(state2.unet_params)[0]
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), atol=1e-5, err_msg=str(policy)
        )

    with pytest.raises(ValueError, match="remat"):
        build_step(tiny_ldm, schedule, optimizer, remat_unet="bogus")


def test_ldm_train_step_data_parallel_matches(tiny_ldm):
    """DP train step on an 8-device mesh == single-device step
    (SURVEY.md §4 #4)."""
    _, _, _, unet_params, cond_params, ae_params = tiny_ldm
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    optimizer = make_optimizer(learning_rate=1e-3)
    step_fn = jax.jit(build_step(tiny_ldm, schedule, optimizer))

    images = jax.random.normal(jax.random.PRNGKey(1), (8, IMG, IMG, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (8, 8), 0, 64)
    rng = jax.random.PRNGKey(0)

    # single device
    state0 = init_ldm_train_state(unet_params, cond_params, optimizer)
    state1, metrics1 = step_fn(state0, ae_params, images, ids, rng)

    # 8-device mesh: batch sharded, params replicated
    mesh = create_mesh()
    assert mesh.devices.size == 8
    state0r = replicate(state0, mesh)
    aer = replicate(ae_params, mesh)
    imgs_s = shard_batch(images, mesh)
    ids_s = shard_batch(ids, mesh)
    state2, metrics2 = step_fn(state0r, aer, imgs_s, ids_s, rng)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=1e-5
    )
    l1 = jax.tree.leaves(state1.unet_params)[0]
    l2 = jax.tree.leaves(state2.unet_params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_ae_setup():
    ae = AutoencoderKL(channels=32, num_blocks=1, multipliers=(1, 2))
    lpips = LPIPS()
    disc = Discriminator(channels=16, num_layers=2)
    key = jax.random.PRNGKey(0)
    images = jnp.zeros((2, IMG, IMG, 3))
    ae_params = ae.init({"params": key, "sample": key}, images)["params"]
    lpips_params = lpips.init(key, images, images)["params"]
    d_variables = disc.init(key, images)
    return ae, lpips, disc, ae_params, lpips_params, d_variables


def build_ae_steps(tiny_ae_setup):
    ae, lpips, disc, ae_params, lpips_params, d_variables = tiny_ae_setup
    ae_opt, d_opt = make_adam(1e-4), make_adam(1e-4)

    def reconstruct(params, images, key, training):
        posterior = ae.apply(
            {"params": params}, images, method=AutoencoderKL.encode,
            training=training,
        )
        z = posterior.sample(key)
        out = ae.apply(
            {"params": params}, z, method=AutoencoderKL.decode,
            training=training,
        )
        return out, posterior, {}

    def reg_loss(posterior):
        kl = posterior.kl()
        return jnp.sum(kl) / kl.shape[0]

    def lpips_apply(params, a, b):
        return lpips.apply({"params": params}, a, b)

    def d_apply(variables, images, training=False, mutable=False):
        return disc.apply(variables, images, training=training,
                          mutable=mutable)

    step1, step2 = make_ae_train_steps(
        reconstruct,
        reg_loss,
        lpips_apply,
        d_apply,
        ae_opt,
        d_opt,
        AutoencoderKL.last_layer_path(),
        lpips_params,
        regularization_weight=1e-6,
        discriminator_weight=0.5,
    )
    return jax.jit(step1), jax.jit(step2), ae_opt, d_opt


def test_ae_train_steps(tiny_ae_setup):
    ae, lpips, disc, ae_params, lpips_params, d_variables = tiny_ae_setup
    step1, step2, ae_opt, d_opt = build_ae_steps(tiny_ae_setup)

    state = init_ae_train_state(ae_params, d_variables, ae_opt, d_opt)
    images = jax.random.normal(jax.random.PRNGKey(3), (2, IMG, IMG, 3)) * 0.5

    state, m1 = step1(state, images, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["ae_loss"]))
    assert int(state.step) == 1

    state, m2 = step2(state, images, jax.random.PRNGKey(0))
    for k in ("ae_loss", "d_loss", "g_loss", "adaptive_weight"):
        assert np.isfinite(float(m2[k])), k
    assert int(state.step) == 2
    # discriminator params and batch stats moved
    d0 = jax.tree.leaves(d_variables["params"])[0]
    d1 = jax.tree.leaves(state.d_params)[0]
    assert not np.allclose(d0, d1)
    bs0 = jax.tree.leaves(d_variables["batch_stats"])[0]
    bs1 = jax.tree.leaves(state.d_batch_stats)[0]
    assert not np.allclose(bs0, bs1)


def test_ae_gan_train_step_data_parallel_matches(tiny_ae_setup):
    """AE+GAN step on an 8-device mesh == single device, including the
    BatchNorm batch_stats and BOTH optimizer states (VERDICT r1 weak #5:
    batch-stat averaging across shards is exactly where DP silently
    diverges).

    Tolerances are tree-specific because the generator side is chaotic by
    construction: the adaptive weight is a ratio of two grad norms, so
    shard-reassociation alone moves it ~3e-4 (measured), and Adam's
    first-step update lr*g/sqrt(g^2) turns an infinitesimally perturbed
    near-zero gradient element into a full +-lr sign flip.  The
    discriminator side has no such amplifier and is checked tight
    (measured <=3e-6 leaf-scale); the generator side is checked against
    Adam's elementwise update bound (~lr per step), which a real DP bug
    (wrong psum / per-shard stats) would blow through via the loss
    itself."""
    ae, lpips, disc, ae_params, lpips_params, d_variables = tiny_ae_setup
    _, step2, ae_opt, d_opt = build_ae_steps(tiny_ae_setup)
    lr = 1e-4  # build_ae_steps' make_adam(1e-4)

    images = jax.random.normal(jax.random.PRNGKey(3), (8, IMG, IMG, 3)) * 0.5
    rng = jax.random.PRNGKey(0)

    state_a = init_ae_train_state(ae_params, d_variables, ae_opt, d_opt)
    state_a, m_a = step2(state_a, images, rng)

    mesh = create_mesh()
    assert mesh.devices.size == 8
    state_b = replicate(
        init_ae_train_state(ae_params, d_variables, ae_opt, d_opt), mesh
    )
    imgs_s = shard_batch(images, mesh)
    state_b, m_b = step2(state_b, imgs_s, rng)

    for k, rtol in (
        ("ae_loss", 1e-3), ("nll_loss", 1e-4), ("reg_loss", 1e-4),
        ("d_loss", 1e-4), ("g_loss", 1e-4), ("adaptive_weight", 5e-3),
    ):
        np.testing.assert_allclose(
            float(m_a[k]), float(m_b[k]), rtol=rtol, err_msg=k
        )

    def leaf_scale_check(name, tree_a, tree_b, tol):
        la, lb = jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)
        assert len(la) == len(lb), name
        for xa, xb in zip(la, lb):
            xa = np.asarray(xa, np.float64)
            xb = np.asarray(xb, np.float64)
            scale = max(np.abs(xa).max(), np.abs(xb).max(), 1e-6)
            rel = np.abs(xa - xb).max() / scale
            assert rel < tol, f"{name}: leaf-scale rel err {rel:.3e}"

    # Discriminator side: BN batch stats, params, Adam state — tight.
    leaf_scale_check("d_params", state_a.d_params, state_b.d_params, 1e-4)
    leaf_scale_check(
        "d_batch_stats", state_a.d_batch_stats, state_b.d_batch_stats, 1e-4
    )
    leaf_scale_check(
        "d_opt_state", state_a.d_opt_state, state_b.d_opt_state, 1e-3
    )
    # Generator side: elementwise Adam update bound (update magnitude is
    # <= ~lr on the first step; allow 3x margin).
    for xa, xb in zip(
        jax.tree.leaves(state_a.ae_params), jax.tree.leaves(state_b.ae_params)
    ):
        d = np.abs(np.asarray(xa, np.float64) - np.asarray(xb, np.float64))
        assert d.max() <= 3 * lr, f"ae_params diff {d.max():.3e}"


def test_ldm_train_step_encode_chunks(tiny_ldm):
    """encode_chunks serializes the frozen-AE encode (HBM peak divider at
    512^2): the chunked step trains identically in structure — finite
    decreasing-capable loss, params move — and an indivisible batch raises
    (ADVICE r1: the silent full-memory fallback defeated the configured
    memory relief with no hint why)."""
    _, _, _, unet_params, cond_params, ae_params = tiny_ldm
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    optimizer = make_optimizer(learning_rate=1e-3)
    step_fn = jax.jit(
        build_step(tiny_ldm, schedule, optimizer, encode_chunks=2)
    )

    state = init_ldm_train_state(unet_params, cond_params, optimizer)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, IMG, IMG, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, 64)
    state, metrics = step_fn(state, ae_params, images, ids,
                             jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    leaf0 = jax.tree.leaves(unet_params)[0]
    leaf1 = jax.tree.leaves(state.unet_params)[0]
    assert not np.allclose(leaf0, leaf1)

    # batch 3 not divisible by 2 -> loud error at trace time, not a silent
    # full-memory fallback
    state2 = init_ldm_train_state(unet_params, cond_params, optimizer)
    with pytest.raises(ValueError, match="encode_chunks"):
        step_fn(state2, ae_params, images[:3], ids[:3], jax.random.PRNGKey(0))


def test_optimizer_grad_accumulation_equivalence():
    """make_optimizer(accum_steps=k): k micro-batch updates apply ONE AdamW
    update on the mean gradient — exactly equal to the unwrapped optimizer
    fed that mean, with params frozen in between (optax.MultiSteps)."""
    import optax

    params = {"w": jnp.array([1.0, -2.0, 3.0])}
    grads = [
        {"w": jnp.array([0.3, -0.1, 0.2])},
        {"w": jnp.array([-0.1, 0.5, 0.0])},
        {"w": jnp.array([0.2, 0.2, -0.4])},
    ]
    mean_grad = jax.tree.map(
        lambda *gs: sum(gs) / len(gs), *grads
    )

    acc = make_optimizer(learning_rate=1e-2, accum_steps=3)
    acc_state = acc.init(params)
    p = params
    mids = []
    for g in grads:
        updates, acc_state = acc.update(g, acc_state, p)
        p = optax.apply_updates(p, updates)
        mids.append(p)
    # params frozen on the two accumulation-only micro-steps
    np.testing.assert_array_equal(mids[0]["w"], params["w"])
    np.testing.assert_array_equal(mids[1]["w"], params["w"])

    ref = make_optimizer(learning_rate=1e-2)
    ref_state = ref.init(params)
    updates, _ = ref.update(mean_grad, ref_state, params)
    expected = optax.apply_updates(params, updates)
    np.testing.assert_allclose(p["w"], expected["w"], rtol=1e-6)

    with pytest.raises(ValueError, match="accum_steps"):
        make_optimizer(accum_steps=0)


def test_ldm_train_step_grad_accumulation(tiny_ldm):
    """The fused train step under accum_steps=2: params (and the EMA, which
    must not fold on the no-op micro-steps) move only on every second
    micro-batch; the step counter still counts micro-batches."""
    _, _, _, unet_params, cond_params, ae_params = tiny_ldm
    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    decay = 0.9
    optimizer = make_optimizer(learning_rate=1e-3, accum_steps=2)
    step_fn = jax.jit(
        build_step(tiny_ldm, schedule, optimizer, ema_decay=decay)
    )
    state = init_ldm_train_state(
        unet_params, cond_params, optimizer, ema_decay=decay
    )
    images = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])

    state1, m1 = step_fn(state, ae_params, images, ids, jax.random.PRNGKey(0))
    # micro-step 1: accumulate only — live params AND ema untouched
    np.testing.assert_array_equal(leaf(state1.unet_params), leaf(unet_params))
    np.testing.assert_array_equal(
        leaf(state1.ema_params["unet"]), leaf(unet_params)
    )
    assert np.isfinite(float(m1["loss"]))

    state2, _ = step_fn(state1, ae_params, images, ids, jax.random.PRNGKey(0))
    # micro-step 2: sync — params move, ema folds exactly once
    assert not np.allclose(leaf(state2.unet_params), leaf(unet_params))
    expected_ema = decay * leaf(unet_params) + (1 - decay) * leaf(
        state2.unet_params
    )
    np.testing.assert_allclose(
        leaf(state2.ema_params["unet"]), expected_ema, rtol=1e-6, atol=1e-7
    )
    assert int(state2.step) == 2
