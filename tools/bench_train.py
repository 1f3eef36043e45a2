"""Training-step throughput on the current device (not the driver headline;
see bench.py for that).

  python tools/bench_train.py            # LDM train step, 256^2, batch 8
  python tools/bench_train.py ae         # AE-KL+GAN train step, 256^2, batch 8
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    # force host round-trip (remote execution semantics; see bench.py)
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def build_ldm_step(batch=8, image=256, remat=None):
    """(step, state, ae_params, images, ids, key) for the full LDM train
    step — shared by bench_ldm and tools/profile_pipeline.py."""
    from ldm_tf2_tpu.diffusion import make_schedule
    from ldm_tf2_tpu.models import AutoencoderKL, TransformerModel, UNet
    from ldm_tf2_tpu.training.ldm_trainer import (
        init_ldm_train_state,
        make_ldm_train_step,
        make_optimizer,
    )

    dtype = jnp.bfloat16
    unet = UNet(dtype=dtype)
    cond = TransformerModel(
        vocab_size=30522, encoder_stack_size=32, hidden_size=1280,
        num_heads=8, size_per_head=64, max_seq_len=77, filter_size=5120,
        dtype=dtype,
    )
    ae = AutoencoderKL(dtype=dtype)
    schedule = make_schedule(beta_start=0.00085, beta_end=0.012)
    # LDM_BENCH_MU_DTYPE=bfloat16 stores Adam mu in bf16 (frees 1.75 GB).
    optimizer = make_optimizer(
        mu_dtype=os.environ.get("LDM_BENCH_MU_DTYPE")
    )

    key = jax.random.PRNGKey(0)
    latent = image // 8
    print("[bench_train] init params...", flush=True)
    # jitted inits: eager init over the tunneled device takes ~7 minutes
    unet_params = jax.jit(unet.init)(
        key, jnp.zeros((1, latent, latent, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 1280)),
    )["params"]
    cond_params = jax.jit(cond.init)(key, jnp.zeros((1, 77), jnp.int32))["params"]
    ae_params = jax.jit(ae.init)(
        {"params": key, "sample": key}, jnp.zeros((1, image, image, 3))
    )["params"]
    # Frozen models (cond transformer + AE) need no f32 masters: bf16
    # storage halves their HBM residency (~1.6 GB on the full config).
    cond_params, ae_params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        (cond_params, ae_params),
    )

    def unet_apply(params, xt, t, ctx, rngs, training):
        return unet.apply({"params": params}, xt, t, ctx, training=training,
                          rngs=rngs)

    def cond_apply(params, ids, rngs, training):
        return cond.apply({"params": params}, ids, training=training,
                          rngs=rngs)

    def encode_latents(ae_params, images, key):
        posterior = ae.apply({"params": ae_params}, images,
                             method=AutoencoderKL.encode)
        return posterior.sample(key)

    step = jax.jit(
        make_ldm_train_step(
            unet_apply, cond_apply, encode_latents, schedule, optimizer,
            null_token_ids=jnp.array([101, 102] + [0] * 75, jnp.int32),
            remat_unet=remat,
            encode_chunks=int(os.environ.get("LDM_BENCH_ENCODE_CHUNKS", "1")),
        ),
        donate_argnums=(0,),
    )
    state = init_ldm_train_state(unet_params, cond_params, optimizer)

    images = jax.random.normal(key, (batch, image, image, 3))
    ids = jax.random.randint(key, (batch, 77), 0, 30522)
    return step, state, ae_params, images, ids, key


def bench_ldm(batch=8, image=256, remat=None):
    step, state, ae_params, images, ids, key = build_ldm_step(
        batch=batch, image=image, remat=remat
    )

    print("[bench_train] compiling...", flush=True)
    t0 = time.perf_counter()
    state, metrics = step(state, ae_params, images, ids, key)
    sync(metrics["loss"])
    print(f"[bench_train] compile+1st step {time.perf_counter()-t0:.1f}s",
          flush=True)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, ae_params, images, ids, key)
    sync(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"LDM train step, {image}^2, batch {batch}, bf16, "
                  f"remat={remat}",
        "step_time_s": round(dt, 4),
        "images_per_sec": round(batch / dt, 2),
        "device": str(jax.devices()[0]),
    }))


def bench_ae(batch=8, image=256):
    """AE-KL + GAN phase-2 train step: AE fwd/bwd, LPIPS VGG16 x1,
    discriminator fwd/bwd, adaptive weight, two Adam updates."""
    from ldm_tf2_tpu.models import AutoencoderKL, Discriminator, LPIPS
    from ldm_tf2_tpu.training.ae_trainer import (
        init_ae_train_state,
        make_adam,
        make_ae_train_steps,
    )

    dtype = jnp.bfloat16
    ae = AutoencoderKL(dtype=dtype)
    lpips = LPIPS(dtype=dtype)
    disc = Discriminator(dtype=dtype)
    key = jax.random.PRNGKey(0)
    images0 = jnp.zeros((1, image, image, 3))

    print("[bench_train] init params...", flush=True)
    ae_params = jax.jit(ae.init)({"params": key, "sample": key}, images0)[
        "params"
    ]
    lpips_params = jax.jit(lpips.init)(key, images0, images0)["params"]
    d_variables = jax.jit(disc.init)(key, images0)

    def reconstruct(params, images, rng, training):
        posterior = ae.apply(
            {"params": params}, images, method=AutoencoderKL.encode,
            training=training,
        )
        z = posterior.sample(rng)
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

    ae_opt, d_opt = make_adam(), make_adam()
    _, step2 = make_ae_train_steps(
        reconstruct, reg_loss, lpips_apply, d_apply, ae_opt, d_opt,
        AutoencoderKL.last_layer_path(), lpips_params,
        regularization_weight=1e-6, discriminator_weight=0.5,
    )
    step2 = jax.jit(step2, donate_argnums=(0,))
    state = init_ae_train_state(ae_params, d_variables, ae_opt, d_opt)
    images = jax.random.normal(key, (batch, image, image, 3))

    print("[bench_train] compiling...", flush=True)
    t0 = time.perf_counter()
    state, metrics = step2(state, images, key)
    sync(metrics["ae_loss"])
    print(f"[bench_train] compile+1st step {time.perf_counter()-t0:.1f}s",
          flush=True)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step2(state, images, key)
    sync(metrics["ae_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"AE-KL+GAN train step, {image}^2, batch {batch}, bf16",
        "step_time_s": round(dt, 4),
        "images_per_sec": round(batch / dt, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    batch = int(os.environ.get("LDM_BENCH_BATCH", "8"))
    image = int(os.environ.get("LDM_BENCH_IMAGE", "256"))
    if len(sys.argv) > 1 and sys.argv[1] == "ae":
        bench_ae(batch=batch, image=image)
    else:
        # Default no-remat: fits HBM up to batch 16 at 256^2 / batch 2 at
        # 512^2 and is 8-13% faster; remat is the lever beyond that
        # (LDM_BENCH_REMAT=1).
        # LDM_BENCH_REMAT: 0/unset = off, 1 = full, or a policy name
        # ("blocks", "dots") for selective remat.
        remat_env = os.environ.get("LDM_BENCH_REMAT")
        if remat_env in (None, "0"):
            remat = False
        elif remat_env == "1":
            remat = True
        else:
            remat = remat_env
        bench_ldm(batch=batch, image=image, remat=remat)
