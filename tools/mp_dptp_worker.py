"""Worker for the 2-process x 4-device DP x TP dryrun leg
(__graft_entry__.dryrun_multichip; VERDICT r4 next #9).

The closest rehearsal of DCN+ICI composition this environment permits:
data parallelism ACROSS processes (the DCN analogue — gradients
all-reduce over the process boundary through Gloo) with Megatron-style
tensor parallelism over the 4 devices WITHIN each process (the ICI
analogue — `parallel/sharding.py` TP rules shard attention heads / FFN
hidden dims).  One jitted LDM train step runs on the global 2x4 mesh;
the loss is written to JSON so the parent can assert it matches a
single-process, single-device run of the identical step bit-for-bit
shapes (same deterministic init + batch).

Launched as:
    python tools/mp_dptp_worker.py <pid> <nprocs> <port> <out_json>

Env (set by the parent): JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<k> (k=4 multi, 1
single).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out_json = sys.argv[4]

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nprocs, process_id=pid
        )
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp

    from ldm_tf2_tpu.diffusion import make_schedule
    from ldm_tf2_tpu.models import AutoencoderKL, TransformerModel, UNet
    from ldm_tf2_tpu.parallel import create_mesh, replicate, shard_batch
    from ldm_tf2_tpu.parallel.sharding import tp_param_shardings
    from ldm_tf2_tpu.training.ldm_trainer import (
        init_ldm_train_state,
        make_ldm_train_step,
        make_optimizer,
    )

    IMG = 16
    unet = UNet(
        model_channels=32,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=4,
        context_channels=32,
        dropout_rate=0.0,
    )
    cond = TransformerModel(
        vocab_size=64,
        encoder_stack_size=1,
        hidden_size=32,
        num_heads=4,
        size_per_head=8,
        max_seq_len=8,
        filter_size=64,
        dropout_rate=0.0,
    )
    ae = AutoencoderKL(channels=32, num_blocks=1, multipliers=(1, 2))

    key = jax.random.PRNGKey(0)  # deterministic: identical on every process
    images0 = jnp.zeros((1, IMG, IMG, 3))
    latents0 = jnp.zeros((1, IMG // 2, IMG // 2, 4))
    unet_params = unet.init(key, latents0, jnp.zeros((1,)),
                            jnp.zeros((1, 8, 32)))["params"]
    cond_params = cond.init(key, jnp.zeros((1, 8), jnp.int32))["params"]
    ae_params = ae.init({"params": key, "sample": key}, images0)["params"]

    def unet_apply(params, xt, t, ctx, rngs, training):
        return unet.apply({"params": params}, xt, t, ctx,
                          training=training, rngs=rngs)

    def cond_apply(params, ids, rngs, training):
        return cond.apply({"params": params}, ids, training=training,
                          rngs=rngs)

    def encode_latents(ae_p, imgs, k):
        posterior = ae.apply({"params": ae_p}, imgs,
                             method=AutoencoderKL.encode)
        return posterior.sample(k)

    schedule = make_schedule(num_steps=100, num_ddim_steps=10)
    optimizer = make_optimizer(learning_rate=1e-3)
    step_fn = jax.jit(
        make_ldm_train_step(
            unet_apply, cond_apply, encode_latents, schedule, optimizer,
            condition_dropout_rate=0.0,  # no dropout: exact mp-vs-sp match
            null_token_ids=jnp.array([2, 3] + [0] * 6, jnp.int32),
        )
    )

    # DP across processes x TP within each process's local devices.
    model_size = jax.local_device_count() if nprocs > 1 else 1
    mesh = create_mesh({"data": nprocs, "model": model_size})

    state = init_ldm_train_state(unet_params, cond_params, optimizer)
    state = jax.tree.map(
        jax.device_put, state, tp_param_shardings(state, mesh)
    )
    ae_rep = replicate(ae_params, mesh)

    # Deterministic GLOBAL batch; each process contributes its slice.
    bkey = jax.random.PRNGKey(7)
    global_batch = 4
    g_images = jax.random.normal(bkey, (global_batch, IMG, IMG, 3))
    g_ids = jax.random.randint(
        jax.random.fold_in(bkey, 1), (global_batch, 8), 0, 64
    )
    per = global_batch // nprocs
    local = (g_images[pid * per:(pid + 1) * per],
             g_ids[pid * per:(pid + 1) * per])
    images, ids = shard_batch(local, mesh)

    state, metrics = step_fn(state, ae_rep, images, ids,
                             jax.random.PRNGKey(42))
    loss = float(metrics["loss"])

    q = state.unet_params["input_block_0"]["spatial_transformer"]["block"][
        "att_layer1"]["query"]["kernel"]
    result = {
        "pid": pid,
        "nprocs": nprocs,
        "global_devices": len(jax.devices()),
        "local_devices": jax.local_device_count(),
        "mesh": dict(mesh.shape),
        "loss": loss,
        "q_sharding": str(q.sharding.spec),
    }
    with open(out_json, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
