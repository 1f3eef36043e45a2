"""Worker process for tests/test_multiprocess.py.

Runs a short tiny-LDM training loop under a REAL multi-process
`jax.distributed` runtime (CPU backend, Gloo collectives): the indexed
loader yields this process's slice of the global batch, `shard_batch`
assembles it via `jax.make_array_from_process_local_data`, and the jitted
DP train step all-reduces gradients across processes.  The losses are
written to a JSON file for the parent test to compare against a
single-process run.

Launched as:
    python tests/_mp_ldm_worker.py <pid> <nprocs> <port> <records_dir> \
        <out_json> <steps> [ckpt_dir]

With `ckpt_dir`, the worker restores the latest multi-process Orbax
checkpoint if one exists (resuming the deterministic indexed loader at
the restored step), trains `steps` MORE steps, and saves — the
multi-host generalization of the reference's restore-at-start semantics
(model_runners.py:200-205), exercised by
test_multiprocess.py::test_two_process_checkpoint_resume_exact.

Env (set by the parent): JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<k> so each process
contributes k local CPU devices to a k*nprocs-device global mesh.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    records_dir, out_json, steps = sys.argv[4], sys.argv[5], int(sys.argv[6])
    ckpt_dir = sys.argv[7] if len(sys.argv) > 7 else None

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nprocs, process_id=pid
        )
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp

    from ldm_tf2_tpu.data.dataset import shard_for_process
    from ldm_tf2_tpu.data.indexed import create_indexed_dataset
    from ldm_tf2_tpu.diffusion import make_schedule
    from ldm_tf2_tpu.models import AutoencoderKL, TransformerModel, UNet
    from ldm_tf2_tpu.parallel import create_mesh, replicate, shard_batch
    from ldm_tf2_tpu.training.ldm_trainer import (
        init_ldm_train_state,
        make_ldm_train_step,
        make_optimizer,
    )

    files = sorted(glob.glob(os.path.join(records_dir, "*.tfrecord")))

    IMG = 16
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
        vocab_size=256,
        encoder_stack_size=1,
        hidden_size=32,
        num_heads=2,
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
            condition_dropout_rate=0.1,
            null_token_ids=jnp.array([101, 102] + [0] * 6, jnp.int32),
        )
    )

    mesh = create_mesh()  # all global devices on the data axis

    state = replicate(
        init_ldm_train_state(unet_params, cond_params, optimizer), mesh
    )
    ae_rep = replicate(ae_params, mesh)
    rng = jax.random.PRNGKey(42)

    # Multi-process checkpoint restore: every process participates in the
    # Orbax restore against the live state's shardings, then resumes the
    # deterministic loader at the restored step.
    step0 = 0
    restored_leaf0_sum = None
    manager = None
    if ckpt_dir is not None:
        from ldm_tf2_tpu.checkpoints.manager import CheckpointManager

        manager = CheckpointManager(ckpt_dir)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding),
            state,
        )
        restored = manager.restore_latest(abstract)
        if restored is not None:
            step0, state = restored
            restored_leaf0_sum = float(
                jnp.sum(jax.tree.leaves(state.unet_params)[0])
            )

    # Global batch 4, sliced per process by the indexed loader's global
    # permutation sharding (data/indexed.py).
    global_batch = 4
    loader = create_indexed_dataset(
        files,
        batch_size=global_batch // nprocs,
        image_size=IMG,
        keys=("image", "caption"),
        max_seq_len=8,
        random_seed=7,
        start_step=step0,
        shard_index=pid,
        shard_count=nprocs,
        num_workers=2,
    )

    losses = []
    for i in range(steps):
        imgs, caps = next(loader)
        batch = shard_batch(
            (imgs.astype("float32"), caps.astype("int32")), mesh
        )
        state, metrics = step_fn(state, ae_rep, *batch, rng)
        losses.append(float(metrics["loss"]))
        if manager is not None:
            # per-step saves so the SIGKILL variant always has a complete
            # checkpoint behind the kill point (Orbax atomic-rename commit)
            manager.save(step0 + i + 1, state)

    if manager is not None:
        manager.wait()
        manager.close()

    result = {
        "pid": pid,
        "nprocs": nprocs,
        "global_devices": len(jax.devices()),
        "losses": losses,
        "my_files": shard_for_process(files),
        "restored_step": step0,
        "restored_leaf0_sum": restored_leaf0_sum,
        "unet_leaf0_sum": float(
            jnp.sum(jax.tree.leaves(state.unet_params)[0])
        ),
    }
    with open(out_json, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
