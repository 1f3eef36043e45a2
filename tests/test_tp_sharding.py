"""Tensor-parallel sharding: DP x TP mesh produces the same numbers as
single-device, with params actually partitioned over the model axis."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tf2_tpu.models import TransformerModel, UNet
from ldm_tf2_tpu.parallel import create_mesh, shard_batch
from ldm_tf2_tpu.parallel.sharding import shard_params_tp, tp_param_shardings


def test_transformer_tp_matches_single_device():
    model = TransformerModel(
        vocab_size=64,
        encoder_stack_size=2,
        hidden_size=32,
        num_heads=4,
        size_per_head=8,
        max_seq_len=8,
        filter_size=64,
        dropout_rate=0.0,
    )
    ids = jax.random.randint(jax.random.PRNGKey(0), (8, 8), 0, 64)
    params = model.init(jax.random.PRNGKey(1), ids)["params"]
    expected = model.apply({"params": params}, ids)

    mesh = create_mesh({"data": 2, "model": 4})
    params_tp = shard_params_tp(params, mesh)
    ids_s = shard_batch(ids, mesh)
    got = jax.jit(lambda p, i: model.apply({"params": p}, i))(params_tp, ids_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=1e-5)

    # heads really are partitioned over the model axis
    shardings = tp_param_shardings(params, mesh)
    q = shardings["layer_0"]["mha"]["query"]["kernel"]
    assert q.spec == jax.sharding.PartitionSpec(None, "model", None)
    # and the sharded leaf is distributed, not replicated
    leaf = params_tp["layer_0"]["mha"]["query"]["kernel"]
    assert leaf.sharding.spec == q.spec


def test_unet_tp_matches_single_device():
    model = UNet(
        model_channels=32,
        out_channels=4,
        num_blocks=1,
        channel_mult=(1, 2),
        num_heads=4,
        context_channels=32,
        dropout_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 4))
    t = jnp.ones((4,))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 32))
    params = model.init(jax.random.PRNGKey(2), x, t, ctx)["params"]
    expected = model.apply({"params": params}, x, t, ctx)

    mesh = create_mesh({"data": 2, "model": 4})
    params_tp = shard_params_tp(params, mesh)
    xs, ctxs = shard_batch(x, mesh), shard_batch(ctx, mesh)
    ts = shard_batch(t, mesh)
    got = jax.jit(
        lambda p, x, t, c: model.apply({"params": p}, x, t, c)
    )(params_tp, xs, ts, ctxs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_tp_rules_fall_back_on_indivisible_dims():
    model = TransformerModel(
        vocab_size=64,
        encoder_stack_size=1,
        hidden_size=32,
        num_heads=2,  # 2 heads not divisible by model=4 -> replicate
        size_per_head=16,
        max_seq_len=8,
        filter_size=63,  # not divisible either
        dropout_rate=0.0,
    )
    ids = jnp.zeros((4, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    mesh = create_mesh({"data": 2, "model": 4})
    shardings = tp_param_shardings(params, mesh)
    q = shardings["layer_0"]["mha"]["query"]["kernel"]
    assert q.spec == jax.sharding.PartitionSpec()
