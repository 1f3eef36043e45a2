"""Utils + mesh helper tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.parallel import create_mesh, data_sharding, replicate
from ldm_tf2_tpu.utils import MetricLogger, Timer


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8}
    mesh = create_mesh({"data": 2, "model": 4})
    assert mesh.shape == {"data": 2, "model": 4}
    mesh = create_mesh({"data": -1, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh({"data": 3})


def test_replicate_and_shard():
    mesh = create_mesh()
    x = jnp.arange(16.0).reshape(8, 2)
    xr = replicate(x, mesh)
    assert xr.sharding.is_fully_replicated
    xs = jax.device_put(x, data_sharding(mesh, 2))
    assert not xs.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_metric_logger(tmp_path, capsys):
    path = str(tmp_path / "log.jsonl")
    logger = MetricLogger(jsonl_path=path, log_per_iterations=2)
    logger.log(1, {"loss": 1.0})  # skipped (not multiple of 2)
    logger.log(2, {"loss": 0.5}, batch_size=4)
    logger.log(4, {"loss": 0.25}, batch_size=4)
    out = capsys.readouterr().out
    assert "step 2" in out and "step 4" in out
    assert "step 1" not in out
    records = [json.loads(l) for l in open(path)]
    assert len(records) == 2
    assert records[1]["loss"] == 0.25
    assert "steps_per_sec" in records[1]
    assert "images_per_sec" in records[1]


def test_timer():
    f = jax.jit(lambda x: x * 2)
    t = Timer.time_fn(f, jnp.ones((8, 8)), iters=3)
    assert t > 0


def test_nearest_resize_matches_tf_v2():
    tf = pytest.importorskip("tensorflow")
    from ldm_tf2_tpu.ops.resize import nearest_resize

    rng = np.random.RandomState(0)
    x = rng.randn(1, 20, 30, 3).astype(np.float32)
    for size in (16, 7, 40):
        ours = nearest_resize(jnp.asarray(x), size, size)
        theirs = tf.image.resize(
            x, (size, size), method=tf.image.ResizeMethod.NEAREST_NEIGHBOR
        ).numpy()
        np.testing.assert_array_equal(np.asarray(ours), theirs)


def test_nearest_upsample_matches_tf_raw_op():
    tf = pytest.importorskip("tensorflow")
    from ldm_tf2_tpu.ops.resize import nearest_upsample_2x

    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = nearest_upsample_2x(jnp.asarray(x))
    theirs = tf.raw_ops.ResizeNearestNeighbor(
        images=x, size=[10, 14], align_corners=False
    ).numpy()
    np.testing.assert_array_equal(np.asarray(ours), theirs)
