"""LPIPS TF-checkpoint conversion: name mapping + structural completeness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tf2_tpu.checkpoints.convert_lpips import convert_lpips_from_reader
from ldm_tf2_tpu.models import LPIPS

_DEPTHS = (2, 2, 3, 3, 3)
_CHANNELS = (64, 128, 256, 512, 512)


def _fake_reader(rng):
    tensors = {}
    cin = 3
    for i, (depth, cout) in enumerate(zip(_DEPTHS, _CHANNELS)):
        for j in range(depth):
            base = f"lpips/_vgg16/_conv_layers/{i}/{j}"
            tensors[f"{base}/kernel/.ATTRIBUTES/VARIABLE_VALUE"] = (
                rng.randn(3, 3, cin, cout).astype(np.float32)
            )
            tensors[f"{base}/bias/.ATTRIBUTES/VARIABLE_VALUE"] = (
                rng.randn(cout).astype(np.float32)
            )
            cin = cout
    for i, c in enumerate(_CHANNELS):
        tensors[f"lpips/_projs/{i}/kernel/.ATTRIBUTES/VARIABLE_VALUE"] = (
            rng.randn(c, 1).astype(np.float32)
        )
    tensors["_CHECKPOINTABLE_OBJECT_GRAPH"] = np.zeros(1)
    return tensors


def test_convert_lpips(rng):
    tensors = _fake_reader(rng)
    params = convert_lpips_from_reader(tensors.keys(), tensors.__getitem__)

    model = LPIPS()
    a = jnp.zeros((1, 16, 16, 3))
    ref = model.init(jax.random.PRNGKey(0), a, a)["params"]
    # structure matches exactly
    assert jax.tree_util.tree_structure(params) == (
        jax.tree_util.tree_structure(jax.tree.map(np.asarray, ref))
    )
    out = model.apply({"params": params}, a, a)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_convert_lpips_detects_missing(rng):
    tensors = _fake_reader(rng)
    del tensors["lpips/_projs/3/kernel/.ATTRIBUTES/VARIABLE_VALUE"]
    with pytest.raises(ValueError, match="proj_3"):
        convert_lpips_from_reader(tensors.keys(), tensors.__getitem__)
