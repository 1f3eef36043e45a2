"""LPIPS weight conversion: the reference's TF `lpips.ckpt-1` -> our params.

The reference distributes pretrained LPIPS weights as a TF object checkpoint
(README.md:118-121; loaded at run_autoencoder_trainer.py:27-28 via
`tf.train.Checkpoint(lpips=lpips)`).  Its variable names are clean object
paths:

    lpips/_vgg16/_conv_layers/{stage}/{idx}/{kernel,bias}/.ATTRIBUTES/...
    lpips/_projs/{stage}/kernel/.ATTRIBUTES/...

This module maps them onto our `models/lpips.py` param tree
(vgg16/conv{stage}_{idx}, proj_{stage}) — layouts are identical (HWIO convs,
[in,1] dense kernels), so no transforms are needed.  The CLI wrapper
(`tools/convert_lpips_tf_to_jax.py`) reads the checkpoint with TF's bare
checkpoint reader (no Keras involved).
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

import numpy as np

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"
_CONV_RE = re.compile(
    r"^lpips/_vgg16/_conv_layers/(\d+)/(\d+)/(kernel|bias)$"
)
_PROJ_RE = re.compile(r"^lpips/_projs/(\d+)/kernel$")


def convert_lpips_from_reader(
    names: Iterable[str], get_tensor: Callable[[str], np.ndarray]
) -> dict:
    """Build the LPIPS param tree from (variable name -> tensor) access."""
    params: dict = {"vgg16": {}}
    for full_name in names:
        if not full_name.endswith(_SUFFIX):
            continue
        name = full_name[: -len(_SUFFIX)]
        m = _CONV_RE.match(name)
        if m:
            stage, idx, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            params["vgg16"].setdefault(f"conv{stage}_{idx}", {})[kind] = (
                np.asarray(get_tensor(full_name))
            )
            continue
        m = _PROJ_RE.match(name)
        if m:
            params[f"proj_{int(m.group(1))}"] = {
                "kernel": np.asarray(get_tensor(full_name))
            }

    # completeness: 13 convs (2+2+3+3+3) with kernel+bias, 5 projections
    depths = (2, 2, 3, 3, 3)
    for i, depth in enumerate(depths):
        for j in range(depth):
            conv = params["vgg16"].get(f"conv{i}_{j}", {})
            if "kernel" not in conv or "bias" not in conv:
                raise ValueError(f"lpips checkpoint missing conv{i}_{j}")
    for i in range(5):
        if f"proj_{i}" not in params:
            raise ValueError(f"lpips checkpoint missing proj_{i}")
    return params


def convert_lpips_tf_checkpoint(ckpt_prefix: str) -> dict:
    """Read a `tf.train.Checkpoint(lpips=...)` checkpoint (e.g. lpips.ckpt-1)
    and return our param tree."""
    import tensorflow as tf  # only needed for this one-time conversion

    reader = tf.train.load_checkpoint(ckpt_prefix)
    names = list(reader.get_variable_to_shape_map())
    return convert_lpips_from_reader(names, reader.get_tensor)
