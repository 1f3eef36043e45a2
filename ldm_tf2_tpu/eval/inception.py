"""InceptionV3 pool3 feature extractor for literature-comparable FID.

The always-available VGG-FID (eval/fid.py) uses LPIPS-VGG trunk features
and is NOT comparable to published Inception-FID numbers.  This module
implements the standard extractor — InceptionV3 up to the 2048-d pool3
layer (Heusel et al., arXiv:1706.08500) — as pure JAX inference over a
name-based param tree, with a converter from the torchvision
``inception_v3`` state_dict layout (which the pytorch-fid
``pt_inception-2015-12-05`` weights also use).

Weights are NOT shipped (zero network egress in this environment, and no
local copy exists): ``inception_feature_extractor`` is weights-gated
exactly like ``eval/fid.py::clip_score`` — it raises with download
instructions unless a local ``.pth``/``.pt`` state_dict path is supplied.
The graph itself is validated with synthetic random weights
(tests/test_eval.py): structure, feature dimensionality, and
FID(x, x) == 0 do not need trained weights.

Faithfulness notes — the graph matches pytorch-fid's ``FIDInceptionV3``
(the wrapper behind every published pytorch-fid number), so features are
comparable when the ``pt_inception-2015-12-05`` weights are supplied:
  * input: images in [-1, 1], bilinearly resized to 299x299
    (align_corners=False — jax.image.resize "linear" matches torch
    F.interpolate defaults) and fed DIRECTLY to Conv2d_1a_3x3.
    pytorch-fid's wrapper applies only ``2*x - 1`` (normalize_input) and
    never torchvision's ``transform_input`` affine — applying that affine
    to [-1, 1] input would rescale each channel by ~0.45 (ADVICE r3);
  * the 3x3 stride-1 average pools inside InceptionA/C and Mixed_7b use
    count_include_pad=False (the pytorch-fid patch that matches the
    original TF-graph semantics);
  * Mixed_7c's branch_pool is a 3x3 stride-1 MAX pool (pytorch-fid's
    FIDInceptionE_2 patch), not an average pool (ADVICE r3);
  * BatchNorm eval mode, eps 1e-3 (torchvision BasicConv2d).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


# ---------------------------------------------------------------------------
# functional graph (params = nested dict mirroring torch module names)
# ---------------------------------------------------------------------------


def _conv_bn_relu(p, x, stride=1, padding=((0, 0), (0, 0))):
    """torchvision BasicConv2d: conv(no bias) -> BN(eps 1e-3, eval) -> relu."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    w = p["conv"]["kernel"]  # HWIO
    x = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-3)
    x = (x.astype(jnp.float32) - bn["mean"]) * inv * bn["scale"] + bn["bias"]
    return jax.nn.relu(x)


def _max_pool(x, window=3, stride=2):
    from jax import lax

    return lax.reduce_window(
        x, -np.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "VALID",
    )


def _avg_pool_3x3_same_exclude_pad(x):
    """3x3 stride-1 SAME average pool with count_include_pad=False:
    sum-pool / valid-element count (the pytorch-fid InceptionA/C/E
    semantics)."""
    import jax.numpy as jnp
    from jax import lax

    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sum_pool = lambda v: lax.reduce_window(
        v, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return sum_pool(x) / sum_pool(ones)


_P0 = ((0, 0), (0, 0))
_P1 = ((1, 1), (1, 1))
_P2 = ((2, 2), (2, 2))
_P_1x7 = ((0, 0), (3, 3))  # kernel (1, 7)
_P_7x1 = ((3, 3), (0, 0))  # kernel (7, 1)
_P_1x3 = ((0, 0), (1, 1))
_P_3x1 = ((1, 1), (0, 0))


def _inception_a(p, x):
    import jax.numpy as jnp

    b1 = _conv_bn_relu(p["branch1x1"], x)
    b5 = _conv_bn_relu(p["branch5x5_1"], x)
    b5 = _conv_bn_relu(p["branch5x5_2"], b5, padding=_P2)
    b3 = _conv_bn_relu(p["branch3x3dbl_1"], x)
    b3 = _conv_bn_relu(p["branch3x3dbl_2"], b3, padding=_P1)
    b3 = _conv_bn_relu(p["branch3x3dbl_3"], b3, padding=_P1)
    bp = _conv_bn_relu(p["branch_pool"], _avg_pool_3x3_same_exclude_pad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    import jax.numpy as jnp

    b3 = _conv_bn_relu(p["branch3x3"], x, stride=2)
    bd = _conv_bn_relu(p["branch3x3dbl_1"], x)
    bd = _conv_bn_relu(p["branch3x3dbl_2"], bd, padding=_P1)
    bd = _conv_bn_relu(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _inception_c(p, x):
    import jax.numpy as jnp

    b1 = _conv_bn_relu(p["branch1x1"], x)
    b7 = _conv_bn_relu(p["branch7x7_1"], x)
    b7 = _conv_bn_relu(p["branch7x7_2"], b7, padding=_P_1x7)
    b7 = _conv_bn_relu(p["branch7x7_3"], b7, padding=_P_7x1)
    bd = _conv_bn_relu(p["branch7x7dbl_1"], x)
    bd = _conv_bn_relu(p["branch7x7dbl_2"], bd, padding=_P_7x1)
    bd = _conv_bn_relu(p["branch7x7dbl_3"], bd, padding=_P_1x7)
    bd = _conv_bn_relu(p["branch7x7dbl_4"], bd, padding=_P_7x1)
    bd = _conv_bn_relu(p["branch7x7dbl_5"], bd, padding=_P_1x7)
    bp = _conv_bn_relu(p["branch_pool"], _avg_pool_3x3_same_exclude_pad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    import jax.numpy as jnp

    b3 = _conv_bn_relu(p["branch3x3_1"], x)
    b3 = _conv_bn_relu(p["branch3x3_2"], b3, stride=2)
    b7 = _conv_bn_relu(p["branch7x7x3_1"], x)
    b7 = _conv_bn_relu(p["branch7x7x3_2"], b7, padding=_P_1x7)
    b7 = _conv_bn_relu(p["branch7x7x3_3"], b7, padding=_P_7x1)
    b7 = _conv_bn_relu(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _max_pool_3x3_same_stride1(x):
    """3x3 stride-1 SAME max pool — pytorch-fid's FIDInceptionE_2 patch
    for Mixed_7c (F.max_pool2d(kernel_size=3, stride=1, padding=1))."""
    from jax import lax

    return lax.reduce_window(
        x, -np.inf, lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )


def _inception_e(p, x, pool="avg"):
    import jax.numpy as jnp

    b1 = _conv_bn_relu(p["branch1x1"], x)
    b3 = _conv_bn_relu(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [
            _conv_bn_relu(p["branch3x3_2a"], b3, padding=_P_1x3),
            _conv_bn_relu(p["branch3x3_2b"], b3, padding=_P_3x1),
        ],
        axis=-1,
    )
    bd = _conv_bn_relu(p["branch3x3dbl_1"], x)
    bd = _conv_bn_relu(p["branch3x3dbl_2"], bd, padding=_P1)
    bd = jnp.concatenate(
        [
            _conv_bn_relu(p["branch3x3dbl_3a"], bd, padding=_P_1x3),
            _conv_bn_relu(p["branch3x3dbl_3b"], bd, padding=_P_3x1),
        ],
        axis=-1,
    )
    pooled = (
        _max_pool_3x3_same_stride1(x)
        if pool == "max"
        else _avg_pool_3x3_same_exclude_pad(x)
    )
    bp = _conv_bn_relu(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params, images):
    """images [N, 299, 299, 3] in [-1, 1] -> pool3 features [N, 2048]."""
    import jax.numpy as jnp

    # [-1, 1] input goes straight to the stem: pytorch-fid's wrapper
    # applies only normalize_input (2x-1 from [0,1]) and builds the trunk
    # with transform_input=False, so no per-channel affine here (ADVICE
    # r3 — the affine belongs to torchvision's ImageNet-normalized
    # convention, not the FID convention these features must match).
    x = images.astype(jnp.float32)
    x = _conv_bn_relu(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn_relu(params["Conv2d_2a_3x3"], x)
    x = _conv_bn_relu(params["Conv2d_2b_3x3"], x, padding=_P1)
    x = _max_pool(x)
    x = _conv_bn_relu(params["Conv2d_3b_1x1"], x)
    x = _conv_bn_relu(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]


# ---------------------------------------------------------------------------
# torchvision state_dict -> param tree
# ---------------------------------------------------------------------------

# (module name, branch conv names) for every BasicConv2d in the graph
_STEM = (
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
    "Conv2d_3b_1x1", "Conv2d_4a_3x3",
)
_BLOCK_BRANCHES = {
    "Mixed_5b": ("branch1x1", "branch5x5_1", "branch5x5_2",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                 "branch_pool"),
    "Mixed_6a": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"),
    "Mixed_6b": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "Mixed_7a": ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                 "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"),
    "Mixed_7b": ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"),
}
_BLOCK_BRANCHES["Mixed_5c"] = _BLOCK_BRANCHES["Mixed_5b"]
_BLOCK_BRANCHES["Mixed_5d"] = _BLOCK_BRANCHES["Mixed_5b"]
_BLOCK_BRANCHES["Mixed_6c"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_6d"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_6e"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_7c"] = _BLOCK_BRANCHES["Mixed_7b"]


def convert_torchvision_inception(state_dict: dict) -> dict:
    """torchvision ``inception_v3`` (or pytorch-fid ``pt_inception``)
    state_dict -> the nested param tree ``inception_pool3`` consumes.

    Conv weights transpose OIHW -> HWIO; BN keeps
    weight/bias/running_mean/running_var as scale/bias/mean/var.  The
    classifier head (``fc``) and aux tower (``AuxLogits``) are unused by
    pool3 and ignored.
    """

    def conv_bn(prefix):
        w = np.asarray(state_dict[f"{prefix}.conv.weight"])
        return {
            "conv": {"kernel": w.transpose(2, 3, 1, 0).copy()},
            "bn": {
                "scale": np.asarray(state_dict[f"{prefix}.bn.weight"],
                                    np.float32),
                "bias": np.asarray(state_dict[f"{prefix}.bn.bias"],
                                   np.float32),
                "mean": np.asarray(state_dict[f"{prefix}.bn.running_mean"],
                                   np.float32),
                "var": np.asarray(state_dict[f"{prefix}.bn.running_var"],
                                  np.float32),
            },
        }

    params = {name: conv_bn(name) for name in _STEM}
    for block, branches in _BLOCK_BRANCHES.items():
        params[block] = {b: conv_bn(f"{block}.{b}") for b in branches}
    return params


def make_synthetic_inception_state_dict(seed: int = 0) -> dict:
    """Random torchvision-shaped state_dict (for structure tests — the
    graph and converter are exercised without the real 95 MB weights)."""
    rng = np.random.RandomState(seed)
    sd: dict = {}

    def add(prefix, cin, cout, kh, kw):
        sd[f"{prefix}.conv.weight"] = rng.randn(
            cout, cin, kh, kw
        ).astype(np.float32) * (kh * kw * cin) ** -0.5
        sd[f"{prefix}.bn.weight"] = np.abs(rng.randn(cout)).astype(np.float32)
        sd[f"{prefix}.bn.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.bn.running_mean"] = rng.randn(cout).astype(
            np.float32
        ) * 0.1
        sd[f"{prefix}.bn.running_var"] = np.abs(rng.randn(cout)).astype(
            np.float32
        ) + 0.5
        return cout

    add("Conv2d_1a_3x3", 3, 32, 3, 3)
    add("Conv2d_2a_3x3", 32, 32, 3, 3)
    add("Conv2d_2b_3x3", 32, 64, 3, 3)
    add("Conv2d_3b_1x1", 64, 80, 1, 1)
    add("Conv2d_4a_3x3", 80, 192, 3, 3)

    def inception_a(name, cin, pool):
        add(f"{name}.branch1x1", cin, 64, 1, 1)
        add(f"{name}.branch5x5_1", cin, 48, 1, 1)
        add(f"{name}.branch5x5_2", 48, 64, 5, 5)
        add(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        add(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        add(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        add(f"{name}.branch_pool", cin, pool, 1, 1)
        return 64 + 64 + 96 + pool

    def inception_b(name, cin):
        add(f"{name}.branch3x3", cin, 384, 3, 3)
        add(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        add(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        add(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        return 384 + 96 + cin

    def inception_c(name, cin, c7):
        add(f"{name}.branch1x1", cin, 192, 1, 1)
        add(f"{name}.branch7x7_1", cin, c7, 1, 1)
        add(f"{name}.branch7x7_2", c7, c7, 1, 7)
        add(f"{name}.branch7x7_3", c7, 192, 7, 1)
        add(f"{name}.branch7x7dbl_1", cin, c7, 1, 1)
        add(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        add(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        add(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        add(f"{name}.branch7x7dbl_5", c7, 192, 1, 7)
        add(f"{name}.branch_pool", cin, 192, 1, 1)
        return 768

    def inception_d(name, cin):
        add(f"{name}.branch3x3_1", cin, 192, 1, 1)
        add(f"{name}.branch3x3_2", 192, 320, 3, 3)
        add(f"{name}.branch7x7x3_1", cin, 192, 1, 1)
        add(f"{name}.branch7x7x3_2", 192, 192, 1, 7)
        add(f"{name}.branch7x7x3_3", 192, 192, 7, 1)
        add(f"{name}.branch7x7x3_4", 192, 192, 3, 3)
        return 320 + 192 + cin

    def inception_e(name, cin):
        add(f"{name}.branch1x1", cin, 320, 1, 1)
        add(f"{name}.branch3x3_1", cin, 384, 1, 1)
        add(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        add(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        add(f"{name}.branch3x3dbl_1", cin, 448, 1, 1)
        add(f"{name}.branch3x3dbl_2", 448, 384, 3, 3)
        add(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        add(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        add(f"{name}.branch_pool", cin, 192, 1, 1)
        return 320 + 768 + 768 + 192

    c = inception_a("Mixed_5b", 192, 32)     # 256
    c = inception_a("Mixed_5c", c, 64)       # 288
    c = inception_a("Mixed_5d", c, 64)       # 288
    c = inception_b("Mixed_6a", c)           # 768
    c = inception_c("Mixed_6b", c, 128)
    c = inception_c("Mixed_6c", c, 160)
    c = inception_c("Mixed_6d", c, 160)
    c = inception_c("Mixed_6e", c, 192)
    c = inception_d("Mixed_7a", c)           # 1280
    c = inception_e("Mixed_7b", c)           # 2048
    c = inception_e("Mixed_7c", c)           # 2048
    # head keys a real checkpoint carries; converter must ignore them
    sd["fc.weight"] = rng.randn(1008, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1008).astype(np.float32)
    return sd


def inception_feature_extractor(
    weights_path: str | None = None, batch_size: int = 16
) -> Callable[[np.ndarray], np.ndarray]:
    """features(images [N,H,W,3] in [-1,1]) -> [N, 2048] pool3 features.

    Weights-gated like eval/fid.py::clip_score: a random InceptionV3
    measures nothing comparable, so there is no offline fallback.
    """
    if weights_path is None:
        raise RuntimeError(
            "Inception-FID needs pretrained pool3 weights. Download the "
            "torchvision inception_v3 checkpoint "
            "(inception_v3_google-0cc3c7bd.pth) or pytorch-fid's "
            "pt_inception-2015-12-05 weights and pass "
            "inception_weights_path=<file>."
        )
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return _extractor_from_state_dict(sd, batch_size)


def _extractor_from_state_dict(sd: dict, batch_size: int = 16):
    import jax
    import jax.numpy as jnp

    params = convert_torchvision_inception(sd)

    @jax.jit
    def _features(images):
        x = jax.image.resize(
            images.astype(jnp.float32),
            (images.shape[0], 299, 299, 3),
            method="linear",
        )
        return inception_pool3(params, x)

    def features(images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32)
        out = []
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(_features(images[i:i + batch_size])))
        return np.concatenate(out, axis=0)

    return features
