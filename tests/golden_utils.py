"""Deterministic weight materialization in the reference's Keras order.

tools/make_goldens.py assigns reference-model weights sequentially from a
seeded numpy Philox generator in `model.get_weights()` order — which for
Keras 2 is **attribute-creation order** (verified against the reference's
own converter traversal, convert_ckpt_pytorch_to_tf2.py:23-372).  The
functions here walk OUR flax param trees in that same order and draw from
the same generator, reproducing bit-identical weights on the JAX side.

All tensor layouts coincide (Keras Dense [in,out] == flax Dense;
Keras Conv2D HWIO == flax Conv; gamma/beta == scale/bias; Projection kernels
share shapes by design) so no transforms are needed — only ordering.
"""

from __future__ import annotations

import numpy as np

SEED = 20260816
WEIGHT_SCALE = 0.05


# ---- per-layer weight orders (collection, path suffix) ----


def dense(path, bias=True):
    out = [("params", path + ("kernel",))]
    if bias:
        out.append(("params", path + ("bias",)))
    return out


conv = dense  # same order


def norm(path):  # GroupNorm / LayerNorm: gamma, beta
    return [("params", path + ("scale",)), ("params", path + ("bias",))]


def batchnorm(path, stats_path):
    return [
        ("params", path + ("scale",)),
        ("params", path + ("bias",)),
        ("batch_stats", stats_path + ("mean",)),
        ("batch_stats", stats_path + ("var",)),
    ]


def projection(path, bias=False):
    return dense(path, bias)


def geglu(path):
    """The reference stores ONE fused [D, 2F] kernel + [2F] bias for the
    GEGLU (unet.py:317-325); our tree splits it into value/gate leaves
    (models/unet.py GEGLU — TP column parallelism).  These entries draw
    the reference's fused tensor in one generator call and scatter the
    column halves, preserving the exact draw sequence."""
    return [
        ("params", path, "geglu_kernel"),
        ("params", path, "geglu_bias"),
    ]


def embedding(path):
    return [("params", path + ("embedding",))]


# ---- model orders ----


def transformer_order(num_layers: int):
    order = []
    for i in range(num_layers):
        layer = ("layer_" + str(i),)
        mha = layer + ("mha",)
        order += projection(mha + ("query",))
        order += projection(mha + ("key",))
        order += projection(mha + ("value",))
        order += projection(mha + ("output",), bias=True)
        order += norm(layer + ("layernorm_mha",))
        order += dense(layer + ("ffn", "filter"))
        order += dense(layer + ("ffn", "output"))
        order += norm(layer + ("layernorm_ffn",))
    order += norm(("layernorm_out",))
    order += embedding(("token_embedding",))
    order += embedding(("positional_embedding",))
    return order


def _unet_residual(path, has_shortcut):
    order = []
    order += norm(path + ("group_norm_1",))
    order += conv(path + ("conv2d_1",))
    order += dense(path + ("dense",))
    order += norm(path + ("group_norm_2",))
    order += conv(path + ("conv2d_2",))
    if has_shortcut:
        order += dense(path + ("shortcut",))
    return order


def _unet_spatial_transformer(path):
    order = []
    order += dense(path + ("proj_in",))
    block = path + ("block",)
    for att in ("att_layer1", "att_layer2"):
        order += projection(block + (att, "query"))
        order += projection(block + (att, "key"))
        order += projection(block + (att, "value"))
        order += projection(block + (att, "output"), bias=True)
    order += geglu(block + ("ffn", "geglu"))
    order += dense(block + ("ffn", "dense"))
    order += norm(block + ("layernorm1",))
    order += norm(block + ("layernorm2",))
    order += norm(block + ("layernorm3",))
    order += dense(path + ("proj_out",))
    order += norm(path + ("group_norm",))
    return order


def unet_order(num_blocks=1, channel_mult=(1, 2)):
    num_levels = len(channel_mult)
    order = []
    order += conv(("conv_in",))
    order += dense(("time_dense1",))
    order += dense(("time_dense2",))

    idx = 0
    prev_mult = 1
    for level, mult in enumerate(channel_mult):
        for j in range(num_blocks):
            base = (f"input_block_{idx}",)
            order += _unet_residual(
                base + ("residual",), mult != prev_mult and j == 0
            )
            if level < num_levels - 1:
                order += _unet_spatial_transformer(
                    base + ("spatial_transformer",)
                )
            idx += 1
        prev_mult = mult
        if level < num_levels - 1:
            order += conv((f"input_block_{idx}", "downsample", "conv"))
            idx += 1

    order += _unet_residual(("middle_block", "residual1"), False)
    order += _unet_spatial_transformer(("middle_block", "spatial_transformer"))
    order += _unet_residual(("middle_block", "residual2"), False)

    idx = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for j in range(num_blocks + 1):
            base = (f"output_block_{idx}",)
            order += _unet_residual(base + ("residual",), True)
            if level < num_levels - 1:
                order += _unet_spatial_transformer(
                    base + ("spatial_transformer",)
                )
            if level > 0 and j == num_blocks:
                order += conv(base + ("upsample", "conv"))
            idx += 1

    order += norm(("group_norm",))
    order += conv(("conv_out",))
    return order


def _ae_residual(path, has_shortcut):
    order = []
    order += norm(path + ("group_norm1",))
    order += conv(path + ("conv1",))
    order += norm(path + ("group_norm2",))
    order += conv(path + ("conv2",))
    if has_shortcut:
        order += dense(path + ("shortcut",))
    return order


def _ae_attention(path):
    order = []
    order += norm(path + ("group_norm",))
    order += dense(path + ("query",))
    order += dense(path + ("key",))
    order += dense(path + ("value",))
    order += dense(path + ("output",))
    return order


def _ae_encoder_order(num_blocks, multipliers, image_size, attention_resolutions):
    order = [*conv(("encoder", "conv_in"))]
    idx = 0
    prev_mult = 1
    res = image_size
    for level, mult in enumerate(multipliers):
        for j in range(num_blocks):
            base = ("encoder", f"down_{idx}")
            order += _ae_residual(
                base + ("residual",), mult != prev_mult and j == 0
            )
            if res in attention_resolutions:
                order += _ae_attention(base + ("attention",))
            idx += 1
        prev_mult = mult
        if level < len(multipliers) - 1:
            order += conv(("encoder", f"down_{idx}", "conv"))
            idx += 1
            res //= 2
    order += _ae_residual(("encoder", "middle", "residual1"), False)
    order += _ae_attention(("encoder", "middle", "attention"))
    order += _ae_residual(("encoder", "middle", "residual2"), False)
    order += norm(("encoder", "group_norm"))
    order += conv(("encoder", "conv_out"))
    return order


def _ae_decoder_order(num_blocks, multipliers, image_size, attention_resolutions,
                      latent_mismatch_levels):
    """latent_mismatch_levels: set of up_{idx} indices with a shortcut."""
    order = [*conv(("decoder", "conv_in"))]
    order += _ae_residual(("decoder", "middle", "residual1"), False)
    order += _ae_attention(("decoder", "middle", "attention"))
    order += _ae_residual(("decoder", "middle", "residual2"), False)
    idx = 0
    res = image_size // 2 ** (len(multipliers) - 1)
    mult_list = list(multipliers)
    prev_channels_mult = mult_list[-1]
    for level in reversed(range(len(mult_list))):
        for j in range(num_blocks + 1):
            base = ("decoder", f"up_{idx}")
            has_shortcut = prev_channels_mult != mult_list[level] and j == 0
            order += _ae_residual(base + ("residual",), has_shortcut)
            if res in attention_resolutions:
                order += _ae_attention(base + ("attention",))
            idx += 1
        prev_channels_mult = mult_list[level]
        if level > 0:
            order += conv(("decoder", f"up_{idx}", "conv"))
            idx += 1
            res *= 2
    order += norm(("decoder", "group_norm"))
    order += conv(("decoder", "conv_out"))
    return order


def autoencoder_kl_order(num_blocks=1, multipliers=(1, 2), image_size=16):
    order = []
    order += _ae_encoder_order(num_blocks, multipliers, image_size, ())
    order += dense(("quant_conv",))
    order += dense(("post_quant_conv",))
    order += _ae_decoder_order(num_blocks, multipliers, image_size, (), None)
    return order


def autoencoder_vq_order(
    num_blocks=1, multipliers=(1, 2), image_size=16,
    attention_resolutions=(8,),
):
    order = []
    order += _ae_encoder_order(
        num_blocks, multipliers, image_size, attention_resolutions
    )
    order += dense(("quant_conv",))
    order += [("params", ("quantize", "kernel"))]
    order += dense(("post_quant_conv",))
    order += _ae_decoder_order(
        num_blocks, multipliers, image_size, attention_resolutions, None
    )
    return order


def lpips_order():
    order = []
    depths = (2, 2, 3, 3, 3)
    for i, depth in enumerate(depths):
        for j in range(depth):
            order += conv(("vgg16", f"conv{i}_{j}"))
    for i in range(5):
        order += dense((f"proj_{i}",), bias=False)
    return order


def discriminator_order(num_layers=2):
    # Keras `model.weights` lists all TRAINABLE weights first, then the
    # non-trainable BatchNorm moving stats (in layer order) at the end.
    order = [*conv(("conv_0",))]
    stats = []
    for n in range(1, num_layers + 1):
        order += conv((f"conv_{n}",), bias=False)
        order += norm((f"bn_{n}",))
        stats += [
            ("batch_stats", (f"bn_{n}", "mean")),
            ("batch_stats", (f"bn_{n}", "var")),
        ]
    order += conv(("conv_out",))
    return order + stats


# ---- materialization ----


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def materialize(variables, order, seed=SEED):
    """Overwrite leaves of `variables` (mutable nested dicts) in `order`
    with the same sequence of draws as tools/make_goldens.py."""
    import jax

    variables = jax.tree.map(np.asarray, variables)
    variables = jax.tree.map(lambda x: x, variables)  # shallow copy ok; dicts
    gen = np.random.Generator(np.random.Philox(seed))
    seen = set()
    for entry in order:
        if len(entry) == 3:  # geglu(): one fused reference draw, two leaves
            collection, path, kind = entry
            leaf_name = "kernel" if kind == "geglu_kernel" else "bias"
            v_path = path + ("value", leaf_name)
            g_path = path + ("gate", leaf_name)
            v_leaf = _get(variables[collection], v_path)
            fused_shape = v_leaf.shape[:-1] + (2 * v_leaf.shape[-1],)
            fused = (
                gen.standard_normal(fused_shape).astype(np.float32)
                * WEIGHT_SCALE
            )
            half = v_leaf.shape[-1]
            _set(variables[collection], v_path, fused[..., :half])
            _set(variables[collection], g_path, fused[..., half:])
            seen.add((collection, v_path))
            seen.add((collection, g_path))
            continue
        collection, path = entry
        leaf = _get(variables[collection], path)
        value = gen.standard_normal(leaf.shape).astype(np.float32) * WEIGHT_SCALE
        if collection == "batch_stats" and path[-1] == "var":
            value = np.abs(value)
        _set(variables[collection], path, value)
        seen.add((collection, path))

    # completeness check: every leaf must have been materialized
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    all_paths = set()
    for path, _ in flat:
        keys = tuple(str(k.key) for k in path)
        all_paths.add((keys[0], keys[1:]))
    missing = all_paths - seen
    if missing:
        raise AssertionError(f"unmaterialized leaves: {sorted(missing)[:10]}")
    extra = seen - all_paths
    if extra:
        raise AssertionError(f"order names unknown leaves: {sorted(extra)[:10]}")
    return variables
