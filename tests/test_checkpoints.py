"""Converter + Orbax checkpoint tests.

Converter strategy: fabricate a CompVis-shaped PyTorch state_dict for a tiny
config (keys named exactly as in the real `txt2img-f8-large` checkpoint,
shapes derived from the architecture), convert, and verify (a) structural
coverage against `model.init` (every leaf written exactly once, shapes
equal — `_verify_against`), and (b) numeric correctness of the layout
transforms against torch layers for each transform class.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ldm_tf2_tpu.checkpoints.convert_pytorch import (
    _conv,
    _conv1x1,
    _linear,
    _merge_proj,
    _split_proj,
    convert_autoencoder_kl,
    convert_autoencoder_vq,
    convert_transformer,
    convert_unet,
)
from ldm_tf2_tpu.models import AutoencoderKL, AutoencoderVQ, TransformerModel, UNet


# ---------- transform-level numeric checks vs torch ----------


def test_linear_transform_matches_torch(rng):
    w = rng.randn(6, 4).astype(np.float32)  # torch [out, in]
    x = rng.randn(2, 4).astype(np.float32)
    torch_out = torch.nn.functional.linear(torch.tensor(x), torch.tensor(w))
    ours = x @ _linear(w)
    np.testing.assert_allclose(ours, torch_out.numpy(), rtol=1e-4, atol=1e-5)


def test_conv_transform_matches_torch(rng):
    w = rng.randn(6, 3, 3, 3).astype(np.float32)  # torch OIHW
    x = rng.randn(1, 3, 8, 8).astype(np.float32)  # NCHW
    torch_out = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), padding=1
    ).numpy()
    # ours: NHWC conv with HWIO kernel
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(_conv(w)),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), torch_out, rtol=1e-4, atol=1e-5
    )


def test_conv1x1_transform_matches_torch(rng):
    w = rng.randn(6, 4, 1, 1).astype(np.float32)
    x = rng.randn(2, 4, 5, 5).astype(np.float32)
    torch_out = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w)
    ).numpy()
    # ours: Dense over the channel axis in NHWC
    ours = x.transpose(0, 2, 3, 1) @ _conv1x1(w)
    np.testing.assert_allclose(
        ours.transpose(0, 3, 1, 2), torch_out, rtol=1e-4, atol=1e-5
    )


def test_split_merge_proj_roundtrip(rng):
    """split/merge projections compose to the torch attention out-proj math."""
    heads, size, dim = 2, 4, 8
    wq = rng.randn(heads * size, dim).astype(np.float32)
    x = rng.randn(3, 5, dim).astype(np.float32)
    # torch: q = x @ wq.T -> [3,5,H*S], heads split
    q_torch = (x @ wq.T).reshape(3, 5, heads, size)
    q_ours = np.einsum("ntd,dhs->nths", x, _split_proj(wq, heads))
    np.testing.assert_allclose(q_ours, q_torch, rtol=1e-4, atol=1e-5)

    wo = rng.randn(dim, heads * size).astype(np.float32)
    o_torch = q_torch.reshape(3, 5, heads * size) @ wo.T
    o_ours = np.einsum("nths,hsd->ntd", q_torch, _merge_proj(wo, heads))
    np.testing.assert_allclose(o_ours, o_torch, rtol=1e-4, atol=1e-5)


# ---------- structural coverage on tiny CompVis-shaped state dicts ----------


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.02


def _make_transformer_sd(rng, layers=2, hidden=32, heads=2, size=8,
                         vocab=64, seq=8, filters=64):
    sd = {}
    pre = "cond_stage_model.transformer."
    sd[pre + "token_emb.weight"] = _rand(rng, vocab, hidden)
    sd[pre + "pos_emb.emb.weight"] = _rand(rng, seq, hidden)
    sd[pre + "norm.weight"] = _rand(rng, hidden)
    sd[pre + "norm.bias"] = _rand(rng, hidden)
    width = heads * size
    for i in range(layers):
        a = pre + f"attn_layers.layers.{2*i}"
        f = pre + f"attn_layers.layers.{2*i+1}"
        sd[a + ".0.weight"] = _rand(rng, hidden)
        sd[a + ".0.bias"] = _rand(rng, hidden)
        for k in ("to_q", "to_k", "to_v"):
            sd[a + f".1.{k}.weight"] = _rand(rng, width, hidden)
        sd[a + ".1.to_out.weight"] = _rand(rng, hidden, width)
        sd[a + ".1.to_out.bias"] = _rand(rng, hidden)
        sd[f + ".0.weight"] = _rand(rng, hidden)
        sd[f + ".0.bias"] = _rand(rng, hidden)
        sd[f + ".1.net.0.0.weight"] = _rand(rng, filters, hidden)
        sd[f + ".1.net.0.0.bias"] = _rand(rng, filters)
        sd[f + ".1.net.2.weight"] = _rand(rng, hidden, filters)
        sd[f + ".1.net.2.bias"] = _rand(rng, hidden)
    return sd


def test_convert_transformer_tiny(rng):
    model = TransformerModel(
        vocab_size=64, encoder_stack_size=2, hidden_size=32, num_heads=2,
        size_per_head=16, max_seq_len=8, filter_size=64,
    )
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    sd = _make_transformer_sd(rng, layers=2, hidden=32, heads=2, size=16)
    params = convert_transformer(sd, num_layers=2, num_heads=2,
                                 reference_params=ref)
    out = model.apply({"params": params}, jnp.zeros((1, 8), jnp.int32))
    assert np.all(np.isfinite(out))


def _make_unet_sd(rng, C=64, mult=(1, 2), blocks=1, heads=2, ctx=32):
    """CompVis-style diffusion_model state dict for our tiny UNet config."""
    sd = {}
    pre = "model.diffusion_model."
    levels = len(mult)

    def res_keys(base, cin, cout, temb, skip):
        sd[pre + base + ".in_layers.0.weight"] = _rand(rng, cin)
        sd[pre + base + ".in_layers.0.bias"] = _rand(rng, cin)
        sd[pre + base + ".in_layers.2.weight"] = _rand(rng, cout, cin, 3, 3)
        sd[pre + base + ".in_layers.2.bias"] = _rand(rng, cout)
        sd[pre + base + ".emb_layers.1.weight"] = _rand(rng, cout, temb)
        sd[pre + base + ".emb_layers.1.bias"] = _rand(rng, cout)
        sd[pre + base + ".out_layers.0.weight"] = _rand(rng, cout)
        sd[pre + base + ".out_layers.0.bias"] = _rand(rng, cout)
        sd[pre + base + ".out_layers.3.weight"] = _rand(rng, cout, cout, 3, 3)
        sd[pre + base + ".out_layers.3.bias"] = _rand(rng, cout)
        if skip:
            sd[pre + base + ".skip_connection.weight"] = _rand(
                rng, cout, cin, 1, 1
            )
            sd[pre + base + ".skip_connection.bias"] = _rand(rng, cout)

    def st_keys(base, c, heads_):
        width = c
        sd[pre + base + ".norm.weight"] = _rand(rng, c)
        sd[pre + base + ".norm.bias"] = _rand(rng, c)
        sd[pre + base + ".proj_in.weight"] = _rand(rng, width, c, 1, 1)
        sd[pre + base + ".proj_in.bias"] = _rand(rng, width)
        sd[pre + base + ".proj_out.weight"] = _rand(rng, c, width, 1, 1)
        sd[pre + base + ".proj_out.bias"] = _rand(rng, c)
        tb = base + ".transformer_blocks.0"
        for n in (1, 2, 3):
            sd[pre + tb + f".norm{n}.weight"] = _rand(rng, width)
            sd[pre + tb + f".norm{n}.bias"] = _rand(rng, width)
        for attn, kv_dim in (("attn1", width), ("attn2", ctx)):
            sd[pre + tb + f".{attn}.to_q.weight"] = _rand(rng, width, width)
            sd[pre + tb + f".{attn}.to_k.weight"] = _rand(rng, width, kv_dim)
            sd[pre + tb + f".{attn}.to_v.weight"] = _rand(rng, width, kv_dim)
            sd[pre + tb + f".{attn}.to_out.0.weight"] = _rand(rng, width, width)
            sd[pre + tb + f".{attn}.to_out.0.bias"] = _rand(rng, width)
        sd[pre + tb + ".ff.net.0.proj.weight"] = _rand(rng, width * 8, width)
        sd[pre + tb + ".ff.net.0.proj.bias"] = _rand(rng, width * 8)
        sd[pre + tb + ".ff.net.2.weight"] = _rand(rng, width, width * 4)
        sd[pre + tb + ".ff.net.2.bias"] = _rand(rng, width)

    temb = C * 4
    sd[pre + "input_blocks.0.0.weight"] = _rand(rng, C, 4, 3, 3)
    sd[pre + "input_blocks.0.0.bias"] = _rand(rng, C)
    sd[pre + "time_embed.0.weight"] = _rand(rng, temb, C)
    sd[pre + "time_embed.0.bias"] = _rand(rng, temb)
    sd[pre + "time_embed.2.weight"] = _rand(rng, temb, temb)
    sd[pre + "time_embed.2.bias"] = _rand(rng, temb)

    # input trunk
    i = 1
    cin = C
    skips = [C]
    for level, m in enumerate(mult):
        cout = C * m
        for j in range(blocks):
            res_keys(f"input_blocks.{i}.0", cin, cout, temb, cin != cout)
            if level < levels - 1:
                st_keys(f"input_blocks.{i}.1", cout, heads)
            cin = cout
            skips.append(cout)
            i += 1
        if level < levels - 1:
            sd[pre + f"input_blocks.{i}.0.op.weight"] = _rand(
                rng, cout, cout, 3, 3
            )
            sd[pre + f"input_blocks.{i}.0.op.bias"] = _rand(rng, cout)
            skips.append(cout)
            i += 1

    cmid = C * mult[-1]
    res_keys("middle_block.0", cmid, cmid, temb, False)
    st_keys("middle_block.1", cmid, heads)
    res_keys("middle_block.2", cmid, cmid, temb, False)

    # output trunk
    i = 0
    h = cmid
    for level, m in list(enumerate(mult))[::-1]:
        cout = C * m
        for j in range(blocks + 1):
            cin_cat = h + skips.pop()
            res_keys(f"output_blocks.{i}.0", cin_cat, cout, temb, True)
            has_st = level < levels - 1
            if has_st:
                st_keys(f"output_blocks.{i}.1", cout, heads)
            if level > 0 and j == blocks:
                up = 2 if has_st else 1
                sd[pre + f"output_blocks.{i}.{up}.conv.weight"] = _rand(
                    rng, cout, cout, 3, 3
                )
                sd[pre + f"output_blocks.{i}.{up}.conv.bias"] = _rand(rng, cout)
            h = cout
            i += 1

    sd[pre + "out.0.weight"] = _rand(rng, C)
    sd[pre + "out.0.bias"] = _rand(rng, C)
    sd[pre + "out.2.weight"] = _rand(rng, 4, C, 3, 3)
    sd[pre + "out.2.bias"] = _rand(rng, 4)
    return sd


def test_convert_unet_tiny(rng):
    model = UNet(
        model_channels=64, out_channels=4, num_blocks=1, channel_mult=(1, 2),
        num_heads=2, context_channels=32, dropout_rate=0.0,
    )
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 7, 32))
    ref = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    sd = _make_unet_sd(rng, C=64, mult=(1, 2), blocks=1, heads=2, ctx=32)
    params = convert_unet(
        sd, num_blocks=1, channel_mult=(1, 2), num_heads=2, reference_params=ref
    )
    out = model.apply({"params": params}, x, t, ctx)
    assert out.shape == (1, 8, 8, 4)
    assert np.all(np.isfinite(out))


def _make_ae_sd(rng, C=32, mult=(1, 2), blocks=1, zc=4, vq=False,
                attn_levels=()):
    sd = {}
    pre = "first_stage_model."

    def res_keys(base, cin, cout):
        sd[pre + base + ".norm1.weight"] = _rand(rng, cin)
        sd[pre + base + ".norm1.bias"] = _rand(rng, cin)
        sd[pre + base + ".conv1.weight"] = _rand(rng, cout, cin, 3, 3)
        sd[pre + base + ".conv1.bias"] = _rand(rng, cout)
        sd[pre + base + ".norm2.weight"] = _rand(rng, cout)
        sd[pre + base + ".norm2.bias"] = _rand(rng, cout)
        sd[pre + base + ".conv2.weight"] = _rand(rng, cout, cout, 3, 3)
        sd[pre + base + ".conv2.bias"] = _rand(rng, cout)
        if cin != cout:
            sd[pre + base + ".nin_shortcut.weight"] = _rand(rng, cout, cin, 1, 1)
            sd[pre + base + ".nin_shortcut.bias"] = _rand(rng, cout)

    def attn_keys(base, c):
        sd[pre + base + ".norm.weight"] = _rand(rng, c)
        sd[pre + base + ".norm.bias"] = _rand(rng, c)
        for k in ("q", "k", "v", "proj_out"):
            sd[pre + base + f".{k}.weight"] = _rand(rng, c, c, 1, 1)
            sd[pre + base + f".{k}.bias"] = _rand(rng, c)

    # encoder
    enc_z = zc if vq else zc * 2
    sd[pre + "encoder.conv_in.weight"] = _rand(rng, C, 3, 3, 3)
    sd[pre + "encoder.conv_in.bias"] = _rand(rng, C)
    cin = C
    for level, m in enumerate(mult):
        cout = C * m
        for j in range(blocks):
            res_keys(f"encoder.down.{level}.block.{j}", cin, cout)
            if level in attn_levels:
                attn_keys(f"encoder.down.{level}.attn.{j}", cout)
            cin = cout
        if level < len(mult) - 1:
            sd[pre + f"encoder.down.{level}.downsample.conv.weight"] = _rand(
                rng, cout, cout, 3, 3
            )
            sd[pre + f"encoder.down.{level}.downsample.conv.bias"] = _rand(
                rng, cout
            )
    cmid = C * mult[-1]
    res_keys("encoder.mid.block_1", cmid, cmid)
    attn_keys("encoder.mid.attn_1", cmid)
    res_keys("encoder.mid.block_2", cmid, cmid)
    sd[pre + "encoder.norm_out.weight"] = _rand(rng, cmid)
    sd[pre + "encoder.norm_out.bias"] = _rand(rng, cmid)
    sd[pre + "encoder.conv_out.weight"] = _rand(rng, enc_z, cmid, 3, 3)
    sd[pre + "encoder.conv_out.bias"] = _rand(rng, enc_z)

    # decoder
    sd[pre + "decoder.conv_in.weight"] = _rand(rng, cmid, zc, 3, 3)
    sd[pre + "decoder.conv_in.bias"] = _rand(rng, cmid)
    res_keys("decoder.mid.block_1", cmid, cmid)
    attn_keys("decoder.mid.attn_1", cmid)
    res_keys("decoder.mid.block_2", cmid, cmid)
    cin = cmid
    for level in reversed(range(len(mult))):
        cout = C * mult[level]
        for j in range(blocks + 1):
            res_keys(f"decoder.up.{level}.block.{j}", cin, cout)
            if level in attn_levels:
                attn_keys(f"decoder.up.{level}.attn.{j}", cout)
            cin = cout
        if level > 0:
            sd[pre + f"decoder.up.{level}.upsample.conv.weight"] = _rand(
                rng, cout, cout, 3, 3
            )
            sd[pre + f"decoder.up.{level}.upsample.conv.bias"] = _rand(rng, cout)
    sd[pre + "decoder.norm_out.weight"] = _rand(rng, C)
    sd[pre + "decoder.norm_out.bias"] = _rand(rng, C)
    sd[pre + "decoder.conv_out.weight"] = _rand(rng, 3, C, 3, 3)
    sd[pre + "decoder.conv_out.bias"] = _rand(rng, 3)

    # quant convs
    qc_in = enc_z
    sd[pre + "quant_conv.weight"] = _rand(rng, enc_z if not vq else zc, qc_in,
                                          1, 1)
    sd[pre + "quant_conv.bias"] = _rand(rng, enc_z if not vq else zc)
    sd[pre + "post_quant_conv.weight"] = _rand(rng, zc, zc, 1, 1)
    sd[pre + "post_quant_conv.bias"] = _rand(rng, zc)
    if vq:
        sd[pre + "quantize.embedding.weight"] = _rand(rng, 32, zc)
    return sd


def test_convert_autoencoder_kl_tiny(rng):
    model = AutoencoderKL(channels=32, num_blocks=1, multipliers=(1, 2))
    x = jnp.zeros((1, 16, 16, 3))
    key = jax.random.PRNGKey(0)
    ref = model.init({"params": key, "sample": key}, x)["params"]
    sd = _make_ae_sd(rng, C=32, mult=(1, 2), blocks=1)
    params = convert_autoencoder_kl(
        sd, num_blocks=1, multipliers=(1, 2), reference_params=ref
    )
    out, _ = model.apply({"params": params}, x, rngs={"sample": key})
    assert out.shape == (1, 16, 16, 3)


def test_convert_autoencoder_vq_tiny(rng):
    # VQ config has attention at a spatial resolution; our tiny 16px input
    # puts resolution 8 at level 1.
    model = AutoencoderVQ(
        channels=32, num_blocks=1, multipliers=(1, 2), vocab_size=32,
        attention_resolutions=(8,),
    )
    x = jnp.zeros((1, 16, 16, 3))
    ref = model.init(jax.random.PRNGKey(0), x)["params"]
    sd = _make_ae_sd(rng, C=32, mult=(1, 2), blocks=1, vq=True,
                     attn_levels=(1,))
    params = convert_autoencoder_vq(
        sd, num_blocks=1, multipliers=(1, 2), reference_params=ref
    )
    out, _ = model.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 3)


def test_orbax_roundtrip(tmp_path):
    from ldm_tf2_tpu.checkpoints.manager import load_params, save_params

    params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    save_params(str(tmp_path / "ckpt"), params)
    restored = load_params(str(tmp_path / "ckpt"))
    jax.tree.map(np.testing.assert_array_equal, params, restored)


def test_params_blob_round_trip(tmp_path):
    """Single-blob serving artifact (checkpoints/blob.py): export three
    mixed-dtype trees, mmap-load them back through the one-transfer +
    jitted-unpack path, and get bit-identical leaves."""
    import ml_dtypes

    from ldm_tf2_tpu.checkpoints.blob import (
        blob_exists,
        export_blob,
        load_blob,
    )

    rng = np.random.default_rng(0)
    artifacts = {
        "cond_stage_model": {
            "emb": rng.standard_normal((7, 5)).astype(np.float32),
            "layer": {
                "w": rng.standard_normal((5, 3)).astype(ml_dtypes.bfloat16),
                "b": np.zeros((3,), np.float32),
            },
        },
        "unet": {
            "conv": {
                "kernel": rng.standard_normal((3, 3, 2, 4)).astype(
                    ml_dtypes.bfloat16
                ),
                "bias": rng.standard_normal((4,)).astype(np.float32),
            },
        },
        "autoencoder": {"scale": np.asarray(0.18215, np.float32)},
    }
    path = str(tmp_path / "params")
    assert not blob_exists(path)
    export_blob(path, artifacts)
    assert blob_exists(path)

    loaded = load_blob(path)
    assert set(loaded) == set(artifacts)
    for name in artifacts:
        got_leaves = jax.tree.leaves(loaded[name])
        want_leaves = jax.tree.leaves(artifacts[name])
        assert len(got_leaves) == len(want_leaves)
    jax.tree.map(
        lambda a, b: (
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            # bit-identical includes dtype (bf16 stays bf16)
            np.testing.assert_equal(np.asarray(a).dtype, np.asarray(b).dtype),
        ),
        loaded, artifacts,
    )


def test_legacy_geglu_train_state_resumes(tmp_path):
    """A training-state checkpoint saved BEFORE the GEGLU value/gate split
    (fused geglu/dense leaves mirrored through params, EMA, and Adam
    moments) must restore against the new abstract state — ADVICE r3: the
    bare-params migration alone left pre-split training runs unable to
    resume (Orbax structure mismatch in restore_latest)."""
    import optax

    from ldm_tf2_tpu.checkpoints.manager import (
        CheckpointManager,
        _map_dict_subtrees,
    )
    from ldm_tf2_tpu.training.ldm_trainer import LDMTrainState

    rng_np = np.random.RandomState(0)
    params = {
        "ffn": {
            "geglu": {
                "value": {
                    "kernel": jnp.asarray(rng_np.randn(4, 6), jnp.float32),
                    "bias": jnp.asarray(rng_np.randn(6), jnp.float32),
                },
                "gate": {
                    "kernel": jnp.asarray(rng_np.randn(4, 6), jnp.float32),
                    "bias": jnp.asarray(rng_np.randn(6), jnp.float32),
                },
            },
            "dense": {"kernel": jnp.asarray(rng_np.randn(6, 4), jnp.float32)},
        }
    }
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    # step once so the Adam moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    state = LDMTrainState(
        step=jnp.asarray(7, jnp.int32),
        unet_params=params,
        cond_params={},
        opt_state=opt_state,
        ema_params=jax.tree.map(lambda x: x * 0.5, params),
    )

    def fuse_concrete(d):
        out = {}
        for key, child in d.items():
            if (
                key == "geglu"
                and isinstance(child, dict)
                and set(child) == {"value", "gate"}
            ):
                out[key] = {
                    "dense": {
                        leaf: jnp.concatenate(
                            [child["value"][leaf], child["gate"][leaf]],
                            axis=-1,
                        )
                        for leaf in child["value"]
                    }
                }
            elif isinstance(child, dict):
                out[key] = fuse_concrete(child)
            else:
                out[key] = child
        return out

    legacy_state = _map_dict_subtrees(fuse_concrete, state)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, legacy_state)
    mgr.wait()
    mgr.close()

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    step, restored = mgr2.restore_latest(abstract)
    mgr2.close()
    assert step == 7
    assert jax.tree_util.tree_structure(
        restored
    ) == jax.tree_util.tree_structure(state)
    jax.tree.map(np.testing.assert_array_equal, state, restored)


def test_converter_cli_end_to_end(tmp_path, rng):
    """Full CLI run on a fabricated CompVis-shaped torch checkpoint: three
    Orbax artifacts + checksum manifest out, loadable and runnable
    (convert_ckpt_pytorch_to_tf2.py parity, SURVEY §3.4)."""
    import sys

    import yaml
    from absl import flags as absl_flags

    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.cli import convert_ckpt_pytorch_to_jax as cli

    sd = {}
    sd.update(_make_transformer_sd(rng, layers=1, hidden=32, heads=2,
                                   size=16, vocab=64, seq=8, filters=64))
    sd.update(_make_unet_sd(rng, C=64, mult=(1, 2), blocks=1, heads=2, ctx=32))
    sd.update(_make_ae_sd(rng, C=32, mult=(1, 2), blocks=1, zc=4))
    ckpt_path = str(tmp_path / "model.ckpt")
    torch.save(
        {"state_dict": {k: torch.tensor(v) for k, v in sd.items()}}, ckpt_path
    )

    ae_cfg = {
        "latent_channels": 4, "channels": 32, "num_blocks": 1,
        "attention_resolutions": [], "dropout_rate": 0.0,
        "multipliers": [1, 2], "resample_with_conv": True,
    }
    config = {
        "cond_stage_model": {
            "vocab_size": 64, "encoder_stack_size": 1, "hidden_size": 32,
            "num_heads": 2, "size_per_head": 16, "max_seq_len": 8,
            "filter_size": 64, "dropout_rate": 0.0,
        },
        "unet": {
            "model_channels": 64, "out_channels": 4, "num_blocks": 1,
            "attention_resolutions": [4, 2, 1], "dropout_rate": 0.0,
            "channel_mult": [1, 2], "num_heads": 2,
        },
        "autoencoder_kl": ae_cfg,
        "autoencoder_vq": {**ae_cfg, "vocab_size": 32, "beta": 0.25},
        "ldm": {
            "num_steps": 10, "beta_start": 0.00085, "beta_end": 0.012,
            "v_posterior": 0.0, "scale_factor": 0.18215, "eta": 0.0,
            "num_ddim_steps": 5,
        },
        "ldm_sampling": {"autoencoder_type": "kl"},
        "pre_ckpt_paths": {
            "cond_stage_model": "transformer-1",
            "unet": "unet-1",
            "autoencoder": "autoencoder-1",
        },
        "tpu": {"compute_dtype": "float32"},
    }
    config_path = str(tmp_path / "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    argv = [
        "convert_ckpt_pytorch_to_jax",
        f"--pytorch_ckpt_path={ckpt_path}",
        f"--config_path={config_path}",
        f"--out_dir={tmp_path}",
    ]
    old_argv = sys.argv
    sys.argv = argv
    try:
        absl_flags.FLAGS.unparse_flags()
        absl_flags.FLAGS(argv)
        cli.main([])
    finally:
        sys.argv = old_argv
        absl_flags.FLAGS.unparse_flags()

    import json as json_mod

    manifest = json_mod.load(open(tmp_path / "conversion_manifest.json"))
    assert set(manifest) == {"transformer-1", "unet-1", "autoencoder-1"}
    assert all(len(m) > 0 for m in manifest.values())

    # artifacts load and run
    unet_params = load_params(str(tmp_path / "unet-1"))
    model = UNet(
        model_channels=64, out_channels=4, num_blocks=1, channel_mult=(1, 2),
        num_heads=2, context_channels=32, dropout_rate=0.0,
    )
    out = model.apply(
        {"params": unet_params}, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 8, 32)),
    )
    assert np.all(np.isfinite(out))


def test_validate_only_manifest_diff():
    """--validate_only rehearsal (VERDICT r2 #8): a state_dict matching the
    committed CompVis key manifest gets GO; a missing key or wrong shape
    gets NO-GO naming the offender.  Shapes only — no tensor data needed."""
    import json
    import types

    from ldm_tf2_tpu.cli.convert_ckpt_pytorch_to_jax import (
        default_manifest_path,
        validate_state_dict,
    )

    with open(default_manifest_path()) as f:
        manifest = json.load(f)

    # fabricate a shape-only state_dict straight from the manifest
    sd = {
        k: types.SimpleNamespace(shape=tuple(shape))
        for k, shape in manifest["model_keys"].items()
    }
    for k in manifest["ignored_keys"]:
        sd[k] = types.SimpleNamespace(shape=(1,))

    ok, lines = validate_state_dict(sd, manifest)
    assert ok, lines[-5:]
    assert lines[-1].startswith("GO")

    # corrupt: drop one key, break one shape, add an unknown extra
    victim_missing, victim_shape = sorted(manifest["model_keys"])[:2]
    del sd[victim_missing]
    sd[victim_shape] = types.SimpleNamespace(shape=(1, 2, 3))
    sd["totally.unknown.key"] = types.SimpleNamespace(shape=(4,))
    ok, lines = validate_state_dict(sd, manifest)
    assert not ok
    report = "\n".join(lines)
    assert f"MISSING  {victim_missing}" in report
    assert f"SHAPE    {victim_shape}" in report
    assert "EXTRA    totally.unknown.key" in report
    assert lines[-1].startswith("NO-GO")
