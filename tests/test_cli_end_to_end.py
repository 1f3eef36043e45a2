"""End-to-end CLI tests on a tiny config: tfrecord conversion -> AE training
-> LDM training -> sampling, exercising the same script surface as the
reference's run_*.py flow (SURVEY.md §3 call stacks)."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

from ldm_tf2_tpu.data.dataset import convert_images_to_tfrecord
from ldm_tf2_tpu.data.tfrecord import TFRecordWriter
from ldm_tf2_tpu.data.example_proto import encode_example

IMG = 16

TINY_VOCAB = (
    ["[PAD]"]
    + [f"[unused{i}]" for i in range(99)]
    + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + ["a", "virus", "monster", "is", "playing", "guitar", "oil", "on",
       "canvas", "the", "##s"]
)


def _write_jpeg(path, size=(20, 24)):
    from PIL import Image

    rng = np.random.RandomState(hash(path) % 2**31)
    arr = rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    Image.fromarray(arr).save(path, "JPEG")


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Tiny config + data + pretrained artifacts."""
    root = tmp_path_factory.mktemp("ws")
    os.chdir(root)

    # vocab dir for BertTokenizerFast
    vocab_dir = root / "bert_model"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text("\n".join(TINY_VOCAB) + "\n")

    # images + images_captions tfrecords
    img_dir = root / "raw"
    img_dir.mkdir()
    paths = []
    for i in range(8):
        p = str(img_dir / f"{i}.jpg")
        _write_jpeg(p)
        paths.append(p)
    convert_images_to_tfrecord(paths, str(root / "images"), num_shards=2)

    cap_dir = root / "images_captions"
    cap_dir.mkdir()
    with TFRecordWriter(str(cap_dir / "data.tfrecord")) as w:
        for p in paths:
            with open(p, "rb") as f:
                img_bytes = f.read()
            caption = [102, 104, 105, 106] + [0] * 4
            w.write(encode_example({"image": img_bytes, "caption": caption}))

    config = {
        "autoencoder_training": {
            "root_path": str(root / "images"),
            "params": {"batch_size": 2, "image_size": IMG, "keys": ["image"]},
            "autoencoder_type": "kl",
            "ckpt_path": str(root / "aekl"),
            "num_iterations": 3,
        },
        "ldm_training": {
            "root_path": str(cap_dir),
            "params": {
                "batch_size": 2,
                "image_size": IMG,
                "flip": False,
                "keys": ["image", "caption"],
            },
            "autoencoder_type": "kl",
            "ckpt_path": str(root / "ldm"),
            "num_iterations": 3,
            "train_cond_model": False,
            "condition_dropout_rate": 0.1,
        },
        "ldm_sampling": {
            "guidance_scale": 5.0,
            "latent_shape": [2, IMG // 4, IMG // 4, 4],
            "sample_save_progress": False,
            "text_prompt": "a virus monster is playing guitar oil on canvas",
            "vocab_dir": str(vocab_dir),
            "autoencoder_type": "kl",
        },
        "pre_ckpt_paths": {
            "cond_stage_model": str(root / "transformer-1"),
            "unet": str(root / "unet-1"),
            "autoencoder": str(root / "autoencoder-1"),
        },
        "lpips_ckpt_path": str(root / "lpips-1"),
        "autoencoder_kl_trainer": {
            "global_step_discriminator": 2,
            "lpips_weight": 1.0,
            "kl_weight": 1.0e-6,
            "discriminator_weight": 0.5,
            "discriminator_factor": 1.0,
            "discriminator_loss_type": "hinge",
        },
        "autoencoder_vq_trainer": {
            "global_step_discriminator": 1,
            "codebook_weight": 1.0,
            "lpips_weight": 1.0,
            "kl_weight": 1.0,
            "discriminator_weight": 0.6,
            "discriminator_factor": 1.0,
            "discriminator_loss_type": "hinge",
        },
        "cond_stage_model": {
            "vocab_size": len(TINY_VOCAB),
            "encoder_stack_size": 1,
            "hidden_size": 32,
            "num_heads": 2,
            "size_per_head": 16,
            "max_seq_len": 8,
            "filter_size": 64,
            "dropout_rate": 0.0,
        },
        "autoencoder_kl": {
            "latent_channels": 4,
            "channels": 32,
            "num_blocks": 1,
            "attention_resolutions": [],
            "dropout_rate": 0.0,
            "multipliers": [1, 2, 2],
            "resample_with_conv": True,
        },
        "ae_kl_discriminator": {"channels": 16, "num_layers": 2},
        "autoencoder_vq": {
            "latent_channels": 4,
            "channels": 32,
            "num_blocks": 1,
            "attention_resolutions": [4],
            "dropout_rate": 0.0,
            "multipliers": [1, 2, 2],
            "resample_with_conv": True,
            "vocab_size": 32,
            "beta": 0.25,
        },
        "ae_vq_discriminator": {"channels": 16, "num_layers": 2},
        "unet": {
            "model_channels": 32,
            "out_channels": 4,
            "num_blocks": 1,
            "attention_resolutions": [4, 2, 1],
            "dropout_rate": 0.0,
            "channel_mult": [1, 2],
            "num_heads": 2,
        },
        "ldm": {
            "num_steps": 50,
            "beta_start": 0.00085,
            "beta_end": 0.012,
            "v_posterior": 0.0,
            "scale_factor": 0.18215,
            "eta": 0.0,
            "num_ddim_steps": 5,
        },
        "autoencoder_optimizer": {
            "learning_rate": 4.5e-6, "beta_1": 0.5, "beta_2": 0.9,
            "epsilon": 1.0e-8,
        },
        "discriminator_optimizer": {
            "learning_rate": 4.5e-6, "beta_1": 0.5, "beta_2": 0.9,
            "epsilon": 1.0e-8,
        },
        "latent_diffusion_optimizer": {
            "learning_rate": 5.0e-5, "beta_1": 0.9, "beta_2": 0.999,
            "epsilon": 1.0e-8, "weight_decay": 0.01,
        },
        "tpu": {"compute_dtype": "float32"},
    }
    config_path = str(root / "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    # pretrained artifacts: tiny random-initialized params saved via orbax
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.manager import save_params
    from ldm_tf2_tpu.configs import load_config

    cfg = load_config(config_path)
    key = jax.random.PRNGKey(0)
    cond = factory.build_cond_model(cfg, dtype=jnp.float32)
    save_params(
        cfg["pre_ckpt_paths"]["cond_stage_model"],
        cond.init(key, jnp.zeros((1, 8), jnp.int32))["params"],
    )
    unet = factory.build_unet(cfg, dtype=jnp.float32)
    save_params(
        cfg["pre_ckpt_paths"]["unet"],
        unet.init(
            key, jnp.zeros((1, 2, 2, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 1, 32)),
        )["params"],
    )
    ae = factory.build_autoencoder(cfg, "kl", dtype=jnp.float32)
    save_params(
        cfg["pre_ckpt_paths"]["autoencoder"],
        ae.init({"params": key, "sample": key}, jnp.zeros((1, IMG, IMG, 3)))[
            "params"
        ],
    )
    lpips = factory.build_lpips(cfg, dtype=jnp.float32)
    save_params(
        cfg["lpips_ckpt_path"],
        lpips.init(key, jnp.zeros((1, IMG, IMG, 3)),
                   jnp.zeros((1, IMG, IMG, 3)))["params"],
    )
    return root, config_path


def _run_cli(module, argv):
    from absl import flags
    from absl.testing import flagsaver

    for name in list(flags.FLAGS):
        pass
    old_argv = sys.argv
    sys.argv = argv
    try:
        flags.FLAGS.unparse_flags()
        flags.FLAGS(argv)
        module.main([])
    finally:
        sys.argv = old_argv
        flags.FLAGS.unparse_flags()


def test_config_loader_validates(workspace):
    from ldm_tf2_tpu.configs import load_config

    _, config_path = workspace
    cfg = load_config(config_path)
    assert cfg["tpu"]["compute_dtype"] == "float32"
    assert cfg["tpu"]["attention_impl"] == "auto"
    assert cfg["tpu"]["weights_dtype"] is None


def test_config_loader_validates_parallelism_keys(workspace):
    """tpu.tensor_parallel needs a model axis; it is mutually exclusive
    with sequence_parallel (same mesh axis) and with int8 quantization
    (the W8A8 conv kernels are not TP-decomposed)."""
    import pytest
    import yaml as _yaml

    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    with open(config_path) as f:
        base = _yaml.safe_load(f)

    def write(tpu_overrides):
        cfg = dict(base)
        cfg["tpu"] = {**(base.get("tpu") or {}), **tpu_overrides}
        p = str(root / "cfg_par.yaml")
        with open(p, "w") as f:
            _yaml.safe_dump(cfg, f)
        return p

    with pytest.raises(ValueError, match="model.*axis"):
        load_config(write({"tensor_parallel": True, "mesh": {"data": -1}}))
    with pytest.raises(ValueError, match="at most one"):
        load_config(write({
            "tensor_parallel": True, "sequence_parallel": True,
            "mesh": {"data": 2, "model": 4},
        }))
    with pytest.raises(ValueError, match="single-chip"):
        load_config(write({
            "tensor_parallel": True, "quantize": "int8",
            "mesh": {"data": 2, "model": 4},
        }))
    cfg = load_config(write({
        "tensor_parallel": True, "mesh": {"data": 2, "model": 4},
    }))
    assert cfg["tpu"]["tensor_parallel"] is True


def test_config_loader_validates_deepcache_keys(workspace):
    import pytest
    import yaml as _yaml

    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    with open(config_path) as f:
        base = _yaml.safe_load(f)

    def write(mutate):
        cfg = _yaml.safe_load(_yaml.safe_dump(base))
        mutate(cfg)
        path = str(root / "config_dc_check.yaml")
        with open(path, "w") as f:
            _yaml.safe_dump(cfg, f)
        return path

    # valid: interval 3, levels 1
    path = write(lambda c: c["ldm_sampling"].update(cache_interval=3))
    assert load_config(path)["ldm_sampling"]["cache_interval"] == 3
    # invalid interval
    path = write(lambda c: c["ldm_sampling"].update(cache_interval=0))
    with pytest.raises(ValueError, match="cache_interval"):
        load_config(path)
    # invalid levels
    path = write(lambda c: c["ldm_sampling"].update(cache_levels="x"))
    with pytest.raises(ValueError, match="cache_levels"):
        load_config(path)
    # deepcache requires ddim
    path = write(
        lambda c: c["ldm_sampling"].update(cache_interval=2, sampler="plms")
    )
    with pytest.raises(ValueError, match="sampler: ddim"):
        load_config(path)


def test_config_loader_rejects_bool_numeric_keys(workspace):
    # bool is an int subclass — YAML `guidance_rescale: true` must be a
    # config error, not a silent phi=1.0 (ADVICE r2).
    import pytest
    import yaml as _yaml

    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    with open(config_path) as f:
        base = _yaml.safe_load(f)

    def write(section, key):
        cfg = _yaml.safe_load(_yaml.safe_dump(base))
        cfg.setdefault(section, {})[key] = True
        path = str(root / "config_bool_check.yaml")
        with open(path, "w") as f:
            _yaml.safe_dump(cfg, f)
        return path

    for section, key in [
        ("ldm_sampling", "guidance_rescale"),
        ("ldm_sampling", "strength"),
        ("ldm_sampling", "cache_interval"),
        ("ldm_sampling", "cache_levels"),
        ("ldm_training", "grad_accum_steps"),
    ]:
        with pytest.raises(ValueError, match=key):
            load_config(write(section, key))


def test_cast_inference_params(workspace):
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.configs import load_config

    _, config_path = workspace
    cfg = load_config(config_path)
    tree = {
        "w": jnp.zeros((2, 2), jnp.float32),
        "ids": jnp.zeros((2,), jnp.int32),
    }
    # null weights_dtype: no-op
    out = factory.cast_inference_params(cfg, tree)
    assert out["w"].dtype == jnp.float32
    # bfloat16: float32 leaves cast, integer leaves untouched
    cfg["tpu"]["weights_dtype"] = "bfloat16"
    out = factory.cast_inference_params(cfg, tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == jnp.int32


def test_sampler_cli(workspace):
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    _run_cli(
        run_ldm_sampler,
        ["run_ldm_sampler", f"--config_path={config_path}"],
    )
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


def test_sampler_cli_negative_prompt(workspace):
    """ldm_sampling.negative_prompt tokenizes into the CFG uncond half
    (additive; the reference hard-codes "", run_ldm_sampler.py:28-46)."""
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm_sampling"]["negative_prompt"] = "guitar on canvas"
    neg_path = str(root / "config_neg.yaml")
    with open(neg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(
        run_ldm_sampler,
        ["run_ldm_sampler", f"--config_path={neg_path}"],
    )
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


def test_sampler_cli_karras_spacing(workspace):
    """ldm.timestep_spacing: karras flows config -> factory -> sampler
    (additive; the reference only has the uniform rule,
    model_runners.py:406-409)."""
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm"]["timestep_spacing"] = "karras"
    cfg["ldm_sampling"]["sampler"] = "dpm_solver_pp_2m"
    k_path = str(root / "config_karras.yaml")
    with open(k_path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(
        run_ldm_sampler,
        ["run_ldm_sampler", f"--config_path={k_path}"],
    )
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8
    # spacing must change the sampled images vs the uniform default
    _run_cli(
        run_ldm_sampler,
        ["run_ldm_sampler", f"--config_path={config_path}"],
    )
    uniform_images = np.load(root / "images.npy")
    assert not np.array_equal(images, uniform_images)


def test_config_loader_validates_timestep_spacing(workspace):
    import pytest

    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm"]["timestep_spacing"] = "cosine"
    bad = str(root / "config_bad_spacing.yaml")
    with open(bad, "w") as f:
        yaml.safe_dump(cfg, f)
    with pytest.raises(ValueError, match="timestep_spacing"):
        load_config(bad)


def test_sampler_cli_int8(workspace):
    """tpu.quantize: int8 — the W8A8 U-Net conv path (ops/quant_conv.py)
    through the real sampler CLI; output stays a valid image batch."""
    from ldm_tf2_tpu.cli import run_ldm_sampler
    from ldm_tf2_tpu.ops.quant_conv import get_conv_quant, set_conv_quant

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["tpu"]["quantize"] = "int8"
    int8_path = str(root / "config_int8.yaml")
    with open(int8_path, "w") as f:
        yaml.safe_dump(cfg, f)
    try:
        _run_cli(
            run_ldm_sampler,
            ["run_ldm_sampler", f"--config_path={int8_path}"],
        )
        assert get_conv_quant() == "int8"
    finally:
        set_conv_quant("none")
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


def test_sampler_cli_progressive(workspace):
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm_sampling"]["sample_save_progress"] = True
    prog_path = str(root / "config_prog.yaml")
    with open(prog_path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(
        run_ldm_sampler,
        ["run_ldm_sampler", f"--config_path={prog_path}"],
    )
    # 5 ddim steps, record_freq 5 -> 1 record
    prog = np.load(root / "sample_prog.npy")
    assert prog.shape == (2, 1, IMG, IMG, 3)


def test_sampler_cli_data_parallel(workspace):
    """Batch divisible by the data axis -> the sampler shards the CFG
    token batch over the 8-device mesh (params replicated)."""
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm_sampling"]["latent_shape"] = [8, IMG // 4, IMG // 4, 4]
    path = str(root / "config_dp_sample.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(run_ldm_sampler, ["run_ldm_sampler", f"--config_path={path}"])
    images = np.load(root / "images.npy")
    assert images.shape == (8, IMG, IMG, 3)


def test_bf16_serving_artifacts_sample_identically(workspace):
    """export_pretrained --which serving --dtype bfloat16 produces
    half-size artifacts whose samples are IDENTICAL to loading the f32
    artifacts with tpu.weights_dtype: bfloat16 (the cast is the same
    rounding, applied once at export instead of on every server start —
    VERDICT r3 next #3's restore-side lever)."""
    from ldm_tf2_tpu.cli import export_pretrained, run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)

    _run_cli(
        export_pretrained,
        ["export_pretrained", f"--config_path={config_path}",
         "--which=serving", "--dtype=bfloat16",
         f"--out_dir={root / 'bf16_artifacts'}"],
    )
    # bf16 leaves on disk, not just renamed f32
    from ldm_tf2_tpu.checkpoints.manager import load_params

    bf16_unet = load_params(str(root / "bf16_artifacts" / "unet-1"))
    import jax

    leaves = jax.tree.leaves(bf16_unet)
    assert any(str(l.dtype) == "bfloat16" for l in leaves)
    assert not any(str(l.dtype) == "float32" for l in leaves)

    # reference: f32 artifacts cast on load
    cfg_a = dict(cfg)
    cfg_a["tpu"] = dict(cfg.get("tpu") or {})
    cfg_a["tpu"]["weights_dtype"] = "bfloat16"
    path_a = str(root / "config_cast_on_load.yaml")
    with open(path_a, "w") as f:
        yaml.safe_dump(cfg_a, f)
    _run_cli(run_ldm_sampler, ["run_ldm_sampler", f"--config_path={path_a}"])
    images_a = np.load(root / "images.npy")

    # bf16 artifacts, no cast
    cfg_b = dict(cfg_a)
    cfg_b["pre_ckpt_paths"] = {
        "cond_stage_model": str(root / "bf16_artifacts" / "transformer-1"),
        "unet": str(root / "bf16_artifacts" / "unet-1"),
        "autoencoder": str(root / "bf16_artifacts" / "autoencoder-1"),
    }
    path_b = str(root / "config_bf16_artifacts.yaml")
    with open(path_b, "w") as f:
        yaml.safe_dump(cfg_b, f)
    _run_cli(run_ldm_sampler, ["run_ldm_sampler", f"--config_path={path_b}"])
    images_b = np.load(root / "images.npy")

    np.testing.assert_array_equal(images_a, images_b)


def test_sampler_cli_tensor_parallel(workspace):
    """tpu.tensor_parallel: params TP-sharded over a data x model mesh
    and the kernel composition layer enabled (ops/tp.py) — the CLI path
    for VERDICT r3 next #2.  On the tiny CPU config the kernel claims
    decline (per-shard shapes too small), exercising the documented
    fall-through to natively-partitionable XLA math."""
    from ldm_tf2_tpu.cli import run_ldm_sampler
    from ldm_tf2_tpu.ops import tp

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["tpu"] = dict(cfg.get("tpu") or {})
    cfg["tpu"]["mesh"] = {"data": 2, "model": 4}
    cfg["tpu"]["tensor_parallel"] = True
    cfg["ldm_sampling"]["latent_shape"] = [2, IMG // 4, IMG // 4, 4]
    path = str(root / "config_tp_sample.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    try:
        _run_cli(run_ldm_sampler, ["run_ldm_sampler", f"--config_path={path}"])
    finally:
        assert tp.tp_state() is not None  # CLI registered the mesh
        tp.enable_tensor_parallel(None)
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)


def test_run_eval_cli_inception_extractor(workspace):
    """--extractor inception: the paper-standard pool3 FID path through
    the CLI with a synthetic torch .pth; missing weights error with
    download instructions (VERDICT r2 #4)."""
    import contextlib
    import io

    import torch

    from ldm_tf2_tpu.cli import run_eval
    from ldm_tf2_tpu.eval.inception import (
        make_synthetic_inception_state_dict,
    )

    root, config_path = workspace
    os.chdir(root)
    rng = np.random.RandomState(1)
    real = rng.randint(0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    np.save(root / "inc_real.npy", real)
    np.save(root / "inc_same.npy", real.copy())

    sd = make_synthetic_inception_state_dict(seed=2)
    pth = str(root / "inception_synth.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _run_cli(
            run_eval,
            [
                "run_eval",
                f"--generated={root / 'inc_same.npy'}",
                f"--real={root / 'inc_real.npy'}",
                "--extractor=inception",
                f"--inception_weights_path={pth}",
            ],
        )
    out = [json.loads(l) for l in buf.getvalue().splitlines()
           if l.startswith("{")][-1]
    assert out["metric"] == "inception_fid"
    assert out["fid"] < 1e-4

    # weights-gated: clear error naming where to get the weights
    with pytest.raises(RuntimeError, match="pt_inception|inception_v3"):
        _run_cli(
            run_eval,
            [
                "run_eval",
                f"--generated={root / 'inc_same.npy'}",
                f"--real={root / 'inc_real.npy'}",
                "--extractor=inception",
            ],
        )


def test_ae_trainer_cli(workspace):
    from ldm_tf2_tpu.cli import run_autoencoder_trainer

    root, config_path = workspace
    os.chdir(root)
    _run_cli(
        run_autoencoder_trainer,
        ["run_autoencoder_trainer", f"--config_path={config_path}"],
    )
    assert (root / "aekl").exists()


@pytest.mark.parametrize("sampler", ["ddim", "dpm_solver_pp_2m"])
def test_sampler_cli_deepcache(workspace, sampler):
    """ldm_sampling.cache_interval > 1 routes through the DeepCache loop —
    composed with DDIM (diffusion/sampler.py ddim_sample_loop_deepcache)
    or with DPM-Solver++(2M)
    (diffusion/solvers.py dpm_solver_pp_2m_sample_loop_deepcache)."""
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm_sampling"]["cache_interval"] = 2
    cfg["ldm_sampling"]["sampler"] = sampler
    path = str(root / f"config_deepcache_{sampler}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(run_ldm_sampler, ["run_ldm_sampler", f"--config_path={path}"])
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


def test_run_eval_cli(workspace):
    """FID eval CLI (cli/run_eval.py): identical sets score ~0; a shifted
    set scores strictly higher."""
    from ldm_tf2_tpu.cli import run_eval

    root, config_path = workspace
    os.chdir(root)
    rng = np.random.RandomState(0)
    real = rng.randint(0, 256, (6, IMG, IMG, 3), dtype=np.uint8)
    same = real.copy()
    shifted = np.clip(
        real.astype(np.int32) + rng.randint(60, 120, real.shape), 0, 255
    ).astype(np.uint8)
    np.save(root / "real.npy", real)
    np.save(root / "same.npy", same)
    np.save(root / "shifted.npy", shifted)

    import contextlib
    import io

    def fid_of(gen):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _run_cli(
                run_eval,
                [
                    "run_eval",
                    f"--generated={root / gen}",
                    f"--real={root / 'real.npy'}",
                    f"--lpips_ckpt_path={root / 'lpips-1'}",
                ],
            )
        out = [
            json.loads(l) for l in buf.getvalue().splitlines()
            if l.startswith("{")
        ]
        return out[-1]

    identical = fid_of("same.npy")
    assert identical["num_generated"] == 6
    assert identical["fid"] < 1e-4
    assert fid_of("shifted.npy")["fid"] > identical["fid"]

    # a directory of single-image [H,W,3] files loads as N images, not
    # one concatenated mega-image (review fix)
    img_dir = root / "per_image"
    img_dir.mkdir(exist_ok=True)
    for i in range(6):
        np.save(img_dir / f"im{i}.npy", real[i])
    dir_fid = fid_of("per_image")
    assert dir_fid["num_generated"] == 6
    assert dir_fid["fid"] < 1e-4

    # --clip_weights_path without --prompts_path fails BEFORE the FID
    # pass, not after (review fix)
    with pytest.raises(ValueError, match="requires --prompts_path"):
        _run_cli(
            run_eval,
            [
                "run_eval",
                f"--generated={root / 'same.npy'}",
                f"--real={root / 'real.npy'}",
                f"--lpips_ckpt_path={root / 'lpips-1'}",
                "--clip_weights_path=/nonexistent",
            ],
        )


def test_serve_ldm_loop(workspace):
    """The serving loop (cli/serve_ldm.py): jit once, answer multiple
    JSONL requests — including per-request guidance (no recompile), a
    per-example prompt list, and a malformed request that must produce an
    error response without killing the loop."""
    import io

    from ldm_tf2_tpu.cli.serve_ldm import serve
    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    os.chdir(root)
    cfg = load_config(config_path)
    requests = "\n".join(
        [
            '{"prompt": "a virus monster", "seed": 1, "out": "r1"}',
            '{"prompt": ["guitar", "canvas oil"], "seed": 2,'
            ' "guidance_scale": 2.5, "out": "r2"}',
            "this is not json",
            '{"cmd": "exit"}',
            '{"prompt": "never reached", "out": "r3"}',
        ]
    )
    out = io.StringIO()
    serve(cfg, io.StringIO(requests), out, output_dir=str(root))
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == 3
    assert resps[0]["ok"] and resps[1]["ok"]
    assert not resps[2]["ok"] and "error" in resps[2]
    for r in resps[:2]:
        images = np.load(r["out"])
        assert images.shape == (2, IMG, IMG, 3)
        assert images.dtype == np.uint8
    assert not (root / "r3.npy").exists()


def test_serve_ldm_params_blob(workspace, tmp_path):
    """--params_blob (checkpoints/blob.py): the first server start writes
    the single-blob artifact; a restarted server restores from it with one
    transfer + jitted unpack, and produces identical images."""
    import io

    from ldm_tf2_tpu.cli.serve_ldm import serve
    from ldm_tf2_tpu.checkpoints.blob import blob_exists
    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    os.chdir(root)
    cfg = load_config(config_path)
    blob = str(tmp_path / "params")
    requests = '{"prompt": "a virus monster", "seed": 3, "out": "%s"}\n'

    assert not blob_exists(blob)
    out1 = io.StringIO()
    serve(cfg, io.StringIO(requests % "b1"), out1, output_dir=str(root),
          params_blob_path=blob)
    assert blob_exists(blob), "first start did not prime the blob"
    assert json.loads(out1.getvalue().splitlines()[0])["ok"]

    out2 = io.StringIO()
    serve(cfg, io.StringIO(requests % "b2"), out2, output_dir=str(root),
          params_blob_path=blob)
    assert json.loads(out2.getvalue().splitlines()[0])["ok"]

    a = np.load(root / "b1.npy")
    b = np.load(root / "b2.npy")
    np.testing.assert_array_equal(a, b)


def test_compile_cache_default_is_durable():
    """The default tpu.compile_cache_dir must NOT live under /tmp: hosts
    that wipe /tmp between sessions turn every fresh process into a
    multi-minute cold compile (measured 472 s cold vs 26 s warm on the
    0.87B pipeline — VERDICT r4 weak #1).  The default must be a durable,
    user-writable location."""
    from ldm_tf2_tpu.configs.loader import _TPU_DEFAULTS

    default = _TPU_DEFAULTS["compile_cache_dir"]
    assert default, "compile cache must be on by default"
    expanded = os.path.abspath(os.path.expanduser(default))
    assert not expanded.startswith(("/tmp/", "/var/tmp/")), (
        f"default compile_cache_dir {default!r} is under a "
        "wiped-between-sessions directory"
    )
    # and the factory actually honors it (expanduser + mkdir)
    import jax

    from ldm_tf2_tpu import factory

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        out = factory.enable_compile_cache(default)
        assert out == expanded or out == os.path.expanduser(default)
        assert os.path.isdir(os.path.expanduser(default))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", prev_size
        )


def test_compile_cache_populated_and_reused(tmp_path):
    """factory.enable_compile_cache: a compile populates the on-disk XLA
    cache; a post-clear_caches recompile of the same program is served
    from disk (no rewrite — mtimes unchanged). This is the mechanism every
    CLI now gets through apply_tpu_settings (VERDICT r2 #1)."""
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory

    cache_dir = str(tmp_path / "xla_cache")
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        out = factory.enable_compile_cache(cache_dir, min_compile_seconds=0.0)
        assert out == cache_dir and os.path.isdir(cache_dir)

        def f(x):
            return jnp.tanh(x @ x.T).sum()

        x = jnp.arange(256.0).reshape(16, 16)
        first = np.asarray(jax.jit(f)(x))
        files = {
            p: os.path.getmtime(os.path.join(cache_dir, p))
            for p in os.listdir(cache_dir)
        }
        assert files, "compile did not populate the persistent cache"

        jax.clear_caches()  # drop the in-memory executable
        second = np.asarray(jax.jit(f)(x))
        np.testing.assert_array_equal(first, second)
        after = {
            p: os.path.getmtime(os.path.join(cache_dir, p))
            for p in os.listdir(cache_dir)
        }
        assert after == files, "recompile rewrote the cache instead of reusing"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", prev_size
        )


def test_aot_compile_or_load_round_trip(tmp_path):
    """factory.aot_compile_or_load: cold call compiles + writes the
    executable artifact; a fresh jit warm call deserializes it (source
    'aot-cache') and computes identical values; a corrupt artifact falls
    back to a fresh compile."""
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory

    path = str(tmp_path / "pipeline.aotexec")

    def f(x):
        return (x * 2.0 + 1.0).sum(axis=1)

    args = (jnp.arange(32.0).reshape(4, 8),)
    cold_fn, how = factory.aot_compile_or_load(jax.jit(f), args, path)
    assert how == "compiled" and os.path.exists(path)
    cold = np.asarray(cold_fn(*args))

    warm_fn, how = factory.aot_compile_or_load(jax.jit(f), args, path)
    assert how == "aot-cache"
    np.testing.assert_array_equal(cold, np.asarray(warm_fn(*args)))

    notes = []
    with open(path, "wb") as fh:
        fh.write(b"corrupt")
    fb_fn, how = factory.aot_compile_or_load(
        jax.jit(f), args, path, note=notes.append
    )
    assert how == "compiled"
    # a corrupt artifact fails at the unpickle (read) stage since the
    # round-4 aot_read/aot_try_load split; stale-but-readable artifacts
    # fail at the device bind (load) stage
    assert any("read failed" in n or "load failed" in n for n in notes)
    np.testing.assert_array_equal(cold, np.asarray(fb_fn(*args)))
    # the fallback compile must repair the artifact for the next start
    repaired_fn, how = factory.aot_compile_or_load(jax.jit(f), args, path)
    assert how == "aot-cache"


def test_serve_ldm_aot_cache_cold_then_warm(workspace):
    """serve --aot_cache across real process restarts (the production
    shape — AOT executables are loaded into FRESH processes): the first
    server start writes the serialized pipeline executable; a restarted
    server deserializes it (AOT warm start — no trace, no compile) and
    produces identical images."""
    import subprocess
    import sys as _sys

    import ldm_tf2_tpu

    root, config_path = workspace
    os.chdir(root)
    aot_path = str(root / "serve.aotexec")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(ldm_tf2_tpu.__file__))
        + os.pathsep + env.get("PYTHONPATH", "")
    )

    def start(out_name):
        req = json.dumps({"prompt": "guitar", "seed": 7, "out": out_name})
        proc = subprocess.run(
            [_sys.executable, "-m", "ldm_tf2_tpu.cli.serve_ldm",
             f"--config_path={config_path}", f"--output_dir={root}",
             f"--aot_cache={aot_path}"],
            input=req + "\n", capture_output=True, text=True,
            cwd=str(root), env=env, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        resp = json.loads(proc.stdout.splitlines()[0])
        assert resp["ok"], resp
        return proc.stderr

    cold_err = start("aot_cold")
    assert os.path.exists(aot_path)
    assert "compiled + warm" in cold_err, cold_err[-2000:]

    # XLA:CPU AOT executables are machine-feature-pinned and may refuse
    # to EXECUTE on this host even in a fresh process (loader warning ->
    # JaxRuntimeError); that is an XLA:CPU limitation, not a framework
    # bug — the contract asserted here is: the AOT path engages, and
    # either serves (TPU, matching hosts) or degrades gracefully to a
    # compile-cache-warm recompile without dropping the request.
    warm_err = start("aot_warm")
    assert (
        "AOT warm start + warm" in warm_err
        or "AOT executable failed at run" in warm_err
    ), warm_err[-2000:]
    np.testing.assert_array_equal(
        np.load(root / "aot_cold.npy"), np.load(root / "aot_warm.npy")
    )


def test_serve_ldm_microbatching(workspace):
    """Micro-batching (cli/serve_ldm.py): several sub-batch requests are
    packed into full compiled batches, grouped by seed, with per-slot
    prompts and guidance scales; each request gets its own slice back.

    Correctness anchor: slot rows are independent through the whole
    pipeline (per-example attention/GN, row-wise matmuls), so a packed
    call whose slots replicate a full-batch request — same seed, same
    slot order — must reproduce that request's images exactly."""
    import io

    from ldm_tf2_tpu.cli.serve_ldm import serve
    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    os.chdir(root)
    cfg = load_config(config_path)
    # wave (drained greedily from the in-memory stream):
    #   uni  — full-batch request, uniform default guidance, seed 3
    #   g1   — n=1 same prompt/seed/guidance  -> must equal uni[0]
    #   g2   — n=1 same prompt/seed, guidance 2.0 -> packed beside g1
    #   bad  — n=0 is invalid; error response, wave survives
    requests = "\n".join(
        [
            '{"prompt": "guitar", "seed": 3, "out": "uni"}',
            '{"prompt": "guitar", "n": 1, "seed": 3, "guidance_scale": 5.0,'
            ' "out": "g1"}',
            '{"prompt": "guitar", "n": 1, "seed": 3, "guidance_scale": 2.0,'
            ' "out": "g2"}',
            '{"prompt": "guitar", "n": 0}',
        ]
    )
    out = io.StringIO()
    serve(cfg, io.StringIO(requests), out, output_dir=str(root))
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == 4
    assert resps[0]["ok"] and resps[1]["ok"] and resps[2]["ok"]
    assert not resps[3]["ok"] and '"n"' in resps[3]["error"]
    assert resps[0]["shape"] == [2, IMG, IMG, 3]
    assert resps[1]["shape"] == [1, IMG, IMG, 3]
    assert resps[1]["batched_requests"] == 3

    uni = np.load(resps[0]["out"])
    g1 = np.load(resps[1]["out"])
    g2 = np.load(resps[2]["out"])
    # seed-3 slots pack in request order: [uni0, uni1], [g1, g2] — two
    # identical-seed calls; g1's slot replicates uni's slot 0 exactly
    assert np.array_equal(g1[0], uni[0])
    # different guidance in the same packed batch must change the image
    assert not np.array_equal(g2[0], uni[1])


def test_serve_ldm_microbatch_spanning(workspace):
    """A request larger than the compiled batch spans several pipeline
    calls; odd slot counts are padded (pad slots discarded)."""
    import io

    from ldm_tf2_tpu.cli.serve_ldm import serve
    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    os.chdir(root)
    cfg = load_config(config_path)
    requests = "\n".join(
        [
            '{"prompt": ["a guitar", "an oil canvas", "a monster"],'
            ' "seed": 7, "out": "span"}',
        ]
    )
    out = io.StringIO()
    serve(cfg, io.StringIO(requests), out, output_dir=str(root))
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == 1 and resps[0]["ok"]
    assert resps[0]["shape"] == [3, IMG, IMG, 3]


def test_serve_ldm_solver_and_default_names(workspace):
    """serve_ldm honors ldm_sampling.sampler (same selection as the
    sampler CLI) and default output names are unique per request
    (review fixes)."""
    import io

    import yaml as _yaml

    from ldm_tf2_tpu.cli.serve_ldm import serve
    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    os.chdir(root)
    cfg = load_config(config_path)
    cfg["ldm_sampling"]["sampler"] = "dpm_solver_pp_2m"
    requests = "\n".join(
        [
            '{"prompt": "a virus monster", "seed": 1}',
            '{"prompt": "guitar", "seed": 2}',
        ]
    )
    out = io.StringIO()
    serve(cfg, io.StringIO(requests), out, output_dir=str(root))
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == 2 and all(r["ok"] for r in resps)
    # two default-named outputs must be distinct files
    assert resps[0]["out"] != resps[1]["out"]

    # cache_interval > 1 with a non-ddim sampler is rejected like the
    # sampler CLI
    cfg2 = load_config(config_path)
    cfg2["ldm_sampling"]["sampler"] = "plms"
    cfg2["ldm_sampling"]["cache_interval"] = 2
    with pytest.raises(ValueError, match="requires sampler: ddim"):
        serve(cfg2, io.StringIO(""), io.StringIO(), output_dir=str(root))


@pytest.mark.parametrize("with_mask", [False, True])
def test_sampler_cli_img2img(workspace, with_mask):
    """ldm_sampling.init_image_path (+ mask_path) routes through the
    SDEdit img2img / inpainting loop (diffusion/sampler.py
    ddim_img2img_loop)."""
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    rng = np.random.RandomState(0)
    init = rng.randint(0, 256, (1, IMG, IMG, 3), dtype=np.uint8)
    np.save(root / "init.npy", init)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm_sampling"]["init_image_path"] = str(root / "init.npy")
    cfg["ldm_sampling"]["strength"] = 0.6
    if with_mask:
        mask = np.zeros((IMG, IMG), np.float32)
        mask[: IMG // 2] = 1.0
        np.save(root / "mask.npy", mask)
        cfg["ldm_sampling"]["mask_path"] = str(root / "mask.npy")
    path = str(root / "config_img2img.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(run_ldm_sampler, ["run_ldm_sampler", f"--config_path={path}"])
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


@pytest.mark.parametrize("sampler", ["plms", "dpm_solver_pp_2m", "ddpm"])
def test_sampler_cli_solvers(workspace, sampler):
    """The additive ldm_sampling.sampler key selects PLMS /
    DPM-Solver++(2M) / ancestral DDPM (diffusion/solvers.py)."""
    from ldm_tf2_tpu.cli import run_ldm_sampler

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm_sampling"]["sampler"] = sampler
    if sampler == "ddpm":
        cfg["ldm"]["num_steps"] = 10  # full-T loop; keep the test fast
    path = str(root / f"config_{sampler}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(run_ldm_sampler, ["run_ldm_sampler", f"--config_path={path}"])
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


def test_ae_trainer_cli_vq(workspace):
    """VQ-regularized AE training path (codebook loss + GAN from step 1,
    matching the reference's aevq flow, model_runners.py:229-349)."""
    from ldm_tf2_tpu.cli import run_autoencoder_trainer

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["autoencoder_training"]["autoencoder_type"] = "vq"
    cfg["autoencoder_training"]["ckpt_path"] = str(root / "aevq")
    vq_path = str(root / "config_vq_train.yaml")
    with open(vq_path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(
        run_autoencoder_trainer,
        ["run_autoencoder_trainer", f"--config_path={vq_path}"],
    )
    assert (root / "aevq").exists()


def test_sampler_cli_vq(workspace):
    """VQ decode path (force_quantize — the reference's version crashes,
    autoencoder.py:431; ours is the fixed behavior) + bf16 weight cast."""
    import jax
    import jax.numpy as jnp

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.manager import save_params
    from ldm_tf2_tpu.cli import run_ldm_sampler
    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    os.chdir(root)
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["ldm_sampling"]["autoencoder_type"] = "vq"
    cfg["pre_ckpt_paths"]["autoencoder"] = str(root / "autoencoder-vq-1")
    cfg["tpu"]["weights_dtype"] = "bfloat16"
    vq_path = str(root / "config_vq_sample.yaml")
    with open(vq_path, "w") as f:
        yaml.safe_dump(cfg, f)

    vq_cfg = load_config(vq_path)
    ae = factory.build_autoencoder(vq_cfg, "vq", dtype=jnp.float32)
    save_params(
        vq_cfg["pre_ckpt_paths"]["autoencoder"],
        ae.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))["params"],
    )

    _run_cli(
        run_ldm_sampler,
        ["run_ldm_sampler", f"--config_path={vq_path}"],
    )
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


def test_ldm_trainer_cli(workspace):
    from ldm_tf2_tpu.cli import run_ldm_trainer

    root, config_path = workspace
    os.chdir(root)
    _run_cli(
        run_ldm_trainer,
        ["run_ldm_trainer", f"--config_path={config_path}"],
    )
    assert (root / "ldm").exists()


def test_ldm_trainer_cli_deterministic_data_and_ema(workspace):
    """tpu.deterministic_data routes through the indexed resumable loader;
    ldm_training.ema_decay carries EMA params in the checkpointed state."""
    from ldm_tf2_tpu.cli import run_ldm_trainer

    root, config_path = workspace
    os.chdir(root)
    # the indexed loader needs >= one global batch (2 per device x 8
    # virtual devices) of records per epoch; build a bigger captions dir
    big_dir = root / "images_captions_big"
    big_dir.mkdir(exist_ok=True)
    with TFRecordWriter(str(big_dir / "data.tfrecord")) as w:
        for rep in range(4):
            for p in sorted((root / "raw").glob("*.jpg")):
                with open(p, "rb") as f:
                    img_bytes = f.read()
                w.write(encode_example(
                    {"image": img_bytes, "caption": [102, 104, 105, 106] + [0] * 4}
                ))
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["tpu"]["deterministic_data"] = True
    cfg["tpu"]["frozen_weights_dtype"] = "bfloat16"
    cfg["ldm_training"]["ema_decay"] = 0.99
    # gradient accumulation: MultiSteps state (incl. the accumulator)
    # must survive the Orbax checkpoint round-trip
    cfg["ldm_training"]["grad_accum_steps"] = 2
    cfg["ldm_training"]["root_path"] = str(big_dir)
    cfg["ldm_training"]["ckpt_path"] = str(root / "ldm_det")
    path = str(root / "config_det.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(run_ldm_trainer, ["run_ldm_trainer", f"--config_path={path}"])
    assert (root / "ldm_det").exists()

    # export the EMA weights as sampling artifacts and sample with them
    from ldm_tf2_tpu.checkpoints.manager import load_params
    from ldm_tf2_tpu.cli import export_pretrained, run_ldm_sampler

    _run_cli(
        export_pretrained,
        [
            "export_pretrained",
            f"--config_path={path}",
            f"--out_dir={root / 'exported'}",
        ],
    )
    assert (root / "exported" / "unet-1").exists()
    assert load_params(str(root / "exported" / "unet-1")) is not None

    cfg["pre_ckpt_paths"]["unet"] = str(root / "exported" / "unet-1")
    sample_path = str(root / "config_det_sample.yaml")
    with open(sample_path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(
        run_ldm_sampler, ["run_ldm_sampler", f"--config_path={sample_path}"]
    )
    images = np.load(root / "images.npy")
    assert images.shape == (2, IMG, IMG, 3)


def test_serve_ldm_bf16_compute(workspace):
    """serve_ldm under tpu.compute_dtype bfloat16: the per-slot traced
    guidance operand is f32 and must not upcast the bf16 scan carry
    (regression — the demo model's corpus eval crashed every bf16 serve,
    diffusion/sampler.py CFG cast)."""
    import io

    from ldm_tf2_tpu.cli.serve_ldm import serve
    from ldm_tf2_tpu.configs import load_config

    root, config_path = workspace
    os.chdir(root)
    cfg = load_config(config_path)
    cfg["tpu"]["compute_dtype"] = "bfloat16"
    requests = '{"prompt": "a virus monster", "seed": 1, "out": "bf16"}\n'
    out = io.StringIO()
    serve(cfg, io.StringIO(requests), out, output_dir=str(root))
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == 1 and resps[0]["ok"], resps
    images = np.load(resps[0]["out"])
    assert images.shape == (2, IMG, IMG, 3)
    assert images.dtype == np.uint8


@pytest.mark.slow
def test_ldm_trainer_crash_resume_exact(workspace):
    """Preemption semantics (VERDICT r2 #6): SIGKILL run_ldm_trainer
    between checkpoints, restart, and the resumed run must reproduce the
    uninterrupted run exactly — same per-step losses, identical final
    checkpoint — under tpu.deterministic_data (batch at step s is a pure
    function of (seed, s)) + the step-folded train-step rng."""
    import re
    import signal
    import subprocess
    import sys
    import time

    root, config_path = workspace
    os.chdir(root)

    big_dir = root / "images_captions_big"
    if not big_dir.exists():
        big_dir.mkdir()
        with TFRecordWriter(str(big_dir / "data.tfrecord")) as w:
            for rep in range(4):
                for p in sorted((root / "raw").glob("*.jpg")):
                    with open(p, "rb") as f:
                        img_bytes = f.read()
                    w.write(encode_example(
                        {"image": img_bytes,
                         "caption": [102, 104, 105, 106] + [0] * 4}
                    ))

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    cfg["tpu"]["deterministic_data"] = True
    cfg["tpu"]["persist_per_iterations"] = 2
    cfg["tpu"]["log_per_iterations"] = 1
    cfg["ldm_training"]["root_path"] = str(big_dir)
    cfg["ldm_training"]["num_iterations"] = 6

    import ldm_tf2_tpu

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # the subprocess runs from the tmp workdir; make the repo importable
    repo_root = os.path.dirname(os.path.dirname(ldm_tf2_tpu.__file__))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    def launch(tag):
        cfg["ldm_training"]["ckpt_path"] = str(root / f"ldm_crash_{tag}")
        path = str(root / f"config_crash_{tag}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        log = open(root / f"crash_{tag}.log", "ab")
        proc = subprocess.Popen(
            [sys.executable, "-m", "ldm_tf2_tpu.cli.run_ldm_trainer",
             f"--config_path={path}"],
            cwd=str(root), env=env, stdout=log, stderr=subprocess.STDOUT,
        )
        return proc, log

    def wait_done(proc, log, timeout=900):
        assert proc.wait(timeout=timeout) == 0, read_log(log)
        log.close()

    def read_log(log):
        # the child owns its fd copy; its writes land in the file without
        # any parent-side flush (and the parent handle may be closed)
        with open(log.name) as f:
            return f.read()

    def losses(text):
        return {
            int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"step (\d+) \| loss: ([\d.eE+-]+)", text)
        }

    # A: uninterrupted
    proc, log = launch("a")
    wait_done(proc, log)
    losses_a = losses(read_log(log))
    assert set(losses_a) == {1, 2, 3, 4, 5, 6}, losses_a

    # B: kill once the step-2 checkpoint is durable and step 3 has run
    proc, log = launch("b")
    deadline = time.time() + 900
    while time.time() < deadline:
        text = read_log(log)
        if "step 3 |" in text and (root / "ldm_crash_b" / "2").exists():
            break
        if proc.poll() is not None:
            raise AssertionError(f"trainer exited early:\n{text}")
        time.sleep(2.0)
    else:
        raise AssertionError(f"never reached kill point:\n{read_log(log)}")
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    losses_b1 = losses(read_log(log))
    log.close()

    # restart: must resume from step 2 and replay 3..6 identically
    proc, log = launch("b")
    wait_done(proc, log)
    text = read_log(log)
    assert "Restored checkpoint at step 2" in text, text
    # the log file is append-mode, so the killed run's steps 1-3 are
    # still in the text; the restart must contribute 3..6 (step 3's
    # value is the restart's — dict keeps the last match)
    losses_b2 = losses(text)
    assert {3, 4, 5, 6} <= set(losses_b2), losses_b2

    for s, v in losses_b1.items():
        np.testing.assert_allclose(v, losses_a[s], rtol=1e-5, err_msg=str(s))
    for s, v in losses_b2.items():
        np.testing.assert_allclose(v, losses_a[s], rtol=1e-5, err_msg=str(s))

    # final checkpoints identical leaf-for-leaf
    import orbax.checkpoint as ocp

    def final_state(tag):
        mgr = ocp.CheckpointManager(str(root / f"ldm_crash_{tag}"))
        step = mgr.latest_step()
        assert step == 6, step
        state = mgr.restore(step)
        mgr.close()
        return state

    import jax

    sa, sb = final_state("a"), final_state("b")
    flat_a = jax.tree_util.tree_flatten_with_path(sa)[0]
    flat_b = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(sb)[0]}
    assert len(flat_a) == len(flat_b) and len(flat_a) > 0
    for p, va in flat_a:
        key = tuple(str(k) for k in p)
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(flat_b[key]), err_msg=str(key)
        )
