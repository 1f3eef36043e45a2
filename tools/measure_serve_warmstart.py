"""Measure serve_ldm process-restart cost on the full-size model (v5e).

Three real server starts, one request each, against the flagship config
(~1.5B params, 256^2, 50-step DDIM, batch 4 latents by default):

  1. COLD    — empty compile cache, no AOT artifact: trace + XLA compile.
  2. AOT     — artifact from run 1: deserialize the executable
               (no trace, no compile).
  3. CACHE   — AOT artifact removed, compile cache kept: re-trace +
               cache-hit fetch (what the sampler/trainer CLIs get).

Artifacts: random-init full-size checkpoints are generated once under
/tmp/serve_ws (weights don't affect timing).  The reported number is
serve_ldm's own "[serve] ... + warm in Xs" line (model restore included
separately as the process wall time).

  python tools/measure_serve_warmstart.py [--batch 4]
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Durable workspace (NOT /tmp — wiped between sessions on this host):
# the ~5 GB random-init full-size artifacts survive restarts, so repeat
# sessions skip the ~15-minute make_artifacts step.
WS = os.path.expanduser(
    os.environ.get("LDM_SERVE_WS", "~/.cache/ldm_tf2_tpu/serve_ws")
)
AOT = os.path.join(WS, "pipeline.aotexec")
AOT_BF16 = os.path.join(WS, "pipeline_bf16.aotexec")
CACHE = os.path.join(WS, "xla_cache")
CFG = os.path.join(WS, "serve_cfg.yaml")
CFG_BF16 = os.path.join(WS, "serve_cfg_bf16.yaml")


def make_artifacts(batch: int) -> None:
    import jax
    import jax.numpy as jnp
    import yaml

    from ldm_tf2_tpu import factory
    from ldm_tf2_tpu.checkpoints.manager import save_params
    from ldm_tf2_tpu.configs import load_config
    from ldm_tf2_tpu.configs.loader import default_config_path

    os.makedirs(WS, exist_ok=True)
    with open(default_config_path()) as f:
        raw = yaml.safe_load(f)
    raw["ldm_sampling"]["latent_shape"] = [batch, 32, 32, 4]
    raw["ldm_sampling"]["vocab_dir"] = os.path.join(REPO, "bert_model")
    raw["pre_ckpt_paths"] = {
        "cond_stage_model": os.path.join(WS, "transformer-1"),
        "unet": os.path.join(WS, "unet-1"),
        "autoencoder": os.path.join(WS, "autoencoder-1"),
    }
    raw.setdefault("tpu", {})["compile_cache_dir"] = CACHE
    with open(CFG, "w") as f:
        yaml.safe_dump(raw, f)

    config = load_config(CFG)
    if all(os.path.exists(p) for p in config["pre_ckpt_paths"].values()):
        print("[ws] artifacts already present")
        return
    key = jax.random.PRNGKey(0)
    print("[ws] initializing full-size models (jitted init)...", flush=True)
    cond = factory.build_cond_model(config)
    cond_p = jax.jit(cond.init)(
        key, jnp.zeros((1, 77), jnp.int32)
    )["params"]
    save_params(config["pre_ckpt_paths"]["cond_stage_model"], cond_p,
                overwrite=True)
    del cond_p
    unet = factory.build_unet(config)
    unet_p = jax.jit(unet.init)(
        key, jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 1, 1280)),
    )["params"]
    save_params(config["pre_ckpt_paths"]["unet"], unet_p, overwrite=True)
    del unet_p
    ae = factory.build_autoencoder(config, "kl")
    ae_p = jax.jit(ae.init)(
        {"params": key, "sample": key}, jnp.zeros((1, 256, 256, 3))
    )["params"]
    save_params(config["pre_ckpt_paths"]["autoencoder"], ae_p,
                overwrite=True)
    print("[ws] artifacts written", flush=True)


def make_bf16_artifacts() -> None:
    """Half-size serving artifacts (round-4 restore lever): f32 leaves of
    the three artifacts cast to bf16 on disk, plus a config that loads
    them with tpu.weights_dtype bfloat16 (cast becomes a no-op and the
    pipeline compiles for bf16 weights)."""
    import jax
    import ml_dtypes
    import numpy as np
    import yaml

    from ldm_tf2_tpu.checkpoints.manager import load_params, save_params

    bf16_dir = os.path.join(WS, "bf16")
    with open(CFG) as f:
        raw = yaml.safe_load(f)
    names = {"cond_stage_model": "transformer-1", "unet": "unet-1",
             "autoencoder": "autoencoder-1"}
    new_paths = {}
    for key, name in names.items():
        src = raw["pre_ckpt_paths"][key]
        dst = os.path.join(bf16_dir, name)
        new_paths[key] = dst
        if os.path.exists(dst):
            continue
        params = load_params(src)
        params = jax.tree.map(
            lambda a: np.asarray(a).astype(ml_dtypes.bfloat16)
            if np.asarray(a).dtype == np.float32 else np.asarray(a),
            params,
        )
        save_params(dst, params, overwrite=True)
        del params
    raw["pre_ckpt_paths"] = new_paths
    raw.setdefault("tpu", {})["weights_dtype"] = "bfloat16"
    with open(CFG_BF16, "w") as f:
        yaml.safe_dump(raw, f)
    print("[ws] bf16 artifacts ready", flush=True)


def one_start(tag: str, cfg: str = CFG, aot: str = AOT,
              blob: str = "") -> dict:
    req = json.dumps({"prompt": "a cat", "seed": 1, "out": f"ws_{tag}"})
    t0 = time.time()
    argv = [sys.executable, "-m", "ldm_tf2_tpu.cli.serve_ldm",
            f"--config_path={cfg}", f"--output_dir={WS}",
            f"--aot_cache={aot}"]
    if blob:
        argv.append(f"--params_blob={blob}")
    proc = subprocess.run(
        argv,
        input=req + "\n", capture_output=True, text=True, cwd=REPO,
        timeout=3600,
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stderr[-3000:])
        raise SystemExit(f"{tag}: serve exited {proc.returncode}")
    warm_line = [l for l in proc.stderr.splitlines()
                 if "+ warm in" in l][-1]
    restore_lines = [l for l in proc.stderr.splitlines()
                     if "params ready in" in l]
    note_lines = [l for l in proc.stderr.splitlines()
                  if ("AOT" in l or "blob" in l) and "[serve]" in l]
    print(f"[{tag}] wall {wall:.1f}s | {warm_line.strip()}"
          + (f" | {restore_lines[-1].strip()}" if restore_lines else "")
          + (f" | {'; '.join(n.strip() for n in note_lines)}"
             if note_lines else ""), flush=True)
    return {
        "tag": tag, "wall_s": round(wall, 1), "line": warm_line.strip(),
        "restore": restore_lines[-1].strip() if restore_lines else "",
    }


def main() -> None:
    batch = 4
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    modes = "all"
    if "--modes" in sys.argv:
        modes = sys.argv[sys.argv.index("--modes") + 1]
    make_artifacts(batch)

    results = []
    if modes in ("all", "f32"):
        shutil.rmtree(CACHE, ignore_errors=True)
        if os.path.exists(AOT):
            os.remove(AOT)
        results.append(one_start("cold"))
        # aot-warm now overlaps executable deserialize with the param
        # restore (round-4); compare against the r03 serial 150.9 s
        results.append(one_start("aot-warm"))
        os.remove(AOT)
        results.append(one_start("cache-warm"))
    if modes in ("all", "bf16"):
        make_bf16_artifacts()
        if os.path.exists(AOT_BF16):
            os.remove(AOT_BF16)
        results.append(one_start("cold-bf16", CFG_BF16, AOT_BF16))
        # the round-4 headline row: half-size artifact restore + AOT
        # deserialize, overlapped
        results.append(one_start("aot-warm-bf16", CFG_BF16, AOT_BF16))
    if modes in ("all", "blob"):
        # round-5 restore lever (VERDICT r4 next #4): single-blob mmap
        # params.  Same-session A/B pair: aot-warm-bf16 (Orbax restore)
        # vs blob-warm-bf16 (one transfer + jitted unpack).
        make_bf16_artifacts()
        blob = os.path.join(WS, "params_bf16")
        if os.path.exists(AOT_BF16):
            results.append(
                one_start("aot-warm-bf16", CFG_BF16, AOT_BF16)
            )
        # priming start (writes the blob; also writes AOT if missing)
        results.append(
            one_start("blob-prime-bf16", CFG_BF16, AOT_BF16, blob=blob)
        )
        results.append(
            one_start("blob-warm-bf16", CFG_BF16, AOT_BF16, blob=blob)
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
