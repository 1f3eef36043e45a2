"""Measured low-latency serving row (VERDICT r3 next #6).

Full-size model (same /tmp/serve_ws artifacts as
tools/measure_serve_warmstart.py), latency-optimized serving config —
AOT warm start + dpm_solver_pp_2m 8 NFE + Karras spacing + W8A8 int8
convs + bf16 weights — at a small batch, measured end-to-end through a
REAL serve_ldm process: N sequential single requests, per-request
latency from the server's own response `latency` field (one compiled
pipeline call each).  Quality caveat: the dpm8-karras / int8 FID
evidence is from the ~50-min demo model corpus (COVERAGE.md) — real
CompVis-weight quality is artifact-blocked.

  python tools/measure_latency_row.py [--batch 4] [--requests 12]
  (run tools/measure_serve_warmstart.py first to create the artifacts)
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WS = "/tmp/serve_ws"
CFG_SRC = os.path.join(WS, "serve_cfg.yaml")
CFG = os.path.join(WS, "serve_cfg_latency.yaml")
AOT = os.path.join(WS, "pipeline_latency.aotexec")


def make_config(batch: int) -> None:
    import yaml

    if not os.path.exists(CFG_SRC):
        raise SystemExit(
            "run tools/measure_serve_warmstart.py first (artifacts + base "
            "config under /tmp/serve_ws)"
        )
    with open(CFG_SRC) as f:
        raw = yaml.safe_load(f)
    raw["ldm_sampling"]["latent_shape"] = [batch, 32, 32, 4]
    raw["ldm_sampling"]["sampler"] = "dpm_solver_pp_2m"
    raw["ldm"]["num_ddim_steps"] = 8
    raw["ldm"]["timestep_spacing"] = "karras"
    tpu = raw.setdefault("tpu", {})
    tpu["quantize"] = "int8"
    tpu["weights_dtype"] = "bfloat16"
    with open(CFG, "w") as f:
        yaml.safe_dump(raw, f)


def main() -> None:
    batch = 4
    n_requests = 12
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--requests" in sys.argv:
        n_requests = int(sys.argv[sys.argv.index("--requests") + 1])
    make_config(batch)

    proc = subprocess.Popen(
        [sys.executable, "-m", "ldm_tf2_tpu.cli.serve_ldm",
         f"--config_path={CFG}", f"--output_dir={WS}",
         f"--aot_cache={AOT}"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )
    latencies = []
    t_start = time.time()
    try:
        for i in range(n_requests):
            req = {"prompt": "a cat on a chair, oil on canvas",
                   "seed": 100 + i, "out": f"lat_{i}"}
            proc.stdin.write(json.dumps(req) + "\n")
            proc.stdin.flush()
            line = proc.stdout.readline()
            if not line:
                raise SystemExit("server exited early")
            resp = json.loads(line)
            assert resp.get("ok"), resp
            latencies.append(float(resp["latency_s"]))
            print(f"[lat] request {i}: {resp["latency_s"]:.3f} s "
                  f"({resp["latency_s"] / batch:.3f} s/img)", flush=True)
        proc.stdin.write('"exit"\n')
        proc.stdin.flush()
        proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()

    # drop the first response (includes any residual warm effects)
    steady = latencies[1:] or latencies
    p50 = statistics.median(steady)
    print(json.dumps({
        "config": "dpm_solver_pp_2m 8 NFE + karras + int8 + bf16 + AOT",
        "batch": batch,
        "requests": len(latencies),
        "p50_request_s": round(p50, 4),
        "p50_per_image_s": round(p50 / batch, 4),
        "min_request_s": round(min(steady), 4),
        "total_wall_s": round(time.time() - t_start, 1),
    }))


if __name__ == "__main__":
    main()
