"""One-shot TPU A/B runbook: all benchmarks queued behind the tunnel wedge.

Runs bench.py under each pending configuration sequentially (each in its
own subprocess so a Mosaic crash or a compile hang cannot take down the
suite), records wall/compile time + the JSON result line, and writes a
summary to tools/ab_results.json.

  python tools/run_tpu_ab.py            # full matrix
  python tools/run_tpu_ab.py quick      # emitter + dots + deepcache2 only

Matrix (see NEXT.md "round-2 session" notes for why each exists):
  1. baseline            — emitter conv path (current default)
  2. fused dots          — 9-shifted-dots conv (flip default if it wins
                           and compile time is acceptable)
  3. fused dots3         — 3-dot row-grouped variant (compile-time hedge)
  4. deepcache 2 / 3     — DeepCache interval speedup (opt-in feature;
                           measure so the quality/speed trade is honest)
  5. highres baseline/dots — 512² 200-step for the winner
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("baseline", {}, []),
    ("dots", {"LDM_BENCH_FUSED_CONV": "dots"}, []),
    ("dots3", {"LDM_BENCH_FUSED_CONV": "dots3"}, []),
    ("deepcache2", {"LDM_BENCH_DEEPCACHE": "2"}, []),
    ("deepcache3", {"LDM_BENCH_DEEPCACHE": "3"}, []),
    ("highres_baseline", {}, ["highres"]),
    ("highres_dots", {"LDM_BENCH_FUSED_CONV": "dots"}, ["highres"]),
]

QUICK = {"baseline", "dots", "deepcache2"}


def run_case(name, env_extra, args, timeout_s):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.update(env_extra)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *args],
            capture_output=True, text=True, timeout=timeout_s, env=env,
            cwd=REPO,
        )
        wall = time.time() - t0
        result = None
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                result = json.loads(line)
        # bench.py prints "[bench] warmup done in Xs" = compile+1st run
        compile_s = None
        for line in proc.stdout.splitlines():
            if "warmup done in" in line:
                compile_s = float(line.split("in")[-1].rstrip("s."))
        return {
            "name": name, "ok": proc.returncode == 0 and result is not None,
            "wall_s": round(wall, 1), "compile_s": compile_s,
            "result": result,
            "stderr_tail": proc.stderr[-500:] if proc.returncode else "",
        }
    except subprocess.TimeoutExpired:
        return {"name": name, "ok": False, "wall_s": round(time.time() - t0, 1),
                "error": f"timeout {timeout_s}s"}


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    out_path = os.path.join(REPO, "tools", "ab_results.json")
    results = []
    for name, env_extra, args in CASES:
        if quick and name not in QUICK:
            continue
        # dots variants can compile very slowly (~450 dots in the U-Net
        # body measured >25 min once); give them more headroom.
        timeout_s = 4500 if "dots" in name else 2400
        if "highres" in name:
            timeout_s += 1800
        print(f"[ab] running {name} (timeout {timeout_s}s)...", flush=True)
        r = run_case(name, env_extra, args, timeout_s)
        print(f"[ab] {name}: {json.dumps(r)[:300]}", flush=True)
        results.append(r)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"[ab] wrote {out_path}")


if __name__ == "__main__":
    main()
