"""Bucket-by-bucket roofline accounting from a jax.profiler perfetto trace.

Answers "where does the time go, and is each bucket compute- or
bandwidth-limited?" for a traced device program (tools/profile_pipeline.py
writes the trace).  Each XLA-Ops slice carries `model_flops`,
`bytes_accessed` and `device_duration_ps`; aggregating by `hlo_category`
gives per-bucket achieved TF/s and GB/s against the chip's peaks, i.e.
the headroom accounting for the gap between measured throughput and the
matmul roofline.

  python tools/roofline_report.py [trace_dir] [--peak-tfs 197] [--peak-gbs 819]

Defaults are TPU v5e: 197 bf16 TF/s (394 is the int8 number), 819 GB/s
HBM.  `bytes_accessed` counts logical bytes (fused reuse included), so
GB/s above peak means "operand traffic served from on-chip memory", not
a measurement error.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def load_ops(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    with gzip.open(max(paths), "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    tnames = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    for e in ev:
        if e.get("ph") != "X":
            continue
        if tnames.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        args = e.get("args", {})
        yield (
            e["name"],
            args.get("hlo_category", "?"),
            int(args.get("device_duration_ps", 0)),
            int(args.get("model_flops", 0) or 0),
            int(args.get("bytes_accessed", 0) or 0),
        )


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ldm_trace"
    peak_tfs = 197.0
    peak_gbs = 819.0
    if "--peak-tfs" in sys.argv:
        peak_tfs = float(sys.argv[sys.argv.index("--peak-tfs") + 1])
    if "--peak-gbs" in sys.argv:
        peak_gbs = float(sys.argv[sys.argv.index("--peak-gbs") + 1])

    by_cat = defaultdict(lambda: [0, 0, 0, 0])  # ps, flops, bytes, n
    for name, cat, ps, flops, nbytes in load_ops(trace_dir):
        # Pallas kernels arrive as custom-call with no model_flops; label
        # them by kernel name so attention/ffn show as their own buckets.
        if cat == "custom-call":
            cat = f"custom-call:{name.split('.')[0]}"
        b = by_cat[cat]
        b[0] += ps
        b[1] += flops
        b[2] += nbytes
        b[3] += 1

    total_ps = sum(b[0] for b in by_cat.values())
    total_flops = sum(b[1] for b in by_cat.values())
    print(
        f"device total {total_ps/1e9:.2f} ms | modeled "
        f"{total_flops/1e12:.2f} TFLOP | roofline at {peak_tfs:.0f} TF/s = "
        f"{total_flops/peak_tfs/1e9:.2f} ms -> program at "
        f"{100*total_flops/peak_tfs/1e0/max(total_ps,1):.1f}% of matmul roofline"
    )
    print(
        f"{'bucket':34} {'ms':>8} {'%':>6} {'TF/s':>7} {'%MXU':>6} "
        f"{'GB/s':>7} {'%HBM':>6}  limiter"
    )
    for cat, (ps, flops, nbytes, n) in sorted(
        by_cat.items(), key=lambda kv: -kv[1][0]
    ):
        s = ps / 1e12
        tfs = flops / 1e12 / s if s else 0.0
        gbs = nbytes / 1e9 / s if s else 0.0
        f_mxu = 100 * tfs / peak_tfs
        f_hbm = 100 * gbs / peak_gbs
        limiter = "MXU" if f_mxu >= f_hbm else "HBM"
        if max(f_mxu, f_hbm) < 15:
            limiter = "neither (overhead/serial)"
        print(
            f"{cat[:34]:34} {ps/1e9:8.2f} {100*ps/total_ps:6.1f} "
            f"{tfs:7.1f} {f_mxu:6.1f} {gbs:7.1f} {f_hbm:6.1f}  {limiter}"
        )


if __name__ == "__main__":
    main()
