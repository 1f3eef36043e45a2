"""Probe the trainer-loop host-memory leak (round 5).

The big-demo LDM run (configs/demo_big_config.yaml, b32 128^2) was
OOM-killed by the HOST kernel at step 20,000 with anon-rss 129 GB —
~6.5 MB/step, exactly one f32 image batch per dispatched step.  Both
data-loader queues are bounded (maxsize=2) and dispatch is bounded by
the log-boundary metric fetch, so the suspect is the host->device
transfer path retaining the numpy buffer after the step consumed it.

This probe isolates that path: a jitted accumulate step consuming one
[B,H,W,3] f32 batch per iteration via the same
``jax.device_put(batch, NamedSharding(...))`` call the trainers make
(`parallel/sharding.py shard_batch`), with the trainer CLIs' exact sync
discipline (fetch a scalar only on 200-step log boundaries).  RSS is
read from /proc/self/status every 100 steps.

  python tools/probe_host_leak.py [steps] [mode]

modes:
  plain      — the trainer's pattern
  gc         — plain + gc.collect() every 200 steps
  sync       — block_until_ready on every step's output
  fresh      — newly allocated numpy batch each step
  nosharding / asarray — plain but via device_put-without-sharding /
                         jnp.asarray
  put_only   — transfer + block + del, never calling the jit (pure
               array lifecycle)

VERDICT (2026-08-21, this host): every mode leaks EXACTLY one batch
per transfer (6,150-7,527 KB/step; gc/sync/put_only identical) when the
axon tunnel plugin is registered — including under JAX_PLATFORMS=cpu,
which the plugin force-overrides in raw scripts (the probe ran on the
TPU backend; our CLIs honor cpu via factory.maybe_initialize_
distributed).  With the plugin unloaded (PYTHONPATH= so
~/.axon_site/sitecustomize never runs), the identical loop on the real
CPU backend is FLAT (+10 KB/step over 600 steps).  Conclusion: the
axon client retains one host staging buffer per host->device transfer
until process exit — environment-level, not fixable from framework
code.  Mitigation shipped: run_ldm_trainer transfers image batches at
the compute dtype (bf16 halves the retention rate and the tunnel
bytes); a separate +1.1 MB/step of glibc arena growth disappears under
MALLOC_MMAP_THRESHOLD_=65536 (dynamic-mmap-threshold trap).
"""

import gc
import sys
import time

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    mode = sys.argv[2] if len(sys.argv) > 2 else "plain"

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def step(state, images):
        return state + jnp.mean(images), jnp.sum(images)

    shape = (32, 128, 128, 3)  # the big-demo batch: 6.3 MB f32
    batch = np.random.default_rng(0).standard_normal(shape).astype(
        np.float32
    )
    state = jnp.zeros(())
    print(f"[probe] mode={mode} steps={steps} batch "
          f"{batch.nbytes / 1e6:.1f} MB on {jax.devices()[0]}", flush=True)
    rss0 = rss_mb()
    t0 = time.perf_counter()
    loss = None
    for s in range(1, steps + 1):
        if mode == "fresh":
            batch = np.ascontiguousarray(batch)  # new allocation each step
        if mode == "nosharding":
            x = jax.device_put(batch)
        elif mode == "asarray":
            x = jnp.asarray(batch)
        elif mode == "donate":
            x = jax.device_put(batch, sharding, donate=True)
        else:
            x = jax.device_put(batch, sharding)
        if mode == "put_only":
            x.block_until_ready()
            del x
            if s % 100 == 0:
                d = rss_mb() - rss0
                print(f"[probe] step {s}: rss +{d:.0f} MB", flush=True)
            continue
        state, loss = step(state, x)
        if mode == "sync":
            loss.block_until_ready()
        if mode == "gc" and s % 200 == 0:
            gc.collect()
        if s % 200 == 0:
            float(loss)  # the trainer CLIs' log-boundary sync
        if s % 100 == 0:
            d = rss_mb() - rss0
            print(f"[probe] step {s}: rss +{d:.0f} MB "
                  f"({d / s * 1024:.0f} KB/step, "
                  f"{s / (time.perf_counter() - t0):.1f} steps/s)",
                  flush=True)
    if loss is not None:
        float(loss)
    d = rss_mb() - rss0
    per_step = d / steps * 1024
    print(f"[probe] DONE mode={mode}: rss +{d:.0f} MB over {steps} steps "
          f"= {per_step:.0f} KB/step "
          f"({'LEAK — one batch is ' + f'{batch.nbytes / 1024:.0f} KB' if per_step > batch.nbytes / 1024 * 0.5 else 'no per-batch leak'})",
          flush=True)


if __name__ == "__main__":
    main()
