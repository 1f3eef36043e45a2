"""True multi-process distributed test (VERDICT r1 next-item #4).

Launches 2 real `jax.distributed` CPU processes (Gloo collectives) running
a short tiny-LDM training loop via tests/_mp_ldm_worker.py, and a
single-process run of the same loop, then asserts:

* the 2-process loss sequence equals the single-process sequence (the
  indexed loader's global-permutation sharding + shard_batch's
  `make_array_from_process_local_data` assembly + the DP psum reproduce
  the single-host run exactly);
* both workers agree on the losses and final params (the all-reduduced
  state stays replicated);
* `shard_for_process` partitions the shard files disjointly.

Each process contributes 2 virtual CPU devices, so the 2-process run is a
4-device global mesh spanning process boundaries — the DCN-regime
semantics SURVEY.md §2.4 requires, which the in-process 8-device tests
cannot cover.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_ldm_worker.py")
STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_records(records_dir, n=8, img=16):
    from PIL import Image

    from ldm_tf2_tpu.data.example_proto import encode_example
    from ldm_tf2_tpu.data.tfrecord import TFRecordWriter

    os.makedirs(records_dir, exist_ok=True)
    import io

    paths = [
        os.path.join(records_dir, "a.tfrecord"),
        os.path.join(records_dir, "b.tfrecord"),
    ]
    writers = [TFRecordWriter(p) for p in paths]
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, size=(img + i, img, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        rec = encode_example(
            {"image": buf.getvalue(),
             "caption": [101] + [110 + i] * 3 + [102, 0, 0, 0]}
        )
        writers[i % 2].write(rec)
    for w in writers:
        w.close()
    return paths


def _run(pid, nprocs, port, records_dir, out, local_devices, steps=STEPS,
         ckpt_dir=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    argv = [sys.executable, WORKER, str(pid), str(nprocs), str(port),
            records_dir, out, str(steps)]
    if ckpt_dir is not None:
        argv.append(ckpt_dir)
    return subprocess.Popen(
        argv,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    records_dir = str(tmp_path / "records")
    _write_records(records_dir)

    # 2-process run: 2 local devices each -> 4-device global mesh.
    port = _free_port()
    outs = [str(tmp_path / f"mp{i}.json") for i in range(2)]
    procs = [
        _run(i, 2, port, records_dir, outs[i], local_devices=2)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=1500)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    # single-process run on a 4-device mesh (same global device count).
    out_single = str(tmp_path / "single.json")
    p = _run(0, 1, _free_port(), records_dir, out_single, local_devices=4)
    log = p.communicate(timeout=1500)[0].decode()
    assert p.returncode == 0, log[-3000:]

    results = [json.load(open(o)) for o in outs]
    single = json.load(open(out_single))

    assert results[0]["global_devices"] == 4
    assert single["global_devices"] == 4

    # Both workers observed the same replicated loss and final params.
    np.testing.assert_allclose(
        results[0]["losses"], results[1]["losses"], rtol=1e-6
    )
    np.testing.assert_allclose(
        results[0]["unet_leaf0_sum"], results[1]["unet_leaf0_sum"],
        rtol=1e-6,
    )

    # 2-process == 1-process, step by step.  The param-leaf sum is compared
    # with an absolute tolerance: it is a near-cancelling reduction over
    # ~1e3 elements, so relative error on the tiny total is meaningless.
    np.testing.assert_allclose(
        results[0]["losses"], single["losses"], rtol=1e-4
    )
    np.testing.assert_allclose(
        results[0]["unet_leaf0_sum"], single["unet_leaf0_sum"], atol=1e-4
    )

    # shard_for_process: disjoint round-robin partition covering all files.
    f0, f1 = set(results[0]["my_files"]), set(results[1]["my_files"])
    assert f0.isdisjoint(f1)
    assert f0 | f1 == set(single["my_files"])


def _launch_pair(port, records_dir, outs, steps, ckpt_dir, timeout=1500):
    procs = [
        _run(i, 2, port, records_dir, outs[i], local_devices=2,
             steps=steps, ckpt_dir=ckpt_dir)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_two_process_checkpoint_resume_exact(tmp_path):
    """Multi-host checkpoint/recovery (VERDICT r3 missing #4 / next #4):
    a 2-process run saves Orbax checkpoints under jax.distributed, a
    FRESH 2-process launch restores the latest (every process
    participating against the live shardings), resumes the deterministic
    loader at the restored step, and the resumed run continues the
    single-process loss sequence exactly — the reference's
    restore-at-start semantics (model_runners.py:200-205) generalized to
    multi-process."""
    records_dir = str(tmp_path / "records")
    _write_records(records_dir)
    ckpt = str(tmp_path / "ckpt")

    # phase A: train 3 steps from scratch, saving every step
    outs_a = [str(tmp_path / f"a{i}.json") for i in range(2)]
    a = _launch_pair(_free_port(), records_dir, outs_a, STEPS, ckpt)
    assert a[0]["restored_step"] == 0
    assert a[0]["restored_leaf0_sum"] is None

    # phase B: fresh processes restore step 3 and train 2 more
    outs_b = [str(tmp_path / f"b{i}.json") for i in range(2)]
    b = _launch_pair(_free_port(), records_dir, outs_b, 2, ckpt)
    assert b[0]["restored_step"] == STEPS
    assert b[1]["restored_step"] == STEPS
    # restore-exact: the restored params ARE phase A's final params
    np.testing.assert_allclose(
        b[0]["restored_leaf0_sum"], a[0]["unet_leaf0_sum"], rtol=1e-7
    )

    # reference: one uninterrupted single-process run of 5 steps
    out_single = str(tmp_path / "single.json")
    p = _run(0, 1, _free_port(), records_dir, out_single, local_devices=4,
             steps=STEPS + 2)
    log = p.communicate(timeout=1500)[0].decode()
    assert p.returncode == 0, log[-3000:]
    single = json.load(open(out_single))

    np.testing.assert_allclose(
        a[0]["losses"] + b[0]["losses"], single["losses"], rtol=1e-4
    )
    np.testing.assert_allclose(
        b[0]["unet_leaf0_sum"], single["unet_leaf0_sum"], atol=1e-4
    )


@pytest.mark.slow
def test_two_process_sigkill_resume(tmp_path):
    """Preemption during a multi-process run: SIGKILL both workers
    mid-training (after at least one committed checkpoint), relaunch,
    and the pair restores a complete checkpoint (Orbax atomic-rename
    commit) and continues with losses matching the uninterrupted
    single-process sequence at those steps."""
    import signal
    import time

    records_dir = str(tmp_path / "records")
    _write_records(records_dir)
    ckpt_dir = str(tmp_path / "ckpt")

    # long run we never let finish
    outs = [str(tmp_path / f"k{i}.json") for i in range(2)]
    port = _free_port()
    procs = [
        _run(i, 2, port, records_dir, outs[i], local_devices=2,
             steps=200, ckpt_dir=ckpt_dir)
        for i in range(2)
    ]

    def committed_steps():
        if not os.path.isdir(ckpt_dir):
            return []
        return sorted(
            int(d) for d in os.listdir(ckpt_dir)
            if d.isdigit()
            and not os.path.exists(
                os.path.join(ckpt_dir, d, "orbax.incomplete")
            )
        )

    deadline = time.time() + 1200
    while time.time() < deadline and (
        not committed_steps() or committed_steps()[-1] < 2
    ):
        if any(p.poll() is not None for p in procs):
            raise AssertionError(
                "worker exited early: "
                + procs[0].communicate()[0].decode()[-2000:]
            )
        time.sleep(2)
    assert committed_steps(), "no checkpoint committed before deadline"
    for p in procs:
        p.send_signal(signal.SIGKILL)
    for p in procs:
        p.wait(timeout=60)

    # the resumed pair restores whatever step survived and runs 1 more
    last = committed_steps()[-1]
    outs_r = [str(tmp_path / f"r{i}.json") for i in range(2)]
    r = _launch_pair(_free_port(), records_dir, outs_r, 1, ckpt_dir)
    restored = r[0]["restored_step"]
    assert restored >= last - 1  # an in-flight save may or may not commit
    assert r[0]["restored_leaf0_sum"] is not None

    # losses after resume match the uninterrupted single-process run
    out_single = str(tmp_path / "single.json")
    p = _run(0, 1, _free_port(), records_dir, out_single, local_devices=4,
             steps=restored + 1)
    log = p.communicate(timeout=1500)[0].decode()
    assert p.returncode == 0, log[-3000:]
    single = json.load(open(out_single))
    np.testing.assert_allclose(
        r[0]["losses"], single["losses"][restored:], rtol=1e-4
    )
