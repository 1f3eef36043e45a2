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


def _run(pid, nprocs, port, records_dir, out, local_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nprocs), str(port),
         records_dir, out, str(STEPS)],
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
