"""Structured metric logging.

Upgrades the reference's `print` + `sys.stdout.flush` every 100 steps
(model_runners.py:215-220, :679-682) to a logger that prints AND appends
JSONL (step, wall time, metrics, steps/sec, images/sec) for machine
consumption; TensorBoard-compatible writers can be layered on the JSONL.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Mapping


class MetricLogger:
    def __init__(self, jsonl_path: str | None = None,
                 log_per_iterations: int = 100):
        self._path = jsonl_path
        self._every = max(1, log_per_iterations)
        self._last_time = time.perf_counter()
        self._last_step: int | None = None

    def log(self, step: int, metrics: Mapping[str, float],
            batch_size: int | None = None) -> None:
        if step % self._every:
            return
        now = time.perf_counter()
        record = {"step": int(step), "time": now}
        record.update({k: float(v) for k, v in metrics.items()})
        if self._last_step is not None and step > self._last_step:
            dt = now - self._last_time
            steps_per_sec = (step - self._last_step) / dt if dt > 0 else 0.0
            record["steps_per_sec"] = round(steps_per_sec, 4)
            if batch_size:
                record["images_per_sec"] = round(
                    steps_per_sec * batch_size, 4
                )
        self._last_time = now
        self._last_step = int(step)

        parts = [f"step {record['step']}"] + [
            f"{k}: {v:.6g}"
            for k, v in record.items()
            if k not in ("step", "time")
        ]
        print(" | ".join(parts))
        sys.stdout.flush()
        if self._path:
            with open(self._path, "a") as f:
                f.write(json.dumps(record) + "\n")
