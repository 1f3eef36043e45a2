"""tools/real_weights_runbook.py gating behavior: with no artifacts on
disk the runbook must print download instructions and exit 0 without
side effects (VERDICT r3 next #7 — the script must be safe to run
speculatively and become the one-command drop-in when weights land)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_runbook_gates_cleanly_without_artifacts(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "real_weights_runbook.py"),
         "--pytorch_ckpt", str(tmp_path / "missing.ckpt"),
         "--workdir", str(tmp_path / "wd")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "[GATED]" in proc.stdout
    assert "txt2img-f8-large" in proc.stdout
    # nothing converted, nothing sampled
    assert not (tmp_path / "wd" / "converted").exists()


def test_runbook_validate_stage_rejects_bad_checkpoint(tmp_path):
    """With a present-but-wrong checkpoint, stage 1 (--validate_only
    manifest diff) must fail loudly rather than convert garbage."""
    import torch

    bad = tmp_path / "bad.ckpt"
    torch.save({"state_dict": {"not_a_real_key": torch.zeros(1)}}, str(bad))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "real_weights_runbook.py"),
         "--pytorch_ckpt", str(bad),
         "--workdir", str(tmp_path / "wd")],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode != 0
    assert not (tmp_path / "wd" / "converted").exists()
