"""Campaign queue fail-fast gates (VERDICT r3 #6).

Round 3's stage 40 burned 3 retries x 25 min on a precondition that could
never heal: the eval stage's model had never been trained, so
``results/<exp>/config.json`` did not exist (logs/campaign_r3.log:474-516).
These tests pin the r4 behavior: a missing model makes a gated eval stage
skip with ONE log line and exit 0 (queue moves on, no retries); a present
model passes the gate.
"""

import os
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parents[1]
LIB = REPO / "scripts" / "r3_lib.sh"


def _run_gate(workdir, exp):
    return subprocess.run(
        ["bash", "-c", f'. "{LIB}"; gate_model {exp}'],
        cwd=workdir, capture_output=True, text=True,
    )


def test_gate_model_missing_experiment_fails_with_one_line(tmp_path):
    """Exactly the r3 scenario: no results/<exp>/config.json at all."""
    r = _run_gate(tmp_path, "base_control_smoke")
    assert r.returncode == 1
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1
    assert "config.json absent" in lines[0] and "skipping" in lines[0]


def test_gate_model_config_without_checkpoint_fails(tmp_path):
    """Config written but training died before the first milestone save."""
    exp = tmp_path / "results" / "base_control_smoke"
    exp.mkdir(parents=True)
    (exp / "config.json").write_text("{}")
    r = _run_gate(tmp_path, "base_control_smoke")
    assert r.returncode == 1
    assert "no model-" in r.stdout


def test_gate_model_passes_with_checkpoint(tmp_path):
    exp = tmp_path / "results" / "base_control_smoke"
    (exp / "model-1").mkdir(parents=True)
    (exp / "config.json").write_text("{}")
    r = _run_gate(tmp_path, "base_control_smoke")
    assert r.returncode == 0
    assert r.stdout.strip() == ""


def test_eval_stage_skips_not_retries_on_missing_model(tmp_path):
    """The real stage script must exit 0 (skip) when the gate fails, so the
    runner stamps it .done instead of retrying MAX_TRIES times."""
    stage = REPO / "scripts" / "r3_queue.d" / "30_smoke_eval_control.sh"
    # run from an empty workdir: no results/, no chip access needed — the
    # gate must trip before any python/TPU work
    (tmp_path / "scripts").mkdir()
    for f in ("r3_lib.sh",):
        (tmp_path / "scripts" / f).write_text((REPO / "scripts" / f).read_text())
    sdir = tmp_path / "scripts" / "r3_queue.d"
    sdir.mkdir()
    target = sdir / stage.name
    target.write_text(stage.read_text())
    r = subprocess.run(["bash", str(target)], cwd=tmp_path,
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "skipping stage" in r.stdout
    # and it must not have attempted any eval work
    assert "attempt" not in r.stdout
