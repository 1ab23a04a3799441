"""`cli._resolve_checkpoint` rules — the eval/export entry points' milestone
resolution ("latest" prefers a completed ``model-final``, else the highest
numeric milestone).  Round-5 regression pin: the SR-chain eval's
``--super_checkpoint latest`` used to join ``model-latest`` literally
instead of resolving (fixed to route through ``_resolve_checkpoint``)."""

import os

import pytest

from wdno_tpu.cli import _resolve_checkpoint


def test_latest_prefers_model_final(tmp_path):
    os.makedirs(tmp_path / "model-90000")
    os.makedirs(tmp_path / "model-final")
    assert _resolve_checkpoint(str(tmp_path), "latest").endswith("model-final")


def test_latest_picks_highest_numeric_milestone(tmp_path):
    for m in ("model-5000", "model-90000", "model-10000"):
        os.makedirs(tmp_path / m)
    assert _resolve_checkpoint(str(tmp_path), "latest").endswith("model-90000")


def test_named_milestone_passes_through(tmp_path):
    os.makedirs(tmp_path / "model-12345")
    assert _resolve_checkpoint(str(tmp_path), "12345").endswith("model-12345")


def test_latest_with_no_checkpoints_raises(tmp_path):
    with pytest.raises(SystemExit):
        _resolve_checkpoint(str(tmp_path), "latest")


def test_missing_named_milestone_raises_and_lists_available(tmp_path):
    os.makedirs(tmp_path / "model-5000")
    with pytest.raises(SystemExit, match="model-5000"):
        _resolve_checkpoint(str(tmp_path), "7777")
