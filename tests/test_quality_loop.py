"""Closed-loop accuracy protocol (VERDICT r2 #3): guided expansion ->
3-seed downstream training -> parse_logs delta table, all through ONE
command (scripts/quality_loop.py), mirroring the reference's
``scripts/exps/train_expand.sh`` + ``parse_logs.py`` workflow at toy scale.
"""

import importlib.util
import json
import os
import sys

import pytest


def _load_quality_loop():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "quality_loop.py")
    spec = importlib.util.spec_from_file_location("quality_loop", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_quality_loop_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # save/ caches land in tmp
    ql = _load_quality_loop()
    table = ql.main([
        "--workdir", str(tmp_path / "ql"),
        "--seeds", "1", "2",
        "--epochs", "2", "--train_batch", "8", "--input_size", "16",
        "--num_images_per_prompt", "1",
    ])
    # all three variants trained on both seeds and produced accuracies
    for variant in ("original", "unguided", "guided"):
        assert table[variant]["n"] == 2, (variant, table)
        assert table[variant]["mean"] is not None
        assert 0.0 <= table[variant]["mean"] <= 100.0
    # artifacts: expansion PNG trees + per-seed results + the json table
    assert os.path.isdir(tmp_path / "ql" / "expanded_guided")
    assert os.path.isdir(tmp_path / "ql" / "expanded_unguided")
    assert os.path.exists(
        tmp_path / "ql" / "checkpoint" / "guided" / "seed1" / "results.yaml")
    with open(tmp_path / "ql" / "quality_loop.json") as f:
        assert set(json.load(f)) == {"original", "unguided", "guided"}
