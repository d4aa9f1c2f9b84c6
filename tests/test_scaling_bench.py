"""The weak-scaling harness must run green at small N in CI: process
groups form, every step's loss matches the single-device reference (the
harness asserts this internally), and the artifact is well-formed.
The full N in {1,2,4,8} sweep produces the committed SCALING.json."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scaling_harness_small_sweep(tmp_path):
    out = tmp_path / "scaling.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py"),
         "--out", str(out), "1", "2"],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
    )
    if proc.returncode != 0 and "did not complete" in proc.stderr:
        pytest.skip("distributed group did not form (environment)")
    assert proc.returncode == 0, proc.stderr[-3000:]
    art = json.loads(out.read_text())
    assert art["results"][0]["n_processes"] == 1
    assert art["results"][1]["n_processes"] == 2
    for row in art["results"]:
        assert row["losses_match_single_device"]
        assert row["rays_per_sec"] > 0
    # committed artifact exists and covers the full sweep
    committed = os.path.join(REPO, "SCALING.json")
    if os.path.exists(committed):
        full = json.load(open(committed))
        assert full["results"][-1]["n_processes"] >= 4
