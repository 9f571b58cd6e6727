"""The audio-parity acceptance harness run end-to-end in-process.

Mirrors the reference's own acceptance experiment
(`/root/reference/benchmarks/benchmark_audio_parity.py:438-441`): both
stacks run the COMPLETE pipeline on the same clip with the same
(converted random-oracle) weights and must agree above the bar. The
same harness accepts real checkpoints via --model_path (VERDICT.md
round-1 item 1b).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.parity, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_harness_random_oracle_verdict():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "audio_parity.py"),
         "--device", "cpu", "--small", "--runs", "1", "--seconds", "3"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["verdict"] in ("PERCEPTUALLY_IDENTICAL", "EXACT_MATCH")
    assert result["wave_corr"] > 0.95
    assert 0.9 < result["rms_ratio"] < 1.1
