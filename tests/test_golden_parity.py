"""Golden matched-noise parity vs the reference PyTorch implementation.

Runs benchmarks/golden_parity.py in a subprocess (it flips jax_enable_x64
globally and imports torch + the reference package - both isolated from
this process). The harness injects identical noise into both
implementations and asserts:
- per-step log-weights agree to < 1e-6 (measured ~1e-13 in f64),
- systematic-resampling ancestor indices agree EXACTLY at every step,
- log marginal likelihood agrees for BOTH estimators (iwae/'is' and
  aesmc/'smc') to < 1e-6.

This is the "defense" test for estimator-exactness named by SURVEY.md
section 7 hard-part 2 (the two estimators differ only in where the
logsumexp over particles sits relative to the time-sum,
/root/reference/aesmc/inference.py:130-132 vs 156-159).
"""

import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
HARNESS = REPO / "benchmarks" / "golden_parity.py"
REFERENCE = pathlib.Path("/root/reference")


@pytest.mark.skipif(not REFERENCE.exists(),
                    reason="reference package not mounted")
def test_golden_matched_noise_parity():
    proc = subprocess.run(
        [sys.executable, str(HARNESS)],
        capture_output=True, text=True, timeout=560,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "HOME": "/root", "JAX_PLATFORMS": "cpu"},
        cwd=str(REPO))
    assert proc.returncode == 0, (
        f"harness failed:\nstdout: {proc.stdout}\nstderr: {proc.stderr}")
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"]
    for algorithm in ("is", "smc"):
        entry = report[algorithm]
        assert entry["log_ml_max_abs_dev"] < 1e-6, entry
        assert entry["log_weights_max_abs_dev"] < 1e-6, entry
    assert report["smc"]["ancestor_index_mismatches"] == 0
    # Second config: conjugate Gaussian at T=1 (hoisted-t=0 path), where
    # IWAE == AESMC exactly on both sides.
    t1 = report["t1_gaussian"]
    assert t1["log_ml_max_abs_dev"] < 1e-6, t1
    assert t1["iwae_aesmc_gap_jax"] < 1e-12, t1
    assert t1["iwae_aesmc_gap_ref"] < 1e-12, t1
