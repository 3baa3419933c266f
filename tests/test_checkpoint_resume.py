"""Exact mid-decode checkpoint/resume of the PTEQ host loop.

The reference's only resilience is re-pickling decoder *outputs* every 50
datapoints (generate_data.py:251-256): a preempted decode loses all chain
state.  Here the run state (ladder, accumulators, convergence automaton,
PRNG key, row map) snapshots every ``ckpt_every`` windows, a subprocess is
hard-killed (os._exit) mid-decode, and the resumed run must reproduce the
uninterrupted run bit-for-bit.
"""

import os
import subprocess
import sys

import numpy as np

import ckpt_common

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "ckpt_worker.py")


def test_pteq_kill_and_resume_bit_identical(tmp_path):
    baseline = ckpt_common.run(None)  # uninterrupted, no checkpointing

    ckpt_dir = str(tmp_path / "ck")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, WORKER, ckpt_dir],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 9, (
        f"worker should have been preempted (rc=9): rc={proc.returncode}\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    snaps = [f for f in os.listdir(ckpt_dir) if f.startswith("ckpt_")]
    assert snaps, "no snapshot survived the kill"

    resumed = ckpt_common.run(ckpt_dir)  # picks up the latest snapshot
    np.testing.assert_array_equal(resumed.distribution, baseline.distribution)
    np.testing.assert_array_equal(resumed.converged, baseline.converged)
    np.testing.assert_array_equal(resumed.steps, baseline.steps)
    np.testing.assert_array_equal(resumed.tops0, baseline.tops0)
    assert resumed.buckets == baseline.buckets


def test_checkpointing_does_not_perturb_results(tmp_path):
    """A run WITH checkpointing enabled (never killed) must equal the
    plain run — snapshots are pure observers of the RNG/automaton."""
    baseline = ckpt_common.run(None)
    with_ckpt = ckpt_common.run(str(tmp_path / "ck2"))
    np.testing.assert_array_equal(
        with_ckpt.distribution, baseline.distribution
    )
    np.testing.assert_array_equal(with_ckpt.steps, baseline.steps)


def test_stale_checkpoint_from_other_run_rejected(tmp_path):
    """A checkpoint written by a different run signature must raise, not
    silently resume the wrong decode."""
    import jax
    import pytest

    from mcmc_qec_tpu.decoders import PTEQ, PTEQConfig
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing

    ckpt_dir = str(tmp_path / "ck3")
    ckpt_common.run(ckpt_dir)  # leaves snapshots for B=8, Nc=3 behind

    spec = get_spec(ckpt_common.FAM, ckpt_common.D)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(1), spec, 0.08, (4,))
    )
    cfg = PTEQConfig(
        Nc=ckpt_common.NC, engine="sweep", window=100, iters=2,
        max_steps=200, energy_chunk=4, ckpt_dir=ckpt_dir,
    )
    with pytest.raises(ValueError, match="different run"):
        PTEQ(spec, states, 0.08, cfg, seed=1)
