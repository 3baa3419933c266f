"""REAL multi-process execution of the pod-slice paths.

The round-1 suite only exercised ``process_count() == 1`` degenerate
branches; here 2 actual processes join a local gloo coordinator
(jax.distributed.initialize on the CPU backend) and run
``distributed_generate`` with a ragged shard split, executing
``process_allgather``, the padded-merge path (multihost.py pad_rows) and
per-host seed splitting for real.  The merged dataset must equal the
concatenation of independent single-process runs with the same per-host
seeds — in-band gather replaces the reference's file-based SLURM merge
(generate_data.py:274-308, concat_data.py:8-75) without changing results.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mp_run(tmp_path_factory):
    """Launch the 2-process run once; several tests assert on its output."""
    out_dir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port), out_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"worker {pid} ok" in out
    return out_dir


def test_two_process_generate_merges_ragged_shards(mp_run):
    from mcmc_qec_tpu.pipeline import Dataset

    ds = Dataset.load(os.path.join(mp_run, "merged.npz"))
    assert len(ds) == 5  # 3 (host 0) + 2 (host 1, padded then trimmed)
    assert np.all(ds.true_classes >= 0)  # no padding rows leaked through


def test_all_processes_gather_identical_datasets(mp_run):
    from mcmc_qec_tpu.pipeline import Dataset

    d0 = Dataset.load(os.path.join(mp_run, "gathered_p0.npz"))
    d1 = Dataset.load(os.path.join(mp_run, "gathered_p1.npz"))
    assert np.array_equal(d0.qubit_matrices, d1.qubit_matrices)
    assert np.array_equal(d0.distributions, d1.distributions)
    assert np.array_equal(d0.true_classes, d1.true_classes)


def test_merged_equals_per_host_single_process_runs(mp_run):
    """Bitwise equivalence with the shared-nothing execution: host h runs
    generate() with seed = cfg.seed + h on its shard size; concatenating
    the two must reproduce the distributed result exactly."""
    import dataclasses

    from mcmc_qec_tpu.pipeline import Dataset, RunConfig, generate

    cfg = RunConfig(
        code="planar", method="STDC", size=3, noise="depolarizing",
        p_error=0.08, p_sampling=0.25, droplets=1, steps=300, batch=4,
        seed=11,
    )
    # host_shard(5) with 2 processes: per = 3 -> host 0 gets 3, host 1 gets 2
    parts = []
    for pid, n_local in ((0, 3), (1, 2)):
        local = dataclasses.replace(cfg, seed=cfg.seed + pid)
        parts.append(generate(None, local, n_local, progress=None))
    merged = Dataset.load(os.path.join(mp_run, "merged.npz"))
    qm = np.concatenate([p.qubit_matrices for p in parts])
    distr = np.concatenate([p.distributions for p in parts])
    trues = np.concatenate([p.true_classes for p in parts])
    assert np.array_equal(merged.qubit_matrices, qm)
    assert np.array_equal(merged.true_classes, trues)
    assert np.allclose(merged.distributions, distr, atol=1e-4)
