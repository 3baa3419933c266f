"""CLI --distributed: a pod run is one CLI invocation per host.

Two real processes each run ``python -m mcmc_qec_tpu generate
--distributed`` against a local gloo coordinator; rank 0 writes the
gathered dataset.  This is the CLI face of the multihost path already
pinned by tests/test_multiprocess.py (the reference's production interface
was a SLURM array + offline pickle merge, generate_data.py:274-308)."""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_cli_distributed_generate_end_to_end(tmp_path):
    out = str(tmp_path / "dist.npz")
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    base = [
        sys.executable, "-m", "mcmc_qec_tpu", "generate",
        "--distributed", "--coordinator", f"localhost:{port}",
        "--platform", "cpu", "--num-processes", str(nproc),
        "--out", out, "-n", "5",
        "--code", "planar", "--method", "STDC", "--size", "3",
        "--p-error", "0.08", "--p-sampling", "0.25", "--droplets", "1",
        "--steps", "300", "--batch", "4", "--seed", "11",
    ]
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{o[-4000:]}"
    assert "wrote 5 points" in outs[0]  # rank 0 persists + reports

    from mcmc_qec_tpu.pipeline import Dataset

    ds = Dataset.load(out)
    assert len(ds) == 5  # ragged 3 + 2 shards merged, padding trimmed
    assert np.all(ds.true_classes >= 0)

    # the CLI run must equal the library-level shared-nothing execution
    # (same per-host seed split as distributed_generate)
    import dataclasses

    from mcmc_qec_tpu.pipeline import RunConfig, generate

    cfg = RunConfig(
        code="planar", method="STDC", size=3, noise="depolarizing",
        p_error=0.08, p_sampling=0.25, droplets=1, steps=300, batch=4,
        seed=11,
    )
    parts = [
        generate(None, dataclasses.replace(cfg, seed=cfg.seed + pid),
                 n_local, progress=None)
        for pid, n_local in ((0, 3), (1, 2))
    ]
    qm = np.concatenate([p.qubit_matrices for p in parts])
    trues = np.concatenate([p.true_classes for p in parts])
    assert np.array_equal(ds.qubit_matrices, qm)
    assert np.array_equal(ds.true_classes, trues)
    assert np.allclose(
        ds.distributions,
        np.concatenate([p.distributions for p in parts]), atol=1e-4,
    )
