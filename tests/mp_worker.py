"""Subprocess worker for the REAL multi-process distributed tests.

Each worker is one jax process (the analog of one SLURM array task /
pod-slice host, generate_data.py:274-308).  It joins a local gloo
coordinator, runs ``distributed_generate`` over its shard of the global
batch, and every process independently writes the merged dataset it
gathered so the parent can assert all hosts agree.

Run as:  python mp_worker.py <process_id> <num_processes> <port> <out_dir>
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_dir = sys.argv[4]

    # CPU backend with a couple of virtual devices per process; must be
    # configured before any backend initialization (conftest-style).
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    from mcmc_qec_tpu.parallel import (
        allgather_rows,
        distributed_generate,
        global_sum,
        init_distributed,
    )

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2

    import numpy as np

    # collective smoke checks: allgather sees every host's rows in process
    # order; global_sum sums across hosts
    rows = allgather_rows(np.arange(3) + 100 * pid)
    expect = np.concatenate([np.arange(3) + 100 * p for p in range(nproc)])
    assert np.array_equal(rows, expect), rows
    tot = global_sum(np.array([1, pid]))
    assert tot.tolist() == [nproc, sum(range(nproc))], tot

    from mcmc_qec_tpu.pipeline import RunConfig

    cfg = RunConfig(
        code="planar", method="STDC", size=3, noise="depolarizing",
        p_error=0.08, p_sampling=0.25, droplets=1, steps=300, batch=4,
        seed=11,
    )
    # 5 points over 2 hosts -> ragged shards (3 + 2): exercises the padded
    # allgather merge (multihost.py pad_rows)
    n_total = 5
    merged = distributed_generate(
        os.path.join(out_dir, "merged.npz") if pid == 0 else None,
        cfg, n_total, progress=None,
    )
    assert len(merged) == n_total, len(merged)
    # every process persists its own gathered copy for cross-host comparison
    merged.save(os.path.join(out_dir, f"gathered_p{pid}.npz"))
    print(f"worker {pid} ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
