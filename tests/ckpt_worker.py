"""Subprocess worker that is hard-killed mid-decode.

Runs the shared PTEQ decode with checkpointing enabled, but its
CheckpointManager.save is wrapped to ``os._exit(9)`` right after the 3rd
snapshot lands on disk — a real preemption in the middle of the run, with
all later host/device state lost.  The parent test then resumes from the
surviving snapshot and asserts bit-identity with an uninterrupted run.

Run as:  python ckpt_worker.py <ckpt_dir>
"""

import os
import sys


def main() -> int:
    ckpt_dir = sys.argv[1]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    from mcmc_qec_tpu.utils import checkpoint as ck

    orig_save = ck.CheckpointManager.save
    n_saves = {"n": 0}

    def killing_save(self, step, tree, meta=None):
        p = orig_save(self, step, tree, meta)
        n_saves["n"] += 1
        if n_saves["n"] >= 3:
            print(f"preempting after snapshot of window {step}", flush=True)
            os._exit(9)
        return p

    ck.CheckpointManager.save = killing_save

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ckpt_common

    ckpt_common.run(ckpt_dir)
    print("ERROR: run finished without being preempted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
