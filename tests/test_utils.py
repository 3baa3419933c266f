"""Aux subsystems: checkpoint/resume round-trip, metrics."""

import numpy as np

import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec
from mcmc_qec_tpu.mcmc.ladder import init_ladder
from mcmc_qec_tpu.utils import (
    CheckpointManager,
    effective_sample_size,
    load_pytree,
    save_pytree,
    swap_acceptance_from_traces,
    unique_discovery_curve,
)


def test_pytree_checkpoint_roundtrip(tmp_path):
    spec = get_spec("toric", 3)
    ls = init_ladder(spec, jnp.zeros((4, spec.nq), jnp.uint8), 3)
    tree = {"ladder": ls, "key": jax.random.PRNGKey(7),
            "count": jnp.arange(5)}
    p = str(tmp_path / "ck.npz")
    save_pytree(p, tree, {"note": "x"})
    restored, meta = load_pytree(p, tree)
    assert meta["note"] == "x"
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_keeps_last_k(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    tree = {"x": jnp.arange(3)}
    for step in (10, 20, 30):
        mgr.save(step, tree)
    import os

    ckpts = sorted(f for f in os.listdir(tmp_path) if f.startswith("ckpt_"))
    assert len(ckpts) == 2
    restored, meta = mgr.restore_latest(tree)
    assert meta["step"] == 30


def test_ess_iid_vs_correlated():
    rng = np.random.RandomState(0)
    iid = rng.randn(4000)
    assert effective_sample_size(iid) > 2000
    # AR(1) with strong correlation
    x = np.zeros(4000)
    for i in range(1, 4000):
        x[i] = 0.95 * x[i - 1] + rng.randn()
    assert effective_sample_size(x) < 600


def test_metric_helpers():
    flags = np.array([[0, 1], [1, 0], [1, 0], [0, 1]])
    rates = swap_acceptance_from_traces(flags)
    assert rates.shape == (2,)
    curve = unique_discovery_curve([True, False, True, True])
    assert curve.tolist() == [1, 1, 2, 3]
