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


def test_ladder_metrics_from_real_run():
    """Exercise the metrics helpers on an actual PT ladder trajectory."""
    import jax.numpy as jnp

    from mcmc_qec_tpu.mcmc.ladder import (
        beta_ladder_depolarizing,
        init_ladder,
        make_ladder_step,
    )
    from mcmc_qec_tpu.utils import LadderMetrics

    from mcmc_qec_tpu.models.noise import sample_depolarizing

    spec = get_spec("toric", 3)
    Nc = 3
    step = jax.jit(make_ladder_step(spec, Nc, iters=10, p_logical=0.5))
    betas = jnp.asarray(beta_ladder_depolarizing(0.1, Nc), jnp.float32)
    # nonzero syndrome: at the all-zero minimum, downward flag swaps are
    # exponentially suppressed and tops0 stays ~0
    s0 = sample_depolarizing(jax.random.PRNGKey(5), spec, 0.1, (4,))
    ls = init_ladder(spec, s0, Nc)
    key = jax.random.PRNGKey(0)
    flags, energies = [], []
    n_steps = 250
    for i in range(n_steps):
        key, k = jax.random.split(key)
        ls, beq, nxyz, _ = step(ls, k, betas)
        flags.append(np.asarray(ls.flag[0]))
        energies.append(float(np.asarray(nxyz[0]).sum()))
    m = LadderMetrics(
        swap_accept_rate=swap_acceptance_from_traces(np.stack(flags)),
        tops0_rate=float(np.asarray(ls.tops0).sum()) / (4 * n_steps),
        energy_ess=effective_sample_size(np.array(energies)),
        steps=n_steps,
    )
    assert m.swap_accept_rate.shape == (Nc,)
    # replicas complete round trips at d=3 (rate ~1-2% per step per ladder)
    assert m.tops0_rate > 0
    assert m.energy_ess > 1
    assert "tops0_rate" in m.to_json()


def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from mcmc_qec_tpu.utils import StageTimer, Throughput, device_trace

    with device_trace(str(tmp_path / "trace")):
        jnp.zeros(8).sum().block_until_ready()
    t = Throughput()
    with t.measure(100):
        pass
    assert t.work == 100
    st = StageTimer()
    with st.stage("x"):
        pass
    assert "x" in st.summary()
