"""Even/odd replica exchange: statistical equivalence with the sequential
top->bottom sweep (SURVEY §7.1 #4) plus tops0 calibration.

Each even/odd phase is a Metropolis move on disjoint adjacent rung pairs,
so the ladder's joint stationary distribution is unchanged; what changes is
the replica transport speed (<= 2 rungs/step instead of a full-ladder fall),
i.e. the tops0 round-trip clock runs slower in steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec, np_to_class
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.mcmc.ladder import (
    beta_ladder_depolarizing,
    betas_depolarizing,
    init_ladder,
    make_ladder_step,
)
from mcmc_qec_tpu.decoders.pteq import PTEQ, PTEQConfig

from reference_oracles import exact_class_posterior


def _run_ladder(spec, states, Nc, steps, exchange, seed=0, p=0.1):
    step = make_ladder_step(spec, Nc, iters=1, p_logical=0.5,
                            engine="sweep", top_exact_accept=True,
                            exchange=exchange)
    betas = jnp.asarray(beta_ladder_depolarizing(p, Nc), jnp.float32)
    ls = init_ladder(spec, jnp.asarray(states, jnp.uint8), Nc)
    K = spec.n_classes

    @jax.jit
    def run(ls, key):
        def body(carry, k):
            ls, counts = carry
            ls, beq, _, _ = step(ls, k, betas)
            B = beq.shape[0]
            counts = counts.at[jnp.arange(B), beq].add(1)
            return (ls, counts), None

        counts = jnp.zeros((ls.state.shape[0], K), jnp.int32)
        (ls, counts), _ = jax.lax.scan(
            body, (ls, counts), jax.random.split(key, steps)
        )
        return ls, counts

    ls, counts = run(ls, jax.random.PRNGKey(seed))
    return np.asarray(counts), np.asarray(ls.tops0)


def test_even_odd_class_occupation_matches_sequential():
    """Post-burn class-occupation distributions must agree between the two
    exchange schedules within MC tolerance (same sampler target)."""
    spec = get_spec("toric", 3)
    B = 64
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(7), spec, 0.1, (B,))
    )
    # one shared syndrome: average occupation over the batch is then an
    # estimate of the same per-class posterior for both schedules
    states = np.tile(states[:1], (B, 1))
    steps = 3000
    c_seq, tops_seq = _run_ladder(spec, states, 3, steps, "sequential", seed=1)
    c_eo, tops_eo = _run_ladder(spec, states, 3, steps, "even_odd", seed=2)
    d_seq = c_seq.sum(0) / c_seq.sum()
    d_eo = c_eo.sum(0) / c_eo.sum()
    tv = 0.5 * np.abs(d_seq - d_eo).sum()
    assert tv < 0.05, (tv, d_seq, d_eo)


def test_even_odd_tops0_comparable():
    """Replica round trips under even/odd stay within ~2x of the
    sequential schedule's rate (measured ~1.05x at d=5: the two phases
    per step compensate for the loss of full-ladder falls), so the
    TOPS/tops_burn thresholds need no recalibration."""
    spec = get_spec("toric", 5)
    B = 32
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(9), spec, 0.15, (B,))
    )
    steps = 1200
    _, tops_seq = _run_ladder(spec, states, 5, steps, "sequential",
                              seed=3, p=0.15)
    _, tops_eo = _run_ladder(spec, states, 5, steps, "even_odd",
                             seed=4, p=0.15)
    assert tops_eo.mean() > 0
    ratio = tops_eo.mean() / max(tops_seq.mean(), 1e-9)
    assert 0.5 < ratio < 2.0, (tops_seq.mean(), tops_eo.mean())


def test_pteq_even_odd_matches_exact_posterior():
    """End-to-end PTEQ with even/odd exchange hits the exact d=3 posterior
    within the fast-test tolerance (same bar as the sequential engine)."""
    spec = get_spec("toric", 3)
    k = jax.random.PRNGKey(5)
    s0 = np.asarray(sample_depolarizing(k, spec, 0.1, (1,)))[0]
    exact = exact_class_posterior(
        spec, s0, betas_depolarizing(0.1), np_to_class
    )
    B = 8
    res = PTEQ(
        spec, np.tile(s0[None], (B, 1)), 0.1,
        PTEQConfig(max_steps=10000, window=200, TOPS=30, SEQ=4,
                   exchange="even_odd"),
        seed=2,
    )
    mean_distr = res.distribution.mean(axis=0) / 100.0
    assert np.argmax(mean_distr) in np.argsort(exact)[-2:]
    tv = 0.5 * np.abs(exact - mean_distr).sum()
    assert tv < 0.2, (tv, exact, mean_distr)
