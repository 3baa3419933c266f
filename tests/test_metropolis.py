"""Statistical correctness of the Metropolis engines.

On a d=3 toric code, the orbit of a state under stabilizer XORs is small
enough (2^16) to enumerate exactly, so the chain's stationary length
distribution pi(n) ~ N(n) * exp(-beta n) is known in closed form.  Both the
literal single-proposal engine and the colored sweep engine must match it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec, np_eq_class, np_syndrome
from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing, betas_xyz
from mcmc_qec_tpu.ops import count_errors, make_chain_update, make_sweep_stepper

from reference_oracles import orbit_states


def exact_length_distribution(spec, state0, betas):
    """pi(n) over the stabilizer orbit of state0 with per-Pauli betas."""
    orbit = orbit_states(spec, state0)
    nx = (orbit == 1).sum(-1)
    ny = (orbit == 2).sum(-1)
    nz = (orbit == 3).sum(-1)
    logw = -(betas[0] * nx + betas[1] * ny + betas[2] * nz)
    w = np.exp(logw - logw.max())
    w /= w.sum()
    n = nx + ny + nz
    dist = np.zeros(spec.nq + 1)
    np.add.at(dist, n, w)
    return dist


def empirical_length_distribution(lengths, nmax):
    dist = np.zeros(nmax + 1)
    np.add.at(dist, lengths.reshape(-1), 1.0)
    return dist / dist.sum()


def _run_single_proposal(spec, state0, betas, n_chains=64, n_rounds=300, iters=20):
    update = jax.jit(make_chain_update(spec, iters))
    states = jnp.broadcast_to(jnp.asarray(state0), (n_chains, spec.nq))
    key = jax.random.PRNGKey(0)
    samples = []
    for r in range(n_rounds):
        key, k = jax.random.split(key)
        states = update(states, k, jnp.asarray(betas, jnp.float32))
        if r >= n_rounds // 3:
            samples.append(np.asarray(count_errors(states)))
    return np.concatenate(samples), np.asarray(states)


def _run_sweep(spec, state0, betas, n_chains=64, n_rounds=200):
    sweep = jax.jit(make_sweep_stepper(spec))
    states = jnp.broadcast_to(jnp.asarray(state0), (n_chains, spec.nq))
    key = jax.random.PRNGKey(1)
    samples = []
    for r in range(n_rounds):
        key, k = jax.random.split(key)
        states = sweep(states, k, jnp.asarray(betas, jnp.float32))
        if r >= n_rounds // 3:
            samples.append(np.asarray(count_errors(states)))
    return np.concatenate(samples), np.asarray(states)


@pytest.mark.parametrize("p", [0.1, 0.3])
def test_single_proposal_stationary_distribution(p):
    spec = get_spec("toric", 3)
    rng = np.random.RandomState(0)
    state0 = (rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.2)).astype(np.uint8)
    betas = betas_depolarizing(p)
    exact = exact_length_distribution(spec, state0, betas)
    lengths, final = _run_single_proposal(spec, state0, betas)
    emp = empirical_length_distribution(lengths, spec.nq)
    tv = 0.5 * np.abs(exact - emp).sum()
    assert tv < 0.05, f"TV distance {tv:.3f} too large"
    # chain must stay in its syndrome/class sector
    assert np.array_equal(
        np_syndrome(spec, final), np.tile(np_syndrome(spec, state0), (len(final), 1))
    )
    assert np.all(np_eq_class(spec, final) == np_eq_class(spec, state0))


@pytest.mark.parametrize("family,d", [("toric", 3), ("planar", 3), ("rotated", 3), ("xzzx", 3)])
def test_sweep_stationary_distribution(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(2)
    state0 = ((rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.2)).astype(np.uint8)
              * spec.valid_mask)
    betas = betas_xyz(0.05, 0.02, 0.1)
    exact = exact_length_distribution(spec, state0, betas)
    lengths, final = _run_sweep(spec, state0, betas)
    emp = empirical_length_distribution(lengths, spec.nq)
    tv = 0.5 * np.abs(exact - emp).sum()
    assert tv < 0.06, f"TV distance {tv:.3f} too large"
    assert np.array_equal(
        np_syndrome(spec, final), np.tile(np_syndrome(spec, state0), (len(final), 1))
    )


def test_engines_agree():
    """Both engines target the same distribution on the same problem."""
    spec = get_spec("planar", 3)
    rng = np.random.RandomState(3)
    state0 = ((rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.3)).astype(np.uint8)
              * spec.valid_mask)
    betas = betas_depolarizing(0.2)
    l1, _ = _run_single_proposal(spec, state0, betas, n_rounds=200)
    l2, _ = _run_sweep(spec, state0, betas, n_rounds=150)
    e1 = empirical_length_distribution(l1, spec.nq)
    e2 = empirical_length_distribution(l2, spec.nq)
    tv = 0.5 * np.abs(e1 - e2).sum()
    assert tv < 0.06, f"engines disagree, TV {tv:.3f}"


@pytest.mark.parametrize("family,d", [("toric", 3), ("planar", 3), ("xzzx", 3)])
def test_dense_sweep_stationary_distribution(family, d):
    from mcmc_qec_tpu.ops.dense_sweep import make_dense_sweep

    spec = get_spec(family, d)
    rng = np.random.RandomState(4)
    state0 = ((rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.2)).astype(np.uint8)
              * spec.valid_mask)
    betas = betas_xyz(0.05, 0.02, 0.1)
    exact = exact_length_distribution(spec, state0, betas)
    sweep = jax.jit(make_dense_sweep(spec))
    states = jnp.broadcast_to(jnp.asarray(state0), (64, spec.nq))
    key = jax.random.PRNGKey(7)
    samples = []
    for r in range(200):
        key, k = jax.random.split(key)
        states = sweep(states, k, jnp.asarray(betas, jnp.float32))
        if r >= 70:
            samples.append(np.asarray(count_errors(states)))
    lengths = np.concatenate(samples)
    emp = empirical_length_distribution(lengths, spec.nq)
    tv = 0.5 * np.abs(exact - emp).sum()
    assert tv < 0.06, f"TV distance {tv:.3f} too large"
    final = np.asarray(states)
    from mcmc_qec_tpu.models import np_syndrome
    assert np.array_equal(
        np_syndrome(spec, final), np.tile(np_syndrome(spec, state0), (len(final), 1))
    )


def test_top_mix_fast_path_equivalence():
    """With zero top-rung betas (depolarizing p_top=0.75), the always-accept
    batched-XOR logical mix must produce the same class-transition
    distribution as the general MH mix (they are the same chain when every
    proposal accepts)."""
    from mcmc_qec_tpu.mcmc.ladder import (
        beta_ladder_depolarizing, init_ladder, make_ladder_step,
    )
    from mcmc_qec_tpu.ops.pauli import eq_class

    spec = get_spec("toric", 3)
    Nc, B = 2, 768
    betas = jnp.asarray(beta_ladder_depolarizing(0.75, Nc), jnp.float32)
    assert np.allclose(np.asarray(betas)[-1], 0.0, atol=1e-7)
    rng = np.random.RandomState(11)
    state0 = ((rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.2))
              .astype(np.uint8) * spec.valid_mask)
    states = jnp.broadcast_to(jnp.asarray(state0), (B, spec.nq))

    hists = []
    for fast in (False, True):
        step = make_ladder_step(spec, Nc, iters=6, p_logical=0.5,
                                engine="sweep", top_exact_accept=fast)
        ls, _, _, _ = jax.jit(step)(
            init_ladder(spec, states, Nc), jax.random.PRNGKey(42 + fast), betas
        )
        classes = np.asarray(eq_class(spec, ls.state[:, -1]))
        hists.append(np.bincount(classes, minlength=spec.n_classes) / B)
    tv = 0.5 * np.abs(hists[0] - hists[1]).sum()
    assert tv < 0.10, f"fast/general top-mix class distributions differ, TV {tv:.3f}"
