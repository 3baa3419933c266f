"""Pallas dense-sweep kernel vs exact stationary distribution (interpret
mode on CPU; the compiled path is exercised by bench.py on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec, np_syndrome
from mcmc_qec_tpu.mcmc.ladder import betas_xyz
from mcmc_qec_tpu.ops import count_errors
from mcmc_qec_tpu.ops.pallas_sweep import make_pallas_sweep

from test_metropolis import empirical_length_distribution, exact_length_distribution


@pytest.mark.parametrize("family,d", [("toric", 3), ("planar", 3)])
def test_pallas_sweep_stationary(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(5)
    state0 = ((rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.2)).astype(np.uint8)
              * spec.valid_mask)
    betas = betas_xyz(0.05, 0.02, 0.1)
    exact = exact_length_distribution(spec, state0, betas)
    fn, _ = make_pallas_sweep(spec, n_sweeps=2, batch_tile=64, interpret=True)
    states = jnp.broadcast_to(jnp.asarray(state0), (64, spec.nq))
    samples = []
    for r in range(120):
        states = fn(states, r + 1, jnp.asarray(betas, jnp.float32))
        if r >= 40:
            samples.append(np.asarray(count_errors(states)))
    lengths = np.concatenate(samples)
    emp = empirical_length_distribution(lengths, spec.nq)
    tv = 0.5 * np.abs(exact - emp).sum()
    assert tv < 0.08, f"TV distance {tv:.3f} too large"
    final = np.asarray(states)
    assert np.array_equal(
        np_syndrome(spec, final), np.tile(np_syndrome(spec, state0), (len(final), 1))
    )


def test_pallas_sweep_ragged_batch():
    """Batch sizes that are no multiple of (batch_tile * n_pack) must round
    -trip through the chain-packed layout: syndromes preserved, padding
    chains dropped."""
    spec = get_spec("toric", 3)  # nq=18 -> 4 chains packed per 128-lane row
    rng = np.random.RandomState(11)
    states0 = (
        rng.randint(0, 4, (37, spec.nq)) * (rng.rand(37, spec.nq) < 0.2)
    ).astype(np.uint8) * spec.valid_mask
    fn, _ = make_pallas_sweep(spec, n_sweeps=3, batch_tile=8, interpret=True)
    out = np.asarray(
        fn(jnp.asarray(states0), 7, jnp.asarray(betas_xyz(0.1, 0.1, 0.1), jnp.float32))
    )
    assert out.shape == states0.shape
    assert np.array_equal(np_syndrome(spec, out), np_syndrome(spec, states0))
    assert not np.array_equal(out, states0)  # the chains actually moved


ON_TPU = jax.default_backend() in ("tpu",)


@pytest.mark.skipif(not ON_TPU, reason="compiled kernel needs a TPU")
@pytest.mark.parametrize("family,d", [("toric", 3)])  # d=3 packs 4 chains/row
def test_pallas_sweep_stationary_compiled(family, d):
    """Compiled-path stationarity (pltpu.prng_random_bits on the packed
    chain layout): the interpret-mode test above injects precomputed
    uniforms, so on-chip RNG regressions in the packed layout would slip
    through without this.  Run with MCMC_QEC_TEST_TPU=1.  Last verified
    on-chip 2026-08-19."""
    spec = get_spec(family, d)
    rng = np.random.RandomState(5)
    state0 = ((rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.2)).astype(np.uint8)
              * spec.valid_mask)
    betas = betas_xyz(0.05, 0.02, 0.1)
    exact = exact_length_distribution(spec, state0, betas)
    fn, _ = make_pallas_sweep(spec, n_sweeps=2, batch_tile=64)
    states = jnp.broadcast_to(jnp.asarray(state0), (256, spec.nq))
    samples = []
    for r in range(120):
        states = fn(states, r + 1, jnp.asarray(betas, jnp.float32))
        if r >= 40:
            samples.append(np.asarray(count_errors(states)))
    lengths = np.concatenate(samples)
    emp = empirical_length_distribution(lengths, spec.nq)
    tv = 0.5 * np.abs(exact - emp).sum()
    assert tv < 0.08, f"TV distance {tv:.3f} too large"
    final = np.asarray(states)
    assert np.array_equal(
        np_syndrome(spec, final), np.tile(np_syndrome(spec, state0), (len(final), 1))
    )


@pytest.mark.parametrize("family,d", [("toric", 3), ("planar", 3)])
def test_pallas_sweep_equal_betas_stationary(family, d):
    """The equal-betas fast path (one multilinear total-count contraction
    per color instead of three per-Pauli ones) must sample the same
    stationary distribution as the general path for uniform betas."""
    spec = get_spec(family, d)
    rng = np.random.RandomState(5)
    state0 = ((rng.randint(0, 4, spec.nq) * (rng.rand(spec.nq) < 0.2)).astype(np.uint8)
              * spec.valid_mask)
    beta = 0.7
    betas = np.array([beta, beta, beta])
    exact = exact_length_distribution(spec, state0, betas)
    fn, _ = make_pallas_sweep(spec, n_sweeps=2, batch_tile=64, interpret=True,
                              equal_betas=True)
    states = jnp.broadcast_to(jnp.asarray(state0), (64, spec.nq))
    samples = []
    for r in range(120):
        states = fn(states, r + 1, jnp.asarray(betas, jnp.float32))
        if r >= 40:
            samples.append(np.asarray(count_errors(states)))
    lengths = np.concatenate(samples)
    emp = empirical_length_distribution(lengths, spec.nq)
    tv = 0.5 * np.abs(exact - emp).sum()
    assert tv < 0.08, f"TV distance {tv:.3f} too large"
    final = np.asarray(states)
    assert np.array_equal(
        np_syndrome(spec, final), np.tile(np_syndrome(spec, state0), (len(final), 1))
    )


def test_pallas_sweep_equal_betas_acceptance_matches_general():
    """With uniform betas, the fast path's log acceptance ratio equals the
    general path's up to float rounding: identical uniforms must yield
    identical trajectories (interpret mode injects the same logu)."""
    spec = get_spec("toric", 3)
    rng = np.random.RandomState(11)
    states0 = (
        rng.randint(0, 4, (37, spec.nq)) * (rng.rand(37, spec.nq) < 0.2)
    ).astype(np.uint8) * spec.valid_mask
    betas = jnp.asarray([0.9, 0.9, 0.9], jnp.float32)
    f_gen, _ = make_pallas_sweep(spec, n_sweeps=3, batch_tile=8, interpret=True)
    f_eq, _ = make_pallas_sweep(spec, n_sweeps=3, batch_tile=8, interpret=True,
                                equal_betas=True)
    a = np.asarray(f_gen(jnp.asarray(states0), 7, betas))
    b = np.asarray(f_eq(jnp.asarray(states0), 7, betas))
    np.testing.assert_array_equal(a, b)
