"""Position-carrying PT ladder step (mcmc/ladder.make_perm_ladder_step):
statistical equivalence with the physical-swap step (make_ladder_step)
plus exactness of the gather-free bookkeeping.

The pos-carry step runs the SAME proposal kernels and swap rule; only the
representation differs (chains keep their rung index instead of being
copied between rows), so per-rung swap acceptance, tops0 transport and
the per-rung energy statistics must agree within MC error, and the
rung-ordered records must be an exact permutation of the physical ones.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.mcmc.ladder import (
    LadderState,
    beta_ladder_depolarizing,
    init_ladder,
    make_ladder_step,
    make_perm_ladder_step,
    perm_enter,
    perm_exit,
)
from mcmc_qec_tpu.ops.pauli import count_errors_xyz, make_hash_mults, pack_key


def _run_perm(spec, states, Nc, steps, p, seed=0, exchange="sequential"):
    step = make_perm_ladder_step(spec, Nc, iters=1, engine="sweep",
                                 exchange=exchange)
    betas = jnp.asarray(beta_ladder_depolarizing(p, Nc), jnp.float32)
    pls0 = perm_enter(init_ladder(spec, jnp.asarray(states, jnp.uint8), Nc))

    @jax.jit
    def run(pls, key):
        def body(carry, k):
            pls = carry
            pls, keys_, nxyz, acc = step(pls, k, betas)
            return pls, (keys_, nxyz, acc)

        ks = jax.random.split(key, steps)
        pls, (keys_, nxyz, acc) = jax.lax.scan(body, pls, ks)
        return pls, keys_, nxyz, acc

    return run(pls0, jax.random.PRNGKey(seed))


def _run_phys(spec, states, Nc, steps, p, seed=0):
    step = make_ladder_step(spec, Nc, iters=1, p_logical=0.0,
                            engine="sweep")
    betas = jnp.asarray(beta_ladder_depolarizing(p, Nc), jnp.float32)
    ls0 = init_ladder(spec, jnp.asarray(states, jnp.uint8), Nc)

    @jax.jit
    def run(ls, key):
        def body(carry, k):
            ls = carry
            ls, _, _, acc = step(ls, k, betas)
            return ls, (count_errors_xyz(ls.state), acc)

        ks = jax.random.split(key, steps)
        ls, (nxyz, acc) = jax.lax.scan(body, ls, ks)
        return ls, nxyz, acc

    return run(ls0, jax.random.PRNGKey(seed + 7))


def test_pos_carry_matches_physical_swap_statistics():
    spec = get_spec("toric", 3)
    Nc, B, steps, p = 4, 512, 300, 0.12
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, p, (B,))
    )
    pls, keys_p, n_perm, acc_p = _run_perm(spec, states, Nc, steps, p)
    ls_phys, n_phys, acc_x = _run_phys(spec, states, Nc, steps, p)

    # per-rung-pair swap acceptance within MC error
    rate_p = np.asarray(acc_p, float).mean(axis=(0, 1))
    rate_x = np.asarray(acc_x, float).mean(axis=(0, 1))
    assert np.abs(rate_p - rate_x).max() < 0.05, (rate_p, rate_x)

    # tops0 transport clock within 25%
    t_p = float(jnp.mean(pls.tops0))
    t_x = float(jnp.mean(ls_phys.tops0))
    assert abs(t_p - t_x) / max(t_x, 1e-9) < 0.25, (t_p, t_x)

    # per-rung mean energy profile (late half) within MC error: rung r of
    # the pos-carry records == rung r of the physical-order ladder
    half = steps // 2
    e_p = np.asarray(n_perm, float)[half:].sum(-1).mean(axis=(0, 1))
    e_x = np.asarray(n_phys, float)[half:].sum(-1).mean(axis=(0, 1))
    assert np.abs(e_p - e_x).max() < 1.0, (e_p, e_x)
    # temperature ordering: energy increases up the ladder
    assert (np.diff(e_p) > -0.2).all(), e_p


def test_pos_carry_records_are_exact_rung_reorderings():
    """The emitted keys/n_xyz must equal pack_key/count of the
    position-ordered state at every step's end — including the exact
    uint32 reconstruction through the 16-bit-halves contraction."""
    spec = get_spec("toric", 3)
    Nc, B, p = 4, 64, 0.12
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(1), spec, p, (B,))
    )
    step = make_perm_ladder_step(spec, Nc, iters=1, engine="sweep")
    betas = jnp.asarray(beta_ladder_depolarizing(p, Nc), jnp.float32)
    pls = perm_enter(init_ladder(spec, jnp.asarray(states, jnp.uint8), Nc))
    mults = jnp.asarray(make_hash_mults(spec))
    key = jax.random.PRNGKey(3)
    for t in range(5):
        pls, keys_, nxyz, _ = step(pls, jax.random.fold_in(key, t), betas)
        ls = perm_exit(pls)
        np.testing.assert_array_equal(
            np.asarray(keys_), np.asarray(pack_key(spec, ls.state, mults))
        )
        np.testing.assert_array_equal(
            np.asarray(nxyz), np.asarray(count_errors_xyz(ls.state))
        )
        # pos stays a permutation; flags travel with chains: exactly one
        # flag condition per ladder after exit is position-space again
        pos = np.asarray(pls.pos)
        assert (np.sort(pos, axis=1) == np.arange(Nc)[None]).all()


def test_pos_carry_even_odd_runs():
    spec = get_spec("toric", 3)
    Nc, B, steps, p = 4, 256, 200, 0.12
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(2), spec, p, (B,))
    )
    pls, _, n_eo, acc = _run_perm(spec, states, Nc, steps, p,
                                  exchange="even_odd")
    # both phases propose: every pair index sees nonzero acceptance
    rate = np.asarray(acc, float).mean(axis=(0, 1))
    assert (rate > 0.01).all(), rate
    e = np.asarray(n_eo, float)[steps // 2:].sum(-1).mean(axis=(0, 1))
    assert (np.diff(e) > -0.2).all(), e
