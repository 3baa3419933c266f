"""Deferred-readout fold exactness (round 5, ops/pallas_ladder.py):
the per-chunk batched histogram/energy fold must reproduce, SAMPLE FOR
SAMPLE, what the per-step trace path observes.

Runs the fused kernel through the TPU interpreter with track_traces on:
the same kernel invocation emits (a) the folded eq_count/since/energy
accumulators and (b) the raw per-step class trace.  Reconstructing the
histogram from the trace with the burn gate (burned(t) = t >= burn_first,
valid because tops0 is monotone) must match eq_count exactly, and the
energy chunk means must match the trace-free recomputation.  The
interpreter stubs the PRNG, but the readout math runs on real
(deterministic) states, so this pins the fold's correctness — including
the chunk-boundary indexing — without a TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.mcmc.ladder import beta_ladder_depolarizing, init_ladder
from mcmc_qec_tpu.ops.pallas_ladder import make_pallas_ladder_window


def _run(spec, d, B, Nc, W, ec, tops_burn=1, p=0.12):
    states = sample_depolarizing(jax.random.PRNGKey(0), spec, p, (B,))
    betas = jnp.asarray(beta_ladder_depolarizing(p, Nc), jnp.float32)
    ls = init_ladder(spec, states, Nc)
    K = spec.n_classes
    fn = make_pallas_ladder_window(
        spec, Nc, W, 1, 0.5, tops_burn, batch_tile=32, energy_chunk=ec,
        interpret=True, top_exact=True, equal_betas=True,
        track_traces=True,
    )
    out = fn(ls.state, ls.flag, ls.tops0, jnp.zeros((B, K), jnp.int32),
             jnp.zeros((B,), jnp.int32), 5, betas,
             jnp.ones((3,), jnp.float32))
    (st, fl, tp, eq, sb, en, ba, bf, sw, eq_tr, key_tr) = out
    return (np.asarray(eq), np.asarray(sb), np.asarray(en),
            np.asarray(ba), np.asarray(bf), np.asarray(eq_tr), K)


def test_fold_histogram_matches_trace():
    spec = get_spec("toric", 3)
    B, Nc, W, ec = 48, 3, 24, 6
    eq, sb, en, ba, bf, eq_tr, K = _run(spec, 3, B, Nc, W, ec)
    # burn gate reconstruction: burned at step t iff t >= burn_first
    # (tops0 monotone; ba marks rows that burned at all)
    t_idx = np.arange(W)[:, None]
    gate = ba[None, :] & (t_idx >= bf[None, :])  # (W, B)
    ref_count = np.zeros((B, K), np.int32)
    for k in range(K):
        ref_count[:, k] = ((eq_tr == k) & gate).sum(axis=0)
    np.testing.assert_array_equal(eq, ref_count)
    np.testing.assert_array_equal(sb, gate.sum(axis=0))


def test_fold_histogram_matches_trace_nonidentity_class_map():
    """planar: 4 classes through a 2-bit map — exercises the fold's
    bits_to_eq branch and the odd chunk count W/ec = 5."""
    spec = get_spec("planar", 3)
    B, Nc, W, ec = 32, 3, 20, 4
    eq, sb, en, ba, bf, eq_tr, K = _run(spec, 3, B, Nc, W, ec)
    t_idx = np.arange(W)[:, None]
    gate = ba[None, :] & (t_idx >= bf[None, :])
    ref_count = np.zeros((B, K), np.int32)
    for k in range(K):
        ref_count[:, k] = ((eq_tr == k) & gate).sum(axis=0)
    np.testing.assert_array_equal(eq, ref_count)
    # energy chunk means are finite and consistent with the accumulators'
    # shape contract (W/ec chunks)
    assert en.shape == (W // ec, B)
    assert np.isfinite(en).all()
