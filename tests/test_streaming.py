"""Streaming (bounded-memory) counting reduction vs materialized oracles.

The streaming module's claim (decoders/streaming.py): the bounded buffer
always holds the ``capacity`` lexicographically-smallest (rank, key) unique
chains of the whole stream, so with capacity >= #uniques all reductions are
EXACT matches of the materialized path, and with smaller capacity they
equal the truncated numpy oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_qec_tpu.decoders.counting import (
    SampleStream,
    conv_mult_valid_mask,
    occupancy_stats,
    z_direct_count,
    _weighted_length,
)
from mcmc_qec_tpu.decoders.streaming import (
    init_stream_state,
    logz_from_stream,
    occupancy_from_stream,
    streaming_scan,
)


def _replay_chunker(keys_all, nxyz_all):
    """Chunk sampler replaying pregenerated windows: keys_all
    (R, D, n_windows, W, 2), nxyz_all (R, D, n_windows, W, 3)."""
    ka = jnp.asarray(keys_all)
    na = jnp.asarray(nxyz_all)

    def chunk(idx, key):
        del key
        return idx + 1, jnp.take(ka, idx, axis=2), jnp.take(na, idx, axis=2)

    return chunk


def _random_stream(rng, R, D, steps, nq, n_distinct=40):
    """Random sample stream with plenty of key collisions; each key has a
    fixed consistent n_xyz (rank is a function of chain content)."""
    pool_keys = rng.randint(0, 2**31, size=(n_distinct, 2)).astype(np.uint32)
    pool_nxyz = rng.randint(0, max(nq // 3, 2), size=(n_distinct, 3)).astype(
        np.int32
    )
    pick = rng.randint(0, n_distinct, size=(R, D, steps))
    return pool_keys[pick], pool_nxyz[pick]


def _run_stream(keys, nxyz, *, window, capacity, rank_betas, nq,
                conv_mult=0.0, track_occupancy=True, steps=None):
    R, D, total = keys.shape[:3]
    steps = steps or total
    n_windows = -(-steps // window)
    ka = keys.reshape(R, D, n_windows, window, 2)
    na = nxyz.reshape(R, D, n_windows, window, 3)
    chunk = _replay_chunker(ka, na)
    betas = jnp.asarray(rank_betas, jnp.float32)

    def go():
        return streaming_scan(
            chunk, jnp.int32(0), jax.random.PRNGKey(0),
            steps=steps, window=window, capacity=capacity,
            rank_fn=lambda nx: _weighted_length(nx, betas),
            nq=nq, R=R, D=D, conv_mult=conv_mult,
            track_occupancy=track_occupancy,
        )

    _, st, _ = jax.jit(go)()
    return st


class TestMergeInvariant:
    def test_exact_when_capacity_suffices(self):
        rng = np.random.RandomState(0)
        R, D, steps, nq = 3, 2, 64, 30
        keys, nxyz = _random_stream(rng, R, D, steps, nq)
        betas = np.array([0.7, 1.1, 1.3], np.float32)
        st = _run_stream(keys, nxyz, window=16, capacity=128,
                         rank_betas=betas, nq=nq)
        # oracle: materialized reduction over the same samples
        stream = SampleStream(
            jnp.asarray(keys.reshape(R, D * steps, 2)),
            jnp.asarray(nxyz.reshape(R, D * steps, 3)),
        )
        logz_ref = np.asarray(z_direct_count(stream, jnp.asarray(betas)))
        logz_st = np.asarray(logz_from_stream(st))
        np.testing.assert_allclose(logz_st, logz_ref, rtol=1e-5)
        assert not np.asarray(st.overflow).any()
        # unique counts exact pre-overflow
        for i in range(R):
            uq = len({tuple(k) for k in keys[i].reshape(-1, 2)})
            assert int(st.n_unique[i]) == uq

    def test_truncation_keeps_smallest(self):
        rng = np.random.RandomState(1)
        R, D, steps, nq = 2, 2, 96, 30
        keys, nxyz = _random_stream(rng, R, D, steps, nq, n_distinct=80)
        betas = np.array([1.0, 1.0, 1.0], np.float32)
        C = 16
        st = _run_stream(keys, nxyz, window=24, capacity=C,
                         rank_betas=betas, nq=nq)
        assert np.asarray(st.overflow).all()
        for i in range(R):
            # numpy oracle: the C smallest (rank, k1, k2) unique entries
            uniq = {}
            for k, nx in zip(keys[i].reshape(-1, 2), nxyz[i].reshape(-1, 3)):
                uniq[tuple(k)] = float(np.dot(nx, betas))
            entries = sorted((r, k1, k2) for (k1, k2), r in uniq.items())
            want = entries[:C]
            got = sorted(
                (float(r), int(k1), int(k2))
                for r, k1, k2 in zip(st.r[i], st.k1[i], st.k2[i])
                if np.isfinite(r)
            )
            assert [(k1, k2) for _, k1, k2 in got] == [
                (k1, k2) for _, k1, k2 in want
            ]
            np.testing.assert_allclose(
                [r for r, _, _ in got], [r for r, _, _ in want], rtol=1e-5
            )
            # max_kept bounds what was dropped
            assert float(st.max_kept[i]) == pytest.approx(want[-1][0], rel=1e-5)

    def test_partial_final_window_masked(self):
        """steps not divisible by window: tail samples must not count."""
        rng = np.random.RandomState(2)
        R, D, nq = 2, 1, 30
        total, steps = 64, 50  # last 14 samples of the padded stream ignored
        keys, nxyz = _random_stream(rng, R, D, total, nq)
        betas = np.array([1.0, 1.0, 1.0], np.float32)
        st = _run_stream(keys, nxyz, window=16, capacity=256,
                         rank_betas=betas, nq=nq, steps=steps)
        stream = SampleStream(
            jnp.asarray(keys[:, :, :steps].reshape(R, D * steps, 2)),
            jnp.asarray(nxyz[:, :, :steps].reshape(R, D * steps, 3)),
        )
        logz_ref = np.asarray(z_direct_count(stream, jnp.asarray(betas)))
        np.testing.assert_allclose(
            np.asarray(logz_from_stream(st)), logz_ref, rtol=1e-5
        )


class TestOccupancy:
    def test_matches_materialized(self):
        rng = np.random.RandomState(3)
        R, D, steps, nq = 3, 2, 48, 30
        keys, nxyz = _random_stream(rng, R, D, steps, nq)
        # rank = total length for occupancy streams
        ones = np.array([1.0, 1.0, 1.0], np.float32)
        st = _run_stream(keys, nxyz, window=12, capacity=128,
                         rank_betas=ones, nq=nq)
        occ = occupancy_from_stream(st, nq)
        stream = SampleStream(
            jnp.asarray(keys.reshape(R, D * steps, 2)),
            jnp.asarray(nxyz.reshape(R, D * steps, 3)),
        )
        ref = occupancy_stats(stream, nq)
        np.testing.assert_array_equal(np.asarray(occ.m_n), np.asarray(ref.m_n))
        np.testing.assert_array_equal(np.asarray(occ.N_n), np.asarray(ref.N_n))
        np.testing.assert_array_equal(
            np.asarray(occ.shortest), np.asarray(ref.shortest)
        )
        np.testing.assert_array_equal(
            np.asarray(occ.next_shortest), np.asarray(ref.next_shortest)
        )
        assert np.isinf(np.asarray(occ.trunc_at)).all()

    def test_truncated_Nn_exact_below_trunc(self):
        rng = np.random.RandomState(4)
        R, D, steps, nq = 2, 2, 96, 30
        keys, nxyz = _random_stream(rng, R, D, steps, nq, n_distinct=80)
        ones = np.array([1.0, 1.0, 1.0], np.float32)
        st = _run_stream(keys, nxyz, window=24, capacity=16,
                         rank_betas=ones, nq=nq)
        occ = occupancy_from_stream(st, nq)
        stream = SampleStream(
            jnp.asarray(keys.reshape(R, D * steps, 2)),
            jnp.asarray(nxyz.reshape(R, D * steps, 3)),
        )
        ref = occupancy_stats(stream, nq)
        # m_n has no dedup and stays exact under truncation
        np.testing.assert_array_equal(np.asarray(occ.m_n), np.asarray(ref.m_n))
        for i in range(R):
            t = float(occ.trunc_at[i])
            assert np.isfinite(t)
            for n in range(int(t)):
                assert int(occ.N_n[i, n]) == int(ref.N_n[i, n])


class TestConvMult:
    def test_matches_materialized_mask(self):
        """The streaming conv_mult automaton (bounded shortest-key buffer)
        must reproduce conv_mult_valid_mask's per-step validity when the
        key buffer does not overflow."""
        rng = np.random.RandomState(5)
        R, D, steps, nq = 2, 3, 120, 30
        keys, nxyz = _random_stream(rng, R, D, steps, nq, n_distinct=25)
        betas = np.array([1.0, 1.0, 1.0], np.float32)
        conv_mult = 2.0
        # streaming result: run with huge capacity; compare final logZ with
        # the materialized valid-masked reduction over the same samples
        st = _run_stream(keys, nxyz, window=30, capacity=512,
                         rank_betas=betas, nq=nq, conv_mult=conv_mult)
        n_tot = nxyz.sum(-1).astype(np.float32)
        flat_keys = keys.reshape(R * D, steps, 2)
        flat_n = n_tot.reshape(R * D, steps)
        valid = jax.vmap(
            lambda k_, n_: conv_mult_valid_mask(
                jnp.asarray(k_), jnp.asarray(n_), conv_mult, steps
            )
        )(flat_keys, flat_n)
        valid = np.asarray(valid).reshape(R, D, steps)
        # oracle logZ over valid samples only (droplets merged per row)
        for i in range(R):
            uniq = {}
            for dd in range(D):
                for t in range(steps):
                    if valid[i, dd, t]:
                        k = tuple(keys[i, dd, t])
                        uniq.setdefault(k, float(nxyz[i, dd, t].sum()))
            want = np.logaddexp.reduce([-w for w in uniq.values()])
            assert float(logz_from_stream(st)[i]) == pytest.approx(
                want, rel=1e-5
            )


class TestSTDCStreaming:
    def test_stream_matches_materialized_statistically(self):
        """Full STDC, streaming vs materialized path, d=3 toric: same
        posterior within MC tolerance, and the streaming path with ample
        capacity never overflows."""
        from mcmc_qec_tpu.decoders import STDC
        from mcmc_qec_tpu.models import get_spec
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        spec = get_spec("toric", 3)
        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(0), spec, 0.1, (4,))
        )
        kw = dict(droplets=2, steps=600, engine="sweep", seed=3)
        d_mat = STDC(spec, states, 0.1, 0.25, stream=False, **kw)
        d_str = STDC(spec, states, 0.1, 0.25, stream=True, **kw)
        assert np.argmax(d_mat, -1).tolist() == np.argmax(d_str, -1).tolist()
        # d=3 at 600 sweeps explores the small orbit thoroughly: the two
        # estimates must be close (not identical: different RNG streams)
        assert np.abs(d_mat - d_str).max() < 12.0

    def test_stream_matches_exact_posterior(self):
        """Streaming STDC vs the exactly-enumerated d=3 posterior — the
        same bar the materialized path passes in test_decoders.py."""
        from reference_oracles import exact_class_posterior

        from mcmc_qec_tpu.decoders import STDC
        from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing
        from mcmc_qec_tpu.models import get_spec, np_to_class
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        spec = get_spec("toric", 3)
        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(1), spec, 0.1, (3,))
        )
        exact = np.stack(
            [
                exact_class_posterior(
                    spec, s, betas_depolarizing(0.1), np_to_class
                )
                for s in states
            ]
        )
        distr = STDC(spec, states, 0.1, 0.25, droplets=4, steps=4000,
                     engine="sweep", stream=True, seed=0)
        tv = 0.5 * np.abs(distr / 100.0 - exact).sum(-1)
        assert tv.max() < 0.03, tv


class TestOverflowObservability:
    """The silent-bias sources of the bounded-memory path must warn
    (ADVICE r4): Z truncation via StreamState.overflow and the conv_mult
    key-buffer overflow via ConvMultState.kovf."""

    def test_warn_helpers_fire_and_stay_silent(self):
        import warnings

        from mcmc_qec_tpu.decoders.streaming import (
            warn_conv_mult_overflow,
            warn_stream_overflow,
        )

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            # overflowed with a 3.5-nat gap over 100 samples: rel bound
            # ~3, must warn
            warn_stream_overflow(np.array([[True, False]]),
                                 np.array([[3.5, np.inf]]),
                                 np.array([[0.0, 1.0]]), 100, "STDC", 8)
            warn_conv_mult_overflow(np.array([[True]]), "STRC", 4)
        assert len(w) == 2
        assert "relative Z deficit" in str(w[0].message)
        assert "conv_mult_unique_cap" in str(w[1].message)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            # no overflow -> silent
            warn_stream_overflow(np.zeros((2, 2), bool),
                                 np.full((2, 2), np.inf),
                                 np.zeros((2, 2)), 100, "STDC", 8)
            # overflow with a negligible dropped tail (60-nat gap) -> silent
            warn_stream_overflow(np.array([[True]]), np.array([[70.0]]),
                                 np.array([[10.0]]), 200_000, "STDC", 8)
            warn_conv_mult_overflow(np.zeros((2, 2), bool), "STRC", 4)
        assert not w

    def test_stdc_stream_overflow_warns(self):
        """A capacity far below the unique-chain count must raise the Z
        truncation warning (and still decode)."""
        from mcmc_qec_tpu.decoders import STDC
        from mcmc_qec_tpu.models import get_spec
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        spec = get_spec("toric", 3)
        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(2), spec, 0.1, (2,))
        )
        with pytest.warns(RuntimeWarning, match="stream_capacity=16"):
            STDC(spec, states, 0.1, 0.25, droplets=2, steps=400,
                 engine="sweep", stream=True, stream_capacity=16, seed=0)


class TestOtherDecodersStreaming:
    def test_strc_stream_matches_materialized(self):
        from mcmc_qec_tpu.decoders import STRC
        from mcmc_qec_tpu.models import get_spec
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        spec = get_spec("toric", 3)
        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(2), spec, 0.1, (4,))
        )
        kw = dict(droplets=2, steps=1500, engine="sweep", seed=5)
        d_mat = STRC(spec, states, 0.1, 0.3, stream=False, **kw)
        d_str = STRC(spec, states, 0.1, 0.3, stream=True, **kw)
        assert np.argmax(d_mat, -1).tolist() == np.argmax(d_str, -1).tolist()
        assert np.abs(d_mat - d_str).max() < 15.0

    def test_ptdc_stream_matches_materialized(self):
        from mcmc_qec_tpu.decoders import PTDC
        from mcmc_qec_tpu.models import get_spec
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        spec = get_spec("toric", 3)
        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(3), spec, 0.1, (3,))
        )
        kw = dict(droplets=2, Nc=3, steps=3000, engine="sweep", seed=7)
        d_mat = PTDC(spec, states, 0.1, stream=False, **kw)
        d_str = PTDC(spec, states, 0.1, stream=True, **kw)
        assert np.argmax(d_mat, -1).tolist() == np.argmax(d_str, -1).tolist()
        assert np.abs(
            d_mat.astype(int) - d_str.astype(int)
        ).max() <= 12

    def test_ptdc_conv_mult_knob(self):
        """conv_mult parity on PTDC (decoders.py:156-161): a conv_mult so
        large the stop point never binds must reproduce the conv_mult=0
        run exactly (same RNG stream, every sample valid); a tiny
        conv_mult still yields a normalized distribution."""
        from mcmc_qec_tpu.decoders import PTDC
        from mcmc_qec_tpu.models import get_spec
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        spec = get_spec("toric", 3)
        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(6), spec, 0.1, (2,))
        )
        kw = dict(droplets=2, Nc=3, steps=1500, engine="sweep", seed=11,
                  stream=False)
        d_off = PTDC(spec, states, 0.1, **kw)
        d_huge = PTDC(spec, states, 0.1, conv_mult=1e9, **kw)
        np.testing.assert_array_equal(d_off, d_huge)
        d_tiny = PTDC(spec, states, 0.1, conv_mult=1e-4, **kw)
        s = d_tiny.astype(int).sum(-1)
        assert ((s >= 97) & (s <= 100)).all()

    def test_ptrc_stream_matches_materialized(self):
        from mcmc_qec_tpu.decoders import PTRC
        from mcmc_qec_tpu.models import get_spec
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        spec = get_spec("toric", 3)
        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(4), spec, 0.1, (3,))
        )
        kw = dict(droplets=2, Nc=3, steps=3000, engine="sweep", seed=9)
        d_mat = PTRC(spec, states, 0.1, stream=False, **kw)
        d_str = PTRC(spec, states, 0.1, stream=True, **kw)
        assert np.argmax(d_mat, -1).tolist() == np.argmax(d_str, -1).tolist()
        assert np.abs(
            d_mat.astype(int) - d_str.astype(int)
        ).max() <= 15
