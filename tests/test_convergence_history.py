"""Bounded-memory convergence automaton (EnergyHistory).

The reference preallocates the full per-step energy trace (decoders.py:39-42,
~3.6 GB at its 5e7-step cap); EnergyHistory keeps prefix sums at at most
``max_rows`` group boundaries, halving the retained edges when the cap is
hit.  Below the cap it must be bit-identical to the unbounded windowed
prefix-sum automaton; above it, retained boundary values must stay exact
(compression only DROPS boundaries) and host memory must stay O(B *
max_rows) for any run length.
"""

import numpy as np

from mcmc_qec_tpu.decoders.convergence import EnergyHistory, error_based_accept


def _windowed_cumsum(windows):
    """The round-2 unbounded automaton's accumulation: per window,
    base + np.cumsum(window) (pteq.py's original cum update)."""
    B = windows[0].shape[1]
    rows = [np.zeros((1, B))]
    for w in windows:
        rows.append(rows[-1][-1] + np.cumsum(w, axis=0))
    return np.concatenate(rows, axis=0)  # (T+1, B)


def test_bit_identical_below_cap():
    rng = np.random.RandomState(0)
    B = 16
    windows = [rng.rand(25, B) * 4 for _ in range(12)]  # 300 chunks < cap
    hist = EnergyHistory(B, max_rows=4096)
    for w in windows:
        hist.append(w)
    oracle = _windowed_cumsum(windows)
    assert hist.span == 1
    assert np.array_equal(hist.cum[: hist.n_rows + 1], oracle)  # bit-exact

    burn = rng.randint(0, 100, B)
    length = rng.randint(0, 200, B)
    for eps in (0.01, 0.1, 1.0):
        np.testing.assert_array_equal(
            hist.accept(burn, length, eps),
            error_based_accept(oracle, burn, length, eps),
        )


def test_compression_keeps_exact_boundary_values():
    rng = np.random.RandomState(1)
    B, cap = 4, 64
    windows = [rng.rand(37, B) for _ in range(90)]  # 3330 chunks >> cap
    hist = EnergyHistory(B, max_rows=cap)
    for w in windows:
        hist.append(w)
    assert hist.span > 1
    assert cap // 2 < hist.n_rows <= cap
    # retained edges must equal an independent accumulation of the full
    # trace at those chunk indices (compression is index selection plus
    # tail top-up, so only group-sum rounding differs — not O(span) error)
    full = np.concatenate(windows, axis=0)
    edges = hist.ccnt[: hist.n_rows + 1]
    assert edges[0] == 0 and edges[-1] == full.shape[0]
    assert np.all(np.diff(edges) > 0) and np.max(np.diff(edges)) <= hist.span
    oracle = np.zeros((full.shape[0] + 1, B))
    np.cumsum(full, axis=0, out=oracle[1:])
    np.testing.assert_allclose(
        hist.cum[: hist.n_rows + 1], oracle[edges], rtol=1e-12
    )


def test_compressed_accept_agrees_away_from_threshold():
    """Quarter boundaries snap to group edges (<= 1/max_rows of the span);
    for eps clearly above/below the true |Q2-Q4| gap the decision must
    match the unbounded automaton."""
    rng = np.random.RandomState(2)
    B = 8
    windows = [2.0 + rng.rand(50, B) for _ in range(80)]  # 4000 chunks
    bounded = EnergyHistory(B, max_rows=128)
    for w in windows:
        bounded.append(w)
    oracle = _windowed_cumsum(windows)
    burn = rng.randint(0, 500, B)
    length = np.full(B, 3000)
    # stationary trace: |Q2-Q4| is O(1/sqrt(n)) ~ 0.02; test far from it
    for eps, expect in ((1.0, True), (1e-6, False)):
        got = bounded.accept(burn, length, eps)
        ref = error_based_accept(oracle, burn, length, eps)
        np.testing.assert_array_equal(got, ref)
        assert got.all() == expect


def test_memory_bounded_at_production_scale():
    """VERDICT r2 task 3 'done' bar: B=2048, max_steps=1M (250k chunks at
    energy_chunk=4) must stay under 100 MB of host memory."""
    B, cap = 2048, 4096
    hist = EnergyHistory(B, max_rows=cap)
    w = np.ones((250, B))  # one window = 1000 steps / C=4
    for _ in range(1000):  # 1M steps
        hist.append(w)
    assert hist.ccnt[hist.n_rows] == 250_000
    assert hist.nbytes < 100 * 2**20, f"{hist.nbytes / 2**20:.1f} MB"
    # constant trace: Q2 == Q4 exactly, accept at any eps
    assert hist.accept(np.zeros(B, int), np.full(B, 200_000), 1e-9).all()


def test_snapshot_restore_and_column_selection():
    rng = np.random.RandomState(3)
    B = 6
    hist = EnergyHistory(B, max_rows=32)
    for _ in range(20):
        hist.append(rng.rand(11, B))
    snap = {k: v.copy() if hasattr(v, "copy") else v
            for k, v in hist.snapshot().items()}
    h2 = EnergyHistory.restore(snap, max_rows=32)
    burn, length = np.zeros(B, int), np.full(B, 150)
    np.testing.assert_array_equal(
        h2.accept(burn, length, 0.05), hist.accept(burn, length, 0.05)
    )
    # appending after restore continues identically
    more = rng.rand(11, B)
    hist.append(more.copy())
    h2.append(more.copy())
    np.testing.assert_array_equal(
        h2.cum[: h2.n_rows + 1], hist.cum[: hist.n_rows + 1]
    )
    # batch compaction keeps selected columns' history
    sel = np.array([4, 1])
    full = hist.cum[: hist.n_rows + 1].copy()
    hist.select_columns(sel)
    np.testing.assert_array_equal(hist.cum[: hist.n_rows + 1], full[:, sel])


def test_pteq_with_tiny_history_cap_still_decodes():
    """End to end: a cap small enough to force many compressions must not
    change what PTEQ converges to on an exactly-enumerable instance."""
    import jax

    from mcmc_qec_tpu.decoders import PTEQ, PTEQConfig
    from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing
    from mcmc_qec_tpu.models import get_spec, np_to_class
    from mcmc_qec_tpu.models.noise import sample_depolarizing
    from reference_oracles import exact_class_posterior

    spec = get_spec("toric", 3)
    s0 = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(5), spec, 0.1, (1,))
    )[0]
    exact = exact_class_posterior(
        spec, s0, betas_depolarizing(0.1), np_to_class
    )
    res = PTEQ(
        spec, np.tile(s0[None], (8, 1)), 0.1,
        PTEQConfig(max_steps=6000, window=200, TOPS=20, SEQ=3, iters=2,
                   engine="sweep", cum_rows_cap=8),
        seed=3,
    )
    mean_distr = res.distribution.mean(axis=0) / 100.0
    # this instance's top two classes are nearly tied (0.299 vs 0.295):
    # accept either, plus a TV bound like the sweep-engine exactness test
    assert np.argmax(mean_distr) in np.argsort(exact)[-2:]
    assert 0.5 * np.abs(exact - mean_distr).sum() < 0.2
