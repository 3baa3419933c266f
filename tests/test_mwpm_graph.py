"""MWPM graph layer: corrections must reproduce the syndrome exactly, and
class-constrained solutions must cover all four classes."""

import numpy as np
import pytest

import jax

from mcmc_qec_tpu.models import get_spec, np_eq_class, np_syndrome
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.matching import (
    class_sorted_mwpm,
    enhanced_mwpm,
    mwpm_correction,
    regular_mwpm,
)


def _random_states(family, d, p, n, seed=0):
    spec = get_spec(family, d)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(seed), spec, p, (n,))
    )
    return spec, states


@pytest.mark.parametrize("family,d", [("planar", 5), ("planar", 7), ("planar", 4)])
def test_mwpm_correction_matches_syndrome_planar(family, d):
    spec, states = _random_states(family, d, 0.12, 12)
    for s in states:
        corr = mwpm_correction(spec, s).reshape(-1)
        assert np.array_equal(np_syndrome(spec, corr), np_syndrome(spec, s)), (
            "correction must reproduce the syndrome"
        )


@pytest.mark.parametrize("d", [3, 5, 7])
def test_mwpm_correction_matches_syndrome_toric(d):
    # the reference's toric MWPM path is broken (mwpm.py:61); ours works
    spec, states = _random_states("toric", d, 0.1, 12, seed=1)
    for s in states:
        corr = mwpm_correction(spec, s).reshape(-1)
        assert np.array_equal(np_syndrome(spec, corr), np_syndrome(spec, s))


@pytest.mark.parametrize("d", [4, 5, 7])
def test_class_sorted_mwpm(d):
    spec, states = _random_states("planar", d, 0.12, 8, seed=2)
    for s in states:
        seeds = class_sorted_mwpm(spec, s)
        syn0 = np_syndrome(spec, s)
        for eq in range(4):
            assert np_eq_class(spec, seeds[eq]) == eq
            assert np.array_equal(np_syndrome(spec, seeds[eq]), syn0)


def test_class_sorted_empty_syndrome():
    spec = get_spec("planar", 5)
    s = np.zeros(spec.nq, dtype=np.uint8)
    seeds = class_sorted_mwpm(spec, s)
    for eq in range(4):
        assert np_eq_class(spec, seeds[eq]) == eq


def test_regular_and_enhanced_mwpm_decode_low_p():
    """At very low p the MWPM class should equal the true class nearly always."""
    spec, states = _random_states("planar", 7, 0.03, 20, seed=3)
    correct_reg = 0
    correct_enh = 0
    for s in states:
        true_eq = int(np_eq_class(spec, s))
        correct_reg += regular_mwpm(spec, s) == true_eq
        correct_enh += enhanced_mwpm(spec, s, seed=0) == true_eq
    assert correct_reg >= 17
    assert correct_enh >= 17


def test_mwpm_is_minimal_weight():
    """Unconstrained correction must not weigh more than the true error."""
    spec, states = _random_states("planar", 5, 0.1, 20, seed=4)
    for s in states:
        corr = mwpm_correction(spec, s)
        # MWPM minimizes per-layer path length; the total correction weight
        # should not exceed the error weight except for Y-coupling effects.
        assert (corr != 0).sum() <= max((s != 0).sum() * 2, 2)


def test_random_pairing_solve():
    """random_pairing produces a valid (suboptimal) correction
    (mwpm.py:33-50, 408-415)."""
    spec, states = _random_states("planar", 5, 0.15, 5, seed=9)
    for s in states:
        corr = mwpm_correction(spec, s, random_pairing=True, seed=3)
        assert np.array_equal(
            np_syndrome(spec, corr.reshape(-1)), np_syndrome(spec, s)
        )


def test_enhanced_mwpm_all_models():
    spec, states = _random_states("planar", 5, 0.08, 6, seed=10)
    for s in states:
        for model, kw in [("depolarizing", {}), ("uncorrelated", {}),
                          ("biased", {"p_xyz": np.array([0.02, 0.02, 0.1])})]:
            eq = enhanced_mwpm(spec, s, model=model, seed=0, **kw)
            assert 0 <= eq < 4


def test_class_sorted_mwpm_batch_matches_sequential():
    """Thread-pooled warm starts must equal the sequential loop exactly —
    also exercises concurrent native solves (the matcher holds no shared
    state across instances)."""
    from mcmc_qec_tpu.matching import class_sorted_mwpm_batch

    spec, states = _random_states("planar", 7, 0.12, 48, seed=3)
    batched = class_sorted_mwpm_batch(spec, states, max_workers=8)
    seq = np.stack([class_sorted_mwpm(spec, s) for s in states])
    np.testing.assert_array_equal(batched, seq)
    # every seed matches its syndrome and class
    for b in range(len(states)):
        syn = np_syndrome(spec, states[b])
        for eq in range(4):
            assert np.array_equal(np_syndrome(spec, batched[b, eq]), syn)
            assert int(np_eq_class(spec, batched[b, eq])) == eq


def test_regular_mwpm_batch_matches_sequential():
    from mcmc_qec_tpu.matching import regular_mwpm_batch

    spec, states = _random_states("planar", 5, 0.1, 32, seed=4)
    batched = regular_mwpm_batch(spec, states, max_workers=8)
    seq = np.array([regular_mwpm(spec, s) for s in states])
    np.testing.assert_array_equal(batched, seq)
