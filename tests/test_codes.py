"""Unit tests for the table-driven code specs: algebraic invariants plus
cross-checks against independent numpy oracles of the reference formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import (
    get_spec,
    np_count_errors,
    np_eq_class,
    np_syndrome,
    np_to_class,
)
from mcmc_qec_tpu.models.planar import planar_defect_arrays
from mcmc_qec_tpu.ops import (
    all_class_states,
    apply_stabilizers_uniform,
    count_errors,
    count_errors_xyz,
    eq_class,
    syndrome,
    to_class,
)

from reference_oracles import (
    planar_eq_oracle,
    planar_syndrome_oracle,
    rotated_eq_oracle,
    toric_eq_oracle,
    toric_syndrome_oracle,
    xzzx_eq_oracle,
)

FAMILIES = [("toric", 5), ("planar", 5), ("rotated", 5), ("xzzx", 5),
            ("toric", 3), ("planar", 4), ("rotated", 7), ("xzzx", 7)]


def random_state(spec, rng, batch=()):
    s = rng.randint(0, 4, size=batch + (spec.nq,)).astype(np.uint8)
    return s * spec.valid_mask


@pytest.mark.parametrize("family,d", FAMILIES)
def test_syndrome_invariant_under_stabilizers(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(0)
    state = random_state(spec, rng)
    syn0 = np_syndrome(spec, state)
    for s in range(spec.n_stabs):
        syn = np_syndrome(spec, state ^ spec.stab_masks[s])
        assert np.array_equal(syn, syn0), f"stab {s} changed syndrome"


@pytest.mark.parametrize("family,d", FAMILIES)
def test_eq_class_invariant_under_stabilizers(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(1)
    state = random_state(spec, rng)
    eq0 = np_eq_class(spec, state)
    for s in range(spec.n_stabs):
        assert np_eq_class(spec, state ^ spec.stab_masks[s]) == eq0


@pytest.mark.parametrize("family,d", FAMILIES)
def test_logicals_preserve_syndrome_and_move_class(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(2)
    state = random_state(spec, rng)
    syn0 = np_syndrome(spec, state)
    seen = set()
    for delta in range(1 << spec.n_class_bits):
        mask = spec.class_delta_masks[delta]
        new = state ^ mask
        assert np.array_equal(np_syndrome(spec, new), syn0)
        seen.add(int(np_eq_class(spec, new)))
    assert len(seen) == spec.n_classes


@pytest.mark.parametrize("family,d", FAMILIES)
def test_to_class(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(3)
    state = random_state(spec, rng)
    syn0 = np_syndrome(spec, state)
    for eq in range(spec.n_classes):
        new = np_to_class(spec, state, eq)
        assert np_eq_class(spec, new) == eq
        assert np.array_equal(np_syndrome(spec, new), syn0)
    # device version
    stacked = np.asarray(all_class_states(spec, jnp.asarray(state)))
    for eq in range(spec.n_classes):
        assert np_eq_class(spec, stacked[eq]) == eq
        assert np.array_equal(np_syndrome(spec, stacked[eq]), syn0)


@pytest.mark.parametrize("d", [3, 5])
def test_toric_syndrome_matches_reference_formula(d):
    spec = get_spec("toric", d)
    rng = np.random.RandomState(4)
    for _ in range(10):
        state = random_state(spec, rng)
        ours = np_syndrome(spec, state).reshape(2, d, d)
        oracle = toric_syndrome_oracle(state.reshape(2, d, d))
        assert np.array_equal(ours, oracle)


@pytest.mark.parametrize("d", [4, 5])
def test_planar_syndrome_matches_reference_formula(d):
    spec = get_spec("planar", d)
    rng = np.random.RandomState(5)
    for _ in range(10):
        state = random_state(spec, rng)
        flat = np_syndrome(spec, state)
        vertex, plaq = planar_defect_arrays(spec, flat)
        ov, op_ = planar_syndrome_oracle(state.reshape(2, d, d))
        assert np.array_equal(vertex, ov)
        assert np.array_equal(plaq, op_)


@pytest.mark.parametrize(
    "family,d,oracle",
    [
        ("toric", 5, toric_eq_oracle),
        ("planar", 5, planar_eq_oracle),
        ("rotated", 5, rotated_eq_oracle),
        ("xzzx", 5, xzzx_eq_oracle),
    ],
)
def test_eq_class_matches_reference_formula(family, d, oracle):
    spec = get_spec(family, d)
    rng = np.random.RandomState(6)
    for _ in range(50):
        state = random_state(spec, rng)
        shaped = state.reshape(spec.state_shape)
        assert np_eq_class(spec, state) == oracle(shaped)


@pytest.mark.parametrize("family,d", [("toric", 5), ("planar", 5), ("xzzx", 5)])
def test_device_ops_match_numpy(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(7)
    states = random_state(spec, rng, batch=(8,))
    js = jnp.asarray(states)
    assert np.array_equal(np.asarray(syndrome(spec, js)), np_syndrome(spec, states))
    assert np.array_equal(np.asarray(eq_class(spec, js)), np_eq_class(spec, states))
    assert np.array_equal(np.asarray(count_errors(js)), np_count_errors(spec, states))
    nxyz = np.asarray(count_errors_xyz(js))
    for p, v in enumerate((1, 2, 3)):
        assert np.array_equal(nxyz[:, p], (states == v).sum(-1))
    eqs = jnp.asarray(rng.randint(0, spec.n_classes, size=(8,)))
    moved = np.asarray(to_class(spec, js, eqs))
    assert np.array_equal(np_eq_class(spec, moved), np.asarray(eqs))


@pytest.mark.parametrize("family,d", [("toric", 3), ("planar", 5), ("rotated", 5)])
def test_apply_stabilizers_uniform(family, d):
    spec = get_spec(family, d)
    rng = np.random.RandomState(8)
    state = random_state(spec, rng, batch=(4,))
    key = jax.random.PRNGKey(0)
    out = np.asarray(apply_stabilizers_uniform(spec, jnp.asarray(state), key, 0.5))
    assert np.array_equal(np_syndrome(spec, out), np_syndrome(spec, state))
    assert np.array_equal(np_eq_class(spec, out), np_eq_class(spec, state))
    assert not np.array_equal(out, state)  # overwhelmingly likely


@pytest.mark.parametrize("family,d", FAMILIES)
def test_coloring_is_conflict_free(family, d):
    spec = get_spec(family, d)
    for color in spec.color_stabs:
        used = set()
        for s in color:
            if s == spec.n_stabs:
                continue
            for q, o in zip(spec.stab_qubits[s], spec.stab_ops[s]):
                if o != 0:
                    assert q not in used, f"color shares qubit {q}"
                    used.add(q)
    # every stabilizer appears exactly once
    flat = spec.color_stabs.reshape(-1)
    real = flat[flat < spec.n_stabs]
    assert sorted(real.tolist()) == list(range(spec.n_stabs))


@pytest.mark.parametrize("family,d", FAMILIES)
def test_valid_mask_consistency(family, d):
    spec = get_spec(family, d)
    # stabilizers and logicals never touch invalid qubits
    for s in range(spec.n_stabs):
        for q, o in zip(spec.stab_qubits[s], spec.stab_ops[s]):
            if o != 0:
                assert spec.valid_mask[q] == 1
    for mask in spec.class_delta_masks:
        assert np.all(mask[spec.valid_mask == 0] == 0)


@pytest.mark.parametrize("family,d", [("toric", 13), ("planar", 13),
                                      ("rotated", 13), ("xzzx", 13),
                                      ("toric", 19)])
def test_large_d_specs_build_and_sweep(family, d):
    """Scalability: spec construction and one sweep at production sizes."""
    from mcmc_qec_tpu.ops import make_sweep_stepper
    from mcmc_qec_tpu.ops.dense_sweep import make_dense_sweep
    from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing

    spec = get_spec(family, d)
    assert spec.color_stabs.shape[0] <= 16, "coloring should stay small"
    flat = spec.color_stabs.reshape(-1)
    assert sorted(flat[flat < spec.n_stabs].tolist()) == list(range(spec.n_stabs))
    state = jnp.zeros((4, spec.nq), jnp.uint8)
    betas = jnp.asarray(betas_depolarizing(0.1), jnp.float32)
    out1 = make_sweep_stepper(spec)(state, jax.random.PRNGKey(0), betas)
    out2 = make_dense_sweep(spec)(state, jax.random.PRNGKey(0), betas)
    # sweeps from the all-zero state stay inside the trivial sector
    assert np.all(np_syndrome(spec, np.asarray(out1)) == 0)
    assert np.all(np_syndrome(spec, np.asarray(out2)) == 0)
