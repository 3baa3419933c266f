"""Error-model samplers and parameter conversions.

Mirrors the reference's noise generators with explicit counter-based
jax.random keys (the reference uses unseeded global RNG everywhere, e.g.
toric_model.py:17, planar_model.py:18-99, rotated_surface_model.py:25-58):

- depolarizing(p): error w.p. p, uniform X/Y/Z (toric_model.py:15-24;
  equivalent to xyz(p/3, p/3, p/3), cf. generate_data.py:65).
- xyz(px, py, pz): thresholds r<pz -> Z, <pz+px -> X, <pz+px+py -> Y
  (planar_model.py:18-31, rotated_surface_model.py:25-38).
- biased(p, eta): pz = p*eta/(eta+1), px = py = p/(2*(eta+1))
  (planar_model.py:61-66, generate_data.py:79-83).
- alpha(pz_tilde, alpha): pz = pz_tilde*(1-p), px = py = pz_tilde**alpha*(1-p)
  with p = p_tilde/(1+p_tilde), p_tilde = pz_tilde + 2*pz_tilde**alpha
  (planar_model.py:79-87, generate_data.py:84-93).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import CodeSpec


def xyz_probs_from_biased(p_error: float, eta: float) -> Tuple[float, float, float]:
    pz = p_error * eta / (eta + 1.0)
    px = p_error / (2.0 * (eta + 1.0))
    return px, px, pz


def alpha_tilde_from_p(p_error: float, alpha: float) -> float:
    """Solve pz_tilde + 2*pz_tilde**alpha = p_tilde for pz_tilde
    (planar_model.py:82 uses scipy fsolve; we use bisection)."""
    p_tilde = p_error / (1.0 + p_error) if p_error < 1 else 1.0
    # p_tilde here follows planar_model.py:80: p_tilde = p/(1+p)
    lo, hi = 0.0, 1.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if mid + 2.0 * mid**alpha < p_tilde:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def xyz_probs_from_alpha(pz_tilde: float, alpha: float) -> Tuple[float, float, float]:
    p_tilde = pz_tilde + 2.0 * pz_tilde**alpha
    p = p_tilde / (1.0 + p_tilde)
    pz = pz_tilde * (1.0 - p)
    px = pz_tilde**alpha * (1.0 - p)
    return px, px, pz


def biased_alpha_equivalent(p_error: float, eta: float) -> Tuple[float, float]:
    """(pz_tilde, alpha) equivalent of biased(p, eta), as used by the PTEQ
    biased driver (generate_data.py:147-148)."""
    pz_tilde = (p_error / (1.0 + 1.0 / eta)) / (1.0 - p_error)
    alpha = np.log(pz_tilde / (2.0 * eta)) / np.log(pz_tilde)
    return pz_tilde, alpha


def sample_xyz(
    key: jax.Array,
    spec: CodeSpec,
    p_x: float,
    p_y: float,
    p_z: float,
    batch: Tuple[int, ...] = (),
) -> jax.Array:
    """Sample flat error states (batch + (nq,)) with independent per-qubit
    X/Y/Z probabilities, zeroing invalid cells (planar_model.py:39-40)."""
    r = jax.random.uniform(key, batch + (spec.nq,))
    q = jnp.zeros(batch + (spec.nq,), dtype=jnp.uint8)
    q = jnp.where(r < p_z + p_x + p_y, jnp.uint8(2), q)
    q = jnp.where(r < p_z + p_x, jnp.uint8(1), q)
    q = jnp.where(r < p_z, jnp.uint8(3), q)
    return q * jnp.asarray(spec.valid_mask)


def sample_depolarizing(
    key: jax.Array, spec: CodeSpec, p_error: float, batch: Tuple[int, ...] = ()
) -> jax.Array:
    p3 = p_error / 3.0
    return sample_xyz(key, spec, p3, p3, p3, batch)


def known_error(spec: CodeSpec) -> np.ndarray:
    """Fixed deterministic error injection — the reference's
    regression-reproduction hook (``generate_known_error``,
    rotated_surface_model.py:79-82: X at (2,2) and (1,0);
    xzzx_model.py:31-34: X at (0,1) and (1,1)).  Returns a flat (nq,) state.
    """
    if spec.family not in ("rotated", "xzzx"):
        raise ValueError(
            "known_error exists only for rotated/xzzx codes "
            "(as in the reference)"
        )
    pos = {"rotated": [(2, 2), (1, 0)], "xzzx": [(0, 1), (1, 1)]}[spec.family]
    state = np.zeros(spec.state_shape, dtype=np.uint8)
    for r, c in pos:
        state[r, c] = 1
    return state.reshape(-1)


def sample_n_random_errors(key: jax.Array, spec: CodeSpec, n: int) -> jax.Array:
    """Exactly n errors with uniform Pauli at random positions
    (toric_model.py:26-32); positions are drawn from *valid* cells only so
    planar's unused cells never eat part of the budget."""
    kp, kv = jax.random.split(key)
    valid_idx = jnp.asarray(np.flatnonzero(spec.valid_mask))
    perm = jax.random.permutation(kp, valid_idx.shape[0])
    chosen = valid_idx[perm[:n]]
    paulis = jax.random.randint(kv, (spec.nq,), 1, 4, dtype=jnp.int32).astype(jnp.uint8)
    sel = jnp.zeros((spec.nq,), dtype=jnp.uint8).at[chosen].set(1)
    return sel * paulis
