"""Independent numpy oracles implementing the reference's *formulas*
(syndrome roll-XOR rules, class parity counting) for cross-checking the
table-driven engine.  These intentionally follow the reference math
(src/toric_model.py:58-101, src/planar_model.py:134-153,
src/rotated_surface_model.py:411-420, src/xzzx_model.py:455-486) rather than
our table machinery, so they are a genuinely independent check."""

import numpy as np


def toric_syndrome_oracle(qm: np.ndarray) -> np.ndarray:
    """(2, d, d) -> (2, d, d) defect matrix via the reference's rolled XORs."""
    yz0 = np.isin(qm[0], (2, 3)).astype(int)
    yz1 = np.isin(qm[1], (2, 3)).astype(int)
    vertex = (yz0 + np.roll(yz0, 1, axis=0) + yz1 + np.roll(yz1, 1, axis=1)) % 2

    xy0 = np.isin(qm[0], (1, 2)).astype(int)
    xy1 = np.isin(qm[1], (1, 2)).astype(int)
    plaq = (xy0 + np.roll(xy0, -1, axis=1) + xy1 + np.roll(xy1, -1, axis=0)) % 2
    return np.stack([vertex, plaq])


def planar_syndrome_oracle(qm: np.ndarray):
    """(2, d, d) -> (vertex (d-1, d), plaquette (d, d-1))."""
    yz = np.isin(qm, (2, 3))
    charge_vert = yz[0][1:, :] ^ yz[0][:-1, :]
    charge_horiz = yz[1][:-1, :] ^ np.roll(yz[1][:-1, :], 1, axis=1)
    vertex = charge_vert ^ charge_horiz

    xy = np.isin(qm, (1, 2))
    flux_vert = xy[1][:, :-1] ^ np.roll(xy[1][:, :-1], 1, axis=0)
    flux_horiz = xy[0][:, 1:] ^ xy[0][:, :-1]
    plaq = flux_horiz ^ flux_vert
    return vertex.astype(np.uint8), plaq.astype(np.uint8)


def toric_eq_oracle(qm: np.ndarray) -> int:
    x1 = (np.count_nonzero(qm[0] == 1) + np.count_nonzero(qm[0] == 2)) % 2
    z1 = (np.count_nonzero(qm[0] == 3) + np.count_nonzero(qm[0] == 2)) % 2
    x2 = (np.count_nonzero(qm[1] == 1) + np.count_nonzero(qm[1] == 2)) % 2
    z2 = (np.count_nonzero(qm[1] == 3) + np.count_nonzero(qm[1] == 2)) % 2
    return x1 + z1 * 2 + x2 * 4 + z2 * 8


def planar_eq_oracle(qm: np.ndarray) -> int:
    x = (np.count_nonzero(qm[0, :, 0] == 1) + np.count_nonzero(qm[0, :, 0] == 2)) % 2
    z = (np.count_nonzero(qm[0, 0, :] == 3) + np.count_nonzero(qm[0, 0, :] == 2)) % 2
    return x + 2 * z


def rotated_eq_oracle(qm: np.ndarray) -> int:
    x = (np.count_nonzero(qm[0, :] == 1) + np.count_nonzero(qm[0, :] == 2)) % 2
    z = (np.count_nonzero(qm[:, 0] == 3) + np.count_nonzero(qm[:, 0] == 2)) % 2
    return x + 2 * z


def xzzx_eq_oracle(qm: np.ndarray) -> int:
    d = qm.shape[0]
    x_errors = np.count_nonzero(qm[0, :] == 2)
    z_errors = np.count_nonzero(qm[:, 0] == 2)
    for i in range(d):
        if i % 2 == 0:
            x_errors += qm[0, i] == 1
            z_errors += qm[i, 0] == 3
        else:
            x_errors += qm[0, i] == 3
            z_errors += qm[i, 0] == 1
    if x_errors % 2 == 0:
        return 0 if z_errors % 2 == 0 else 3
    return 1 if z_errors % 2 == 0 else 2


def orbit_states(spec, state0: np.ndarray) -> np.ndarray:
    """All states reachable from state0 by stabilizer XORs (the syndrome/class
    orbit), via GF(2) row-reduction of the stabilizer masks to an independent
    generator set.  Returns (2^k, nq) uint8."""
    masks = spec.stab_masks
    # symplectic bit rep for rank computation
    b0 = ((masks & 1) ^ ((masks >> 1) & 1)).astype(np.uint8)
    b1 = ((masks >> 1) & 1).astype(np.uint8)
    rows = np.concatenate([b0, b1], axis=1)
    gens = []
    basis = []  # (pivot, reduced_row, reduced_mask)
    for i in range(rows.shape[0]):
        r = rows[i].copy()
        m = masks[i].copy()
        for pivot, br, bm in basis:
            if r[pivot]:
                r = r ^ br
                m = m ^ bm
        if r.any():
            basis.append((int(np.argmax(r)), r, m))
            gens.append(m)
    orbit = state0[None, :].copy()
    for g in gens:
        orbit = np.concatenate([orbit, orbit ^ g], axis=0)
    return orbit


def exact_class_posterior(spec, state0, betas, np_to_class):
    """Exact per-class posterior by full orbit enumeration (small d only)."""
    from scipy.special import logsumexp

    logZ = []
    for eq in range(spec.n_classes):
        s = np_to_class(spec, state0, eq)
        orb = orbit_states(spec, s)
        nx = (orb == 1).sum(-1)
        ny = (orb == 2).sum(-1)
        nz = (orb == 3).sum(-1)
        logZ.append(logsumexp(-(betas[0] * nx + betas[1] * ny + betas[2] * nz)))
    logZ = np.array(logZ)
    w = np.exp(logZ - logZ.max())
    return w / w.sum()
