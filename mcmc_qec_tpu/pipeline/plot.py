"""Plotting: lattice/error visualization and failure-rate curves.

Replaces the reference's per-code ``plot`` methods (toric_model.py:103-171,
planar_model.py:155-216, rotated_surface_model.py:133-195) and the analysis
plots of plot_uncorrelated.py:200-301 — headless-safe (Agg), no
``plt.show()`` blocking (the reference's rotated ``syndrome()``
unconditionally pops a window, rotated_surface_model.py:131)."""

from __future__ import annotations

from typing import Dict, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..models import defect_array, np_syndrome
from ..models.base import CodeSpec

_PAULI_COLORS = {1: "tab:red", 2: "blueviolet", 3: "tab:blue"}
_PAULI_NAMES = {1: "X", 2: "Y", 3: "Z"}


def plot_state(spec: CodeSpec, state: np.ndarray, path: str,
               title: Optional[str] = None) -> None:
    """Draw the lattice, errors, and defects; save to ``path``."""
    d = spec.size
    state = np.asarray(state).reshape(spec.state_shape)
    fig, ax = plt.subplots(figsize=(6, 6))
    for i in range(d):
        ax.axhline(-i, color="k", lw=0.6, alpha=0.4)
        ax.axvline(i, color="k", lw=0.6, alpha=0.4)

    def qubit_xy(idx):
        if len(spec.state_shape) == 3:
            l, r, c = np.unravel_index(idx, spec.state_shape)
            # layer 0 on vertical edges, layer 1 on horizontal edges
            return (c + 0.5 * l, -(r + 0.5 * (1 - l)))
        r, c = np.unravel_index(idx, spec.state_shape)
        return (c, -r)

    flat = state.reshape(-1)
    for idx in range(spec.nq):
        x, y = qubit_xy(idx)
        if spec.valid_mask[idx]:
            ax.plot(x, y, "o", mfc="white", mec="k", ms=10, zorder=2)
    for v in (1, 2, 3):
        pts = [qubit_xy(i) for i in np.flatnonzero(flat == v)]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, "o", color=_PAULI_COLORS[v], ms=10,
                    label=f"{_PAULI_NAMES[v]} error", zorder=3)

    syn = np_syndrome(spec, flat)
    if spec.family == "planar":
        from ..models.planar import planar_defect_arrays

        vertex, plaq = planar_defect_arrays(spec, syn)
        defect_pts = [(c, -(r + 0.5)) for r, c in np.argwhere(vertex)]
        defect_pts += [(c + 0.5, -r) for r, c in np.argwhere(plaq)]
    else:
        darr = defect_array(spec, syn)
        defect_pts = []
        for pos in np.argwhere(darr):
            if len(pos) == 3:
                l, r, c = pos
                defect_pts.append((c + 0.5 * l, -(r + 0.5 * l)))
            else:
                r, c = pos
                defect_pts.append((c - 0.5, -(r - 0.5)))
    for x, y in defect_pts:
        ax.plot(x, y, "s", color="orange", ms=6, zorder=4)

    ax.set_aspect("equal")
    ax.axis("off")
    if title:
        ax.set_title(title)
    if any(flat):
        ax.legend(loc="upper right", fontsize=8)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_success_rates(curves: Dict[str, Dict[float, float]], path: str,
                       ylabel: str = "success rate") -> None:
    """Success/failure-rate curves vs p (plot_uncorrelated.py:200-301);
    ``curves`` maps label -> {p: rate}."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, curve in curves.items():
        ps = sorted(curve)
        ax.plot(ps, [curve[p] for p in ps], "o-", label=label)
    ax.set_xlabel("physical error rate p")
    ax.set_ylabel(ylabel)
    ax.grid(alpha=0.3)
    ax.legend()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
