"""Error-based PT convergence criterion ("felkriteriet").

Vectorized over the syndrome batch with prefix sums, replacing the per-step
O(T) quarter averages of the reference (decoders.py:93-105,
decoders_biasednoise.py:79-90, 226-237): compare the mean bottom-chain
energy over the 2nd quarter of the post-burn trace with the 4th quarter;
accept when |Q2 - Q4| < eps.
"""

from __future__ import annotations

import numpy as np


def quarter_means(trace_cumsum: np.ndarray, burn_start: np.ndarray, length: np.ndarray):
    """Q2/Q4 means of per-element post-burn traces.

    trace_cumsum: (T+1, B) cumulative sums of the full energy trace
    burn_start:   (B,) index of the first post-burn step
    length:       (B,) number of post-burn steps recorded (l = since_burn+1)
    Returns (q2, q4, valid) arrays of shape (B,).
    """
    l = np.maximum(length, 0)
    i0 = burn_start
    a2, b2 = i0 + l // 4, i0 + l // 2
    a4, b4 = i0 + (3 * l) // 4, i0 + l
    T = trace_cumsum.shape[0] - 1
    a2c, b2c = np.clip(a2, 0, T), np.clip(b2, 0, T)
    a4c, b4c = np.clip(a4, 0, T), np.clip(b4, 0, T)
    cols = np.arange(trace_cumsum.shape[1])
    n2 = np.maximum(b2c - a2c, 1)
    n4 = np.maximum(b4c - a4c, 1)
    q2 = (trace_cumsum[b2c, cols] - trace_cumsum[a2c, cols]) / n2
    q4 = (trace_cumsum[b4c, cols] - trace_cumsum[a4c, cols]) / n4
    valid = (b2c > a2c) & (b4c > a4c)
    return q2, q4, valid


def error_based_accept(trace_cumsum, burn_start, length, eps: float):
    """True where |Q2 - Q4| < eps (the reference's accept condition,
    decoders.py:100-105)."""
    q2, q4, valid = quarter_means(trace_cumsum, burn_start, length)
    return valid & (np.abs(q2 - q4) < eps)
