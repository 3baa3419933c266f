"""PTRC on-device log-space reduction vs an independent f64 numpy oracle.

The oracle is the direct linear-space formula from the reference
(decoders.py:638-742): Z_i = C_i * sum_n m(n) exp(n d_beta_i - beta_i l0),
C_i the mean ratio over the two shortest observed lengths, summed over all
rungs but the top.  The device path computes the same thing with
logsumexp in f32.
"""

import numpy as np
import jax.numpy as jnp

from mcmc_qec_tpu.decoders.ptdc import _ptrc_reduce


def _oracle(m_n, N_n, beta_ladder, beta_err, nq):
    m_n = m_n.astype(np.float64)
    N_n = N_n.astype(np.float64)
    B, K, Nc, _ = m_n.shape
    d_beta = beta_ladder - beta_err
    ns = np.arange(nq + 1, dtype=np.float64)
    Z = np.zeros((B, K))
    for i in range(Nc - 1):
        m = m_n[:, :, i]
        N = N_n[:, :, i]
        has = m > 0
        l_sorted = np.where(has, ns[None, None, :], nq + 10)
        l_sorted.sort(axis=-1)
        l0, l1 = l_sorted[..., 0], l_sorted[..., 1]
        bi, ki = np.meshgrid(np.arange(B), np.arange(K), indexing="ij")
        l0c = np.clip(l0.astype(int), 0, nq)
        l1c = np.clip(l1.astype(int), 0, nq)
        c0 = N[bi, ki, l0c] / np.maximum(m[bi, ki, l0c], 1.0)
        c1 = (
            N[bi, ki, l1c] / np.maximum(m[bi, ki, l1c], 1.0)
            * np.exp(-beta_ladder[i] * (l1 - l0))
        )
        C = np.where(l1 <= nq, 0.5 * (c0 + c1), c0)
        expo = ns[None, None, :] * d_beta[i] - beta_ladder[i] * l0[..., None]
        Z_i = C * np.sum(m * np.exp(np.clip(expo, -700, 700)), axis=-1)
        Z += np.where(l0 <= nq, Z_i, 0.0)
    total = Z.sum(axis=-1, keepdims=True)
    return np.where(total > 0, Z / np.maximum(total, 1e-300) * 100.0, 0.0)


def _stats_from_m(m_n, nq):
    """shortest / next_shortest the way occupancy_stats defines them."""
    has = m_n > 0
    idx = np.arange(nq + 1)
    big = nq + 1
    l0 = np.where(has, idx, big).min(axis=-1)
    l1 = np.where(has & (idx > l0[..., None]), idx, big).min(axis=-1)
    return l0, l1


def test_device_reduce_matches_f64_oracle():
    rng = np.random.default_rng(3)
    B, K, Nc, nq = 4, 4, 5, 41
    # sparse occupancy concentrated at low lengths, like real streams
    m_n = (rng.poisson(2.0, (B, K, Nc, nq + 1))
           * (rng.random((B, K, Nc, nq + 1)) < 0.3)).astype(np.int32)
    m_n[..., 25:] = 0
    N_n = np.minimum(rng.integers(0, 4, m_n.shape, dtype=np.int32), m_n)
    beta_ladder = np.linspace(1.8, 0.0, Nc)
    beta_err = 1.1
    l0, l1 = _stats_from_m(m_n, nq)
    got = np.asarray(
        _ptrc_reduce(
            jnp.asarray(m_n), jnp.asarray(N_n), jnp.asarray(l0),
            jnp.asarray(l1), jnp.asarray(beta_ladder, jnp.float32),
            jnp.float32(beta_err), nq,
        )
    )
    want = _oracle(m_n, N_n, beta_ladder, beta_err, nq)
    assert np.allclose(got, want, atol=0.25)  # f32 vs f64, percent scale


def test_empty_class_gets_zero():
    B, K, Nc, nq = 1, 4, 3, 11
    m_n = np.zeros((B, K, Nc, nq + 1), np.int32)
    N_n = np.zeros_like(m_n)
    m_n[0, 0, :, 3] = 5
    N_n[0, 0, :, 3] = 2
    l0, l1 = _stats_from_m(m_n, nq)
    got = np.asarray(
        _ptrc_reduce(
            jnp.asarray(m_n), jnp.asarray(N_n), jnp.asarray(l0),
            jnp.asarray(l1),
            jnp.asarray(np.array([1.5, 0.7, 0.0]), jnp.float32),
            jnp.float32(1.0), nq,
        )
    )
    assert got[0, 0] > 99.0
    assert np.all(got[0, 1:] == 0.0)
