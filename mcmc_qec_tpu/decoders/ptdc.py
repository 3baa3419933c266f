"""PTDC / PTRC: parallel-tempering sampled counting decoders
(decoders.py:138-233, 584-742).

Like STDC/STRC but samples come from a full PT ladder per class — every rung
contributes observations each step (decoders.py:146-153, 597-623), and the
step budget is divided by Nc (decoders.py:199, 669).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import CodeSpec
from ..mcmc.ladder import (
    beta_ladder_depolarizing,
    betas_depolarizing,
    init_ladder,
    make_ladder_step,
)
from ..ops.pauli import all_class_states, count_errors_xyz, make_hash_mults, pack_key
from .counting import SampleStream, occupancy_stats, z_direct_count


@functools.lru_cache(maxsize=None)
def _get_pt_sampler(spec: CodeSpec, Nc: int, steps: int, iters: int,
                    engine: str = "literal"):
    """Sampler over (B*K) ladders recording every rung each step."""
    ladder_step = make_ladder_step(spec, Nc, iters, p_logical=0.0,
                                   engine=engine)
    mults = jnp.asarray(make_hash_mults(spec))

    def run(ls_state, ls_flag, ls_tops, key, betas_ladder):
        from ..mcmc.ladder import LadderState

        ls = LadderState(ls_state, ls_flag, ls_tops)

        def body(carry, k):
            ls = carry
            ls, _, _, _ = ladder_step(ls, k, betas_ladder)
            keys_ = pack_key(spec, ls.state, mults)  # (N, Nc, 2)
            nxyz = count_errors_xyz(ls.state)  # (N, Nc, 3)
            return ls, (keys_, nxyz)

        ks = jax.random.split(key, steps)
        ls, (keys_, nxyz) = jax.lax.scan(body, ls, ks)
        # (steps, N, Nc, .) -> (N, Nc, steps, .)
        keys_ = jnp.moveaxis(keys_, 0, 2)
        nxyz = jnp.moveaxis(nxyz, 0, 2)
        return keys_, nxyz

    return jax.jit(run)


def _pt_stream(
    spec: CodeSpec,
    init_states: np.ndarray,
    p_sampling: float,
    Nc: int,
    steps: int,
    droplets: int,
    iters: int,
    seed: int,
    engine: str = "literal",
):
    """Run droplet PT ladders for every (syndrome, class); returns streams
    with axes (B, K, Nc, droplets*steps)."""
    if init_states.ndim == 2:
        js = jnp.asarray(init_states, jnp.uint8)
        seeds = jax.vmap(lambda s: all_class_states(spec, s))(js)  # (B,K,nq)
    else:
        seeds = jnp.asarray(init_states, jnp.uint8)
    B, K, nq = seeds.shape
    flat = jnp.broadcast_to(
        seeds[:, :, None, :], (B, K, droplets, nq)
    ).reshape(B * K * droplets, nq)
    ls = init_ladder(spec, flat, Nc)
    sampler = _get_pt_sampler(spec, Nc, steps, iters, engine)
    ladder = beta_ladder_depolarizing(p_sampling, Nc)
    keys_, nxyz = sampler(
        ls.state, ls.flag, ls.tops0, jax.random.PRNGKey(seed),
        jnp.asarray(ladder, jnp.float32),
    )
    # (B*K*D, Nc, steps, .) -> (B, K, Nc, D*steps, .)
    keys_ = keys_.reshape(B, K, droplets, Nc, steps, 2)
    nxyz = nxyz.reshape(B, K, droplets, Nc, steps, 3)
    keys_ = jnp.moveaxis(keys_, 2, 3).reshape(B, K, Nc, droplets * steps, 2)
    nxyz = jnp.moveaxis(nxyz, 2, 3).reshape(B, K, Nc, droplets * steps, 3)
    return SampleStream(keys_, nxyz), ladder


def PTDC(
    spec: CodeSpec,
    init_states: np.ndarray,
    p_error: float,
    p_sampling: Optional[float] = None,
    droplets: int = 4,
    Nc: Optional[int] = None,
    steps: int = 20000,
    seed: int = 0,
    engine: str = "literal",
) -> np.ndarray:
    """Direct counting over PT samples (decoders.py:168-233).  All rungs'
    visits enter one unique-chain set per class; Z = sum_unique
    exp(-beta_err n).  Returns uint8 percentages like the reference
    (decoders.py:233)."""
    p_sampling = p_sampling or p_error
    Nc = Nc or spec.size
    steps_eff = steps // Nc
    stream, _ = _pt_stream(
        spec, init_states, p_sampling, Nc, steps_eff, droplets, 10, seed,
        engine,
    )
    B, K = stream.keys.shape[:2]
    # merge rung axis into the sample axis: dedup across the whole ladder
    merged = SampleStream(
        stream.keys.reshape(B, K, -1, 2), stream.n_xyz.reshape(B, K, -1, 3)
    )
    logz = z_direct_count(merged, jnp.asarray(betas_depolarizing(p_error), jnp.float32))
    distr = jax.nn.softmax(logz, axis=-1) * 100.0
    return np.asarray(distr).astype(np.uint8)


def PTRC(
    spec: CodeSpec,
    init_states: np.ndarray,
    p_error: float,
    p_sampling: Optional[float] = None,
    droplets: int = 4,
    Nc: Optional[int] = None,
    steps: int = 20000,
    seed: int = 0,
    engine: str = "literal",
) -> np.ndarray:
    """Ratio counting over PT samples (decoders.py:638-742): per rung i
    (except the top),

        C_i    = mean over the two shortest lengths of
                 N(l)/m(l) * exp(-beta_i (l - l_min))        (decoders.py:734)
        Z_i    = C_i * sum_n m(n) exp(n d_beta_i - beta_i l_min)
                                                            (decoders.py:737)
        Z_eq   = sum_i Z_i

    with beta_i from the p-ladder and d_beta_i = beta_i - beta_error.
    Returns uint8 percentages (decoders.py:742)."""
    p_sampling = p_sampling or p_error
    Nc = Nc or spec.size
    steps_eff = steps // Nc
    stream, ladder = _pt_stream(
        spec, init_states, p_sampling, Nc, steps_eff, droplets, 10, seed,
        engine,
    )
    st = occupancy_stats(stream, spec.nq)  # (B, K, Nc, nq+1)
    m_n = np.asarray(st.m_n, dtype=np.float64)
    N_n = np.asarray(st.N_n, dtype=np.float64)
    B, K = m_n.shape[:2]
    beta_err = betas_depolarizing(p_error)[0]
    beta_ladder = ladder[:, 0]  # scalar depolarizing betas per rung
    d_beta = beta_ladder - beta_err

    ns = np.arange(spec.nq + 1, dtype=np.float64)
    Z = np.zeros((B, K))
    for i in range(Nc - 1):
        m = m_n[:, :, i]  # (B, K, nq+1)
        N = N_n[:, :, i]
        has = m > 0
        # two shortest observed lengths per (B, K)
        big = spec.nq + 10
        l_sorted = np.where(has, ns[None, None, :], big)
        l_sorted.sort(axis=-1)
        l0 = l_sorted[..., 0]
        l1 = l_sorted[..., 1]
        bidx, kidx = np.meshgrid(np.arange(B), np.arange(K), indexing="ij")
        l0c = np.clip(l0.astype(int), 0, spec.nq)
        l1c = np.clip(l1.astype(int), 0, spec.nq)
        c0 = N[bidx, kidx, l0c] / np.maximum(m[bidx, kidx, l0c], 1.0)
        c1 = (
            N[bidx, kidx, l1c]
            / np.maximum(m[bidx, kidx, l1c], 1.0)
            * np.exp(-beta_ladder[i] * (l1 - l0))
        )
        C_mean = np.where(l1 <= spec.nq, 0.5 * (c0 + c1), c0)
        expo = ns[None, None, :] * d_beta[i] - beta_ladder[i] * l0[..., None]
        Z_i = C_mean * np.sum(m * np.exp(np.clip(expo, -700, 700)), axis=-1)
        Z += np.where(l0 <= spec.nq, Z_i, 0.0)

    total = Z.sum(axis=-1, keepdims=True)
    distr = np.where(total > 0, Z / np.maximum(total, 1e-300) * 100.0, 0.0)
    return distr.astype(np.uint8)
