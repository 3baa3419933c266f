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
    from ..ops.engines import resolve_engine

    engine = resolve_engine(engine, "chain")
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
    engine: str = "auto",
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
    engine: str = "auto",
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


@functools.partial(jax.jit, static_argnames=("nq",))
def _ptrc_reduce(m_n, N_n, shortest, next_shortest, beta_ladder, beta_err,
                 nq: int):
    """On-device log-space PTRC reduction over rungs and lengths.

    Inputs have axes (B, K, Nc, [nq+1]); the top rung (infinite
    temperature) is excluded like the reference (decoders.py:726).
    Working in log space (logsumexp over lengths, then over rungs) keeps
    the whole reduction in f32 on the accelerator — the previous
    host-side version needed f64 + exponent clipping because it summed
    raw Boltzmann terms.  softmax(logZ) == Z / sum(Z) exactly."""
    m = m_n[..., :-1, :].astype(jnp.float32)  # (B, K, R, nq+1)
    N = N_n[..., :-1, :].astype(jnp.float32)
    l0 = shortest[..., :-1].astype(jnp.float32)  # (B, K, R)
    l1 = next_shortest[..., :-1].astype(jnp.float32)
    bl = beta_ladder[:-1]  # (R,)
    db = bl - beta_err

    def take(arr, idx):
        return jnp.take_along_axis(
            arr, jnp.clip(idx.astype(jnp.int32), 0, nq)[..., None], axis=-1
        )[..., 0]

    c0 = take(N, l0) / jnp.maximum(take(m, l0), 1.0)
    c1 = (
        take(N, l1) / jnp.maximum(take(m, l1), 1.0)
        * jnp.exp(-bl * jnp.maximum(l1 - l0, 0.0))
    )
    C = jnp.where(l1 <= nq, 0.5 * (c0 + c1), c0)
    ns = jnp.arange(nq + 1, dtype=jnp.float32)
    logm = jnp.where(m > 0, jnp.log(jnp.maximum(m, 1e-30)), -jnp.inf)
    expo = (
        ns * db[None, None, :, None]
        - (bl * l0)[..., None]
        + logm
    )
    logZ_i = jnp.log(jnp.maximum(C, 1e-30)) + jax.nn.logsumexp(expo, axis=-1)
    logZ_i = jnp.where((l0 <= nq) & (C > 0), logZ_i, -jnp.inf)
    logZ = jax.nn.logsumexp(logZ_i, axis=-1)  # (B, K)
    any_fin = jnp.isfinite(logZ).any(axis=-1, keepdims=True)
    logZ_safe = jnp.where(jnp.isfinite(logZ), logZ, -1e30)
    return jnp.where(
        any_fin, jax.nn.softmax(logZ_safe, axis=-1) * 100.0, 0.0
    )


def PTRC(
    spec: CodeSpec,
    init_states: np.ndarray,
    p_error: float,
    p_sampling: Optional[float] = None,
    droplets: int = 4,
    Nc: Optional[int] = None,
    steps: int = 20000,
    seed: int = 0,
    engine: str = "auto",
) -> np.ndarray:
    """Ratio counting over PT samples (decoders.py:638-742): per rung i
    (except the top),

        C_i    = mean over the two shortest lengths of
                 N(l)/m(l) * exp(-beta_i (l - l_min))        (decoders.py:734)
        Z_i    = C_i * sum_n m(n) exp(n d_beta_i - beta_i l_min)
                                                            (decoders.py:737)
        Z_eq   = sum_i Z_i

    with beta_i from the p-ladder and d_beta_i = beta_i - beta_error.
    The reduction runs on-device in log space (no (B, K, Nc, nq+1) host
    fetch; scales to large batch x Nc).  Returns uint8 percentages
    (decoders.py:742)."""
    p_sampling = p_sampling or p_error
    Nc = Nc or spec.size
    steps_eff = steps // Nc
    stream, ladder = _pt_stream(
        spec, init_states, p_sampling, Nc, steps_eff, droplets, 10, seed,
        engine,
    )
    st = occupancy_stats(stream, spec.nq)  # (B, K, Nc, nq+1)
    beta_err = betas_depolarizing(p_error)[0]
    distr = _ptrc_reduce(
        st.m_n, st.N_n, st.shortest, st.next_shortest,
        jnp.asarray(ladder[:, 0], jnp.float32), jnp.float32(beta_err),
        spec.nq,
    )
    return np.asarray(distr).astype(np.uint8)
