"""STRC: single-temperature ratio counting decoder (decoders.py:745-949).

Z estimate per class from occupancy statistics of a single-temperature
stream sampled at beta_sampling:

    mean_fraction = 0.5 * (N(l0)/m(l0)
                           + N(l1)/m(l1) * exp(-beta_s * (l1 - l0)))
    Z = mean_fraction * sum_n m(n) * exp(-beta_s * l0 + d_beta * n)

with l0/l1 the shortest/next-shortest observed lengths and d_beta =
beta_sampling - beta_error (decoders.py:860-863, 930-946).  Droplet merging
is the identity here because all droplets feed one stream (the combined
m(n)/N(n)/shortest sets equal the reference's dict merges,
decoders.py:883-928).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import CodeSpec
from ..mcmc.ladder import betas_depolarizing
from ..ops.pauli import all_class_states, apply_stabilizers_uniform
from .counting import SampleStream, make_sampler, occupancy_stats


@functools.lru_cache(maxsize=None)
def _get_strc_fn(spec: CodeSpec, droplets: int, steps: int, randomize: bool,
                 conv_mult: float = 0.0, engine: str = "literal"):
    from ..ops.engines import resolve_engine

    engine = resolve_engine(engine, "counting")
    iters = 5 if engine == "literal" else 1
    # STRC always samples with a depolarizing (uniform-beta) chain
    # (decoders.py:835-949, betas built in strc_run below), so the sweep
    # kernel's single-contraction fast path is always valid here
    sampler = make_sampler(spec, steps, iters_per_step=iters, engine=engine,
                           equal_betas=True)
    nq = spec.nq

    def run(class_states, key, betas_sampling, beta_s, beta_e):
        B, K, _ = class_states.shape
        states = jnp.broadcast_to(
            class_states[:, :, None, :], (B, K, droplets, nq)
        )
        k_rain, k_samp = jax.random.split(key)
        if randomize:
            states = apply_stabilizers_uniform(spec, states, k_rain, 0.5)
        _, stream = sampler(states, k_samp, betas_sampling)
        valid = None
        if conv_mult:
            from .counting import conv_mult_valid_mask

            n_tot = jnp.sum(stream.n_xyz, axis=-1).astype(jnp.float32)
            valid = jax.vmap(
                lambda k_, n_: conv_mult_valid_mask(k_, n_, conv_mult, steps)
            )(stream.keys.reshape(-1, steps, 2), n_tot.reshape(-1, steps))
            valid = valid.reshape(B, K, droplets * steps)
        stream = SampleStream(
            stream.keys.reshape(B, K, droplets * steps, 2),
            stream.n_xyz.reshape(B, K, droplets * steps, 3),
        )
        st = occupancy_stats(stream, nq, valid=valid)  # arrays (B, K, nq+1)

        idx_k = jnp.arange(nq + 1, dtype=jnp.float32)
        l0 = st.shortest.astype(jnp.float32)  # (B, K)
        l1 = st.next_shortest.astype(jnp.float32)
        bk = jnp.arange(nq + 1)

        def frac_at(N_n, m_n, l):
            li = jnp.clip(l.astype(jnp.int32), 0, nq)
            N = jnp.take_along_axis(N_n, li[..., None], axis=-1)[..., 0]
            m = jnp.take_along_axis(m_n, li[..., None], axis=-1)[..., 0]
            return N.astype(jnp.float32) / jnp.maximum(m.astype(jnp.float32), 1.0)

        sf = frac_at(st.N_n, st.m_n, l0)
        has_next = st.next_shortest <= nq
        nsf = frac_at(st.N_n, st.m_n, l1)
        mean_fraction = jnp.where(
            has_next,
            0.5 * (sf + nsf * jnp.exp(-beta_s * (l1 - l0))),
            sf,
        )
        d_beta = beta_s - beta_e
        # log of sum_n m(n) exp(-beta_s l0 + d_beta n), stably
        logterm = jnp.where(
            st.m_n > 0,
            jnp.log(jnp.maximum(st.m_n.astype(jnp.float32), 1.0))
            + d_beta * idx_k[None, None, :],
            -jnp.inf,
        )
        mx = jnp.max(logterm, axis=-1)
        logsum = mx + jnp.log(
            jnp.sum(jnp.exp(logterm - mx[..., None]), axis=-1)
        )
        logZ = jnp.log(jnp.maximum(mean_fraction, 1e-30)) - beta_s * l0 + logsum
        distr = jax.nn.softmax(logZ, axis=-1) * 100.0
        return distr, logZ

    return jax.jit(run)


def STRC(
    spec: CodeSpec,
    init_states: np.ndarray,
    p_error: float,
    p_sampling: Optional[float] = None,
    droplets: int = 10,
    steps: int = 20000,
    seed: int = 0,
    conv_mult: float = 0.0,
    engine: str = "auto",
) -> np.ndarray:
    """Returns (B, K) float percentages (decoders.py:835-949)."""
    p_sampling = p_sampling or p_error
    randomize = init_states.ndim == 2
    if randomize:
        js = jnp.asarray(init_states, jnp.uint8)
        seeds = jax.vmap(lambda s: all_class_states(spec, s))(js)
    else:
        seeds = jnp.asarray(init_states, jnp.uint8)
    beta_e = float(betas_depolarizing(p_error)[0])
    beta_s = float(betas_depolarizing(p_sampling)[0])
    fn = _get_strc_fn(spec, droplets, steps, randomize, conv_mult, engine)
    distr, _ = fn(
        seeds,
        jax.random.PRNGKey(seed),
        jnp.asarray(betas_depolarizing(p_sampling), jnp.float32),
        jnp.float32(beta_s),
        jnp.float32(beta_e),
    )
    return np.asarray(distr)
