"""ST: single-temperature mean-energy decoder (decoders.py:108-135).

One chain per equivalence class at fixed p; the score per class is the mean
error count over the run (decision = argmin, generate_data.py:199-203).
Fully on device, batched over syndromes and classes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import CodeSpec
from ..mcmc.ladder import betas_depolarizing
from ..ops.metropolis import make_chain_update
from ..ops.pauli import all_class_states, count_errors


@functools.lru_cache(maxsize=None)
def _get_st_fn(spec: CodeSpec, max_iters: int):
    update = make_chain_update(spec, 5)  # 5 proposals per recorded step
    def run(class_states, key, betas):
        def body(s, k):
            s = update(s, k, betas)
            return s, count_errors(s)

        ks = jax.random.split(key, max_iters)
        _, counts = jax.lax.scan(body, class_states, ks)  # (T, B, K)
        # reference averages nbr_errors_chain[eq, :max_iters-1]
        # (decoders.py:130-133) — i.e. all but the last recorded step
        return jnp.mean(counts[:-1].astype(jnp.float32), axis=0)

    return jax.jit(run)


def single_temp(
    spec: CodeSpec,
    init_states: np.ndarray,  # (B, nq) or (B, K, nq)
    p: float,
    max_iters: int,
    seed: int = 0,
) -> np.ndarray:
    """Returns (B, K) mean error counts (smaller = more likely class)."""
    if init_states.ndim == 2:
        js = jnp.asarray(init_states, jnp.uint8)
        seeds = jax.vmap(lambda s: all_class_states(spec, s))(js)
    else:
        seeds = jnp.asarray(init_states, jnp.uint8)
    fn = _get_st_fn(spec, max_iters)
    out = fn(seeds, jax.random.PRNGKey(seed),
             jnp.asarray(betas_depolarizing(p), jnp.float32))
    return np.asarray(out)
