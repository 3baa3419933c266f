"""Benchmark: Metropolis sweep throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: effective stabilizer-proposal throughput of the colored
sweep engine at toric d=5 over a large chain batch (1 sweep = n_stabs = 2d^2
proposals, the accounting of BASELINE.md).  vs_baseline is measured against
the reference's measured interpreted-Python floor of 178k proposals/s
(BASELINE.md: src/mcmc.py:152 path, single CPU core).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


BASELINE_PROPOSALS_PER_S = 178_000.0  # BASELINE.md measured reference floor


def bench_sweep(family="toric", d=5, batch=32768, sweeps_per_call=200, calls=3):
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing
    from mcmc_qec_tpu.ops.dense_sweep import make_dense_sweep

    spec = get_spec(family, d)
    sweep = make_dense_sweep(spec)
    betas = jnp.asarray(betas_depolarizing(0.1), jnp.float32)

    @jax.jit
    def run(states, key):
        def body(s, k):
            return sweep(s, k, betas), None

        ks = jax.random.split(key, sweeps_per_call)
        states, _ = jax.lax.scan(body, states, ks)
        return states

    key = jax.random.PRNGKey(0)
    states = jnp.zeros((batch, spec.nq), jnp.uint8)
    states = run(states, key)  # compile + warmup
    states.block_until_ready()

    best = 0.0
    for i in range(calls):
        t0 = time.perf_counter()
        states = run(states, jax.random.fold_in(key, i))
        states.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, batch * spec.n_stabs * sweeps_per_call / dt)
    return best, dt


def bench_stdc_decoder(d=5, B=32, steps=450, droplets=4):
    """Decoder-level throughput: full STDC (sweep engine) on a syndrome
    batch — sampling + on-device dedup + Z reduction."""
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing
    from mcmc_qec_tpu.decoders import STDC

    spec = get_spec("toric", d)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, 0.1, (B,))
    )
    STDC(spec, states, 0.1, 0.25, droplets=droplets, steps=steps,
         engine="sweep")  # compile
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        STDC(spec, states, 0.1, 0.25, droplets=droplets, steps=steps,
             engine="sweep", seed=rep + 1)
        dt = time.perf_counter() - t0
        props = B * spec.n_classes * droplets * steps * spec.n_stabs
        best = max(best, props / dt)
    return best


def main():
    pps, dt = bench_sweep()
    stdc_pps = bench_stdc_decoder()
    result = {
        "metric": "metropolis_proposals_per_sec_toric_d5",
        "value": round(pps, 1),
        "unit": "proposals/s",
        "vs_baseline": round(pps / BASELINE_PROPOSALS_PER_S, 2),
        "extra": {
            "stdc_decoder_proposals_per_sec_toric_d5": round(stdc_pps, 1),
            "stdc_decoder_vs_baseline": round(stdc_pps / BASELINE_PROPOSALS_PER_S, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
