"""Logical failure-rate curves — the north-star accuracy benchmark.

Decodes batches of sampled syndromes at a grid of physical error rates and
lattice sizes, reporting logical failure rates per (method, d, p) with
Monte-Carlo error bars.  A correct decoder family shows failure rates that
*decrease* with d below threshold (~0.19 for depolarizing toric MCMC
decoding) and increase above it.

Run:  python examples/failure_rates.py --sizes 5,7 --ps 0.05,0.10,0.15 -n 256
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from mcmc_qec_tpu.models import get_spec, np_eq_class
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.decoders import STDC


def failure_rate(family, d, p, n, steps, droplets, engine, seed=0):
    spec = get_spec(family, d)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(seed), spec, p, (n,))
    )
    truth = np_eq_class(spec, states)
    t0 = time.perf_counter()
    distr = STDC(spec, states, p, p_sampling=min(3 * p, 0.4),
                 droplets=droplets, steps=steps, engine=engine, seed=seed)
    dt = time.perf_counter() - t0
    fails = int((np.argmax(distr, -1) != truth).sum())
    rate = fails / n
    err = np.sqrt(max(rate * (1 - rate), 1e-9) / n)
    return rate, err, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="toric")
    ap.add_argument("--sizes", default="5,7")
    ap.add_argument("--ps", default="0.05,0.10,0.15")
    ap.add_argument("-n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--droplets", type=int, default=4)
    ap.add_argument("--engine", default="sweep")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    ps = [float(x) for x in args.ps.split(",")]
    results = []
    for d in sizes:
        # sweep budget ~ reference's 5 d^5 proposals / (2 d^2 per sweep)
        steps = args.steps or max(200, int(2.5 * d**3))
        for p in ps:
            rate, err, dt = failure_rate(
                args.family, d, p, args.n, steps, args.droplets, args.engine
            )
            rec = {"family": args.family, "d": d, "p": p, "n": args.n,
                   "steps": steps, "failure_rate": rate, "mc_err": err,
                   "seconds": round(dt, 2)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
