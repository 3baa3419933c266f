"""Cross-decoder comparison demo — the working version of the reference's
__main__ block (decoders.py:952-1006): decode the same planar syndromes
with STDC / STRC / PTEQ / PTDC and compare class calls and timings.

Run:  python examples/compare_decoders.py [--size 9] [--p 0.1] [--batch 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from mcmc_qec_tpu.models import get_spec, np_eq_class
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.decoders import PTDC, PTEQ, PTEQConfig, STDC, STRC


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=9)
    ap.add_argument("--p", type=float, default=0.10)
    ap.add_argument("--p-sampling", type=float, default=0.30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--engine", default="sweep", choices=["literal", "sweep"])
    args = ap.parse_args()

    spec = get_spec("planar", args.size)
    steps = args.steps or 10 * args.size**5 // 100
    B = args.batch
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, args.p, (B,))
    )
    truth = np_eq_class(spec, states)
    print(f"planar d={args.size}, p={args.p}, {B} syndromes, "
          f"true classes {truth.tolist()}")

    def report(name, fn):
        t0 = time.perf_counter()
        distr = fn()
        dt = time.perf_counter() - t0
        calls = np.argmax(distr, axis=-1)
        ok = int((calls == truth).sum())
        print(f"{name:6s} {dt:7.1f}s  calls {calls.tolist()}  "
              f"correct {ok}/{B}")
        return calls

    report("STDC", lambda: STDC(spec, states, args.p, args.p_sampling,
                                droplets=4, steps=steps, engine=args.engine))
    report("STRC", lambda: STRC(spec, states, args.p, args.p_sampling,
                                droplets=4, steps=steps))
    report("PTDC", lambda: PTDC(spec, states, args.p, args.p_sampling,
                                droplets=2, steps=steps))
    report("PTEQ", lambda: PTEQ(spec, states, args.p,
                                PTEQConfig(max_steps=50_000, window=200)
                                ).distribution)


if __name__ == "__main__":
    main()
