"""Shared setup for the mid-decode checkpoint/resume tests.

Both the in-process test and the killed subprocess build the exact same
PTEQ run from here, so the resumed result can be compared bit-for-bit
against the uninterrupted baseline.
"""

import numpy as np

FAM, D, B, NC, P_ERR = "toric", 3, 8, 3, 0.08
SEED = 5


def build(ckpt_dir=None):
    import jax

    from mcmc_qec_tpu.decoders import PTEQConfig
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing

    spec = get_spec(FAM, D)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(11), spec, P_ERR, (B,))
    )
    cfg = PTEQConfig(
        Nc=NC, engine="sweep", window=100, iters=2, max_steps=600,
        energy_chunk=4, ckpt_dir=ckpt_dir, ckpt_every=1,
    )
    return spec, states, cfg


def run(ckpt_dir=None):
    from mcmc_qec_tpu.decoders import PTEQ

    spec, states, cfg = build(ckpt_dir)
    return PTEQ(spec, states, P_ERR, cfg, seed=SEED)
