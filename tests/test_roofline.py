"""utils/roofline.py: FLOP accounting mirrors the kernel's real layout."""

import numpy as np

from mcmc_qec_tpu.models import get_spec
from mcmc_qec_tpu.ops.dense_sweep import _color_tables
from mcmc_qec_tpu.ops.pallas_sweep import _round_up
from mcmc_qec_tpu.utils.roofline import (
    fused_ladder_mfu,
    mfu_from_throughput,
    pallas_ladder_mxu_flops,
    pallas_sweep_mxu_flops,
    peak_bf16_tflops,
)


def test_flops_match_layout_arithmetic():
    # independent recomputation for toric d=5 with chain packing
    spec = get_spec("toric", 5)
    tables = _color_tables(spec)
    inner = 64  # round_up(50, 32)
    n_pack = 2
    nq_pad = 128
    W_pad = _round_up(max(max(s.shape[0] for s, _, _ in tables), 8), 8)
    W_out = n_pack * W_pad
    batch, n_sweeps, tile = 1000, 7, 512
    rows = _round_up(-(-batch // n_pack), tile)
    expect = len(tables) * 4 * 2 * rows * nq_pad * W_out * n_sweeps
    assert pallas_sweep_mxu_flops(spec, batch, n_sweeps, tile) == expect


def test_mfu_round_trip():
    """Inverting throughput -> seconds -> TFLOP/s is self-consistent."""
    spec = get_spec("toric", 13)
    batch, n_sweeps = 16384, 400
    props = batch * spec.n_stabs * n_sweeps
    # pretend one call took exactly 1 second
    tf, mfu = mfu_from_throughput(spec, float(props), batch, n_sweeps)
    assert np.isclose(
        tf, pallas_sweep_mxu_flops(spec, batch, n_sweeps) / 1e12
    )
    assert np.isclose(mfu, tf / peak_bf16_tflops())
    assert 0 < mfu < 1


def test_ladder_flops_match_layout_arithmetic():
    """Fused-ladder accounting mirrors ops/pallas_ladder.py's rung
    packing; the equal-betas path charges 1 delta contraction, the
    general path 3."""
    spec = get_spec("toric", 5)
    tables = _color_tables(spec)
    n_pack, nq_pad = 2, 128
    W_pad = _round_up(max(max(s.shape[0] for s, _, _ in tables), 8), 8)
    W_out = n_pack * W_pad
    Nc, window, iters, batch, tile = 5, 600, 2, 2048, 128
    rows = _round_up(-(-batch // n_pack), tile)
    NR = Nc * rows
    nc = len(tables)
    for eqb, D in [(True, 1), (False, 3)]:
        sweep = iters * nc * (D + 1) * 2 * NR * nq_pad * W_out
        exch = D * 2 * NR * nq_pad * 8
        readout = 2 * 2 * rows * nq_pad * 64 + D * 2 * 8 * nq_pad * rows
        expect = window * (sweep + exch + readout)
        got = pallas_ladder_mxu_flops(spec, Nc, window, iters, batch,
                                      tile, equal_betas=eqb)
        assert got == expect
    # MFU round trip at a pretend 72.5 ms/window
    tf, mfu = fused_ladder_mfu(spec, Nc, window, iters, batch, 0.0725,
                               batch_tile=tile, equal_betas=True)
    assert np.isclose(mfu, tf / peak_bf16_tflops())
    assert 0 < mfu < 1


def test_peak_env_override(monkeypatch):
    monkeypatch.setenv("MCMC_QEC_PEAK_TFLOPS", "100.0")
    assert peak_bf16_tflops() == 100.0
