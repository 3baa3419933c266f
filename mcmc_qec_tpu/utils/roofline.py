"""MXU FLOP accounting / roofline estimates for the Pallas sweep kernel.

The sweep kernel (ops/pallas_sweep.py) performs, per color per sweep,
four MXU matmuls on bf16 operands with f32 accumulation:

    3 delta contractions  (TB, nq_pad) @ (nq_pad, W_out)
    1 accept scatter      (TB, W_out)  @ (W_out, nq_pad)

All four are 2 * TB * nq_pad * W_out FLOPs.  This module reproduces the
kernel's padding/packing arithmetic so bench.py can convert a measured
proposals/s figure into an achieved-TFLOP/s and model-FLOP-utilization
(MFU) estimate without instrumenting the kernel.

Peak figures: TPU v5e (the bench chip, ``TPU v5 lite``) peaks at ~197
bf16 TFLOP/s and ~394 int8 TOP/s per chip.  Override with the
``MCMC_QEC_PEAK_TFLOPS`` env var when running on other hardware.

Findings recorded in RESULTS.md: the kernel is *issue-bound*, not
MXU-bound (9.6% MFU at d=5, 33% at d=13), so the int8 MXU path (2x the
bf16 rate) does not raise throughput — measured int8 == bf16 rate at the
kernel's matmul shapes.  Headroom is in instruction count (PRNG calls,
per-color elementwise), not arithmetic rate.
"""

from __future__ import annotations

import os

from ..models.base import CodeSpec
from ..ops.dense_sweep import _color_tables
from ..ops.pallas_sweep import _round_up

# TPU v5e per-chip peaks (jax device kind "TPU v5 lite")
PEAK_BF16_TFLOPS_V5E = 197.0
PEAK_INT8_TOPS_V5E = 394.0


def peak_bf16_tflops() -> float:
    """Per-chip bf16 MXU peak in TFLOP/s (env-overridable)."""
    return float(os.environ.get("MCMC_QEC_PEAK_TFLOPS", PEAK_BF16_TFLOPS_V5E))


def pallas_sweep_mxu_flops(
    spec: CodeSpec, batch: int, n_sweeps: int, batch_tile: int = 512,
    equal_betas: bool = False,
) -> int:
    """Total MXU FLOPs one ``make_pallas_sweep(spec, n_sweeps)`` call
    executes on a ``batch`` of chains (padding and chain packing
    included, mirroring ops/pallas_sweep.py's layout arithmetic).
    ``equal_betas``: the single-contraction fast path runs 2 matmuls per
    color (1 total-count delta + 1 accept scatter) instead of 4."""
    tables = _color_tables(spec)
    inner = _round_up(spec.nq, 32)
    n_pack = max(1, 128 // inner)
    nq_pad = _round_up(n_pack * inner, 128)
    W_pad = _round_up(max(max(sel.shape[0] for sel, _, _ in tables), 8), 8)
    W_out = n_pack * W_pad
    rows = _round_up(-(-batch // n_pack), batch_tile)
    n_mm = 2 if equal_betas else 4
    per_sweep = len(tables) * n_mm * 2 * rows * nq_pad * W_out
    return per_sweep * n_sweeps


def pallas_ladder_mxu_flops(
    spec: CodeSpec, Nc: int, window: int, iters: int, batch: int,
    batch_tile: int = 128, equal_betas: bool = False,
) -> int:
    """MXU FLOPs of one fused PT-ladder window call
    (ops/pallas_ladder.py, rung-packed layout) on ``batch`` syndromes.

    Dominant terms per ladder step, with NR = Nc * TB packed rows and
    D = 1 delta contraction per color on the equal-betas (depolarizing)
    path or 3 on the general path:
      sweeps:   iters * n_colors * (D+1) matmuls (NR, nq_pad)x(nq_pad, W_out)
      exchange: D segment matmuls   of (NR, nq_pad)x(nq_pad, SP)
      readout:  2 class matmuls     of (TB, nq_pad)x(nq_pad, 64)
                + D energy matmuls  of (SP, nq_pad)x(nq_pad, TB)
    The top-rung mix and slot broadcast/reduce matmuls are O(TB) and
    contribute <5% for Nc >= 5; they are charged via the readout term's
    64-wide bound.  Mirrors the kernel's padding arithmetic exactly.

    NOTE (measured, RESULTS.md 'fused-ladder roofline'): the kernel is
    NOT MXU-bound — the sweep phase sits at ~1.2x the VPU elementwise
    bound and the fixed phase is the sequential exchange chain at issue
    latency — so this MFU is an accounting figure, not the headroom.
    """
    tables = _color_tables(spec)
    inner = _round_up(spec.nq, 32)
    n_pack = max(1, 128 // inner)
    nq_pad = _round_up(n_pack * inner, 128)
    W_pad = _round_up(max(max(sel.shape[0] for sel, _, _ in tables), 8), 8)
    W_out = n_pack * W_pad
    n_colors = len(tables)
    rows = _round_up(-(-batch // n_pack), batch_tile)
    NR = Nc * rows
    D = 1 if equal_betas else 3
    sweep = iters * n_colors * (D + 1) * 2 * NR * nq_pad * W_out
    exchange = D * 2 * NR * nq_pad * 8
    readout = (2 * 2 * rows * nq_pad * 64) + (D * 2 * 8 * nq_pad * rows)
    return window * (sweep + exchange + readout)


def fused_ladder_mfu(
    spec: CodeSpec, Nc: int, window: int, iters: int, batch: int,
    seconds_per_window: float, batch_tile: int = 128,
    equal_betas: bool = False,
) -> tuple[float, float]:
    """(achieved_tflops, mfu_fraction) for a measured fused-window time."""
    flops = pallas_ladder_mxu_flops(spec, Nc, window, iters, batch,
                                    batch_tile, equal_betas)
    achieved = flops / seconds_per_window / 1e12
    return achieved, achieved / peak_bf16_tflops()


def mfu_from_throughput(
    spec: CodeSpec, proposals_per_sec: float, batch: int, n_sweeps: int,
    batch_tile: int = 512, equal_betas: bool = False,
) -> tuple[float, float]:
    """(achieved_tflops, mfu_fraction) from a measured proposals/s.

    ``proposals_per_sec`` uses the bench accounting of batch * n_stabs
    proposals per sweep; the conversion inverts it to wall seconds per
    kernel call and divides the call's MXU FLOPs by that.
    """
    props_per_call = batch * spec.n_stabs * n_sweeps
    seconds_per_call = props_per_call / proposals_per_sec
    flops = pallas_sweep_mxu_flops(spec, batch, n_sweeps, batch_tile,
                                   equal_betas)
    achieved = flops / seconds_per_call / 1e12
    return achieved, achieved / peak_bf16_tflops()
