"""Fused Pallas TPU kernel: a full PTEQ window in VMEM, rung-packed.

One kernel invocation runs ``window`` parallel-tempering ladder steps for a
batch tile of syndromes — per step: ``iters`` colored Metropolis sweeps on
every rung (per-rung betas), logical mixing on the top rung (general
Metropolis for nonzero top betas, src/mcmc_biased.py:66-124; a batched
always-accept parity path for the standard zero-beta top,
src/mcmc.py:30), the sequential top->bottom replica-exchange sweep with
flag/tops0 bookkeeping (src/mcmc.py:94-103), bottom-rung
equivalence-class readout and post-burn class-occupation accumulation —
with the ladder state resident in VMEM throughout.

Rung packing (the round-3 redesign): between replica-exchange sweeps the
Nc rungs evolve independently, so the whole ladder is held as ONE pair of
(Nc*TB, nq_pad) bf16 bitplanes with rung r in rows [r*TB, (r+1)*TB).
Each colored half-sweep is then 4 large MXU matmuls over all rungs at
once (3 delta contractions + 1 accept scatter) instead of 4*Nc small
ones; per-rung acceptance betas enter as an (Nc*TB, 1) row-block column
built from SMEM.  The per-rung Pauli counts feeding the exchange sweep
are likewise one packed segment-sum matmul per component.  Only the
exchange sweep itself (sequential by construction, mcmc.py:96-99) and the
top/bottom readouts touch (TB, .) slices.  Bitplanes default to f32:
bf16 planes would halve VMEM (every stored value is 0/1, exact either
way; matmul inputs are cast to bf16 regardless) but measured 1.6x SLOWER
end-to-end on v5e — the VPU elementwise chain pays pack/unpack on every
op — so ``plane_dtype`` keeps f32 unless VMEM pressure forces bf16.

Chain packing (within a row) is unchanged: small codes (nq <= 64) pack
``n_pack = 128 // round_up(nq, 32)`` independent syndromes side by side
in each 128-lane row (same scheme as ops/pallas_sweep.py), and every
per-syndrome scalar (swap accepts, Pauli counts, flags, tops0, class
index, energy) lives in a (rows, 8)-slot layout reduced/broadcast with
tiny segment matmuls.

Restrictions (the general path in mcmc/ladder.py covers the rest):
- no track_shortest extras (shortest tracking runs on-device in the XLA
  window path, decoders/pteq.py);
- TPU only (pltpu PRNG) unless ``interpret=True``.  Statistical
  equivalence with the XLA window is validated on-chip in
  tests/test_pallas_ladder.py (skipped off-TPU).

Sweep math is identical to ops/pallas_sweep.py.  Mosaic rejects 1D<->3D
shape casts, so all kernel values are 2D; rung slicing is static row
slicing of the packed planes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import CodeSpec
from .dense_sweep import _color_tables
from .tpu_info import scoped_vmem_limit

# roofline-ablation debug knob: comma-separated kernel blocks to skip
# (counts, flags, obs, fold, cat) — measurement only, NOT a valid sampler.
# The round-5 decomposition measured with this (RESULTS.md): ALL
# non-sweep per-step work together is ~1.5-4 ms of a ~42 ms device
# window at d=5 B=2048 W=600; the window is sweep-VPU-bound, and the
# ~26 ms previously attributed to the readout was the remote-tunnel
# round-trip hiding inside single-shot wall-time measurements.
_DEBUG_SKIP = os.environ.get("MQT_LADDER_SKIP", "")

# slot lanes for per-syndrome scalars; n_pack <= 4 always (inner >= 32)
SP = 8
# lanes per slot in the (TB, 128) class-count tile; K <= 16 for all codes
EQW = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bit_planes_np(m: np.ndarray):
    b0 = (m & 1) ^ ((m >> 1) & 1)
    b1 = (m >> 1) & 1
    return b0.astype(np.float32), b1.astype(np.float32)


def fused_vmem_estimate(spec: CodeSpec, Nc: int, window: int, iters: int,
                        batch_tile: int, energy_chunk: int,
                        track_traces: bool = False) -> int:
    """Rough per-tile VMEM bytes for the fused window kernel: resident
    state + constants + the peak transient working set of one colored
    half-sweep.  Used to pick a batch tile / fall back to the XLA window
    before Mosaic fails compilation (VERDICT r2 #5)."""
    tables = _color_tables(spec)
    inner = _round_up(spec.nq, 32)
    n_pack = max(1, 128 // inner)
    nq_pad = _round_up(n_pack * inner, 128)
    W_pad = _round_up(max(max(sel.shape[0] for sel, _, _ in tables), 8), 8)
    W_out = n_pack * W_pad
    n_colors = len(tables)
    rows = Nc * batch_tile
    planes = 2 * rows * nq_pad * 2  # bf16 ladder bitplanes
    # transient: nb0/nb1/d1/d2/d3 bf16 + 3 contractions + logr f32 + the
    # full per-iter uniform block (n_colors, rows, W_out) f32 + acc f32
    transient = (
        5 * rows * nq_pad * 2
        + 4 * rows * W_out * 4
        + n_colors * rows * W_out * 4
        + rows * nq_pad * 4
    )
    consts = n_colors * W_out * nq_pad * 4 * 3 + 2 * nq_pad * SP * 128 * 4
    energy = (window // energy_chunk) * SP * batch_tile * 4
    scalars = 8 * rows * SP * 4
    traces = 5 * window * SP * batch_tile * 4 if track_traces else 0
    # deferred-readout scratch (chunk of bottom planes + gate), the
    # fold's lane transients (onehot/eq_l/g_l at 128 lanes) and its
    # plane-sized f32 transients (the P0/P1 casts plus, in the
    # non-equal-betas branch, the three live component planes)
    chunk_rows = energy_chunk * batch_tile
    defer = (
        2 * chunk_rows * nq_pad * 4
        + chunk_rows * SP * 4
        + 3 * chunk_rows * 128 * 4
        + 5 * chunk_rows * nq_pad * 4
    )
    return planes + transient + consts + energy + scalars + traces + defer


def pick_batch_tile(spec: CodeSpec, Nc: int, window: int, iters: int,
                    energy_chunk: int, requested: int = 256,
                    track_traces: bool = False) -> int:
    """Largest batch tile <= requested whose VMEM estimate fits the device
    (halving down to 32); the caller treats 0 as 'does not fit fused'."""
    limit = scoped_vmem_limit() or (16 << 20)
    tb = requested
    while tb >= 32:
        if fused_vmem_estimate(spec, Nc, window, iters, tb, energy_chunk,
                               track_traces) <= limit:
            return tb
        tb //= 2
    return 0


def make_pallas_ladder_window(
    spec: CodeSpec,
    Nc: int,
    window: int,
    iters: int,
    p_logical: float,
    tops_burn: int,
    batch_tile: int = 256,
    energy_chunk: int = 1,
    interpret: bool = False,
    top_exact: bool = False,
    equal_betas: bool = False,
    track_traces: bool = False,
    plane_dtype=jnp.float32,
    exchange: str = "sequential",
):
    """Build ``fn(state, flag, tops0, eq_count, since_burn, seed, betas,
    weights)`` running one fused PTEQ window.

    Shapes (B = syndrome batch, packed/padded internally):
      state (B, Nc, nq) u8, flag (B, Nc) i32, tops0 (B,) i32,
      eq_count (B, K) i32, since_burn (B,) i32, seed scalar i32,
      betas (Nc, 3) f32 (any top rung, incl. biased), weights (3,) f32.
    Returns (state, flag, tops0, eq_count, since_burn,
             energies (window // energy_chunk, B) f32 chunk means,
             burn_any (B,) bool, burn_first (B,) i32,
             swap_acc (B, Nc-1) i32 accepted swaps per rung pair this
             window) — the `_get_window_fn` contract.  ``energy_chunk`` > 1
    coarsens the energy trace on device (the host convergence check needs
    only windowed means; fetching per-step traces over the remote-TPU
    tunnel dominates the host loop otherwise).

    ``top_exact``: the caller asserts the top rung's betas are exactly
    zero (depolarizing p_top=0.75 / alpha pz_tilde_top=1), so every
    logical proposal accepts (src/mcmc.py:30) and the ``iters`` MH rounds
    collapse to one parity accumulation — all (iter, draw) one-hots are
    summed first and each draw table is contracted once, mod 2.

    ``equal_betas``: the caller asserts beta_x == beta_y == beta_z on
    every rung (depolarizing ladders: factor = (p/3)/(1-p) uniformly,
    src/mcmc.py:16).  Acceptance then depends only on the TOTAL error
    count, so the three per-Pauli delta contractions collapse to one
    OR-plane contraction per color, the three exchange-sweep segment sums
    to one, and the energy trace to one matmul — halving the kernel's MXU
    and VPU work on the flagship depolarizing path.

    ``track_traces``: additionally emit per-step bottom-rung traces for
    on-device shortest-chain dedup (decoders_biasednoise.py:93-172):
    class index, per-step energy, and a 4-component content hash of the
    bottom chain.  The hash components are bf16-matmul-exact weighted
    sums sum_q v_q * c_q with random coefficients c_q in [0, 64) (v_q the
    2-bit Pauli value): every product < 192 and every sum < 2^18, so the
    f32-accumulated MXU contraction is exact, giving ~17 independent hash
    bits per component (~68 total — same birthday regime as
    ops/pauli.pack_key, and only ever compared against hashes from the
    same run).  Returns three extra outputs:
      eq_trace (window, B) i32, en_trace (window, B) f32,
      key_trace (window, B, 4) i32.

    ``interpret`` runs the kernel through the TPU interpreter
    (pltpu.InterpretParams) so the full fused dataflow executes on CPU —
    used by the multi-device shard_map tests and dryrun_multichip.  The
    interpreter stubs prng_random_bits to zeros, so interpret runs validate
    shapes/dataflow/sharding and syndrome-preservation invariants, not
    statistics (the statistical check is the on-TPU test in
    tests/test_pallas_ladder.py).
    """
    assert window % energy_chunk == 0
    # the fold accumulates per-qubit error counts over a chunk BEFORE the
    # bf16 segment matmul; integers are bf16-exact only up to 256
    assert energy_chunk <= 256, "energy_chunk > 256 breaks bf16 exactness"
    if "counts" in _DEBUG_SKIP and exchange != "none":
        raise ValueError(
            "MQT_LADDER_SKIP=counts is only coherent with exchange='none' "
            "(the exchange sweep reads the skipped count tensors)"
        )
    n_chunks = window // energy_chunk
    tables = _color_tables(spec)
    nq = spec.nq
    inner = _round_up(nq, 32)
    n_pack = max(1, 128 // inner)
    nq_pad = _round_up(n_pack * inner, 128)
    n_colors = len(tables)
    K = spec.n_classes
    assert K <= EQW and n_pack * EQW <= 128 and n_pack <= SP
    n_bits = spec.n_class_bits
    W_pad = _round_up(max(max(sel.shape[0] for sel, _, _ in tables), 8), 8)
    W_out = n_pack * W_pad
    sel_all = np.zeros((n_colors, W_out, nq_pad), np.float32)
    xop_all = np.zeros((n_colors, 1, nq_pad), np.float32)
    zop_all = np.zeros((n_colors, 1, nq_pad), np.float32)
    for c, (sel, xop, zop) in enumerate(tables):
        for j in range(n_pack):
            sel_all[c, j * W_pad : j * W_pad + sel.shape[0],
                    j * inner : j * inner + nq] = sel
            xop_all[c, 0, j * inner : j * inner + nq] = xop
            zop_all[c, 0, j * inner : j * inner + nq] = zop

    # class-bit functionals (ops/pauli.py:class_bits), block-diagonal per
    # slot: bit f of slot j = (A[f]·b0 + B[f]·b1) mod 2 read from feature
    # column j*nb_pad + f; PW then combines bits into a per-slot class id
    nb_pad = 8
    NBW = SP * nb_pad
    AB = np.zeros((2, nq_pad, NBW), np.float32)
    PW = np.zeros((NBW, SP), np.float32)
    for j in range(n_pack):
        AB[0, j * inner : j * inner + nq, j * nb_pad : j * nb_pad + n_bits] = (
            np.asarray(spec.class_A, np.float32).T
        )
        AB[1, j * inner : j * inner + nq, j * nb_pad : j * nb_pad + n_bits] = (
            np.asarray(spec.class_B, np.float32).T
        )
        for k2 in range(n_bits):
            PW[j * nb_pad + k2, j] = float(1 << k2)
    bits_to_eq = [int(v) for v in np.asarray(spec.bits_to_eq)]

    # logical-draw tables in bit-plane form, block-diagonal per slot
    draws = spec.logical_draws
    n_draws = len(draws)
    n_pos = [drw.x_masks.shape[0] for drw in draws]
    n_pos_pad = _round_up(max(max(n_pos), 8), 8)
    n_pos_out = n_pack * n_pos_pad
    DRW = np.zeros((n_draws, 4, n_pos_out, nq_pad), np.float32)
    lut = []
    for i, drw in enumerate(draws):
        x0, x1 = _bit_planes_np(drw.x_masks.astype(np.int32))
        z0, z1 = _bit_planes_np(drw.z_masks.astype(np.int32))
        for j in range(n_pack):
            r0, c0 = j * n_pos_pad, j * inner
            DRW[i, 0, r0 : r0 + n_pos[i], c0 : c0 + nq] = x0
            DRW[i, 1, r0 : r0 + n_pos[i], c0 : c0 + nq] = x1
            DRW[i, 2, r0 : r0 + n_pos[i], c0 : c0 + nq] = z0
            DRW[i, 3, r0 : r0 + n_pos[i], c0 : c0 + nq] = z1
        lut.append([(int(o[0]), int(o[1])) for o in np.asarray(drw.op_lut)])

    # per-slot segment reduce / broadcast matrices.  SEGT is SEG transposed,
    # used to produce (SP, TB)-layout slot sums for the energy trace (whose
    # VMEM buffer keeps TB in the lane dim — a (chunks, TB, SP) layout would
    # pad the 8 slot lanes to 128 and waste ~6 MB of VMEM per tile).
    SEG = np.zeros((nq_pad, SP), np.float32)  # qubit lanes -> slot sums
    BRD = np.zeros((SP, nq_pad), np.float32)  # slot scalars -> qubit lanes
    BRD2 = np.zeros((SP, n_pos_out), np.float32)  # -> position lanes
    BRDEQ = np.zeros((SP, 128), np.float32)  # -> class-count lanes
    for j in range(n_pack):
        SEG[j * inner : j * inner + nq, j] = 1.0
        BRD[j, j * inner : (j + 1) * inner] = 1.0
        BRD2[j, j * n_pos_pad : (j + 1) * n_pos_pad] = 1.0
        BRDEQ[j, j * EQW : (j + 1) * EQW] = 1.0
    IOTP = (np.arange(n_pos_out, dtype=np.float32) % n_pos_pad)[None, :]
    IOTE = (np.arange(128, dtype=np.float32) % EQW)[None, :]
    SEGT = np.ascontiguousarray(SEG.T)  # (SP, nq_pad)

    # equal-betas fast path constants: the total-count delta of flipping a
    # stabilizer's qubit q is OR(R0^mx, R1^mz) - OR(R0, R1), which is
    # MULTILINEAR in (R0, R1) per qubit — d_or = A + B R0 + C R1 + D R0R1
    # with small-integer planes determined by the op masks (mx, mz):
    #   (1,0): 1 - 2R0 -  R1 + 2P    (0,1): 1 -  R0 - 2R1 + 2P
    #   (1,1): 1 -  R0 -  R1         (0,0): 0
    # Evaluating this form is 7 VPU ops vs 11 for the XOR/OR chain, with
    # identical integer values (bit-identical kernel output).
    e10 = xop_all * (1.0 - zop_all)
    e01 = (1.0 - xop_all) * zop_all
    e11 = xop_all * zop_all
    DORC = np.zeros((n_colors, 4, nq_pad), np.float32)
    DORC[:, 0] = (e10 + e01 + e11)[:, 0]
    DORC[:, 1] = (-2.0 * e10 - e01 - e11)[:, 0]
    DORC[:, 2] = (-e10 - 2.0 * e01 - e11)[:, 0]
    DORC[:, 3] = (2.0 * e10 + 2.0 * e01)[:, 0]

    # trace-mode tables: transposed class readout (traces live in
    # (SP, TB) layout like the energy) and the 4 per-slot hash-coefficient
    # matrices (SP, nq_pad) with coefficients in [0, 64)
    ABT = np.ascontiguousarray(np.swapaxes(AB, 1, 2))  # (2, NBW, nq_pad)
    PWT = np.ascontiguousarray(PW.T)  # (SP, NBW)
    N_KEY = 4
    _rng = np.random.RandomState(0x5EED ^ (nq * 7919))
    KEYC = np.zeros((N_KEY, SP, nq_pad), np.float32)
    for c in range(N_KEY):
        coef = _rng.randint(0, 64, size=nq).astype(np.float32)
        for j in range(n_pack):
            KEYC[c, j, j * inner : j * inner + nq] = coef

    # distinct PRNG uses per ladder step (sweeps, mix, swaps) with slack
    uses_per_step = iters * n_colors + iters * (n_draws * 3 + 2) + 8
    TB = batch_tile
    NR = Nc * TB  # packed rows per tile: rung r in rows [r*TB, (r+1)*TB)

    def fxor(a, m):  # XOR of 0/1 floats (exact in bf16)
        return a + m - 2.0 * a * m

    def kernel(seed_ref, betas_ref, w_ref, sel_ref, xop_ref, zop_ref,
               ab_ref, drw_ref, seg_ref, brd_ref, brd2_ref, brdeq_ref,
               pw_ref, iotp_ref, iote_ref, segt_ref, abt_ref, pwt_ref,
               keyc_ref, dor_ref, st_ref, fl_ref, tp_ref,
               eq_ref, sb_ref, st_out, fl_out, tp_out, eq_out, sb_out,
               en_out, ba_out, bf_out, sw_out, *trace_and_scratch):
        # trailing refs: optional trace outputs, then the 3 VMEM scratch
        # buffers of the deferred readout (bottom-rung planes + burn gate)
        if track_traces:
            eqt_out, kt_out = trace_and_scratch[:2]
        sc0, sc1, scb = trace_and_scratch[-3:]
        seg_bf = seg_ref[:].astype(jnp.bfloat16)  # (nq_pad, SP)
        brd_bf = brd_ref[:].astype(jnp.bfloat16)  # (SP, nq_pad)
        brd2_bf = brd2_ref[:].astype(jnp.bfloat16)  # (SP, n_pos_out)
        brdeq_bf = brdeq_ref[:].astype(jnp.bfloat16)  # (SP, 128)
        pw_bf = pw_ref[:].astype(jnp.bfloat16)  # (NBW, SP)
        segt_bf = segt_ref[:].astype(jnp.bfloat16)  # (SP, nq_pad)

        def tmm(a, x):  # (R, nq_pad) x (TB, nq_pad) -> (R, TB)
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_sum_t(x):  # (TB, nq_pad) -> (SP, TB): rhs-transposed matmul
            return tmm(segt_bf, x)

        def mm(a, b):  # exact small-int bf16 matmul, f32 accumulate
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_sum(x):  # (R, nq_pad) -> (R, SP) per-slot sums
            return mm(x, seg_bf)

        def bcast(x):  # (TB, SP) -> (TB, nq_pad) per-slot broadcast
            return mm(x, brd_bf)

        def mod2(x):  # f32 integer-valued -> parity
            return x - 2.0 * jnp.floor(x * 0.5)

        # per-row rung betas for the packed acceptance test: row block r
        # (rows [r*TB, (r+1)*TB)) carries betas_ref[r] — built once from
        # SMEM scalars, (NR, 1) f32 columns
        rid = jax.lax.broadcasted_iota(jnp.int32, (NR, 1), 0) // TB
        bx_col = jnp.zeros((NR, 1), jnp.float32)
        by_col = bz_col = None
        if not equal_betas:
            by_col = jnp.zeros((NR, 1), jnp.float32)
            bz_col = jnp.zeros((NR, 1), jnp.float32)
        for r in range(Nc):
            is_r = (rid == r).astype(jnp.float32)
            bx_col = bx_col + is_r * betas_ref[r, 0]
            if not equal_betas:
                by_col = by_col + is_r * betas_ref[r, 1]
                bz_col = bz_col + is_r * betas_ref[r, 2]

        x = st_ref[:].astype(jnp.int32)  # (NR, nq_pad) packed rungs
        R0 = ((x & 1) ^ ((x >> 1) & 1)).astype(plane_dtype)
        R1 = ((x >> 1) & 1).astype(plane_dtype)
        fls = [fl_ref[r * TB : (r + 1) * TB].astype(jnp.int32)
               for r in range(Nc)]  # (TB, SP) each
        tops = tp_ref[:].astype(jnp.int32)  # (TB, SP)
        eq_count = eq_ref[:].astype(jnp.int32)  # (TB, 128)
        since = sb_ref[:].astype(jnp.int32)  # (TB, SP)
        burn_first = jnp.full((TB, SP), -1, jnp.int32)

        seed_base = (
            seed_ref[0, 0] * jnp.int32(40503) + pl.program_id(0)
        ) * jnp.int32(1000003)

        def rbits(shape, use, t):
            pltpu.prng_seed(seed_base + t * uses_per_step + use)
            bits = pltpu.prng_random_bits(shape)
            return jax.lax.shift_right_logical(
                pltpu.bitcast(bits, jnp.int32), 8
            )  # 24-bit non-negative

        def runif(shape, use, t):
            b24 = rbits(shape, use, t)
            return b24.astype(jnp.float32) * (1.0 / 16777216.0) + 1e-12

        sel_bfs = [sel_ref[c].astype(jnp.bfloat16) for c in range(n_colors)]
        selT_bfs = [s.T for s in sel_bfs]
        xops = [xop_ref[c] for c in range(n_colors)]
        zops = [zop_ref[c] for c in range(n_colors)]

        def one_step(t, carry):
            R0, R1 = carry[0], carry[1]
            fls = list(carry[2 : 2 + Nc])
            sws = list(carry[2 + Nc : 2 + 2 * Nc])
            tops, eq_count, since, burn_first = carry[2 + 2 * Nc :]
            use = 0

            # --- 1) iters colored sweeps, ALL rungs in one matmul chain --
            for it in range(iters):
                # ONE seed+generate+log per iteration covering every
                # (color, rung); leading-axis slices of the batched tensor
                # are free
                logu_all = jnp.log(runif((n_colors, NR, W_out), use, t))
                use += 1
                for c in range(n_colors):
                    xop, zop = xops[c], zops[c]
                    if equal_betas:
                        # total-count delta OR(new) - OR(old) in its
                        # multilinear form A + B R0 + C R1 + D R0R1 (see
                        # DORC above): same {-1, 0, 1} values (bf16-exact,
                        # bit-identical), 4 fewer VPU ops per color block
                        P = R0 * R1
                        d_or = (
                            dor_ref[c, 0:1].astype(plane_dtype)
                            + dor_ref[c, 1:2].astype(plane_dtype) * R0
                            + dor_ref[c, 2:3].astype(plane_dtype) * R1
                            + dor_ref[c, 3:4].astype(plane_dtype) * P
                        )
                        logr = -(bx_col * mm(d_or, selT_bfs[c]))
                    else:
                        nb0 = fxor(R0, xop.astype(plane_dtype))
                        nb1 = fxor(R1, zop.astype(plane_dtype))
                        d1 = nb0 * (1.0 - nb1) - R0 * (1.0 - R1)
                        d2 = nb0 * nb1 - R0 * R1
                        d3 = (1.0 - nb0) * nb1 - (1.0 - R0) * R1
                        logr = -(
                            bx_col * mm(d1, selT_bfs[c])
                            + by_col * mm(d2, selT_bfs[c])
                            + bz_col * mm(d3, selT_bfs[c])
                        )  # (NR, W_out)
                    accept = (logu_all[c] < logr).astype(jnp.bfloat16)
                    acc_q = jax.lax.dot_general(
                        accept, sel_bfs[c],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(plane_dtype)  # (NR, nq_pad) in {0, 1}
                    R0 = fxor(R0, xop.astype(plane_dtype) * acc_q)
                    R1 = fxor(R1, zop.astype(plane_dtype) * acc_q)

            # split into per-rung planes for mix / exchange / readout
            rows0 = [R0[r * TB : (r + 1) * TB] for r in range(Nc)]
            rows1 = [R1[r * TB : (r + 1) * TB] for r in range(Nc)]

            # --- 2) top-rung logical mix -------------------------------
            if p_logical > 0.0 and top_exact:
                # zero top betas: every gated proposal accepts
                # (src/mcmc.py:30) and Pauli XOR is linear over F2, so sum
                # all (iter, draw) one-hots first and contract each draw
                # table ONCE, taking parities at the end
                bT0, bT1 = rows0[Nc - 1], rows1[Nc - 1]
                u_gate = runif((iters, TB, SP), use, t)
                use += 1
                draw_bits = rbits((iters * 3 * n_draws, TB, SP), use, t)
                use += 1
                sum0 = jnp.zeros((TB, nq_pad), jnp.float32)
                sum1 = jnp.zeros((TB, nq_pad), jnp.float32)
                for i in range(n_draws):
                    ohx_sum = jnp.zeros((TB, n_pos_out), jnp.float32)
                    ohz_sum = jnp.zeros((TB, n_pos_out), jnp.float32)
                    for it in range(iters):
                        base = it * 3 * n_draws + 3 * i
                        opb = draw_bits[base] % 4
                        posx = draw_bits[base + 1] % n_pos[i]
                        posz = draw_bits[base + 2] % n_pos[i]
                        gate = (u_gate[it] < p_logical).astype(jnp.float32)
                        xflag = jnp.zeros((TB, SP), jnp.float32)
                        zflag = jnp.zeros((TB, SP), jnp.float32)
                        for o in range(4):
                            is_o = (opb == o).astype(jnp.float32)
                            xflag = xflag + is_o * float(lut[i][o][0])
                            zflag = zflag + is_o * float(lut[i][o][1])
                        posx_l = mm(posx.astype(jnp.float32), brd2_bf)
                        posz_l = mm(posz.astype(jnp.float32), brd2_bf)
                        ohx_sum = ohx_sum + (
                            iotp_ref[:] == posx_l
                        ).astype(jnp.float32) * mm(xflag * gate, brd2_bf)
                        ohz_sum = ohz_sum + (
                            iotp_ref[:] == posz_l
                        ).astype(jnp.float32) * mm(zflag * gate, brd2_bf)
                    sum0 = sum0 + mm(ohx_sum, drw_ref[i, 0].astype(jnp.bfloat16))
                    sum0 = sum0 + mm(ohz_sum, drw_ref[i, 2].astype(jnp.bfloat16))
                    sum1 = sum1 + mm(ohx_sum, drw_ref[i, 1].astype(jnp.bfloat16))
                    sum1 = sum1 + mm(ohz_sum, drw_ref[i, 3].astype(jnp.bfloat16))
                rows0[Nc - 1] = fxor(bT0, mod2(sum0).astype(plane_dtype))
                rows1[Nc - 1] = fxor(bT1, mod2(sum1).astype(plane_dtype))
            elif p_logical > 0.0:
                # general Metropolis mix (nonzero top betas, e.g. biased
                # ladders): iters sequential MH rounds
                bT0, bT1 = rows0[Nc - 1], rows1[Nc - 1]
                btx = betas_ref[Nc - 1, 0]
                bty = betas_ref[Nc - 1, 1]
                btz = betas_ref[Nc - 1, 2]
                for it in range(iters):
                    u_mix = runif((2, TB, SP), use, t)
                    use += 1
                    draw_bits = rbits((3 * n_draws, TB, SP), use, t)
                    use += 1
                    gate = (u_mix[0] < p_logical).astype(jnp.float32)
                    r0 = jnp.zeros((TB, nq_pad), jnp.float32)
                    r1 = jnp.zeros((TB, nq_pad), jnp.float32)
                    for i in range(n_draws):
                        opb = draw_bits[3 * i] % 4
                        posx = draw_bits[3 * i + 1] % n_pos[i]
                        posz = draw_bits[3 * i + 2] % n_pos[i]
                        xflag = jnp.zeros((TB, SP), jnp.float32)
                        zflag = jnp.zeros((TB, SP), jnp.float32)
                        for o in range(4):
                            is_o = (opb == o).astype(jnp.float32)
                            xflag = xflag + is_o * float(lut[i][o][0])
                            zflag = zflag + is_o * float(lut[i][o][1])
                        posx_l = mm(posx.astype(jnp.float32), brd2_bf)
                        posz_l = mm(posz.astype(jnp.float32), brd2_bf)
                        ohx = (iotp_ref[:] == posx_l).astype(
                            jnp.float32
                        ) * mm(xflag, brd2_bf)
                        ohz = (iotp_ref[:] == posz_l).astype(
                            jnp.float32
                        ) * mm(zflag, brd2_bf)
                        x0s = mm(ohx, drw_ref[i, 0].astype(jnp.bfloat16))
                        x1s = mm(ohx, drw_ref[i, 1].astype(jnp.bfloat16))
                        z0s = mm(ohz, drw_ref[i, 2].astype(jnp.bfloat16))
                        z1s = mm(ohz, drw_ref[i, 3].astype(jnp.bfloat16))
                        r0 = fxor(fxor(r0, x0s), z0s)
                        r1 = fxor(fxor(r1, x1s), z1s)
                    gate_q = bcast(gate)
                    m0 = (r0 * gate_q).astype(plane_dtype)
                    m1 = (r1 * gate_q).astype(plane_dtype)
                    nb0 = fxor(bT0, m0)
                    nb1 = fxor(bT1, m1)
                    dnx = seg_sum(nb0 * (1.0 - nb1) - bT0 * (1.0 - bT1))
                    dny = seg_sum(nb0 * nb1 - bT0 * bT1)
                    dnz = seg_sum((1.0 - nb0) * nb1 - (1.0 - bT0) * bT1)
                    logr = -(btx * dnx + bty * dny + btz * dnz)  # (TB, SP)
                    logu_m = jnp.log(u_mix[1])
                    acc_q = bcast(
                        (logu_m < logr).astype(jnp.float32)
                    ).astype(plane_dtype)
                    bT0 = fxor(bT0, m0 * acc_q)
                    bT1 = fxor(bT1, m1 * acc_q)
                rows0[Nc - 1] = bT0
                rows1[Nc - 1] = bT1

            # --- 3) replica-exchange sweep, top -> bottom ---------------
            # per-rung per-slot Pauli counts from the packed planes (with
            # the pre-mix top replaced): one segment matmul per component
            if "counts" in _DEBUG_SKIP:
                count_lists, u_sw = [], None
            elif equal_betas:
                # only total counts matter for the swap rule and energy
                R0m = jnp.concatenate(rows0, axis=0)  # (NR, nq_pad)
                R1m = jnp.concatenate(rows1, axis=0)
                NE = seg_sum(R0m + R1m - R0m * R1m)  # (NR, SP)
                count_lists = [
                    [NE[r * TB : (r + 1) * TB] for r in range(Nc)]
                ]
            else:
                R0m = jnp.concatenate(rows0, axis=0)  # (NR, nq_pad)
                R1m = jnp.concatenate(rows1, axis=0)
                NX = seg_sum(R0m * (1.0 - R1m))  # (NR, SP)
                NY = seg_sum(R0m * R1m)
                NZ = seg_sum((1.0 - R0m) * R1m)
                count_lists = [
                    [M[r * TB : (r + 1) * TB] for r in range(Nc)]
                    for M in (NX, NY, NZ)
                ]
            if "counts" not in _DEBUG_SKIP:
                u_sw = runif((Nc, TB, SP), use, t)
            use += 1

            def pair_logr(i):
                if equal_betas:
                    db = betas_ref[i + 1, 0] - betas_ref[i, 0]
                    nes = count_lists[0]
                    return db * (nes[i + 1] - nes[i])  # (TB, SP)
                nxs, nys, nzs = count_lists
                dbx = betas_ref[i + 1, 0] - betas_ref[i, 0]
                dby = betas_ref[i + 1, 1] - betas_ref[i, 1]
                dbz = betas_ref[i + 1, 2] - betas_ref[i, 2]
                return (
                    dbx * (nxs[i + 1] - nxs[i])
                    + dby * (nys[i + 1] - nys[i])
                    + dbz * (nzs[i + 1] - nzs[i])
                )  # (TB, SP)

            def apply_pair(i, acc):
                accf = acc.astype(jnp.float32)
                acci = acc.astype(jnp.int32)
                acc_q = bcast(accf).astype(plane_dtype)  # (TB, nq_pad)
                for lst in (rows0, rows1):
                    hi, lo = lst[i + 1], lst[i]
                    lst[i] = lo + acc_q * (hi - lo)
                    lst[i + 1] = hi + acc_q * (lo - hi)
                for lst in count_lists:
                    hi, lo = lst[i + 1], lst[i]
                    lst[i] = lo + accf * (hi - lo)
                    lst[i + 1] = hi + accf * (lo - hi)
                hi, lo = fls[i + 1], fls[i]
                fls[i] = lo + acci * (hi - lo)
                fls[i + 1] = hi + acci * (lo - hi)
                sws[i] = sws[i] + acci  # swap-acceptance observability

            if exchange == "even_odd":
                # two phases of disjoint adjacent pairs: all even pairs'
                # acceptances are computed from the SAME pre-phase counts
                # (valid — the pairs share no rungs), then all odd pairs.
                # Removes the serial cross-pair dependence chain of the
                # top->bottom sweep (SURVEY §7.1 #4 equivalence).
                for phase in (0, 1):
                    pairs = list(range(phase, Nc - 1, 2))
                    accs = [
                        jnp.log(u_sw[i]) < pair_logr(i) for i in pairs
                    ]
                    for i, acc in zip(pairs, accs):
                        apply_pair(i, acc)
            elif exchange == "none":
                # ablation only — NOT a valid sampler (rungs never
                # exchange): isolates the exchange sub-phase's cost in
                # the roofline decomposition (RESULTS.md)
                pass
            else:
                for i in reversed(range(Nc - 1)):
                    apply_pair(i, jnp.log(u_sw[i]) < pair_logr(i))

            # --- 4) flag / tops0 bookkeeping (src/mcmc.py:100-103) ------
            if "flags" not in _DEBUG_SKIP:
                fls[Nc - 1] = jnp.ones((TB, SP), jnp.int32)
                hit = (fls[0] == 1).astype(jnp.int32)  # (TB, SP)
                tops = tops + hit
                fls[0] = fls[0] * (1 - hit)

            # --- 5) bottom-rung observation (deferred readout) ----------
            # The full class readout + histogram + energy chain used to
            # run here per step (~5 matmuls + ~18 small VPU ops); now the
            # step only SNAPSHOTS the bottom-rung planes and the burn
            # gate into VMEM scratch, and the histogram/energy math runs
            # once per ``energy_chunk`` steps over the whole chunk in a
            # few batched matmuls (the fold in one_chunk below).  The
            # accumulated eq_count/since are bit-identical: the burn gate
            # is stored per step, so the fold applies the exact per-step
            # gating of decoders.py:63-68.  (Round-5 measurement note:
            # this was built to attack VERDICT r4's "~26 ms readout
            # floor", which turned out to be the remote-tunnel RTT, not
            # readout — see the _DEBUG_SKIP note above.  The deferred
            # form is kept: ~1-2 ms faster and the readout cost now
            # scales O(1/energy_chunk) instead of O(1) per step.)
            b0 = rows0[0]
            b1 = rows1[0]
            if "obs" not in _DEBUG_SKIP:
                c = t - (t // energy_chunk) * energy_chunk  # step in chunk
                burned = (tops >= tops_burn).astype(jnp.int32)  # (TB, SP)
                since = since + burned
                newly = (burn_first < 0) & (burned > 0)
                burn_first = jnp.where(
                    newly, jnp.zeros((TB, SP), jnp.int32) + t, burn_first
                )
                sc0[pl.ds(c * TB, TB), :] = b0.astype(sc0.dtype)
                sc1[pl.ds(c * TB, TB), :] = b1.astype(sc1.dtype)
                scb[pl.ds(c * TB, TB), :] = burned.astype(jnp.float32)
            if track_traces:
                # transposed class readout: traces live in (SP, TB) layout
                featsT = tmm(abt_ref[0], b0) + tmm(abt_ref[1], b1)
                bitsT = mm(pwt_ref[:], mod2(featsT).astype(jnp.bfloat16))
                bits_ti = bitsT.astype(jnp.int32)  # (SP, TB)
                if bits_to_eq == list(range(len(bits_to_eq))):
                    eqT = bits_ti
                else:
                    eqT = jnp.zeros((SP, TB), jnp.int32)
                    for v2 in range(len(bits_to_eq)):
                        eqT = eqT + (
                            bits_ti == v2
                        ).astype(jnp.int32) * bits_to_eq[v2]
                eqt_out[pl.ds(t * SP, SP), :] = eqT
                # 4-component exact hash of the bottom chain's Pauli values
                vq = b0 + 3.0 * b1 - 2.0 * b0 * b1  # (TB, nq_pad) in {0..3}
                for c2 in range(N_KEY):
                    kT = tmm(keyc_ref[c2], vq)  # (SP, TB), integer < 2^18
                    kt_out[c2, pl.ds(t * SP, SP), :] = kT.astype(jnp.int32)
            if "cat" not in _DEBUG_SKIP:
                R0 = jnp.concatenate(rows0, axis=0)
                R1 = jnp.concatenate(rows1, axis=0)
            # else: keep the post-sweep packed planes (valid only when mix
            # and exchange are both off — measurement ablation)
            return (R0, R1) + tuple(fls) + tuple(sws) + (
                tops, eq_count, since, burn_first
            )

        en_out[:] = jnp.zeros((n_chunks * SP, TB), jnp.float32)
        sws = [jnp.zeros((TB, SP), jnp.int32) for _ in range(Nc)]
        carry = (R0, R1) + tuple(fls) + tuple(sws) + (
            tops, eq_count, since, burn_first
        )

        ab0_bf = ab_ref[0].astype(jnp.bfloat16)
        ab1_bf = ab_ref[1].astype(jnp.bfloat16)
        EQI = 2 + 2 * Nc + 1  # carry index of eq_count

        def one_chunk(tc, carry):
            def inner(c, carry):
                return one_step(tc * energy_chunk + c, carry)

            carry = jax.lax.fori_loop(0, energy_chunk, inner, carry)
            if "fold" in _DEBUG_SKIP:
                return carry
            # ---- deferred-readout fold: one batched class readout +
            # histogram + energy over the whole chunk (C steps of scratch)
            eq_count = carry[EQI]
            P0 = sc0[:].astype(jnp.float32)  # (C*TB, nq_pad) 0/1 planes
            P1 = sc1[:].astype(jnp.float32)
            G = scb[:]  # (C*TB, SP) burn gate per step
            feats = mm(P0, ab0_bf) + mm(P1, ab1_bf)  # (C*TB, NBW)
            bits = mm(mod2(feats), pw_bf).astype(jnp.int32)  # (C*TB, SP)
            if bits_to_eq == list(range(len(bits_to_eq))):
                eq_idx = bits  # identity bit->class map (e.g. toric)
            else:
                eq_idx = jnp.zeros_like(bits)
                for v in range(len(bits_to_eq)):
                    eq_idx = eq_idx + (
                        bits == v
                    ).astype(jnp.int32) * bits_to_eq[v]
            eq_l = mm(eq_idx.astype(jnp.float32), brdeq_bf)  # (C*TB, 128)
            g_l = mm(G, brdeq_bf)
            onehot = (
                (iote_ref[:] == eq_l).astype(jnp.float32) * g_l
            ).astype(jnp.int32)
            for c2 in range(energy_chunk):  # row-block histogram reduce
                eq_count = eq_count + onehot[c2 * TB : (c2 + 1) * TB]
            # energy chunk mean: accumulate the small-integer component
            # planes across the chunk FIRST (values <= C, bf16-exact), then
            # one segment matmul per component into the (SP, TB) layout
            if equal_betas:
                orp = P0 + P1 - P0 * P1
                acc = orp[:TB]
                for c2 in range(1, energy_chunk):
                    acc = acc + orp[c2 * TB : (c2 + 1) * TB]
                en_row = w_ref[0, 0] * seg_sum_t(acc)
            else:
                comps = (P0 * (1.0 - P1), P0 * P1, (1.0 - P0) * P1)
                en_row = jnp.zeros((SP, TB), jnp.float32)
                for ci, comp in enumerate(comps):
                    acc = comp[:TB]
                    for c2 in range(1, energy_chunk):
                        acc = acc + comp[c2 * TB : (c2 + 1) * TB]
                    en_row = en_row + w_ref[0, ci] * seg_sum_t(acc)
            en_out[pl.ds(tc * SP, SP), :] = en_row * (1.0 / energy_chunk)
            return carry[:EQI] + (eq_count,) + carry[EQI + 1 :]

        carry = jax.lax.fori_loop(0, n_chunks, one_chunk, carry)
        R0, R1 = carry[0], carry[1]
        fls = carry[2 : 2 + Nc]
        sws = carry[2 + Nc : 2 + 2 * Nc]
        tops, eq_count, since, burn_first = carry[2 + 2 * Nc :]

        xi = R0.astype(jnp.int32)
        zi = R1.astype(jnp.int32)
        st_out[:] = ((xi * 1) ^ (zi * 3)).astype(jnp.uint8)
        for r in range(Nc):
            fl_out[r * TB : (r + 1) * TB] = fls[r]
            sw_out[r * TB : (r + 1) * TB] = sws[r]
        tp_out[:] = tops
        eq_out[:] = eq_count
        sb_out[:] = since
        ba_out[:] = (burn_first >= 0).astype(jnp.int32)
        bf_out[:] = jnp.maximum(burn_first, 0)

    def raw(state, flag, tops0, eq_count, since_burn, seed, betas, weights):
        B0 = state.shape[0]
        n_rows = _round_up(-(-B0 // n_pack), TB)
        n_tiles = n_rows // TB
        Bp = n_rows * n_pack
        # rung-major packed layout: syndrome b = row * n_pack + slot lives
        # in lanes [slot*inner, slot*inner+nq) of its row
        stp = jnp.zeros((Bp, Nc, nq), jnp.uint8).at[:B0].set(state)
        stp = jnp.moveaxis(stp, 1, 0).reshape(Nc, n_rows, n_pack, nq)
        st = (
            jnp.zeros((Nc, n_rows, n_pack, inner), jnp.uint8)
            .at[..., :nq].set(stp)
            .reshape(Nc, n_rows, n_pack * inner)
        )
        if n_pack * inner < nq_pad:
            st = (
                jnp.zeros((Nc, n_rows, nq_pad), jnp.uint8)
                .at[..., : n_pack * inner].set(st)
            )
        # tile-major rung packing: tile i's block is rows
        # [i*Nc*TB, (i+1)*Nc*TB) with rung r in its [r*TB, (r+1)*TB) slice
        st = (
            st.reshape(Nc, n_tiles, TB, nq_pad)
            .transpose(1, 0, 2, 3)
            .reshape(n_tiles * NR, nq_pad)
        )
        flp = jnp.moveaxis(
            jnp.zeros((Bp, Nc), jnp.int32).at[:B0].set(flag), 1, 0
        ).reshape(Nc, n_rows, n_pack)
        fl = jnp.zeros((Nc, n_rows, SP), jnp.int32).at[:, :, :n_pack].set(flp)
        fl = (
            fl.reshape(Nc, n_tiles, TB, SP)
            .transpose(1, 0, 2, 3)
            .reshape(n_tiles * NR, SP)
        )
        tp = jnp.zeros((n_rows, SP), jnp.int32).at[:, :n_pack].set(
            jnp.zeros((Bp,), jnp.int32).at[:B0].set(tops0)
            .reshape(n_rows, n_pack)
        )
        eqp = (
            jnp.zeros((Bp, K), jnp.int32).at[:B0].set(eq_count)
            .reshape(n_rows, n_pack, K)
        )
        eq = (
            jnp.zeros((n_rows, SP, EQW), jnp.int32)
            .at[:, :n_pack, :K].set(eqp)
            .reshape(n_rows, 128)
        )
        sb = jnp.zeros((n_rows, SP), jnp.int32).at[:, :n_pack].set(
            jnp.zeros((Bp,), jnp.int32).at[:B0].set(since_burn)
            .reshape(n_rows, n_pack)
        )
        seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        betas2 = jnp.asarray(betas, jnp.float32).reshape(Nc, 3)
        w2 = jnp.asarray(weights, jnp.float32).reshape(1, 3)

        grid = (n_tiles,)
        vmem = pltpu.VMEM
        consts = [
            pl.BlockSpec(memory_space=vmem) for _ in range(17)
        ]
        trace_out_specs = []
        trace_out_shapes = []
        if track_traces:
            trace_out_specs = [
                pl.BlockSpec((window * SP, TB), lambda i: (0, i),
                             memory_space=vmem),
                pl.BlockSpec((N_KEY, window * SP, TB), lambda i: (0, 0, i),
                             memory_space=vmem),
            ]
            trace_out_shapes = [
                jax.ShapeDtypeStruct((window * SP, n_rows), jnp.int32),
                jax.ShapeDtypeStruct((N_KEY, window * SP, n_rows),
                                     jnp.int32),
            ]
        limit = scoped_vmem_limit()
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),  # betas
                pl.BlockSpec(memory_space=pltpu.SMEM),  # weights
                *consts,  # sel,xop,zop,AB,DRW,SEG,BRD,BRD2,BRDEQ,PW,IOTP,
                #           IOTE,SEGT,ABT,PWT,KEYC,DORC
                pl.BlockSpec((NR, nq_pad), lambda i: (i, 0),
                             memory_space=vmem),
                pl.BlockSpec((NR, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
            ],
            out_specs=[
                pl.BlockSpec((NR, nq_pad), lambda i: (i, 0),
                             memory_space=vmem),
                pl.BlockSpec((NR, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((n_chunks * SP, TB), lambda i: (0, i),
                             memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((NR, SP), lambda i: (i, 0), memory_space=vmem),
                *trace_out_specs,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * NR, nq_pad), jnp.uint8),
                jax.ShapeDtypeStruct((n_tiles * NR, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_chunks * SP, n_rows), jnp.float32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_tiles * NR, SP), jnp.int32),
                *trace_out_shapes,
            ],
            # deferred-readout scratch: one chunk of bottom-rung planes +
            # the per-step burn gate (see the fold in one_chunk)
            scratch_shapes=[
                pltpu.VMEM((energy_chunk * TB, nq_pad), plane_dtype),
                pltpu.VMEM((energy_chunk * TB, nq_pad), plane_dtype),
                pltpu.VMEM((energy_chunk * TB, SP), jnp.float32),
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
            # larger codes (d >= 9: nq_pad 256+, Nc = d rungs) need more
            # scoped VMEM than the compiler's default 16 MiB ceiling; the
            # cap is derived from the detected device VMEM (None keeps the
            # compiler default on small-VMEM generations)
            compiler_params=(
                None if interpret or limit is None
                else pltpu.CompilerParams(vmem_limit_bytes=limit)
            ),
        )(seed2, betas2, w2, jnp.asarray(sel_all), jnp.asarray(xop_all),
          jnp.asarray(zop_all), jnp.asarray(AB), jnp.asarray(DRW),
          jnp.asarray(SEG), jnp.asarray(BRD), jnp.asarray(BRD2),
          jnp.asarray(BRDEQ), jnp.asarray(PW), jnp.asarray(IOTP),
          jnp.asarray(IOTE), jnp.asarray(SEGT), jnp.asarray(ABT),
          jnp.asarray(PWT), jnp.asarray(KEYC), jnp.asarray(DORC),
          st, fl, tp, eq, sb)
        if track_traces:
            eqt_o, kt_o = out[9], out[10]
            out = out[:9]
        st_o, fl_o, tp_o, eq_o, sb_o, en_o, ba_o, bf_o, sw_o = out
        # undo the tile-major rung packing
        st_o = (
            st_o.reshape(n_tiles, Nc, TB, nq_pad)
            .transpose(1, 0, 2, 3)
            .reshape(Nc, n_rows, nq_pad)
        )
        fl_o = (
            fl_o.reshape(n_tiles, Nc, TB, SP)
            .transpose(1, 0, 2, 3)
            .reshape(Nc, n_rows, SP)
        )
        sw_o = (
            sw_o.reshape(n_tiles, Nc, TB, SP)
            .transpose(1, 0, 2, 3)
            .reshape(Nc, n_rows, SP)
        )

        def unpack_slot(a):  # (n_rows, SP) -> (B0,)
            return a[:, :n_pack].reshape(Bp)[:B0]

        state_o = jnp.moveaxis(
            st_o[..., : n_pack * inner]
            .reshape(Nc, n_rows, n_pack, inner)[..., :nq]
            .reshape(Nc, Bp, nq),
            0, 1,
        )[:B0]
        flag_o = jnp.moveaxis(
            fl_o[:, :, :n_pack].reshape(Nc, Bp), 0, 1
        )[:B0]
        eq_out2 = (
            eq_o.reshape(n_rows, SP, EQW)[:, :n_pack, :K]
            .reshape(Bp, K)[:B0]
        )
        en_out2 = jnp.moveaxis(
            en_o.reshape(n_chunks, SP, n_rows), 1, 2
        )[:, :, :n_pack].reshape(n_chunks, Bp)[:, :B0]
        swap_o = jnp.moveaxis(
            sw_o[:, :, :n_pack].reshape(Nc, Bp), 0, 1
        )[:B0, : Nc - 1]
        res = (
            state_o,
            flag_o,
            unpack_slot(tp_o),
            eq_out2,
            unpack_slot(sb_o),
            en_out2,
            unpack_slot(ba_o) > 0,
            unpack_slot(bf_o),
            swap_o,
        )
        if track_traces:
            eq_tr = jnp.moveaxis(
                eqt_o.reshape(window, SP, n_rows), 1, 2
            )[:, :, :n_pack].reshape(window, Bp)[:, :B0]
            key_tr = jnp.moveaxis(
                jnp.moveaxis(
                    kt_o.reshape(N_KEY, window, SP, n_rows), 2, 3
                )[:, :, :, :n_pack].reshape(N_KEY, window, Bp)[:, :, :B0],
                0, -1,
            )  # (window, B0, N_KEY)
            res = res + (eq_tr, key_tr)
        return res

    return raw
