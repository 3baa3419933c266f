"""Fused Pallas TPU kernel: a full PTEQ window in VMEM.

One kernel invocation runs ``window`` parallel-tempering ladder steps for a
batch tile of syndromes — per step: ``iters`` colored Metropolis sweeps on
every rung (per-rung betas), Metropolis logical mixing on the top rung
(general top-rung betas: for the standard zero-beta tops the acceptance is
identically 1, reproducing src/mcmc.py:30's always-accept; for biased
ladders, src/mcmc_biased.py:66-124, the exact log-ratio test runs fused),
the sequential top->bottom replica-exchange sweep with flag/tops0
bookkeeping (src/mcmc.py:94-103), bottom-rung equivalence-class readout and
post-burn class-occupation accumulation — with the ladder state resident in
VMEM throughout.  This removes the per-step XLA op overhead that dominates
the unfused window (ops/metropolis + mcmc/ladder path) and lets PTEQ run at
low ``iters`` (frequent replica exchange) where convergence needs ~2.5x
fewer total sweeps.

Chain packing: small codes (nq <= 64) pack ``n_pack = 128 // round_up(nq,
32)`` independent syndromes side by side in each 128-lane row (same scheme
as ops/pallas_sweep.py): the per-color stabilizer contractions become
block-diagonal selector matmuls, and every per-syndrome scalar (swap
accepts, Pauli counts, flags, tops0, class index, energy) lives in a
(rows, 8)-slot layout reduced/broadcast with tiny segment matmuls.  At
toric d=5 this doubles the syndromes per VMEM byte and per MXU tile; at
d=3 it quadruples them.

Restrictions (the general path in mcmc/ladder.py covers the rest):
- no track_shortest extras;
- TPU only (pltpu PRNG) unless ``interpret=True``.  Statistical
  equivalence with the XLA window is validated on-chip in
  tests/test_pallas_ladder.py (skipped off-TPU).

Sweep math is identical to ops/pallas_sweep.py (bf16 MXU contractions of
exactly-representable small integers, f32 accumulation).  Everything in
the kernel is per-rung 2D (TB, lanes) — Mosaic rejects 1D<->3D shape
casts/stacks, so the ladder is a static tuple of row arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import CodeSpec
from .dense_sweep import _color_tables

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
             window) — the `_get_window_fn` contract.  ``energy_chunk`` > 1 coarsens the energy
    trace on device (the host convergence check needs only windowed means;
    fetching per-step traces over the remote-TPU tunnel dominates the host
    loop otherwise).

    ``interpret`` runs the kernel through the TPU interpreter
    (pltpu.InterpretParams) so the full fused dataflow executes on CPU —
    used by the multi-device shard_map tests and dryrun_multichip.  The
    interpreter stubs prng_random_bits to zeros, so interpret runs validate
    shapes/dataflow/sharding and syndrome-preservation invariants, not
    statistics (the statistical check is the on-TPU test in
    tests/test_pallas_ladder.py).
    """
    assert window % energy_chunk == 0
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

    # distinct PRNG uses per ladder step (sweeps, mix, swaps) with slack
    uses_per_step = iters * n_colors + iters * (n_draws * 3 + 2) + 8
    TB = batch_tile

    def fxor(a, m):  # XOR of 0/1 floats
        return a + m - 2.0 * a * m

    def kernel(seed_ref, betas_ref, w_ref, sel_ref, xop_ref, zop_ref,
               ab_ref, drw_ref, seg_ref, brd_ref, brd2_ref, brdeq_ref,
               pw_ref, iotp_ref, iote_ref, segt_ref, st_ref, fl_ref, tp_ref,
               eq_ref, sb_ref, st_out, fl_out, tp_out, eq_out, sb_out,
               en_out, ba_out, bf_out, sw_out):
        seg_bf = seg_ref[:].astype(jnp.bfloat16)  # (nq_pad, SP)
        brd_bf = brd_ref[:].astype(jnp.bfloat16)  # (SP, nq_pad)
        brd2_bf = brd2_ref[:].astype(jnp.bfloat16)  # (SP, n_pos_out)
        brdeq_bf = brdeq_ref[:].astype(jnp.bfloat16)  # (SP, 128)
        pw_bf = pw_ref[:].astype(jnp.bfloat16)  # (NBW, SP)
        segt_bf = segt_ref[:].astype(jnp.bfloat16)  # (SP, nq_pad)

        def seg_sum_t(x):  # (TB, nq_pad) -> (SP, TB): rhs-transposed matmul
            return jax.lax.dot_general(
                segt_bf, x.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def mm(a, b):  # exact small-int bf16 matmul, f32 accumulate
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_sum(x):  # (TB, nq_pad) -> (TB, SP) per-slot sums
            return mm(x, seg_bf)

        def bcast(x):  # (TB, SP) -> (TB, nq_pad) per-slot broadcast
            return mm(x, brd_bf)

        rows0, rows1, fls = [], [], []
        for i in range(Nc):
            x = st_ref[i].astype(jnp.int32)  # (TB, nq_pad)
            rows0.append(((x & 1) ^ ((x >> 1) & 1)).astype(jnp.float32))
            rows1.append(((x >> 1) & 1).astype(jnp.float32))
            fls.append(fl_ref[i].astype(jnp.int32))  # (TB, SP)
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

        def one_step(t, carry):
            rows0 = list(carry[0:Nc])
            rows1 = list(carry[Nc : 2 * Nc])
            fls = list(carry[2 * Nc : 3 * Nc])
            sws = list(carry[3 * Nc : 4 * Nc])
            tops, eq_count, since, burn_first = carry[4 * Nc :]
            use = 0

            # --- 1) iters colored sweeps on every rung ------------------
            for it in range(iters):
                # ONE seed+generate+log per iteration covering every
                # (color, rung): the kernel is issue-bound and per-color
                # PRNG round-trips are a large share of the non-MXU work;
                # leading-axis slices of the batched tensor are free
                logu_all = jnp.log(
                    runif((n_colors * Nc, TB, W_out), use, t)
                )
                use += 1
                for c in range(n_colors):
                    sel = sel_ref[c]  # (W_out, nq_pad) block-diagonal
                    xop = xop_ref[c]  # (1, nq_pad)
                    zop = zop_ref[c]
                    sel_bf = sel.astype(jnp.bfloat16)
                    selT_bf = sel_bf.T
                    logu = logu_all[c * Nc : (c + 1) * Nc]
                    for r in range(Nc):
                        b0, b1 = rows0[r], rows1[r]
                        nb0 = fxor(b0, xop)
                        nb1 = fxor(b1, zop)
                        d1 = nb0 * (1.0 - nb1) - b0 * (1.0 - b1)
                        d2 = nb0 * nb1 - b0 * b1
                        d3 = (1.0 - nb0) * nb1 - (1.0 - b0) * b1
                        logr = -(
                            betas_ref[r, 0] * mm(d1, selT_bf)
                            + betas_ref[r, 1] * mm(d2, selT_bf)
                            + betas_ref[r, 2] * mm(d3, selT_bf)
                        )  # (TB, W_out)
                        accept = (logu[r] < logr).astype(jnp.bfloat16)
                        acc_q = jax.lax.dot_general(
                            accept, sel_bf,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (TB, nq_pad)
                        rows0[r] = fxor(b0, xop * acc_q)
                        rows1[r] = fxor(b1, zop * acc_q)

            # --- 2) top-rung logical mix (Metropolis; zero betas ->
            #        log r == 0 -> always accept, src/mcmc.py:30) ---------
            if p_logical > 0.0:
                bT0, bT1 = rows0[Nc - 1], rows1[Nc - 1]
                btx = betas_ref[Nc - 1, 0]
                bty = betas_ref[Nc - 1, 1]
                btz = betas_ref[Nc - 1, 2]
                for it in range(iters):
                    # batched PRNG: one uniform generate for gate +
                    # mix-accept, one bits generate for every draw's
                    # (op, posx, posz) triple
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
                        # one-hot position per slot segment, pre-gated by
                        # the op's component flag
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
                    m0 = r0 * gate_q
                    m1 = r1 * gate_q
                    nb0 = fxor(bT0, m0)
                    nb1 = fxor(bT1, m1)
                    dnx = seg_sum(nb0 * (1.0 - nb1) - bT0 * (1.0 - bT1))
                    dny = seg_sum(nb0 * nb1 - bT0 * bT1)
                    dnz = seg_sum((1.0 - nb0) * nb1 - (1.0 - bT0) * bT1)
                    logr = -(btx * dnx + bty * dny + btz * dnz)  # (TB, SP)
                    logu_m = jnp.log(u_mix[1])
                    acc_q = bcast((logu_m < logr).astype(jnp.float32))
                    bT0 = fxor(bT0, m0 * acc_q)
                    bT1 = fxor(bT1, m1 * acc_q)
                rows0[Nc - 1] = bT0
                rows1[Nc - 1] = bT1

            # --- 3) replica-exchange sweep, top -> bottom ---------------
            # per-rung per-slot Pauli counts (TB, SP)
            nxs = [seg_sum(rows0[i] * (1.0 - rows1[i])) for i in range(Nc)]
            nys = [seg_sum(rows0[i] * rows1[i]) for i in range(Nc)]
            nzs = [seg_sum((1.0 - rows0[i]) * rows1[i]) for i in range(Nc)]
            u_sw = runif((Nc, TB, SP), use, t)
            use += 1
            for i in reversed(range(Nc - 1)):
                dbx = betas_ref[i + 1, 0] - betas_ref[i, 0]
                dby = betas_ref[i + 1, 1] - betas_ref[i, 1]
                dbz = betas_ref[i + 1, 2] - betas_ref[i, 2]
                logr = (
                    dbx * (nxs[i + 1] - nxs[i])
                    + dby * (nys[i + 1] - nys[i])
                    + dbz * (nzs[i + 1] - nzs[i])
                )  # (TB, SP)
                acc = jnp.log(u_sw[i]) < logr  # (TB, SP)
                accf = acc.astype(jnp.float32)
                acci = acc.astype(jnp.int32)
                acc_q = bcast(accf)  # (TB, nq_pad)
                for lst in (rows0, rows1):
                    hi, lo = lst[i + 1], lst[i]
                    lst[i] = lo + acc_q * (hi - lo)
                    lst[i + 1] = hi + acc_q * (lo - hi)
                for lst in (nxs, nys, nzs):
                    hi, lo = lst[i + 1], lst[i]
                    lst[i] = lo + accf * (hi - lo)
                    lst[i + 1] = hi + accf * (lo - hi)
                hi, lo = fls[i + 1], fls[i]
                fls[i] = lo + acci * (hi - lo)
                fls[i + 1] = hi + acci * (lo - hi)
                sws[i] = sws[i] + acci  # swap-acceptance observability

            # --- 4) flag / tops0 bookkeeping (src/mcmc.py:100-103) ------
            fls[Nc - 1] = jnp.ones((TB, SP), jnp.int32)
            hit = (fls[0] == 1).astype(jnp.int32)  # (TB, SP)
            tops = tops + hit
            fls[0] = fls[0] * (1 - hit)

            # --- 5) bottom-rung class readout + accumulators ------------
            feats = mm(rows0[0], ab_ref[0].astype(jnp.bfloat16)) + mm(
                rows1[0], ab_ref[1].astype(jnp.bfloat16)
            )  # (TB, NBW) integer-valued
            par = feats - 2.0 * jnp.floor(feats * 0.5)  # mod 2
            bits = mm(par, pw_bf).astype(jnp.int32)  # (TB, SP) class bits
            burned = (tops >= tops_burn).astype(jnp.int32)  # (TB, SP)
            eq_idx = jnp.zeros((TB, SP), jnp.int32)
            for v in range(len(bits_to_eq)):
                eq_idx = eq_idx + (bits == v).astype(jnp.int32) * bits_to_eq[v]
            eq_l = mm(eq_idx.astype(jnp.float32), brdeq_bf)  # (TB, 128)
            burned_l = mm(burned.astype(jnp.float32), brdeq_bf)
            onehot = (iote_ref[:] == eq_l).astype(jnp.float32) * burned_l
            eq_count = eq_count + onehot.astype(jnp.int32)
            since = since + burned
            newly = (burn_first < 0) & (burned > 0)
            burn_first = jnp.where(
                newly, jnp.zeros((TB, SP), jnp.int32) + t, burn_first
            )
            # energy in (SP, TB) layout so the trace buffer keeps TB in the
            # lane dim (slot-lane layouts would pad 8 -> 128 lanes in VMEM)
            b0, b1 = rows0[0], rows1[0]
            energy_t = (
                w_ref[0, 0] * seg_sum_t(b0 * (1.0 - b1))
                + w_ref[0, 1] * seg_sum_t(b0 * b1)
                + w_ref[0, 2] * seg_sum_t((1.0 - b0) * b1)
            )  # (SP, TB)
            # accumulate chunk means in place (en_out zeroed at kernel start)
            tc = t // energy_chunk
            en_out[pl.ds(tc * SP, SP), :] += energy_t * (1.0 / energy_chunk)
            return tuple(rows0) + tuple(rows1) + tuple(fls) + tuple(sws) + (
                tops, eq_count, since, burn_first
            )

        en_out[:] = jnp.zeros((n_chunks * SP, TB), jnp.float32)
        sws = [jnp.zeros((TB, SP), jnp.int32) for _ in range(Nc)]
        carry = tuple(rows0) + tuple(rows1) + tuple(fls) + tuple(sws) + (
            tops, eq_count, since, burn_first
        )
        carry = jax.lax.fori_loop(0, window, one_step, carry)
        rows0 = carry[0:Nc]
        rows1 = carry[Nc : 2 * Nc]
        fls = carry[2 * Nc : 3 * Nc]
        sws = carry[3 * Nc : 4 * Nc]
        tops, eq_count, since, burn_first = carry[4 * Nc :]

        for i in range(Nc):
            xi = rows0[i].astype(jnp.int32)
            zi = rows1[i].astype(jnp.int32)
            st_out[i] = ((xi * 1) ^ (zi * 3)).astype(jnp.uint8)
            fl_out[i] = fls[i]
            sw_out[i] = sws[i]
        tp_out[:] = tops
        eq_out[:] = eq_count
        sb_out[:] = since
        ba_out[:] = (burn_first >= 0).astype(jnp.int32)
        bf_out[:] = jnp.maximum(burn_first, 0)

    def raw(state, flag, tops0, eq_count, since_burn, seed, betas, weights):
        B0 = state.shape[0]
        n_rows = _round_up(-(-B0 // n_pack), TB)
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
        flp = jnp.moveaxis(
            jnp.zeros((Bp, Nc), jnp.int32).at[:B0].set(flag), 1, 0
        ).reshape(Nc, n_rows, n_pack)
        fl = jnp.zeros((Nc, n_rows, SP), jnp.int32).at[:, :, :n_pack].set(flp)
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

        grid = (n_rows // TB,)
        vmem = pltpu.VMEM
        consts = [
            pl.BlockSpec(memory_space=vmem) for _ in range(13)
        ]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),  # betas
                pl.BlockSpec(memory_space=pltpu.SMEM),  # weights
                *consts,  # sel,xop,zop,AB,DRW,SEG,BRD,BRD2,BRDEQ,PW,IOTP,
                #           IOTE,SEGT
                pl.BlockSpec((Nc, TB, nq_pad), lambda i: (0, i, 0),
                             memory_space=vmem),
                pl.BlockSpec((Nc, TB, SP), lambda i: (0, i, 0),
                             memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
            ],
            out_specs=[
                pl.BlockSpec((Nc, TB, nq_pad), lambda i: (0, i, 0),
                             memory_space=vmem),
                pl.BlockSpec((Nc, TB, SP), lambda i: (0, i, 0),
                             memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((n_chunks * SP, TB), lambda i: (0, i),
                             memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((TB, SP), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((Nc, TB, SP), lambda i: (0, i, 0),
                             memory_space=vmem),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Nc, n_rows, nq_pad), jnp.uint8),
                jax.ShapeDtypeStruct((Nc, n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_chunks * SP, n_rows), jnp.float32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((n_rows, SP), jnp.int32),
                jax.ShapeDtypeStruct((Nc, n_rows, SP), jnp.int32),
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
            # larger codes (d >= 9: nq_pad 256+, Nc = d rungs) need more
            # scoped VMEM than the compiler's default 16 MiB ceiling
            # (d=9/window=600 wants ~18 MiB of stack); v5e has 128 MiB of
            # VMEM, so raise the per-kernel cap instead of shrinking the
            # batch tile and wasting MXU occupancy
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(seed2, betas2, w2, jnp.asarray(sel_all), jnp.asarray(xop_all),
          jnp.asarray(zop_all), jnp.asarray(AB), jnp.asarray(DRW),
          jnp.asarray(SEG), jnp.asarray(BRD), jnp.asarray(BRD2),
          jnp.asarray(BRDEQ), jnp.asarray(PW), jnp.asarray(IOTP),
          jnp.asarray(IOTE), jnp.asarray(SEGT), st, fl, tp, eq, sb)
        st_o, fl_o, tp_o, eq_o, sb_o, en_o, ba_o, bf_o, sw_o = out

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
        return (
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

    return raw
