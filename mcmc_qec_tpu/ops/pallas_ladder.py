"""Fused Pallas TPU kernel: a full PTEQ window in VMEM.

One kernel invocation runs ``window`` parallel-tempering ladder steps for a
batch tile of syndromes — per step: ``iters`` colored Metropolis sweeps on
every rung (per-rung betas), always-accept logical mixing on the zero-beta
top rung, the sequential top->bottom replica-exchange sweep with flag/tops0
bookkeeping (src/mcmc.py:94-103), bottom-rung equivalence-class readout and
post-burn class-occupation accumulation — with the ladder state resident in
VMEM throughout.  This removes the per-step XLA op overhead that dominates
the unfused window (ops/metropolis + mcmc/ladder path) and lets PTEQ run at
low ``iters`` (frequent replica exchange) where convergence needs ~2.5x
fewer total sweeps.

Restrictions (the general path in mcmc/ladder.py covers the rest):
- top rung betas must be exactly zero (depolarizing p_top=0.75 / alpha
  pz_tilde_top=1 ladders — the standard PTEQ/PTEQ_alpha configurations);
- no track_shortest extras;
- TPU only (pltpu PRNG); no interpret mode.  Statistical equivalence with
  the XLA window is validated on-chip in tests/test_pallas_ladder.py
  (skipped off-TPU).

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

    Shapes (B = syndrome batch, padded to ``batch_tile`` internally):
      state (B, Nc, nq) u8, flag (B, Nc) i32, tops0 (B,) i32,
      eq_count (B, K) i32, since_burn (B,) i32, seed scalar i32,
      betas (Nc, 3) f32 (top rung must be ~0), weights (3,) f32.
    Returns (state, flag, tops0, eq_count, since_burn,
             energies (window // energy_chunk, B) f32 chunk means,
             burn_any (B,) bool, burn_first (B,) i32) — the
    `_get_window_fn` contract.  ``energy_chunk`` > 1 coarsens the energy
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
    nq_pad = _round_up(nq, 128)
    n_colors = len(tables)
    K = spec.n_classes
    n_bits = spec.n_class_bits
    W_pad = _round_up(max(max(sel.shape[0] for sel, _, _ in tables), 8), 8)
    sel_all = np.zeros((n_colors, W_pad, nq_pad), np.float32)
    xop_all = np.zeros((n_colors, 1, nq_pad), np.float32)
    zop_all = np.zeros((n_colors, 1, nq_pad), np.float32)
    for c, (sel, xop, zop) in enumerate(tables):
        sel_all[c, : sel.shape[0], :nq] = sel
        xop_all[c, 0, :nq] = xop
        zop_all[c, 0, :nq] = zop

    # class-bit functionals (ops/pauli.py:class_bits): bit f =
    # (A[f]·b0 + B[f]·b1) mod 2, padded to (nq_pad, 8) for one matmul
    nb_pad = 8
    AB = np.zeros((2, nq_pad, nb_pad), np.float32)
    AB[0, :nq, :n_bits] = np.asarray(spec.class_A, np.float32).T
    AB[1, :nq, :n_bits] = np.asarray(spec.class_B, np.float32).T
    bits_to_eq = [int(v) for v in np.asarray(spec.bits_to_eq)]

    # logical-draw tables in bit-plane form, op_lut flags baked as consts
    draws = spec.logical_draws
    n_draws = len(draws)
    n_pos = [drw.x_masks.shape[0] for drw in draws]
    n_pos_pad = _round_up(max(max(n_pos), 8), 8)
    DRW = np.zeros((n_draws, 4, n_pos_pad, nq_pad), np.float32)
    lut = []
    for i, drw in enumerate(draws):
        x0, x1 = _bit_planes_np(drw.x_masks.astype(np.int32))
        z0, z1 = _bit_planes_np(drw.z_masks.astype(np.int32))
        DRW[i, 0, : n_pos[i], :nq] = x0
        DRW[i, 1, : n_pos[i], :nq] = x1
        DRW[i, 2, : n_pos[i], :nq] = z0
        DRW[i, 3, : n_pos[i], :nq] = z1
        lut.append([(int(o[0]), int(o[1])) for o in np.asarray(drw.op_lut)])

    # distinct PRNG uses per ladder step (sweeps, mix, swaps) with slack
    uses_per_step = iters * n_colors + iters * (n_draws * 3 + 1) + 8
    TB = batch_tile

    def fxor(a, m):  # XOR of 0/1 floats
        return a + m - 2.0 * a * m

    def kernel(seed_ref, betas_ref, w_ref, sel_ref, xop_ref, zop_ref,
               ab_ref, drw_ref, st_ref, fl_ref, tp_ref, eq_ref, sb_ref,
               st_out, fl_out, tp_out, eq_out, sb_out, en_out, ba_out,
               bf_out):
        rows0, rows1, fls = [], [], []
        for i in range(Nc):
            x = st_ref[i].astype(jnp.int32)  # (TB, nq_pad)
            rows0.append(((x & 1) ^ ((x >> 1) & 1)).astype(jnp.float32))
            rows1.append(((x >> 1) & 1).astype(jnp.float32))
            fls.append(fl_ref[i].astype(jnp.int32))  # (1, TB)
        tops = tp_ref[:].astype(jnp.int32)  # (1, TB)
        eq_count = eq_ref[:].astype(jnp.int32)  # (TB, 128)
        since = sb_ref[:].astype(jnp.int32)  # (1, TB)
        burn_first = jnp.full((1, TB), -1, jnp.int32)

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
            tops, eq_count, since, burn_first = carry[3 * Nc :]
            use = 0

            # --- 1) iters colored sweeps on every rung ------------------
            for it in range(iters):
                for c in range(n_colors):
                    sel = sel_ref[c]  # (W_pad, nq_pad)
                    xop = xop_ref[c]  # (1, nq_pad)
                    zop = zop_ref[c]
                    sel_bf = sel.astype(jnp.bfloat16)
                    selT_bf = sel_bf.T
                    logu = jnp.log(runif((Nc, TB, W_pad), use, t))
                    use += 1
                    for r in range(Nc):
                        b0, b1 = rows0[r], rows1[r]
                        nb0 = fxor(b0, xop)
                        nb1 = fxor(b1, zop)
                        d1 = nb0 * (1.0 - nb1) - b0 * (1.0 - b1)
                        d2 = nb0 * nb1 - b0 * b1
                        d3 = (1.0 - nb0) * nb1 - (1.0 - b0) * b1

                        def contract(d):
                            return jax.lax.dot_general(
                                d.astype(jnp.bfloat16), selT_bf,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # (TB, W_pad)

                        logr = -(
                            betas_ref[r, 0] * contract(d1)
                            + betas_ref[r, 1] * contract(d2)
                            + betas_ref[r, 2] * contract(d3)
                        )
                        accept = (logu[r] < logr).astype(jnp.bfloat16)
                        acc_q = jax.lax.dot_general(
                            accept, sel_bf,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (TB, nq_pad)
                        rows0[r] = fxor(b0, xop * acc_q)
                        rows1[r] = fxor(b1, zop * acc_q)

            # --- 2) top-rung logical mix (zero betas: always accept) ----
            if p_logical > 0.0:
                m0 = jnp.zeros((TB, nq_pad), jnp.float32)
                m1 = jnp.zeros((TB, nq_pad), jnp.float32)
                for it in range(iters):
                    gate = (
                        runif((TB, 1), use, t) < p_logical
                    ).astype(jnp.float32)
                    use += 1
                    r0 = jnp.zeros((TB, nq_pad), jnp.float32)
                    r1 = jnp.zeros((TB, nq_pad), jnp.float32)
                    for i in range(n_draws):
                        opb = rbits((TB, 1), use, t) % 4
                        use += 1
                        posx = rbits((TB, 1), use, t) % n_pos[i]
                        use += 1
                        posz = rbits((TB, 1), use, t) % n_pos[i]
                        use += 1
                        xflag = jnp.zeros((TB, 1), jnp.float32)
                        zflag = jnp.zeros((TB, 1), jnp.float32)
                        for o in range(4):
                            is_o = (opb == o).astype(jnp.float32)
                            xflag = xflag + is_o * float(lut[i][o][0])
                            zflag = zflag + is_o * float(lut[i][o][1])
                        iota = jax.lax.broadcasted_iota(
                            jnp.int32, (TB, n_pos_pad), 1
                        )
                        ohx = (iota == posx).astype(jnp.bfloat16)
                        ohz = (iota == posz).astype(jnp.bfloat16)

                        def pick(oh, tbl):
                            return jax.lax.dot_general(
                                oh, tbl.astype(jnp.bfloat16),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )

                        x0s = pick(ohx, drw_ref[i, 0]) * xflag
                        x1s = pick(ohx, drw_ref[i, 1]) * xflag
                        z0s = pick(ohz, drw_ref[i, 2]) * zflag
                        z1s = pick(ohz, drw_ref[i, 3]) * zflag
                        r0 = fxor(fxor(r0, x0s), z0s)
                        r1 = fxor(fxor(r1, x1s), z1s)
                    m0 = fxor(m0, r0 * gate)
                    m1 = fxor(m1, r1 * gate)
                rows0[Nc - 1] = fxor(rows0[Nc - 1], m0)
                rows1[Nc - 1] = fxor(rows1[Nc - 1], m1)

            # --- 3) replica-exchange sweep, top -> bottom ---------------
            # per-rung Pauli counts as (1, TB) rows
            nxs = [jnp.sum(rows0[i] * (1.0 - rows1[i]), axis=-1)[None, :]
                   for i in range(Nc)]
            nys = [jnp.sum(rows0[i] * rows1[i], axis=-1)[None, :]
                   for i in range(Nc)]
            nzs = [jnp.sum((1.0 - rows0[i]) * rows1[i], axis=-1)[None, :]
                   for i in range(Nc)]
            u_sw = runif((Nc, TB), use, t)
            use += 1
            for i in reversed(range(Nc - 1)):
                dbx = betas_ref[i + 1, 0] - betas_ref[i, 0]
                dby = betas_ref[i + 1, 1] - betas_ref[i, 1]
                dbz = betas_ref[i + 1, 2] - betas_ref[i, 2]
                logr = (
                    dbx * (nxs[i + 1] - nxs[i])
                    + dby * (nys[i + 1] - nys[i])
                    + dbz * (nzs[i + 1] - nzs[i])
                )  # (1, TB)
                acc = jnp.log(u_sw[i])[None, :] < logr  # (1, TB)
                accf = acc.astype(jnp.float32)
                acci = acc.astype(jnp.int32)
                acc_col = accf.T  # (TB, 1)
                for lst in (rows0, rows1):
                    hi, lo = lst[i + 1], lst[i]
                    lst[i] = lo + acc_col * (hi - lo)
                    lst[i + 1] = hi + acc_col * (lo - hi)
                for lst in (nxs, nys, nzs):
                    hi, lo = lst[i + 1], lst[i]
                    lst[i] = lo + accf * (hi - lo)
                    lst[i + 1] = hi + accf * (lo - hi)
                hi, lo = fls[i + 1], fls[i]
                fls[i] = lo + acci * (hi - lo)
                fls[i + 1] = hi + acci * (lo - hi)

            # --- 4) flag / tops0 bookkeeping (src/mcmc.py:100-103) ------
            fls[Nc - 1] = jnp.ones((1, TB), jnp.int32)
            hit = (fls[0] == 1).astype(jnp.int32)  # (1, TB)
            tops = tops + hit
            fls[0] = fls[0] * (1 - hit)

            # --- 5) bottom-rung class readout + accumulators ------------
            feats = (
                jax.lax.dot_general(
                    rows0[0].astype(jnp.bfloat16),
                    ab_ref[0].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    rows1[0].astype(jnp.bfloat16),
                    ab_ref[1].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (TB, nb_pad) integer-valued
            par = feats - 2.0 * jnp.floor(feats * 0.5)  # mod 2
            bits_f = jnp.zeros((TB, 1), jnp.float32)
            for k2 in range(n_bits):
                bits_f = bits_f + par[:, k2 : k2 + 1] * float(1 << k2)
            bits = bits_f.astype(jnp.int32)  # (TB, 1)
            burned = (tops >= tops_burn).astype(jnp.int32)  # (1, TB)
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 1)
            eq_idx = jnp.zeros((TB, 1), jnp.int32)
            for v in range(len(bits_to_eq)):
                eq_idx = eq_idx + (bits == v).astype(jnp.int32) * bits_to_eq[v]
            onehot = (iota_k == eq_idx).astype(jnp.int32)
            eq_count = eq_count + onehot * burned.T
            since = since + burned
            newly = (burn_first < 0) & (burned > 0)
            burn_first = jnp.where(
                newly, jnp.zeros((1, TB), jnp.int32) + t, burn_first
            )
            energy = (
                w_ref[0, 0] * nxs[0] + w_ref[0, 1] * nys[0]
                + w_ref[0, 2] * nzs[0]
            )  # (1, TB)
            # accumulate chunk means in place (en_out zeroed at kernel start)
            tc = t // energy_chunk
            en_out[pl.ds(tc, 1), :] += energy * (1.0 / energy_chunk)
            return tuple(rows0) + tuple(rows1) + tuple(fls) + (
                tops, eq_count, since, burn_first
            )

        en_out[:] = jnp.zeros((n_chunks, TB), jnp.float32)
        carry = tuple(rows0) + tuple(rows1) + tuple(fls) + (
            tops, eq_count, since, burn_first
        )
        carry = jax.lax.fori_loop(0, window, one_step, carry)
        rows0 = carry[0:Nc]
        rows1 = carry[Nc : 2 * Nc]
        fls = carry[2 * Nc : 3 * Nc]
        tops, eq_count, since, burn_first = carry[3 * Nc :]

        for i in range(Nc):
            xi = rows0[i].astype(jnp.int32)
            zi = rows1[i].astype(jnp.int32)
            st_out[i] = ((xi * 1) ^ (zi * 3)).astype(jnp.uint8)
            fl_out[i] = fls[i]
        tp_out[:] = tops
        eq_out[:] = eq_count
        sb_out[:] = since
        ba_out[:] = (burn_first >= 0).astype(jnp.int32)
        bf_out[:] = jnp.maximum(burn_first, 0)

    def raw(state, flag, tops0, eq_count, since_burn, seed, betas, weights):
        B0 = state.shape[0]
        B = _round_up(B0, TB)
        # rung-major layout for the kernel; flags per rung as (Nc, 1, B)
        st = jnp.zeros((Nc, B, nq_pad), jnp.uint8)
        st = st.at[:, :B0, :nq].set(jnp.moveaxis(state, 1, 0))
        fl = jnp.zeros((Nc, 1, B), jnp.int32).at[:, 0, :B0].set(
            jnp.moveaxis(flag, 1, 0)
        )
        tp = jnp.zeros((1, B), jnp.int32).at[0, :B0].set(tops0)
        eq = jnp.zeros((B, 128), jnp.int32).at[:B0, :K].set(eq_count)
        sb = jnp.zeros((1, B), jnp.int32).at[0, :B0].set(since_burn)
        seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        betas2 = jnp.asarray(betas, jnp.float32).reshape(Nc, 3)
        w2 = jnp.asarray(weights, jnp.float32).reshape(1, 3)

        grid = (B // TB,)
        vmem = pltpu.VMEM
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),  # betas
                pl.BlockSpec(memory_space=pltpu.SMEM),  # weights
                pl.BlockSpec(memory_space=vmem),  # sel
                pl.BlockSpec(memory_space=vmem),  # xop
                pl.BlockSpec(memory_space=vmem),  # zop
                pl.BlockSpec(memory_space=vmem),  # AB
                pl.BlockSpec(memory_space=vmem),  # DRW
                pl.BlockSpec((Nc, TB, nq_pad), lambda i: (0, i, 0),
                             memory_space=vmem),
                pl.BlockSpec((Nc, 1, TB), lambda i: (0, 0, i),
                             memory_space=vmem),
                pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=vmem),
                pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=vmem),
            ],
            out_specs=[
                pl.BlockSpec((Nc, TB, nq_pad), lambda i: (0, i, 0),
                             memory_space=vmem),
                pl.BlockSpec((Nc, 1, TB), lambda i: (0, 0, i),
                             memory_space=vmem),
                pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=vmem),
                pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=vmem),
                pl.BlockSpec((n_chunks, TB), lambda i: (0, i),
                             memory_space=vmem),
                pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=vmem),
                pl.BlockSpec((1, TB), lambda i: (0, i), memory_space=vmem),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Nc, B, nq_pad), jnp.uint8),
                jax.ShapeDtypeStruct((Nc, 1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((B, 128), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((n_chunks, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(seed2, betas2, w2, jnp.asarray(sel_all), jnp.asarray(xop_all),
          jnp.asarray(zop_all), jnp.asarray(AB), jnp.asarray(DRW),
          st, fl, tp, eq, sb)
        st_o, fl_o, tp_o, eq_o, sb_o, en_o, ba_o, bf_o = out
        state_o = jnp.moveaxis(st_o[:, :B0, :nq], 0, 1)
        return (
            state_o,
            jnp.moveaxis(fl_o[:, 0, :B0], 0, 1),
            tp_o[0, :B0],
            eq_o[:B0, :K],
            sb_o[0, :B0],
            en_o[:, :B0],
            ba_o[0, :B0] > 0,
            bf_o[0, :B0],
        )

    return raw
