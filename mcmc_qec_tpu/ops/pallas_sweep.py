"""Pallas TPU kernel for the dense bitplane sweep.

Same math as ops/dense_sweep.py (gather-free colored Metropolis over
symplectic bitplanes) but with the chain block resident in VMEM across
``n_sweeps`` full sweeps, per-core PRNG (pltpu.prng_random_bits) instead of
threefry tensors, and MXU matmuls for the per-color stabilizer contractions.
Grid is over batch tiles; one kernel invocation performs

    n_sweeps * n_stabs

effective Metropolis proposals per chain with zero HBM traffic between
colors or sweeps.  Stationarity is validated against exact enumeration in
tests/test_pallas_sweep.py (interpret mode on CPU, compiled on TPU).
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


def _sweep_compiler_params():
    from .tpu_info import scoped_vmem_limit

    limit = scoped_vmem_limit()
    if limit is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def make_pallas_sweep(
    spec: CodeSpec,
    n_sweeps: int,
    batch_tile: int = 256,
    interpret: bool = False,
    equal_betas: bool = False,
):
    """``fn(states (B, nq) uint8, seed int32, betas (3,) f32) -> states``.

    The batch is padded/packed automatically; any B works.

    Small codes (nq <= 64) pack ``n_pack = 128 // round_up(nq, 32)``
    independent chains side by side in each 128-lane row: the bitplane
    elementwise work is position-independent, and the per-color stabilizer
    contractions become block-diagonal selector matmuls, so the VPU lanes
    and MXU output tiles that padding would waste instead advance more
    chains (~2x measured at d=5, 4 chains/row at d=3).
    """
    tables = _color_tables(spec)
    nq = spec.nq
    inner = _round_up(nq, 32)
    n_pack = max(1, 128 // inner)
    nq_pad = _round_up(n_pack * inner, 128)
    n_colors = len(tables)
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

    # equal-betas (depolarizing) fast path: acceptance depends only on the
    # TOTAL count delta OR(new)-OR(old), which is multilinear per qubit —
    # d_or = A + B b0 + C b1 + D b0b1 with small-integer planes from the
    # op masks — so the three per-Pauli contractions collapse to ONE
    # ({-1,0,1} operands, bf16-exact; see ops/pallas_ladder.py DORC)
    e10 = xop_all * (1.0 - zop_all)
    e01 = (1.0 - xop_all) * zop_all
    e11 = xop_all * zop_all
    DORC = np.zeros((n_colors, 4, nq_pad), np.float32)
    DORC[:, 0] = (e10 + e01 + e11)[:, 0]
    DORC[:, 1] = (-2.0 * e10 - e01 - e11)[:, 0]
    DORC[:, 2] = (-e10 - 2.0 * e01 - e11)[:, 0]
    DORC[:, 3] = (2.0 * e10 + 2.0 * e01)[:, 0]

    def kernel(seed_ref, betas_ref, sel_ref, xop_ref, zop_ref, dor_ref,
               *rest):
        if interpret:
            # pltpu PRNG is unavailable in interpret mode: uniforms come in
            # as a precomputed input tensor
            logu_ref, state_ref, out_ref = rest
        else:
            state_ref, out_ref = rest
        x = state_ref[:].astype(jnp.int32)  # (TB, nq_pad)
        b0 = ((x & 1) ^ ((x >> 1) & 1)).astype(jnp.float32)  # X component
        b1 = ((x >> 1) & 1).astype(jnp.float32)  # Z component
        bx = betas_ref[0, 0]
        by = betas_ref[0, 1]
        bz = betas_ref[0, 2]

        def fxor(a, m):  # XOR of 0/1 floats
            return a + m - 2.0 * a * m

        def one_sweep(t, planes):
            b0, b1 = planes
            if not interpret:
                # ONE seed + generate + log per sweep covering every color
                # (leading-axis slices below are free): the kernel is
                # issue-bound at small d, and per-color PRNG round-trips
                # were a large share of the non-MXU work.  Per-(tile,
                # sweep) seeding — a single seed at kernel start gets
                # hoisted/replayed by the compiler inside fori_loop,
                # yielding repeated bits (verified empirically).
                pltpu.prng_seed(
                    (seed_ref[0, 0] * jnp.int32(40503) + pl.program_id(0))
                    * jnp.int32(1000003)
                    + t
                )
                bits = pltpu.prng_random_bits(
                    (n_colors, b0.shape[0], W_out)
                )
                # keep 24 high bits so the int->float conversion is
                # sign-safe regardless of how the backend treats uint32
                b24 = jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.int32), 8
                )
                u_all = b24.astype(jnp.float32) * (1.0 / 16777216.0) + 1e-12
                logu_all = jnp.log(u_all)
            for c in range(n_colors):
                # after chain packing the selector block is block-diagonal
                # over the n_pack chains in a row: (W_out, nq_pad) with
                # W_out = n_pack * W_pad
                sel = sel_ref[c]  # (W_out, nq_pad)
                xop = xop_ref[c]  # (1, nq_pad)
                zop = zop_ref[c]
                # (TB, nq_pad) @ (nq_pad, W_out) on the MXU.  All operands
                # are small integers ({-1,0,1} deltas, 0/1 selectors) that
                # bf16 represents exactly, and accumulation stays f32 —
                # bit-identical results at 2x the MXU rate (1.4x measured
                # end-to-end at d=9)
                sel_bf = sel.astype(jnp.bfloat16)
                selT_bf = sel_bf.T
                if equal_betas:
                    # single total-count contraction (multilinear d_or)
                    P = b0 * b1
                    d_or = (dor_ref[c, 0:1] + dor_ref[c, 1:2] * b0
                            + dor_ref[c, 2:3] * b1 + dor_ref[c, 3:4] * P)
                    dn = jnp.dot(d_or.astype(jnp.bfloat16), selT_bf,
                                 preferred_element_type=jnp.float32)
                    logr = -(bx * dn)  # (TB, W_out)
                else:
                    nb0 = fxor(b0, xop)
                    nb1 = fxor(b1, zop)
                    d1 = nb0 * (1.0 - nb1) - b0 * (1.0 - b1)
                    d2 = nb0 * nb1 - b0 * b1
                    d3 = (1.0 - nb0) * nb1 - (1.0 - b0) * b1
                    dn1 = jnp.dot(d1.astype(jnp.bfloat16), selT_bf,
                                  preferred_element_type=jnp.float32)
                    dn2 = jnp.dot(d2.astype(jnp.bfloat16), selT_bf,
                                  preferred_element_type=jnp.float32)
                    dn3 = jnp.dot(d3.astype(jnp.bfloat16), selT_bf,
                                  preferred_element_type=jnp.float32)
                    logr = -(bx * dn1 + by * dn2 + bz * dn3)  # (TB, W_out)
                if interpret:
                    logu = logu_ref[0, t, c]
                else:
                    logu = logu_all[c]
                accept = (logu < logr).astype(jnp.bfloat16)
                acc_q = jnp.dot(accept, sel_bf,
                                preferred_element_type=jnp.float32)
                b0 = fxor(b0, xop * acc_q)
                b1 = fxor(b1, zop * acc_q)
            return b0, b1

        if interpret:
            for t in range(n_sweeps):
                b0, b1 = one_sweep(t, (b0, b1))
        else:
            b0, b1 = jax.lax.fori_loop(0, n_sweeps, one_sweep, (b0, b1))

        xi = b0.astype(jnp.int32)
        zi = b1.astype(jnp.int32)
        out_ref[:] = ((xi * 1) ^ (zi * 3)).astype(jnp.uint8)

    def raw(states: jax.Array, seed: jax.Array, betas: jax.Array) -> jax.Array:
        """Traceable (non-jit) form for embedding in larger programs; the
        batch axis is padded/packed to tile multiples automatically."""
        B0 = states.shape[0]
        rows = _round_up(-(-B0 // n_pack), batch_tile)
        chains = jnp.zeros((rows * n_pack, nq), jnp.uint8).at[:B0].set(states)
        packed = (
            jnp.zeros((rows, n_pack, inner), jnp.uint8)
            .at[:, :, :nq]
            .set(chains.reshape(rows, n_pack, nq))
        )
        padded = (
            jnp.zeros((rows, nq_pad), jnp.uint8)
            .at[:, : n_pack * inner]
            .set(packed.reshape(rows, n_pack * inner))
        )
        seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        betas2 = jnp.asarray(betas, jnp.float32).reshape(1, 3)
        extra_in_specs = []
        extra_args = []
        if interpret:
            k = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32))
            n_tiles = rows // batch_tile
            # a leading tile axis + index_map gives every grid tile its own
            # uniforms (a shared tensor would correlate tiles)
            logu = jnp.log(
                jax.random.uniform(
                    k,
                    (n_tiles, n_sweeps, n_colors, batch_tile, W_out),
                    minval=1e-12,
                )
            )
            extra_in_specs = [
                pl.BlockSpec(
                    (1, n_sweeps, n_colors, batch_tile, W_out),
                    lambda i: (i, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            extra_args = [logu]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, nq_pad), jnp.uint8),
            grid=(rows // batch_tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # DORC
                *extra_in_specs,
                pl.BlockSpec(
                    (batch_tile, nq_pad),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (batch_tile, nq_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            # large-d shapes (nq_pad >= 256) can exceed the compiler's
            # default 16 MiB scoped-VMEM ceiling; raise it to a fraction
            # of the detected device VMEM (None = keep default)
            compiler_params=None if interpret else _sweep_compiler_params(),
        )(seed2, betas2, jnp.asarray(sel_all), jnp.asarray(xop_all),
          jnp.asarray(zop_all), jnp.asarray(DORC), *extra_args, padded)
        return (
            out[:, : n_pack * inner]
            .reshape(rows, n_pack, inner)[:, :, :nq]
            .reshape(rows * n_pack, nq)[:B0]
        )

    return jax.jit(raw), raw
