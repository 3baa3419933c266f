"""Multi-device sharding: decoders run SPMD over an 8-device CPU mesh and
agree with single-device execution; the driver dry-run entry points work."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_qec_tpu.models import get_spec
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.decoders import STDC
from mcmc_qec_tpu.parallel import make_mesh, shard_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_stdc_matches_unsharded():
    spec = get_spec("planar", 3)
    B = 8
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, 0.1, (B,))
    )
    # unsharded
    d_ref = STDC(spec, states, 0.1, p_sampling=0.25, droplets=2, steps=800)
    # sharded: same computation with the batch partitioned over the mesh.
    from mcmc_qec_tpu.decoders.stdc import _class_seeds, _get_stdc_fn
    from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing

    mesh = make_mesh()
    seeds = _class_seeds(spec, states)
    fn = _get_stdc_fn(spec, 2, 800, True, False)
    distr, _ = fn(
        shard_batch(seeds, mesh),
        jax.random.PRNGKey(0),
        jnp.asarray(betas_depolarizing(0.25), jnp.float32),
        jnp.asarray(betas_depolarizing(0.1), jnp.float32),
    )
    distr = np.asarray(distr)
    # identical PRNG streams per element -> near-identical results
    assert np.allclose(distr, d_ref, atol=1e-3), (distr, d_ref)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multihost_degenerate_single_process(tmp_path):
    """Single-process pod-slice path: shard covers everything, gathers are
    identities, distributed_generate == generate."""
    from mcmc_qec_tpu.parallel import (
        allgather_rows,
        distributed_generate,
        global_sum,
        host_shard,
    )
    from mcmc_qec_tpu.pipeline import RunConfig, evaluate_dataset

    assert host_shard(10) == slice(0, 10)
    assert np.array_equal(allgather_rows(np.arange(6).reshape(2, 3)),
                          np.arange(6).reshape(2, 3))
    assert global_sum(np.array([2, 3])).tolist() == [2, 3]
    cfg = RunConfig(code="planar", method="STDC", size=3, p_error=0.08,
                    p_sampling=0.25, droplets=2, steps=500, batch=4)
    ds = distributed_generate(str(tmp_path / "mh.npz"), cfg, 4, progress=None)
    assert len(ds) == 4
    assert (tmp_path / "mh.npz").exists()
    evaluate_dataset(ds)
