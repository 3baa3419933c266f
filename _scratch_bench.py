import time
import jax.numpy as jnp
from mcmc_qec_tpu.models import get_spec
from mcmc_qec_tpu.ops.pallas_sweep import make_pallas_sweep
from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing
for d, batch in [(5, 32768), (9, 32768), (13, 16384)]:
    spec = get_spec("toric", d)
    n_sweeps = 400
    fn, _ = make_pallas_sweep(spec, n_sweeps=n_sweeps, batch_tile=512)
    betas = jnp.asarray(betas_depolarizing(0.1), jnp.float32)
    st = fn(jnp.zeros((batch, spec.nq), jnp.uint8), 1, betas)
    _ = int(jnp.sum(st.astype(jnp.int32)))
    best = 0
    for i in range(3):
        t0 = time.perf_counter()
        st = fn(st, i + 2, betas)
        _ = int(jnp.sum(st.astype(jnp.int32)))
        best = max(best, batch * spec.n_stabs * n_sweeps / (time.perf_counter() - t0))
    print(f"d={d}: {best/1e9:.2f}B props/s")
