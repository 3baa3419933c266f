"""Benchmark: Metropolis sweep throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: effective stabilizer-proposal throughput of the best sweep
engine at toric d=5 (1 sweep = n_stabs = 2d^2 proposals, the accounting of
BASELINE.md).  vs_baseline is against the reference's measured
interpreted-Python floor of 178k proposals/s (BASELINE.md, src/mcmc.py:152
path, single CPU core).

Timing methodology: a host-side scalar reduction is forced before stopping
the timer — on some remote backends ``block_until_ready`` on custom-call
outputs returns before execution finishes.

Measurement hygiene (round 5, VERDICT r4 task 1):
- every recorded key is best-of-3 (or better) wall time;
- a host-load guard (1-min loadavg + a calibrated spin loop) retries for
  an idle host and emits ``host_contended`` + the raw readings in the
  JSON — the r4 driver capture ran on busy CPUs and understated the
  host-loop-heavy keys by up to 43%;
- the remote-tunnel round-trip (~28 ms/fetch on this axon setup —
  measured, see ``tunnel_rtt_ms``) is amortized out of per-window
  latencies by chaining windows device-side and forcing ONCE.  The r4
  ``fused_window_ms_d5`` keys included one full RTT each; the r5 keys
  are the true device cost (the single-shot value is kept as
  ``*_singleshot`` for cross-round comparability).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


BASELINE_PROPOSALS_PER_S = 178_000.0  # BASELINE.md measured reference floor

# best-of-5 time of sum(range(2_000_000)) on this host, measured idle
SPIN_IDLE_MS = 40.0


def _force(x) -> int:
    """Force full execution with a 1-scalar host fetch."""
    return int(jnp.sum(x.astype(jnp.int32)))


def _spin_ms(trials: int = 5) -> float:
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        sum(range(2_000_000))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def host_guard(max_wait_s: float = 120.0):
    """Wait (bounded) for an idle host; return load diagnostics.

    The 2-core bench host shares CPUs with whatever else runs in the
    container; contention inflates host-loop-heavy keys by up to ~40%
    (observed r4).  Contended = 1-min loadavg > 1.0 or the calibrated
    spin loop > 2x its idle time."""
    t0 = time.time()
    while True:
        load1 = os.getloadavg()[0]
        spin = _spin_ms()
        contended = load1 > 1.0 or spin > 2.0 * SPIN_IDLE_MS
        if not contended or time.time() - t0 > max_wait_s:
            return {
                "host_contended": contended,
                "loadavg_1min": round(load1, 2),
                "spin_ms": round(spin, 1),
            }
        time.sleep(15)


def measure_tunnel_rtt(reps: int = 10) -> float:
    """Best-of-N dispatch+fetch of a trivial jitted scalar reduction: the
    fixed per-fetch cost every wall-clock sample in this file contains."""
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.zeros((8, 128), jnp.int32)
    int(f(x))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        int(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def bench_dense(family="toric", d=5, batch=32768, sweeps_per_call=200, calls=3):
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing
    from mcmc_qec_tpu.ops.dense_sweep import make_dense_sweep

    spec = get_spec(family, d)
    sweep = make_dense_sweep(spec)
    betas = jnp.asarray(betas_depolarizing(0.1), jnp.float32)

    @jax.jit
    def run(states, key):
        def body(s, k):
            return sweep(s, k, betas), None

        ks = jax.random.split(key, sweeps_per_call)
        states, _ = jax.lax.scan(body, states, ks)
        return states

    key = jax.random.PRNGKey(0)
    states = run(jnp.zeros((batch, spec.nq), jnp.uint8), key)
    _force(states)
    best = 0.0
    for i in range(calls):
        t0 = time.perf_counter()
        states = run(states, jax.random.fold_in(key, i))
        _force(states)
        dt = time.perf_counter() - t0
        best = max(best, batch * spec.n_stabs * sweeps_per_call / dt)
    return best


def bench_pallas(family="toric", d=5, batch=32768, sweeps_per_call=400, calls=3,
                 equal_betas=True):
    """Pallas sweep kernel on a depolarizing chain.  ``equal_betas`` uses
    the kernel's uniform-beta specialization (1 multilinear total-count
    contraction per color instead of 3 per-Pauli ones — valid for exactly
    the depolarizing betas benched here; 1.2-1.7x measured)."""
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.mcmc.ladder import betas_depolarizing
    from mcmc_qec_tpu.ops.pallas_sweep import make_pallas_sweep

    spec = get_spec(family, d)
    fn, _ = make_pallas_sweep(spec, n_sweeps=sweeps_per_call, batch_tile=512,
                              equal_betas=equal_betas)
    betas = jnp.asarray(betas_depolarizing(0.1), jnp.float32)
    states = fn(jnp.zeros((batch, spec.nq), jnp.uint8), 1, betas)
    _force(states)
    best = 0.0
    for i in range(calls):
        t0 = time.perf_counter()
        states = fn(states, i + 2, betas)
        _force(states)
        dt = time.perf_counter() - t0
        best = max(best, batch * spec.n_stabs * sweeps_per_call / dt)
    return best


def bench_stdc_decoder(d=5, B=1024, steps=450, droplets=4):
    """Decoder-level throughput: full STDC (sweep engine) on a syndrome
    batch — sampling + on-device dedup + Z reduction."""
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing
    from mcmc_qec_tpu.decoders import STDC

    spec = get_spec("toric", d)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, 0.1, (B,))
    )
    STDC(spec, states, 0.1, 0.25, droplets=droplets, steps=steps,
         engine="sweep")  # compile
    best = 0.0
    syn_rate = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        STDC(spec, states, 0.1, 0.25, droplets=droplets, steps=steps,
             engine="sweep", seed=rep + 1)
        dt = time.perf_counter() - t0
        props = B * spec.n_classes * droplets * steps * spec.n_stabs
        best = max(best, props / dt)
        syn_rate = max(syn_rate, B / dt)
    return best, syn_rate


def bench_stdc_stream(d=9, B=512, steps=20000, droplets=10):
    """STDC at the reference's own default budget (droplets=10 x
    steps=20000, /root/reference/decoders.py:268) via the bounded-memory
    streaming reduction — the materialized path would need ~33 GB HBM at
    this shape (decoders/streaming.py)."""
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing
    from mcmc_qec_tpu.decoders import STDC

    spec = get_spec("toric", d)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, 0.1, (B,))
    )
    STDC(spec, states, 0.1, 0.25, droplets=droplets, steps=steps, seed=1)
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        STDC(spec, states, 0.1, 0.25, droplets=droplets, steps=steps,
             seed=rep + 2)
        best = max(best, B / (time.perf_counter() - t0))
    return best


def bench_strc_stream(d=9, B=256, steps=20000, droplets=10):
    """STRC at the reference's own default budget (droplets=10 x
    steps=20000, decoders.py:835) through the bounded-memory streaming
    occupancy path (VERDICT r4 task 5)."""
    import warnings

    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing
    from mcmc_qec_tpu.decoders import STRC

    spec = get_spec("toric", d)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, 0.1, (B,))
    )
    truncated = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        STRC(spec, states, 0.1, 0.3, droplets=droplets, steps=steps, seed=1)
        truncated = any("truncated" in str(x.message) for x in w)
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        STRC(spec, states, 0.1, 0.3, droplets=droplets, steps=steps,
             seed=rep + 2)
        best = max(best, B / (time.perf_counter() - t0))
    return best, truncated


def bench_ptrc_stream(d=9, B=256, steps=20000, droplets=4):
    """PTRC at the reference defaults (droplets=4, steps=20000, Nc=d,
    decoders.py:638) through the per-rung streaming occupancy path."""
    import warnings

    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing
    from mcmc_qec_tpu.decoders import PTRC

    spec = get_spec("toric", d)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, 0.1, (B,))
    )
    truncated = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        PTRC(spec, states, 0.1, droplets=droplets, steps=steps, stream=True,
             seed=1)
        truncated = any("truncated" in str(x.message) for x in w)
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        PTRC(spec, states, 0.1, droplets=droplets, steps=steps, stream=True,
             seed=rep + 2)
        best = max(best, B / (time.perf_counter() - t0))
    return best, truncated


def bench_fused_window(d=5, B=2048, W=600, iters=2, exchange="sequential",
                       chain=5):
    """Raw fused PT-ladder window: DEVICE ms per window (amortized over
    ``chain`` windows dispatched back-to-back with ONE final host fetch —
    a single-shot sample includes the ~28 ms remote-tunnel RTT and was
    what r3/r4 recorded), the single-shot latency, ladder-steps/s and the
    MXU-accounting MFU (see utils/roofline.pallas_ladder_mxu_flops — the
    kernel is VPU-bound, not MXU-bound, so MFU is an accounting figure;
    the roofline argument lives in RESULTS.md)."""
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.models.noise import sample_depolarizing
    from mcmc_qec_tpu.mcmc.ladder import init_ladder, beta_ladder_depolarizing
    from mcmc_qec_tpu.ops.pallas_ladder import make_pallas_ladder_window
    from mcmc_qec_tpu.utils.roofline import fused_ladder_mfu

    spec = get_spec("toric", d)
    Nc = d
    states = sample_depolarizing(jax.random.PRNGKey(0), spec, 0.15, (B,))
    betas = jnp.asarray(beta_ladder_depolarizing(0.15, Nc), jnp.float32)
    ls = init_ladder(spec, states, Nc)
    K = spec.n_classes
    w = jnp.ones((3,), jnp.float32)
    fn = jax.jit(make_pallas_ladder_window(
        spec, Nc, W, iters, 0.5, 2, batch_tile=128, energy_chunk=12,
        top_exact=True, equal_betas=True, exchange=exchange))
    args = (ls.state, ls.flag, ls.tops0, jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B,), jnp.int32), 7, betas, w)
    _force(fn(*args)[2])
    single = 1e9
    for i in range(4):
        t0 = time.perf_counter()
        _force(fn(*args)[2])
        single = min(single, time.perf_counter() - t0)
    rtt = measure_tunnel_rtt()
    best = 1e9
    for i in range(3):
        st, fl, tp, eq, sb = args[:5]
        t0 = time.perf_counter()
        for k in range(chain):
            st, fl, tp, eq, sb = fn(st, fl, tp, eq, sb, 7 + k, betas, w)[:5]
        _force(tp)
        # amortized device window: the one terminal fetch pays the RTT
        best = min(best, (time.perf_counter() - t0 - rtt / 1000) / chain)
    _, mfu = fused_ladder_mfu(spec, Nc, W, iters, B, best,
                              batch_tile=128, equal_betas=True)
    return best * 1000, B * W / best, mfu, single * 1000


def bench_pteq(B=2048, max_steps=8000, d=5, p=0.15):
    """PTEQ decoder throughput (d=5: hard syndromes from the golden corpus
    when readable, synthetic p errors otherwise): full parallel-tempering
    decode — ladder sweeps, replica exchange, burn-in, windowed
    convergence, compaction, batched fetches — per wall second.  B=2048 is
    the d=5 production shape (the decoder is batched by design; most of
    the 2603-syndrome corpus decodes in one device batch)."""
    import os
    from mcmc_qec_tpu.models import get_spec
    from mcmc_qec_tpu.decoders.pteq import PTEQ, PTEQConfig

    spec = get_spec("toric", d)
    golden = "/root/reference/data/drl_failures_p_0.15.xz"
    if d == 5 and os.path.exists(golden):
        from mcmc_qec_tpu.pipeline.evaluate import load_golden_corpus

        _, flat, _ = load_golden_corpus(golden)
        states = np.concatenate([flat] * (B // len(flat) + 1))[:B] \
            if B > len(flat) else flat[:B]
    else:
        from mcmc_qec_tpu.models.noise import sample_depolarizing

        states = np.asarray(
            sample_depolarizing(jax.random.PRNGKey(0), spec, p, (B,))
        )
    cfg = PTEQConfig(engine="fused", max_steps=3 * max_steps, window=600,
                     iters=2, energy_chunk=12)
    PTEQ(spec, states, p, cfg)  # compile
    # best-of-5 with the per-rep rates returned for the record: this
    # key's wall time is fetch-pipeline-heavy, and beyond per-call RTT
    # jitter the tunnel shows PROCESS-level fast/slow modes (~1400 vs
    # ~1800 syn/s at d=5 on an identical idle host and identical
    # deterministic device work — measured r5).  The per-rep list lets a
    # reader distinguish a slow-tunnel capture from a code regression.
    rates = []
    for rep in range(5):
        t0 = time.perf_counter()
        PTEQ(spec, states, p, cfg, seed=rep % 3 + 1)
        rates.append(round(B / (time.perf_counter() - t0), 1))
    return max(rates), rates


def main():
    # keep total runtime bounded: remote compiles can take minutes each, so
    # optional extras are skipped once the time budget is spent
    guard = host_guard()
    t_start = time.perf_counter()
    budget = 900.0
    extra = dict(guard)
    try:
        extra["tunnel_rtt_ms"] = round(measure_tunnel_rtt(), 1)
    except Exception as e:  # pragma: no cover
        extra["tunnel_rtt_error"] = str(e)[:200]
    dense = bench_dense()
    extra["dense_xla_d5"] = round(dense, 1)
    value = dense
    try:
        if time.perf_counter() - t_start < budget * 0.5:
            pallas = bench_pallas()
            extra["pallas_d5"] = round(pallas, 1)
            value = max(value, pallas)
        # general (per-Pauli) path for reference — the r1/r2 numbers.
        # Own budget gate: the equal-betas run above may have spent most
        # of the 0.5 gate on a slow remote compile
        if time.perf_counter() - t_start < budget * 0.6:
            extra["pallas_3beta_d5"] = round(
                bench_pallas(equal_betas=False), 1)
    except Exception as e:  # pragma: no cover - bench resilience
        extra["pallas_d5_error"] = str(e)[:200]
    try:
        if time.perf_counter() - t_start < budget * 0.75:
            stdc_pps, stdc_syn = bench_stdc_decoder()
            extra["stdc_decoder_proposals_per_sec_d5"] = round(stdc_pps, 1)
            extra["stdc_decoder_syndromes_per_sec_d5"] = round(stdc_syn, 1)
    except Exception as e:  # pragma: no cover
        extra["stdc_error"] = str(e)[:200]
    try:
        if time.perf_counter() - t_start < budget * 0.85:
            # the PTEQ keys are the only tunnel-HEALTH-bound ones (the
            # host loop syncs every window): the same device work measures
            # 900-1800 syn/s depending on the hour's tunnel state while
            # device-bound keys (fused_window, pallas) stay within 2%.
            # Stamp the RTT right around the key so a low capture is
            # self-explaining in the record (RESULTS round-5 headline #1).
            extra["tunnel_rtt_ms_at_pteq"] = round(measure_tunnel_rtt(), 1)
            pteq_best, pteq_rates = bench_pteq()
            extra["pteq_hard_syndromes_per_sec_d5"] = round(pteq_best, 1)
            extra["pteq_hard_d5_rep_rates"] = pteq_rates
            extra["tunnel_rtt_ms_after_pteq"] = round(measure_tunnel_rtt(), 1)
    except Exception as e:  # pragma: no cover
        extra["pteq_error"] = str(e)[:200]
    try:
        # production-size end-to-end PTEQ (reference grid reaches d=19;
        # RESULTS.md records d=9/13 rows — d=9 is the bench-budget pick)
        if time.perf_counter() - t_start < budget * 0.87:
            extra["pteq_syndromes_per_sec_d9"] = round(
                bench_pteq(B=512, d=9, p=0.10)[0], 1)
    except Exception as e:  # pragma: no cover
        extra["pteq_d9_error"] = str(e)[:200]
    try:
        if time.perf_counter() - t_start < budget * 0.88:
            ms, steps_s, mfu, single = bench_fused_window()
            extra["fused_window_ms_d5"] = round(ms, 1)
            extra["fused_window_singleshot_ms_d5"] = round(single, 1)
            extra["fused_ladder_steps_per_sec_d5"] = round(steps_s, 1)
            extra["fused_ladder_mfu_d5"] = round(mfu, 4)
    except Exception as e:  # pragma: no cover
        extra["fused_window_error"] = str(e)[:200]
    try:
        # production-size fused window (VERDICT r3: the reference's grid
        # reaches d=19; on the v5e VMEM cap the fused ladder fits at full
        # tile through d=19 — see RESULTS.md VMEM table).  d=13 is the
        # recorded extra; larger d compile slowly on cold caches.
        if time.perf_counter() - t_start < budget * 0.89:
            ms13, steps13, mfu13, single13 = bench_fused_window(d=13, B=512)
            extra["fused_window_ms_d13"] = round(ms13, 1)
            extra["fused_window_singleshot_ms_d13"] = round(single13, 1)
            extra["fused_ladder_steps_per_sec_d13"] = round(steps13, 1)
            extra["fused_ladder_mfu_d13"] = round(mfu13, 4)
    except Exception as e:  # pragma: no cover
        extra["fused_window_d13_error"] = str(e)[:200]
    try:
        # STDC at the reference's default budget via streaming (VERDICT r4
        # task 1) — the headline bounded-memory result
        if time.perf_counter() - t_start < budget * 0.90:
            extra["stdc_stream_ref_budget_syn_per_sec_d9"] = round(
                bench_stdc_stream(), 1)
    except Exception as e:  # pragma: no cover
        extra["stdc_stream_error"] = str(e)[:200]
    try:
        # STRC / PTRC at the reference defaults through the streaming
        # occupancy path (VERDICT r4 task 5); the *_truncated flags report
        # whether the bounded N(n) buffers clipped at the lengths the Z
        # estimate reads (they warn in-API too)
        if time.perf_counter() - t_start < budget * 0.91:
            strc_rate, strc_trunc = bench_strc_stream()
            extra["strc_stream_ref_budget_syn_per_sec_d9"] = round(
                strc_rate, 1)
            extra["strc_stream_truncated"] = strc_trunc
    except Exception as e:  # pragma: no cover
        extra["strc_stream_error"] = str(e)[:200]
    try:
        if time.perf_counter() - t_start < budget * 0.92:
            ptrc_rate, ptrc_trunc = bench_ptrc_stream()
            extra["ptrc_stream_ref_budget_syn_per_sec_d9"] = round(
                ptrc_rate, 1)
            extra["ptrc_stream_truncated"] = ptrc_trunc
    except Exception as e:  # pragma: no cover
        extra["ptrc_stream_error"] = str(e)[:200]
    try:
        # production-size PTEQ with the d-scaled step cap (VERDICT r4
        # task 2: >= 90% convergence at d=13; cap calibrated in RESULTS.md)
        if time.perf_counter() - t_start < budget * 0.93:
            # cap 96k (= 3 * 32000): measured 100% felkriteriet
            # convergence at d=13 (RESULTS.md round-4 production table)
            extra["pteq_syndromes_per_sec_d13"] = round(
                bench_pteq(B=256, d=13, p=0.10, max_steps=32000)[0], 1)
    except Exception as e:  # pragma: no cover
        extra["pteq_d13_error"] = str(e)[:200]
    try:
        if time.perf_counter() - t_start < budget * 0.94:
            extra["pallas_d9"] = round(bench_pallas(d=9), 1)
    except Exception as e:  # pragma: no cover
        extra["pallas_d9_error"] = str(e)[:200]
    try:
        if time.perf_counter() - t_start < budget * 0.96:
            extra["pallas_d13"] = round(bench_pallas(d=13, batch=16384), 1)
    except Exception as e:  # pragma: no cover
        extra["pallas_d13_error"] = str(e)[:200]
    try:
        # roofline accounting: convert measured proposals/s to achieved
        # MXU TFLOP/s and fraction of the chip's bf16 peak (see
        # mcmc_qec_tpu/utils/roofline.py; RESULTS.md "MFU and roofline")
        from mcmc_qec_tpu.models import get_spec
        from mcmc_qec_tpu.utils.roofline import mfu_from_throughput

        for dd, bb, key in [(5, 32768, "pallas_d5"), (9, 32768, "pallas_d9"),
                            (13, 16384, "pallas_d13")]:
            if key in extra:
                tf, mfu = mfu_from_throughput(
                    get_spec("toric", dd), extra[key], bb, 400,
                    equal_betas=True)
                extra[f"mfu_estimate_d{dd}"] = round(mfu, 4)
                extra[f"mxu_tflops_d{dd}"] = round(tf, 2)
    except Exception as e:  # pragma: no cover
        extra["mfu_error"] = str(e)[:200]
    # re-check contention at the end: a run that STARTED idle may have
    # been raced mid-way; flag it so the record is never silently wrong
    end_guard = host_guard(max_wait_s=0.0)
    extra["host_contended_end"] = end_guard["host_contended"]
    extra["loadavg_1min_end"] = end_guard["loadavg_1min"]
    result = {
        "metric": "metropolis_proposals_per_sec_toric_d5",
        "value": round(value, 1),
        "unit": "proposals/s",
        "vs_baseline": round(value / BASELINE_PROPOSALS_PER_S, 2),
        "host_contended": bool(
            extra.get("host_contended") or end_guard["host_contended"]
        ),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
