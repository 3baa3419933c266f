"""Production metrics emission (SURVEY §5 observability row).

The reference's only observability is print() progress lines
(generate_data.py:54,140,256).  Here pteq_run and stdc_run emit structured
JSONL when given a MetricsLogger: per-rung swap acceptance, tops0 rate and
energy ESS per window (PTEQ); unique-discovery saturation (STDC).
"""

import json

import numpy as np

import jax

from mcmc_qec_tpu.decoders import PTEQ, PTEQConfig, STDC
from mcmc_qec_tpu.models import get_spec
from mcmc_qec_tpu.models.noise import sample_depolarizing
from mcmc_qec_tpu.utils.metrics import MetricsLogger


def _read(path):
    with open(path) as fh:
        return [json.loads(line) for line in fh]


def test_pteq_emits_window_metrics(tmp_path):
    spec = get_spec("toric", 3)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(0), spec, 0.08, (8,))
    )
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path)
    res = PTEQ(
        spec, states, 0.08,
        PTEQConfig(Nc=3, engine="sweep", max_steps=300, window=100, iters=2),
        seed=1, metrics=logger,
    )
    logger.close()
    recs = [r for r in _read(path) if r["event"] == "pteq_window"]
    assert len(recs) >= 1
    for r in recs:
        assert len(r["swap_accept_rate"]) == 2  # Nc - 1 rung pairs
        assert all(0.0 <= a <= 1.0 for a in r["swap_accept_rate"])
        assert 0.0 <= r["tops0_rate"] <= 1.0
        assert r["energy_ess_per_window"] > 0
        assert r["batch_rows"] == 8
    # adjacent-rung swaps on a short hot ladder must actually accept
    assert max(recs[-1]["swap_accept_rate"]) > 0.05
    assert res.distribution.shape == (8, spec.n_classes)


def test_pteq_metrics_do_not_perturb_results(tmp_path):
    spec = get_spec("toric", 3)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(2), spec, 0.08, (4,))
    )
    cfg = PTEQConfig(Nc=3, engine="sweep", max_steps=200, window=100, iters=2)
    base = PTEQ(spec, states, 0.08, cfg, seed=3)
    logger = MetricsLogger(str(tmp_path / "m.jsonl"))
    with_m = PTEQ(spec, states, 0.08, cfg, seed=3, metrics=logger)
    logger.close()
    np.testing.assert_array_equal(base.distribution, with_m.distribution)


def test_stdc_emits_discovery_metrics(tmp_path):
    spec = get_spec("toric", 3)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(1), spec, 0.1, (4,))
    )
    path = str(tmp_path / "s.jsonl")
    logger = MetricsLogger(path)
    distr = STDC(spec, states, 0.1, 0.25, droplets=2, steps=300, seed=0,
                 engine="sweep", metrics=logger)
    logger.close()
    recs = [r for r in _read(path) if r["event"] == "stdc_run"]
    assert len(recs) == 1
    r = recs[0]
    assert r["n_samples"] == 600
    assert r["unique_min"] >= 1
    assert r["unique_mean"] >= r["unique_min"]
    assert 0.0 <= r["late_discovery_mean"] <= 1.0
    assert distr.shape == (4, spec.n_classes)


def test_stdc_metrics_do_not_perturb_results(tmp_path):
    spec = get_spec("toric", 3)
    states = np.asarray(
        sample_depolarizing(jax.random.PRNGKey(1), spec, 0.1, (4,))
    )
    base = STDC(spec, states, 0.1, 0.25, droplets=2, steps=300, seed=0,
                engine="sweep")
    logger = MetricsLogger(str(tmp_path / "s.jsonl"))
    with_m = STDC(spec, states, 0.1, 0.25, droplets=2, steps=300, seed=0,
                  engine="sweep", metrics=logger)
    logger.close()
    np.testing.assert_allclose(base, with_m, atol=1e-4)
