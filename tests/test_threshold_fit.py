"""The finite-size-scaling fit recovers a known threshold from synthetic
binomial data (pins examples/threshold_fit.py's estimator machinery)."""

import importlib.util
import json
import os
import types

import numpy as np
import pytest


def _load_tf():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "threshold_fit.py")
    spec = importlib.util.spec_from_file_location("threshold_fit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synth(tmp_path, p_th=0.189, nu=1.5, n=2048, seed=1):
    rng = np.random.RandomState(seed)
    recs = []
    for d in (5, 7, 9, 11, 13):
        for p in (0.175, 0.1825, 0.19, 0.1975, 0.205):
            x = (p - p_th) * d ** (1.0 / nu)
            f = np.clip(0.45 + 1.3 * x + 0.8 * x * x, 1e-4, 1 - 1e-4)
            k = int(rng.binomial(n, f))
            recs.append({"d": d, "p": p, "n": n, "fails": k,
                         "failure_rate": k / n, "mc_err": 0.01,
                         "converged_frac": 1.0})
    path = tmp_path / "synth.json"
    json.dump(recs, open(path, "w"))
    return str(path)


def test_fit_recovers_synthetic_threshold(tmp_path):
    tf = _load_tf()
    data = _synth(tmp_path)
    args = types.SimpleNamespace(data=data, boot=100, min_converged=0.0,
                                 correction=False)
    out = tf.fit(args)
    assert abs(out["p_th"] - 0.189) < 0.004, out
    lo, hi = out["p_th_ci95"]
    assert lo <= 0.189 <= hi or abs(out["p_th"] - 0.189) < 0.003
    assert 1.0 < out["nu"] < 2.2


def test_fit_zero_failure_point_not_overweighted(tmp_path):
    """A zero-failure point must not act as a near-hard constraint (the
    binomial variance floor is 1/n, not a fixed epsilon)."""
    tf = _load_tf()
    data = _synth(tmp_path, seed=2)
    recs = json.load(open(data))
    # inject an irrelevant deep-sub-threshold zero-failure point
    recs.append({"d": 13, "p": 0.05, "n": 2048, "fails": 0,
                 "failure_rate": 0.0, "mc_err": 0.0005,
                 "converged_frac": 1.0})
    json.dump(recs, open(data, "w"))
    args = types.SimpleNamespace(data=data, boot=50, min_converged=0.0,
                                 correction=False)
    out = tf.fit(args)
    # the quadratic ansatz cannot model p=0.05, but with a sane variance
    # floor the remaining 25 points still dominate the crossing estimate
    assert abs(out["p_th"] - 0.189) < 0.01, out
