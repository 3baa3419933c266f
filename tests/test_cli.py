"""CLI argument handling (no device work)."""

import numpy as np
import pytest


def test_config_from_args_roundtrip():
    from mcmc_qec_tpu.cli import _add_config_args, _config_from_args
    import argparse

    p = argparse.ArgumentParser()
    _add_config_args(p)
    args = p.parse_args([
        "--code", "planar", "--method", "STDC", "--size", "7",
        "--p-error", "0.12", "--p-sampling", "0.3", "--droplets", "6",
        "--engine", "sweep", "--steps", "1234", "--mwpm-init", "true",
    ])
    cfg = _config_from_args(args)
    assert cfg.code == "planar" and cfg.size == 7
    assert cfg.p_sampling == 0.3 and cfg.droplets == 6
    assert cfg.engine == "sweep" and cfg.steps == 1234
    assert cfg.mwpm_init is True


def test_default_steps_follow_size():
    from mcmc_qec_tpu.pipeline import RunConfig

    assert RunConfig(size=5).steps == 5 * 5**5
    assert RunConfig(size=9).steps == 5 * 9**5
    assert RunConfig(size=9, steps=100).steps == 100


def test_grid_task_mapping():
    from mcmc_qec_tpu.cli import main
    import argparse

    # --task-id maps onto the p grid and sizes, recomputing steps
    # (exercised through the parser without running generate)
    from mcmc_qec_tpu.cli import _add_config_args, _config_from_args

    p = argparse.ArgumentParser()
    _add_config_args(p)
    args = p.parse_args(["--size", "5"])
    cfg = _config_from_args(args)
    # simulate cmd_generate's grid logic
    grid = np.linspace(0.01, 0.4, 10)
    task_id, p_points, sizes = 13, 10, [5, 9]
    cfg.p_error = float(grid[task_id % p_points])
    cfg.size = sizes[(task_id // p_points) % len(sizes)]
    if True:  # args.steps is None
        cfg.steps = int(5 * cfg.size**5)
    assert cfg.size == 9
    assert cfg.steps == 5 * 9**5
