"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are testable without TPU hardware.

Note: in some environments jax is pre-imported at interpreter startup (a
sitecustomize registering a TPU plugin), so env vars alone are too late —
we also flip ``jax_platforms`` through the config, which works as long as no
backend has been initialized yet."""

import os

if os.environ.get("MCMC_QEC_TEST_TPU"):
    # opt-in on-chip run: leave the pre-imported TPU platform alone so the
    # @skipif(not ON_TPU) tests (fused-kernel statistics, compiled-path
    # stationarity) execute compiled on the real chip:
    #   MCMC_QEC_TEST_TPU=1 python -m pytest tests/test_pallas_ladder.py
    import jax

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
else:
    _setup_cpu = True

flags = os.environ.get("XLA_FLAGS", "")
if not os.environ.get("MCMC_QEC_TEST_TPU"):
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402  (import after env setup)

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU backend"
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
