"""Engine selection: map the user-facing ``engine`` knob to a concrete
sampler implementation.

``"auto"`` — the default on every decoder entry point and in
``pipeline.RunConfig`` — resolves to the fastest path available for the
decoder family on the current backend, so CLI/API defaults get production
throughput out of the box (the reference has no such split: its only
engine IS its production engine).  ``"literal"`` is the opt-in parity
mode reproducing the reference's one-random-stabilizer-per-update cadence
(src/mcmc.py:82-103) — useful for apples-to-apples statistical
comparisons, ~3 orders of magnitude slower on TPU.

Concrete engines:
 - ``sweep``:  conflict-free-colored full sweeps via XLA (all backends)
 - ``pallas``: the Pallas sweep kernel (counting decoders; TPU only,
   falls back to ``sweep`` elsewhere)
 - ``fused``:  the whole PT window in one Pallas VMEM kernel (PTEQ only;
   TPU only, falls back to ``sweep`` when off-TPU or VMEM-bound)
"""

from __future__ import annotations

import jax

VALID_ENGINES = ("auto", "literal", "sweep", "pallas", "fused")


def resolve_engine(engine: str, kind: str) -> str:
    """Resolve ``"auto"`` for a decoder family.

    kind: ``"pteq"`` (PT-ladder window decoders), ``"counting"``
    (STDC/STRC droplet samplers), ``"chain"`` (plain ladder/static paths
    with no specialized kernel).
    """
    if engine not in VALID_ENGINES:
        raise ValueError(
            f"unknown engine {engine!r}; expected one of {VALID_ENGINES}"
        )
    if engine != "auto":
        return engine
    if kind == "pteq":
        # make_pallas_ladder_window falls back to the XLA sweep window
        # off-TPU or when the fused state exceeds VMEM
        return "fused"
    if kind == "counting":
        # make_sampler falls back to the dense sweep off-TPU
        return "pallas" if jax.default_backend() == "tpu" else "sweep"
    return "sweep"
