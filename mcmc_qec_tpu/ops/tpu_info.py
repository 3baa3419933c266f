"""TPU device introspection for kernel compiler parameters.

The fused-window and sweep kernels want a scoped-VMEM ceiling above the
Mosaic default of 16 MiB for large-d shapes (d >= 9 wants ~18+ MiB of
kernel stack).  The safe ceiling depends on the chip generation, so the
limit is derived from the detected device kind instead of hard-coding a
v5e-class value — on older generations with small VMEM the override is
skipped and the compiler default applies (ADVICE r2: a fixed 100 MiB cap
is invalid on 16-32 MiB parts).
"""

from __future__ import annotations

import os
from typing import Optional

# Physical VMEM per core by device-kind substring (first match wins).
# v4 (128 MiB CMEM-class parts) and the v5/v6 families all carry >= 128
# MiB of VMEM; v2/v3 carry 16 MiB and must keep the compiler default.
_VMEM_BY_KIND = (
    ("v5 lite", 128 << 20),
    ("v5e", 128 << 20),
    ("v5p", 128 << 20),
    ("v5", 128 << 20),
    ("v6", 128 << 20),
    ("v4", 128 << 20),
    ("v3", 16 << 20),
    ("v2", 16 << 20),
)

_DEFAULT_SCOPED_LIMIT = 16 << 20  # Mosaic's default scoped-VMEM ceiling


def device_vmem_bytes(device=None) -> Optional[int]:
    """Physical VMEM of ``device`` (default: first visible device), or None
    when the kind is unrecognized / no TPU is visible."""
    if device is None:
        import jax

        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = getattr(device, "device_kind", "") or ""
    kind = kind.lower()
    for sub, size in _VMEM_BY_KIND:
        if sub in kind:
            return size
    return None


def scoped_vmem_limit(fraction: float = 0.78) -> Optional[int]:
    """Scoped-VMEM limit (bytes) to pass as CompilerParams.vmem_limit_bytes,
    or None to keep the compiler default.

    ``MCMC_QEC_VMEM_LIMIT_BYTES`` overrides (0 = keep default).  Otherwise
    the limit is ``fraction`` of the detected device VMEM, and only when
    that exceeds the compiler's own 16 MiB default — raising the cap on a
    16 MiB part would let compilation claim VMEM the chip doesn't have.
    """
    env = os.environ.get("MCMC_QEC_VMEM_LIMIT_BYTES")
    if env is not None:
        v = int(env)
        return v if v > 0 else None
    size = device_vmem_bytes()
    if size is None:
        return None
    limit = int(size * fraction)
    return limit if limit > _DEFAULT_SCOPED_LIMIT else None
