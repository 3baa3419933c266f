"""mcmc_qec_tpu: a TPU-native MCMC quantum-error-correction decoding framework.

A ground-up JAX/XLA/Pallas redesign with the capability surface of the
reference research code (QEC-project-2020/MCMC-QEC-toric-RL): four surface
code families (toric/planar/rotated/xzzx), the full MCMC decoder suite
(PTEQ/ST/STDC/STRC/PTDC/PTRC plus biased/alpha variants), MWPM warm starts
backed by a native C++ exact matching solver, and a batched data-generation
pipeline that shards syndromes over a TPU device mesh.
"""

from . import models, ops

__version__ = "0.1.0"
