from .pauli import (
    anticommute,
    all_class_states,
    apply_stabilizers_uniform,
    bit_planes,
    class_bits,
    count_errors,
    count_errors_xyz,
    eq_class,
    make_hash_mults,
    pack_key,
    random_logical,
    syndrome,
    to_class,
)
from .metropolis import make_chain_stepper, make_chain_update, make_sweep_stepper
