from .graph import (
    class_sorted_mwpm,
    enhanced_mwpm,
    generate_classes,
    generate_edges,
    generate_edges_constrained,
    mwpm_correction,
    regular_mwpm,
    shortest_distance,
    solve_layer,
)
