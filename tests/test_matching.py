"""Native blossom solver vs brute force on random graphs."""

import numpy as np
import pytest

from mcmc_qec_tpu.native import brute_force_mwpm, build_library, mwpm_solve


def test_builds():
    assert build_library().endswith(".so")


@pytest.mark.parametrize("trial", range(30))
def test_random_complete_graphs(trial):
    rng = np.random.RandomState(trial)
    n = rng.choice([2, 4, 6, 8, 10])
    edges = []
    for u in range(n):
        for v in range(u + 1, n):
            edges.append((u, v, rng.randint(0, 50)))
    edges = np.array(edges)
    match, total = mwpm_solve(n, edges)
    bf_match, bf_total = brute_force_mwpm(n, edges)
    assert total == bf_total, f"n={n}: got {total}, brute force {bf_total}"
    # verify it is a valid perfect matching
    assert np.all(match[match] == np.arange(n))
    assert np.all(match >= 0)


@pytest.mark.parametrize("trial", range(10))
def test_random_sparse_graphs(trial):
    rng = np.random.RandomState(100 + trial)
    n = rng.choice([4, 6, 8])
    edges = []
    # random graph: keep each edge w.p. 0.7, retry until matchable
    for u in range(n):
        for v in range(u + 1, n):
            if rng.rand() < 0.7:
                edges.append((u, v, rng.randint(0, 30)))
    edges = np.array(edges) if edges else np.zeros((0, 3), int)
    bf_match, bf_total = brute_force_mwpm(n, edges)
    if bf_match is None:
        with pytest.raises(ValueError):
            mwpm_solve(n, edges)
    else:
        match, total = mwpm_solve(n, edges)
        assert total == bf_total


def test_zero_weight_edges():
    # ancilla-ancilla edges in the planar construction have weight 0
    # (mwpm.py:96); matching must handle them
    edges = np.array([(0, 1, 5), (2, 3, 0), (0, 2, 1), (1, 3, 1), (0, 3, 7), (1, 2, 9)])
    match, total = mwpm_solve(4, edges)
    assert total == 2  # (0,2) + (1,3)


def test_larger_random_graph_is_fast_and_valid():
    rng = np.random.RandomState(7)
    n = 100
    iu, iv = np.triu_indices(n, 1)
    edges = np.stack([iu, iv, rng.randint(0, 1000, len(iu))], axis=1)
    match, total = mwpm_solve(n, edges)
    assert np.all(match[match] == np.arange(n))
    # sanity: greedy upper bound
    greedy = 0
    used = np.zeros(n, bool)
    order = np.argsort(edges[:, 2])
    for u, v, w in edges[order]:
        if not used[u] and not used[v]:
            used[u] = used[v] = True
            greedy += w
    assert total <= greedy
