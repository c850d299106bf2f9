"""SCC via min-label forward/backward intersection vs iterative Tarjan."""

import numpy as np
import pytest

from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle
from fora_ray.oracle import scc_oracle

from .graphs import BRIDGE8, DANGLE3, to_dataset


def _scc_df(edges: np.ndarray, n: int, P: int):
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=P)
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=P)
    try:
        ds, stats = alg.scc(hf, hr)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    finally:
        hf.close()
        hr.close()
    return df, stats


MICROS = {
    # cycle + tail + second cycle + isolated
    "two_cycles": (np.array(
        [[0, 1], [1, 2], [2, 0], [2, 3], [3, 4], [4, 3], [6, 0]],
        dtype=np.int64), 7),
    # chain of singletons (worst case for outer rounds: all trivial SCCs)
    "chain": (np.array([[i, i + 1] for i in range(6)], dtype=np.int64), 7),
    "dangle3": (DANGLE3, 3),
    # bridge8 directed: each K4 is one SCC, the bridge does not merge them
    "bridge8": (BRIDGE8, 8),
}


@pytest.mark.parametrize("name", list(MICROS))
@pytest.mark.parametrize("P", [1, 3])
def test_scc_micro(ray_session, name, P):
    edges, n = MICROS[name]
    edges = np.unique(edges, axis=0)
    df, _ = _scc_df(edges, n, P)
    assert df["scc"].to_numpy().tolist() == scc_oracle(edges, n).tolist()
    assert df["node_id"].tolist() == list(range(n))


@pytest.mark.parametrize("P", [2, 4])
def test_scc_fixture(graph600, ray_session, P):
    edges, n = graph600
    df, stats = _scc_df(edges, n, P)
    assert df["scc"].to_numpy().tolist() == scc_oracle(edges, n).tolist()
    assert stats["outer_rounds"] >= 1


def test_scc_random_digraph_with_big_component(ray_session):
    """Planted giant SCC (a directed cycle over half the nodes) + random
    edges; engine must match Tarjan exactly."""
    rng = np.random.default_rng(5)
    n = 200
    cyc = np.stack([np.arange(100), np.roll(np.arange(100), -1)], axis=1)
    rand = rng.integers(0, n, size=(400, 2))
    edges = np.unique(np.concatenate([cyc, rand]).astype(np.int64), axis=0)
    edges = edges[edges[:, 0] != edges[:, 1]]
    df, _ = _scc_df(edges, n, 3)
    assert df["scc"].to_numpy().tolist() == scc_oracle(edges, n).tolist()


def test_scc_requires_alignment(graph600, ray_session):
    edges, n = graph600
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=4)
    try:
        with pytest.raises(ValueError, match="aligned"):
            alg.scc(hf, hr)
    finally:
        hf.close()
        hr.close()


def _brute_harmonic(edges_sym, n, pivots):
    from collections import deque

    adj = [[] for _ in range(n)]
    for s, d in edges_sym:
        adj[int(s)].append(int(d))
    harm = np.zeros(n)
    for p in pivots:
        dist = np.full(n, -1, np.int64)
        dist[p] = 0
        dq = deque([p])
        while dq:
            v = dq.popleft()
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    dq.append(w)
        reach = dist > 0
        harm[reach] += 1.0 / dist[reach]
    return harm * ((n - 1) / len(pivots))  # scalar-first: engine grouping


@pytest.mark.parametrize("P", [1, 3])
def test_harmonic_centrality_matches_brute(graph600, ray_session, P):
    from .graphs import symmetrized

    edges, n = graph600
    sym = symmetrized(edges)
    h = GraphHandle.from_edges(to_dataset(sym), n, P=P)
    try:
        ds, stats = alg.harmonic_centrality(h, pivots=[0, 7, 42], seed=1)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    finally:
        h.close()
    want = _brute_harmonic(sym, n, [0, 7, 42])
    assert np.array_equal(df["harmonic"].to_numpy(), want)  # bitwise
    assert stats["pivots"] == [0, 7, 42]


def test_harmonic_pivot_sample_deterministic(graph600, ray_session):
    from .graphs import symmetrized

    edges, n = graph600
    sym = symmetrized(edges)
    stats = []
    for P in (2, 4):
        h = GraphHandle.from_edges(to_dataset(sym), n, P=P)
        try:
            _, st = alg.harmonic_centrality(h, n_pivots=4, seed=9)
        finally:
            h.close()
        stats.append(st["pivots"])
    assert stats[0] == stats[1] and len(stats[0]) == 4
