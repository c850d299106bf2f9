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


# ---------------------------------------------------------------------------
# betweenness centrality (pivot-sampled Brandes)
# ---------------------------------------------------------------------------

def _brute_brandes(edges: np.ndarray, n: int, sources) -> np.ndarray:
    """Textbook Brandes on the directed graph, restricted to `sources`."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[int(s)].append(int(d))
    bc = np.zeros(n, np.float64)
    for s in sources:
        dist = np.full(n, -1, np.int64)
        sigma = np.zeros(n, np.float64)
        dist[s], sigma[s] = 0, 1.0
        order, dq = [s], deque([s])
        while dq:
            v = dq.popleft()
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(n, np.float64)
        for v in reversed(order):
            for w in adj[v]:
                if dist[w] == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        delta[s] = 0.0
        bc += delta
    return bc


def _bc_df(edges: np.ndarray, n: int, P: int, **kw):
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=P)
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=P)
    try:
        ds, stats = alg.betweenness_centrality(hf, hr, **kw)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    finally:
        hf.close()
        hr.close()
    return df, stats


@pytest.mark.parametrize("name", list(MICROS))
@pytest.mark.parametrize("P", [1, 3])
def test_betweenness_exact_micro(ray_session, name, P):
    """pivots = ALL nodes -> scale n/k = 1 -> the EXACT directed
    betweenness; compared against textbook Brandes."""
    edges, n = MICROS[name]
    edges = np.unique(edges, axis=0)
    df, _ = _bc_df(edges, n, P, pivots=list(range(n)))
    assert np.allclose(df["betweenness"].to_numpy(),
                       _brute_brandes(edges, n, range(n)), atol=1e-9)
    assert df["node_id"].tolist() == list(range(n))


@pytest.mark.parametrize("P", [2, 4])
def test_betweenness_pivot_sample_fixture(graph600, ray_session, P):
    """Pivot-sampled estimate on the 600-node fixture: engine pivots
    must equal the brute hash sample, values allclose to brute Brandes
    restricted to those pivots (scaled n/k)."""
    from fora_ray.functions.hashing import mix64

    edges, n = graph600
    df, stats = _bc_df(edges, n, P, n_pivots=8, seed=42)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, edges[:, 0], 1)
    ids = np.nonzero(deg > 0)[0].astype(np.int64)
    keys = mix64(np.uint64(42), ids.astype(np.uint64))
    pivots = [int(v) for v in ids[np.lexsort((ids, keys))[:8]]]
    assert stats["pivots"] == pivots
    want = _brute_brandes(edges, n, pivots) * (n / 8)
    assert np.allclose(df["betweenness"].to_numpy(), want, rtol=1e-9, atol=1e-9)


def test_betweenness_balanced_pair_matches_identity(graph600, ray_session):
    edges, n = graph600
    di, _ = _bc_df(edges, n, 2, n_pivots=6, seed=7)
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=3, balance="degree")
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=3,
                                        perm=hf.perm, inv=hf.inv)
    try:
        ds, _ = alg.betweenness_centrality(hf, hr, n_pivots=6, seed=7)
        db = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    finally:
        hf.close()
        hr.close()
    assert np.allclose(di["betweenness"].to_numpy(),
                       db["betweenness"].to_numpy(), rtol=1e-9, atol=1e-12)


def test_betweenness_refuses_mismatched_pair(graph600, ray_session):
    edges, n = graph600
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=2, balance="degree")
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=2)
    try:
        with pytest.raises(ValueError, match="shard-aligned"):
            alg.betweenness_centrality(hf, hr)
    finally:
        hf.close()
        hr.close()
    # identity pools at DIFFERENT P pass same_perm_as but must refuse
    # loudly (same n/P guard), not die inside bc_state alignment
    hf2 = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    hr4 = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=4)
    try:
        with pytest.raises(ValueError, match="same n, P"):
            alg.betweenness_centrality(hf2, hr4)
    finally:
        hf2.close()
        hr4.close()


# ---------------------------------------------------------------------------
# maximal independent set (deterministic Luby)
# ---------------------------------------------------------------------------

def _sym(edges: np.ndarray) -> np.ndarray:
    und = np.unique(np.concatenate([edges, edges[:, ::-1]]), axis=0)
    return und[und[:, 0] != und[:, 1]]


def _mis_df(edges: np.ndarray, n: int, P: int, seed: int = 42):
    h = GraphHandle.from_edges(to_dataset(_sym(edges)), n, P=P)
    try:
        ds, stats = alg.maximal_independent_set(h, seed=seed)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    finally:
        h.close()
    return df, stats


@pytest.mark.parametrize("name", list(MICROS))
@pytest.mark.parametrize("P", [1, 3])
def test_mis_properties_micro(ray_session, name, P):
    """Independence (no edge inside the set) + maximality (every
    outside node has a neighbor inside) — exact properties, checked
    directly against the edge list."""
    edges, n = MICROS[name]
    df, _ = _mis_df(np.unique(edges, axis=0), n, P)
    inm = df["in_mis"].to_numpy()
    und = _sym(np.unique(edges, axis=0))
    assert not (inm[und[:, 0]] & inm[und[:, 1]]).any()  # independent
    has_in_nb = np.zeros(n, dtype=bool)
    np.logical_or.at(has_in_nb, und[:, 0], inm[und[:, 1]])
    assert (inm | has_in_nb).all()  # maximal (isolated nodes join)


def test_mis_matches_golden_replay_and_partition_invariant(
        fix600, graph600, ray_session):
    from fora_ray.goldens import mis_golden

    edges, n = graph600
    gold = mis_golden(fix600, seed=42).to_pandas()
    for P in (2, 4):
        df, _ = _mis_df(edges, n, P)
        assert df.equals(gold.reset_index(drop=True))
    # property check on the fixture too
    inm = gold["in_mis"].to_numpy()
    und = _sym(edges)
    assert not (inm[und[:, 0]] & inm[und[:, 1]]).any()
    has_in_nb = np.zeros(n, dtype=bool)
    np.logical_or.at(has_in_nb, und[:, 0], inm[und[:, 1]])
    assert (inm | has_in_nb).all()


def test_greedy_color_proper_and_matches_golden(fix600, graph600, ray_session):
    """Iterated-Luby coloring: proper (no edge shares a color), every
    node colored, bit-exact vs the golden replay at P=2 and P=4."""
    from fora_ray.goldens import greedy_color_golden

    edges, n = graph600
    gold = greedy_color_golden(fix600, seed=42).to_pandas()
    for P in (2, 4):
        h = GraphHandle.from_edges(to_dataset(_sym(edges)), n, P=P)
        try:
            ds, stats = alg.greedy_color(h, seed=42)
            df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
        finally:
            h.close()
        assert df.equals(gold.reset_index(drop=True))
        assert stats["colors"] == int(gold["color"].max()) + 1
    col = gold["color"].to_numpy()
    assert (col >= 0).all()
    und = _sym(edges)
    assert (col[und[:, 0]] != col[und[:, 1]]).all()
    # colors bounded by max degree + 1
    deg = np.zeros(n, np.int64)
    np.add.at(deg, und[:, 0], 1)
    assert col.max() <= deg.max()


def test_greedy_color_succeeds_at_exactly_max_colors(ray_session):
    """A graph that needs exactly max_colors classes must succeed (the
    old while/else raised even though every node was colored — ADVICE
    r04): K3 needs 3 colors; max_colors=3 must return, max_colors=2
    must raise."""
    k3 = np.array([[0, 1], [1, 2], [0, 2]], dtype=np.int64)
    h = GraphHandle.from_edges(to_dataset(_sym(k3)), 3, P=1)
    try:
        ds, stats = alg.greedy_color(h, seed=42, max_colors=3)
        df = ds.to_pandas().sort_values("node_id")
        assert sorted(df["color"].tolist()) == [0, 1, 2]
        assert stats["colors"] == 3
    finally:
        h.close()
    h = GraphHandle.from_edges(to_dataset(_sym(k3)), 3, P=1)
    try:
        with pytest.raises(RuntimeError, match="max_colors"):
            alg.greedy_color(h, seed=42, max_colors=2)
    finally:
        h.close()


# ---------------------------------------------------------------------------
# K-lane pivot batching (r5): lane_batch must not change results
# ---------------------------------------------------------------------------
def test_betweenness_lane_batch_parity(graph600, ray_session):
    """Batched lanes (all 8 pivots in one wave) vs lane_batch=1 (the
    sequential per-pivot schedule) must agree to float tolerance, with
    the batched wave using ~max-depth rounds instead of sum-of-depths."""
    edges, n = graph600
    d1, s1 = _bc_df(edges, n, 2, n_pivots=8, seed=42, lane_batch=1)
    d8, s8 = _bc_df(edges, n, 2, n_pivots=8, seed=42, lane_batch=8)
    assert s1["pivots"] == s8["pivots"]
    assert np.allclose(d1["betweenness"].to_numpy(),
                       d8["betweenness"].to_numpy(), rtol=1e-9, atol=1e-12)
    # 8 pivots in one wave: rounds collapse from sum-of-depths to max-depth
    assert s8["fwd_rounds"] < s1["fwd_rounds"]
    assert s8["bwd_rounds"] <= s1["bwd_rounds"]


def test_harmonic_lane_batch_parity(graph600, ray_session):
    """Harmonic lanes: bitwise-equal results at any lane_batch (the
    per-lane fold preserves pivot order), fewer superstep rounds."""
    from .graphs import symmetrized

    edges, n = graph600
    sym = symmetrized(edges)
    out = {}
    for lb in (1, 8):
        h = GraphHandle.from_edges(to_dataset(sym), n, P=3)
        try:
            ds, st = alg.harmonic_centrality(h, n_pivots=8, seed=3,
                                             lane_batch=lb)
            out[lb] = (ds.to_pandas().sort_values("node_id")
                       .reset_index(drop=True), st)
        finally:
            h.close()
    assert np.array_equal(out[1][0]["harmonic"].to_numpy(),
                          out[8][0]["harmonic"].to_numpy())  # bitwise
    assert out[8][1]["bfs_rounds"] < out[1][1]["bfs_rounds"]
    assert out[8][1]["waves"] == 1 and out[1][1]["waves"] == 8
