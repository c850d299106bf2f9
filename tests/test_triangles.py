"""G11 triangle count vs oracle (exact, FIXTURES F3/F4)."""

import numpy as np
import pytest

from fora_ray import oracle
from fora_ray.graph.triangles import triangle_count

from .graphs import BRIDGE8, CYCLE4, symmetrized, to_dataset


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_bridge8(strategy):
    sym = symmetrized(BRIDGE8)
    per, total = triangle_count(to_dataset(sym), 8, strategy=strategy)
    want_per, want_total = oracle.triangles_oracle(sym, 8)
    assert total == want_total == 8  # two K4s, 4 triangles each
    got = per.to_pandas().sort_values("node_id")["triangles"].to_numpy()
    assert np.array_equal(got, want_per)


def test_cycle4_no_triangles():
    sym = symmetrized(CYCLE4)
    per, total = triangle_count(to_dataset(sym), 4)
    assert total == 0
    assert per.to_pandas()["triangles"].sum() == 0


def test_fixture_triangles(graph600):
    edges, n = graph600
    sym = symmetrized(edges)
    per, total = triangle_count(to_dataset(sym), n)
    want_per, want_total = oracle.triangles_oracle(sym, n)
    assert total == want_total
    got = per.to_pandas().sort_values("node_id")["triangles"].to_numpy()
    assert np.array_equal(got, want_per)


def _lcc_brute(sym: np.ndarray, n: int) -> np.ndarray:
    per, _ = oracle.triangles_oracle(sym, n)
    deg = np.zeros(n, dtype=np.int64)
    for u, v in sym:
        if u != v:
            deg[u] += 1
    denom = deg * (deg - 1)
    return np.where(denom > 0, 2.0 * per / np.maximum(denom, 1), 0.0)


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_clustering_coefficient_matches_brute(strategy, graph600):
    from fora_ray.graph.triangles import clustering_coefficient

    edges, n = graph600
    sym = symmetrized(edges)
    got = (
        clustering_coefficient(to_dataset(sym), n, strategy=strategy)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    want = _lcc_brute(sym, n)
    if strategy == "join":
        # scale path zero-fills only vertices present in the edge table
        mask = np.isin(np.arange(n), got["node_id"].to_numpy())
        assert np.all(want[~mask] == 0.0)
        want = want[mask]
    assert np.allclose(got["lcc"].to_numpy(), want, atol=0, rtol=0)
    assert got["deg"].min() >= 0


# ---------------------------------------------------------------------------
# per-edge supports + k-truss
# ---------------------------------------------------------------------------

def _brute_truss(edges: np.ndarray, k: int):
    und = np.unique(np.concatenate([edges, edges[:, ::-1]]), axis=0)
    und = und[und[:, 0] < und[:, 1]]
    es = {(int(a), int(b)) for a, b in und}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        kept = {(a, b) for a, b in es if len(adj[a] & adj[b]) >= k - 2}
        if kept == es:
            return sorted(kept)
        es = kept


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_edge_supports_bridge8(strategy):
    from fora_ray.graph.triangles import edge_supports

    sym = symmetrized(BRIDGE8)
    sup = (edge_supports(to_dataset(sym), 8, strategy=strategy).to_pandas()
           .sort_values(["lo", "hi"]).reset_index(drop=True))
    # every K4 edge closes 2 triangles; the bridge closes none (absent)
    assert len(sup) == 12
    assert (sup["support"] == 2).all()
    assert (3, 4) not in set(zip(sup["lo"], sup["hi"]))


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_ktruss_bridge8(strategy):
    from fora_ray.graph.triangles import ktruss

    sym = symmetrized(BRIDGE8)
    t4, stats = ktruss(to_dataset(sym), 8, k=4, strategy=strategy)
    got = list(map(tuple, t4.to_pandas()[["lo", "hi"]].to_numpy()))
    assert got == _brute_truss(BRIDGE8, 4)
    assert (3, 4) not in got and len(got) == 12
    t5, _ = ktruss(to_dataset(sym), 8, k=5, strategy=strategy)
    assert t5.count() == 0


def test_ktruss_fixture_matches_brute(graph600):
    from fora_ray.graph.triangles import ktruss

    edges, n = graph600
    sym = symmetrized(edges)
    for k in (3, 4):
        got, _ = ktruss(to_dataset(sym), n, k=k)
        rows = list(map(tuple, got.to_pandas()[["lo", "hi"]].to_numpy()))
        assert rows == _brute_truss(edges, k)
    import pytest as _pt

    with _pt.raises(ValueError):
        ktruss(to_dataset(sym), n, k=2)
