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


def test_ktruss_incremental_matches_recompute(graph600):
    """The incremental (support-decrement) peeling and the
    full-recompute loop are the same fixpoint — identical edge sets on
    the fixture at k=3 and k=4, and the incremental run enumerates
    triangles exactly once."""
    from fora_ray.graph.triangles import ktruss

    edges, n = graph600
    sym = symmetrized(edges)
    for k in (3, 4):
        inc, si = ktruss(to_dataset(sym), n, k=k, mode="incremental")
        rec, sr = ktruss(to_dataset(sym), n, k=k, mode="recompute")
        a = inc.to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True)
        b = rec.to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True)
        assert a.equals(b)
        assert si["mode"] == "incremental" and sr["mode"] == "recompute"
        assert si["edges"] == sr["edges"]


def _brute_trussness(edges: np.ndarray):
    und = symmetrized(edges)
    und = und[und[:, 0] < und[:, 1]]
    cur = {(int(a), int(b)) for a, b in np.unique(und, axis=0)}
    truss = {e: 2 for e in cur}
    k = 3
    while cur:
        while True:
            adj: dict[int, set] = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {(a, b) for a, b in cur if len(adj[a] & adj[b]) < k - 2}
            if not drop:
                break
            for e in drop:
                truss[e] = k - 1
            cur -= drop
        k += 1
    return truss


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_trussness_bridge8(strategy):
    """Bridged K4s: every K4 edge has trussness 4 (each closes 2
    triangles inside its K4), the bridge has trussness 2 (no
    triangles)."""
    from fora_ray.graph.triangles import trussness

    sym = symmetrized(BRIDGE8)
    got, stats = trussness(to_dataset(sym), 8, strategy=strategy)
    df = got.to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True)
    assert len(df) == 13
    tr = {(int(a), int(b)): int(t)
          for a, b, t in df[["lo", "hi", "trussness"]].to_numpy()}
    assert tr[(3, 4)] == 2
    assert all(v == 4 for e, v in tr.items() if e != (3, 4))
    assert stats["max_trussness"] == 4


def test_trussness_fixture_matches_brute(graph600):
    from fora_ray.graph.triangles import trussness

    edges, n = graph600
    sym = symmetrized(edges)
    got, _ = trussness(to_dataset(sym), n)
    df = got.to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True)
    want = _brute_trussness(edges)
    assert len(df) == len(want)
    got_map = {(int(a), int(b)): int(t)
               for a, b, t in df[["lo", "hi", "trussness"]].to_numpy()}
    assert got_map == want
