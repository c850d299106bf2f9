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
