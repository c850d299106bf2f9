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
