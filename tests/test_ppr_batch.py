"""Batched multi-source PPR (SURVEY 4.4 superstep-wave batching)."""

import numpy as np

from fora_ray import oracle
from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle

from .graphs import to_dataset


def _dense(scores_pd, n, nq):
    out = np.zeros((nq, n))
    out[scores_pd["query_idx"], scores_pd["node_id"]] = scores_pd["ppr"]
    return out


def test_batch_exact_matches_oracle(graph600):
    edges, n = graph600
    sources = [17, int(edges[0, 0]), 351, 42]
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        scores, stats = alg.ppr_batch(h, sources, mode="exact")
        got = _dense(scores.to_pandas(), n, len(sources))
    for q, s in enumerate(sources):
        want = oracle.ppr_power_iteration(edges, n, source=s)
        assert np.allclose(got[q], want, atol=1e-9), f"query {q} (source {s})"
        assert abs(got[q].sum() - 1.0) < 1e-9


def test_batch_fora_bounded_and_deterministic(graph600):
    edges, n = graph600
    sources = [351, int(edges[0, 0])]

    def run(P):
        with GraphHandle.from_edges(to_dataset(edges), n, P=P) as h:
            scores, _ = alg.ppr_batch(h, sources, mode="fora", seed=3)
            return _dense(scores.to_pandas(), n, len(sources))

    a = run(2)
    b = run(2)
    assert np.array_equal(a, b)
    c = run(4)
    assert np.allclose(a, c, atol=1e-15)
    for q, s in enumerate(sources):
        want = oracle.ppr_power_iteration(edges, n, source=s)
        mask = want > 1.0 / n
        relerr = np.abs(a[q][mask] - want[mask]) / want[mask]
        assert (relerr <= 0.5).all()
        assert abs(a[q].sum() - 1.0) < 1e-9
