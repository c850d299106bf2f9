"""G5 backward push + BiPPR vs the forward oracle."""

import numpy as np

from fora_ray import oracle
from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle

from .graphs import to_dataset


def test_backward_push_exact_matches_forward_column(graph600):
    edges, n = graph600
    # target with healthy in-degree
    target = int(np.bincount(edges[:, 1], minlength=n).argmax())
    with GraphHandle.from_reverse_edges(to_dataset(edges), n, P=4) as hr:
        scores, stats = alg.backward_ppr(hr, target, mode="exact")
        sp = scores.to_pandas()
        got = np.zeros(n)
        got[sp["node_id"]] = sp["ppr"]
    # oracle column: forward PPR from a sample of sources
    for s in [target, int(edges[0, 0]), 351]:
        want = oracle.ppr_power_iteration(edges, n, source=s, dangling="selfloop")[target]
        assert abs(got[s] - want) < 1e-9, (s, got[s], want)


def test_bippr_pairwise(graph600):
    edges, n = graph600
    target = int(np.bincount(edges[:, 1], minlength=n).argmax())
    source = 351
    want = oracle.ppr_power_iteration(edges, n, source=source, dangling="selfloop")[target]
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as hf, \
         GraphHandle.from_reverse_edges(to_dataset(edges), n, P=2) as hr:
        est, stats = alg.bippr(hf, hr, source, target, eps=0.5, seed=5)
    if want > 1.0 / n:
        assert abs(est - want) / want <= 0.5
    else:
        assert abs(est - want) <= 2.0 / n
