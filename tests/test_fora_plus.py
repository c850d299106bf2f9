"""G8 walk index + G7 top-k (SURVEY 5.2.3: precision vs exact oracle)."""

import numpy as np

from fora_ray import oracle
from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle

from .graphs import to_dataset


def _dense(scores_ds, n):
    sp = scores_ds.to_pandas()
    out = np.zeros(n)
    out[sp["node_id"]] = sp["ppr"]
    return out


def test_index_build_and_query(graph600, tmp_path):
    edges, n = graph600
    src = int(edges[0, 0])
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        info = alg.build_walk_index(h, seed=5, save_dir=str(tmp_path / "idx"))
        assert info["index_size"] == info["index_walks"] > 0
        s1, st1 = alg.fora_ssppr_indexed(h, src, seed=9)
        g1 = _dense(s1, n)
        # same index, same seed -> identical
        s2, _ = alg.fora_ssppr_indexed(h, src, seed=9)
        assert np.array_equal(g1, _dense(s2, n))
    # reload persisted index into fresh actors -> identical again
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        alg.load_walk_index(h, str(tmp_path / "idx"))
        s3, _ = alg.fora_ssppr_indexed(h, src, seed=9)
        assert np.array_equal(g1, _dense(s3, n))
    # accuracy: same epsilon bound as live FORA
    want = oracle.ppr_power_iteration(edges, n, source=src)
    mask = want > 1.0 / n
    relerr = np.abs(g1[mask] - want[mask]) / want[mask]
    assert (relerr <= 0.5).all()
    assert abs(g1.sum() - 1.0) < 1e-9


def test_topk_precision(graph600):
    edges, n = graph600
    # pick a source whose reachable set comfortably exceeds k (fixture
    # repos are ~64 files, so reachable sets top out around 45)
    k = 10
    src, want = None, None
    for cand in np.unique(edges[:, 0]):
        w = oracle.ppr_power_iteration(edges, n, source=int(cand))
        if (w > 1e-12).sum() >= 4 * k:
            src, want = int(cand), w
            break
    assert src is not None, "fixture has no source with a large reachable set"
    exact_top = set(np.argsort(-want)[:k].tolist())
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        top, stats = alg.topk_ppr(h, src, k=k, seed=1)
        got = top.to_pandas()
    assert len(got) == k
    precision = len(set(got["node_id"].tolist()) & exact_top) / k
    assert precision >= 0.95  # paper reports ~1.0 at eps=0.5


def test_topk_reuses_push_state(graph600):
    """Trial i+1 continues the trial-i push instead of replaying it: the
    total push count across all tightening trials must undercut what
    fresh per-trial FORA runs at the same deltas pay (VERDICT r03 #3)."""
    edges, n = graph600
    src, k = 0, 10
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        _top, stats = alg.topk_ppr(h, src, k=k, seed=1)
        reuse_pushes = h.counters()["pushes"]
        iters = stats["iters"]
    assert iters >= 2, "fixture topk should take multiple trials"
    fresh_pushes = 0
    delta = max(1.0 / k, 1.0 / n)
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        for i in range(iters):
            alg.personalized_pagerank(h, src, mode="fwdpush", delta=delta)
            fresh_pushes += h.counters()["pushes"]
            delta = max(delta / 4.0, 1.0 / n)
    assert reuse_pushes < fresh_pushes, (reuse_pushes, fresh_pushes)


def test_index_load_rejects_mismatched_P(graph600, tmp_path):
    edges, n = graph600
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        alg.build_walk_index(h, seed=5, save_dir=str(tmp_path / "idx2"))
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        import pytest

        with pytest.raises(ValueError, match="built for P=2"):
            alg.load_walk_index(h, str(tmp_path / "idx2"))
