"""Permutation parity for the extension operators (VERDICT r03 next #1):
every operator that previously REFUSED degree-balanced handles must now
run on them and reproduce the identity-handle result — bit-exactly for
the integer-valued ops (scc, harmonic distances, walks, samples, FORA
walk phases: counter-RNG keys derive from logical ids and neighbor
slots index logical-ordered adjacency), and to float tolerance for the
L2-normalized / summed float ops (hits, bippr, hubppr — per-shard
summation ORDER differs under a permutation, values don't).

Handle pairs under balancing share ONE permutation: the reverse pool is
built with perm=fwd.perm, inv=fwd.inv.
"""

import numpy as np
import pytest

from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle

from .graphs import to_dataset


def _rev_dataset(edges):
    return to_dataset(np.stack([edges[:, 1], edges[:, 0]], axis=1))


@pytest.fixture(scope="module")
def pairs(graph600, ray_session):
    """(identity fwd/rev, balanced fwd/rev with one shared perm) —
    reverse pools via from_reverse_edges (weighted, scc/bippr/hubppr
    contract).  Different P on the balanced pair exercises partition
    invariance at the same time."""
    edges, n = graph600
    hf_i = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    hr_i = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=2)
    hf_b = GraphHandle.from_edges(to_dataset(edges), n, P=3, balance="degree")
    hr_b = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=3,
                                          perm=hf_b.perm, inv=hf_b.inv)
    yield edges, n, hf_i, hr_i, hf_b, hr_b
    for h in (hf_i, hr_i, hf_b, hr_b):
        h.close()


def _df(ds, keys):
    return ds.to_pandas().sort_values(keys).reset_index(drop=True)


def test_scc_balanced_matches_identity(pairs):
    edges, n, hf_i, hr_i, hf_b, hr_b = pairs
    di, _ = alg.scc(hf_i, hr_i)
    db, _ = alg.scc(hf_b, hr_b)
    assert _df(di, ["node_id"]).equals(_df(db, ["node_id"]))


def test_hits_balanced_matches_identity(graph600, ray_session):
    edges, n = graph600
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as hf_i, \
         GraphHandle.from_edges(_rev_dataset(edges), n, P=2) as hr_i:
        di, _ = alg.hits(hf_i, hr_i, max_iters=15)
        di = _df(di, ["node_id"])
    with GraphHandle.from_edges(to_dataset(edges), n, P=3,
                                balance="degree") as hf_b:
        with GraphHandle.from_edges(_rev_dataset(edges), n, P=3,
                                    perm=hf_b.perm, inv=hf_b.inv) as hr_b:
            db, _ = alg.hits(hf_b, hr_b, max_iters=15)
            db = _df(db, ["node_id"])
    assert (di["node_id"] == db["node_id"]).all()
    assert np.allclose(di["hub"], db["hub"], atol=1e-12)
    assert np.allclose(di["authority"], db["authority"], atol=1e-12)


def test_harmonic_balanced_matches_identity(graph600, ray_session):
    edges, n = graph600
    sym = np.unique(np.concatenate([edges, edges[:, ::-1]]), axis=0)
    with GraphHandle.from_edges(to_dataset(sym), n, P=2) as hi:
        di, si = alg.harmonic_centrality(hi, n_pivots=4, seed=7)
        di = _df(di, ["node_id"])
    with GraphHandle.from_edges(to_dataset(sym), n, P=3,
                                balance="degree") as hb:
        db, sb = alg.harmonic_centrality(hb, n_pivots=4, seed=7)
        db = _df(db, ["node_id"])
    assert si["pivots"] == sb["pivots"]  # logical-hash pivot selection
    assert (di["node_id"] == db["node_id"]).all()
    # per-node fold order over pivots is identical -> bit-exact
    assert (di["harmonic"].to_numpy() == db["harmonic"].to_numpy()).all()


def test_neighbor_sample_balanced_matches_identity(graph600, ray_session):
    edges, n = graph600
    seeds = [0, 3, 17, 42]
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as hi:
        ti, _ = alg.neighbor_sample(hi, seeds, fanouts=(4, 3), seed=9)
    with GraphHandle.from_edges(to_dataset(edges), n, P=3,
                                balance="degree") as hb:
        tb, _ = alg.neighbor_sample(hb, seeds, fanouts=(4, 3), seed=9)
    di = ti.to_pandas().sort_values(["hop", "src", "dst"]).reset_index(drop=True)
    db = tb.to_pandas().sort_values(["hop", "src", "dst"]).reset_index(drop=True)
    assert di.equals(db)


def test_fora_walks_balanced_match_identity(graph600, ray_session):
    """The FORA MC phase itself is now logical-keyed: single-source
    fora-mode PPR on a balanced handle reproduces the identity result
    bit-exactly (same seeds -> same walks -> same estimates)."""
    edges, n = graph600
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as hi:
        si, _ = alg.personalized_pagerank(hi, source=17, mode="fora", seed=3)
        di = _df(si, ["node_id"])
    with GraphHandle.from_edges(to_dataset(edges), n, P=3,
                                balance="degree") as hb:
        sb, _ = alg.personalized_pagerank(hb, source=17, mode="fora", seed=3)
        db = _df(sb, ["node_id"])
    assert (di["node_id"] == db["node_id"]).all()
    # reserves accumulate in different per-shard order -> allclose, and
    # the walk CONTRIBUTIONS are identical weights at identical nodes
    assert np.allclose(di["ppr"], db["ppr"], rtol=0, atol=1e-12)


def test_bippr_balanced_matches_identity(pairs):
    edges, n, hf_i, hr_i, hf_b, hr_b = pairs
    target = int(np.bincount(edges[:, 1], minlength=n).argmax())
    ei, _ = alg.bippr(hf_i, hr_i, 351, target, eps=0.5, seed=5)
    eb, _ = alg.bippr(hf_b, hr_b, 351, target, eps=0.5, seed=5)
    assert ei == pytest.approx(eb, abs=1e-12)


def test_hubppr_balanced_matches_identity(pairs):
    edges, n, hf_i, hr_i, hf_b, hr_b = pairs
    target = int(np.bincount(edges[:, 1], minlength=n).argmax())
    hubs_i = alg.select_hubs(hf_i, 8)
    hubs_b = alg.select_hubs(hf_b, 8)
    assert hubs_i.tolist() == hubs_b.tolist()  # logical, perm-invariant
    res = []
    for hf, hr, hubs in ((hf_i, hr_i, hubs_i), (hf_b, hr_b, hubs_b)):
        alg.build_hub_index(hf, hubs, pool_size=64, seed=21)
        alg.build_backward_hub_oracle(hr, hubs, rmax_hub=1e-4)
        est, stats = alg.hubppr(hf, hr, 351, target, eps=0.5, seed=5)
        assert stats["hub_hits"] >= 0
        res.append(est)
    assert res[0] == pytest.approx(res[1], abs=1e-12)
