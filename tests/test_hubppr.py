"""G6 HubPPR: hub-accelerated pairwise PPR vs the forward oracle, the
single-process protocol replay, and plain BiPPR (degradation path)."""

import numpy as np

from fora_ray import oracle
from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle
from fora_ray.protocol_ref import ProtocolSim

from .graphs import to_dataset


def _handles(edges, n, P):
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=P)
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=P)
    return hf, hr


def test_hubppr_accuracy_vs_forward_oracle(graph600):
    edges, n = graph600
    indeg = np.bincount(edges[:, 1], minlength=n)
    targets = [int(t) for t in np.argsort(-indeg)[:2]]
    hf, hr = _handles(edges, n, P=4)
    try:
        alg.build_hub_index(hf, alg.select_hubs(hf, 16), pool_size=512, seed=7)
        alg.build_backward_hub_oracle(hr, alg.select_hubs(hr, 16), rmax_hub=1e-4)
        for t in targets:
            srcs = list(edges[edges[:, 1] == t][:, 0][:2]) + [351]
            for s in srcs:
                want = oracle.ppr_power_iteration(
                    edges, n, source=int(s), dangling="selfloop"
                )[t]
                est, stats = alg.hubppr(hf, hr, int(s), int(t), eps=0.5, seed=7)
                if want > 1.0 / n:
                    assert abs(est - want) / want <= 0.5, (s, t, est, want)
                else:
                    assert abs(est - want) <= 2.0 / n, (s, t, est, want)
    finally:
        hf.close()
        hr.close()


def test_hubppr_matches_protocol_replay(graph600):
    """Distributed hub machinery == single-process replay bit-for-bit
    (consumption slots are key-derived, so results are order-free)."""
    edges, n = graph600
    for P in (2, 4):
        sim = ProtocolSim(edges, n, P=P)
        fh_sim = sim.select_hubs_fwd(16)
        bh_sim = sim.select_hubs_bwd(16)
        sim.build_hub_index(fh_sim, 256, seed=11)
        sim.build_backward_hub_oracle(bh_sim, 1e-4)
        hf, hr = _handles(edges, n, P=P)
        try:
            fh = alg.select_hubs(hf, 16)
            bh = alg.select_hubs(hr, 16)
            assert np.array_equal(fh, fh_sim)
            assert np.array_equal(bh, bh_sim)
            alg.build_hub_index(hf, fh, pool_size=256, seed=11)
            alg.build_backward_hub_oracle(hr, bh, rmax_hub=1e-4)
            indeg = np.bincount(edges[:, 1], minlength=n)
            t = int(np.argsort(-indeg)[0])
            for s in (0, 336, 351):
                est, _ = alg.hubppr(hf, hr, s, t, eps=0.5, seed=11)
                ref = sim.hubppr(s, t, eps=0.5, seed=11)
                assert abs(est - ref) < 1e-12, (P, s, t, est, ref)
        finally:
            hf.close()
            hr.close()


def test_hubppr_without_hubs_degrades_to_bippr(graph600):
    """With no hub structures prepared, hubppr's backward loop and walk
    phase are exactly bippr's — estimates must be identical."""
    edges, n = graph600
    indeg = np.bincount(edges[:, 1], minlength=n)
    t = int(np.argsort(-indeg)[0])
    hf, hr = _handles(edges, n, P=4)
    try:
        want, _ = alg.bippr(hf, hr, 336, t, eps=0.5, seed=3)
        got, stats = alg.hubppr(hf, hr, 336, t, eps=0.5, seed=3)
        assert stats["hub_hits"] == 0 and stats["hub_oracle_applies"] == 0
        assert abs(got - want) < 1e-15, (got, want)
    finally:
        hf.close()
        hr.close()


def test_hubppr_deterministic_across_runs(graph600):
    edges, n = graph600
    indeg = np.bincount(edges[:, 1], minlength=n)
    t = int(np.argsort(-indeg)[0])
    hf, hr = _handles(edges, n, P=4)
    try:
        alg.build_hub_index(hf, alg.select_hubs(hf, 8), pool_size=128, seed=9)
        alg.build_backward_hub_oracle(hr, alg.select_hubs(hr, 8), rmax_hub=1e-3)
        a, _ = alg.hubppr(hf, hr, 351, t, eps=0.5, seed=9)
        b, _ = alg.hubppr(hf, hr, 351, t, eps=0.5, seed=9)
        assert a == b
    finally:
        hf.close()
        hr.close()


def test_hubppr_refuses_mismatched_permutations(graph600):
    # balanced forward + identity reverse: local indices would pair
    # DIFFERENT nodes across the pools — must refuse (a shared perm is
    # accepted; see test_extension_ops_on_balanced_handles)
    edges, n = graph600
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=2, balance="degree")
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=2)
    try:
        import pytest

        with pytest.raises(ValueError, match="same"):
            alg.hubppr(hf, hr, 0, 1)
    finally:
        hf.close()
        hr.close()
