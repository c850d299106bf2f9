"""Checkpoint / resume (SURVEY 4.3): kill mid-query, resume from the last
committed step, final scores identical; partial steps are never resumed."""

import os
import shutil

import numpy as np

from fora_ray.graph import algorithms as alg
from fora_ray.graph.algorithms import _push_loop
from fora_ray.graph.runtime import GraphHandle
from fora_ray.state.checkpoint import latest_step

from .graphs import to_dataset


def test_resume_matches_uninterrupted(graph600, tmp_path):
    edges, n = graph600
    ck = str(tmp_path / "ck")

    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        scores, _ = alg.pagerank(h)
        full = scores.to_pandas().sort_values("node_id").reset_index(drop=True)

    # run 7 rounds with per-round checkpoints, then kill the actors
    h = GraphHandle.from_edges(to_dataset(edges), n, P=4)
    h.call_all("ppr_init", None)
    _push_loop(h, None, rmax=0.0, sweep_all=True, ckpt_dir=ck, ckpt_every=1, max_rounds=7)
    h.close()
    assert latest_step(ck, 4) == 7
    assert os.path.exists(f"{ck}/step=000007/manifest.json")

    # fresh actors resume from step 7 and must reproduce the full run
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        scores, stats = alg.pagerank(h, ckpt_dir=ck, resume=True, ckpt_every=1000)
        resumed = scores.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert stats["rounds"] > 7
    assert np.allclose(full["ppr"].to_numpy(), resumed["ppr"].to_numpy(), atol=1e-15)


def test_partial_step_not_committed(graph600, tmp_path):
    edges, n = graph600
    ck = str(tmp_path / "ck2")
    h = GraphHandle.from_edges(to_dataset(edges), n, P=4)
    h.call_all("ppr_init", None)
    _push_loop(h, None, rmax=0.0, sweep_all=True, ckpt_dir=ck, ckpt_every=1, max_rounds=3)
    h.close()
    assert latest_step(ck, 4) == 3
    # simulate a crash mid-write of step 3: one part file missing
    os.remove(f"{ck}/step=000003/part=0002.parquet")
    assert latest_step(ck, 4) == 2
    shutil.rmtree(f"{ck}/step=000002")
    assert latest_step(ck, 4) == 1


def test_resume_refuses_mismatched_checkpoint(graph600, tmp_path):
    """ADVICE r01: a ckpt-dir written for a different source / P / rmax
    must be refused loudly on resume, never silently restored."""
    import pytest

    edges, n = graph600
    ck = str(tmp_path / "ck2")
    h = GraphHandle.from_edges(to_dataset(edges), n, P=4)
    try:
        h.call_all("ppr_init", 5)
        _push_loop(h, 5, rmax=0.0, sweep_all=True, ckpt_dir=ck, ckpt_every=1, max_rounds=3)
        # resuming the same dir for a DIFFERENT source must raise
        with pytest.raises(ValueError, match="source"):
            alg.personalized_pagerank(h, source=6, mode="exact",
                                      ckpt_dir=ck, resume=True)
        # and for a different rmax regime (fora vs exact) must raise too
        with pytest.raises(ValueError, match="rmax"):
            alg.personalized_pagerank(h, source=5, mode="fora",
                                      ckpt_dir=ck, resume=True)
    finally:
        h.close()
    # a handle with different P: the restore guard trips before any
    # actor state is touched
    h2 = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    try:
        from fora_ray.state.checkpoint import restore_step

        with pytest.raises(ValueError, match="parts"):
            restore_step(h2, ck, 3, ("reserve", "residual"))
    finally:
        h2.close()


def test_batch_resume_matches_uninterrupted(graph600, tmp_path):
    """ppr_batch (the headline batched tier) checkpoints its (n_local, Q)
    push state and resumes to the same converged answer."""
    import pytest

    edges, n = graph600
    ck = str(tmp_path / "ckb")
    srcs = [0, 1, 2, 3]

    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        full, _ = alg.ppr_batch(h, srcs, mode="exact")
        full_df = full.to_pandas().sort_values(["query_idx", "node_id"]).reset_index(drop=True)

    h = GraphHandle.from_edges(to_dataset(edges), n, P=4)
    alg.ppr_batch(h, srcs, mode="exact", ckpt_dir=ck, ckpt_every=1, max_rounds=5)
    h.close()
    assert latest_step(ck, 4) == 5

    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        # mismatched sources must be refused
        with pytest.raises(ValueError, match="sources"):
            alg.ppr_batch(h, [0, 1, 2, 9], mode="exact", ckpt_dir=ck, resume=True)
        res, stats = alg.ppr_batch(h, srcs, mode="exact", ckpt_dir=ck,
                                   resume=True, ckpt_every=10**6)
        res_df = res.to_pandas().sort_values(["query_idx", "node_id"]).reset_index(drop=True)
    assert stats["rounds"] > 5
    assert full_df["node_id"].tolist() == res_df["node_id"].tolist()
    assert np.allclose(full_df["ppr"].to_numpy(), res_df["ppr"].to_numpy(), atol=1e-12)


def test_walk_phase_resume_matches_uninterrupted(graph600, tmp_path):
    """VERDICT r03: mid-walk checkpoints — a fresh handle must resume
    from the last committed walk hop (skipping the push phase entirely)
    and reproduce the uninterrupted run bit-for-bit (counter RNG)."""
    edges, n = graph600
    ck = str(tmp_path / "ck_walk")
    srcs = [3, 17, 42]

    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        scores, _ = alg.ppr_batch(h, srcs, mode="fora", seed=11)
        golden = scores.to_pandas().sort_values(
            ["query_idx", "node_id"]).reset_index(drop=True)

    # full run with per-hop walk checkpoints: leaves a committed
    # mid-walk step behind (only hops with walkers still alive commit)
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        alg.ppr_batch(h, srcs, mode="fora", seed=11, ckpt_dir=ck, ckpt_every=1)
    wk = latest_step(os.path.join(ck, "walk"), 4)
    assert wk is not None and wk >= 1

    # fresh actors: resume must restore hop `wk` and finish the walk
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        scores, stats = alg.ppr_batch(h, srcs, mode="fora", seed=11,
                                      ckpt_dir=ck, resume=True, ckpt_every=1000)
        resumed = scores.to_pandas().sort_values(
            ["query_idx", "node_id"]).reset_index(drop=True)
    assert stats.get("resumed_walk_hop") == wk
    assert golden["node_id"].tolist() == resumed["node_id"].tolist()
    assert np.abs(golden["ppr"].to_numpy() - resumed["ppr"].to_numpy()).max() == 0.0

    # a walk ckpt written for different sources must refuse on resume
    import pytest

    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        with pytest.raises(ValueError, match="refusing to restore"):
            alg.ppr_batch(h, [5, 6, 7], mode="fora", seed=11,
                          ckpt_dir=ck, resume=True)
