"""64-bit-id safety (VERDICT r01 #6): the packed-u64 fast paths must
guard loudly past 2^32, and the wide/pair/join paths must produce
identical results on the same inputs."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from fora_ray.functions.hashing import pack_edge
from fora_ray.stages.edges import dedup_edges, symmetrize
from fora_ray.stages.shuffle import dedup_pairs_block, distinct_pairs

BIG = 1 << 33  # well past the packed-key range


def test_pack_edge_guards_past_2_32():
    with pytest.raises(ValueError, match="2\\^32"):
        pack_edge(np.array([BIG], dtype=np.int64), np.array([1], dtype=np.int64))


def test_dedup_pairs_block_matches_set():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 62, size=500)
    b = rng.integers(0, 1 << 62, size=500)
    a = np.concatenate([a, a[:100]])
    b = np.concatenate([b, b[:100]])  # planted duplicates
    ua, ub = dedup_pairs_block(a, b)
    assert set(zip(ua.tolist(), ub.tolist())) == set(zip(a.tolist(), b.tolist()))
    assert len(ua) == len(set(zip(a.tolist(), b.tolist())))


def _edge_ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
    }))


def test_distinct_pairs_huge_ids():
    rng = np.random.default_rng(7)
    src = rng.integers(BIG, BIG + 1000, size=2000)
    dst = rng.integers(BIG, BIG + 1000, size=2000)
    got = distinct_pairs(_edge_ds(src, dst), "src", "dst").to_pandas()
    want = set(zip(src.tolist(), dst.tolist()))
    assert set(zip(got["src"], got["dst"])) == want


def test_dedup_edges_wide_matches_packed():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 200, size=3000)
    dst = rng.integers(0, 200, size=3000)
    a = dedup_edges(_edge_ds(src, dst)).to_pandas().sort_values(["src", "dst"])
    b = dedup_edges(_edge_ds(src, dst), wide_ids=True).to_pandas().sort_values(["src", "dst"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_triangles_join_matches_broadcast():
    from fora_ray.graph.triangles import triangle_count

    rng = np.random.default_rng(13)
    n = 120
    src = rng.integers(0, n, size=800)
    dst = rng.integers(0, n, size=800)
    keep = src != dst
    sym = symmetrize(_edge_ds(src[keep], dst[keep])).materialize()
    pv_b, tot_b = triangle_count(sym, n, strategy="broadcast")
    pv_j, tot_j = triangle_count(sym, n, strategy="join")
    assert tot_b == tot_j
    db = pv_b.to_pandas().sort_values("node_id").reset_index(drop=True)
    dj = pv_j.to_pandas().sort_values("node_id").reset_index(drop=True)
    # join path zero-fills only vertices present in the edge table
    db_nz = db[db["node_id"].isin(dj["node_id"])].reset_index(drop=True)
    assert db_nz.equals(dj)


def test_triangles_join_huge_ids():
    """The join strategy must count correctly with ids past 2^32 (the
    packed-key paths would raise)."""
    from fora_ray.graph.triangles import triangle_count

    # triangle (0,1,2) + dangling edge (2,3), all shifted past 2^33
    ids = [BIG + 0, BIG + 1, BIG + 2, BIG + 7]
    e = [(0, 1), (1, 2), (0, 2), (2, 3)]
    src = [ids[a] for a, b in e]
    dst = [ids[b] for a, b in e]
    sym = symmetrize(_edge_ds(src + dst, dst + src), wide_ids=True).materialize()
    pv, total = triangle_count(sym, BIG + 8, strategy="join")
    assert total == 1
    got = dict(zip(*[pv.to_pandas()[c] for c in ("node_id", "triangles")]))
    assert got == {ids[0]: 1, ids[1]: 1, ids[2]: 1, ids[3]: 0}


def test_reverse_shards_join_matches_broadcast(ray_session):
    from fora_ray.graph import algorithms as alg
    from fora_ray.graph.runtime import GraphHandle

    rng = np.random.default_rng(17)
    n = 80
    src = rng.integers(0, n, size=400)
    dst = rng.integers(0, n, size=400)
    keep = src != dst
    edges = dedup_edges(_edge_ds(src[keep], dst[keep])).materialize()
    target = int(edges.to_pandas()["dst"].mode().iloc[0])
    hb = GraphHandle.from_reverse_edges(edges, n, P=4, strategy="broadcast")
    hj = GraphHandle.from_reverse_edges(edges, n, P=4, strategy="join")
    try:
        sb, _ = alg.backward_ppr(hb, target, mode="exact")
        sj, _ = alg.backward_ppr(hj, target, mode="exact")
        db = sb.to_pandas().sort_values("node_id").reset_index(drop=True)
        dj = sj.to_pandas().sort_values("node_id").reset_index(drop=True)
        assert db["node_id"].tolist() == dj["node_id"].tolist()
        assert np.abs(db["ppr"].to_numpy() - dj["ppr"].to_numpy()).max() == 0.0
    finally:
        hb.close()
        hj.close()


def test_distributed_degree_balance_matches_driver_path(ray_session):
    """balance='degree' past the threshold must produce the identical
    permutation and identical results with no O(n) driver array."""
    from fora_ray.graph import algorithms as alg
    from fora_ray.graph.runtime import GraphHandle

    rng = np.random.default_rng(23)
    n = 150
    src = rng.integers(0, n, size=900)
    dst = rng.integers(0, n, size=900)
    keep = src != dst
    edges = dedup_edges(_edge_ds(src[keep], dst[keep])).materialize()
    hd = GraphHandle.from_edges(edges, n, P=4, balance="degree")
    hj = GraphHandle.from_edges(edges, n, P=4, balance="degree", balance_threshold=0)
    try:
        assert hj.perm is None and hj.remote_perm
        for v in (0, 1, 17, n - 1):
            assert hd.to_engine(v) == hj.to_engine(v)
        sd, _ = alg.pagerank(hd, tol=1e-12)
        sj, _ = alg.pagerank(hj, tol=1e-12)
        dd = sd.to_pandas().sort_values("node_id").reset_index(drop=True)
        dj = sj.to_pandas().sort_values("node_id").reset_index(drop=True)
        assert dd["node_id"].tolist() == dj["node_id"].tolist()
        assert np.abs(dd["ppr"].to_numpy() - dj["ppr"].to_numpy()).max() == 0.0
        # single-source PPR exercises to_engine on the query path
        pd_, _ = alg.personalized_pagerank(hd, source=3, mode="exact")
        pj_, _ = alg.personalized_pagerank(hj, source=3, mode="exact")
        assert pd_.to_pandas().sort_values("node_id").reset_index(drop=True).equals(
            pj_.to_pandas().sort_values("node_id").reset_index(drop=True))
    finally:
        hd.close()
        hj.close()


def test_make_replicas_distributed_balance_matches_driver_path(ray_session):
    """VERDICT r03 #7: make_replicas must mirror from_edges' distributed
    degree-balance switch — replicas built past the threshold (mocked to
    0) must match the driver-permutation replicas exactly."""
    from fora_ray.graph import algorithms as alg

    rng = np.random.default_rng(29)
    n = 140
    src = rng.integers(0, n, size=800)
    dst = rng.integers(0, n, size=800)
    keep = src != dst
    edges = dedup_edges(_edge_ds(src[keep], dst[keep])).materialize()
    reps_d = alg.make_replicas(edges, n, replicas=2, P=4, balance="degree")
    reps_j = alg.make_replicas(edges, n, replicas=2, P=4, balance="degree",
                               balance_threshold=0)
    try:
        assert all(h.perm is None and h.remote_perm for h in reps_j)
        for v in (0, 5, n - 1):
            assert reps_d[0].to_engine(v) == reps_j[1].to_engine(v)
        sd, _ = alg.personalized_pagerank(reps_d[0], source=7, mode="exact")
        sj, _ = alg.personalized_pagerank(reps_j[1], source=7, mode="exact")
        dd = sd.to_pandas().sort_values("node_id").reset_index(drop=True)
        dj = sj.to_pandas().sort_values("node_id").reset_index(drop=True)
        assert dd["node_id"].tolist() == dj["node_id"].tolist()
        assert np.abs(dd["ppr"].to_numpy() - dj["ppr"].to_numpy()).max() == 0.0
    finally:
        for h in reps_d + reps_j:
            h.close()
