"""Distributed graph algorithms vs single-process oracles (SURVEY 5.2.2-3).

mode="exact" results must be allclose 1e-6 (we assert 1e-9) vs numpy
power iteration; CC/LPA exact; FORA mode deterministic per seed and
inside the paper's epsilon bound.
"""

import numpy as np
import pytest
import ray

from fora_ray import oracle
from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle

from .graphs import ALL, BRIDGE8, DANGLE3, symmetrized, to_dataset


def _scores_to_dense(scores_ds, n):
    sp = scores_ds.to_pandas()
    out = np.zeros(n)
    out[sp["node_id"]] = sp["ppr"]
    return out


@pytest.mark.parametrize("name", list(ALL))
def test_ppr_exact_micro(name):
    edges, n = ALL[name]
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        scores, stats = alg.personalized_pagerank(h, 0, mode="exact")
        got = _scores_to_dense(scores, n)
    want = oracle.ppr_power_iteration(edges, n, source=0)
    assert np.allclose(got, want, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9  # alpha-mass conservation


def test_ppr_exact_fixture(graph600):
    edges, n = graph600
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        for src in (17, int(edges[0, 0])):
            scores, _ = alg.personalized_pagerank(h, src, mode="exact")
            got = _scores_to_dense(scores, n)
            want = oracle.ppr_power_iteration(edges, n, source=src)
            assert np.allclose(got, want, atol=1e-9)


def test_pagerank_fixture(graph600):
    edges, n = graph600
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        scores, _ = alg.pagerank(h)
        got = _scores_to_dense(scores, n)
    want = oracle.ppr_power_iteration(edges, n, source=None)
    assert np.allclose(got, want, atol=1e-9)


def test_dangling_mass_returns_to_source():
    """DANGLE3: node 2 has no out-edges; its mass must restart at source 0
    (SURVEY 2.4 G1 convention)."""
    n = 3
    with GraphHandle.from_edges(to_dataset(DANGLE3), n, P=2) as h:
        scores, _ = alg.personalized_pagerank(h, 0, mode="exact")
        got = _scores_to_dense(scores, n)
    want = oracle.ppr_power_iteration(DANGLE3, n, source=0)
    assert np.allclose(got, want, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-12


def test_fora_mode_deterministic_and_bounded(graph600):
    edges, n = graph600
    src = int(edges[0, 0])

    def run(P, seed):
        with GraphHandle.from_edges(to_dataset(edges), n, P=P) as h:
            scores, stats = alg.personalized_pagerank(h, src, mode="fora", seed=seed)
            return _scores_to_dense(scores, n), stats

    g2, st = run(2, seed=7)
    g2b, _ = run(2, seed=7)
    assert np.array_equal(g2, g2b)  # bit-identical at fixed P
    g4, _ = run(4, seed=7)
    assert np.allclose(g2, g4, atol=1e-15)  # float-sum order only across P
    g_other, _ = run(2, seed=8)
    assert not np.array_equal(g2, g_other)  # MC is actually randomized
    # paper guarantee: relative error <= eps for all pi > delta
    want = oracle.ppr_power_iteration(edges, n, source=src)
    mask = want > 1.0 / n
    relerr = np.abs(g2[mask] - want[mask]) / want[mask]
    assert (relerr <= 0.5).all()
    assert abs(g2.sum() - 1.0) < 1e-9


def test_monte_carlo_baseline(graph600):
    edges, n = graph600
    src = int(edges[0, 0])
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        scores, stats = alg.monte_carlo_ppr(h, src, seed=3)
        got = _scores_to_dense(scores, n)
    want = oracle.ppr_power_iteration(edges, n, source=src)
    mask = want > 1.0 / n
    relerr = np.abs(got[mask] - want[mask]) / want[mask]
    assert (relerr <= 0.5).all()


def test_cc_and_lpa(graph600):
    edges, n = graph600
    sym = symmetrized(edges)
    with GraphHandle.from_edges(to_dataset(sym), n, P=4) as h:
        labels, _ = alg.connected_components(h)
        got = labels.to_pandas().sort_values("node_id")["label"].to_numpy()
        assert np.array_equal(got, oracle.cc_oracle(sym, n))
        labels, _ = alg.label_propagation(h, max_rounds=20)
        got = labels.to_pandas().sort_values("node_id")["label"].to_numpy()
        assert np.array_equal(got, oracle.lpa_oracle(sym, n, max_rounds=20))


def test_cc_bridge8():
    sym = symmetrized(BRIDGE8)
    with GraphHandle.from_edges(to_dataset(sym), 8, P=2) as h:
        labels, _ = alg.connected_components(h)
        got = labels.to_pandas().sort_values("node_id")["label"].to_numpy()
    assert np.array_equal(got, np.zeros(8))  # one component, min id 0


def test_mass_conservation_each_round(graph600):
    """After every push superstep Σreserve + Σresidual == 1 (SURVEY 5.2.1)."""
    edges, n = graph600
    from fora_ray.graph.algorithms import _push_loop

    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        h.call_all("ppr_init", 17)
        for _ in range(5):
            metas, rsums = h._exchange("push_round", "apply_residual", 0.0, True)
            dang = sum(m["dangling"] for m in metas)
            if dang > 0:
                h.call_all("add_source_residual", 17, dang)
            rsum = sum(rsums) + dang
            tables = ray.get([w.get_scores.remote(True) for w in h.workers])
            reserve_sum = sum(
                t["ppr"].to_numpy().sum() for t in tables if t.num_rows
            )
            assert abs(reserve_sum + rsum - 1.0) < 1e-12


def test_degree_balanced_partitioning(graph600):
    """balance='degree' (north_star degree-balanced CSR shards) must give
    identical results to plain mod partitioning for every algorithm."""
    edges, n = graph600
    from .graphs import symmetrized

    with GraphHandle.from_edges(to_dataset(edges), n, P=4, balance="degree") as h:
        assert h.perm is not None
        scores, _ = alg.personalized_pagerank(h, 351, mode="exact")
        got = _scores_to_dense(scores, n)
        want = oracle.ppr_power_iteration(edges, n, source=351)
        assert np.allclose(got, want, atol=1e-9)
        scores, _ = alg.pagerank(h)
        got = _scores_to_dense(scores, n)
        assert np.allclose(got, oracle.ppr_power_iteration(edges, n, source=None), atol=1e-9)
        scores, _ = alg.personalized_pagerank(h, 351, mode="fora", seed=4)
        got = _scores_to_dense(scores, n)
        mask = want > 1.0 / n
        assert (np.abs(got[mask] - want[mask]) / want[mask] <= 0.5).all()
    sym = symmetrized(edges)
    with GraphHandle.from_edges(to_dataset(sym), n, P=4, balance="degree") as h:
        labels, _ = alg.connected_components(h)
        got = labels.to_pandas().sort_values("node_id")["label"].to_numpy()
        assert np.array_equal(got, oracle.cc_oracle(sym, n))
        labels, _ = alg.label_propagation(h, max_rounds=20)
        got = labels.to_pandas().sort_values("node_id")["label"].to_numpy()
        assert np.array_equal(got, oracle.lpa_oracle(sym, n, max_rounds=20))


def test_degree_balance_spreads_hubs(graph600):
    """The permutation must deal the hubs round-robin: the top-P
    out-degree nodes get engine ids 0..P-1 (all different shards), and
    per-shard edge mass is near-even."""
    edges, n = graph600
    P = 4
    with GraphHandle.from_edges(to_dataset(edges), n, P=P, balance="degree") as h:
        deg = np.bincount(edges[:, 0], minlength=n)
        top = np.lexsort((np.arange(n), -deg))[:P]
        engine_ids = h.perm[top]
        assert sorted(engine_ids.tolist()) == list(range(P))
        # per-shard edge mass (sum of out-degrees of its vertices)
        shard_mass = np.zeros(P, dtype=np.int64)
        for v in range(n):
            shard_mass[h.perm[v] % P] += deg[v]
        assert shard_mass.max() <= 1.3 * max(shard_mass.mean(), 1)


def test_scale_5000_correctness():
    """sf-correctness scale (FIXTURES): PPR + CC at n=5000 vs oracles."""
    import pyarrow.parquet as pq

    from fora_ray.fixtures import fixture_dir

    fix = fixture_dir(5000)
    ge = pq.read_table(f"{fix}/edges.parquet")
    edges = np.stack([ge["src"].to_numpy(), ge["dst"].to_numpy()], axis=1)
    n = 5000
    with GraphHandle.from_edges(to_dataset(edges), n, P=4, balance="degree") as h:
        scores, _ = alg.pagerank(h)
        got = _scores_to_dense(scores, n)
        want = oracle.ppr_power_iteration(edges, n, source=None)
        assert np.allclose(got, want, atol=1e-9)
        scores, _ = alg.personalized_pagerank(h, 100, mode="fora", seed=2)
        got = _scores_to_dense(scores, n)
        want = oracle.ppr_power_iteration(edges, n, source=100)
        mask = want > 1.0 / n
        if mask.any():
            assert (np.abs(got[mask] - want[mask]) / want[mask] <= 0.5).all()
    sym = symmetrized(edges)
    with GraphHandle.from_edges(to_dataset(sym), n, P=4) as h:
        labels, _ = alg.connected_components(h)
        got = labels.to_pandas().sort_values("node_id")["label"].to_numpy()
        assert np.array_equal(got, oracle.cc_oracle(sym, n))


def test_local_tier_matches_contract(graph600):
    """P=1 local_query: same kernels as the distributed path — oracle
    bound holds, deterministic per seed, exact mode matches oracle."""
    edges, n = graph600
    from fora_ray.graph.algorithms import local_ppr_batch, make_replicas

    reps = make_replicas(to_dataset(edges), n, replicas=2, P=1)
    try:
        sources = [351, int(edges[0, 0]), 17]
        res, _ = local_ppr_batch(reps, sources, mode="fora", seed=5)
        res2, _ = local_ppr_batch(reps, sources, mode="fora", seed=5)
        for (s, t1), (_, t2) in zip(res, res2):
            assert t1.equals(t2)  # deterministic per seed
            got = np.zeros(n)
            got[t1["node_id"].to_numpy()] = t1["ppr"].to_numpy()
            want = oracle.ppr_power_iteration(edges, n, source=s)
            mask = want > 1.0 / n
            if mask.any():
                relerr = np.abs(got[mask] - want[mask]) / want[mask]
                assert (relerr <= 0.5).all()
            assert abs(got.sum() - 1.0) < 1e-9
        res_e, _ = local_ppr_batch(reps, [351], mode="exact", seed=5)
        got = np.zeros(n)
        got[res_e[0][1]["node_id"].to_numpy()] = res_e[0][1]["ppr"].to_numpy()
        assert np.allclose(got, oracle.ppr_power_iteration(edges, n, source=351), atol=1e-9)
    finally:
        for h in reps:
            h.close()


def test_local_tier_fora_plus_index(graph600):
    """P=1 FORA+ path: index built once, shared across replicas, query
    results deterministic and within the epsilon bound."""
    edges, n = graph600
    from fora_ray.graph.algorithms import (
        build_local_indexes,
        local_ppr_batch,
        make_replicas,
    )

    reps = make_replicas(to_dataset(edges), n, replicas=2, P=1)
    try:
        info = build_local_indexes(reps, seed=5)
        assert info["index_size"] > 0
        res, _ = local_ppr_batch(reps, [351, 17, 351], mode="fora+", seed=9)
        # replica 0 and replica 1 both served source 351 -> identical
        t_first = res[0][1]
        t_third = res[2][1]
        assert t_first.equals(t_third)
        got = np.zeros(n)
        got[t_first["node_id"].to_numpy()] = t_first["ppr"].to_numpy()
        want = oracle.ppr_power_iteration(edges, n, source=351)
        mask = want > 1.0 / n
        relerr = np.abs(got[mask] - want[mask]) / want[mask]
        assert (relerr <= 0.5).all()
        assert abs(got.sum() - 1.0) < 1e-9
    finally:
        for h in reps:
            h.close()


def test_degree_balance_with_precomputed_degrees_matches(ray_session):
    """from_edges(degrees=...) must skip the degree-count pass yet build
    the identical permutation on BOTH balance paths, and prewarm=True
    must not change any result."""
    import pyarrow as pa

    from fora_ray.graph import algorithms as alg
    from fora_ray.graph.runtime import GraphHandle
    from fora_ray.stages.edges import dedup_edges

    rng = np.random.default_rng(31)
    n = 120
    src = rng.integers(0, n, size=700)
    dst = rng.integers(0, n, size=700)
    keep = src != dst
    edges = dedup_edges(ray.data.from_arrow(pa.table({
        "src": pa.array(src[keep], pa.int64()),
        "dst": pa.array(dst[keep], pa.int64()),
    }))).materialize()
    # zero-filled out-degrees, ingest-degrees schema (node_id, out_deg, in_deg)
    e = edges.to_pandas()
    out_deg = np.zeros(n, dtype=np.int64)
    np.add.at(out_deg, e["src"].to_numpy(), 1)
    degrees = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(n, dtype=np.int64)),
        "out_deg": pa.array(out_deg),
        "in_deg": pa.array(np.zeros(n, dtype=np.int64)),
    }))

    h_plain = GraphHandle.from_edges(edges, n, P=4, balance="degree")
    h_deg = GraphHandle.from_edges(edges, n, P=4, balance="degree",
                                   degrees=degrees, prewarm=True)
    h_dist = GraphHandle.from_edges(edges, n, P=4, balance="degree",
                                    degrees=degrees, balance_threshold=0)
    try:
        perm_plain = h_plain.perm.copy()
        assert np.array_equal(h_plain.perm, h_deg.perm)
        for v in (0, 3, n - 1):
            assert h_dist.to_engine(v) == h_plain.to_engine(v)
        sa, _ = alg.personalized_pagerank(h_plain, source=5, mode="exact")
        sb, _ = alg.personalized_pagerank(h_deg, source=5, mode="exact")
        da = sa.to_pandas().sort_values("node_id").reset_index(drop=True)
        db = sb.to_pandas().sort_values("node_id").reset_index(drop=True)
        assert da["node_id"].tolist() == db["node_id"].tolist()
        assert np.abs(da["ppr"].to_numpy() - db["ppr"].to_numpy()).max() == 0.0
    finally:
        for h in (h_plain, h_deg, h_dist):
            h.close()

    reps = alg.make_replicas(edges, n, replicas=1, P=4, balance="degree",
                             degrees=degrees)
    try:
        assert np.array_equal(reps[0].perm, perm_plain)
        sr, _ = alg.personalized_pagerank(reps[0], source=5, mode="exact")
        dr = sr.to_pandas().sort_values("node_id").reset_index(drop=True)
        assert np.abs(da["ppr"].to_numpy() - dr["ppr"].to_numpy()).max() == 0.0
    finally:
        for h in reps:
            h.close()


def _bfs_brute(sym: np.ndarray, n: int, sources) -> dict[int, int]:
    from collections import deque

    adj: dict[int, list[int]] = {}
    for u, v in sym:
        adj.setdefault(int(u), []).append(int(v))
    dist = {int(s): 0 for s in sources}
    dq = deque(sources)
    while dq:
        u = int(dq.popleft())
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


@pytest.mark.parametrize("sources", [[0], [0, 7]])
def test_bfs_hops_matches_brute(graph600, sources):
    edges, n = graph600
    sym = symmetrized(edges)
    with GraphHandle.from_edges(to_dataset(sym), n, P=4) as h:
        ds, stats = alg.bfs_hops(h, sources)
        got = {r["node_id"]: r["dist"] for r in ds.take_all()}
    assert got == _bfs_brute(sym, n, sources)
    assert stats["rounds"] >= 1


def test_bfs_hops_directed_and_balanced():
    # directed: 0->1->2, 2 unreachable backwards; degree-balanced handle
    edges = np.array([[0, 1], [1, 2], [3, 0]], dtype=np.int64)
    with GraphHandle.from_edges(to_dataset(edges), 4, P=2,
                                balance="degree") as h:
        ds, _ = alg.bfs_hops(h, [0])
        got = {r["node_id"]: r["dist"] for r in ds.take_all()}
    assert got == {0: 0, 1: 1, 2: 2}  # node 3 unreached


@pytest.mark.parametrize("P", [2, 4])
def test_kcore_matches_peeling_oracle(graph600, P):
    edges, n = graph600
    sym = symmetrized(edges)
    want = oracle.kcore_oracle(sym, n)
    with GraphHandle.from_edges(to_dataset(sym), n, P=P) as h:
        out, stats = alg.kcore(h)
        got = {r["node_id"]: r["core"] for r in out.take_all()}
    assert np.array_equal(np.array([got[i] for i in range(n)]), want)
    assert stats["rounds"] >= 1


def test_kcore_bridge8():
    # two K4s joined by a bridge: every K4 vertex has core 3
    sym = symmetrized(BRIDGE8)
    with GraphHandle.from_edges(to_dataset(sym), 8, P=2) as h:
        out, _ = alg.kcore(h)
        got = {r["node_id"]: r["core"] for r in out.take_all()}
    assert got == {i: 3 for i in range(8)}


def _hits_reference(edges, n, iters=40):
    src, dst = edges[:, 0], edges[:, 1]
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(iters):
        a = np.bincount(dst, weights=h[src], minlength=n)
        norm = np.sqrt(np.dot(a, a))
        if norm > 0:
            a /= norm
        h = np.bincount(src, weights=a[dst], minlength=n)
        norm = np.sqrt(np.dot(h, h))
        if norm > 0:
            h /= norm
    return h, a


def _rev_dataset(edges):
    return to_dataset(edges[:, ::-1])


@pytest.mark.parametrize("P", [2, 4])
def test_hits_matches_power_iteration(graph600, P):
    edges, n = graph600
    want_h, want_a = _hits_reference(edges, n)
    with GraphHandle.from_edges(to_dataset(edges), n, P=P) as hf, \
         GraphHandle.from_edges(_rev_dataset(edges), n, P=P) as hr:
        ds, stats = alg.hits(hf, hr, max_iters=40)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert len(df) == n
    assert np.allclose(df["hub"].to_numpy(), want_h, atol=1e-9)
    assert np.allclose(df["authority"].to_numpy(), want_a, atol=1e-9)
    assert stats["iters"] == 40


def test_hits_star_and_guards():
    # star: center is the only hub, leaves are the authorities
    edges, n = ALL["star5"]
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as hf, \
         GraphHandle.from_edges(_rev_dataset(edges), n, P=2) as hr:
        ds, _ = alg.hits(hf, hr, max_iters=10)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
        assert df["hub"][0] == pytest.approx(1.0)
        assert np.allclose(df["authority"][1:], 0.5, atol=1e-12)
        assert df["authority"][0] == 0.0
    # early stop: tol > 0 converges the star in < 10 iterations
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as hf, \
         GraphHandle.from_edges(_rev_dataset(edges), n, P=2) as hr:
        _, stats = alg.hits(hf, hr, max_iters=50, tol=1e-12)
        assert stats["iters"] < 10
    # permutation guard: MISMATCHED pairs are refused (balanced fwd +
    # identity rev); a shared permutation is accepted and bit-compatible
    # (test_extension_ops_on_balanced_handles)
    with GraphHandle.from_edges(to_dataset(edges), n, P=2, balance="degree") as hb, \
         GraphHandle.from_edges(_rev_dataset(edges), n, P=2) as hr:
        with pytest.raises(ValueError, match="same"):
            alg.hits(hb, hr)


def test_diameter_estimate_double_sweep(graph600):
    edges, n = graph600
    sym = symmetrized(edges)
    with GraphHandle.from_edges(to_dataset(sym), n, P=4) as h:
        res, stats = alg.diameter_estimate(h, seed_node=0, sweeps=2)
    # reference: exact double sweep with the same tie rule
    nbrs = [[] for _ in range(n)]
    for u, v in sym:
        nbrs[u].append(v)

    def bfs(s):
        from collections import deque
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in nbrs[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return dist

    cur, prev = 0, 0
    for _ in range(2):
        dist = bfs(cur)
        dia = max(dist.values())
        far = min(v for v, d in dist.items() if d == dia)
        reached = len(dist)
        if far == cur or dia == 0:
            break
        prev, cur = cur, far
    assert res == {"diameter_lb": dia, "far_a": prev, "far_b": far,
                   "n_reached": reached}
    assert stats["rounds"] >= dia


def test_diameter_estimate_path_graph():
    # path 0-1-2-3-4: diameter 4, found from seed 2 in two sweeps
    edges = np.array([[i, i + 1] for i in range(4)], dtype=np.int64)
    sym = symmetrized(edges)
    with GraphHandle.from_edges(to_dataset(sym), 5, P=2) as h:
        res, _ = alg.diameter_estimate(h, seed_node=2, sweeps=2)
    assert res["diameter_lb"] == 4
    assert {res["far_a"], res["far_b"]} == {0, 4}
    assert res["n_reached"] == 5


# ---- eigenvector / Katz centrality (single-pool spectral sweeps) ----------

def _np_eigenvector(edges, n, iters=30):
    x = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        y = np.zeros(n)
        np.add.at(y, edges[:, 1], x[edges[:, 0]])
        x = y + x
        nrm = np.linalg.norm(x)
        if nrm > 0:
            x /= nrm
    return x


def _np_katz(edges, n, alpha=0.01, beta=1.0, iters=30):
    x = np.zeros(n)
    for _ in range(iters):
        y = np.zeros(n)
        np.add.at(y, edges[:, 1], x[edges[:, 0]])
        x = alpha * y + beta
    nrm = np.linalg.norm(x)
    return x / nrm if nrm > 0 else x


@pytest.mark.parametrize("name", list(ALL))
def test_eigenvector_micro(name):
    edges, n = ALL[name]
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        scores, stats = alg.eigenvector_centrality(h, max_iters=30)
        sp = scores.to_pandas()
    got = np.zeros(n)
    got[sp["node_id"]] = sp["ev"]
    assert np.allclose(got, _np_eigenvector(edges, n), atol=1e-9)
    assert stats["iters"] == 30


@pytest.mark.parametrize("name", list(ALL))
def test_katz_micro(name):
    edges, n = ALL[name]
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        scores, _ = alg.katz_centrality(h, alpha=0.01, beta=1.0, max_iters=30)
        sp = scores.to_pandas()
    got = np.zeros(n)
    got[sp["node_id"]] = sp["katz"]
    assert np.allclose(got, _np_katz(edges, n), atol=1e-9)


def test_eigenvector_katz_fixture(graph600):
    edges, n = graph600
    with GraphHandle.from_edges(to_dataset(edges), n, P=4) as h:
        ev, _ = alg.eigenvector_centrality(h, max_iters=30)
        kz, _ = alg.katz_centrality(h, max_iters=30)
        se, sk = ev.to_pandas(), kz.to_pandas()
    got_e, got_k = np.zeros(n), np.zeros(n)
    got_e[se["node_id"]] = se["ev"]
    got_k[sk["node_id"]] = sk["katz"]
    assert np.allclose(got_e, _np_eigenvector(edges, n), atol=1e-9)
    assert np.allclose(got_k, _np_katz(edges, n), atol=1e-9)


def test_eigenvector_degree_balanced_parity(graph600):
    """Same scores on an identity and a degree-balanced handle — the
    sweep runs in engine space, results keyed by logical ids."""
    edges, n = graph600
    with GraphHandle.from_edges(to_dataset(edges), n, P=4,
                                balance="degree") as h:
        scores, _ = alg.eigenvector_centrality(h, max_iters=30)
        sp = scores.to_pandas()
    got = np.zeros(n)
    got[sp["node_id"]] = sp["ev"]
    assert np.allclose(got, _np_eigenvector(edges, n), atol=1e-9)


# ---- PPR-Nibble local clustering (ACL sweep) -------------------------------

def test_local_cluster_bridge8():
    """Seed inside one K4 of BRIDGE8: the min-conductance sweep prefix
    must be exactly that clique (one bridge edge out of volume 13)."""
    sym = symmetrized(BRIDGE8)
    with GraphHandle.from_edges(to_dataset(sym), 8, P=2) as h:
        tab, stats = alg.local_cluster(h, to_dataset(sym), seed_node=0,
                                       rmax=1e-6)
    df = tab.to_pandas()
    cluster = set(df[df["in_cluster"]]["node_id"])
    assert cluster == {0, 1, 2, 3}
    assert stats["cluster_size"] == 4
    # K4 + bridge: cut 1, vol 3*4+1 = 13, phi = 1/13
    assert abs(stats["conductance"] - 1 / 13) < 1e-12
    # support degrees are the GLOBAL symmetrized degrees
    assert df.set_index("node_id")["deg"][3] == 4  # 3 clique edges + bridge


def test_local_cluster_matches_golden(fix600):
    """Engine sweep == the golden's independent set-walk sweep on the
    600-node fixture (support, ranks, membership, conductance)."""
    from fora_ray.goldens import local_cluster_golden
    from fora_ray.pipelines.ingest import ingest_fixture
    from fora_ray.stages.shuffle import coalesce_blocks

    t = ingest_fixture(fix600)
    sym = coalesce_blocks(t["edges_undirected"])
    with GraphHandle.from_edges(sym, t["n_nodes"], P=4) as h:
        tab, stats = alg.local_cluster(h, sym, seed_node=0, rmax=1e-4)
    got = tab.to_pandas().sort_values("node_id").reset_index(drop=True)
    want = local_cluster_golden(fix600).to_pandas()
    assert got["node_id"].tolist() == want["node_id"].tolist()
    assert got["sweep_rank"].tolist() == want["sweep_rank"].tolist()
    assert got["in_cluster"].tolist() == want["in_cluster"].tolist()
    assert got["deg"].tolist() == want["deg"].tolist()
    assert np.allclose(got["ppr"].round(9), want["ppr"])


def test_ego_network_bridge8():
    """BRIDGE8 from node 0: k=1 ego is its K4 (6 induced edges, no
    bridge); k=2 adds node 4 via the bridge (7 edges, K4b still out)."""
    sym = symmetrized(BRIDGE8)
    with GraphHandle.from_edges(to_dataset(sym), 8, P=2) as h:
        e1, s1 = alg.ego_network(h, to_dataset(sym), seed_node=0, k=1)
        d1 = e1.to_pandas()
        e2, s2 = alg.ego_network(h, to_dataset(sym), seed_node=0, k=2)
        d2 = e2.to_pandas()
    assert s1["members"] == 4
    assert set(map(tuple, d1.to_numpy())) == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    assert s2["members"] == 5
    assert set(map(tuple, d2.to_numpy())) == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)}


def test_local_cluster_empty_support():
    """rmax so large the seed never crosses the push threshold: empty
    support, no crash, NaN conductance."""
    sym = symmetrized(BRIDGE8)
    with GraphHandle.from_edges(to_dataset(sym), 8, P=2) as h:
        tab, stats = alg.local_cluster(h, to_dataset(sym), seed_node=0,
                                       rmax=10.0)
    assert tab.num_rows == 0
    assert stats["support_size"] == 0 and stats["cluster_size"] == 0
    assert np.isnan(stats["conductance"])
