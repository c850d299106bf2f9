"""Random-walk corpus generation + GNN neighborhood sampling.

Oracles: brute-force single-process replays (tests below) plus the
independent golden replays in fora_ray.goldens (driver gate).  The key
property under test is partition invariance: the counter-RNG corpus and
the hash-rank samples must be byte-identical at any P.
"""

import numpy as np
import pytest

from fora_ray.functions.hashing import mix64, rng_uniform
from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle

from .graphs import BRIDGE8, DANGLE3, STAR5, to_dataset


def _corpus_df(handle, **kw):
    ds, stats = alg.random_walk_corpus(handle, **kw)
    return (
        ds.to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True),
        stats,
    )


def _brute_corpus(edges: np.ndarray, n: int, nwalks: int, walk_len: int, seed: int):
    """Independent per-walk python replay over the dst-sorted adjacency."""
    adj = {v: [] for v in range(n)}
    for s, d in edges:
        adj[int(s)].append(int(d))
    for v in adj:
        adj[v] = sorted(set(adj[v]))
    # NOTE: engine CSR holds the deduped edge table; tests pass deduped
    # edges so sorted(set(...)) == sorted(...)
    rows = []
    for v in range(n):
        for k in range(nwalks):
            wid = v * nwalks + k
            key = np.uint64(mix64(np.uint64(seed), np.uint64(wid)))
            node = v
            rows.append((wid, 0, node))
            for hop in range(1, walk_len):
                nb = adj[node]
                if not nb:
                    break
                u = float(rng_uniform(np.array([mix64(key, np.uint64(hop))], np.uint64))[0])
                node = nb[min(int(u * len(nb)), len(nb) - 1)]
                rows.append((wid, hop, node))
    rows.sort()
    return rows


@pytest.mark.parametrize("P", [1, 3])
def test_walk_corpus_matches_brute_replay(ray_session, P):
    edges = np.unique(BRIDGE8, axis=0)
    h = GraphHandle.from_edges(to_dataset(edges), 8, P=P)
    try:
        df, stats = _corpus_df(h, nwalks=3, walk_len=6, seed=7)
    finally:
        h.close()
    got = list(df.itertuples(index=False, name=None))
    assert got == _brute_corpus(edges, 8, 3, 6, 7)
    assert stats["walks"] == 8 * 3


def test_walk_corpus_partition_invariant(graph600, ray_session):
    edges, n = graph600
    dfs = []
    for P in (2, 4):
        h = GraphHandle.from_edges(to_dataset(edges), n, P=P)
        try:
            df, _ = _corpus_df(h, nwalks=1, walk_len=4, seed=42)
        finally:
            h.close()
        dfs.append(df)
    assert dfs[0].equals(dfs[1])


def test_walk_corpus_truncates_at_dangling(ray_session):
    # 0 -> 1 -> 2 (dangling): every walk from 2 is one record long,
    # walks from 0/1 never exceed their distance to 2 + 1 records.
    h = GraphHandle.from_edges(to_dataset(DANGLE3), 3, P=2)
    try:
        df, _ = _corpus_df(h, nwalks=2, walk_len=10, seed=1)
    finally:
        h.close()
    lens = df.groupby("walk_id").size()
    assert (lens[df[df.step == 0].set_index("walk_id").node_id == 2] == 1).all()
    assert (lens <= 3).all()  # longest possible trace on this chain
    # walks are contiguous step runs starting at 0
    for _, g in df.groupby("walk_id"):
        assert g["step"].tolist() == list(range(len(g)))


def test_walk_corpus_balanced_matches_identity(graph600, ray_session):
    """Degree-balanced handles produce the bit-identical corpus: keys
    derive from logical walk_ids and neighbor slots index the row's
    neighbors in logical order (VERDICT r03 next #1)."""
    edges, n = graph600
    hi = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    hb = GraphHandle.from_edges(to_dataset(edges), n, P=3, balance="degree")
    try:
        di, _ = _corpus_df(hi, nwalks=2, walk_len=4, seed=11)
        db, _ = _corpus_df(hb, nwalks=2, walk_len=4, seed=11)
        assert di.equals(db)
    finally:
        hi.close()
        hb.close()


def test_walk_corpus_distributed_perm_matches_identity(graph600, ray_session):
    """The DISTRIBUTED permutation tier (balance_threshold=0) carries
    per-edge logical dst ids through the CSR build (ind_logical), so
    walks are bit-identical to identity handles there too — no O(n)
    driver array anywhere."""
    edges, n = graph600
    hi = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    hd = GraphHandle.from_edges(to_dataset(edges), n, P=3, balance="degree",
                                balance_threshold=0)
    try:
        di, _ = _corpus_df(hi, nwalks=1, walk_len=4, seed=5)
        dd, _ = _corpus_df(hd, nwalks=1, walk_len=4, seed=5)
        assert di.equals(dd)
        # neighbor sampling too: seeds translate via sharded perm lookups
        ti, _ = alg.neighbor_sample(hi, [0, 5, 17], fanouts=(4, 2), seed=3)
        td, _ = alg.neighbor_sample(hd, [0, 5, 17], fanouts=(4, 2), seed=3)
        a = ti.to_pandas().sort_values(["hop", "src", "dst"]).reset_index(drop=True)
        b = td.to_pandas().sort_values(["hop", "src", "dst"]).reset_index(drop=True)
        assert a.equals(b)
    finally:
        hi.close()
        hd.close()


def _brute_sample(edges: np.ndarray, n: int, seeds, fanouts, seed: int):
    adj = {v: [] for v in range(n)}
    for s, d in edges:
        adj[int(s)].append(int(d))
    frontier = sorted(set(int(s) for s in seeds))
    out = []
    for hop, f in enumerate(fanouts):
        nxt = set()
        for s in frontier:
            nb = np.array(sorted(adj[s]), dtype=np.int64)
            if nb.size == 0:
                continue
            sh = mix64(np.uint64(seed), np.uint64(hop))
            keys = mix64(
                mix64(np.full(nb.size, sh, np.uint64),
                      np.full(nb.size, np.uint64(s), np.uint64)),
                nb.astype(np.uint64),
            )
            for d in nb[np.argsort(keys, kind="stable")[:f]]:
                out.append((int(s), int(d), hop))
                nxt.add(int(d))
        frontier = sorted(nxt)
        if not frontier:
            break
    out.sort(key=lambda r: (r[2], r[0], r[1]))
    return out


@pytest.mark.parametrize("P", [1, 2, 4])
def test_neighbor_sample_matches_brute(graph600, ray_session, P):
    edges, n = graph600
    h = GraphHandle.from_edges(to_dataset(edges), n, P=P)
    try:
        tab, stats = alg.neighbor_sample(h, seeds=range(10), fanouts=(3, 2), seed=9)
    finally:
        h.close()
    df = tab.to_pandas().sort_values(["hop", "src", "dst"]).reset_index(drop=True)
    got = list(df.itertuples(index=False, name=None))
    assert got == _brute_sample(edges, n, range(10), (3, 2), 9)
    assert stats["edges"] == len(got)


def test_neighbor_sample_fanout_caps_and_subsets(ray_session):
    # star: center 0 with 4 out-neighbors; fanout 2 must pick exactly 2,
    # and the fanout-3 pick must contain the fanout-2 pick (hash-rank
    # order is fixed, a bigger fanout only extends the prefix).
    h = GraphHandle.from_edges(to_dataset(STAR5), 5, P=2)
    try:
        t2, _ = alg.neighbor_sample(h, seeds=[0], fanouts=(2,), seed=3)
        t3, _ = alg.neighbor_sample(h, seeds=[0], fanouts=(3,), seed=3)
    finally:
        h.close()
    s2 = set(t2["dst"].to_pylist())
    s3 = set(t3["dst"].to_pylist())
    assert len(s2) == 2 and len(s3) == 3 and s2 < s3


def test_neighbor_sample_empty_seeds_and_dangling(ray_session):
    h = GraphHandle.from_edges(to_dataset(DANGLE3), 3, P=2)
    try:
        t0, st0 = alg.neighbor_sample(h, seeds=[], fanouts=(3,), seed=1)
        t2, st2 = alg.neighbor_sample(h, seeds=[2], fanouts=(3,), seed=1)
    finally:
        h.close()
    assert t0.num_rows == 0 and st0["edges"] == 0
    assert t2.num_rows == 0  # node 2 is dangling


def test_skipgram_pairs_matches_brute(graph600, ray_session):
    """(center, context, cnt) must equal the brute self-join over the
    corpus trace at every window size."""
    from collections import Counter

    from fora_ray.pipelines.walks import skipgram_pairs

    edges, n = graph600
    h = GraphHandle.from_edges(to_dataset(edges), n, P=4)
    try:
        corpus, _ = alg.random_walk_corpus(h, nwalks=2, walk_len=6, seed=11)
        corpus = corpus.materialize()
        trace = corpus.to_pandas()
        for window in (1, 3):
            got = (
                skipgram_pairs(corpus, window=window).to_pandas()
                .sort_values(["center", "context"]).reset_index(drop=True)
            )
            want = Counter()
            for _, g in trace.groupby("walk_id"):
                g = g.sort_values("step")
                nodes, steps = g["node_id"].tolist(), g["step"].tolist()
                for i in range(len(nodes)):
                    for j in range(len(nodes)):
                        if i != j and abs(steps[i] - steps[j]) <= window:
                            want[(nodes[i], nodes[j])] += 1
            got_d = {(r.center, r.context): r.cnt for r in got.itertuples()}
            assert got_d == dict(want), f"window={window}"
    finally:
        h.close()


def test_skipgram_pairs_empty_and_window_guard(ray_session):
    import pyarrow as pa
    import ray as _ray

    from fora_ray.pipelines.walks import skipgram_pairs

    empty = _ray.data.from_arrow(pa.table({
        "walk_id": pa.array([], pa.int64()),
        "step": pa.array([], pa.int64()),
        "node_id": pa.array([], pa.int64()),
    }))
    assert skipgram_pairs(empty, window=2).count() == 0
    with pytest.raises(ValueError, match="window"):
        skipgram_pairs(empty, window=0)


def test_walk_corpus_spill_matches_inmemory(graph600, ray_session, tmp_path):
    """The parquet-spill scale path (tiny flush_rows -> many part files)
    must produce the identical corpus, and parts must land under
    part=<p>/ with atomic names."""
    import os

    edges, n = graph600
    h = GraphHandle.from_edges(to_dataset(edges), n, P=3)
    try:
        mem, _ = _corpus_df(h, nwalks=1, walk_len=4, seed=5)
        sp = str(tmp_path / "corpus")
        ds, _ = alg.random_walk_corpus(h, nwalks=1, walk_len=4, seed=5,
                                       spill_dir=sp, flush_rows=100)
        spilled = (ds.to_pandas().sort_values(["walk_id", "step"])
                   .reset_index(drop=True))
    finally:
        h.close()
    assert spilled.equals(mem)
    parts = [d for d in os.listdir(sp) if d.startswith("part=")]
    assert len(parts) == 3
    files = os.listdir(os.path.join(sp, parts[0]))
    assert len(files) > 1 and all(f.endswith(".parquet") for f in files)


# ---------------------------------------------------------------------------
# node2vec biased walks (rejection sampling)
# ---------------------------------------------------------------------------

def _n2v_df(handle, **kw):
    ds, stats = alg.node2vec_corpus(handle, **kw)
    return (
        ds.to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True),
        stats,
    )


def _brute_n2v(edges: np.ndarray, n: int, nwalks: int, walk_len: int,
               p: float, q: float, seed: int):
    """Independent per-walker python replay of the rejection protocol.
    The engine retries in GLOBAL lockstep attempts, but each walker's
    accept decision depends only on its OWN consecutive attempt index,
    so a per-walker replay is equivalent."""
    adj = {v: [] for v in range(n)}
    for s, d in edges:
        adj[int(s)].append(int(d))
    nbsets = {}
    for v in adj:
        adj[v] = sorted(set(adj[v]))
        nbsets[v] = set(adj[v])
    invp, invq = 1.0 / p, 1.0 / q
    m_env = max(invp, 1.0, invq)
    rows = []
    for v in range(n):
        for k in range(nwalks):
            wid = v * nwalks + k
            key = np.uint64(mix64(np.uint64(seed), np.uint64(wid)))
            cur, prev = v, -1
            rows.append((wid, 0, v))
            for hop in range(1, walk_len):
                nb = adj[cur]
                if not nb:
                    break
                hkey = np.uint64(mix64(key, np.uint64(hop)))
                attempt = 0
                while True:
                    u_p = float(rng_uniform(np.array(
                        [mix64(hkey, np.uint64(2 * attempt))], np.uint64))[0])
                    x = nb[min(int(u_p * len(nb)), len(nb) - 1)]
                    u_a = float(rng_uniform(np.array(
                        [mix64(hkey, np.uint64(2 * attempt + 1))], np.uint64))[0])
                    if prev < 0:
                        break
                    if x == prev:
                        alpha = invp
                    elif x in nbsets[prev]:
                        alpha = 1.0
                    else:
                        alpha = invq
                    if u_a < alpha / m_env:
                        break
                    attempt += 1
                prev, cur = cur, x
                rows.append((wid, hop, cur))
    rows.sort()
    return rows


@pytest.mark.parametrize("P", [1, 3])
def test_node2vec_matches_brute_replay(ray_session, P):
    edges = np.unique(BRIDGE8, axis=0)
    h = GraphHandle.from_edges(to_dataset(edges), 8, P=P)
    try:
        df, stats = _n2v_df(h, nwalks=3, walk_len=6, p=0.5, q=2.0, seed=7)
    finally:
        h.close()
    got = list(df.itertuples(index=False, name=None))
    assert got == _brute_n2v(edges, 8, 3, 6, 0.5, 2.0, 7)
    assert stats["walks"] == 8 * 3


def test_node2vec_attempt_batch_invariant(ray_session):
    """The K-candidate batched rejection rounds (VERDICT r04 #3) are
    bit-identical to the K=1 sequential protocol: every candidate is
    drawn from the SAME (key, hop, attempt) counter stream and the
    first accepting candidate in counter order wins, so the corpus is
    a pure function of the logical graph regardless of K.  Round count
    must shrink as K grows (that is the point of the batching)."""
    edges = np.unique(BRIDGE8, axis=0)
    brute = _brute_n2v(edges, 8, 3, 6, 0.25, 4.0, 7)
    rounds = {}
    for K in (1, 4, 16):
        h = GraphHandle.from_edges(to_dataset(edges), 8, P=2)
        try:
            df, stats = _n2v_df(h, nwalks=3, walk_len=6, p=0.25, q=4.0,
                                seed=7, attempt_batch=K)
        finally:
            h.close()
        assert list(df.itertuples(index=False, name=None)) == brute
        rounds[K] = stats["attempt_rounds"]
    assert rounds[16] <= rounds[4] <= rounds[1]
    assert rounds[16] < rounds[1]  # p=0.25/q=4 rejects hard at K=1


def test_node2vec_matches_golden_replay(fix600, graph600, ray_session):
    from fora_ray.goldens import node2vec_corpus_golden

    edges, n = graph600
    h = GraphHandle.from_edges(to_dataset(edges), n, P=4)
    try:
        df, _ = _n2v_df(h, nwalks=2, walk_len=5, p=0.5, q=2.0, seed=42)
    finally:
        h.close()
    gold = node2vec_corpus_golden(fix600, nwalks=2, walk_len=5,
                                  p=0.5, q=2.0, seed=42).to_pandas()
    assert df.equals(gold.reset_index(drop=True))


def test_node2vec_balanced_matches_identity(graph600, ray_session):
    edges, n = graph600
    hi = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    hb = GraphHandle.from_edges(to_dataset(edges), n, P=3, balance="degree")
    try:
        di, _ = _n2v_df(hi, nwalks=1, walk_len=4, p=2.0, q=0.5, seed=11)
        db, _ = _n2v_df(hb, nwalks=1, walk_len=4, p=2.0, q=0.5, seed=11)
        assert di.equals(db)
    finally:
        hi.close()
        hb.close()


def test_node2vec_transition_law(ray_session):
    """Empirical second-step frequencies follow the node2vec alpha
    weights.  From 0, step 1 is uniform over N(0) = {1, 2}; conditioned
    on step1 == 1 (prev = 0), step 2 over N(1) = {0, 2, 3} weights
    (1/p, 1, 1/q) = (2, 1, 0.5) at p = 0.5, q = 2 -> probs (4, 2, 1)/7."""
    E = np.array([[0, 1], [0, 2], [1, 0], [1, 2], [1, 3], [2, 1], [3, 1]],
                 dtype=np.int64)
    nw = 30_000
    h = GraphHandle.from_edges(to_dataset(E), 4, P=2)
    try:
        df, _ = _n2v_df(h, nwalks=nw, walk_len=3, p=0.5, q=2.0, seed=3)
    finally:
        h.close()
    df = df[df.walk_id < nw]  # walks spawned at node 0
    piv = df.pivot(index="walk_id", columns="step", values="node_id")
    via1 = piv[piv[1] == 1]
    freq = via1[2].value_counts(normalize=True)
    assert abs(freq[0] - 4 / 7) < 0.02
    assert abs(freq[2] - 2 / 7) < 0.02
    assert abs(freq[3] - 1 / 7) < 0.02


def test_node2vec_truncates_and_guards(ray_session):
    h = GraphHandle.from_edges(to_dataset(DANGLE3), 3, P=2)
    try:
        df, _ = _n2v_df(h, nwalks=2, walk_len=10, p=0.5, q=2.0, seed=1)
        lens = df.groupby("walk_id").size()
        assert (lens <= 3).all()
        for _, g in df.groupby("walk_id"):
            assert g["step"].tolist() == list(range(len(g)))
        with pytest.raises(ValueError):
            alg.node2vec_corpus(h, p=0.0)
        with pytest.raises(ValueError):
            alg.node2vec_corpus(h, q=-1.0)
    finally:
        h.close()


def test_node2vec_spill_matches_inmemory(graph600, ray_session, tmp_path):
    """The parquet-spill scale path produces the identical biased
    corpus (mirrors test_walk_corpus_spill_matches_inmemory for the
    n2v record path)."""
    import os

    edges, n = graph600
    h = GraphHandle.from_edges(to_dataset(edges), n, P=3)
    try:
        mem, _ = _n2v_df(h, nwalks=1, walk_len=4, p=0.5, q=2.0, seed=5)
        sp = str(tmp_path / "n2v")
        ds, _ = alg.node2vec_corpus(h, nwalks=1, walk_len=4, p=0.5, q=2.0,
                                    seed=5, spill_dir=sp, flush_rows=100)
        spilled = (ds.to_pandas().sort_values(["walk_id", "step"])
                   .reset_index(drop=True))
    finally:
        h.close()
    assert spilled.equals(mem)
    parts = [d for d in os.listdir(sp) if d.startswith("part=")]
    assert len(parts) == 3
