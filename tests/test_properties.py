"""Property-based tests (hypothesis): random graphs vs oracles, resolver
invariants, hashing determinism (SURVEY 5.2 depth)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fora_ray import oracle
from fora_ray.functions.hashing import mix64, rng_uniform, splitmix64
from fora_ray.stages.resolve import candidates


@st.composite
def random_digraph(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    n_edges = draw(st.integers(min_value=0, max_value=60))
    edges = set()
    for _ in range(n_edges):
        u = draw(st.integers(min_value=0, max_value=n - 1))
        v = draw(st.integers(min_value=0, max_value=n - 1))
        if u != v:
            edges.add((u, v))
    e = np.array(sorted(edges), dtype=np.int64).reshape(-1, 2)
    return e, n


@settings(max_examples=25, deadline=None)
@given(random_digraph(), st.integers(min_value=0, max_value=1_000_000))
def test_oracle_mass_conserved(g, src_seed):
    edges, n = g
    src = src_seed % n
    pi = oracle.ppr_power_iteration(edges, n, source=src)
    assert abs(pi.sum() - 1.0) < 1e-9
    assert (pi >= -1e-15).all()


@settings(max_examples=25, deadline=None)
@given(random_digraph())
def test_cc_labels_are_canonical_minima(g):
    edges, n = g
    sym = np.unique(np.concatenate([edges, edges[:, ::-1]]) if len(edges) else edges, axis=0) \
        if len(edges) else edges
    labels = oracle.cc_oracle(sym, n)
    # every label is the min id of its component and a fixed point
    for comp in set(labels.tolist()):
        members = np.nonzero(labels == comp)[0]
        assert comp == members.min()


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                                      whitelist_characters="./_"), max_size=40),
       st.sampled_from(["python", "c", "cpp", "javascript", "java", "go"]))
def test_resolver_never_escapes_repo(ref, lang):
    """No candidate may escape the repo root or be absolute."""
    for cand in candidates(lang, "org/repo", "a/b/c.py", ref):
        assert not cand.startswith("/")
        assert not cand.startswith("..")
        assert "/../" not in cand


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=64))
def test_hash_uniforms_in_range_and_deterministic(keys):
    a = np.array(keys, dtype=np.uint64)
    u1 = rng_uniform(a)
    u2 = rng_uniform(a)
    assert np.array_equal(u1, u2)
    assert ((u1 >= 0) & (u1 < 1)).all()
    assert np.array_equal(splitmix64(a), splitmix64(a.copy()))
    assert not np.array_equal(mix64(a, np.uint64(1)), mix64(a, np.uint64(2)))


@settings(max_examples=5, deadline=None)
@given(random_digraph())
def test_distributed_exact_matches_oracle_on_random_graphs(g):
    """End-to-end property: the distributed engine's exact PPR equals the
    numpy oracle on arbitrary random digraphs (dangling nodes, cycles,
    disconnected parts included)."""
    import ray

    from fora_ray.graph import algorithms as alg
    from fora_ray.graph.runtime import GraphHandle

    from .graphs import to_dataset

    edges, n = g
    if not ray.is_initialized():
        return  # session fixture not active (collection-only contexts)
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        scores, _ = alg.personalized_pagerank(h, 0, mode="exact")
        sp = scores.to_pandas()
    got = np.zeros(n)
    got[sp["node_id"]] = sp["ppr"]
    want = oracle.ppr_power_iteration(edges, n, source=0)
    assert np.allclose(got, want, atol=1e-9)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["python", "c", "cpp", "javascript", "java", "go", "text"]),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Ll", "Lu", "Nd", "Zs"),
                    whitelist_characters='./_"\'();,#\n',
                ),
                max_size=120,
            ),
        ),
        max_size=12,
    )
)
def test_fused_extract_resolve_matches_chain(rows):
    """extract_resolve_batch == extract_batch |> resolve_batch on arbitrary
    content, including refs the regexes reject and empty batches."""
    import pyarrow as pa

    from fora_ray.stages.extract import extract_batch
    from fora_ray.stages.resolve import extract_resolve_batch, resolve_batch

    batch = pa.table({
        "repo": pa.array([f"org/r{i % 3}" for i in range(len(rows))], pa.string()),
        "path": pa.array([f"d{i}/f{i}.x" for i in range(len(rows))], pa.string()),
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "content": pa.array([r[1] for r in rows], pa.string()),
    })
    assert extract_resolve_batch(batch).equals(resolve_batch(extract_batch(batch)))


@settings(max_examples=20, deadline=None)
@given(random_digraph())
def test_scc_matches_tarjan_on_random_digraphs(g):
    """End-to-end property: distributed min-label intersection SCC equals
    iterative Tarjan on arbitrary digraphs (trivial SCCs, chains,
    cycles, disconnected parts, dangling nodes)."""
    import ray

    from fora_ray.graph import algorithms as alg
    from fora_ray.graph.runtime import GraphHandle

    from .graphs import to_dataset

    edges, n = g
    if not ray.is_initialized():
        return
    hf = GraphHandle.from_edges(to_dataset(edges), n, P=2)
    hr = GraphHandle.from_reverse_edges(to_dataset(edges), n, P=2)
    try:
        ds, _ = alg.scc(hf, hr)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    finally:
        hf.close()
        hr.close()
    assert df["scc"].to_numpy().tolist() == oracle.scc_oracle(edges, n).tolist()


@settings(max_examples=20, deadline=None)
@given(random_digraph(),
       st.integers(min_value=1, max_value=3),
       st.integers(min_value=2, max_value=5),
       st.integers(min_value=0, max_value=2**31))
def test_walk_corpus_traces_are_valid_paths(g, nwalks, walk_len, seed):
    """Structural property on arbitrary digraphs: every emitted trace is
    a real path in the graph (consecutive records are edges), steps are
    contiguous from 0, walk counts and origins are exact."""
    import ray

    from fora_ray.graph import algorithms as alg
    from fora_ray.graph.runtime import GraphHandle

    from .graphs import to_dataset

    edges, n = g
    if not ray.is_initialized():
        return
    with GraphHandle.from_edges(to_dataset(edges), n, P=2) as h:
        ds, stats = alg.random_walk_corpus(h, nwalks=nwalks,
                                           walk_len=walk_len, seed=seed)
        df = ds.to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert stats["walks"] == n * nwalks
    eset = {(int(a), int(b)) for a, b in edges}
    for wid, grp in df.groupby("walk_id"):
        steps = grp["step"].tolist()
        assert steps == list(range(len(steps)))
        nodes = grp["node_id"].tolist()
        assert nodes[0] == wid // nwalks  # origin encodes the walk id
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in eset
    # exactly nwalks walks per node
    origins = df[df["step"] == 0]["node_id"].value_counts()
    assert (origins == nwalks).all() and len(origins) == n


@settings(max_examples=20, deadline=None)
@given(random_digraph(), st.integers(min_value=0, max_value=2**31))
def test_mis_golden_properties(g, seed):
    """The MIS golden replay (the driver oracle) satisfies independence
    + maximality on arbitrary digraphs — so the engine's bit-exact
    match against it inherits both properties."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fora_ray.goldens import mis_golden

    edges, n = g
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({"src": pa.array(edges[:, 0] if len(edges) else np.empty(0, np.int64)),
                                 "dst": pa.array(edges[:, 1] if len(edges) else np.empty(0, np.int64))}),
                       os.path.join(d, "edges.parquet"))
        pq.write_table(pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64))}),
                       os.path.join(d, "nodes.parquet"))
        inm = mis_golden(d, seed=seed).to_pandas()["in_mis"].to_numpy()
    if len(edges):
        und = np.unique(np.concatenate([edges, edges[:, ::-1]]), axis=0)
        und = und[und[:, 0] != und[:, 1]]
    else:
        und = np.empty((0, 2), np.int64)
    assert not (inm[und[:, 0]] & inm[und[:, 1]]).any() if len(und) else True
    nb_in = np.zeros(n, dtype=bool)
    if len(und):
        np.logical_or.at(nb_in, und[:, 0], inm[und[:, 1]])
    assert (inm | nb_in).all()


@settings(max_examples=20, deadline=None)
@given(random_digraph(), st.integers(min_value=3, max_value=5))
def test_ktruss_golden_is_fixpoint(g, k):
    """Every edge the k-truss golden keeps closes >= k-2 triangles
    WITHIN the kept subgraph (fixpoint), and kept edges are a subset
    of the input."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fora_ray.goldens import ktruss_golden

    edges, n = g
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({"src": pa.array(edges[:, 0] if len(edges) else np.empty(0, np.int64)),
                                 "dst": pa.array(edges[:, 1] if len(edges) else np.empty(0, np.int64))}),
                       os.path.join(d, "edges.parquet"))
        pq.write_table(pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64))}),
                       os.path.join(d, "nodes.parquet"))
        kept = ktruss_golden(d, k=k).to_pandas()
    ks = set(zip(kept["lo"], kept["hi"]))
    if len(edges):
        und = np.unique(np.concatenate([edges, edges[:, ::-1]]), axis=0)
        allset = {(int(a), int(b)) for a, b in und[und[:, 0] < und[:, 1]]}
    else:
        allset = set()
    assert ks <= allset
    adj = {}
    for a, b in ks:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in ks:
        assert len(adj[a] & adj[b]) >= k - 2
