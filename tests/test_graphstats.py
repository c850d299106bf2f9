"""degree_assortativity / modularity vs direct numpy oracles, plus
broadcast-vs-join strategy parity (SURVEY §2.9 graph summary stats)."""

import numpy as np
import pyarrow as pa
import ray

from fora_ray.pipelines.graphstats import degree_assortativity, modularity

from .graphs import ALL, symmetrized, to_dataset


def _degrees_ds(edges: np.ndarray, n: int):
    out_deg = np.bincount(edges[:, 0], minlength=n).astype(np.int64)
    in_deg = np.bincount(edges[:, 1], minlength=n).astype(np.int64)
    return ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(n, dtype=np.int64)),
        "out_deg": pa.array(out_deg),
        "in_deg": pa.array(in_deg),
    })), out_deg, in_deg


def _np_assort(edges, out_deg, in_deg):
    x = out_deg[edges[:, 0]].astype(np.float64)
    y = in_deg[edges[:, 1]].astype(np.float64)
    if x.std() == 0 or y.std() == 0:
        return float("nan")
    return float(np.corrcoef(x, y)[0, 1])


def _np_modularity(sym, labels, n):
    """Brute-force per-community (n_nodes, within, degree_sum, q)."""
    canon = {(min(u, v), max(u, v)) for u, v in sym if u != v}
    m = len(canon)
    deg = np.bincount(sym[:, 0], minlength=n)
    rows = {}
    for c in np.unique(labels):
        members = np.flatnonzero(labels == c)
        mset = set(members.tolist())
        within = sum(1 for a, b in canon if a in mset and b in mset)
        dsum = int(deg[members].sum())
        rows[int(c)] = (len(members), within, dsum,
                        within / m - (dsum / (2.0 * m)) ** 2)
    return rows


def test_assortativity_micro_all():
    for name, (edges, n) in ALL.items():
        ds = to_dataset(edges)
        degs, out_deg, in_deg = _degrees_ds(edges, n)
        got = degree_assortativity(ds, degs, n).to_pandas()
        assert int(got["edges"][0]) == len(edges)
        want = _np_assort(edges, out_deg, in_deg)
        g = float(got["assortativity"][0])
        if np.isnan(want):
            assert np.isnan(g), name
        else:
            assert abs(g - round(want, 6)) < 1e-9, name


def test_assortativity_strategy_parity(graph600):
    edges, n = graph600
    ds = to_dataset(edges)
    degs, *_ = _degrees_ds(edges, n)
    a = degree_assortativity(ds, degs, n, strategy="broadcast").to_pandas()
    b = degree_assortativity(ds, degs, n, strategy="join").to_pandas()
    assert a.equals(b)


def test_modularity_micro_all():
    rng = np.random.default_rng(7)
    for name, (edges, n) in ALL.items():
        sym = symmetrized(edges)
        labels = rng.integers(0, max(2, n // 3), size=n).astype(np.int64)
        lab_ds = ray.data.from_arrow(pa.table({
            "node_id": pa.array(np.arange(n, dtype=np.int64)),
            "label": pa.array(labels),
        }))
        got = modularity(to_dataset(sym), lab_ds, n).to_pandas()
        want = _np_modularity(sym, labels, n)
        assert len(got) == len(want), name
        for _, r in got.iterrows():
            nn, w, d, q = want[int(r["label"])]
            assert (int(r["n_nodes"]), int(r["within_edges"]),
                    int(r["degree_sum"])) == (nn, w, d), name
            assert abs(float(r["q_contrib"]) - round(q, 6)) < 1e-9, name
        # global Q of the all-same labelling is 0 by construction
    edges, n = ALL["two_cliques"] if "two_cliques" in ALL else next(iter(ALL.values()))
    sym = symmetrized(edges)
    one = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(n, dtype=np.int64)),
        "label": pa.array(np.zeros(n, np.int64)),
    }))
    got = modularity(to_dataset(sym), one, n).to_pandas()
    assert abs(float(got["q_contrib"].sum())) < 1e-9


def test_modularity_strategy_parity(graph600):
    edges, n = graph600
    sym = symmetrized(edges)
    labels = (np.arange(n, dtype=np.int64) % 5)
    lab_ds = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(n, dtype=np.int64)),
        "label": pa.array(labels),
    }))
    a = modularity(to_dataset(sym), lab_ds, n, strategy="broadcast").to_pandas()
    b = modularity(to_dataset(sym), lab_ds, n, strategy="join").to_pandas()
    assert a.equals(b)


def test_graphstats_empty_graph():
    """Zero-edge input: NaN assortativity, all-zero modularity — no
    schema crash (map operators skip empty blocks entirely)."""
    empty = ray.data.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                          "dst": pa.array([], pa.int64())}))
    degs = ray.data.from_arrow(pa.table({
        "node_id": pa.array([0, 1, 2], pa.int64()),
        "out_deg": pa.array([0, 0, 0], pa.int64()),
        "in_deg": pa.array([0, 0, 0], pa.int64())}))
    a = degree_assortativity(empty, degs, 3).to_pandas()
    assert int(a["edges"][0]) == 0 and np.isnan(a["assortativity"][0])
    labs = ray.data.from_arrow(pa.table({
        "node_id": pa.array([0, 1, 2], pa.int64()),
        "label": pa.array([0, 0, 1], pa.int64())}))
    m = modularity(empty, labs, 3).to_pandas()
    assert m["n_nodes"].tolist() == [2, 1]
    assert m["within_edges"].tolist() == [0, 0]
    assert m["q_contrib"].tolist() == [0.0, 0.0]
