"""Link prediction (common neighbors / Jaccard / Adamic-Adar) vs a
brute-force set-algebra reimplementation."""

import numpy as np
import pytest

from fora_ray.graph.linkpred import link_prediction

from .graphs import ALL, BRIDGE8, symmetrized, to_dataset


def _brute(sym: np.ndarray, n: int, min_cn: int, exclude_edges: bool):
    nbrs = [set() for _ in range(n)]
    for u, v in sym:
        nbrs[u].add(v)
    edges = {(min(u, v), max(u, v)) for u, v in sym}
    out = {}
    for a in range(n):
        for b in range(a + 1, n):
            if exclude_edges and (a, b) in edges:
                continue
            common = nbrs[a] & nbrs[b]
            if len(common) < min_cn:
                continue
            cn = len(common)
            jac = cn / len(nbrs[a] | nbrs[b])
            aa = sum(1.0 / np.log(len(nbrs[w])) for w in common)
            out[(a, b)] = (cn, jac, aa)
    return out


def _got_dict(ds):
    df = ds.to_pandas()
    return {
        (int(r.a), int(r.b)): (int(r.cn), float(r.jaccard), float(r.adamic_adar))
        for r in df.itertuples()
    }


@pytest.mark.parametrize("name", ["star5", "cycle4", "bridge8"])
@pytest.mark.parametrize("exclude_edges", [True, False])
def test_linkpred_micro(name, exclude_edges):
    edges, n = ALL[name]
    sym = symmetrized(edges)
    got = _got_dict(link_prediction(to_dataset(sym), n, min_cn=1,
                                    exclude_edges=exclude_edges))
    want = _brute(sym, n, min_cn=1, exclude_edges=exclude_edges)
    assert set(got) == set(want)
    for k, (cn, jac, aa) in want.items():
        gcn, gjac, gaa = got[k]
        assert gcn == cn
        assert gjac == pytest.approx(jac, abs=1e-12)
        assert gaa == pytest.approx(aa, abs=1e-12)


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_linkpred_fixture_both_strategies(graph600, strategy):
    edges, n = graph600
    sym = symmetrized(edges)
    got = _got_dict(link_prediction(to_dataset(sym), n, min_cn=2,
                                    strategy=strategy))
    want = _brute(sym, n, min_cn=2, exclude_edges=True)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-9)
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-9)


def test_linkpred_apex_cap_drops_hub_wedges():
    # star5: center (deg 4) is the only apex; capping below 4 leaves
    # nothing, capping at 4 keeps all leaf pairs
    edges, n = ALL["star5"]
    sym = symmetrized(edges)
    assert _got_dict(link_prediction(to_dataset(sym), n, min_cn=1,
                                     max_apex_degree=3)) == {}
    full = _got_dict(link_prediction(to_dataset(sym), n, min_cn=1,
                                     max_apex_degree=4))
    assert len(full) == 6  # C(4,2) leaf pairs
