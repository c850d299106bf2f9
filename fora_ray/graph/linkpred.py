"""Neighborhood-similarity link prediction — common-neighbor count,
Jaccard coefficient and Adamic-Adar over every non-adjacent vertex pair
with at least ``min_cn`` shared neighbors (Liben-Nowell & Kleinberg '03,
public formulation).  SURVEY §2 extension in the same family as
triangles: the wedge (2-path) enumeration IS the candidate generator, so
no all-pairs stage ever exists.

Shape (mirrors graph/triangles.py):

  1. bucket_apply on src — each apex's full symmetrized adjacency lands
     in one group; ONE vectorized kernel per bucket expands wedges
     (lo, hi, aa = 1/ln(deg apex)) degree-bucketed (no per-vertex
     map_groups, no Python loop over rows).
  2. existing edges ride the same aggregate as (lo, hi, is_edge=1)
     marker rows — the non-adjacency filter costs ZERO extra shuffles
     (no anti-join): pairs with an edge marker are dropped after the
     per-pair sum.
  3. bucketed (lo, hi) lexsort+reduceat sum -> cn / adamic_adar /
     is_edge per pair; filter cn >= min_cn and is_edge == 0.
  4. degrees attach for the Jaccard denominator: broadcast numpy vector
     below the same 5M-node threshold as triangles, Dataset joins past
     it (no O(n) driver array on the scale path).

Scale notes: wedge volume is sum(deg^2) — the inherent cost of exact
common-neighbor counting (triangle counting pays the oriented variant
of the same sum).  ``max_apex_degree`` caps hub apexes for the 100 TB
tier: a hub shared by everything contributes ~0 Adamic-Adar signal
(weight 1/ln d) yet quadratic wedges, so capping is the standard skew
mitigation — EXACT results require the default None (the driver-oracle
mode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.shuffle import bucket_apply, safe_join
from .triangles import _degrees_ds

_PAIR_SCHEMA = {
    "lo": pa.int64(), "hi": pa.int64(), "cn": pa.int64(),
    "adamic_adar": pa.float64(), "is_edge": pa.int64(),
}


def _empty_pairs() -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in _PAIR_SCHEMA.items()})


def _wedge_rows(t: pa.Table, max_apex_degree: int | None) -> pa.Table:
    """(lo, hi, cn=1, aa=1/ln(deg apex), is_edge=0) per wedge; input is
    one src-hash bucket of the symmetrized simple edge table, so each
    apex's adjacency is complete here and its degree is its row count."""
    if t.num_rows == 0 or "src" not in t.schema.names:
        return _empty_pairs()
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    uniq, starts, counts = np.unique(src, return_index=True, return_counts=True)
    out_a, out_b, out_w = [], [], []
    for d in np.unique(counts):
        if d < 2 or (max_apex_degree is not None and d > max_apex_degree):
            continue
        sel = counts == d
        st = starts[sel]
        M = dst[(st[:, None] + np.arange(d)[None, :])]
        i, j = np.triu_indices(int(d), 1)
        out_a.append(M[:, i].ravel())
        out_b.append(M[:, j].ravel())
        out_w.append(np.full(int(sel.sum()) * i.size, 1.0 / np.log(float(d))))
    if not out_a:
        return _empty_pairs()
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    return pa.table({
        "lo": pa.array(np.minimum(a, b).astype(np.int64)),
        "hi": pa.array(np.maximum(a, b).astype(np.int64)),
        "cn": pa.array(np.ones(a.size, np.int64)),
        "adamic_adar": pa.array(np.concatenate(out_w)),
        "is_edge": pa.array(np.zeros(a.size, np.int64)),
    })


def _edge_marker_rows(t: pa.Table) -> pa.Table:
    """Each undirected edge once (src < dst), as an is_edge=1 marker."""
    if t.num_rows == 0 or "src" not in t.schema.names:
        return _empty_pairs()
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    keep = src < dst
    src, dst = src[keep], dst[keep]
    return pa.table({
        "lo": pa.array(src.astype(np.int64)),
        "hi": pa.array(dst.astype(np.int64)),
        "cn": pa.array(np.zeros(src.size, np.int64)),
        "adamic_adar": pa.array(np.zeros(src.size)),
        "is_edge": pa.array(np.ones(src.size, np.int64)),
    })


def _pair_sum(g: pa.Table) -> pa.Table:
    """Per-(lo, hi) sums inside one lo-hash bucket: one lexsort +
    reduceat — millions of pairs per bucket cost one sort, not one
    group each (the asof.py discipline)."""
    if g.num_rows == 0:
        return _empty_pairs()
    lo = g["lo"].to_numpy(zero_copy_only=False)
    hi = g["hi"].to_numpy(zero_copy_only=False)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    new = np.empty(lo.size, bool)
    new[0] = True
    np.logical_or(lo[1:] != lo[:-1], hi[1:] != hi[:-1], out=new[1:])
    starts = np.nonzero(new)[0]
    out = {"lo": pa.array(lo[starts]), "hi": pa.array(hi[starts])}
    for c in ("cn", "is_edge", "adamic_adar"):
        v = g[c].to_numpy(zero_copy_only=False)[order]
        out[c] = pa.array(np.add.reduceat(v, starts))
    return pa.table({k: out[k] for k in _PAIR_SCHEMA})


def link_prediction(edges_sym_ds, n: int, min_cn: int = 2,
                    exclude_edges: bool = True,
                    max_apex_degree: int | None = None,
                    strategy: str = "auto", num_partitions: int = 16,
                    B: int | None = None):
    """Dataset (a, b, cn, jaccard, adamic_adar), a < b, over pairs with
    >= min_cn common neighbors (non-adjacent pairs only when
    exclude_edges).  edges_sym_ds: symmetrized simple edge table."""
    if strategy == "auto":
        strategy = "broadcast" if n <= 5_000_000 else "join"

    wedges = bucket_apply(
        edges_sym_ds, "src",
        lambda t: _wedge_rows(t, max_apex_degree), B=B)
    markers = edges_sym_ds.map_batches(_edge_marker_rows, batch_format="pyarrow")
    pairs = bucket_apply(wedges.union(markers), "lo", _pair_sum, B=B)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cn" not in t.schema.names:
            return _empty_pairs()
        m = t["cn"].to_numpy(zero_copy_only=False) >= min_cn
        if exclude_edges:
            m &= t["is_edge"].to_numpy(zero_copy_only=False) == 0
        return t.filter(pa.array(m))

    pairs = pairs.map_batches(keep, batch_format="pyarrow")

    deg_ds = _degrees_ds(edges_sym_ds)
    if strategy == "broadcast":
        deg_pd = deg_ds.to_pandas()
        deg = np.zeros(n, dtype=np.int64)
        deg[deg_pd["node_id"].to_numpy()] = deg_pd["deg"].to_numpy()
        deg_ref = ray.put(deg)

        def finish(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "lo" not in t.schema.names:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "cn": pa.array([], pa.int64()),
                                 "jaccard": pa.array([], pa.float64()),
                                 "adamic_adar": pa.array([], pa.float64())})
            deg_ = ray.get(deg_ref)
            lo = t["lo"].to_numpy(zero_copy_only=False)
            hi = t["hi"].to_numpy(zero_copy_only=False)
            cn = t["cn"].to_numpy(zero_copy_only=False)
            union = deg_[lo] + deg_[hi] - cn
            return pa.table({
                "a": pa.array(lo), "b": pa.array(hi), "cn": pa.array(cn),
                "jaccard": pa.array(cn / union),
                "adamic_adar": t["adamic_adar"],
            })

        return pairs.map_batches(finish, batch_format="pyarrow")

    # scale path: degrees attach via joins — no O(n) driver array
    with_a = safe_join(
        pairs, deg_ds.rename_columns({"node_id": "a_id", "deg": "deg_a"}),
        on=("lo",), right_on=("a_id",), num_partitions=num_partitions)
    with_b = safe_join(
        with_a, deg_ds.rename_columns({"node_id": "b_id", "deg": "deg_b"}),
        on=("hi",), right_on=("b_id",), num_partitions=num_partitions)

    def finish_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lo" not in t.schema.names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cn": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64()),
                             "adamic_adar": pa.array([], pa.float64())})
        cn = t["cn"].to_numpy(zero_copy_only=False)
        union = (t["deg_a"].to_numpy(zero_copy_only=False)
                 + t["deg_b"].to_numpy(zero_copy_only=False) - cn)
        return pa.table({
            "a": t["lo"], "b": t["hi"], "cn": t["cn"],
            "jaccard": pa.array(cn / union),
            "adamic_adar": t["adamic_adar"],
        })

    return with_b.map_batches(finish_joined, batch_format="pyarrow")
