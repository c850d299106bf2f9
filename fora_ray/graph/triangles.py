"""G11 — distributed triangle count (SURVEY.md section 2.4 G11).

Pure Dataset pipeline (no actors) using degree-ordered orientation
(Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer", WWW 2011): orient each undirected edge from the (degree, id)-
smaller endpoint to the larger, so every vertex's oriented out-degree
is O(sqrt(m)) and each triangle is generated exactly once — from its
(degree, id)-minimal vertex as the wedge apex.

Stages:
  1. undirected degrees (from the symmetrized edge table),
  2. orient edges (vectorized filter; degree vector broadcast once via
     ray.put — at 10^12-node scale this becomes a join against the
     degrees table, same shape as stages/edges.resolve_to_ids),
  3. per-apex wedge generation (groupby(src).map_groups, numpy
     triu pair expansion),
  4. adjacency probe of wedge pairs against the undirected edge-key
     set: hash-partitioned Dataset.join (scale path) or broadcast
     sorted-array searchsorted (small graphs),
  5. per-vertex counts: explode each triangle's 3 members ->
     groupby(node_id).count, zero-filled via the nodes table union.

Keys are packed (min,max) id pairs (node ids < 2^32 assumed here;
SURVEY 1.3 edge-key convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import pack_edge


def _pack_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return pack_edge(lo, hi)


def triangle_count(edges_sym_ds, n: int, strategy: str = "auto",
                   num_partitions: int = 16):
    """(per_vertex Dataset (node_id, triangles), total int).

    edges_sym_ds: symmetrized simple edge table (both directions present).
    """
    # 1. undirected degree vector (degree = out-degree in the sym graph)
    def _deg_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        v, c = np.unique(src, return_counts=True)
        return pa.table({"node_id": pa.array(v.astype(np.int64)),
                         "deg": pa.array(c.astype(np.int64))})

    from ..stages.shuffle import sum_by_key

    deg_pd = sum_by_key(
        edges_sym_ds.map_batches(_deg_partial, batch_format="pyarrow"),
        "node_id", ["deg"],
    ).to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    deg[deg_pd["node_id"].to_numpy()] = deg_pd["deg"].to_numpy()
    deg_ref = ray.put(deg)

    # 2. orientation: keep (src -> dst) iff (deg[src], src) < (deg[dst], dst)
    # plain task stage: the degree vector is fetched zero-copy from the
    # local object store per task (no actor startup)
    def orient(t: pa.Table) -> pa.Table:
        deg_ = ray.get(deg_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        ds_, dd = deg_[src], deg_[dst]
        keep = (ds_ < dd) | ((ds_ == dd) & (src < dst))
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    oriented = edges_sym_ds.map_batches(
        orient, batch_format="pyarrow"
    ).materialize()  # consumed twice (wedges + probe); m/2 rows, pinned

    # 3. wedges per apex, degree-bucketed (NO per-vertex map_groups: one
    # vectorized pass per src-sorted block; vertices of equal oriented
    # out-degree d are stacked into a (count, d) matrix and expanded with
    # one triu_indices per distinct d — oriented degrees are O(sqrt(m)),
    # so there are few distinct values)
    def _wedges_block(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        uniq, starts, counts = np.unique(src, return_index=True, return_counts=True)
        out_apex, out_key = [], []
        for d in np.unique(counts):
            if d < 2:
                continue
            sel = counts == d
            st = starts[sel]
            # (n_d, d) neighbor matrix — contiguity guaranteed by the sort
            M = dst[(st[:, None] + np.arange(d)[None, :])]
            i, j = np.triu_indices(int(d), 1)
            a = M[:, i].ravel()
            b = M[:, j].ravel()
            out_key.append(_pack_sorted(a, b))
            out_apex.append(np.repeat(uniq[sel], i.size))
        if not out_key:
            return pa.table({"apex": pa.array([], pa.int64()),
                             "edge_key": pa.array([], pa.uint64())})
        return pa.table({
            "apex": pa.array(np.concatenate(out_apex).astype(np.int64)),
            "edge_key": pa.array(np.concatenate(out_key), pa.uint64()),
        })

    # co-locate each src's edges (hash-bucket groupby — few large groups,
    # one vectorized _wedges_block call per bucket)
    B = max(4, num_partitions)

    def _add_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return t.append_column("wpart", pa.array((src % B).astype(np.int32)))

    wedges = (
        oriented.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby("wpart")
        .map_groups(_wedges_block, batch_format="pyarrow")
    )

    # 4. adjacency probe
    def _edge_keys(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"edge_key": pa.array(_pack_sorted(src, dst), pa.uint64())})

    if strategy == "auto":
        strategy = "broadcast" if n <= 5_000_000 else "join"
    if strategy == "broadcast":
        key_blocks = [
            t["edge_key"].to_numpy(zero_copy_only=False)
            for t in ray.get(oriented.map_batches(_edge_keys, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows and "edge_key" in t.schema.names
        ]
        keys_np = np.sort(np.concatenate(key_blocks or [np.empty(0, np.uint64)]))
        keys_ref = ray.put(keys_np)

        def probe(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            k = t["edge_key"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, k)
            hit = (pos < keys.size) & (keys[np.minimum(pos, keys.size - 1)] == k)
            return t.filter(pa.array(hit))

        tri = wedges.map_batches(probe, batch_format="pyarrow")
    else:
        edge_keys = oriented.map_batches(_edge_keys, batch_format="pyarrow")
        tri = wedges.join(
            edge_keys, join_type="inner", num_partitions=num_partitions,
            on=("edge_key",),
        )

    # 5. per-vertex counts (each triangle contributes to apex + both ends)
    def _members(t: pa.Table) -> pa.Table:
        apex = t["apex"].to_numpy(zero_copy_only=False)
        key = t["edge_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = (key >> np.uint64(32)).astype(np.int64)
        hi = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        members = np.concatenate([apex, lo, hi])
        v, c = np.unique(members, return_counts=True)
        return pa.table({"node_id": pa.array(v.astype(np.int64)),
                         "triangles": pa.array(c.astype(np.int64))})

    per_vertex_partial = tri.map_batches(_members, batch_format="pyarrow")
    zeros = pa.table({
        "node_id": pa.array(np.arange(n, dtype=np.int64)),
        "triangles": pa.array(np.zeros(n, dtype=np.int64)),
    })
    per_vertex = sum_by_key(
        per_vertex_partial.union(ray.data.from_arrow(zeros)),
        "node_id", ["triangles"],
    )
    total = tri.count()
    return per_vertex, total
