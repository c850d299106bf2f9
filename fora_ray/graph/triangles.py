"""G11 — distributed triangle count (SURVEY.md section 2.4 G11).

Pure Dataset pipeline (no actors) using degree-ordered orientation
(Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer", WWW 2011): orient each undirected edge from the (degree, id)-
smaller endpoint to the larger, so every vertex's oriented out-degree
is O(sqrt(m)) and each triangle is generated exactly once — from its
(degree, id)-minimal vertex as the wedge apex.

Two strategies, same results:

- 'broadcast' (auto below 5M nodes): the degree vector and the oriented
  edge-key set are numpy arrays shipped once via ray.put; wedge keys are
  packed (min,max) u64 pairs (ids < 2^32, guarded in pack_edge).
- 'join' (the 10^12-file scale path): degrees attach to edges via two
  hash joins for orientation, the adjacency probe is a two-column
  Dataset.join on (lo, hi), and per-vertex zero-fill comes from the
  degrees table — no O(n) driver arrays and no packed keys anywhere,
  so ids may span the full int64 range.

Stages: degrees -> orient -> per-apex wedge generation (degree-bucketed
groupby, vectorized triu expansion) -> adjacency probe -> per-vertex
member counts.
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


def _degrees_ds(edges_sym_ds):
    """(node_id, deg) Dataset from the symmetrized edge table."""
    from ..stages.shuffle import sum_by_key

    def _deg_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        v, c = np.unique(src, return_counts=True)
        return pa.table({"node_id": pa.array(v.astype(np.int64)),
                         "deg": pa.array(c.astype(np.int64))})

    return sum_by_key(
        edges_sym_ds.map_batches(_deg_partial, batch_format="pyarrow"),
        "node_id", ["deg"],
    )


def _wedge_arrays(t: pa.Table):
    """Vectorized per-src-bucket wedge expansion: returns (apex, a, b)
    numpy arrays, degree-bucketed (see triangle_count docstring)."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    uniq, starts, counts = np.unique(src, return_index=True, return_counts=True)
    out_apex, out_a, out_b = [], [], []
    for d in np.unique(counts):
        if d < 2:
            continue
        sel = counts == d
        st = starts[sel]
        M = dst[(st[:, None] + np.arange(d)[None, :])]
        i, j = np.triu_indices(int(d), 1)
        out_a.append(M[:, i].ravel())
        out_b.append(M[:, j].ravel())
        out_apex.append(np.repeat(uniq[sel], i.size))
    if not out_a:
        z = np.empty(0, np.int64)
        return z, z, z
    return (np.concatenate(out_apex).astype(np.int64),
            np.concatenate(out_a), np.concatenate(out_b))


def _wedge_block_pairs(t: pa.Table) -> pa.Table:
    """(apex, lo, hi) wedge rows — the full-int64-range representation
    used by the 'join' strategy."""
    apex, a, b = _wedge_arrays(t)
    return pa.table({
        "apex": pa.array(apex),
        "lo": pa.array(np.minimum(a, b).astype(np.int64)),
        "hi": pa.array(np.maximum(a, b).astype(np.int64)),
    })


def _wedge_block_packed(t: pa.Table) -> pa.Table:
    """(apex, edge_key) wedge rows — packed u64 keys halve the wedge
    shuffle volume; broadcast-strategy only (ids < 2^32, guarded)."""
    apex, a, b = _wedge_arrays(t)
    return pa.table({
        "apex": pa.array(apex),
        "edge_key": pa.array(_pack_sorted(a, b) if a.size else np.empty(0, np.uint64),
                             pa.uint64()),
    })


def _tri_pipeline(edges_sym_ds, n: int, strategy: str, num_partitions: int):
    """Shared orient -> wedge -> probe pipeline: returns (tri, deg_ds)
    where tri is the confirmed-triangle Dataset — (apex, edge_key) on
    the broadcast path, (apex, lo, hi) on the join path — each triangle
    exactly once, from its (degree, id)-minimal vertex."""
    deg_ds = _degrees_ds(edges_sym_ds)

    # ---- orientation: keep (src -> dst) iff (deg[src], src) < (deg[dst], dst)
    if strategy == "broadcast":
        deg_pd = deg_ds.to_pandas()
        deg = np.zeros(n, dtype=np.int64)
        deg[deg_pd["node_id"].to_numpy()] = deg_pd["deg"].to_numpy()
        deg_ref = ray.put(deg)

        # plain task stage: the degree vector is fetched zero-copy from
        # the local object store per task (no actor startup)
        def orient(t: pa.Table) -> pa.Table:
            deg_ = ray.get(deg_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            ds_, dd = deg_[src], deg_[dst]
            keep = (ds_ < dd) | ((ds_ == dd) & (src < dst))
            return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

        oriented = edges_sym_ds.map_batches(orient, batch_format="pyarrow")
    else:
        # scale path: degrees attach via joins — no O(n) driver array
        from ..stages.shuffle import safe_join

        with_src = safe_join(
            edges_sym_ds,
            deg_ds.rename_columns({"node_id": "s_id", "deg": "deg_src"}),
            on=("src",), right_on=("s_id",), num_partitions=num_partitions,
        )
        with_both = safe_join(
            with_src,
            deg_ds.rename_columns({"node_id": "d_id", "deg": "deg_dst"}),
            on=("dst",), right_on=("d_id",), num_partitions=num_partitions,
        )

        def orient_joined(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "src" not in t.schema.names:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            ds_ = t["deg_src"].to_numpy(zero_copy_only=False)
            dd = t["deg_dst"].to_numpy(zero_copy_only=False)
            keep = (ds_ < dd) | ((ds_ == dd) & (src < dst))
            return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

        oriented = with_both.map_batches(orient_joined, batch_format="pyarrow")

    oriented = oriented.materialize()  # consumed twice (wedges + probe)

    # ---- wedges per apex, degree-bucketed (no per-vertex map_groups)
    B = max(4, num_partitions)

    def _add_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return t.append_column("wpart", pa.array((src % B).astype(np.int32)))

    wedge_fn = _wedge_block_packed if strategy == "broadcast" else _wedge_block_pairs
    wedges = (
        oriented.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby("wpart")
        .map_groups(wedge_fn, batch_format="pyarrow")
    )

    # ---- adjacency probe
    if strategy == "broadcast":
        def _edge_keys(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            return pa.table({"edge_key": pa.array(_pack_sorted(src, dst), pa.uint64())})

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
        # two-column join probe — valid for the full int64 id range
        from ..stages.shuffle import safe_join

        edge_pairs = oriented.map_batches(
            lambda t: pa.table({
                "lo": pa.array(np.minimum(t["src"].to_numpy(zero_copy_only=False),
                                          t["dst"].to_numpy(zero_copy_only=False))),
                "hi": pa.array(np.maximum(t["src"].to_numpy(zero_copy_only=False),
                                          t["dst"].to_numpy(zero_copy_only=False))),
            }),
            batch_format="pyarrow",
        )
        tri = safe_join(
            wedges, edge_pairs, on=("lo", "hi"), num_partitions=num_partitions,
        )
    return tri, deg_ds


def triangle_count(edges_sym_ds, n: int, strategy: str = "auto",
                   num_partitions: int = 16):
    """(per_vertex Dataset (node_id, triangles), total int).

    edges_sym_ds: symmetrized simple edge table (both directions present).
    """
    from ..stages.shuffle import sum_by_key

    if strategy == "auto":
        strategy = "broadcast" if n <= 5_000_000 else "join"
    tri, deg_ds = _tri_pipeline(edges_sym_ds, n, strategy, num_partitions)

    # ---- per-vertex counts (each triangle contributes to apex + both ends)
    def _members(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "apex" not in t.schema.names:
            return pa.table({"node_id": pa.array([], pa.int64()),
                             "triangles": pa.array([], pa.int64())})
        if "edge_key" in t.schema.names:  # broadcast path: packed (lo, hi)
            key = t["edge_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            lo = (key >> np.uint64(32)).astype(np.int64)
            hi = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            lo = t["lo"].to_numpy(zero_copy_only=False)
            hi = t["hi"].to_numpy(zero_copy_only=False)
        members = np.concatenate([
            t["apex"].to_numpy(zero_copy_only=False), lo, hi,
        ])
        v, c = np.unique(members, return_counts=True)
        return pa.table({"node_id": pa.array(v.astype(np.int64)),
                         "triangles": pa.array(c.astype(np.int64))})

    per_vertex_partial = tri.map_batches(_members, batch_format="pyarrow")
    if strategy == "broadcast":
        # zero-fill across all n vertices (metadata-sized at this tier)
        zeros = pa.table({
            "node_id": pa.array(np.arange(n, dtype=np.int64)),
            "triangles": pa.array(np.zeros(n, dtype=np.int64)),
        })
        zeros_ds = ray.data.from_arrow(zeros)
    else:
        # scale path: zero-fill only vertices that exist in the edge
        # table (isolated vertices come from the caller's nodes table
        # if a dense result is required — an O(n) driver range here
        # would defeat the strategy)
        zeros_ds = deg_ds.map_batches(
            lambda t: pa.table({
                "node_id": t["node_id"],
                "triangles": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }),
            batch_format="pyarrow",
        )
    per_vertex = sum_by_key(
        per_vertex_partial.union(zeros_ds),
        "node_id", ["triangles"],
    )
    total = tri.count()
    return per_vertex, total


def clustering_coefficient(edges_sym_ds, n: int, strategy: str = "auto",
                           num_partitions: int = 16):
    """Per-vertex local clustering coefficient
    ``lcc(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1))`` on the
    symmetrized simple graph (0.0 for deg < 2).

    Derived entirely from distributed pieces: `triangle_count` per-vertex
    counts left-outer-joined (hash join, no driver materialization) with
    the streaming degree aggregate — the join is n-rows x n-rows small
    relative to the wedge stage that precedes it.  Returns a Dataset
    (node_id, triangles, deg, lcc).
    """
    from ..stages.shuffle import safe_join

    per_vertex, _total = triangle_count(
        edges_sym_ds, n, strategy=strategy, num_partitions=num_partitions
    )
    deg_ds = _degrees_ds(edges_sym_ds)

    joined = safe_join(per_vertex, deg_ds, on=("node_id",),
                       num_partitions=num_partitions, join_type="left_outer")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node_id" not in t.schema.names:
            return pa.table({"node_id": pa.array([], pa.int64()),
                             "triangles": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64()),
                             "lcc": pa.array([], pa.float64())})
        tri_v = t["triangles"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = t["deg"].to_numpy(zero_copy_only=False)
        deg = np.nan_to_num(deg.astype(np.float64)).astype(np.int64)
        denom = deg * (deg - 1)
        lcc = np.where(denom > 0, 2.0 * tri_v / np.maximum(denom, 1), 0.0)
        return pa.table({"node_id": t["node_id"],
                         "triangles": pa.array(tri_v),
                         "deg": pa.array(deg),
                         "lcc": pa.array(lcc)})

    return joined.map_batches(finish, batch_format="pyarrow")


def edge_supports(edges_sym_ds, n: int, strategy: str = "auto",
                  num_partitions: int = 16):
    """Per-UNDIRECTED-edge triangle support: Dataset (lo, hi, support)
    over edges participating in >= 1 triangle (support-0 edges are
    absent — callers treat missing as 0).  Each confirmed triangle
    (apex, a, b) from the oriented wedge+probe pipeline contributes +1
    to its three undirected edges; counts reduce per pair via one
    bucketed mix64(lo, hi) exchange with per-block combiners (no packed
    keys — full int64 id range)."""
    from ..functions.hashing import mix64
    from ..stages.shuffle import bucket_apply

    if strategy == "auto":
        strategy = "broadcast" if n <= 5_000_000 else "join"
    tri, _deg = _tri_pipeline(edges_sym_ds, n, strategy, num_partitions)

    _EMPTY = pa.table({"lo": pa.array([], pa.int64()),
                       "hi": pa.array([], pa.int64()),
                       "support": pa.array([], pa.int64())})

    def tri_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "apex" not in t.schema.names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64()),
                             "pair_h": pa.array([], pa.uint64())})
        apex = t["apex"].to_numpy(zero_copy_only=False)
        if "edge_key" in t.schema.names:
            key = t["edge_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            a = (key >> np.uint64(32)).astype(np.int64)
            b = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            a = t["lo"].to_numpy(zero_copy_only=False)
            b = t["hi"].to_numpy(zero_copy_only=False)
        lo = np.concatenate([np.minimum(apex, a), np.minimum(apex, b), a])
        hi = np.concatenate([np.maximum(apex, a), np.maximum(apex, b), b])
        # per-block combiner: count per unique pair before the shuffle
        order = np.lexsort((hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        first = np.concatenate(
            [[True], (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        starts = np.nonzero(first)[0]
        cnt = np.diff(np.concatenate([starts, [lo_s.size]]))
        lo_u, hi_u = lo_s[starts], hi_s[starts]
        h = mix64(mix64(lo_u.astype(np.uint64), np.uint64(0xD1B54A32)),
                  hi_u.astype(np.uint64))
        return pa.table({"lo": pa.array(lo_u), "hi": pa.array(hi_u),
                         "support": pa.array(cnt.astype(np.int64)),
                         "pair_h": pa.array(h, pa.uint64())})

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "lo" not in g.schema.names:
            return _EMPTY
        lo = g["lo"].to_numpy(zero_copy_only=False)
        hi = g["hi"].to_numpy(zero_copy_only=False)
        c = g["support"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hi, lo))
        lo_s, hi_s, c_s = lo[order], hi[order], c[order]
        first = np.concatenate(
            [[True], (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])])
        starts = np.nonzero(first)[0]
        return pa.table({
            "lo": pa.array(lo_s[starts]),
            "hi": pa.array(hi_s[starts]),
            "support": pa.array(np.add.reduceat(c_s, starts).astype(np.int64)),
        })

    partial = tri.map_batches(tri_edges, batch_format="pyarrow")
    return bucket_apply(partial, "pair_h", fold)


# ---- incremental truss peeling --------------------------------------------
#
# One triangle enumeration, then per-round support decrements: when an
# edge drops, every surviving triangle through it dies and its other
# two edges lose one support — no re-running the orient -> wedge ->
# probe pipeline per peel iteration (the peel-depth x full-pass
# multiplier VERDICT r04 flagged).  Peeling state uses packed u64 edge
# keys (exact bijection for ids < 2^32 — pack_edge guards loudly), and
# the per-edge support arrays live on the driver at 16 bytes/edge — the
# same m-sized driver-array tier the broadcast adjacency probe already
# uses.  Past 2^32 ids `ktruss` falls back to the full-recompute loop
# (`mode='recompute'`), which stays valid for the whole int64 range.


def _sup_partial_fn(t: pa.Table):
    """Per-block (keys, counts, n_triangles) for initial supports."""
    if t.num_rows == 0 or "e1" not in t.schema.names:
        return np.empty(0, np.uint64), np.empty(0, np.int64), 0
    allk = np.concatenate([
        t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
        for c in ("e1", "e2", "e3")])
    k, c = np.unique(allk, return_counts=True)
    return k, c.astype(np.int64), t.num_rows


def _in_sorted(haystack: np.ndarray, x: np.ndarray) -> np.ndarray:
    if haystack.size == 0 or x.size == 0:
        return np.zeros(x.size, bool)
    pos = np.searchsorted(haystack, x)
    return (pos < haystack.size) & (haystack[np.minimum(pos, haystack.size - 1)] == x)


def _peel_block_fn(t: pa.Table, dropped: np.ndarray):
    """One peel round over one triangle block: kill triangles touching a
    dropped edge, emit -1 support deltas for their surviving edges.
    Returns (survivors, n_survivors, dec_keys, dec_counts)."""
    if t.num_rows == 0 or "e1" not in t.schema.names:
        return t, 0, np.empty(0, np.uint64), np.empty(0, np.int64)
    e = [t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
         for c in ("e1", "e2", "e3")]
    hits = [_in_sorted(dropped, ei) for ei in e]
    killed = hits[0] | hits[1] | hits[2]
    if not killed.any():
        return t, t.num_rows, np.empty(0, np.uint64), np.empty(0, np.int64)
    surv = t.filter(pa.array(~killed))
    dec = np.concatenate([e[i][killed & ~hits[i]] for i in range(3)])
    dk, dc = np.unique(dec, return_counts=True)
    return surv, surv.num_rows, dk, dc.astype(np.int64)


def _build_peel_state(edges_sym_ds, n: int, strategy: str,
                      num_partitions: int):
    """ONE distributed triangle enumeration -> peeling state:
    (keys, sup, tri_refs, tri_rows) where keys is the sorted u64
    packed-key array of edges closing >= 1 triangle, sup their triangle
    supports, and tri_refs/tri_rows the (e1, e2, e3) packed-key triangle
    blocks (object refs — the triangle table itself never lands on the
    driver, only per-edge aggregates do)."""
    tri, _deg = _tri_pipeline(edges_sym_ds, n, strategy, num_partitions)

    def conv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "apex" not in t.schema.names:
            return pa.table({c: pa.array([], pa.uint64())
                             for c in ("e1", "e2", "e3")})
        apex = t["apex"].to_numpy(zero_copy_only=False)
        if "edge_key" in t.schema.names:
            key = t["edge_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            a = (key >> np.uint64(32)).astype(np.int64)
            b = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            a = t["lo"].to_numpy(zero_copy_only=False)
            b = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table({
            "e1": pa.array(_pack_sorted(apex, a), pa.uint64()),
            "e2": pa.array(_pack_sorted(apex, b), pa.uint64()),
            "e3": pa.array(pack_edge(a, b), pa.uint64()),  # a < b already
        })

    packed = tri.map_batches(conv, batch_format="pyarrow")
    tri_refs = list(packed.to_arrow_refs())
    sup_partial = ray.remote(num_cpus=0)(_sup_partial_fn)
    parts = ray.get([sup_partial.remote(r) for r in tri_refs])
    tri_rows = [p[2] for p in parts]
    ks = [p[0] for p in parts if p[0].size]
    cs = [p[1] for p in parts if p[1].size]
    if not ks:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                tri_refs, tri_rows)
    allk, allc = np.concatenate(ks), np.concatenate(cs)
    order = np.argsort(allk, kind="stable")
    sk, sc = allk[order], allc[order]
    first = np.concatenate([[True], sk[1:] != sk[:-1]])
    starts = np.nonzero(first)[0]
    return (sk[starts], np.add.reduceat(sc, starts).astype(np.int64),
            tri_refs, tri_rows)


def _peel_to_fixpoint(keys, sup, alive, tri_refs, tri_rows, thresh: int,
                      on_drop, max_iters: int, iters_done: int) -> tuple:
    """Drop alive edges with sup < thresh, decrement supports of their
    surviving triangles' other edges, repeat to fixpoint.  on_drop(mask)
    fires before each drop wave (trussness records levels there).
    Returns (rounds, tri_refs, tri_rows)."""
    peel = ray.remote(num_returns=4)(_peel_block_fn)
    rounds = 0
    while True:
        drop = alive & (sup < thresh)
        if not drop.any():
            return rounds, tri_refs, tri_rows
        if iters_done + rounds >= max_iters:
            raise RuntimeError(f"truss peeling exceeded {max_iters} rounds")
        if on_drop is not None:
            on_drop(drop)
        alive[drop] = False
        live = [(r, nr) for r, nr in zip(tri_refs, tri_rows) if nr > 0]
        if live:
            dref = ray.put(np.sort(keys[drop]))
            outs = [peel.remote(r, dref) for r, _ in live]
            tri_refs = [o[0] for o in outs]
            tri_rows = ray.get([o[1] for o in outs])
            dks = ray.get([o[2] for o in outs])
            dcs = ray.get([o[3] for o in outs])
            for dk, dc in zip(dks, dcs):
                if dk.size:
                    sup[np.searchsorted(keys, dk)] -= dc
        else:
            tri_refs, tri_rows = [], []
        rounds += 1


def _unpack_pairs_table(keys: np.ndarray, extra: dict | None = None) -> pa.Table:
    lo = (keys >> np.uint64(32)).astype(np.int64)
    hi = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
    cols = {"lo": pa.array(lo), "hi": pa.array(hi)}
    for name, arr in (extra or {}).items():
        cols[name] = pa.array(arr)
    return pa.table(cols)


def ktruss(edges_sym_ds, n: int, k: int, strategy: str = "auto",
           num_partitions: int = 16, max_iters: int = 1000,
           mode: str = "auto"):
    """k-truss subgraph: the maximal subgraph where every edge closes
    >= k-2 triangles (Cohen '08) — the standard cohesive-community
    backbone.  Returns (Dataset (lo, hi) of surviving undirected edges,
    stats).  k >= 3 (2-truss = every edge of the simple graph).

    mode='incremental' (auto for ids < 2^32): ONE triangle enumeration,
    then per-round support decrements — when an edge drops, each
    surviving triangle through it dies and its other two edges lose one
    support.  Peel rounds scan only the shrinking triangle table; the
    full orient -> wedge -> probe pipeline runs exactly once, so peel
    depth no longer multiplies a full triangle pass (VERDICT r04 #1).

    mode='recompute' (auto past 2^32 ids): the previous full-recompute
    loop — re-derive supports over the surviving subgraph per iteration.
    Valid for the whole int64 id range (no packed keys)."""
    if k < 3:
        raise ValueError("ktruss requires k >= 3")
    if strategy == "auto":
        strategy = "broadcast" if n <= 5_000_000 else "join"
    if mode == "auto":
        mode = "incremental" if n < (1 << 32) else "recompute"
    if mode == "recompute":
        return _ktruss_recompute(edges_sym_ds, n, k, strategy,
                                 num_partitions, max_iters)

    from ..stages.shuffle import clean_sort

    keys, sup, tri_refs, tri_rows = _build_peel_state(
        edges_sym_ds, n, strategy, num_partitions)
    alive = np.ones(keys.size, bool)
    rounds, _refs, _rows = _peel_to_fixpoint(
        keys, sup, alive, tri_refs, tri_rows, k - 2, None, max_iters, 0)
    out = ray.data.from_arrow(_unpack_pairs_table(keys[alive]))
    return clean_sort(out, ["lo", "hi"]), {
        "iters": rounds, "edges": int(alive.sum()),
        "triangles_enumerated": int(sum(tri_rows)), "mode": "incremental"}


def trussness(edges_sym_ds, n: int, strategy: str = "auto",
              num_partitions: int = 16, max_iters: int = 100_000):
    """Per-edge truss decomposition: trussness(e) = max k such that e is
    in the k-truss (>= 2 for every edge of the simple graph).  Runs the
    incremental peeling kernel once per level k = 3, 4, ... — edges
    dropped while peeling at level k get trussness k-1; the triangle
    table and supports carry over between levels (k-truss of the
    (k-1)-truss == k-truss of G), so the triangle pipeline still runs
    exactly once.  Triangle-free edges are filled at trussness 2 from
    the distinct-pair table with a sorted-key membership filter.

    Requires ids < 2^32 (packed-key peeling state); returns (Dataset
    (lo, hi, trussness) over ALL undirected edges, stats)."""
    from ..stages.shuffle import clean_sort, distinct_pairs, drop_empty_blocks

    if strategy == "auto":
        strategy = "broadcast" if n <= 5_000_000 else "join"
    if n >= (1 << 32):
        raise ValueError(
            "trussness requires ids < 2^32 (packed-key peeling state); "
            "run ktruss(mode='recompute') per k for wider ids")

    keys, sup, tri_refs, tri_rows = _build_peel_state(
        edges_sym_ds, n, strategy, num_partitions)
    truss = np.full(keys.size, 2, np.int64)
    alive = np.ones(keys.size, bool)
    k, total_rounds = 3, 0
    while alive.any():
        lvl = k  # bind for the closure

        def on_drop(mask, lvl=lvl):
            truss[mask] = lvl - 1

        rounds, tri_refs, tri_rows = _peel_to_fixpoint(
            keys, sup, alive, tri_refs, tri_rows, k - 2, on_drop,
            max_iters, total_rounds)
        total_rounds += rounds
        k += 1
    max_k = int(truss.max()) if truss.size else 2

    def to_pairs(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = src != dst
        return pa.table({
            "lo": pa.array(np.minimum(src[keep], dst[keep])),
            "hi": pa.array(np.maximum(src[keep], dst[keep])),
        })

    keys_ref = ray.put(keys)  # sorted — membership by binary search

    def fill2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lo" not in t.schema.names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "trussness": pa.array([], pa.int64())})
        ks = ray.get(keys_ref)
        pk = pack_edge(t["lo"].to_numpy(zero_copy_only=False),
                       t["hi"].to_numpy(zero_copy_only=False))
        rest = t.filter(pa.array(~_in_sorted(ks, pk)))
        return pa.table({
            "lo": rest["lo"], "hi": rest["hi"],
            "trussness": pa.array(np.full(rest.num_rows, 2, np.int64)),
        })

    pairs = distinct_pairs(
        edges_sym_ds.map_batches(to_pairs, batch_format="pyarrow"),
        "lo", "hi")
    no_tri = pairs.map_batches(fill2, batch_format="pyarrow")
    with_tri = ray.data.from_arrow(
        _unpack_pairs_table(keys, {"trussness": truss}))
    out = drop_empty_blocks(no_tri.union(with_tri))
    return clean_sort(out, ["lo", "hi"]), {
        "rounds": total_rounds, "max_trussness": max_k,
        "triangle_edges": int(keys.size)}


def _ktruss_recompute(edges_sym_ds, n: int, k: int, strategy: str,
                      num_partitions: int, max_iters: int):
    """Full-recompute peeling (valid for the whole int64 id range): one
    distributed triangle pass (orient -> wedge -> probe -> pair reduce)
    over the CURRENT subgraph per iteration, dropping support < k-2."""
    import pyarrow.compute as pc

    from ..stages.shuffle import clean_sort, distinct_pairs

    def to_pairs(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = src != dst
        return pa.table({
            "lo": pa.array(np.minimum(src[keep], dst[keep])),
            "hi": pa.array(np.maximum(src[keep], dst[keep])),
        })

    cur = distinct_pairs(
        edges_sym_ds.map_batches(to_pairs, batch_format="pyarrow"),
        "lo", "hi").materialize()
    m_cur = cur.count()
    iters = 0
    thresh = k - 2
    while m_cur > 0 and iters < max_iters:
        sym = cur.map_batches(
            lambda t: pa.table({
                "src": pa.array(np.concatenate([
                    t["lo"].to_numpy(zero_copy_only=False),
                    t["hi"].to_numpy(zero_copy_only=False)])),
                "dst": pa.array(np.concatenate([
                    t["hi"].to_numpy(zero_copy_only=False),
                    t["lo"].to_numpy(zero_copy_only=False)])),
            }),
            batch_format="pyarrow")
        sup = edge_supports(sym, n, strategy, num_partitions)
        kept = sup.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["support"], thresh)
            ).select(["lo", "hi"]),
            batch_format="pyarrow").materialize()
        m_new = kept.count()
        iters += 1
        cur = kept
        if m_new == m_cur:
            break
        m_cur = m_new
    else:
        if m_cur > 0:
            raise RuntimeError(f"ktruss did not converge in {max_iters} iters")
    return clean_sort(cur, ["lo", "hi"]), {
        "iters": iters, "edges": m_cur, "mode": "recompute"}
