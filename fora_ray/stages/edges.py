"""M4 existence join, M6 canonicalization/dedup, A7 symmetrize
(SURVEY.md sections 2.2, 2.5).

Two join strategies for resolving candidate (repo, dst_path) rows to
node ids against the nodes table:

- ``broadcast``: nodes dict ray.put() once, looked up per batch inside
  an actor-pool map_batches — no shuffle.  Right choice while the node
  table fits comfortably in worker heap (SURVEY 4.2 "broadcast small
  sides").
- ``join``: hash-partitioned ``Dataset.join`` on (repo, path) — the
  scale path when nodes itself is huge (10^12 files).

Dedup is per-block pre-dedup (combiner) followed by a groupby on the
packed (src,dst) key — the only all-to-all exchange in edge
construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import pack_edge, unpack_edge


def _node_key(repos: list, paths: list) -> np.ndarray:
    """64-bit key for (repo, path) — blake2b over 'repo\\0path'."""
    from ..functions.hashing import hash_str_u64

    return hash_str_u64([f"{r}\x00{p}" for r, p in zip(repos, paths)])


class _NodeLookup:
    """Broadcast-lookup stage: maps candidate (repo, src_path, dst_path)
    rows to (src, dst) id pairs against sorted (key, node_id) arrays.

    Plain callable (task-based, not an actor pool): the broadcast is two
    numpy arrays fetched zero-copy from the local object store per task,
    so there is no per-actor startup cost and the stage scales with the
    elastic task pool.  Collision probability of the 64-bit key is
    ~n^2/2^65 (negligible below ~10^8 nodes; the Dataset.join strategy
    is the exact path beyond that)."""

    def __init__(self, keys_ref, ids_ref):
        self.keys_ref, self.ids_ref = keys_ref, ids_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = ray.get(self.keys_ref)
        ids = ray.get(self.ids_ref)
        repos = batch["repo"].to_pylist()
        srcs = batch["src_path"].to_pylist()
        dsts = batch["dst_path"].to_pylist()
        kd = _node_key(repos, dsts)
        ks = _node_key(repos, srcs)

        def find(k):
            pos = np.searchsorted(keys, k)
            pos_c = np.minimum(pos, keys.size - 1) if keys.size else pos
            hit = (pos < keys.size) & (keys[pos_c] == k) if keys.size else np.zeros(len(k), bool)
            return pos_c, hit

        pd_, hd = find(kd)
        ps_, hs = find(ks)
        ok = hd & hs
        src = ids[ps_[ok]]
        dst = ids[pd_[ok]]
        keep = src != dst  # drop self-loops
        return pa.table(
            {"src": pa.array(src[keep]), "dst": pa.array(dst[keep])}
        )


def resolve_to_ids(candidates_ds, nodes_ds, n_nodes: int, strategy: str = "auto",
                   num_partitions: int | None = None, concurrency=None):
    """(repo, src_path, dst_path) -> (src, dst) id pairs (M4 + M5 apply).

    strategy='broadcast' | 'join' | 'auto' (broadcast while nodes is
    small enough to ship to every worker once).

    concurrency=None sizes the lookup actor pool to the cluster CPU
    count — upstream extract/resolve task stages fuse into this pool,
    so it must scale with the session or it caps ingest parallelism.
    """
    if concurrency is None:
        concurrency = (1, max(4, int(ray.cluster_resources().get("CPU", 8))))
    if strategy == "auto":
        # the broadcast is two flat arrays (u64 key + i64 id = 16 B per
        # node), NOT a Python dict — 30M nodes is ~0.5 GB in every
        # worker's heap, still far cheaper than the hash-join path
        # (measured 5x slower end-to-end at the 2M tier, and its
        # aggregator actors starve sessions smaller than the partition
        # count).  The old 2M row threshold pushed a 2.4M-node corpus
        # onto the join path and livelocked an 8-CPU session.
        strategy = "broadcast" if n_nodes <= 30_000_000 else "join"
    if strategy == "broadcast":
        # key hashing runs distributed (one small (key, node_id) table
        # per block); the driver only concatenates u64/int64 arrays —
        # hashing 10^6+ strings serially on the driver was a measured
        # ~1.5 s serial segment at 600k nodes and grows linearly
        def _keys_block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "repo" not in t.schema.names:
                return pa.table({"key": pa.array([], pa.uint64()),
                                 "node_id": pa.array([], pa.int64())})
            return pa.table({
                "key": pa.array(_node_key(t["repo"].to_pylist(), t["path"].to_pylist()), pa.uint64()),
                "node_id": t["node_id"],
            })

        all_keys, all_ids = [], []
        for ref in nodes_ds.map_batches(_keys_block, batch_format="pyarrow").to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows == 0 or "key" not in t.schema.names:
                continue
            all_keys.append(t["key"].to_numpy(zero_copy_only=False))
            all_ids.append(t["node_id"].to_numpy(zero_copy_only=False))
        if all_keys:
            keys = np.concatenate(all_keys)
            ids = np.concatenate(all_ids).astype(np.int64)
            order = np.argsort(keys)
            keys, ids = keys[order], ids[order]
        else:
            keys, ids = np.empty(0, np.uint64), np.empty(0, np.int64)
        lookup = _NodeLookup(ray.put(keys), ray.put(ids))
        return candidates_ds.map_batches(lookup, batch_format="pyarrow")
    # scale path: two hash joins on (repo, path)
    from .shuffle import join_partitions

    num_partitions = join_partitions(num_partitions)
    dst_joined = candidates_ds.join(
        nodes_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("repo", "dst_path"),
        right_on=("repo", "path"),
    ).rename_columns({"node_id": "dst"})
    src_joined = dst_joined.join(
        nodes_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("repo", "src_path"),
        right_on=("repo", "path"),
    ).rename_columns({"node_id": "src"})
    out = src_joined.select_columns(["src", "dst"])
    return out.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    )


def _block_dedup(batch: pa.Table) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    key = np.unique(pack_edge(src, dst))
    return pa.table({"edge_key": pa.array(key.astype(np.uint64), pa.uint64())})


def _unpack(batch: pa.Table) -> pa.Table:
    key = batch["edge_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    src, dst = unpack_edge(key)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def dedup_edges(edge_ds, num_partitions: int | None = None, wide_ids: bool = False):
    """M6 — canonical simple digraph: per-block pre-dedup (combiner),
    then a bucketed global distinct on the packed 64-bit key (one
    hash shuffle into ~2xCPU buckets, vectorized np.unique per bucket —
    measured ~2x faster than the sort-based groupby().count() at this
    scale), unpacked back to (src, dst).  Output order is NOT defined
    (callers needing determinism sort at the consumption point).

    wide_ids=True routes through the two-column lexsort distinct
    (stages.shuffle.distinct_pairs) — required once ids can reach 2^32
    (the packed path guards loudly against that)."""
    if wide_ids:
        from .shuffle import distinct_pairs

        return distinct_pairs(edge_ds, "src", "dst", B=num_partitions)
    from .shuffle import distinct_u64

    packed = edge_ds.map_batches(_block_dedup, batch_format="pyarrow")
    distinct = distinct_u64(packed, "edge_key", B=num_partitions)
    return distinct.map_batches(_unpack, batch_format="pyarrow")


def symmetrize(edge_ds, wide_ids: bool = False):
    """A7 — undirected view: edges ∪ reversed(edges), deduped."""
    rev = edge_ds.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}), batch_format="pyarrow"
    )
    return dedup_edges(edge_ds.union(rev), wide_ids=wide_ids)
