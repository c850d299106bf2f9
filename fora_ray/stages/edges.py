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


class _NodeLookup:
    """Actor-pool stage: maps candidate (repo, src_path, dst_path) rows to
    (src, dst) id pairs via a broadcast {(repo, path): id} dict."""

    def __init__(self, nodes_ref):
        self.lookup = ray.get(nodes_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        srcs = batch["src_path"].to_pylist()
        dsts = batch["dst_path"].to_pylist()
        lk = self.lookup
        o_src, o_dst = [], []
        for r, s, d in zip(repos, srcs, dsts):
            di = lk.get((r, d))
            if di is None:
                continue  # candidate does not exist in corpus -> dropped
            si = lk.get((r, s))
            if si is None or si == di:
                continue  # unknown source (should not happen) / self-loop
            o_src.append(si)
            o_dst.append(di)
        return pa.table(
            {"src": pa.array(o_src, pa.int64()), "dst": pa.array(o_dst, pa.int64())}
        )


def resolve_to_ids(candidates_ds, nodes_ds, n_nodes: int, strategy: str = "auto",
                   num_partitions: int = 32, concurrency=4):
    """(repo, src_path, dst_path) -> (src, dst) id pairs (M4 + M5 apply).

    strategy='broadcast' | 'join' | 'auto' (broadcast while nodes is
    small enough to ship to every worker once).
    """
    if strategy == "auto":
        strategy = "broadcast" if n_nodes <= 2_000_000 else "join"
    if strategy == "broadcast":
        tbl = nodes_ds.to_arrow_refs()
        lookup: dict = {}
        for ref in tbl:
            t = ray.get(ref)
            if t.num_rows == 0:
                continue
            for i, r, p in zip(
                t["node_id"].to_pylist(), t["repo"].to_pylist(), t["path"].to_pylist()
            ):
                lookup[(r, p)] = i
        nodes_ref = ray.put(lookup)
        return candidates_ds.map_batches(
            _NodeLookup,
            fn_constructor_kwargs={"nodes_ref": nodes_ref},
            batch_format="pyarrow",
            concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
        )
    # scale path: two hash joins on (repo, path)
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


def dedup_edges(edge_ds, num_partitions: int | None = None):
    """M6 — canonical simple digraph: per-block pre-dedup (combiner),
    then a global distinct on the packed 64-bit key (one shuffle),
    unpacked back to (src, dst).  Output sorted by (src, dst)."""
    packed = edge_ds.map_batches(_block_dedup, batch_format="pyarrow")
    distinct = packed.groupby("edge_key").count().drop_columns(["count()"])
    return distinct.map_batches(_unpack, batch_format="pyarrow").sort(["src", "dst"])


def symmetrize(edge_ds):
    """A7 — undirected view: edges ∪ reversed(edges), deduped."""
    rev = edge_ds.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}), batch_format="pyarrow"
    )
    return dedup_edges(edge_ds.union(rev))
