"""H1 — partitioned CSR shard construction (SURVEY.md section 2.3 H1).

Vertex partition function: ``part(v) = v % P`` with local index
``v // P`` — computable everywhere without a lookup table, which is what
lets frontier messages be routed with two vectorized integer ops at any
scale.  Degree balancing is layered on top by GraphHandle
(``balance='degree'`` in graph/runtime.py): engine ids are the
degree-descending rank of the logical ids, so mod-P deals hubs
round-robin and each shard carries ~equal edge mass.

Shard layout (one Arrow row per partition):
  part_id:int32, indptr:large_list<int64> (len n_local+1),
  indices:large_list<int64> (global dst ids, grouped by local src)

Built with one hash shuffle: edges -> add part_id -> groupby(part_id)
-> map_groups(build).  Persisted as Parquet for resumable graph loads.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def n_local_of(n: int, P: int, p: int) -> int:
    return (n - p + P - 1) // P if p < n else 0


def _large_list(values: np.ndarray) -> pa.LargeListArray:
    return pa.LargeListArray.from_arrays(
        pa.array([0, len(values)], pa.int64()), pa.array(values, pa.int64())
    )


def build_csr_table(src: np.ndarray, dst: np.ndarray, n: int, P: int, p: int,
                    dst_l: np.ndarray | None = None) -> pa.Table:
    """CSR for one partition from its (src, dst[, dst_logical]) edge
    arrays.  dst_l (the LOGICAL id of each engine dst) rides along as a
    parallel ind_logical list — what lets walk/sample draws stay a pure
    function of the logical graph on the distributed-permutation tier,
    where no worker can hold the O(n) inverse array."""
    n_local = n_local_of(n, P, p)
    loc = src // P
    order = np.lexsort((dst, loc))
    loc_s, dst_s = loc[order], dst[order]
    counts = np.bincount(loc_s, minlength=n_local)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    cols = {
        "part_id": pa.array([p], pa.int32()),
        "indptr": _large_list(indptr),
        "indices": _large_list(dst_s.astype(np.int64)),
    }
    if dst_l is not None:
        cols["ind_logical"] = _large_list(dst_l[order].astype(np.int64))
    return pa.table(cols)


def build_csr_shards(edges_ds, n: int, P: int):
    """edges Dataset -> Dataset of P CSR shard rows (one groupby
    shuffle).  An optional dst_l column (logical dst ids) is carried
    through into ind_logical."""

    def add_part(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        return batch.append_column("part_id", pa.array((src % P).astype(np.int32)))

    def build(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        dst_l = (group["dst_l"].to_numpy(zero_copy_only=False)
                 if "dst_l" in group.schema.names else None)
        return build_csr_table(src, dst, n, P, int(src[0] % P), dst_l=dst_l)

    return (
        edges_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(build, batch_format="pyarrow")
    )


def _build_weighted_group(group: pa.Table, n: int, P: int) -> pa.Table:
    """One weighted reverse-CSR shard row from its (src, dst, w) rows."""
    src = group["src"].to_numpy(zero_copy_only=False)
    dst = group["dst"].to_numpy(zero_copy_only=False)
    w = group["w"].to_numpy(zero_copy_only=False)
    p = int(src[0] % P)
    n_local = n_local_of(n, P, p)
    loc = src // P
    order = np.lexsort((dst, loc))
    counts = np.bincount(loc[order], minlength=n_local)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return pa.table({
        "part_id": pa.array([p], pa.int32()),
        "indptr": _large_list(indptr),
        "indices": _large_list(dst[order].astype(np.int64)),
        "weights": pa.LargeListArray.from_arrays(
            pa.array([0, len(w)], pa.int64()), pa.array(w[order], pa.float64())
        ),
    })


def build_weighted_reverse_shards(edges_ds, n: int, P: int, out_deg: "np.ndarray"):
    """CSR shards of the REVERSE graph with per-edge weights
    1/out_deg(original source) — the operand of backward push (G5):
    pushing r(v) sends (1-alpha)*r(v)/out_deg(u) to each in-neighbor u,
    i.e. a weighted push over reverse edges.  out_deg is the original
    graph's out-degree vector, broadcast once — the small-n fast path;
    build_weighted_reverse_shards_join is the degrees-join scale path."""
    import ray

    deg_ref = ray.put(out_deg.astype(np.float64))

    def rev_with_w(batch: pa.Table) -> pa.Table:
        deg = ray.get(deg_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = 1.0 / np.maximum(deg[src], 1.0)
        return pa.table({
            "src": pa.array(dst),  # reverse direction
            "dst": pa.array(src),
            "w": pa.array(w),
            "part_id": pa.array((dst % P).astype(np.int32)),
        })

    # dangling nodes get a self-loop (weight 1): backward push requires a
    # source-INdependent chain, so the reverse graph uses the standard
    # BiPPR dangling-self-loop convention (oracle: dangling='selfloop');
    # the forward engine's restart-to-source convention cannot be
    # expressed as a single backward pass.
    dang = np.nonzero(out_deg == 0)[0].astype(np.int64)
    self_loops = pa.table({
        "src": pa.array(dang),
        "dst": pa.array(dang),
        "w": pa.array(np.ones(dang.size)),
        "part_id": pa.array((dang % P).astype(np.int32)),
    })

    import ray as _ray

    rev = edges_ds.map_batches(rev_with_w, batch_format="pyarrow")
    if dang.size:
        rev = rev.union(_ray.data.from_arrow(self_loops))
    return rev.groupby("part_id").map_groups(
        lambda g: _build_weighted_group(g, n, P), batch_format="pyarrow"
    )


def build_weighted_reverse_shards_join(edges_ds, n: int, P: int,
                                       num_partitions: int | None = None):
    """Scale path for the weighted reverse CSR: the 1/out_deg edge
    weight is attached by a degrees hash join and the dangling self-loop
    set comes from a range anti-join — no O(n) driver array anywhere,
    so this works at the 10^12-node tier where the broadcast vector
    cannot exist."""
    import pyarrow.compute as pc
    import ray

    from .shuffle import count_by_key, safe_join

    deg_ds = count_by_key(
        edges_ds.select_columns(["src"]).rename_columns({"src": "node_id"}),
        "node_id", alias="deg",
    )
    rev = safe_join(
        edges_ds, deg_ds.rename_columns({"node_id": "s_id"}),
        on=("src",), right_on=("s_id",), num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table({
            "src": t["dst"],  # reverse direction
            "dst": t["src"],
            "w": pa.array(1.0 / np.maximum(
                t["deg"].to_numpy(zero_copy_only=False).astype(np.float64), 1.0)),
            "part_id": pa.array(
                (t["dst"].to_numpy(zero_copy_only=False) % P).astype(np.int32)),
        }),
        batch_format="pyarrow",
    )
    # dangling = ids 0..n-1 absent from the out-degree table
    ids = ray.data.range(n)  # column "id", lazy + distributed
    dang = safe_join(
        ids, deg_ds, on=("id",), right_on=("node_id",),
        join_type="left_outer", num_partitions=num_partitions,
    ).map_batches(
        lambda t: (lambda d: pa.table({
            "src": pa.array(d), "dst": pa.array(d),
            "w": pa.array(np.ones(d.size)),
            "part_id": pa.array((d % P).astype(np.int32)),
        }))(
            t.filter(pc.is_null(t["deg"]))["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ) if t.num_rows and "id" in t.schema.names else pa.table({
            "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
            "w": pa.array([], pa.float64()), "part_id": pa.array([], pa.int32()),
        }),
        batch_format="pyarrow",
    )
    return rev.union(dang).groupby("part_id").map_groups(
        lambda g: _build_weighted_group(g, n, P), batch_format="pyarrow"
    )


def save_shards(shards_ds, out_dir: str, n: int, m: int, P: int) -> str:
    """Persist shard rows + meta.json (resumable graph load, SURVEY 4.3)."""
    os.makedirs(out_dir, exist_ok=True)
    shards_ds.write_parquet(os.path.join(out_dir, "shards"))
    meta = {"n": n, "m": m, "P": P, "version": 1}
    tmp = os.path.join(out_dir, ".meta.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))
    return out_dir
