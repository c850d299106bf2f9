"""M5 — deterministic node-id assignment (SURVEY.md section 2.2 M5).

node_id = rank of (repo, path) in global lexicographic order — stable,
reproducible at any parallelism, no randomness.

Distributed recipe (no row data ever touches the driver):
  1. ``sort(["repo", "path"])`` — Ray Data range-partitioned sort.
  2. per-block row counts via tiny remote tasks over block refs (only
     ints return to the driver),
  3. cumulative offsets broadcast back; each block gets
     ``node_id = offset + arange(len(block))`` in a remote task,
  4. reassembled with ``ray.data.from_arrow_refs``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _with_ids(tbl: pa.Table, offset: int) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
    return tbl.add_column(0, "node_id", ids)


def assign_node_ids(corpus_ds, sort_partitions: int | None = None) -> tuple["ray.data.Dataset", int]:
    """corpus Dataset -> (nodes Dataset (node_id, repo, path), n_nodes).

    The nodes table is metadata-sized relative to the corpus (no
    content column), so materializing its *block refs* is cheap; the
    blocks themselves stay in the object store.

    sort_partitions: the (repo, path) projection is coalesced to this
    many blocks before the sort.  Ray's sort parallelism follows input
    block count, and the corpus reader sizes blocks by SESSION CPUs —
    at 32 CPUs that meant 72 sort partitions of ~10k short string rows
    each, where per-partition overhead dominated (measured 3.2s -> 1.3s
    at 600k nodes by capping to 16).  The default (16) is sized for the
    metadata tier (<= ~10M nodes at ~50 B/row); size it by DATA
    (~1 partition per 500k rows) when the file count is genuinely
    large — NOT by CPU count, which only multiplies per-partition
    fixed costs on a small table."""
    sel = corpus_ds.select_columns(["repo", "path"])
    sorted_ds = (
        sel.repartition(sort_partitions or 16).sort(["repo", "path"]).materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    n = int(sum(counts))
    new_refs = [_with_ids.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(new_refs), n
