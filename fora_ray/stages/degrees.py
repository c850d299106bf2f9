"""M7 — degree computation (SURVEY.md section 2.2 M7).

Shuffle-light recipe: per-block partial bincounts (combiner) emit one
row per *touched* node per block; zero rows for every node are unioned
in from the nodes table; a single groupby-sum produces the zero-filled
degree table.  No join needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _partials(batch: pa.Table) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    sv, sc = np.unique(src, return_counts=True)
    dv, dc = np.unique(dst, return_counts=True)
    node = np.concatenate([sv, dv])
    outd = np.concatenate([sc, np.zeros_like(dc)])
    ind = np.concatenate([np.zeros_like(sc), dc])
    return pa.table(
        {
            "node_id": pa.array(node.astype(np.int64)),
            "out_deg": pa.array(outd.astype(np.int64)),
            "in_deg": pa.array(ind.astype(np.int64)),
        }
    )


def _zeros(batch: pa.Table) -> pa.Table:
    z = pa.array(np.zeros(batch.num_rows, dtype=np.int64))
    return pa.table({"node_id": batch["node_id"], "out_deg": z, "in_deg": z})


def compute_degrees(edges_ds, nodes_ds):
    """edges (src,dst) + nodes -> (node_id, out_deg, in_deg), zero-filled.
    Bucketed hash-groupby (stages/shuffle.py); output order undefined —
    callers sort when presenting."""
    from .shuffle import sum_by_key

    partials = edges_ds.map_batches(_partials, batch_format="pyarrow")
    zeros = nodes_ds.select_columns(["node_id"]).map_batches(_zeros, batch_format="pyarrow")
    return sum_by_key(partials.union(zeros), "node_id", ["out_deg", "in_deg"])
