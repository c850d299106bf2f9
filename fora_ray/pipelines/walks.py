"""Skip-gram training pairs from a random-walk corpus.

`random_walk_corpus` (graph/algorithms.py) emits the (walk_id, step,
node_id) trace table; this stage turns it into the (center, context,
cnt) co-occurrence counts a skip-gram embedding trainer (DeepWalk /
node2vec) consumes — pairs of nodes at step distance 1..window within
the same walk, both directions, aggregated.

Shuffle shape (two bucketed exchanges, no Dataset.join):
1. walks are hash-bucketed by walk_id (~2x CPUs groups); ONE vectorized
   kernel per bucket lexsorts its walks by (walk_id, step) and pairs
   rows at offsets 1..window with partial per-bucket counts — a walk is
   never split, so pairing is local and exact.
2. partial counts are hash-bucketed by center and summed — every row of
   a center lands in one bucket, so per-bucket aggregation is global.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.shuffle import bucket_apply

_EMPTY = pa.table({
    "center": pa.array([], pa.int64()),
    "context": pa.array([], pa.int64()),
    "cnt": pa.array([], pa.int64()),
})


def _pair_counts(c: np.ndarray, x: np.ndarray) -> pa.Table:
    """Aggregate (center, context) multiplicities via lexsort + run-length
    (full int64 range — no 2^32 packing)."""
    if c.size == 0:
        return _EMPTY
    order = np.lexsort((x, c))
    c, x = c[order], x[order]
    new = np.empty(c.size, dtype=bool)
    new[0] = True
    new[1:] = (c[1:] != c[:-1]) | (x[1:] != x[:-1])
    idx = np.nonzero(new)[0]
    return pa.table({
        "center": pa.array(c[idx]),
        "context": pa.array(x[idx]),
        "cnt": pa.array(np.diff(np.append(idx, c.size)).astype(np.int64)),
    })


def skipgram_pairs(corpus_ds, window: int = 2):
    """(center, context, cnt) skip-gram co-occurrence counts over a
    (walk_id, step, node_id) corpus Dataset.  A pair is counted once per
    (walk, ordered position pair) with 1 <= |step delta| <= window —
    exactly the SQL self-join ``a.walk_id = b.walk_id AND a.step <>
    b.step AND abs(a.step - b.step) <= window`` (the driver oracle)."""
    if window < 1:
        raise ValueError("window must be >= 1")

    def gen_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "walk_id" not in g.schema.names:
            return _EMPTY
        wid = g["walk_id"].to_numpy(zero_copy_only=False)
        step = g["step"].to_numpy(zero_copy_only=False)
        node = g["node_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((step, wid))
        wid, step, node = wid[order], step[order], node[order]
        cs, xs = [], []
        for d in range(1, window + 1):
            if node.size <= d:
                break
            ok = (wid[d:] == wid[:-d]) & ((step[d:] - step[:-d]) == d)
            a, b = node[:-d][ok], node[d:][ok]
            cs.extend((a, b))  # both directions: (earlier, later) + swap
            xs.extend((b, a))
        if not cs:
            return _EMPTY
        return _pair_counts(np.concatenate(cs), np.concatenate(xs))

    partial = bucket_apply(corpus_ds, "walk_id", gen_pairs)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "center" not in g.schema.names:
            return _EMPTY
        c = g["center"].to_numpy(zero_copy_only=False)
        x = g["context"].to_numpy(zero_copy_only=False)
        n = g["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((x, c))
        c, x, n = c[order], x[order], n[order]
        new = np.empty(c.size, dtype=bool)
        new[0] = True
        new[1:] = (c[1:] != c[:-1]) | (x[1:] != x[:-1])
        idx = np.nonzero(new)[0]
        return pa.table({
            "center": pa.array(c[idx]),
            "context": pa.array(x[idx]),
            "cnt": pa.array(np.add.reduceat(n, idx).astype(np.int64)),
        })

    return bucket_apply(partial, "center", merge)
