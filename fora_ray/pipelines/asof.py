"""As-of join — for each left row, attach the value of the LATEST right
row strictly before it (per key, by event time with a total-order
tie-break).  The classic time-series join Ray Data has no native
operator for (brief: "custom operators: as-of join, range join").

Ray-Data-first shape: both sides are harmonized to one schema, tagged
with a side bit and unioned (no join shuffle); keys are hash-bucketed
(`stages.shuffle.bucket_apply`, ~2x CPUs groups); ONE vectorized numpy
kernel per bucket lexsorts (key, ts, order, side) and forward-fills the
last-seen right row with a per-key-segment validity guard — millions of
keys per bucket cost one sort, not one group each.

Semantics (deterministic, SQL-expressible): for left row l, the match is
the right row r maximizing (r.ts, r.order) subject to
(r.ts, r.order) < (l.ts, l.order) and r.key = l.key; no match -> null.
Strictness means a row present on both sides never matches itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_int64(arr) -> np.ndarray:
    v = arr.to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def asof_join_latest(left_ds, right_ds, key: str, ts_col: str, order_col: str,
                     value_col: str, out_col: str = "asof_value", B: int | None = None):
    """Left columns + `out_col` (latest strictly-earlier right `value_col`
    per `key`, null when none).  `key` and `order_col` must be integer;
    `order_col` totally orders rows sharing a timestamp (unique ids);
    `value_col` must be int64-castable (carried through the union as a
    nullable int64 — generalize the `__rv` column to lift this)."""
    from ..stages.shuffle import bucket_apply

    sch = left_ds.schema()
    arrow_sch = getattr(sch, "base_schema", sch)
    left_names = list(arrow_sch.names)

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__side", pa.array(np.zeros(t.num_rows, np.int8)))
        return t.append_column("__rv", pa.nulls(t.num_rows, pa.int64()))

    def tag_right(t: pa.Table) -> pa.Table:
        out = {name: pa.nulls(t.num_rows, arrow_sch.field(name).type)
               for name in left_names}
        out[key] = t[key]
        out[ts_col] = t[ts_col]
        out[order_col] = t[order_col]
        tbl = pa.table({n: out[n] for n in left_names})
        tbl = tbl.append_column("__side", pa.array(np.ones(t.num_rows, np.int8)))
        return tbl.append_column("__rv", t[value_col].cast(pa.int64()))

    union = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    empty = pa.table(
        {n: pa.nulls(0, arrow_sch.field(n).type) for n in left_names}
        | {out_col: pa.nulls(0, pa.int64())}
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key not in g.schema.names:
            return empty
        k = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_int64(g[ts_col])
        order = g[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        side = g["__side"].to_numpy(zero_copy_only=False)
        # left rows precede right rows on exact (ts, order) ties, so the
        # forward fill below never lets a row see itself (strictness)
        perm = np.lexsort((side, order, ts, k))
        k_s, side_s = k[perm], side[perm]
        n = k_s.size
        # per-key segment starts (keys are contiguous after the sort)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k_s[1:] != k_s[:-1]
        seg_start = np.maximum.accumulate(np.where(new_key, np.arange(n), -1))
        # forward-fill the index of the last right row seen
        last_right = np.maximum.accumulate(np.where(side_s == 1, np.arange(n), -1))
        valid = last_right >= seg_start
        g_s = g.take(pa.array(perm))
        taken = g_s["__rv"].take(pa.array(np.where(valid, last_right, 0)))
        vals = pc.if_else(pa.array(valid), taken.combine_chunks(), pa.scalar(None, pa.int64()))
        is_left = side_s == 0
        out = g_s.filter(pa.array(is_left)).select(left_names)
        return out.append_column(out_col, vals.filter(pa.array(is_left)))

    return bucket_apply(union, key, kernel, B)
