"""Range (interval) join — match each left row whose point column falls
inside a right row's [lo, hi) interval.  The second custom operator the
brief names alongside as-of join ("custom operators: as-of join, range
join, windowed aggregate"); Ray Data has no native non-equi join.

Ray-Data-first shape (same family as pipelines/asof.py): no Dataset.join
at all.  Both sides are harmonized to one schema and unioned; intervals
are EXPLODED to every band of width `band_width` they overlap (bounded
replication: ceil(width / band_width) + 1 copies), points carry their
single band; `stages.shuffle.bucket_apply` hash-shuffles on the band and
ONE vectorized kernel per bucket sorts the points once and finds every
interval's members with two `np.searchsorted` calls — no per-interval or
per-band Python loop.

Duplicate-free by construction: each interval copy is CLAMPED to its own
band `[b*w, (b+1)*w)` before the search, and a point belongs to exactly
one band, so a (point, interval) pair can only be emitted by the single
band copy that contains the point.

Scale notes: `band_width` defaults to the max interval width (one cheap
column scan over the right side), which bounds replication at 2 copies
per interval; a caller with few giant intervals and many small ones
should pass a smaller width explicitly (more copies, but bands — and
hence join partitions — stay balanced).  `pair_fn` lets distributive
aggregates (count / sum per interval key) fold into the bucket kernel so
the full pair set never hits the shuffle — finish with a small
`sum_by_key` over the partials (a key's interval can span bands in
different buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _int64_col(arr) -> np.ndarray:
    """Numeric / timestamp column -> int64 numpy (us for timestamps)."""
    v = arr.to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def _max_interval_width(right_ds, lo_col: str, hi_col: str) -> int:
    """One streaming column scan for max(hi - lo); tiny per-block partials."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or lo_col not in t.schema.names:
            return pa.table({"w": pa.array([], pa.int64())})
        w = _int64_col(t[hi_col]) - _int64_col(t[lo_col])
        return pa.table({"w": pa.array([int(w.max(initial=0))])})

    parts = right_ds.map_batches(partial, batch_format="pyarrow").take_all()
    return max((p["w"] for p in parts), default=0)


def range_join(left_ds, right_ds, on: str, lo_col: str, hi_col: str,
               band_width: int | None = None, closed: str = "left",
               B: int | None = None, pair_fn=None):
    """Inner range join: rows (left ++ right) where
    ``right.lo <= left.on < right.hi`` (``closed='left'``, default) or
    ``right.lo <= left.on <= right.hi`` (``closed='both'``).

    `on` / `lo_col` / `hi_col` must be integer or timestamp columns;
    left and right column names must be disjoint.  Empty intervals
    (hi <= lo under 'left', hi < lo under 'both') match nothing.
    `pair_fn` (pa.Table -> pa.Table), if given, runs on each bucket's
    joined pairs INSIDE the shuffle kernel (it must accept an empty
    table and return a stable schema) — use it for partial aggregates.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    from ..stages.shuffle import bucket_apply

    l_sch = left_ds.schema()
    l_arrow = getattr(l_sch, "base_schema", l_sch)
    r_sch = right_ds.schema()
    r_arrow = getattr(r_sch, "base_schema", r_sch)
    left_names = list(l_arrow.names)
    right_names = list(r_arrow.names)
    overlap = set(left_names) & set(right_names)
    if overlap:
        raise ValueError(f"left/right column names must be disjoint: {sorted(overlap)}")

    w = int(band_width) if band_width else _max_interval_width(right_ds, lo_col, hi_col)
    w = max(w, 1)
    incl_hi = closed == "both"

    def _nulls(names, sch, n):
        return {name: pa.nulls(n, sch.field(name).type) for name in names}

    def tag_left(t: pa.Table) -> pa.Table:
        x = _int64_col(t[on])
        cols = {n: t[n] for n in left_names}
        cols.update(_nulls(right_names, r_arrow, t.num_rows))
        cols["__x"] = pa.array(x)
        cols["__lo"] = pa.nulls(t.num_rows, pa.int64())
        cols["__hi"] = pa.nulls(t.num_rows, pa.int64())
        cols["__band"] = pa.array(x // w)
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        lo = _int64_col(t[lo_col])
        hi = _int64_col(t[hi_col])
        # last point an interval can contain (both bounds made inclusive)
        last = hi if incl_hi else hi - 1
        keep = last >= lo
        b0, b1 = lo // w, last // w
        reps = np.where(keep, b1 - b0 + 1, 0)
        total = int(reps.sum())
        row_idx = np.repeat(np.arange(t.num_rows), reps)
        cum = np.cumsum(reps)
        band = np.repeat(b0, reps) + (np.arange(total) - np.repeat(cum - reps, reps))
        tt = t.take(pa.array(row_idx))
        cols = _nulls(left_names, l_arrow, total)
        cols.update({n: tt[n] for n in right_names})
        cols["__x"] = pa.nulls(total, pa.int64())
        cols["__lo"] = pa.array(lo[row_idx])
        cols["__hi"] = pa.array(hi[row_idx])
        cols["__band"] = pa.array(band)
        cols["__side"] = pa.array(np.ones(total, np.int8))
        return pa.table(cols)

    union = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    empty_pairs = pa.table(
        {n: pa.nulls(0, l_arrow.field(n).type) for n in left_names}
        | {n: pa.nulls(0, r_arrow.field(n).type) for n in right_names}
    )
    empty_out = pair_fn(empty_pairs) if pair_fn is not None else empty_pairs

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__side" not in g.schema.names:
            return empty_out
        side = g["__side"].to_numpy(zero_copy_only=False)
        is_left = side == 0
        lt = g.filter(pa.array(is_left))
        rt = g.filter(pa.array(~is_left))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty_out
        xs = lt["__x"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(xs, kind="stable")
        xs_s = xs[order]
        lo = rt["__lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = rt["__hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        band = rt["__band"].to_numpy(zero_copy_only=False).astype(np.int64)
        b_lo, b_hi = band * w, (band + 1) * w
        lo_c = np.maximum(lo, b_lo)
        idx_lo = np.searchsorted(xs_s, lo_c, side="left")
        hi_c = np.minimum(hi, b_hi)
        idx_hi = np.searchsorted(xs_s, hi_c, side="left")
        if incl_hi:
            # hi itself is in THIS band -> include x == hi; otherwise the
            # band boundary stays exclusive (the next band copy owns it)
            own = hi < b_hi
            if own.any():
                idx_hi[own] = np.searchsorted(xs_s, hi[own], side="right")
        counts = np.maximum(idx_hi - idx_lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty_out
        i_int = np.repeat(np.arange(rt.num_rows), counts)
        cum = np.cumsum(counts)
        pos = np.arange(total) - np.repeat(cum - counts, counts)
        i_pt = order[np.repeat(idx_lo, counts) + pos]
        lt_sel = lt.select(left_names).take(pa.array(i_pt))
        rt_sel = rt.select(right_names).take(pa.array(i_int))
        pairs = pa.table(
            {n: lt_sel[n] for n in left_names} | {n: rt_sel[n] for n in right_names}
        )
        return pair_fn(pairs) if pair_fn is not None else pairs

    return bucket_apply(union, "__band", kernel, B)
