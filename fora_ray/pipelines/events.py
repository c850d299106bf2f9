"""Windowed aggregates over an event log (events table: event_id, ts,
user_id, event_type, value, props).

Ray Data has no event-time windowing; the batch equivalents follow the
ordered-partitioned-log pattern: assign a window key per row
(vectorized), then aggregate — a tumbling window is just a groupby on
the bucketed timestamp (SQL-expressible, oracled); session windows are
a hash-bucketed Arrow kernel over (user, ts)-sorted runs.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Mean, Sum


def tumbling_window(events_ds, window_s: int = 3600):
    """Per (window_start, event_type): count + value sum/mean.
    Deterministic; matches the DuckDB oracle
    ``GROUP BY time_bucket / date_trunc`` exactly."""

    def add_window(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        w = (ts // (window_s * 1_000_000)) * (window_s * 1_000_000)
        return t.append_column("window_start", pa.array(w.astype("datetime64[us]")))

    return (
        events_ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
            Mean("value", alias_name="avg_value"),
        )
    )


def sliding_window_counts(events_ds, window_s: int = 3600, slide_s: int = 900):
    """Sliding windows via explode: each event lands in
    window_s/slide_s hops (vectorized repeat)."""
    hops = max(window_s // slide_s, 1)

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = (ts // (slide_s * 1_000_000)) * (slide_s * 1_000_000)
        starts = base[:, None] - np.arange(hops)[None, :] * (slide_s * 1_000_000)
        keep = (ts[:, None] - starts) < (window_s * 1_000_000)
        rows = np.repeat(np.arange(len(ts)), hops)[keep.ravel()]
        w = starts.ravel()[keep.ravel()]
        vals = t["value"].to_numpy(zero_copy_only=False)[rows]
        return pa.table({
            "window_start": pa.array(w.astype("datetime64[us]")),
            "value": pa.array(vals),
        })

    return (
        events_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


def session_windows(events_ds, gap_s: int = 1800):
    """Per-user sessionization: events sorted by ts; a gap > gap_s starts
    a new session.  Output: one row per session.

    Shuffle shape: users are HASH-BUCKETED (~2x CPUs groups), and one
    vectorized Arrow/numpy kernel handles ALL users in a bucket —
    lexsort by (user, ts), a boundary wherever the user changes or the
    gap exceeds gap_s, then reduceat per session.  The previous
    one-pandas-frame-per-user map_groups meant millions of tiny groups
    at scale and was the last pandas stage in the repo (VERDICT r02 #4)."""
    from ..stages.shuffle import bucket_apply

    gap_us = gap_s * 1_000_000
    _empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "session_start": pa.array([], pa.timestamp("us")),
        "session_end": pa.array([], pa.timestamp("us")),
        "n_events": pa.array([], pa.int64()),
        "sum_value": pa.array([], pa.float64()),
    })

    def sessions(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "user_id" not in g.schema.names:
            return _empty
        user = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        val = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ts, user))
        user, ts, val = user[order], ts[order], val[order]
        new = np.empty(user.size, dtype=bool)
        new[0] = True
        new[1:] = (user[1:] != user[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        idx = np.nonzero(new)[0]
        ends = np.append(idx[1:], user.size) - 1
        return pa.table({
            "user_id": pa.array(user[idx]),
            "session_start": pa.array(ts[idx].astype("datetime64[us]")),
            "session_end": pa.array(ts[ends].astype("datetime64[us]")),
            "n_events": pa.array(np.diff(np.append(idx, user.size)).astype(np.int64)),
            "sum_value": pa.array(np.add.reduceat(val, idx)),
        })

    return bucket_apply(events_ds, "user_id", sessions)


def parse_props(events_ds, keys: list[str]):
    """Extract JSON fields from the props string column (per-batch
    json.loads loop; schema = requested keys as strings)."""

    def parse(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in keys}
        for p in t["props"].to_pylist():
            try:
                d = json.loads(p) if p else {}
            except (ValueError, TypeError):
                d = {}
            for k in keys:
                v = d.get(k)
                cols[k].append(None if v is None else str(v))
        out = pa.table({"event_id": t["event_id"]})
        for k in keys:
            out = out.append_column(f"props_{k}", pa.array(cols[k], pa.string()))
        return out

    return events_ds.map_batches(parse, batch_format="pyarrow")


def top_users_by_value(events_ds, k: int = 10):
    """Per-user value sum, top-k (deterministic tie-break on user_id)."""
    agg = events_ds.groupby("user_id").aggregate(
        Sum("value", alias_name="sum_value"), Count(alias_name="n_events")
    )
    return agg.sort(["sum_value", "user_id"], descending=[True, False]).limit(k)


def funnel(events_ds, steps: list[str], window_s: int = 86400):
    """Strict-sequence funnel analysis: how many users complete step 1
    (first event of type steps[0]), then step 2 (first steps[1] event
    at-or-after their step-1 time), ... all within `window_s` of the
    user's FUNNEL START (the step-1 timestamp).  The standard product
    conversion query.

    Shuffle shape: one column-pruned filter pass (only funnel-step
    rows survive), users hash-bucketed like session_windows, one
    vectorized kernel per bucket (lexsort + per-step minimum.at over
    dense user indices — K tiny passes, no per-user Python), then a
    driver-side reduce of the (buckets x K)-row partials —
    scale-independent.  Returns a pa.Table (step:int64 1-based,
    event_type, users:int64) sorted by step — users is monotone
    non-increasing.
    """
    from ..stages.shuffle import bucket_apply, drop_empty_blocks

    if not steps or len(set(steps)) != len(steps):
        raise ValueError("funnel: steps must be non-empty and distinct")
    win_us = int(window_s) * 1_000_000
    K = len(steps)
    _empty = pa.table({
        "step": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "users": pa.array([], pa.int64()),
    })

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "event_type": pa.array([], pa.string())})
        m = pc.is_in(t["event_type"], value_set=pa.array(steps))
        return t.select(["user_id", "ts", "event_type"]).filter(m)

    step_of = {s: i for i, s in enumerate(steps)}

    def kern(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "user_id" not in g.schema.names:
            return _empty
        user = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        sid = np.array([step_of[x] for x in g["event_type"].to_pylist()],
                       dtype=np.int64)
        order = np.lexsort((ts, user))
        user, ts, sid = user[order], ts[order], sid[order]
        new = np.empty(user.size, dtype=bool)
        new[0] = True
        new[1:] = user[1:] != user[:-1]
        uidx = np.cumsum(new) - 1
        U = int(uidx[-1]) + 1
        big = np.iinfo(np.int64).max
        counts = np.zeros(K, np.int64)
        prev = np.full(U, big)
        deadline = np.full(U, big)
        for s in range(K):
            m = sid == s
            if s == 0:
                cur = np.full(U, big)
                np.minimum.at(cur, uidx[m], ts[m])
                deadline = np.where(cur < big, cur + win_us, big)
            else:
                ok = m & (prev[uidx] < big) & (ts >= prev[uidx]) & (ts <= deadline[uidx])
                cur = np.full(U, big)
                np.minimum.at(cur, uidx[ok], ts[ok])
            counts[s] = int((cur < big).sum())
            prev = cur
        return pa.table({
            "step": pa.array(np.arange(1, K + 1, dtype=np.int64)),
            "event_type": pa.array(steps, pa.string()),
            "users": pa.array(counts),
        })

    import ray

    partials = bucket_apply(
        events_ds.map_batches(keep, batch_format="pyarrow"), "user_id", kern)
    # each bucket emits exactly K rows -> the reduce input is (buckets x
    # K) rows, scale-independent: sum on the driver (also keeps the
    # zero-matching-events case schema-stable, where a Dataset groupby
    # would see only schema-less empty blocks)
    counts = np.zeros(K, np.int64)
    for ref in drop_empty_blocks(partials, schema=_empty.schema).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "users" not in t.schema.names:
            continue
        # np.add.at: a block concatenates many buckets' K-row outputs,
        # so step indices repeat — fancy-index += would drop duplicates
        np.add.at(counts, t["step"].to_numpy(zero_copy_only=False) - 1,
                  t["users"].to_numpy(zero_copy_only=False))
    return pa.table({
        "step": pa.array(np.arange(1, K + 1, dtype=np.int64)),
        "event_type": pa.array(steps, pa.string()),
        "users": pa.array(counts),
    })
