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
