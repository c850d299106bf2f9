"""Windowed aggregates over the events table vs DuckDB / pandas oracles."""

import duckdb
import numpy as np
import pandas as pd
import ray

from fora_ray.pipelines.events import (
    parse_props,
    session_windows,
    sliding_window_counts,
    top_users_by_value,
    tumbling_window,
)

SF = "/root/testdata/sf0.001"


def _events():
    return ray.data.read_parquet(f"{SF}/events.parquet")


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_tumbling_matches_duckdb():
    got = tumbling_window(_events(), window_s=3600).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(value) AS sum_value, avg(value) AS avg_value
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2
        """
    ).df()
    a, b = _norm(got), _norm(want)
    assert len(a) == len(b)
    for c in ["window_start", "event_type", "n_events"]:
        assert (a[c].values == b[c].values).all()
    assert np.allclose(a["sum_value"], b["sum_value"])
    assert np.allclose(a["avg_value"], b["avg_value"])


def test_sliding_window():
    got = sliding_window_counts(_events(), window_s=3600, slide_s=1800).to_pandas()
    # every event lands in exactly window/slide hops
    n_events = _events().count()
    assert got["n_events"].sum() == 2 * n_events


def test_sessions_match_pandas():
    got = session_windows(_events(), gap_s=1800).to_pandas()
    raw = _events().to_pandas()
    want_rows = 0
    for uid, g in raw.groupby("user_id"):
        ts = g.sort_values("ts")["ts"].astype("int64").to_numpy()
        want_rows += 1 + int((np.diff(ts) > 1800 * 1_000_000).sum())
    assert len(got) == want_rows
    assert got["n_events"].sum() == len(raw)


def test_parse_props():
    out = parse_props(_events(), keys=["k"]).to_pandas()
    assert out["props_k"].notna().all()
    assert out["props_k"].str.isnumeric().all()


def test_top_users_matches_duckdb():
    got = top_users_by_value(_events(), k=5).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT user_id, sum(value) AS sum_value, CAST(count(*) AS BIGINT) AS n_events
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1 ORDER BY sum_value DESC, user_id LIMIT 5
        """
    ).df()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert np.allclose(got["sum_value"], want["sum_value"])


def test_funnel_hand_case():
    """Hand-built users: one completes all 3 steps in order, one clicks
    BEFORE viewing (step 2 not counted), one views only, one converts
    outside the window."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray

    from fora_ray.pipelines.events import funnel

    us = 1_000_000

    def ts(sec):
        return np.datetime64("2026-01-01T00:00:00", "us") + np.timedelta64(sec * us, "us")

    rows = [
        # user 1: view @0, click @10, purchase @20 -> completes all
        (1, ts(0), "view"), (1, ts(10), "click"), (1, ts(20), "purchase"),
        # user 2: click @0 BEFORE view @10 -> stops at step 1
        (2, ts(0), "click"), (2, ts(10), "view"),
        # user 3: view only
        (3, ts(0), "view"),
        # user 4: view @0, click past the 60 s window
        (4, ts(0), "view"), (4, ts(120), "click"),
        # user 5: never views; clicks/purchases don't count
        (5, ts(0), "click"), (5, ts(1), "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    out = funnel(ray.data.from_arrow(t), ["view", "click", "purchase"],
                 window_s=60).to_pandas()
    assert out["step"].tolist() == [1, 2, 3]
    assert out["event_type"].tolist() == ["view", "click", "purchase"]
    assert out["users"].tolist() == [4, 1, 1]
    with pytest.raises(ValueError, match="distinct"):
        funnel(ray.data.from_arrow(t), ["view", "view"])
    # zero matching events: K rows of 0, not a schema crash
    zero = funnel(ray.data.from_arrow(t), ["signup", "error"],
                  window_s=60).to_pandas()
    assert zero["users"].tolist() == [0, 0]
