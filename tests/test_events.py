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
