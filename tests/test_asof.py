"""As-of join: vectorized bucket kernel vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import ray


def _brute_asof(left, right):
    """O(n*m) reference: latest right row strictly (ts, order)-before."""
    out = []
    for lk, lts, lo in left:
        best = None
        for rk, rts, ro, rv in right:
            if rk != lk:
                continue
            if (rts, ro) < (lts, lo) and (best is None or (rts, ro) > best[0]):
                best = ((rts, ro), rv)
        out.append(best[1] if best else None)
    return out


def _random_case(seed, n_left=400, n_right=120, n_keys=7):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, n_keys, n_left).astype(np.int64)
    lts = rng.integers(0, 50, n_left).astype(np.int64)  # many ts ties
    rk = rng.integers(0, n_keys, n_right).astype(np.int64)
    rts = rng.integers(0, 50, n_right).astype(np.int64)
    lo = np.arange(n_left, dtype=np.int64)
    ro = np.arange(10_000, 10_000 + n_right, dtype=np.int64)
    rv = ro * 3
    return (lk, lts, lo), (rk, rts, ro, rv)


def test_asof_matches_bruteforce_with_ties():
    from fora_ray.pipelines.asof import asof_join_latest

    (lk, lts, lo), (rk, rts, ro, rv) = _random_case(2)
    left = ray.data.from_arrow(pa.table({"k": lk, "ts": lts, "oid": lo}))
    right = ray.data.from_arrow(pa.table({"k": rk, "ts": rts, "oid": ro, "v": rv}))
    got = (
        asof_join_latest(left, right, key="k", ts_col="ts", order_col="oid",
                         value_col="v", out_col="av")
        .to_pandas().sort_values("oid").reset_index(drop=True)
    )
    want = _brute_asof(list(zip(lk, lts, lo)), list(zip(rk, rts, ro, rv)))
    got_vals = [None if v is None or (isinstance(v, float) and np.isnan(v)) else int(v)
                for v in got["av"].tolist()]
    assert got_vals == want


def test_asof_strict_self_exclusion():
    """A row present on both sides never matches itself."""
    from fora_ray.pipelines.asof import asof_join_latest

    t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "ts": pa.array([10, 20, 30], pa.int64()),
                  "oid": pa.array([0, 1, 2], pa.int64())})
    ds = ray.data.from_arrow(t)
    right = ds.map_batches(lambda b: b.append_column("v", b["oid"]),
                           batch_format="pyarrow")
    got = (
        asof_join_latest(ds, right, key="k", ts_col="ts", order_col="oid",
                         value_col="v", out_col="prev")
        .to_pandas().sort_values("oid")
    )
    prev = got["prev"].tolist()
    assert (np.isnan(prev[0]) or prev[0] is None)
    assert prev[1] == 0 and prev[2] == 1


def test_asof_empty_right():
    from fora_ray.pipelines.asof import asof_join_latest

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                         "ts": pa.array([5, 6], pa.int64()),
                                         "oid": pa.array([0, 1], pa.int64())}))
    right = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                          "ts": pa.array([], pa.int64()),
                                          "oid": pa.array([], pa.int64()),
                                          "v": pa.array([], pa.int64())}))
    got = asof_join_latest(left, right, key="k", ts_col="ts", order_col="oid",
                           value_col="v").to_pandas()
    assert len(got) == 2 and got["asof_value"].isna().all()
