"""Range join: banded searchsorted kernel vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from fora_ray.pipelines.interval import range_join
from fora_ray.stages.shuffle import sum_by_key


def _case(seed, nl=800, nr=200, span=500, max_w=60):
    rng = np.random.default_rng(seed)
    x = rng.integers(-span, span, nl).astype(np.int64)
    lo = rng.integers(-span - 50, span + 50, nr).astype(np.int64)
    # widths include 0 and negatives -> empty intervals must match nothing
    hi = lo + rng.integers(-2, max_w, nr).astype(np.int64)
    left = pa.table({"pid": pa.array(np.arange(nl)), "x": pa.array(x)})
    right = pa.table({"iid": pa.array(np.arange(nr) + 10_000),
                      "lo": pa.array(lo), "hi": pa.array(hi)})
    return left, right, x, lo, hi


def _brute(x, lo, hi, closed):
    out = []
    for i in range(lo.size):
        m = (x >= lo[i]) & ((x <= hi[i]) if closed == "both" else (x < hi[i]))
        out.extend((int(p), 10_000 + i) for p in np.nonzero(m)[0])
    return sorted(out)


@pytest.mark.parametrize("closed", ["left", "both"])
@pytest.mark.parametrize("band_width", [None, 7, 100_000])
def test_range_join_matches_brute_force(ray_session, closed, band_width):
    left, right, x, lo, hi = _case(11)
    res = range_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3),
        on="x", lo_col="lo", hi_col="hi",
        band_width=band_width, closed=closed,
    ).take_all()
    got = sorted((r["pid"], r["iid"]) for r in res)
    assert got == _brute(x, lo, hi, closed)


def test_range_join_pair_fn_partials_equal_full_aggregate(ray_session):
    left, right, x, lo, hi = _case(23)

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"iid": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uk, c = np.unique(t["iid"].to_numpy(zero_copy_only=False),
                          return_counts=True)
        return pa.table({"iid": pa.array(uk), "n": pa.array(c.astype(np.int64))})

    part = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                      on="x", lo_col="lo", hi_col="hi", band_width=13,
                      pair_fn=agg)
    got = {r["iid"]: r["n"] for r in sum_by_key(part, "iid", ["n"]).take_all()}
    exp: dict[int, int] = {}
    for _, i in _brute(x, lo, hi, "left"):
        exp[i] = exp.get(i, 0) + 1
    assert got == exp


def test_range_join_timestamps_and_empty_sides(ray_session):
    ts = pa.array(np.array([0, 1, 2, 3], "int64") * 86_400_000_000).cast(
        pa.timestamp("us"))
    left = pa.table({"eid": pa.array([1, 2, 3, 4]), "t": ts})
    right = pa.table({
        "wid": pa.array([9]),
        "wlo": pa.array(np.array([0], "int64")).cast(pa.timestamp("us")),
        "whi": pa.array(np.array([2 * 86_400_000_000], "int64")).cast(
            pa.timestamp("us")),
    })
    out = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     on="t", lo_col="wlo", hi_col="whi").take_all()
    assert sorted(r["eid"] for r in out) == [1, 2]
    # boundary point: hi inclusive under closed='both'
    out = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     on="t", lo_col="wlo", hi_col="whi", closed="both").take_all()
    assert sorted(r["eid"] for r in out) == [1, 2, 3]
    # empty right side -> no pairs, no crash
    out = range_join(ray.data.from_arrow(left),
                     ray.data.from_arrow(right.slice(0, 0)),
                     on="t", lo_col="wlo", hi_col="whi").take_all()
    assert out == []


def test_range_join_rejects_overlapping_names_and_bad_closed(ray_session):
    t = pa.table({"x": pa.array([1]), "lo": pa.array([0]), "hi": pa.array([2])})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="disjoint"):
        range_join(ds, ds, on="x", lo_col="lo", hi_col="hi")
    with pytest.raises(ValueError, match="closed"):
        range_join(ds, ray.data.from_arrow(t.rename_columns(["a", "b", "c"])),
                   on="x", lo_col="b", hi_col="c", closed="right")
