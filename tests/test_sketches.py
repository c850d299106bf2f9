"""Mergeable sketches: HLL distinct + CMS-prefiltered exact heavy hitters."""

import numpy as np
import pyarrow as pa
import ray


def _skewed_table(n=20_000, n_keys=400, seed=3):
    rng = np.random.default_rng(seed)
    # zipf-ish skew: a few keys dominate
    keys = (rng.zipf(1.3, size=n) % n_keys).astype(np.int64)
    return pa.table({"k": pa.array(keys), "s": pa.array([f"key_{v}" for v in keys])})


def test_hll_error_bound_and_partition_invariance():
    from fora_ray.pipelines.sketches import hll_distinct

    n = 50_000
    ds = ray.data.from_arrow(pa.table({"k": pa.array(np.arange(n, dtype=np.int64))}))
    est = hll_distinct(ds, "k", p=12)
    # 3 sigma of 1.04/sqrt(4096) = 4.9%
    assert abs(est - n) / n < 0.05
    assert hll_distinct(ds.repartition(17), "k", p=12) == est


def test_hll_string_column_matches_int_cardinality():
    from fora_ray.pipelines.sketches import hll_distinct

    t = _skewed_table()
    ds = ray.data.from_arrow(t).repartition(8)
    exact = len(set(t["k"].to_pylist()))
    for col in ("k", "s"):
        est = hll_distinct(ds, col, p=12)
        # linear-counting regime at a few hundred distinct: near-exact
        assert abs(est - exact) <= max(2, 0.02 * exact)


def test_heavy_hitters_exact_vs_pandas():
    from fora_ray.pipelines.sketches import heavy_hitters

    t = _skewed_table()
    ds = ray.data.from_arrow(t).repartition(8).materialize()
    phi = 0.01
    got = heavy_hitters(ds, "k", phi=phi).to_pandas()
    vc = t.to_pandas()["k"].value_counts()
    import math

    thresh = max(1, math.ceil(phi * len(t)))
    want = vc[vc >= thresh].sort_index()
    assert got["value"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.values.tolist()


def test_heavy_hitters_narrow_width_still_exact():
    """A tiny CMS (heavy collisions) may admit more candidates but the
    exact-count pass must still return exactly the true heavy hitters."""
    from fora_ray.pipelines.sketches import heavy_hitters

    t = _skewed_table(n=5_000, n_keys=200, seed=9)
    ds = ray.data.from_arrow(t).materialize()
    got = heavy_hitters(ds, "k", phi=0.02, width=64, depth=2).to_pandas()
    vc = t.to_pandas()["k"].value_counts()
    import math

    want = vc[vc >= math.ceil(0.02 * len(t))].sort_index()
    assert got["value"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.values.tolist()


def test_count_min_never_underestimates():
    from fora_ray.pipelines.sketches import _cms_rows, _values_u64, count_min_sketch

    t = _skewed_table(n=8_000, n_keys=100)
    ds = ray.data.from_arrow(t).repartition(5)
    cms = count_min_sketch(ds, "k", depth=4, width=256)
    vc = t.to_pandas()["k"].value_counts()
    vals = pa.array(vc.index.to_numpy())
    rows = _cms_rows(_values_u64(vals), 4, 256)
    est = np.min(cms[np.arange(4)[:, None], rows], axis=0)
    assert (est >= vc.values).all()


def test_approx_quantiles_error_bound_and_invariance():
    from fora_ray.pipelines.sketches import approx_quantiles

    rng = np.random.default_rng(11)
    v = rng.standard_normal(30_000) * 10 + 5
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v)}))
    qs = (0.05, 0.25, 0.5, 0.75, 0.95)
    est = approx_quantiles(ds, "v", qs=qs, bins=4096)
    bin_w = (v.max() - v.min()) / 4096
    for q in qs:
        assert abs(est[q] - np.quantile(v, q)) <= 2 * bin_w
    assert approx_quantiles(ds.repartition(9), "v", qs=qs, bins=4096) == est


def test_approx_quantiles_constant_column():
    from fora_ray.pipelines.sketches import approx_quantiles

    ds = ray.data.from_arrow(pa.table({"v": pa.array([7.0] * 100)}))
    est = approx_quantiles(ds, "v", qs=(0.1, 0.9))
    assert est == {0.1: 7.0, 0.9: 7.0}
