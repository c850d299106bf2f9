"""Coverage for helpers not exercised elsewhere: bucketed shuffle ops,
quarantine split, algorithm registry."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from fora_ray.stages.shuffle import count_by_key, distinct_u64, sum_by_key


def test_shuffle_helpers_match_pandas():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, size=5000).astype(np.int64)
    vals = rng.integers(0, 100, size=5000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(vals)}))
    got = sum_by_key(ds, "k", ["v"]).to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd

    want = (
        pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)["v"].sum()
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["v"].tolist() == want["v"].tolist()

    got_c = count_by_key(ds, "k").to_pandas().sort_values("k")
    want_c = pd.DataFrame({"k": keys}).value_counts("k").sort_index()
    assert got_c["cnt"].tolist() == want_c.tolist()

    dd = distinct_u64(ds.map_batches(
        lambda t: pa.table({"k": pa.array(t["k"].to_numpy(zero_copy_only=False).astype(np.uint64), pa.uint64())}),
        batch_format="pyarrow",
    ), "k").to_pandas()
    assert sorted(dd["k"].tolist()) == sorted(set(keys.tolist()))


def test_quarantine_split(fix600):
    from fora_ray.pipelines.ingest import read_corpus
    from fora_ray.stages.verify import quarantine_split

    man = pq.read_table(f"{fix600}/manifest.parquet")
    manifest = {
        (r, p): s
        for r, p, s in zip(man["repo"].to_pylist(), man["path"].to_pylist(), man["sha256"].to_pylist())
    }
    # corrupt one entry in the manifest -> that row must land in quarantine
    victim = next(iter(manifest))
    manifest[victim] = "0" * 64
    clean, bad = quarantine_split(read_corpus(f"{fix600}/corpus"), ray.put(manifest))
    assert bad.count() == 1
    assert clean.count() == 600 - 1
    row = bad.take(1)[0]
    assert (row["repo"], row["path"]) == victim


def test_registry():
    from fora_ray import registry

    assert "pagerank" in registry.ALGORITHMS
    fn = registry.get_algorithm("cc")
    assert callable(fn)
    registry.register_algorithm("custom", lambda h: ("ok", {}))
    assert registry.get_algorithm("custom")(None)[0] == "ok"
    import pytest

    with pytest.raises(KeyError, match="unknown algorithm"):
        registry.get_algorithm("nope")


def test_list_np_zero_copy_matches_as_py():
    """VERDICT r03 #1: the zero-copy Arrow list extraction used for CSR
    shard / walk-index / permutation loads must produce byte-identical
    arrays to the old .as_py() materialization — including on FILTERED
    multi-row tables where list offsets are non-trivial."""
    import numpy as np
    import pyarrow as pa

    from fora_ray.graph.runtime import _list_np
    from fora_ray.stages.csr import build_csr_table

    rng = np.random.default_rng(3)
    src = rng.integers(0, 100, size=2000)
    dst = rng.integers(0, 100, size=2000)
    tables = [
        build_csr_table(src[src % 3 == p], dst[src % 3 == p], 100, 3, p)
        for p in range(3)
    ]
    multi = pa.concat_tables(tables)
    for p in range(3):
        rows = multi.filter(pa.compute.equal(multi["part_id"], p))
        for col in ("indptr", "indices"):
            fast = _list_np(rows[col])
            slow = np.asarray(rows[col][0].as_py(), dtype=np.int64)
            assert np.array_equal(fast, slow)
    # float list (reverse-shard weights path)
    w = pa.table({
        "part_id": pa.array([0, 1], pa.int32()),
        "weights": pa.LargeListArray.from_arrays(
            pa.array([0, 3, 5], pa.int64()),
            pa.array([0.5, 1.5, 2.5, 3.5, 4.5], pa.float64()),
        ),
    })
    rows = w.filter(pa.compute.equal(w["part_id"], 1))
    assert np.allclose(_list_np(rows["weights"], np.float64), [3.5, 4.5])
