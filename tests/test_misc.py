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
