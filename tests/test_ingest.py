"""Ingest pipeline (M1-M7) vs golden fixture tables (SURVEY 5.2)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from fora_ray.pipelines.ingest import build_graph_tables, ingest_fixture, read_corpus


def test_ingest_matches_golden(fix600):
    t = ingest_fixture(fix600)
    nodes = t["nodes"].to_pandas().sort_values("node_id").reset_index(drop=True)
    assert nodes.equals(pq.read_table(f"{fix600}/nodes.parquet").to_pandas())
    edges = t["edges"].to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert edges.equals(pq.read_table(f"{fix600}/edges.parquet").to_pandas())
    deg = t["degrees"].to_pandas().sort_values("node_id").reset_index(drop=True)
    assert deg.equals(pq.read_table(f"{fix600}/degrees.parquet").to_pandas())


def test_sha256_quarantine(fix600):
    man = pq.read_table(f"{fix600}/manifest.parquet")
    manifest = {
        (r, p): s
        for r, p, s in zip(
            man["repo"].to_pylist(), man["path"].to_pylist(), man["sha256"].to_pylist()
        )
    }
    corpus = pq.read_table(f"{fix600}/corpus/part-0000.parquet")
    contents = corpus["content"].to_pylist()
    contents[5] = contents[5] + "TAMPERED"
    corpus = corpus.set_column(4, "content", pa.array(contents))
    t = build_graph_tables(ray.data.from_arrow(corpus), manifest_ref=ray.put(manifest))
    assert t["nodes"].count() == corpus.num_rows - 1


def test_join_strategy_matches_broadcast(fix600):
    t = build_graph_tables(
        read_corpus(f"{fix600}/corpus"), join_strategy="join", num_partitions=4
    )
    edges = t["edges"].to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert edges.equals(pq.read_table(f"{fix600}/edges.parquet").to_pandas())


def test_empty_corpus(fix600):
    corpus = pq.read_table(f"{fix600}/corpus/part-0000.parquet").slice(0, 0)
    t = build_graph_tables(ray.data.from_arrow(corpus))
    assert t["nodes"].count() == 0 and t["edges"].count() == 0


def test_selfloop_dup_canonicalization():
    """M6 on the selfdup micro-fixture (FIXTURES F3)."""
    from fora_ray.stages.edges import dedup_edges

    from .graphs import SELFDUP_RAW, to_dataset

    ds = to_dataset(SELFDUP_RAW)
    # drop self loops like resolve_to_ids does, then dedup
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    )
    out = dedup_edges(ds).to_pandas()
    got = sorted(map(tuple, out[["src", "dst"]].to_numpy()))
    assert got == [(0, 1), (1, 2), (2, 0)]


def test_symmetrize():
    from fora_ray.stages.edges import symmetrize

    from .graphs import DANGLE3, to_dataset

    out = symmetrize(to_dataset(DANGLE3)).to_pandas()
    got = sorted(map(tuple, out[["src", "dst"]].to_numpy()))
    assert got == [(0, 1), (1, 0), (1, 2), (2, 1)]


def test_degrees_micro():
    from fora_ray.stages.degrees import compute_degrees

    from .graphs import STAR5, to_dataset

    nodes = ray.data.from_arrow(pa.table({"node_id": pa.array(np.arange(5, dtype=np.int64))}))
    deg = compute_degrees(to_dataset(STAR5), nodes).to_pandas().sort_values("node_id").reset_index(drop=True)
    assert deg["out_deg"].tolist() == [4, 0, 0, 0, 0]
    assert deg["in_deg"].tolist() == [0, 1, 1, 1, 1]
