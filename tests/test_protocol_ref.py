"""The single-process protocol reference (fora_ray.protocol_ref) must
reproduce the distributed engine bit-for-bit up to final-accumulator
summation order — this is the property the driver goldens rely on."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from fora_ray.fixtures import fixture_dir
from fora_ray.graph import algorithms as alg
from fora_ray.graph.runtime import GraphHandle
from fora_ray.pipelines.ingest import ingest_fixture
from fora_ray.protocol_ref import ProtocolSim


@pytest.fixture(scope="module")
def engine_and_sim(ray_session):
    fix = fixture_dir(600)
    t = ingest_fixture(fix)
    edges = t["edges"].materialize()
    n = t["n_nodes"]
    h = GraphHandle.from_edges(edges, n, P=4)
    e = np.stack(
        [pq.read_table(f"{fix}/edges.parquet")[c].to_numpy() for c in ("src", "dst")],
        axis=1,
    )
    yield h, ProtocolSim(e, n, P=4), n
    h.close()


def _dense(ds, n):
    df = ds.to_pandas()
    v = np.zeros(n)
    v[df["node_id"].to_numpy()] = df["ppr"].to_numpy()
    return v


def test_fora_matches_engine(engine_and_sim):
    h, sim, n = engine_and_sim
    scores, _ = alg.personalized_pagerank(h, 0, mode="fora", seed=42)
    ve, vs = _dense(scores, n), sim.fora_ppr(0, seed=42)
    assert np.array_equal(np.nonzero(ve)[0], np.nonzero(vs)[0])
    assert np.abs(ve - vs).max() < 1e-13  # only accumulator sum order


def test_monte_carlo_matches_engine(engine_and_sim):
    h, sim, n = engine_and_sim
    scores, _ = alg.monte_carlo_ppr(h, 0, seed=7)
    ve, vs = _dense(scores, n), sim.monte_carlo_ppr(0, seed=7)
    assert np.abs(ve - vs).max() < 1e-13


def test_batch_matches_engine(engine_and_sim):
    h, sim, n = engine_and_sim
    scores, _ = alg.ppr_batch(h, [0, 1, 2, 3], mode="fora", seed=42)
    df = scores.to_pandas()
    E = np.zeros((n, 4))
    E[df["node_id"].to_numpy(), df["query_idx"].to_numpy()] = df["ppr"].to_numpy()
    S = sim.ppr_batch([0, 1, 2, 3], seed=42)
    assert np.array_equal(E != 0, S != 0)
    assert np.abs(E - S).max() < 1e-13


def test_indexed_matches_engine(engine_and_sim):
    h, sim, n = engine_and_sim
    alg.build_walk_index(h, seed=42)
    scores, _ = alg.fora_ssppr_indexed(h, source=0, seed=42)
    sim.build_walk_index(seed=42)
    ve, vs = _dense(scores, n), sim.fora_indexed(0, seed=42)
    assert np.abs(ve - vs).max() < 1e-13


def test_topk_matches_engine(engine_and_sim):
    h, sim, n = engine_and_sim
    top, _ = alg.topk_ppr(h, source=0, k=10, seed=42)
    tp = top.to_pandas()
    ids, vals = sim.topk_ppr(0, 10, seed=42)
    assert tp["node_id"].tolist() == ids.tolist()
    assert np.abs(tp["ppr"].to_numpy() - vals).max() < 1e-13
