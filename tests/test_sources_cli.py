"""S1 compat reader, S2/S3 query-set + golden utilities, CLI smoke."""

import os

import numpy as np
import pyarrow.parquet as pq
import ray

from fora_ray.sources.graph_txt import read_graph_txt, write_graph_txt
from fora_ray.sources.queries import (
    gen_exact_topk,
    generate_query_set,
    topk_precision,
)

from .graphs import BRIDGE8, to_dataset


def test_graph_txt_roundtrip(tmp_path):
    d = str(tmp_path / "ds")
    write_graph_txt(to_dataset(BRIDGE8), d, n=8)
    edges, n, m = read_graph_txt(d)
    assert (n, m) == (8, len(BRIDGE8))
    got = sorted(map(tuple, edges.to_pandas()[["src", "dst"]].to_numpy()))
    assert got == sorted(map(tuple, BRIDGE8))


def test_graph_txt_without_attribute(tmp_path):
    d = str(tmp_path / "ds2")
    write_graph_txt(to_dataset(BRIDGE8), d, n=8)
    os.remove(os.path.join(d, "attribute.txt"))
    edges, n, m = read_graph_txt(d)
    assert n == 8 and m == len(BRIDGE8)


def test_query_set_deterministic():
    a = generate_query_set(1000, 32, seed=7)
    b = generate_query_set(1000, 32, seed=7)
    assert a.equals(b)
    c = generate_query_set(1000, 32, seed=8)
    assert not a.equals(c)
    assert len(set(a["source"].to_pylist())) == 32


def test_exact_topk_golden(graph600, tmp_path):
    edges, n = graph600
    out = str(tmp_path / "golden.parquet")
    t = gen_exact_topk(edges, n, sources=[351], k=10, out_path=out)
    assert os.path.exists(out)
    saved = pq.read_table(out)
    assert saved.num_rows == t.num_rows <= 10
    # ranks ordered by descending ppr
    ppr = t["ppr"].to_numpy()
    assert (np.diff(ppr) <= 1e-15).all()
    assert topk_precision(t["node_id"].to_pylist(), t["node_id"].to_pylist()) == 1.0


def test_cli_ingest_and_pagerank(fix600, tmp_path):
    """CLI in-process (the subprocess path is exercised in bench/verify);
    main() must reuse the session fixture's Ray."""
    from fora_ray.__main__ import main

    g = str(tmp_path / "graph")
    pr = str(tmp_path / "pr")
    main(["ingest", "--corpus", f"{fix600}/corpus", "--out", g])
    assert os.path.exists(f"{g}/csr/meta.json")
    main(["pagerank", "--graph", g, "--out", pr])
    assert os.path.exists(f"{pr}/METRICS.json")
    scores = ray.data.read_parquet(f"{pr}/scores").to_pandas()
    from fora_ray import oracle

    edges = pq.read_table(f"{fix600}/edges.parquet")
    e = np.stack([edges["src"].to_numpy(), edges["dst"].to_numpy()], axis=1)
    want = oracle.ppr_power_iteration(e, 600, source=None)
    got = np.zeros(600)
    got[scores["node_id"]] = scores["ppr"]
    assert np.allclose(got, want, atol=1e-9)


def _write_docs_parquet(path: str):
    import pyarrow as pa

    base = "the quick brown fox jumps over the lazy dog " * 12
    texts = [
        base, base + "extra tail", "completely different short text",
        base.replace("quick", "rapid"), base,  # doc 4 == doc 0 exactly
        "eins zwei drei der die das und ist nicht " * 8,
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5 + ["de"]),
    })
    pq.write_table(t, path)


def test_cli_dedup_curate_ann(tmp_path):
    """VERDICT r03 #5: the LLM-pipeline operators must be runnable from
    the ray-job CLI surface, writing parquet + METRICS.json."""
    import json

    from fora_ray.__main__ import main

    docs = str(tmp_path / "docs.parquet")
    _write_docs_parquet(docs)

    d1 = str(tmp_path / "dedup_exact")
    main(["dedup", "--docs", docs, "--out", d1, "--method", "exact"])
    kept = ray.data.read_parquet(f"{d1}/kept").to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2, 3, 5]  # doc 4 is an exact dup of 0
    m = json.load(open(f"{d1}/METRICS.json"))
    assert m["n_input"] == 6 and m["n_output"] == 5

    d2 = str(tmp_path / "dedup_minhash")
    main(["dedup", "--docs", docs, "--out", d2, "--method", "minhash",
          "--threshold", "0.5", "--clusters"])
    pairs = ray.data.read_parquet(f"{d2}/pairs").to_pandas()
    assert {(0, 4)} <= set(map(tuple, pairs[["a", "b"]].to_numpy()))
    clusters = ray.data.read_parquet(f"{d2}/clusters").to_pandas()
    c = dict(zip(clusters["doc_id"], clusters["cluster"]))
    assert c[0] == c[4]
    assert json.load(open(f"{d2}/METRICS.json"))["n_output"] == len(pairs)

    d2b = str(tmp_path / "dedup_ngram")
    main(["dedup", "--docs", docs, "--out", d2b, "--method", "ngram",
          "--threshold", "0.5"])
    pairs_ng = ray.data.read_parquet(f"{d2b}/pairs").to_pandas()
    assert {(0, 4)} <= set(map(tuple, pairs_ng[["a", "b"]].to_numpy()))

    d3 = str(tmp_path / "curate")
    main(["curate", "--docs", docs, "--out", d3, "--threshold", "0.5"])
    curated = ray.data.read_parquet(f"{d3}/curated").to_pandas()
    assert 0 < len(curated) < 6
    assert {"doc_id", "text", "quality", "lang_pred"} <= set(curated.columns)
    assert json.load(open(f"{d3}/METRICS.json"))["curated_docs"] == len(curated)

    emb = str(tmp_path / "emb.parquet")
    rng = np.random.default_rng(5)
    import pyarrow as pa

    pq.write_table(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([rng.standard_normal(16).tolist() for _ in range(20)]),
    }), emb)
    d4 = str(tmp_path / "ann")
    main(["ann", "--embeddings", emb, "--out", d4, "--nq", "3", "--k", "5"])
    topk = ray.data.read_parquet(f"{d4}/topk").to_pandas()
    assert len(topk) == 15 and topk["rank"].max() == 5
    assert json.load(open(f"{d4}/METRICS.json"))["nq"] == 3

    d5 = str(tmp_path / "ann_lsh")
    main(["ann", "--embeddings", emb, "--out", d5, "--method", "lsh",
          "--nq", "3", "--k", "5", "--n-tables", "4", "--n-planes", "4"])
    topk_lsh = ray.data.read_parquet(f"{d5}/topk").to_pandas()
    assert topk_lsh["rank"].max() <= 5 and len(topk_lsh) > 0
    # each query's own vector collides with itself in every table and
    # scores cosine 1.0, so rank 1 is the query itself (queries are the
    # nq smallest vec_ids: 0, 1, 2)
    self_hits = topk_lsh[topk_lsh["rank"] == 1].sort_values("query_id")
    assert self_hits["vec_id"].tolist() == self_hits["query_id"].tolist()
    assert json.load(open(f"{d5}/METRICS.json"))["method"] == "lsh"

def test_cli_events(tmp_path):
    """The events family is drivable from the ray-job CLI surface."""
    import json

    import pandas as pd
    import pyarrow as pa

    from fora_ray.__main__ import main

    ev = str(tmp_path / "events.parquet")
    n = 200
    rng = np.random.default_rng(7)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(
            pd.Timestamp("2026-01-01") + pd.to_timedelta(rng.integers(0, 7200, n), unit="s")
        ),
        "user_id": pa.array(rng.integers(0, 10, n), pa.int64()),
        "event_type": pa.array(["click" if i % 2 else "view" for i in range(n)]),
        "value": pa.array(rng.random(n)),
        "props": pa.array(['{"k": %d}' % i for i in range(n)]),
    }), ev)

    d1 = str(tmp_path / "tumbling")
    main(["events", "--events", ev, "--out", d1, "--op", "tumbling"])
    out = ray.data.read_parquet(f"{d1}/tumbling").to_pandas()
    assert out["n_events"].sum() == n
    assert json.load(open(f"{d1}/METRICS.json"))["n_input"] == n

    d2 = str(tmp_path / "sessions")
    main(["events", "--events", ev, "--out", d2, "--op", "sessions", "--gap-s", "600"])
    sess = ray.data.read_parquet(f"{d2}/sessions").to_pandas()
    assert sess["n_events"].sum() == n
    assert set(sess["user_id"]) == set(range(10))

    d3 = str(tmp_path / "props")
    main(["events", "--events", ev, "--out", d3, "--op", "props", "--keys", "k"])
    props = ray.data.read_parquet(f"{d3}/props").to_pandas()
    assert len(props) == n

def test_cli_query_batch(fix600, tmp_path):
    """--sources routes to the batched multi-source tier; per-source
    results must match single-source queries bit-for-bit."""
    from fora_ray.__main__ import main

    g = str(tmp_path / "graph")
    main(["ingest", "--corpus", f"{fix600}/corpus", "--out", g])

    # exact mode: batch and single are both deterministic sweeps, so the
    # per-source results must agree to solver tolerance (fora mode uses
    # per-query-index walk seeds in the batch tier, so only statistical
    # agreement holds there — covered by test_ppr_batch)
    qb = str(tmp_path / "qbatch")
    main(["query", "--graph", g, "--sources", "3,7", "--mode", "exact", "--out", qb])
    batch = ray.data.read_parquet(f"{qb}/scores").to_pandas()
    assert set(batch["source"]) == {3, 7}

    for s in (3, 7):
        q1 = str(tmp_path / f"q{s}")
        main(["query", "--graph", g, "--source", str(s), "--mode", "exact", "--out", q1])
        single = ray.data.read_parquet(f"{q1}/scores").to_pandas()
        got = batch[batch["source"] == s].set_index("node_id")["ppr"].sort_index()
        want = single.set_index("node_id")["ppr"].sort_index()
        merged = got.to_frame("got").join(want.to_frame("want"), how="outer").fillna(0.0)
        assert np.allclose(merged["got"], merged["want"], atol=1e-9)

    # fora mode smoke through the same surface
    qf = str(tmp_path / "qbatch_fora")
    main(["query", "--graph", g, "--sources", "3,7", "--mode", "fora", "--out", qf])
    fora = ray.data.read_parquet(f"{qf}/scores").to_pandas()
    assert set(fora["source"]) == {3, 7}

def test_cli_sketch(tmp_path):
    """sketch subcommand: distinct / heavy-hitters / quantiles."""
    import json

    import pyarrow as pa

    from fora_ray.__main__ import main

    src = str(tmp_path / "t.parquet")
    rng = np.random.default_rng(4)
    keys = (rng.zipf(1.4, 5000) % 50).astype(np.int64)
    pq.write_table(pa.table({"k": pa.array(keys), "v": pa.array(rng.random(5000))}), src)

    d1 = str(tmp_path / "dist")
    main(["sketch", "--input", src, "--on", "k", "--out", d1, "--op", "distinct"])
    m = json.load(open(f"{d1}/METRICS.json"))
    exact = len(set(keys.tolist()))
    assert abs(m["distinct_est"] - exact) <= max(2, 0.02 * exact)

    d2 = str(tmp_path / "hh")
    main(["sketch", "--input", src, "--on", "k", "--out", d2, "--op", "heavy-hitters",
          "--phi", "0.02"])
    hh = ray.data.read_parquet(f"{d2}/heavy_hitters").to_pandas()
    import math
    import pandas as pd

    vc = pd.Series(keys).value_counts()
    want = vc[vc >= math.ceil(0.02 * 5000)].sort_index()
    assert hh.sort_values("value")["value"].tolist() == want.index.tolist()

    d3 = str(tmp_path / "qt")
    main(["sketch", "--input", src, "--on", "v", "--out", d3, "--op", "quantiles",
          "--quantiles", "0.5"])
    qt = ray.data.read_parquet(f"{d3}/quantiles.parquet").to_pandas()
    assert abs(qt["value"][0] - 0.5) < 0.05


def test_cli_walks(fix600, tmp_path):
    """walks subcommand: corpus + skip-gram pairs + neighbor sample, all
    as parquet + METRICS.json, consistent with the library calls."""
    import json

    from fora_ray.__main__ import main

    g = str(tmp_path / "graph")
    out = str(tmp_path / "walks")
    main(["ingest", "--corpus", f"{fix600}/corpus", "--out", g])
    main(["walks", "--graph", g, "--out", out, "--nwalks", "1",
          "--walk-len", "4", "--window", "2",
          "--sample-seeds", "0,1,2", "--fanouts", "3,2"])
    corpus = ray.data.read_parquet(f"{out}/corpus").to_pandas()
    pairs = ray.data.read_parquet(f"{out}/pairs").to_pandas()
    sample = pq.read_table(f"{out}/sample.parquet").to_pandas()
    with open(f"{out}/METRICS.json") as f:
        m = json.load(f)
    assert m["n_corpus_rows"] == len(corpus) and m["walks"] == 600
    assert m["n_pairs"] == len(pairs) and len(pairs) > 0
    assert m["n_sample_edges"] == len(sample)
    assert set(corpus.columns) == {"walk_id", "step", "node_id"}
    assert set(pairs.columns) == {"center", "context", "cnt"}
    assert set(sample.columns) == {"src", "dst", "hop"}
    # step-0 records exist for every walk
    assert (corpus[corpus.step == 0].groupby("walk_id").size() == 1).all()
    assert corpus["walk_id"].nunique() == 600
    # node2vec mode via --p/--q: same trace shape, biased sampler
    out2 = str(tmp_path / "n2v")
    main(["walks", "--graph", g, "--out", out2, "--nwalks", "1",
          "--walk-len", "4", "--window", "0", "--p", "0.5", "--q", "2.0"])
    n2v = ray.data.read_parquet(f"{out2}/corpus").to_pandas()
    assert set(n2v.columns) == {"walk_id", "step", "node_id"}
    assert n2v["walk_id"].nunique() == 600
    assert not n2v.sort_values(["walk_id", "step"]).reset_index(drop=True)\
        .equals(corpus.sort_values(["walk_id", "step"]).reset_index(drop=True))


def test_cli_analyze(fix600, tmp_path):
    """analyze subcommand: scc + harmonic against their oracles."""
    import json

    from fora_ray.__main__ import main
    from fora_ray.oracle import scc_oracle

    g = str(tmp_path / "graph")
    main(["ingest", "--corpus", f"{fix600}/corpus", "--out", g])
    out = str(tmp_path / "scc")
    main(["analyze", "--graph", g, "--out", out, "--op", "scc"])
    df = (ray.data.read_parquet(f"{out}/scc").to_pandas()
          .sort_values("node_id").reset_index(drop=True))
    edges = pq.read_table(f"{fix600}/edges.parquet")
    e = np.stack([edges["src"].to_numpy(), edges["dst"].to_numpy()], axis=1)
    assert df["scc"].tolist() == scc_oracle(e, 600).tolist()
    out2 = str(tmp_path / "harm")
    main(["analyze", "--graph", g, "--out", out2, "--op", "harmonic",
          "--n-pivots", "4"])
    hdf = ray.data.read_parquet(f"{out2}/harmonic").to_pandas()
    assert len(hdf) == 600 and (hdf["harmonic"] >= 0).all()
    with open(f"{out2}/METRICS.json") as f:
        assert json.load(f)["command"] == "analyze:harmonic"
    # mis: independence + maximality on the symmetrized edge list
    out3 = str(tmp_path / "mis")
    main(["analyze", "--graph", g, "--out", out3, "--op", "mis"])
    mdf = (ray.data.read_parquet(f"{out3}/mis").to_pandas()
           .sort_values("node_id").reset_index(drop=True))
    inm = mdf["in_mis"].to_numpy()
    und = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
    und = und[und[:, 0] != und[:, 1]]
    assert not (inm[und[:, 0]] & inm[und[:, 1]]).any()
    nb_in = np.zeros(600, dtype=bool)
    np.logical_or.at(nb_in, und[:, 0], inm[und[:, 1]])
    assert (inm | nb_in).all()
    # betweenness via the CLI surface: all values finite, n rows
    out4 = str(tmp_path / "bc")
    main(["analyze", "--graph", g, "--out", out4, "--op", "betweenness",
          "--n-pivots", "4"])
    bdf = ray.data.read_parquet(f"{out4}/betweenness").to_pandas()
    assert len(bdf) == 600 and np.isfinite(bdf["betweenness"]).all()
    # coloring: proper on the symmetrized edges
    out5 = str(tmp_path / "color")
    main(["analyze", "--graph", g, "--out", out5, "--op", "color"])
    cdf = (ray.data.read_parquet(f"{out5}/color").to_pandas()
           .sort_values("node_id").reset_index(drop=True))
    col = cdf["color"].to_numpy()
    assert (col >= 0).all()
    assert (col[und[:, 0]] != col[und[:, 1]]).all()
    # ktruss: every surviving edge is an input edge
    out6 = str(tmp_path / "truss")
    main(["analyze", "--graph", g, "--out", out6, "--op", "ktruss", "--k", "3"])
    tdf = ray.data.read_parquet(f"{out6}/ktruss").to_pandas()
    es = {(int(a), int(b)) for a, b in und[und[:, 0] < und[:, 1]]}
    assert set(zip(tdf["lo"], tdf["hi"])) <= es


def test_cli_dedup_decontaminate(tmp_path):
    import json

    from fora_ray.__main__ import main

    docs_path = str(tmp_path / "docs.parquet")
    _write_docs_parquet(docs_path)
    bench_path = str(tmp_path / "bench.parquet")
    import pyarrow as pa

    base = "the quick brown fox jumps over the lazy dog " * 12
    pq.write_table(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array([base]),
    }), bench_path)
    out = str(tmp_path / "decon")
    main(["dedup", "--docs", docs_path, "--out", out,
          "--method", "decontaminate", "--bench", bench_path])
    flagged = ray.data.read_parquet(f"{out}/contaminated").to_pandas()
    # docs 0/1/4 contain the benchmark text verbatim (plus doc 3, the
    # one-word variant, still shares most 8-grams)
    assert {0, 1, 4}.issubset(set(flagged["doc_id"]))
    assert 2 not in set(flagged["doc_id"])
    with open(f"{out}/METRICS.json") as f:
        assert json.load(f)["method"] == "decontaminate"
