"""CLI entry — the `ray job submit` surface (SURVEY 3.3; north_rule
"run via ray job submit").

    python -m fora_ray ingest   --corpus DIR --out DIR
    python -m fora_ray pagerank --graph DIR --out DIR [--resume]
    python -m fora_ray query    --graph DIR (--source N | --sources 1,2,3) [--mode exact|fora] --out DIR
    python -m fora_ray topk     --graph DIR --source N --k K --out DIR
    python -m fora_ray cc|lpa|triangles --graph DIR --out DIR
    python -m fora_ray build-index --graph DIR --out DIR
    python -m fora_ray dedup    --docs PATH --out DIR [--method exact|minhash|simhash|ngram|embedding|decontaminate]
                                [--threshold X] [--clusters]
    python -m fora_ray curate   --docs PATH --out DIR [--min-quality X] [--langs en,de]
    python -m fora_ray ann      --embeddings PATH --out DIR [--method brute|ivf|lsh] [--k K] [--nq N]
    python -m fora_ray events   --events PATH --out DIR [--op tumbling|sliding|sessions|top-users|props]
                                [--window-s N] [--slide-s N] [--gap-s N] [--k K] [--keys a,b]
    python -m fora_ray sketch   --input PATH --on COL --out DIR [--op distinct|heavy-hitters|quantiles]
                                [--p P] [--phi X] [--quantiles 0.25,0.5] [--bins N]
    python -m fora_ray walks    --graph DIR --out DIR [--nwalks N] [--walk-len L] [--window W] [--p P --q Q]
                                [--sample-seeds 0,1,2 --fanouts 10,5]
    python -m fora_ray analyze  --graph DIR --out DIR --op scc|hits|kcore|bfs|harmonic|diameter|betweenness|mis|color|ktruss|trussness|eigenvector|katz|assortativity|modularity

--graph DIR is a shard dir written by `ingest` (csr/ + meta.json).
Every command writes its result as partitioned Parquet plus a
METRICS.json (S4 sink: wall time, per-phase stats, per-partition
counters — the lineage record).  Owns its Ray session (guarded init).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # empty shuffle partitions make the executor log schema-mismatch
    # warnings that are pure noise here (see bench._quiet_schema_warnings)
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)


def _write_metrics(out_dir: str, metrics: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, ".METRICS.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    os.replace(tmp, os.path.join(out_dir, "METRICS.json"))


def _load_graph(graph_dir: str, sym: bool = False):
    from .graph.runtime import GraphHandle

    sub = "csr_sym" if sym else "csr"
    return GraphHandle.from_dir(os.path.join(graph_dir, sub))


def cmd_ingest(args):
    import ray

    from .stages.csr import build_csr_shards, save_shards
    from .pipelines.ingest import build_graph_tables, read_corpus

    t0 = time.time()
    tables = build_graph_tables(read_corpus(args.corpus))
    n = tables["n_nodes"]
    edges = tables["edges"]
    sym = tables["edges_undirected"].materialize()
    m = edges.count()
    os.makedirs(args.out, exist_ok=True)
    tables["nodes"].write_parquet(os.path.join(args.out, "nodes"))
    edges.write_parquet(os.path.join(args.out, "edges"))
    tables["degrees"].write_parquet(os.path.join(args.out, "degrees"))
    P = max(4, min(int(ray.cluster_resources().get("CPU", 8)), m // 100_000 + 1))
    save_shards(build_csr_shards(edges, n, P), os.path.join(args.out, "csr"), n, m, P)
    save_shards(
        build_csr_shards(sym, n, P), os.path.join(args.out, "csr_sym"), n, sym.count(), P
    )
    _write_metrics(args.out, {
        "command": "ingest", "n": n, "m": m, "P": P, "wall_s": time.time() - t0,
        "corpus": args.corpus,
        # S4: Ray Data per-operator stats of the edge pipeline
        "edge_pipeline_stats": edges.stats()[:4000],
    })
    print(json.dumps({"n": n, "m": m, "P": P, "out": args.out}))


def _write_scores(scores_ds, out_dir: str):
    scores_ds.write_parquet(os.path.join(out_dir, "scores"))


def cmd_pagerank(args):
    from .graph import algorithms as alg

    h = _load_graph(args.graph)
    t0 = time.time()
    scores, stats = alg.pagerank(
        h, ckpt_dir=args.ckpt_dir, resume=args.resume,
        ckpt_every=args.ckpt_every,
    )
    _write_scores(scores, args.out)
    _write_metrics(args.out, {"command": "pagerank", "wall_s": time.time() - t0, **stats})
    h.close()
    print(json.dumps({"rounds": stats["rounds"], "out": args.out}))


def cmd_query(args):
    from .graph import algorithms as alg

    if (args.source is None) == (not args.sources):
        raise SystemExit("query: pass exactly one of --source / --sources")
    h = _load_graph(args.graph)
    t0 = time.time()
    if args.sources:
        # batched tier: all Q queries advance in the same superstep wave
        # (amortizes the per-round barrier Q-fold — the serving path)
        sources = [int(s) for s in args.sources.split(",")]
        scores, stats = alg.ppr_batch(
            h, sources, mode=args.mode, eps=args.eps, seed=args.seed,
            ckpt_dir=args.ckpt_dir, resume=args.resume,
        )
        import numpy as np
        import pyarrow as pa

        src_arr = np.asarray(sources, dtype=np.int64)

        def attach_source(t: "pa.Table") -> "pa.Table":
            qi = t["query_idx"].to_numpy(zero_copy_only=False)
            return t.append_column("source", pa.array(src_arr[qi]))

        scores = scores.map_batches(attach_source, batch_format="pyarrow")
        label: object = sources
    else:
        scores, stats = alg.personalized_pagerank(
            h, args.source, mode=args.mode, eps=args.eps, seed=args.seed,
            ckpt_dir=args.ckpt_dir, resume=args.resume,
        )
        label = args.source
    _write_scores(scores, args.out)
    _write_metrics(args.out, {
        "command": "query", "source": label, "mode": args.mode,
        "wall_s": time.time() - t0,
        **{k: v for k, v in stats.items() if not isinstance(v, dict)},
        "counters": stats.get("counters"),
    })
    h.close()
    print(json.dumps({"source": label, "mode": args.mode, "out": args.out}))


def cmd_topk(args):
    from .graph import algorithms as alg

    h = _load_graph(args.graph)
    t0 = time.time()
    top, stats = alg.topk_ppr(h, args.source, k=args.k, eps=args.eps, seed=args.seed)
    top.write_parquet(os.path.join(args.out, "topk"))
    _write_metrics(args.out, {"command": "topk", "wall_s": time.time() - t0, **stats})
    h.close()
    print(json.dumps({"source": args.source, "k": args.k, "out": args.out}))


def cmd_cc(args):
    from .graph import algorithms as alg

    h = _load_graph(args.graph, sym=True)
    t0 = time.time()
    labels, stats = alg.connected_components(h)
    labels.write_parquet(os.path.join(args.out, "components"))
    _write_metrics(args.out, {"command": "cc", "wall_s": time.time() - t0, **stats})
    h.close()
    print(json.dumps({"rounds": stats["rounds"], "out": args.out}))


def cmd_lpa(args):
    from .graph import algorithms as alg

    h = _load_graph(args.graph, sym=True)
    t0 = time.time()
    labels, stats = alg.label_propagation(h, max_rounds=args.max_rounds)
    labels.write_parquet(os.path.join(args.out, "labels"))
    _write_metrics(args.out, {"command": "lpa", "wall_s": time.time() - t0, **stats})
    h.close()
    print(json.dumps({"rounds": stats["rounds"], "out": args.out}))


def cmd_triangles(args):
    import json as _json

    from .graph.triangles import triangle_count
    from .graph.runtime import GraphHandle  # noqa: F401 (graph meta)

    import ray

    with open(os.path.join(args.graph, "csr_sym", "meta.json")) as f:
        meta = json.load(f)
    sym = ray.data.read_parquet(os.path.join(args.graph, "edges"))
    from .stages.edges import symmetrize

    t0 = time.time()
    per, total = triangle_count(symmetrize(sym), meta["n"])
    per.write_parquet(os.path.join(args.out, "triangles"))
    _write_metrics(args.out, {"command": "triangles", "total": total, "wall_s": time.time() - t0})
    print(_json.dumps({"total": total, "out": args.out}))


def cmd_dedup(args):
    """Dedup over a documents (or embeddings) parquet table -> parquet +
    METRICS.json (the ray-job surface for the LLM-pipeline operators —
    VERDICT r02 'what's missing' #1)."""
    import ray

    from .pipelines import dedup as dd

    docs = ray.data.read_parquet(args.docs)
    t0 = time.time()
    if args.method == "exact":
        out_ds = dd.exact_dedup(docs).materialize()
        sub = "kept"
    elif args.method == "decontaminate":
        if not args.bench:
            raise SystemExit("dedup --method decontaminate requires --bench PATH")
        bench = ray.data.read_parquet(args.bench)
        out_ds = dd.decontaminate(docs, bench, ngram=args.ngram).materialize()
        sub = "contaminated"
    elif args.method == "minhash":
        out_ds = dd.minhash_lsh_dups(docs, threshold=args.threshold, seed=args.seed).materialize()
        sub = "pairs"
    elif args.method == "simhash":
        out_ds = dd.simhash_dups(docs, hamming_thresh=args.hamming, seed=args.seed).materialize()
        sub = "pairs"
    elif args.method == "ngram":
        out_ds = dd.ngram_jaccard_dups(docs, threshold=args.threshold).materialize()
        sub = "pairs"
    else:  # embedding: --docs points at a (vec_id, embedding) table
        out_ds = dd.embedding_dups(docs, threshold=args.threshold, seed=args.seed).materialize()
        sub = "pairs"
    os.makedirs(args.out, exist_ok=True)
    out_ds.write_parquet(os.path.join(args.out, sub))
    metrics = {
        "command": "dedup", "method": args.method, "docs": args.docs,
        "n_input": docs.count(), "n_output": out_ds.count(),
        "wall_s": time.time() - t0,
    }
    if args.clusters and sub == "pairs":
        id_col = "vec_id" if args.method == "embedding" else "doc_id"
        pairs = out_ds.select_columns(["a", "b"])
        clusters = dd.dup_clusters(pairs, docs, id_col=id_col).materialize()
        clusters.write_parquet(os.path.join(args.out, "clusters"))
        metrics["n_clustered_ids"] = clusters.count()
    _write_metrics(args.out, metrics)
    print(json.dumps({"method": args.method, "n_output": metrics["n_output"], "out": args.out}))


def cmd_curate(args):
    import ray

    from .pipelines.curate import curate_documents

    docs = ray.data.read_parquet(args.docs)
    t0 = time.time()
    curated, stats = curate_documents(
        docs, min_quality=args.min_quality, near_dup_threshold=args.threshold,
        langs=args.langs.split(",") if args.langs else None, seed=args.seed,
    )
    curated = curated.materialize()
    os.makedirs(args.out, exist_ok=True)
    curated.write_parquet(os.path.join(args.out, "curated"))
    _write_metrics(args.out, {
        "command": "curate", "docs": args.docs, "wall_s": time.time() - t0, **stats,
    })
    print(json.dumps({"curated_docs": stats["curated_docs"], "out": args.out}))


def cmd_ann(args):
    import numpy as np
    import ray

    from .pipelines.ann import brute_force_topk, ivf_topk, lsh_topk

    emb = ray.data.read_parquet(args.embeddings)
    # query matrix: an explicit (vec_id, embedding) parquet, else the
    # first --nq vectors by vec_id (distributed sort + limit)
    if args.queries:
        qt = ray.data.read_parquet(args.queries).sort("vec_id").limit(args.nq).to_pandas()
    else:
        qt = emb.sort("vec_id").limit(args.nq).to_pandas()
    Q = np.stack(qt["embedding"].to_numpy())
    t0 = time.time()
    if args.method == "ivf":
        out_ds = ivf_topk(emb, Q, k=args.k, nlist=args.nlist, nprobe=args.nprobe,
                          seed=args.seed).materialize()
    elif args.method == "lsh":
        out_ds = lsh_topk(emb, Q, k=args.k, n_tables=args.n_tables,
                          n_planes=args.n_planes, seed=args.seed).materialize()
    else:
        out_ds = brute_force_topk(emb, Q, k=args.k).materialize()
    os.makedirs(args.out, exist_ok=True)
    out_ds.write_parquet(os.path.join(args.out, "topk"))
    _write_metrics(args.out, {
        "command": "ann", "method": args.method, "embeddings": args.embeddings,
        "nq": int(Q.shape[0]), "k": args.k, "n_vectors": emb.count(),
        "n_output": out_ds.count(), "wall_s": time.time() - t0,
    })
    print(json.dumps({"method": args.method, "nq": int(Q.shape[0]), "out": args.out}))


def cmd_events(args):
    """Windowed event analytics over an events parquet table -> parquet +
    METRICS.json (completes the ray-job surface: every pipeline family in
    SURVEY 2 is now drivable without writing Python)."""
    import ray

    from .pipelines import events as ev

    events = ray.data.read_parquet(args.events)
    t0 = time.time()
    if args.op == "tumbling":
        out_ds = ev.tumbling_window(events, window_s=args.window_s)
    elif args.op == "sliding":
        out_ds = ev.sliding_window_counts(
            events, window_s=args.window_s, slide_s=args.slide_s
        )
    elif args.op == "sessions":
        out_ds = ev.session_windows(events, gap_s=args.gap_s)
    elif args.op == "top-users":
        out_ds = ev.top_users_by_value(events, k=args.k)
    else:  # props
        out_ds = ev.parse_props(events, args.keys.split(","))
    out_ds = out_ds.materialize()
    os.makedirs(args.out, exist_ok=True)
    out_ds.write_parquet(os.path.join(args.out, args.op.replace("-", "_")))
    _write_metrics(args.out, {
        "command": "events", "op": args.op, "events": args.events,
        "n_input": events.count(), "n_output": out_ds.count(),
        "wall_s": time.time() - t0,
    })
    print(json.dumps({"op": args.op, "n_output": out_ds.count(), "out": args.out}))


def cmd_sketch(args):
    """Mergeable-sketch analytics over any parquet table: approximate
    distinct count (HLL), exact phi-heavy hitters (CMS-prefiltered), and
    histogram quantiles — all shuffle-free aggregate passes."""
    import pyarrow as pa
    import ray

    from .pipelines import sketches as sk

    ds = ray.data.read_parquet(args.input)
    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    if args.op == "distinct":
        est = sk.hll_distinct(ds, args.on, p=args.p)
        result_tbl = pa.table({"column": [args.on], "distinct_est": pa.array([est], pa.int64())})
        summary = {"distinct_est": est}
    elif args.op == "heavy-hitters":
        hh = sk.heavy_hitters(ds.materialize(), args.on, phi=args.phi).materialize()
        hh.write_parquet(os.path.join(args.out, "heavy_hitters"))
        result_tbl = None
        summary = {"n_heavy_hitters": hh.count()}
    else:  # quantiles
        qs = [float(x) for x in args.quantiles.split(",")]
        est = sk.approx_quantiles(ds, args.on, qs=qs, bins=args.bins)
        result_tbl = pa.table({"q": pa.array(qs, pa.float64()),
                               "value": pa.array([est[q] for q in qs], pa.float64())})
        summary = {str(q): est[q] for q in qs}
    if result_tbl is not None:
        import pyarrow.parquet as _pq

        _pq.write_table(result_tbl, os.path.join(args.out, f"{args.op}.parquet"))
    _write_metrics(args.out, {
        "command": "sketch", "op": args.op, "input": args.input, "on": args.on,
        "wall_s": time.time() - t0, **summary,
    })
    print(json.dumps({"op": args.op, "on": args.on, **summary, "out": args.out}))


def cmd_walks(args):
    """Random-walk corpus (+ optional skip-gram pairs / neighbor-sample
    subgraph) from an ingested graph -> parquet + METRICS.json."""
    from .graph import algorithms as alg

    h = _load_graph(args.graph)
    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    if args.p != 1.0 or args.q != 1.0:
        corpus, stats = alg.node2vec_corpus(
            h, nwalks=args.nwalks, walk_len=args.walk_len,
            p=args.p, q=args.q, seed=args.seed)
    else:
        corpus, stats = alg.random_walk_corpus(
            h, nwalks=args.nwalks, walk_len=args.walk_len, seed=args.seed)
    corpus = corpus.materialize()
    corpus.write_parquet(os.path.join(args.out, "corpus"))
    n_pairs = 0
    if args.window > 0:
        from .pipelines.walks import skipgram_pairs

        pairs = skipgram_pairs(corpus, window=args.window).materialize()
        pairs.write_parquet(os.path.join(args.out, "pairs"))
        n_pairs = pairs.count()
    n_sample = 0
    if args.sample_seeds:
        import pyarrow.parquet as _pq

        seeds = [int(s) for s in args.sample_seeds.split(",")]
        fanouts = tuple(int(f) for f in args.fanouts.split(","))
        tab, sstats = alg.neighbor_sample(h, seeds, fanouts, seed=args.seed)
        _pq.write_table(tab, os.path.join(args.out, "sample.parquet"))
        n_sample = sstats["edges"]
    _write_metrics(args.out, {
        "command": "walks", "wall_s": time.time() - t0,
        "n_corpus_rows": corpus.count(), "n_pairs": n_pairs,
        "n_sample_edges": n_sample, **stats,
    })
    h.close()
    print(json.dumps({"walks": stats["walks"], "pairs": n_pairs, "out": args.out}))


def cmd_analyze(args):
    """Extended graph analytics from the job surface: scc | hits |
    kcore | bfs | harmonic | diameter over an ingested graph dir."""
    import ray

    from .graph import algorithms as alg
    from .graph.runtime import GraphHandle

    op = args.op
    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    stats: dict = {}
    if op in ("eigenvector", "katz"):
        h = _load_graph(args.graph)
        try:
            if op == "eigenvector":
                ds, stats = alg.eigenvector_centrality(h, max_iters=args.iters)
            else:
                ds, stats = alg.katz_centrality(h, max_iters=args.iters)
            ds.write_parquet(os.path.join(args.out, op))
        finally:
            h.close()
    elif op == "assortativity":
        from .pipelines.graphstats import degree_assortativity

        edges = ray.data.read_parquet(os.path.join(args.graph, "edges"))
        degrees = ray.data.read_parquet(os.path.join(args.graph, "degrees"))
        n = degrees.count()
        tab = degree_assortativity(edges, degrees, n)
        ray.data.from_arrow(tab).write_parquet(os.path.join(args.out, op))
        stats = {"edges": int(tab["edges"][0].as_py()),
                 "assortativity": float(tab["assortativity"][0].as_py())}
    elif op == "modularity":
        from .pipelines.graphstats import modularity as _modularity

        h = _load_graph(args.graph, sym=True)
        try:
            labels, stats = alg.label_propagation(h, max_rounds=args.iters)
            import pyarrow as pa

            sym_edges = ray.data.read_parquet(
                os.path.join(args.graph, "edges")).map_batches(
                lambda t: pa.concat_tables([
                    t, t.select(["dst", "src"]).rename_columns(["src", "dst"])]),
                batch_format="pyarrow")
            tab = _modularity(sym_edges, labels, h.n)
            ray.data.from_arrow(tab).write_parquet(os.path.join(args.out, op))
            stats = {**stats, "communities": tab.num_rows,
                     "Q": float(__import__("numpy").asarray(tab["q_contrib"]).sum())}
        finally:
            h.close()
    elif op in ("scc", "hits", "betweenness"):
        h = _load_graph(args.graph)
        edges = ray.data.read_parquet(os.path.join(args.graph, "edges"))
        rev = edges.map_batches(
            lambda t: t.select(["dst", "src"]).rename_columns(["src", "dst"]),
            batch_format="pyarrow")
        hr = GraphHandle.from_edges(rev, h.n, P=h.P, m=h.m)
        try:
            if op == "scc":
                ds, stats = alg.scc(h, hr)
            elif op == "betweenness":
                ds, stats = alg.betweenness_centrality(
                    h, hr, n_pivots=args.n_pivots, seed=args.seed)
            else:
                ds, stats = alg.hits(h, hr, max_iters=args.iters)
            ds.write_parquet(os.path.join(args.out, op))
        finally:
            h.close()
            hr.close()
    else:
        h = _load_graph(args.graph, sym=True)
        try:
            if op == "kcore":
                ds, stats = alg.kcore(h)
                ds.write_parquet(os.path.join(args.out, op))
            elif op == "bfs":
                sources = [int(s) for s in args.sources.split(",")]
                ds, stats = alg.bfs_hops(h, sources)
                ds.write_parquet(os.path.join(args.out, op))
            elif op == "mis":
                ds, stats = alg.maximal_independent_set(h, seed=args.seed)
                ds.write_parquet(os.path.join(args.out, op))
            elif op == "color":
                ds, stats = alg.greedy_color(h, seed=args.seed)
                ds.write_parquet(os.path.join(args.out, op))
            elif op in ("ktruss", "trussness"):
                import pyarrow as pa

                from .graph.triangles import ktruss as _ktruss
                from .graph.triangles import trussness as _trussness

                def _both_dirs(t: "pa.Table") -> "pa.Table":
                    return pa.concat_tables([
                        t, t.select(["dst", "src"]).rename_columns(
                            ["src", "dst"])])

                sym_edges = ray.data.read_parquet(
                    os.path.join(args.graph, "edges")).map_batches(
                    _both_dirs, batch_format="pyarrow")
                if op == "ktruss":
                    ds, stats = _ktruss(sym_edges, h.n, k=args.k)
                else:
                    ds, stats = _trussness(sym_edges, h.n)
                ds.write_parquet(os.path.join(args.out, op))
            elif op == "harmonic":
                ds, stats = alg.harmonic_centrality(
                    h, n_pivots=args.n_pivots, seed=args.seed)
                ds.write_parquet(os.path.join(args.out, op))
            elif op == "diameter":
                res, stats = alg.diameter_estimate(h, seed_node=0, sweeps=2)
                with open(os.path.join(args.out, "diameter.json"), "w") as f:
                    json.dump(res, f)
            else:
                raise SystemExit(f"analyze: unknown op {op!r}")
        finally:
            h.close()
    stats = {k: v for k, v in stats.items() if isinstance(v, (int, float, str, list))}
    _write_metrics(args.out, {"command": f"analyze:{op}",
                              "wall_s": time.time() - t0, **stats})
    print(json.dumps({"op": op, "out": args.out}))


def cmd_build_index(args):
    from .graph import algorithms as alg

    h = _load_graph(args.graph)
    t0 = time.time()
    info = alg.build_walk_index(h, eps=args.eps, seed=args.seed, save_dir=args.out)
    _write_metrics(args.out, {"command": "build-index", "wall_s": time.time() - t0, **info})
    h.close()
    print(json.dumps({"index_size": info["index_size"], "out": args.out}))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="fora_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_ingest)

    for name, fn in [("pagerank", cmd_pagerank)]:
        p = sub.add_parser(name)
        p.add_argument("--graph", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--ckpt-dir", default=None)
        p.add_argument("--ckpt-every", type=int, default=10)
        p.add_argument("--resume", action="store_true")
        p.set_defaults(fn=fn)

    p = sub.add_parser("query")
    p.add_argument("--graph", required=True)
    p.add_argument("--source", type=int, default=None)
    p.add_argument("--sources", default=None,
                   help="comma-separated source ids -> batched multi-source tier")
    p.add_argument("--mode", default="fora", choices=["exact", "fora", "fwdpush"])
    p.add_argument("--eps", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("topk")
    p.add_argument("--graph", required=True)
    p.add_argument("--source", type=int, required=True)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--eps", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_topk)

    for name, fn in [("cc", cmd_cc), ("lpa", cmd_lpa), ("triangles", cmd_triangles)]:
        p = sub.add_parser(name)
        p.add_argument("--graph", required=True)
        p.add_argument("--out", required=True)
        if name == "lpa":
            p.add_argument("--max-rounds", type=int, default=20)
        p.set_defaults(fn=fn)

    p = sub.add_parser("walks")
    p.add_argument("--graph", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--nwalks", type=int, default=2)
    p.add_argument("--walk-len", type=int, default=5)
    p.add_argument("--window", type=int, default=2,
                   help="skip-gram window; 0 skips pair generation")
    p.add_argument("--p", type=float, default=1.0,
                   help="node2vec return parameter; p=q=1 -> uniform walks")
    p.add_argument("--q", type=float, default=1.0,
                   help="node2vec in-out parameter; p=q=1 -> uniform walks")
    p.add_argument("--sample-seeds", default=None,
                   help="comma-separated seed node ids -> neighbor-sample subgraph")
    p.add_argument("--fanouts", default="10,5")
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_walks)

    p = sub.add_parser("analyze")
    p.add_argument("--graph", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--op", default="scc",
                   choices=["scc", "hits", "kcore", "bfs", "harmonic", "diameter",
                            "betweenness", "mis", "color", "ktruss", "trussness",
                            "eigenvector", "katz", "assortativity", "modularity"])
    p.add_argument("--sources", default="0")
    p.add_argument("--n-pivots", type=int, default=8)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--k", type=int, default=4, help="ktruss k (>= 3)")
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("build-index")
    p.add_argument("--graph", required=True)
    p.add_argument("--eps", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_build_index)

    p = sub.add_parser("dedup")
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--method", default="exact",
                   choices=["exact", "minhash", "simhash", "ngram", "embedding",
                            "decontaminate"])
    p.add_argument("--bench", default=None,
                   help="benchmark parquet for --method decontaminate")
    p.add_argument("--ngram", type=int, default=8)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--hamming", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--clusters", action="store_true",
                   help="also write connected dup clusters (pair methods)")
    p.set_defaults(fn=cmd_dedup)

    p = sub.add_parser("curate")
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min-quality", type=float, default=0.25)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--langs", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_curate)

    p = sub.add_parser("ann")
    p.add_argument("--embeddings", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--queries", default=None)
    p.add_argument("--method", default="brute", choices=["brute", "ivf", "lsh"])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nq", type=int, default=8)
    p.add_argument("--nlist", type=int, default=16)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--n-tables", type=int, default=16)
    p.add_argument("--n-planes", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_ann)

    p = sub.add_parser("sketch")
    p.add_argument("--input", required=True, help="parquet path/glob")
    p.add_argument("--on", required=True, help="column to sketch")
    p.add_argument("--out", required=True)
    p.add_argument("--op", default="distinct",
                   choices=["distinct", "heavy-hitters", "quantiles"])
    p.add_argument("--p", type=int, default=12, help="HLL precision (2^p registers)")
    p.add_argument("--phi", type=float, default=0.01)
    p.add_argument("--quantiles", default="0.25,0.5,0.75")
    p.add_argument("--bins", type=int, default=4096)
    p.set_defaults(fn=cmd_sketch)

    p = sub.add_parser("events")
    p.add_argument("--events", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--op", default="tumbling",
                   choices=["tumbling", "sliding", "sessions", "top-users", "props"])
    p.add_argument("--window-s", type=int, default=3600)
    p.add_argument("--slide-s", type=int, default=900)
    p.add_argument("--gap-s", type=int, default=1800)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--keys", default="k")
    p.set_defaults(fn=cmd_events)

    args = ap.parse_args(argv)
    _init_ray()
    args.fn(args)


if __name__ == "__main__":
    main()
