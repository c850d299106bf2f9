"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (corpus ingest -> PageRank) on a
deterministic sf0.001-scale corpus fixture.  ``queries()`` exposes one
callable per implemented operator from SURVEY.md section 2 plus the
training-data-pipeline operators; ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one (the driver compares them at
sf=0.01; rows-only checks for the rest — their real correctness gates
live in tests/ against numpy/networkx-style oracles).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import numpy as np

# the fora_ray package lives next to this file; make the import robust
# to whatever cwd the driver imports us from
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

# fixture scale per testdata sf directory (FIXTURES.md: sf-unit /
# sf-correctness / sf-bench)
_SF_FILES = {"0.001": 600, "0.01": 2000, "0.1": 200000}
_GRAPH_CACHE: dict[str, dict] = {}


def _sf_of(sf_dir: str) -> str:
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return name[2:] if name.startswith("sf") else "0.01"


def _fixture_for(sf_dir: str) -> str:
    from fora_ray.fixtures import fixture_dir

    return fixture_dir(_SF_FILES.get(_sf_of(sf_dir), 2000))


def _graph(sf_dir: str) -> dict:
    """Ingest the corpus fixture for this sf once; cache tables + handles."""
    import ray

    from fora_ray.graph.runtime import GraphHandle
    from fora_ray.pipelines.ingest import ingest_fixture

    fix = _fixture_for(sf_dir)
    if fix in _GRAPH_CACHE:
        return _GRAPH_CACHE[fix]
    t = ingest_fixture(fix)
    edges = t["edges"].materialize()
    from fora_ray.stages.shuffle import coalesce_blocks

    sym = coalesce_blocks(t["edges_undirected"])
    n = t["n_nodes"]
    entry = {
        "fix": fix,
        "n": n,
        "nodes": t["nodes"],
        "edges": edges,
        "sym": sym,
        "degrees": t["degrees"],
        "handle": GraphHandle.from_edges(edges, n, P=4),
        "handle_sym": GraphHandle.from_edges(sym, n, P=4),
    }
    _GRAPH_CACHE[fix] = entry
    return entry


def entry() -> Any:
    """Flagship: sf0.001 corpus -> ingest -> PageRank scores."""
    from fora_ray.graph import algorithms as alg

    g = _graph("/root/testdata/sf0.001")
    scores, _ = alg.pagerank(g["handle"])
    return scores.to_pandas().sort_values("node_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _docs(sf_dir):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _emb(sf_dir):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _queries_relational():
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Count

    from fora_ray.pipelines.dedup import add_text_sha256
    from fora_ray.stages.edges import dedup_edges

    def degrees_out(sf_dir):
        orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        return (
            orders.groupby("o_custkey")
            .aggregate(Count(alias_name="out_deg"))
            .rename_columns({"o_custkey": "node_id"})
            .sort("node_id")
        )

    def _lineitem_edges(sf_dir):
        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        return dedup_edges(
            li.map_batches(
                lambda t: pa.table({"src": t["l_orderkey"], "dst": t["l_partkey"]}),
                batch_format="pyarrow",
            )
        )

    def edge_dedup(sf_dir):
        return _lineitem_edges(sf_dir)

    def top_hubs(sf_dir):
        return (
            _lineitem_edges(sf_dir)
            .groupby("src")
            .aggregate(Count(alias_name="cnt"))
            .sort(["cnt", "src"], descending=[True, False])
            .limit(20)
        )

    def join_resolve(sf_dir):
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
        )
        cust = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        )
        return orders.join(
            cust, join_type="inner", num_partitions=8,
            on=("o_custkey",), right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "o_custkey", "o_totalprice", "c_name"]).sort("o_orderkey")

    def sha256_rows(sf_dir):
        return (
            _docs(sf_dir)
            .map_batches(
                lambda t: add_text_sha256(t).select(["doc_id", "text_sha256"]),
                batch_format="pyarrow",
            )
            .sort("doc_id")
        )

    def range_join_shipped(sf_dir):
        # non-equi range join (brief: "as-of join, range join"): every
        # lineitem shipped within [o_orderdate, o_orderdate + 7 days) of
        # ANY order, aggregated per order — counts and integral-quantity
        # sums are exact ints, so the driver's exact compare holds
        import numpy as np

        from fora_ray.pipelines.interval import range_join
        from fora_ray.stages.shuffle import clean_sort, sum_by_key

        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        )
        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_quantity"]
        )
        week_us = 7 * 86400 * 1_000_000

        def widen(t: pa.Table) -> pa.Table:
            lo = t["o_orderdate"].cast(pa.int64())
            hi = pa.array(lo.to_numpy(zero_copy_only=False) + week_us)
            return pa.table({"o_orderkey": t["o_orderkey"],
                             "o_lo": lo.cast(pa.timestamp("us")),
                             "o_hi": hi.cast(pa.timestamp("us"))})

        intervals = orders.map_batches(widen, batch_format="pyarrow")

        def agg_pairs(t: pa.Table) -> pa.Table:
            # partial per-bucket aggregate folded into the join kernel —
            # the full pair set never leaves the bucket
            if t.num_rows == 0:
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "n_items": pa.array([], pa.int64()),
                                 "sum_qty": pa.array([], pa.int64())})
            k = t["o_orderkey"].to_numpy(zero_copy_only=False)
            q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            uk, inv, cnt = np.unique(k, return_inverse=True, return_counts=True)
            acc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(acc, inv, q)
            return pa.table({"o_orderkey": pa.array(uk),
                             "n_items": pa.array(cnt.astype(np.int64)),
                             "sum_qty": pa.array(acc)})

        part = range_join(li, intervals, on="l_shipdate", lo_col="o_lo",
                          hi_col="o_hi", pair_fn=agg_pairs)
        return clean_sort(
            sum_by_key(part, "o_orderkey", ["n_items", "sum_qty"]), "o_orderkey"
        )

    return {
        "degrees_out": degrees_out,
        "edge_dedup": edge_dedup,
        "top_hubs": top_hubs,
        "join_resolve": join_resolve,
        "sha256_rows": sha256_rows,
        "range_join_shipped": range_join_shipped,
    }


def _queries_documents():
    from fora_ray.pipelines.ann import brute_force_topk, ivf_topk, lsh_topk
    from fora_ray.pipelines.dedup import (
        exact_dedup,
        minhash_lsh_dups,
        ngram_jaccard_dups,
        simhash_dups,
    )
    from fora_ray.pipelines.text import (
        fingerprints,
        language_id,
        quality_scores,
        token_counts,
    )

    def _queries_matrix(sf_dir, nq=8):
        # distributed sort + limit: only nq rows ever reach the driver
        # (pulling the whole embeddings table here was the one
        # driver-materialization left in the repo — VERDICT r02 #5)
        t = _emb(sf_dir).sort("vec_id").limit(nq).to_pandas()
        return np.stack(t["embedding"].to_numpy())

    def ann_topk(sf_dir):
        out = brute_force_topk(_emb(sf_dir), _queries_matrix(sf_dir), k=10)
        return out.select_columns(["query_id", "rank", "vec_id"])  # scores float-compared in tests

    def ann_ivf(sf_dir):
        out = ivf_topk(_emb(sf_dir), _queries_matrix(sf_dir), k=10, nlist=16, nprobe=4)
        # ints only in the oracled output (scores are BLAS-shape-sensitive
        # in the last ulp); score correctness is covered by the recall test
        return out.select_columns(["query_id", "rank", "vec_id"])

    def ann_lsh(sf_dir):
        out = lsh_topk(_emb(sf_dir), _queries_matrix(sf_dir), k=10,
                       n_tables=16, n_planes=10, probe_radius=1)
        return out.select_columns(["query_id", "rank", "vec_id"])

    def curation(sf_dir):
        from fora_ray.pipelines.curate import curate_documents

        curated, _stats = curate_documents(_docs(sf_dir), min_quality=0.2)
        return curated.select_columns(["doc_id", "lang_pred"])

    def embedding_dups_q(sf_dir):
        import pandas as pd

        from fora_ray.pipelines.dedup import embedding_dups

        df = embedding_dups(_emb(sf_dir), threshold=0.8).to_pandas()
        if "a" not in df.columns:  # empty result loses its schema
            df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                               "b": pd.Series(dtype="int64")})
        return df[["a", "b"]]

    def multimodal_features_q(sf_dir):
        """Documents' text bytes as opaque media payloads through the
        real multimodal actor-pool pipeline (fake decode: the container
        has no codecs; features = sha256-derived uint16 words)."""
        import pyarrow as pa

        from fora_ray.pipelines.multimodal import ImageDecoder, decode_images

        def to_media(t: pa.Table) -> pa.Table:
            texts = t["text"].to_pylist()
            return pa.table({
                "media_id": t["doc_id"],
                "kind": pa.array(["image"] * t.num_rows, pa.string()),
                "payload": pa.array([(x or "").encode() for x in texts], pa.binary()),
            })

        media = _docs(sf_dir).map_batches(to_media, batch_format="pyarrow")
        feats = decode_images(media, fake=True)
        dim = ImageDecoder.FEATURE_DIM

        def widen(t: pa.Table) -> pa.Table:
            M = np.rint(
                np.stack([np.asarray(v, dtype=np.float64) for v in t["features"].to_pylist()])
                * 65535.0
            ).astype(np.int64) if t.num_rows else np.zeros((0, dim), np.int64)
            out = {"media_id": t["media_id"]}
            for i in range(dim):
                out[f"f{i}"] = pa.array(M[:, i])
            return pa.table(out)

        return feats.map_batches(widen, batch_format="pyarrow").sort("media_id")

    def multimodal_decode_q(sf_dir):
        """REAL stdlib-codec decode end-to-end (no fake features): a
        deterministic synthetic corpus of BMP/PPM images and PCM-16 WAV
        clips flows payload -> actor-pool decode -> pixel/sample
        statistics.  The golden regenerates the SOURCE arrays from the
        same RNG stream and featurizes them WITHOUT the codecs
        (fora_ray/goldens.py multimodal_decode_golden)."""
        import pyarrow as pa
        import ray

        from fora_ray.goldens import ROUND
        from fora_ray.pipelines.multimodal import (
            decode_audio, decode_images, synthesize_media_table)

        media = ray.data.from_arrow(synthesize_media_table(60, seed=7, real=True))
        dim = 16

        def widen(kind):
            def _w(t: pa.Table) -> pa.Table:
                M = np.round(np.stack(
                    [np.asarray(v, np.float64) for v in t["features"].to_pylist()]
                ), ROUND) if t.num_rows else np.zeros((0, dim))
                out = {"media_id": t["media_id"],
                       "kind": pa.array([kind] * t.num_rows, pa.string())}
                for j in range(dim):
                    out[f"f{j}"] = pa.array(M[:, j], pa.float64())
                return pa.table(out)
            return _w

        imgs = decode_images(media, fake=False).map_batches(
            widen("image"), batch_format="pyarrow")
        auds = decode_audio(media, fake=False).map_batches(
            widen("audio"), batch_format="pyarrow")
        return imgs.union(auds).sort("media_id")

    def video_frames_q(sf_dir):
        """REAL video decode end-to-end: the corpus's uncompressed-AVI
        rows flow payload -> actor-pool decode_avi_raw -> per-frame
        mean luminance (FrameSampler at the container's own rate).  The
        golden regenerates the SOURCE frame arrays from the same RNG
        stream without the codec (goldens.video_frames_golden)."""
        import ray

        from fora_ray.goldens import ROUND
        from fora_ray.pipelines.multimodal import (
            sample_frames, synthesize_media_table)

        media = ray.data.from_arrow(synthesize_media_table(60, seed=7, real=True))
        df = (sample_frames(media, fps=8.0, fake=False).to_pandas()
              .sort_values(["media_id", "frame_idx"]).reset_index(drop=True))
        df["mean_lum"] = df["mean_lum"].round(ROUND)
        return df

    def dup_clusters_q(sf_dir):
        from fora_ray.pipelines.dedup import dup_clusters

        docs = _docs(sf_dir)
        pairs = minhash_lsh_dups(docs, threshold=0.6)
        return dup_clusters(pairs, docs)

    def redact_pii_q(sf_dir):
        """The synthetic documents carry no PII, so the query plants
        deterministic doc_id-derived URL/email/IPv4 strings on BOTH
        sides (same || expression in the SQL oracle) — the redaction
        regexes are exercised on every row, not vacuously."""
        from fora_ray.pipelines.text import redact

        def augment(t):
            import pyarrow as _pa
            import pyarrow.compute as _pc

            ids = _pc.cast(t["doc_id"], _pa.string())
            mod = _pc.cast(_pc.bit_wise_and(t["doc_id"], 255), _pa.string())
            aug = _pc.binary_join_element_wise(
                _pc.fill_null(t["text"], ""), " contact user", ids,
                "@mail.example.com via https://host.example/d/", ids,
                " at 10.1.", mod, ".7", "")
            return _pa.table({"doc_id": t["doc_id"], "text": aug})

        return redact(_docs(sf_dir).map_batches(augment, batch_format="pyarrow"))

    def decontaminate_q(sf_dir):
        from fora_ray.pipelines.dedup import decontaminate

        docs = _docs(sf_dir)
        bench = docs.sort("doc_id").limit(5)
        return decontaminate(docs, bench, ngram=8)

    return {
        "curation": curation,
        "embedding_dups": embedding_dups_q,
        "dup_clusters": dup_clusters_q,
        "multimodal_features": multimodal_features_q,
        "multimodal_decode": multimodal_decode_q,
        "video_frames": video_frames_q,
        "docs_exact_dedup": lambda sf: exact_dedup(_docs(sf)),
        "chunk_dedup": lambda sf: (
            __import__("fora_ray.pipelines.dedup", fromlist=["chunk_dedup_stats"])
            .chunk_dedup_stats(_docs(sf), chunk_words=20)
        ),
        "decontaminate": decontaminate_q,
        "redact_pii": redact_pii_q,
        "token_counts": lambda sf: token_counts(_docs(sf)),
        "pack_sequences": lambda sf: (
            __import__("fora_ray.pipelines.text", fromlist=["pack_sequences"])
            .pack_sequences(_docs(sf), budget=512).sort("doc_id")
        ),
        "mixture_sample": lambda sf: (
            __import__("fora_ray.pipelines.text", fromlist=["mixture_sample"])
            .mixture_sample(_docs(sf), strata_col="lang", alpha=0.5,
                            target_rows=1000)
            .select_columns(["doc_id", "lang"]).sort("doc_id")
        ),
        "stratified_sample": lambda sf: (
            __import__("fora_ray.pipelines.text", fromlist=["stratified_sample"])
            .stratified_sample(_docs(sf), strata_col="lang", frac=0.2)
            .select_columns(["doc_id", "lang", "n_chars"])
            .sort("doc_id")
        ),
        "repetition_signals": lambda sf: (
            __import__("fora_ray.pipelines.text", fromlist=["repetition_signals"])
            .repetition_signals(_docs(sf))
            .select_columns(["doc_id", "n_lines", "n_distinct_lines",
                             "dup_line_frac"])
        ),
        "tfidf_topk": lambda sf: (
            __import__("fora_ray.pipelines.text", fromlist=["tfidf_topk"])
            .tfidf_topk(_docs(sf), k=5).to_pandas()
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        ),
        "lm_quality": lambda sf: (
            __import__("fora_ray.pipelines.text", fromlist=["lm_quality"])
            .lm_quality(_docs(sf), min_count=5)
        ),
        "doc_quality": lambda sf: quality_scores(_docs(sf)).select_columns(
            ["doc_id", "n_chars", "n_tokens"]
        ),
        "langid": lambda sf: language_id(_docs(sf)),
        "doc_fingerprints": lambda sf: fingerprints(_docs(sf)),
        "minhash_dups": lambda sf: minhash_lsh_dups(_docs(sf), threshold=0.6).select_columns(["a", "b"]),
        "ngram_jaccard_dups": lambda sf: ngram_jaccard_dups(_docs(sf), threshold=0.5).select_columns(["a", "b"]),
        "simhash_dups": lambda sf: simhash_dups(_docs(sf), hamming_thresh=3).select_columns(["a", "b"]),
        "ann_topk": ann_topk,
        "ann_ivf": ann_ivf,
        "ann_lsh": ann_lsh,
    }


def _queries_graph():
    from fora_ray.graph import algorithms as alg
    from fora_ray.graph.triangles import triangle_count

    def ingest_nodes(sf_dir):
        return _graph(sf_dir)["nodes"].to_pandas().sort_values("node_id").reset_index(drop=True)

    def ingest_edges(sf_dir):
        return (
            _graph(sf_dir)["edges"].to_pandas()
            .sort_values(["src", "dst"]).reset_index(drop=True)
        )

    def ingest_degrees(sf_dir):
        return _graph(sf_dir)["degrees"].to_pandas().reset_index(drop=True)

    def _rounded(scores_ds):
        # goldens are rounded to fora_ray.goldens.ROUND decimals; engine
        # matches the numpy oracle to ~1e-12, so the same np.round on
        # both sides hash-matches with ~3 orders of magnitude of slack
        from fora_ray.goldens import ROUND

        df = scores_ds.to_pandas().sort_values("node_id").reset_index(drop=True)
        df["ppr"] = df["ppr"].round(ROUND)
        return df

    def pagerank_q(sf_dir):
        g = _graph(sf_dir)
        scores, _ = alg.pagerank(g["handle"])
        return _rounded(scores)

    def ppr_exact(sf_dir):
        g = _graph(sf_dir)
        scores, _ = alg.personalized_pagerank(g["handle"], source=0, mode="exact")
        return _rounded(scores)

    def fora_ppr(sf_dir):
        g = _graph(sf_dir)
        scores, _ = alg.personalized_pagerank(g["handle"], source=0, mode="fora", seed=42)
        return _rounded(scores)

    def topk_ppr_q(sf_dir):
        from fora_ray.goldens import ROUND

        g = _graph(sf_dir)
        top, _ = alg.topk_ppr(g["handle"], source=0, k=10, seed=42)
        df = top.to_pandas().reset_index(drop=True)
        df["ppr"] = df["ppr"].round(ROUND)
        return df

    def cc_q(sf_dir):
        g = _graph(sf_dir)
        labels, _ = alg.connected_components(g["handle_sym"])
        return labels.to_pandas().sort_values("node_id").reset_index(drop=True)

    def lpa_q(sf_dir):
        g = _graph(sf_dir)
        labels, _ = alg.label_propagation(g["handle_sym"], max_rounds=20)
        return labels.to_pandas().sort_values("node_id").reset_index(drop=True)

    def triangles_q(sf_dir):
        g = _graph(sf_dir)
        per, _total = triangle_count(g["sym"], g["n"])
        return per.to_pandas().reset_index(drop=True)

    def kcore_q(sf_dir):
        g = _graph(sf_dir)
        cores, _stats = alg.kcore(g["handle_sym"])
        return cores.to_pandas().sort_values("node_id").reset_index(drop=True)

    def ktruss_q(sf_dir):
        from fora_ray.graph.triangles import ktruss

        g = _graph(sf_dir)
        edges, _stats = ktruss(g["sym"], g["n"], k=3)
        return (edges.to_pandas()
                .sort_values(["lo", "hi"]).reset_index(drop=True))

    def trussness_q(sf_dir):
        from fora_ray.graph.triangles import trussness

        g = _graph(sf_dir)
        edges, _stats = trussness(g["sym"], g["n"])
        return (edges.to_pandas()
                .sort_values(["lo", "hi"]).reset_index(drop=True))

    def link_pred_q(sf_dir):
        from fora_ray.goldens import ROUND
        from fora_ray.graph.linkpred import link_prediction

        g = _graph(sf_dir)
        ds = link_prediction(g["sym"], g["n"], min_cn=2)
        df = ds.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        df["jaccard"] = df["jaccard"].round(ROUND)
        df["adamic_adar"] = df["adamic_adar"].round(ROUND)
        return df

    def hits_q(sf_dir):
        from fora_ray.goldens import ROUND
        from fora_ray.graph.runtime import GraphHandle

        g = _graph(sf_dir)

        def _swap(t):
            import pyarrow as _pa

            return _pa.table({"src": t["dst"], "dst": t["src"]})

        rev = g["edges"].map_batches(_swap, batch_format="pyarrow")
        handle_rev = GraphHandle.from_edges(rev, g["n"], P=4)
        try:
            scores, _stats = alg.hits(g["handle"], handle_rev, max_iters=40)
            df = scores.to_pandas().sort_values("node_id").reset_index(drop=True)
        finally:
            handle_rev.close()
        df["hub"] = df["hub"].round(ROUND)
        df["authority"] = df["authority"].round(ROUND)
        return df

    def bfs_q(sf_dir):
        g = _graph(sf_dir)
        dists, stats = alg.bfs_hops(g["handle_sym"], [0])
        # oracle recursive CTE caps depth at 64 — engine rounds must fit
        assert stats["rounds"] < 60, stats
        return dists.to_pandas().sort_values("node_id").reset_index(drop=True)

    def diameter_est_q(sf_dir):
        import pandas as pd

        g = _graph(sf_dir)
        res, _stats = alg.diameter_estimate(g["handle_sym"], seed_node=0, sweeps=2)
        return pd.DataFrame({k: [v] for k, v in res.items()})

    def clustering_coeff_q(sf_dir):
        from fora_ray.goldens import ROUND
        from fora_ray.graph.triangles import clustering_coefficient

        g = _graph(sf_dir)
        lcc = clustering_coefficient(g["sym"], g["n"])
        df = lcc.to_pandas().sort_values("node_id").reset_index(drop=True)
        # engine and DuckDB both evaluate 2.0*t/(d*(d-1)) in float64 —
        # bit-identical; the round is belt-and-braces (goldens.ROUND)
        df["lcc"] = df["lcc"].round(ROUND)
        return df

    def ppr_batch_q(sf_dir):
        from fora_ray.goldens import ROUND

        g = _graph(sf_dir)
        scores, _ = alg.ppr_batch(g["handle"], [0, 1, 2, 3], mode="fora", seed=42)
        df = (
            scores.to_pandas()
            .sort_values(["query_idx", "node_id"]).reset_index(drop=True)
        )
        df["ppr"] = df["ppr"].round(ROUND)
        return df

    def monte_carlo_q(sf_dir):
        g = _graph(sf_dir)
        scores, _ = alg.monte_carlo_ppr(g["handle"], source=0, seed=42)
        return _rounded(scores)

    def fora_indexed_q(sf_dir):
        from fora_ray.graph.algorithms import build_walk_index, fora_ssppr_indexed

        g = _graph(sf_dir)
        if "walk_index" not in g:
            build_walk_index(g["handle"], seed=42)
            g["walk_index"] = True
        scores, _ = fora_ssppr_indexed(g["handle"], source=0, seed=42)
        return _rounded(scores)

    def backward_ppr_q(sf_dir):
        import ray

        from fora_ray.graph.runtime import GraphHandle

        g = _graph(sf_dir)
        if "handle_rev" not in g:
            g["handle_rev"] = GraphHandle.from_reverse_edges(g["edges"], g["n"], P=4)
        # target = highest in-degree node
        deg = g["degrees"].to_pandas()
        target = int(deg.sort_values(["in_deg", "node_id"], ascending=[False, True]).iloc[0]["node_id"])
        scores, _ = alg.backward_ppr(g["handle_rev"], target, mode="exact")
        from fora_ray.goldens import ROUND

        df = scores.to_pandas().sort_values("node_id").reset_index(drop=True)
        df["ppr"] = df["ppr"].round(ROUND)
        return df

    def hubppr_q(sf_dir):
        import pandas as pd

        from fora_ray.goldens import ROUND
        from fora_ray.graph.runtime import GraphHandle

        g = _graph(sf_dir)
        if "handle_rev" not in g:
            g["handle_rev"] = GraphHandle.from_reverse_edges(g["edges"], g["n"], P=4)
        hf, hr = g["handle"], g["handle_rev"]
        if "hub_index" not in g:
            alg.build_hub_index(hf, alg.select_hubs(hf, 16), pool_size=512, seed=42)
            alg.build_backward_hub_oracle(hr, alg.select_hubs(hr, 16), rmax_hub=1e-4)
            g["hub_index"] = True
        deg = g["degrees"].to_pandas()
        targets = [
            int(t) for t in deg.sort_values(
                ["in_deg", "node_id"], ascending=[False, True]
            )["node_id"].head(2)
        ]
        rows = [
            (s, t, alg.hubppr(hf, hr, s, t, eps=0.5, seed=42)[0])
            for t in targets for s in (0, 1, 2, 3)
        ]
        df = pd.DataFrame(rows, columns=["source", "target", "ppr"])
        df["ppr"] = df["ppr"].round(ROUND)
        return df

    def harmonic_q(sf_dir):
        from fora_ray.goldens import ROUND

        g = _graph(sf_dir)
        ds, _stats = alg.harmonic_centrality(g["handle_sym"], n_pivots=8, seed=42)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
        df["harmonic"] = df["harmonic"].round(ROUND)
        return df

    def scc_q(sf_dir):
        from fora_ray.graph.runtime import GraphHandle

        g = _graph(sf_dir)
        if "handle_rev" not in g:
            g["handle_rev"] = GraphHandle.from_reverse_edges(g["edges"], g["n"], P=4)
        ds, _stats = alg.scc(g["handle"], g["handle_rev"])
        return ds.to_pandas().sort_values("node_id").reset_index(drop=True)

    def mis_q(sf_dir):
        g = _graph(sf_dir)
        ds, _stats = alg.maximal_independent_set(g["handle_sym"], seed=42)
        return ds.to_pandas().sort_values("node_id").reset_index(drop=True)

    def greedy_color_q(sf_dir):
        g = _graph(sf_dir)
        ds, _stats = alg.greedy_color(g["handle_sym"], seed=42)
        return ds.to_pandas().sort_values("node_id").reset_index(drop=True)

    def betweenness_q(sf_dir):
        from fora_ray.graph.runtime import GraphHandle

        g = _graph(sf_dir)
        if "handle_rev" not in g:
            g["handle_rev"] = GraphHandle.from_reverse_edges(g["edges"], g["n"], P=4)
        ds, _stats = alg.betweenness_centrality(g["handle"], g["handle_rev"],
                                                n_pivots=8, seed=42)
        df = ds.to_pandas().sort_values("node_id").reset_index(drop=True)
        df["betweenness"] = df["betweenness"].round(6)
        return df

    def walk_corpus_q(sf_dir):
        g = _graph(sf_dir)
        ds, _stats = alg.random_walk_corpus(g["handle"], nwalks=2,
                                            walk_len=5, seed=42)
        return (ds.to_pandas()
                .sort_values(["walk_id", "step"]).reset_index(drop=True))

    def node2vec_corpus_q(sf_dir):
        g = _graph(sf_dir)
        ds, _stats = alg.node2vec_corpus(g["handle"], nwalks=2, walk_len=5,
                                         p=0.5, q=2.0, seed=42)
        return (ds.to_pandas()
                .sort_values(["walk_id", "step"]).reset_index(drop=True))

    def skipgram_pairs_q(sf_dir):
        from fora_ray.pipelines.walks import skipgram_pairs

        g = _graph(sf_dir)
        corpus, _ = alg.random_walk_corpus(g["handle"], nwalks=2,
                                           walk_len=5, seed=42)
        return (skipgram_pairs(corpus, window=2).to_pandas()
                .sort_values(["center", "context"]).reset_index(drop=True))

    def neighbor_sample_q(sf_dir):
        g = _graph(sf_dir)
        tab, _stats = alg.neighbor_sample(g["handle"], seeds=range(8),
                                          fanouts=(3, 2), seed=42)
        return (tab.to_pandas()
                .sort_values(["hop", "src", "dst"]).reset_index(drop=True))

    def ego_network_q(sf_dir):
        g = _graph(sf_dir)
        ds, _stats = alg.ego_network(g["handle_sym"], g["sym"],
                                     seed_node=0, k=2)
        return ds.to_pandas().reset_index(drop=True)

    def local_cluster_q(sf_dir):
        from fora_ray.goldens import ROUND

        g = _graph(sf_dir)
        tab, _stats = alg.local_cluster(g["handle_sym"], g["sym"],
                                        seed_node=0, rmax=1e-4)
        df = tab.to_pandas().sort_values("node_id").reset_index(drop=True)
        df["ppr"] = df["ppr"].round(ROUND)
        return df

    def assortativity_q(sf_dir):
        from fora_ray.pipelines.graphstats import degree_assortativity

        g = _graph(sf_dir)
        return degree_assortativity(g["edges"], g["degrees"], g["n"]).to_pandas()

    def modularity_q(sf_dir):
        from fora_ray.pipelines.graphstats import modularity

        g = _graph(sf_dir)
        labels, _ = alg.label_propagation(g["handle_sym"], max_rounds=20)
        return modularity(g["sym"], labels, g["n"]).to_pandas()

    def eigenvector_q(sf_dir):
        from fora_ray.goldens import ROUND

        g = _graph(sf_dir)
        scores, _ = alg.eigenvector_centrality(g["handle"], max_iters=30)
        df = scores.to_pandas().sort_values("node_id").reset_index(drop=True)
        df["ev"] = df["ev"].round(ROUND)
        return df

    def katz_q(sf_dir):
        from fora_ray.goldens import ROUND

        g = _graph(sf_dir)
        scores, _ = alg.katz_centrality(g["handle"], alpha=0.01, beta=1.0,
                                        max_iters=30)
        df = scores.to_pandas().sort_values("node_id").reset_index(drop=True)
        df["katz"] = df["katz"].round(ROUND)
        return df

    return {
        "ingest_nodes": ingest_nodes,
        "ingest_edges": ingest_edges,
        "ingest_degrees": ingest_degrees,
        "pagerank": pagerank_q,
        "eigenvector": eigenvector_q,
        "katz": katz_q,
        "assortativity": assortativity_q,
        "modularity": modularity_q,
        "local_cluster": local_cluster_q,
        "ego_network": ego_network_q,
        "ppr_exact": ppr_exact,
        "fora_ppr": fora_ppr,
        "ppr_batch": ppr_batch_q,
        "monte_carlo_ppr": monte_carlo_q,
        "fora_indexed": fora_indexed_q,
        "backward_ppr": backward_ppr_q,
        "hubppr": hubppr_q,
        "topk_ppr": topk_ppr_q,
        "cc": cc_q,
        "lpa": lpa_q,
        "triangles": triangles_q,
        "clustering_coeff": clustering_coeff_q,
        "bfs_hops": bfs_q,
        "kcore": kcore_q,
        "ktruss": ktruss_q,
        "trussness": trussness_q,
        "hits": hits_q,
        "link_pred": link_pred_q,
        "diameter_est": diameter_est_q,
        "walk_corpus": walk_corpus_q,
        "node2vec_corpus": node2vec_corpus_q,
        "betweenness": betweenness_q,
        "mis": mis_q,
        "greedy_color": greedy_color_q,
        "scc": scc_q,
        "harmonic": harmonic_q,
        "skipgram_pairs": skipgram_pairs_q,
        "neighbor_sample": neighbor_sample_q,
    }


def _queries_events():
    import ray

    from fora_ray.pipelines.events import (
        session_windows,
        top_users_by_value,
        tumbling_window,
    )

    def _ev(sf_dir):
        return ray.data.read_parquet(f"{sf_dir}/events.parquet")

    def events_tumbling(sf_dir):
        # counts only in the oracled output: float sums are verified with
        # tolerance in tests (bit-level summation order differs from SQL)
        return tumbling_window(_ev(sf_dir), window_s=3600).select_columns(
            ["window_start", "event_type", "n_events"]
        )

    def events_top_users(sf_dir):
        return top_users_by_value(_ev(sf_dir), k=10).select_columns(
            ["user_id", "n_events"]
        )

    def events_sliding(sf_dir):
        from fora_ray.pipelines.events import sliding_window_counts

        return sliding_window_counts(_ev(sf_dir), window_s=3600, slide_s=1800).select_columns(
            ["window_start", "n_events"]
        )

    def events_props(sf_dir):
        from fora_ray.pipelines.events import parse_props

        return parse_props(_ev(sf_dir), ["k"]).sort("event_id")

    def events_distinct_users(sf_dir):
        # mergeable-sketch distinct count: shuffle-free aggregate whose
        # register max-merge makes the result partition-invariant, so the
        # pure-python golden replay (goldens.distinct_users_hll_golden)
        # matches bit-for-bit
        import pandas as pd

        from fora_ray.pipelines.sketches import hll_distinct

        est = hll_distinct(_ev(sf_dir), "user_id", p=12)
        return pd.DataFrame({"distinct_users": [est]})

    def events_heavy_hitters(sf_dir):
        # CMS-prefiltered EXACT phi-heavy hitters (plain SQL oracle)
        from fora_ray.pipelines.sketches import heavy_hitters

        return heavy_hitters(_ev(sf_dir), "user_id", phi=0.008)

    def events_value_quantiles(sf_dir):
        # fixed-bin histogram quantiles: two shuffle-free aggregates,
        # order-invariant sum-merge -> bit-identical to the pure-python
        # golden replay (goldens.value_quantiles_golden)
        import pandas as pd

        from fora_ray.goldens import ROUND
        from fora_ray.pipelines.sketches import approx_quantiles

        qs = (0.1, 0.5, 0.9)
        est = approx_quantiles(_ev(sf_dir), "value", qs=qs)
        return pd.DataFrame({
            "q": [float(q) for q in qs],
            "value": [round(est[float(q)], ROUND) for q in qs],
        })

    def events_asof_checkpoint(sf_dir):
        # as-of join: each event -> latest strictly-earlier checkpoint
        # event (event_id % 37 == 0) of the same user; plain SQL oracle
        import pyarrow as pa

        from fora_ray.pipelines.asof import asof_join_latest

        ev = _ev(sf_dir)

        def only_ckpts(t: pa.Table) -> pa.Table:
            eid = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(eid % 37 == 0))

        ckpt = ev.map_batches(only_ckpts, batch_format="pyarrow")
        out = asof_join_latest(ev, ckpt, key="user_id", ts_col="ts",
                               order_col="event_id", value_col="event_id",
                               out_col="ckpt_id")

        def fill(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # no-match -> -1 (NaN != NaN under the driver's exact compare)
            return t.set_column(t.schema.get_field_index("ckpt_id"), "ckpt_id",
                                pc.fill_null(t["ckpt_id"], -1))

        out = out.map_batches(fill, batch_format="pyarrow")
        return out.select_columns(["event_id", "ckpt_id"]).sort("event_id")

    def events_sessions(sf_dir):
        # (user_id, session_start, n_events): enough to pin each session
        # exactly; sum_value is float and verified with tolerance in tests
        return session_windows(_ev(sf_dir), gap_s=1800).select_columns(
            ["user_id", "session_start", "n_events"]
        )

    def events_funnel(sf_dir):
        from fora_ray.pipelines.events import funnel

        return funnel(_ev(sf_dir), ["view", "click", "purchase"],
                      window_s=86400)

    return {
        "events_tumbling": events_tumbling,
        "events_sliding": events_sliding,
        "events_top_users": events_top_users,
        "events_sessions": events_sessions,
        "events_funnel": events_funnel,
        "events_props": events_props,
        "events_distinct_users": events_distinct_users,
        "events_heavy_hitters": events_heavy_hitters,
        "events_value_quantiles": events_value_quantiles,
        "events_asof_checkpoint": events_asof_checkpoint,
    }


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(_queries_relational())
    out.update(_queries_documents())
    out.update(_queries_graph())
    out.update(_queries_events())
    return out


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views region nation customer supplier part orders
# lineitem events documents embeddings are pre-registered)
# ---------------------------------------------------------------------------

def _redact_sql() -> str:
    """Oracle for redact_pii: DuckDB's regexp_* is RE2, the same engine
    as the pyarrow compute kernels the pipeline uses — the patterns are
    imported from the pipeline module (single source of truth)."""
    from fora_ray.pipelines.text import REDACTIONS

    aug = (
        "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@mail.example.com via https://host.example/d/' || CAST(doc_id AS VARCHAR) || "
        "' at 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    )
    red = "aug"
    counts = []
    for name, pat, rep in REDACTIONS:
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
        counts.append(
            f"CAST(length(regexp_extract_all(aug, '{pat}')) AS BIGINT) AS {name}")
    return (
        f"SELECT doc_id, {red} AS redacted, {', '.join(counts)} "
        f"FROM (SELECT doc_id, {aug} AS aug FROM documents) ORDER BY doc_id"
    )


def oracle_sql() -> dict[str, str]:
    # the driver compares at sf0.01 -> embed that fixture's path (and make
    # sure it exists before DuckDB reads it).  FORA_ORACLE_SF_DIR overrides
    # the pinned sf so the repo's own gate replica (tools/check_driver.py,
    # tests/test_full_gate.py) can run the SAME oracle layer at any sf —
    # the external driver never sets it.
    import os as _os

    from fora_ray.goldens import write_goldens

    sf01 = _os.environ.get("FORA_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    fix = _fixture_for(sf01)
    corpus = f"{fix}/corpus/*.parquet"
    golden_edges = f"{fix}/edges.parquet"
    # single-process reference computations written to parquet (numpy
    # power iteration, python LPA, reimplemented MinHash/SimHash/langid/
    # fingerprint pipelines) — see fora_ray/goldens.py for the
    # independence layering
    gold = write_goldens(fix, sf01)

    nodes_sql = (
        "SELECT CAST(row_number() OVER (ORDER BY repo, path) - 1 AS BIGINT) AS node_id, "
        f"repo, path FROM read_parquet('{corpus}')"
    )
    degrees_sql = f"""
        WITH e AS (SELECT src, dst FROM read_parquet('{golden_edges}')),
             n AS ({nodes_sql})
        SELECT n.node_id,
               CAST(coalesce(o.c, 0) AS BIGINT) AS out_deg,
               CAST(coalesce(i.c, 0) AS BIGINT) AS in_deg
        FROM n
        LEFT JOIN (SELECT src, count(*) AS c FROM e GROUP BY src) o ON n.node_id = o.src
        LEFT JOIN (SELECT dst, count(*) AS c FROM e GROUP BY dst) i ON n.node_id = i.dst
        ORDER BY n.node_id
    """
    triangles_sql = f"""
        WITH e AS (SELECT src, dst FROM read_parquet('{golden_edges}')),
             und AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
             canon AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM und WHERE u <> v),
             tri AS (
               SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM canon e1
               JOIN canon e2 ON e1.b = e2.a
               JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
             ),
             members AS (
               SELECT x AS node_id FROM tri
               UNION ALL SELECT y FROM tri
               UNION ALL SELECT z FROM tri
             ),
             n AS ({nodes_sql})
        SELECT n.node_id, CAST(coalesce(m.c, 0) AS BIGINT) AS triangles
        FROM n LEFT JOIN (SELECT node_id, count(*) AS c FROM members GROUP BY 1) m
          ON n.node_id = m.node_id
        ORDER BY n.node_id
    """
    ann_sql = """
        WITH q AS (
          SELECT vec_id AS query_id, embedding FROM embeddings
          ORDER BY vec_id LIMIT 8
        ),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 list_cosine_similarity(e.embedding, q.embedding) AS score
          FROM embeddings e CROSS JOIN q
        ),
        ranked AS (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id
        FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """
    return {
        "degrees_out": (
            "SELECT o_custkey AS node_id, CAST(count(*) AS BIGINT) AS out_deg "
            "FROM orders GROUP BY o_custkey ORDER BY node_id"
        ),
        "edge_dedup": (
            "SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem "
            "ORDER BY src, dst"
        ),
        "top_hubs": (
            "WITH e AS (SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem) "
            "SELECT src, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY src "
            "ORDER BY cnt DESC, src LIMIT 20"
        ),
        "join_resolve": (
            "SELECT o_orderkey, o_custkey, o_totalprice, c_name "
            "FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"
        ),
        "sha256_rows": "SELECT doc_id, sha256(text) AS text_sha256 FROM documents ORDER BY doc_id",
        "range_join_shipped": """
            SELECT o.o_orderkey,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM orders o JOIN lineitem l
              ON l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "docs_exact_dedup": (
            "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"
        ),
        "chunk_dedup": (
            # fixed-granularity (20-word) exact substring dedup: per-doc
            # chunk counts + globally-duplicated chunk counts (first
            # occurrence by (doc_id, chunk_idx) kept)
            "WITH w AS ("
            "  SELECT doc_id, string_split(text, ' ') AS ws FROM documents"
            "), ch AS ("
            "  SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_idx,"
            "         array_to_string(ws[t.i * 20 + 1 : (t.i + 1) * 20], ' ') AS chunk"
            "  FROM w, UNNEST(range(CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS t(i)"
            "), rk AS ("
            "  SELECT doc_id, chunk_idx, row_number() OVER ("
            "    PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn"
            "  FROM ch"
            ") SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,"
            "  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)"
            "    AS n_dup_chunks"
            " FROM rk GROUP BY doc_id ORDER BY doc_id"
        ),
        "pack_sequences": (
            "WITH toks AS ("
            "  SELECT doc_id,"
            "  CAST(length(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_tokens"
            "  FROM documents"
            ") SELECT doc_id, n_tokens,"
            "  CAST(FLOOR(COALESCE(SUM(n_tokens) OVER ("
            "    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
            "  ), 0) / 512) AS BIGINT) AS seq_id "
            "FROM toks ORDER BY doc_id"
        ),
        "stratified_sample": (
            # engine folds NULL lang into the '' stratum — partition on
            # COALESCE so both sides stratify identically
            "WITH ranked AS ("
            "  SELECT doc_id, lang, n_chars,"
            "  row_number() OVER (PARTITION BY COALESCE(lang, '')"
            "    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,"
            "  COUNT(*) OVER (PARTITION BY COALESCE(lang, '')) AS n_s"
            "  FROM documents"
            ") SELECT doc_id, lang, n_chars FROM ranked "
            "WHERE rn <= CEIL(0.2 * n_s) ORDER BY doc_id"
        ),
        "mixture_sample": (
            # temperature-scaled mixing: quota_s = min(n_s,
            # floor(1000 * n_s^0.5 / sum n_t^0.5 + 0.5)).  The engine
            # folds NULL lang into the '' stratum; COALESCE mirrors that
            # (a plain JOIN USING (lang) would silently drop NULL-lang
            # rows — NULL never equi-joins).
            "WITH d AS (SELECT doc_id, lang, COALESCE(lang, '') AS s"
            "  FROM documents"
            "), cnt AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n"
            "  FROM d GROUP BY 1"
            "), tot AS (SELECT SUM(POWER(CAST(n AS DOUBLE), 0.5)) AS z FROM cnt"
            "), q AS (SELECT s, LEAST(n, CAST(FLOOR("
            "    1000 * POWER(CAST(n AS DOUBLE), 0.5) / tot.z + 0.5"
            "  ) AS BIGINT)) AS quota FROM cnt, tot"
            "), rk AS (SELECT doc_id, lang, s, row_number() OVER ("
            "    PARTITION BY s"
            "    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn"
            "  FROM d"
            ") SELECT rk.doc_id, rk.lang FROM rk JOIN q USING (s)"
            " WHERE rk.rn <= q.quota ORDER BY doc_id"
        ),
        "repetition_signals": (
            "WITH lines AS ("
            "  SELECT d.doc_id, l.ln FROM documents d,"
            "  unnest(string_split(d.text, chr(10))) AS l(ln)"
            "  WHERE l.ln <> ''"
            "), agg AS ("
            "  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,"
            "  CAST(COUNT(DISTINCT ln) AS BIGINT) AS n_distinct_lines,"
            "  1.0 - COUNT(DISTINCT ln) / CAST(COUNT(*) AS DOUBLE) AS dup_line_frac"
            "  FROM lines GROUP BY 1"
            ") SELECT d.doc_id,"
            "  COALESCE(a.n_lines, CAST(0 AS BIGINT)) AS n_lines,"
            "  COALESCE(a.n_distinct_lines, CAST(0 AS BIGINT)) AS n_distinct_lines,"
            "  COALESCE(a.dup_line_frac, 0.0) AS dup_line_frac "
            "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"
        ),
        "lm_quality": (
            # corpus-trained unigram LM cross-entropy per doc (CCNet
            # shape): p(term) = cnt/total if cnt >= 5 else 0.5/total
            "WITH toks AS ("
            "  SELECT doc_id, t.tok AS term FROM documents,"
            "  unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(tok)"
            "  WHERE t.tok <> ''"
            "), tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf"
            "  FROM toks GROUP BY 1, 2"
            "), cnt AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1"
            "), tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM cnt"
            "), sc AS (SELECT tf.doc_id,"
            "    SUM(CAST(tf.tf AS DOUBLE) * ln((CASE WHEN cnt.c >= 5"
            "      THEN CAST(cnt.c AS DOUBLE) ELSE 0.5 END) / tot.t)) AS s,"
            "    CAST(SUM(tf.tf) AS BIGINT) AS nt"
            "  FROM tf JOIN cnt USING (term), tot GROUP BY 1"
            ") SELECT doc_id, nt AS n_tokens, round(-s / nt, 6) AS cross_entropy"
            " FROM sc ORDER BY doc_id"
        ),
        "tfidf_topk": (
            "WITH toks AS ("
            "  SELECT doc_id, t.tok AS term FROM documents,"
            "  unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(tok)"
            "  WHERE t.tok <> ''"
            "), tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf"
            "  FROM toks GROUP BY 1, 2"
            "), df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df"
            "  FROM toks GROUP BY 1"
            "), n AS (SELECT COUNT(*) AS n FROM documents"
            "), ranked AS ("
            "  SELECT tf.doc_id, tf.term, tf.tf, df.df,"
            "  row_number() OVER (PARTITION BY tf.doc_id ORDER BY"
            "    tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC, tf.term) AS rank"
            "  FROM tf JOIN df USING (term) CROSS JOIN n"
            ") SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank "
            "FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank"
        ),
        "token_counts": (
            "SELECT doc_id, CAST(length(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "redact_pii": _redact_sql(),
        "doc_quality": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(length(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "ann_topk": ann_sql,
        "events_tumbling": (
            "SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type, "
            "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2 "
            "ORDER BY 1, 2"
        ),
        "events_sliding": (
            "SELECT s AS window_start, CAST(count(*) AS BIGINT) AS n_events "
            "FROM events e, LATERAL (SELECT unnest(generate_series("
            "time_bucket(INTERVAL 30 MINUTE, e.ts) - INTERVAL 30 MINUTE, "
            "time_bucket(INTERVAL 30 MINUTE, e.ts), INTERVAL 30 MINUTE)) AS s) w "
            "WHERE e.ts >= w.s AND e.ts < w.s + INTERVAL 60 MINUTE "
            "GROUP BY 1 ORDER BY 1"
        ),
        "events_top_users": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events "
            "GROUP BY user_id ORDER BY sum(value) DESC, user_id LIMIT 10"
        ),
        "events_props": (
            "SELECT event_id, json_extract_string(props, '$.k') AS props_k "
            "FROM events ORDER BY event_id"
        ),
        "ingest_nodes": nodes_sql + " ORDER BY node_id",
        "ingest_edges": f"SELECT src, dst FROM read_parquet('{golden_edges}') ORDER BY src, dst",
        "ingest_degrees": degrees_sql,
        "triangles": triangles_sql,
        "clustering_coeff": f"""
            WITH tri AS ({triangles_sql}),
             e AS (SELECT src, dst FROM read_parquet('{golden_edges}')),
             und AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
             deg AS (SELECT u AS node_id, count(*) AS d FROM und WHERE u <> v GROUP BY 1)
            SELECT tri.node_id, tri.triangles,
                   CAST(coalesce(deg.d, 0) AS BIGINT) AS deg,
                   ROUND(CASE WHEN coalesce(deg.d, 0) >= 2
                         THEN 2.0 * tri.triangles / (deg.d * (deg.d - 1))
                         ELSE 0.0 END, 9) AS lcc
            FROM tri LEFT JOIN deg ON tri.node_id = deg.node_id
            ORDER BY tri.node_id
        """,
        "cc": f"""
            WITH RECURSIVE
             e AS (SELECT src, dst FROM read_parquet('{golden_edges}')
                   UNION SELECT dst, src FROM read_parquet('{golden_edges}')),
             n AS (SELECT CAST(row_number() OVER (ORDER BY repo, path) - 1 AS BIGINT) AS node_id
                   FROM read_parquet('{corpus}')),
             reach(a, b) AS (
               SELECT node_id, node_id FROM n
               UNION
               SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src
             )
            SELECT a AS node_id, min(b) AS label FROM reach GROUP BY a ORDER BY a
        """,
        "bfs_hops": f"""
            WITH RECURSIVE
             e AS (SELECT src, dst FROM read_parquet('{golden_edges}')
                   UNION SELECT dst, src FROM read_parquet('{golden_edges}')),
             walk(node, d) AS (
               SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d
               UNION
               SELECT e.dst, w.d + 1 FROM walk w JOIN e ON w.node = e.src
               WHERE w.d < 64
             )
            SELECT node AS node_id, CAST(min(d) AS BIGINT) AS dist
            FROM walk GROUP BY 1 ORDER BY 1
        """,
        "pagerank": (
            f"SELECT node_id, ppr FROM read_parquet('{gold['pagerank']}') "
            "ORDER BY node_id"
        ),
        "ppr_exact": (
            f"SELECT node_id, ppr FROM read_parquet('{gold['ppr_exact']}') "
            "ORDER BY node_id"
        ),
        "backward_ppr": (
            f"SELECT node_id, ppr FROM read_parquet('{gold['backward_ppr']}') "
            "ORDER BY node_id"
        ),
        "lpa": (
            f"SELECT node_id, label FROM read_parquet('{gold['lpa']}') "
            "ORDER BY node_id"
        ),
        "kcore": (
            f"SELECT node_id, core FROM read_parquet('{gold['kcore']}') "
            "ORDER BY node_id"
        ),
        "ktruss": (
            f"SELECT lo, hi FROM read_parquet('{gold['ktruss']}') "
            "ORDER BY lo, hi"
        ),
        "trussness": (
            f"SELECT lo, hi, trussness FROM read_parquet('{gold['trussness']}') "
            "ORDER BY lo, hi"
        ),
        "hits": (
            f"SELECT node_id, hub, authority FROM read_parquet('{gold['hits']}') "
            "ORDER BY node_id"
        ),
        "eigenvector": (
            f"SELECT node_id, ev FROM read_parquet('{gold['eigenvector']}') "
            "ORDER BY node_id"
        ),
        "assortativity": f"""
            WITH e AS (SELECT src, dst FROM read_parquet('{golden_edges}')),
                 d AS ({degrees_sql}),
                 xy AS (
                   SELECT CAST(dx.out_deg AS DOUBLE) AS x,
                          CAST(dy.in_deg AS DOUBLE) AS y
                   FROM e JOIN d dx ON e.src = dx.node_id
                          JOIN d dy ON e.dst = dy.node_id
                 )
            SELECT CAST(count(*) AS BIGINT) AS edges,
                   round(corr(x, y), 6) AS assortativity
            FROM xy
        """,
        "modularity": f"""
            WITH lab AS (SELECT node_id, label FROM read_parquet('{gold['lpa']}')),
                 e AS (SELECT src, dst FROM read_parquet('{golden_edges}')),
                 und AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
                 canon AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
                           FROM und WHERE u <> v),
                 m AS (SELECT count(*) AS mm FROM canon),
                 deg AS (SELECT u, count(*) AS d
                         FROM (SELECT DISTINCT u, v FROM und WHERE u <> v)
                         GROUP BY u),
                 wc AS (SELECT la.label, CAST(count(*) AS BIGINT) AS w
                        FROM canon JOIN lab la ON canon.a = la.node_id
                                   JOIN lab lb ON canon.b = lb.node_id
                        WHERE la.label = lb.label GROUP BY la.label),
                 dc AS (SELECT lab.label, CAST(count(*) AS BIGINT) AS n_nodes,
                               CAST(sum(coalesce(deg.d, 0)) AS BIGINT) AS degree_sum
                        FROM lab LEFT JOIN deg ON lab.node_id = deg.u
                        GROUP BY lab.label)
            SELECT dc.label, dc.n_nodes,
                   CAST(coalesce(wc.w, 0) AS BIGINT) AS within_edges,
                   dc.degree_sum,
                   round(coalesce(wc.w, 0) / CAST(m.mm AS DOUBLE)
                         - pow(dc.degree_sum / (2.0 * m.mm), 2), 6) AS q_contrib
            FROM dc LEFT JOIN wc ON dc.label = wc.label CROSS JOIN m
            ORDER BY dc.label
        """,
        "katz": (
            f"SELECT node_id, katz FROM read_parquet('{gold['katz']}') "
            "ORDER BY node_id"
        ),
        "local_cluster": (
            f"SELECT node_id, sweep_rank, ppr, deg, in_cluster "
            f"FROM read_parquet('{gold['local_cluster']}') ORDER BY node_id"
        ),
        "ego_network": f"""
            WITH RECURSIVE
                 e AS (SELECT src, dst FROM read_parquet('{golden_edges}')),
                 und AS (SELECT src AS u, dst AS v FROM e
                         UNION SELECT dst, src FROM e),
                 reach(node_id, dist) AS (
                   SELECT CAST(0 AS BIGINT), 0
                   UNION
                   SELECT und.v, reach.dist + 1
                   FROM reach JOIN und ON und.u = reach.node_id
                   WHERE reach.dist < 2
                 ),
                 mem AS (SELECT node_id FROM reach GROUP BY node_id),
                 canon AS (SELECT DISTINCT least(u, v) AS lo, greatest(u, v) AS hi
                           FROM und WHERE u <> v)
            SELECT canon.lo, canon.hi
            FROM canon JOIN mem m1 ON canon.lo = m1.node_id
                       JOIN mem m2 ON canon.hi = m2.node_id
            ORDER BY lo, hi
        """,
        "diameter_est": (
            "SELECT diameter_lb, far_a, far_b, n_reached "
            f"FROM read_parquet('{gold['diameter_est']}')"
        ),
        "link_pred": f"""
            WITH e AS (SELECT src, dst FROM read_parquet('{golden_edges}')),
                 und AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
                 deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
                 wedge AS (
                   SELECT n1.v AS a, n2.v AS b, n1.u AS w
                   FROM und n1 JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v
                 ),
                 pairs AS (
                   SELECT wedge.a, wedge.b,
                          CAST(count(*) AS BIGINT) AS cn,
                          sum(1.0 / ln(dw.d)) AS aa
                   FROM wedge JOIN deg dw ON wedge.w = dw.u
                   GROUP BY wedge.a, wedge.b
                   HAVING count(*) >= 2
                 ),
                 nonadj AS (
                   SELECT p.* FROM pairs p
                   LEFT JOIN und ON und.u = p.a AND und.v = p.b
                   WHERE und.u IS NULL
                 )
            SELECT n.a, n.b, n.cn,
                   ROUND(CAST(n.cn AS DOUBLE) / (da.d + db.d - n.cn), 9) AS jaccard,
                   ROUND(n.aa, 9) AS adamic_adar
            FROM nonadj n
            JOIN deg da ON n.a = da.u
            JOIN deg db ON n.b = db.u
            ORDER BY n.a, n.b
        """,
        "langid": (
            f"SELECT doc_id, lang_pred FROM read_parquet('{gold['langid']}') "
            "ORDER BY doc_id"
        ),
        "events_distinct_users": (
            f"SELECT distinct_users FROM read_parquet('{gold['events_distinct_users']}')"
        ),
        "events_value_quantiles": (
            f"SELECT q, value FROM read_parquet('{gold['events_value_quantiles']}') "
            "ORDER BY q"
        ),
        "events_heavy_hitters": """
            SELECT user_id AS value, count(*) AS n FROM events
            GROUP BY 1
            HAVING count(*) >= CEIL(0.008 * (SELECT count(*) FROM events))
            ORDER BY value
        """,
        "events_asof_checkpoint": """
            SELECT e.event_id,
                   COALESCE((SELECT c.event_id FROM events c
                     WHERE c.event_id % 37 = 0 AND c.user_id = e.user_id
                       AND (c.ts < e.ts OR (c.ts = e.ts AND c.event_id < e.event_id))
                     ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), -1) AS ckpt_id
            FROM events e ORDER BY e.event_id
        """,
        "doc_fingerprints": (
            f"SELECT doc_id, fingerprint FROM read_parquet('{gold['doc_fingerprints']}') "
            "ORDER BY doc_id"
        ),
        "minhash_dups": (
            f"SELECT a, b FROM read_parquet('{gold['minhash_dups']}') ORDER BY a, b"
        ),
        "ngram_jaccard_dups": (
            f"SELECT a, b FROM read_parquet('{gold['ngram_jaccard_dups']}') ORDER BY a, b"
        ),
        "simhash_dups": (
            f"SELECT a, b FROM read_parquet('{gold['simhash_dups']}') ORDER BY a, b"
        ),
        "fora_ppr": (
            f"SELECT node_id, ppr FROM read_parquet('{gold['fora_ppr']}') "
            "ORDER BY node_id"
        ),
        "hubppr": (
            f"SELECT source, target, ppr FROM read_parquet('{gold['hubppr']}') "
            "ORDER BY target, source"
        ),
        "monte_carlo_ppr": (
            f"SELECT node_id, ppr FROM read_parquet('{gold['monte_carlo_ppr']}') "
            "ORDER BY node_id"
        ),
        "ppr_batch": (
            f"SELECT query_idx, node_id, ppr FROM read_parquet('{gold['ppr_batch']}') "
            "ORDER BY query_idx, node_id"
        ),
        "fora_indexed": (
            f"SELECT node_id, ppr FROM read_parquet('{gold['fora_indexed']}') "
            "ORDER BY node_id"
        ),
        "topk_ppr": (
            f"SELECT node_id, ppr FROM read_parquet('{gold['topk_ppr']}') "
            "ORDER BY ppr DESC, node_id"
        ),
        "decontaminate": (
            f"SELECT doc_id, n_hits FROM read_parquet('{gold['decontaminate']}') "
            "ORDER BY doc_id"
        ),
        "harmonic": (
            f"SELECT node_id, harmonic FROM read_parquet('{gold['harmonic']}') "
            "ORDER BY node_id"
        ),
        "scc": (
            f"SELECT node_id, scc FROM read_parquet('{gold['scc']}') "
            "ORDER BY node_id"
        ),
        "walk_corpus": (
            f"SELECT walk_id, step, node_id FROM read_parquet('{gold['walk_corpus']}') "
            "ORDER BY walk_id, step"
        ),
        "node2vec_corpus": (
            f"SELECT walk_id, step, node_id "
            f"FROM read_parquet('{gold['node2vec_corpus']}') "
            "ORDER BY walk_id, step"
        ),
        "betweenness": (
            f"SELECT node_id, betweenness "
            f"FROM read_parquet('{gold['betweenness']}') "
            "ORDER BY node_id"
        ),
        "mis": (
            f"SELECT node_id, in_mis FROM read_parquet('{gold['mis']}') "
            "ORDER BY node_id"
        ),
        "greedy_color": (
            f"SELECT node_id, color FROM read_parquet('{gold['greedy_color']}') "
            "ORDER BY node_id"
        ),
        "skipgram_pairs": (
            f"SELECT a.node_id AS center, b.node_id AS context, "
            f"CAST(COUNT(*) AS BIGINT) AS cnt "
            f"FROM read_parquet('{gold['walk_corpus']}') a "
            f"JOIN read_parquet('{gold['walk_corpus']}') b "
            f"ON a.walk_id = b.walk_id AND a.step <> b.step "
            f"AND abs(a.step - b.step) <= 2 "
            f"GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "neighbor_sample": (
            f"SELECT src, dst, hop FROM read_parquet('{gold['neighbor_sample']}') "
            "ORDER BY hop, src, dst"
        ),
        "events_sessions": """
            WITH marked AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT user_id, min(ts) AS session_start,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "events_funnel": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts >= s1.t1
                AND e.ts <= s1.t1 + INTERVAL 1 DAY
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t3
              FROM events e JOIN s2 ON e.user_id = s2.user_id
                            JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
                AND e.ts <= s1.t1 + INTERVAL 1 DAY
              GROUP BY e.user_id
            )
            SELECT * FROM (
              SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                     CAST(count(*) AS BIGINT) AS users FROM s1
              UNION ALL
              SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
              UNION ALL
              SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
            ) ORDER BY step
        """,
        "ann_ivf": (
            f"SELECT query_id, rank, vec_id FROM read_parquet('{gold['ann_ivf']}') "
            "ORDER BY query_id, rank"
        ),
        "ann_lsh": (
            f"SELECT query_id, rank, vec_id FROM read_parquet('{gold['ann_lsh']}') "
            "ORDER BY query_id, rank"
        ),
        "embedding_dups": (
            f"SELECT a, b FROM read_parquet('{gold['embedding_dups']}') ORDER BY a, b"
        ),
        "dup_clusters": (
            f"SELECT doc_id, cluster FROM read_parquet('{gold['dup_clusters']}') "
            "ORDER BY doc_id"
        ),
        "multimodal_features": (
            f"SELECT * FROM read_parquet('{gold['multimodal_features']}') "
            "ORDER BY media_id"
        ),
        "video_frames": (
            f"SELECT media_id, frame_idx, mean_lum "
            f"FROM read_parquet('{gold['video_frames']}') "
            "ORDER BY media_id, frame_idx"
        ),
        "multimodal_decode": (
            f"SELECT * FROM read_parquet('{gold['multimodal_decode']}') "
            "ORDER BY media_id"
        ),
        "curation": (
            f"SELECT doc_id, lang_pred FROM read_parquet('{gold['curation']}') "
            "ORDER BY doc_id"
        ),
    }
