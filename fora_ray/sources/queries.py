"""S2/S3 — query-set generation + exact-top-k golden writer
(SURVEY 2.1; reference generate-ss-query / gen-exact-topk).

Query sampling is deterministic-by-hash (A5): a node is selected when
``splitmix64(seed ^ node_id)`` falls below the acceptance threshold —
reproducible at any parallelism, no RNG state.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import mix64


def generate_query_set(n: int, query_size: int, seed: int = 42) -> pa.Table:
    """query_size deterministic source ids sampled from 0..n-1."""
    ids = np.arange(n, dtype=np.uint64)
    ranks = mix64(np.uint64(seed), ids)
    order = np.argsort(ranks)[:query_size]
    sources = np.sort(order.astype(np.int64))
    return pa.table({
        "query_id": pa.array(np.arange(len(sources), dtype=np.int64)),
        "source": pa.array(sources),
    })


def write_query_set(path: str, n: int, query_size: int, seed: int = 42) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(generate_query_set(n, query_size, seed), path)
    return path


def gen_exact_topk(edges: np.ndarray, n: int, sources, k: int = 50,
                   alpha: float = 0.2, out_path: str | None = None) -> pa.Table:
    """High-accuracy golden top-k per query via the numpy power-iteration
    oracle (test-scale only, like the reference's gen-exact-topk)."""
    from ..oracle import ppr_power_iteration

    rows_q, rows_r, rows_n, rows_p = [], [], [], []
    for s in sources:
        pi = ppr_power_iteration(edges, n, alpha=alpha, source=int(s), tol=1e-14)
        order = np.lexsort((np.arange(n), -pi))[:k]
        keep = pi[order] > 0
        order = order[keep]
        rows_q.extend([int(s)] * len(order))
        rows_r.extend(range(1, len(order) + 1))
        rows_n.extend(order.tolist())
        rows_p.extend(pi[order].tolist())
    t = pa.table({
        "query_src": pa.array(rows_q, pa.int64()),
        "rank": pa.array(rows_r, pa.int32()),
        "node_id": pa.array(rows_n, pa.int64()),
        "ppr": pa.array(rows_p, pa.float64()),
    })
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        pq.write_table(t, out_path)
    return t


def topk_precision(result_ids, golden_ids) -> float:
    """A3 — precision@k of a result id list vs the golden id list."""
    rs, gs = set(result_ids), set(golden_ids)
    if not gs:
        return 1.0
    return len(rs & gs) / len(gs)
