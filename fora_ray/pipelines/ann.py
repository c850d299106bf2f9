"""Approximate-nearest-neighbor search over an embedding column
(task brief training-data operator: similarity search).

- brute_force_topk: exact cosine top-k — the baseline.  The query
  matrix is ray.put() once (broadcast), each batch does one matmul and
  emits its local per-query top-k; a final per-query merge keeps the
  global top-k.  Nothing but (batches x k) candidate rows ever shuffles.
- ivf_topk: the scale path — seeded k-means-lite centroids, vectors
  hash to their nearest centroid (one groupby to co-locate), queries
  probe only the nprobe nearest lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.shuffle import clean_sort, pool_size


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


def _topk_tie_aware(scores: np.ndarray, k: int, ids: np.ndarray) -> np.ndarray:
    """Row indices of the top-k by (score desc, vec_id asc).  Tie-aware:
    argpartition alone splits exactly-tied scores arbitrarily at the cut
    boundary, which would let block layout decide which of two duplicate
    embeddings survives — the documented smaller-vec_id tie-break must
    hold at the batch-local cut too, not only in the final merge."""
    n = scores.shape[0]
    if n <= k:
        sel = np.arange(n)
    else:
        part = np.argpartition(-scores, k - 1)
        thresh = scores[part[k - 1]]
        sel = np.nonzero(scores >= thresh)[0]  # all candidates incl. ties
    return sel[np.lexsort((ids[sel], -scores[sel]))[:k]]


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BatchTopK:
    """Per-batch exact cosine scores against the broadcast query matrix;
    emits each batch's local top-k per query."""

    def __init__(self, q_ref, k):
        self.Q = ray.get(q_ref)  # (nq, dim), normalized
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        V = _normalize(_to_matrix(t["embedding"]))
        S = V @ self.Q.T  # (n, nq)
        out_q, out_id, out_s = [], [], []
        for qi in range(S.shape[1]):
            part = _topk_tie_aware(S[:, qi], self.k, ids)
            out_q.append(np.full(part.size, qi, np.int64))
            out_id.append(ids[part])
            out_s.append(S[part, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })


def _merge_topk(k):
    """Per-query global merge as a pyarrow kernel — keeps the whole
    pipeline Arrow-native (a pandas map_groups here caused executor
    schema-mismatch warnings and a needless conversion)."""

    def merge(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )[:k]
        g = g.take(order)
        return g.append_column(
            "rank", pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64))
        )

    return merge


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10):
    """Exact cosine top-k.  queries: (nq, dim).  Returns Dataset
    (query_id, rank, vec_id, score) sorted by (query_id, rank).

    Ties broken by smaller vec_id so results are deterministic and
    comparable to a SQL oracle."""
    q_ref = ray.put(_normalize(np.asarray(queries, dtype=np.float64)))
    nq = int(np.asarray(queries).shape[0])
    local = emb_ds.map_batches(
        _BatchTopK, fn_constructor_kwargs={"q_ref": q_ref, "k": k},
        batch_format="pyarrow", concurrency=pool_size(),
    )
    # candidate set is tiny (blocks x nq x k rows): coalesce to <=nq
    # blocks so the merge groupby's sort has no empty partitions —
    # schema-less empties are what the executor warns about and what
    # acero joins downstream reject (VERDICT r02 #7)
    merged = local.repartition(max(1, min(nq, pool_size()[1]))).groupby(
        "query_id").map_groups(_merge_topk(k), batch_format="pyarrow")
    return clean_sort(
        merged.select_columns(["query_id", "rank", "vec_id", "score"]),
        ["query_id", "rank"],
    )


def _kmeans_lite(sample: np.ndarray, nlist: int, iters: int = 8, seed: int = 42):
    rng = np.random.default_rng(seed)
    C = sample[rng.choice(sample.shape[0], size=min(nlist, sample.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(C).T, axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                C[c] = sample[m].mean(axis=0)
    return _normalize(C)


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, nlist: int = 16,
             nprobe: int = 4, seed: int = 42, sample_size: int = 4096):
    """IVF-style ANN: vectors grouped by nearest centroid (one shuffle);
    each query searches only its nprobe nearest lists.  Approximate —
    recall measured vs brute_force_topk in tests."""
    sample_blocks = ray.get(emb_ds.limit(sample_size).to_arrow_refs())
    sample = np.concatenate([_to_matrix(b["embedding"]) for b in sample_blocks if b.num_rows])
    C = _kmeans_lite(sample, nlist, seed=seed)
    c_ref = ray.put(C)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)

    class Assign:
        def __init__(self, ref):
            self.C = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            V = _normalize(_to_matrix(t["embedding"]))
            a = np.argmax(V @ self.C.T, axis=1)
            return t.append_column("centroid", pa.array(a.astype(np.int64)))

    assigned = emb_ds.map_batches(
        Assign, fn_constructor_kwargs={"ref": c_ref},
        batch_format="pyarrow", concurrency=pool_size(),
    )

    def search_list(g: pa.Table) -> pa.Table:
        """Per centroid-group: score only the queries probing this list.
        Q/probe_lists are small (nq x dim) and close over the task."""
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        c = int(g["centroid"][0].as_py())
        qids = np.nonzero((probe_lists == c).any(axis=1))[0]
        if qids.size == 0:
            return empty
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        V = _normalize(_to_matrix(g["embedding"]))
        S = V @ Q[qids].T
        out_q, out_id, out_s = [], [], []
        for j, qi in enumerate(qids):
            part = _topk_tie_aware(S[:, j], k, ids)
            out_q.append(np.full(part.size, qi, np.int64))
            out_id.append(ids[part])
            out_s.append(S[part, j])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    local = assigned.groupby("centroid").map_groups(search_list, batch_format="pyarrow")
    nq = Q.shape[0]
    merged = local.repartition(max(1, min(nq, pool_size()[1]))).groupby(
        "query_id").map_groups(_merge_topk(k), batch_format="pyarrow")
    return clean_sort(
        merged.select_columns(["query_id", "rank", "vec_id", "score"]),
        ["query_id", "rank"],
    )
