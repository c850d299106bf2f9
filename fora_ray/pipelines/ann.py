"""Approximate-nearest-neighbor search over an embedding column
(task brief training-data operator: similarity search).

- brute_force_topk: exact cosine top-k — the baseline.  The query
  matrix is ray.put() once (broadcast), each batch does one matmul and
  emits its local per-query top-k; a final per-query merge keeps the
  global top-k.  Nothing but (batches x k) candidate rows ever shuffles.
- ivf_topk: the scale path — seeded k-means-lite centroids, vectors
  hash to their nearest centroid (one groupby to co-locate), queries
  probe only the nprobe nearest lists.
- lsh_topk: the other scale path — random-hyperplane LSH tables;
  vectors land in one sign-bucket per table (one groupby on the packed
  (table, code) key), queries probe their own bucket plus all radius-1
  flips (multiprobe).  No training pass at all (IVF needs the k-means
  sample), at the cost of n_tables-way vector replication through the
  shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.shuffle import clean_sort, pool_size


def _to_matrix(col) -> np.ndarray:
    """Embedding list column -> (rows, dim) float64 matrix via Arrow
    buffer flatten (no per-row Python lists — this runs on every ANN
    batch over the corpus).  Requires uniform row length, which the
    embedding tables guarantee; ragged input raises."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("_to_matrix: null embedding rows")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    if flat.size % n:
        raise ValueError("_to_matrix: ragged embedding lengths")
    return flat.reshape(n, flat.size // n)


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


def _merge_topk(k, dedup: bool = False):
    """Per-query global merge as a pyarrow kernel — keeps the whole
    pipeline Arrow-native (a pandas map_groups here caused executor
    schema-mismatch warnings and a needless conversion).

    dedup=True drops repeated (vec_id) rows first — an LSH candidate
    that collides with the query in several tables arrives once per
    table with identical exact-cosine scores."""

    def merge(g: pa.Table) -> pa.Table:
        if dedup and g.num_rows:
            vid = g["vec_id"].to_numpy(zero_copy_only=False)
            g = g.take(np.sort(np.unique(vid, return_index=True)[1]))
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


def _lsh_planes(dim: int, n_tables: int, n_planes: int, seed: int) -> np.ndarray:
    """(n_tables, n_planes, dim) gaussian hyperplanes — the whole
    'index' (no training pass; shared verbatim by the golden oracle)."""
    return np.random.default_rng(seed).standard_normal((n_tables, n_planes, dim))


def _lsh_codes(V: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign codes (n, n_tables) int64: bit p of table t = [V @ planes[t,p] >= 0]."""
    proj = np.einsum("nd,tpd->ntp", V, planes) >= 0
    w = (np.int64(1) << np.arange(planes.shape[1], dtype=np.int64))
    return proj @ w


def lsh_topk(emb_ds, queries: np.ndarray, k: int = 10, n_tables: int = 8,
             n_planes: int = 10, seed: int = 42, probe_radius: int = 1):
    """LSH-bucketed ANN: each vector lands in one sign-bucket per table
    (n_tables rows through ONE groupby on the packed (table, code)
    key); each query probes its own bucket per table plus, at
    probe_radius=1, every single-bit flip — multiprobe recovers most of
    the recall a one-bucket probe loses without adding tables.

    Collision math (random hyperplanes): P[bit agrees] = 1 - theta/pi,
    so a cos=0.95 neighbor (theta ~= 0.318 rad) agrees on all 10 bits of
    one table w.p. ~0.35; 8 tables + radius-1 probing push per-table hit
    probability to ~0.73 and overall recall past 1-(1-0.73)^8 > 0.99.

    Scale shape: the only shuffle moves each vector n_tables times
    (the classic LSH space/selectivity trade); buckets are searched
    independently so skew is bounded by the largest bucket, and the
    per-query merge sees at most buckets x k rows.  Approximate —
    recall measured vs brute_force_topk in tests; exact replay golden
    in goldens.ann_lsh_golden."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    nq, dim = Q.shape
    assert n_planes <= 32 and n_tables < 2**31, "packed (table, code) key is int64"
    planes = _lsh_planes(dim, n_tables, n_planes, seed)
    p_ref = ray.put(planes)

    # query probe set: (nq, n_tables, 1 + radius*n_planes) codes, tiny —
    # closed over by the search task
    qcodes = _lsh_codes(Q, planes)  # (nq, n_tables)
    flips = np.concatenate([[np.int64(0)],
                            (np.int64(1) << np.arange(n_planes, dtype=np.int64))
                            if probe_radius >= 1 else []]).astype(np.int64)
    probe = qcodes[:, :, None] ^ flips[None, None, :]

    class Assign:
        """vec -> one (tb, vec_id, embedding) row per table; tb packs
        (table << 32 | code) so the co-locating groupby has ONE int key."""

        def __init__(self, ref):
            self.planes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            if ids.size == 0:
                return pa.table({"tb": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "embedding": pa.array([], t["embedding"].type)})
            codes = _lsh_codes(_normalize(_to_matrix(t["embedding"])), self.planes)
            T = codes.shape[1]
            tb = (np.arange(T, dtype=np.int64)[None, :] << np.int64(32)) | codes
            rep = np.repeat(np.arange(ids.size), T)
            return pa.table({
                "tb": pa.array(tb.reshape(-1)),
                "vec_id": pa.array(ids[rep]),
                "embedding": t["embedding"].take(pa.array(rep)),
            })

    assigned = emb_ds.map_batches(
        Assign, fn_constructor_kwargs={"ref": p_ref},
        batch_format="pyarrow", concurrency=pool_size(),
    )

    def search_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        tb = int(g["tb"][0].as_py())
        t_idx, code = tb >> 32, tb & 0xFFFFFFFF
        qids = np.nonzero((probe[:, t_idx, :] == code).any(axis=1))[0]
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

    local = assigned.groupby("tb").map_groups(search_bucket, batch_format="pyarrow")
    merged = local.repartition(max(1, min(nq, pool_size()[1]))).groupby(
        "query_id").map_groups(_merge_topk(k, dedup=True), batch_format="pyarrow")
    return clean_sort(
        merged.select_columns(["query_id", "rank", "vec_id", "score"]),
        ["query_id", "rank"],
    )
