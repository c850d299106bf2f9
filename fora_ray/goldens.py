"""Golden-file oracles for the driver correctness gate (VERDICT r01 §next-1).

For engine outputs DuckDB cannot express in plain SQL (PageRank, PPR,
LPA, MinHash/SimHash near-dup pairs, language ID, fingerprints), the
oracle is a *single-process reference computation* written to parquet;
``__ray_entry__.oracle_sql()`` registers each as
``SELECT ... FROM read_parquet('<golden>')`` so the driver's
rows+schema+hash compare gates the distributed engine against it.

Independence layering (SURVEY §5):
- Graph numerics come from ``fora_ray.oracle`` (numpy power iteration /
  union-find / python LPA) — fully independent of the engine kernels.
- Text/dedup goldens share only the primitive hash functions
  (``functions.hashing`` — pure, spec'd building blocks, like sha256 in
  the M1 oracle); the pipeline logic (shingling, banding, bucketing,
  candidate generation, verification) is reimplemented here as plain
  single-process loops.  What the golden therefore verifies is the
  distributed execution: sharding, shuffles, actor-pool state and
  merge order must not change any result.

Float-valued goldens are rounded to ``ROUND=9`` decimals and the
matching ``queries()`` wrapper applies the same np.round — engine vs
oracle agree to ~1e-12, so the 0.5e-9 rounding boundary has ~3 orders
of magnitude of slack.  Everything here is deterministic: generated
once per (fixture, sf) into /tmp and reused.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.hashing import hash_str_u64, mix64, splitmix64
from .oracle import lpa_oracle, ppr_column_oracle, ppr_power_iteration

ROUND = 9
_WORD = re.compile(r"\w+")
_VERSION = 29  # v29: + local_cluster (ACL sweep) golden


def _round_col(x: np.ndarray) -> np.ndarray:
    return np.round(x, ROUND)


# --------------------------------------------------------------------------
# graph goldens (inputs: the fixture's golden edges / nodes tables)
# --------------------------------------------------------------------------

def _fixture_graph(fix_dir: str) -> tuple[np.ndarray, int]:
    edges = pq.read_table(os.path.join(fix_dir, "edges.parquet"))
    n = pq.read_table(os.path.join(fix_dir, "nodes.parquet")).num_rows
    e = np.stack(
        [edges["src"].to_numpy(), edges["dst"].to_numpy()], axis=1
    ).astype(np.int64)
    return e, n


def pagerank_golden(fix_dir: str) -> pa.Table:
    e, n = _fixture_graph(fix_dir)
    pi = ppr_power_iteration(e, n, source=None, tol=1e-14)
    nz = np.nonzero(pi)[0]
    return pa.table({"node_id": pa.array(nz.astype(np.int64)),
                     "ppr": pa.array(_round_col(pi[nz]))})


def ppr_exact_golden(fix_dir: str, source: int = 0) -> pa.Table:
    e, n = _fixture_graph(fix_dir)
    pi = ppr_power_iteration(e, n, source=source, tol=1e-14)
    nz = np.nonzero(pi)[0]
    return pa.table({"node_id": pa.array(nz.astype(np.int64)),
                     "ppr": pa.array(_round_col(pi[nz]))})


def backward_ppr_golden(fix_dir: str) -> pa.Table:
    """Column of the PPR matrix at the query's target (highest in-degree,
    node_id tie-break — must mirror __ray_entry__.backward_ppr_q)."""
    e, n = _fixture_graph(fix_dir)
    deg = pq.read_table(os.path.join(fix_dir, "degrees.parquet"))
    in_deg = deg["in_deg"].to_numpy()
    ids = deg["node_id"].to_numpy()
    target = int(ids[np.lexsort((ids, -in_deg))[0]])
    x = ppr_column_oracle(e, n, target)
    nz = np.nonzero(x)[0]
    return pa.table({"node_id": pa.array(nz.astype(np.int64)),
                     "ppr": pa.array(_round_col(x[nz]))})


def _sim_for(fix_dir: str):
    from .protocol_ref import ProtocolSim

    e, n = _fixture_graph(fix_dir)
    return ProtocolSim(e, n, P=4)  # P=4: the driver queries' handle shape


def _scores_table(est: np.ndarray) -> pa.Table:
    nz = np.nonzero(est)[0]
    return pa.table({"node_id": pa.array(nz.astype(np.int64)),
                     "ppr": pa.array(_round_col(est[nz]))})


def fora_ppr_golden(fix_dir: str) -> pa.Table:
    return _scores_table(_sim_for(fix_dir).fora_ppr(0, seed=42))


def monte_carlo_golden(fix_dir: str) -> pa.Table:
    return _scores_table(_sim_for(fix_dir).monte_carlo_ppr(0, seed=42))


def ppr_batch_golden(fix_dir: str) -> pa.Table:
    est = _sim_for(fix_dir).ppr_batch([0, 1, 2, 3], seed=42)
    node, q = np.nonzero(est)
    return pa.table({"query_idx": pa.array(q.astype(np.int64)),
                     "node_id": pa.array(node.astype(np.int64)),
                     "ppr": pa.array(_round_col(est[node, q]))})


def fora_indexed_golden(fix_dir: str) -> pa.Table:
    sim = _sim_for(fix_dir)
    sim.build_walk_index(seed=42)
    return _scores_table(sim.fora_indexed(0, seed=42))


def topk_ppr_golden(fix_dir: str, k: int = 10) -> pa.Table:
    ids, vals = _sim_for(fix_dir).topk_ppr(0, k=k, seed=42)
    return pa.table({"node_id": pa.array(ids.astype(np.int64)),
                     "ppr": pa.array(_round_col(vals))})


def hubppr_golden(fix_dir: str) -> pa.Table:
    """G6 pairwise HubPPR replay — pair set, hub counts, pool size and
    rmax_hub must mirror __ray_entry__.hubppr_q exactly."""
    sim = _sim_for(fix_dir)
    sim.build_hub_index(sim.select_hubs_fwd(16), 512, seed=42)
    sim.build_backward_hub_oracle(sim.select_hubs_bwd(16), 1e-4)
    deg = pq.read_table(os.path.join(fix_dir, "degrees.parquet"))
    in_deg = deg["in_deg"].to_numpy()
    ids = deg["node_id"].to_numpy()
    targets = [int(t) for t in ids[np.lexsort((ids, -in_deg))[:2]]]
    rows = [(s, t, sim.hubppr(s, t, eps=0.5, seed=42))
            for t in targets for s in (0, 1, 2, 3)]
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.int64()),
        "target": pa.array([r[1] for r in rows], pa.int64()),
        "ppr": pa.array(_round_col(np.array([r[2] for r in rows]))),
    })


def lpa_golden(fix_dir: str, max_rounds: int = 20) -> pa.Table:
    e, n = _fixture_graph(fix_dir)
    sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
    sym = sym[sym[:, 0] != sym[:, 1]]
    labels = lpa_oracle(sym, n, max_rounds=max_rounds)
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "label": pa.array(labels)})


# --------------------------------------------------------------------------
# documents goldens (inputs: the sf dir's documents.parquet)
# --------------------------------------------------------------------------

def kcore_golden(fix_dir: str) -> pa.Table:
    """Core numbers by iterative peeling (oracle.kcore_oracle) — an
    algorithm independent of the engine's h-index iteration."""
    from .oracle import kcore_oracle

    e, n = _fixture_graph(fix_dir)
    sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
    sym = sym[sym[:, 0] != sym[:, 1]]
    core = kcore_oracle(sym, n)
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "core": pa.array(core)})


def hits_golden(fix_dir: str, max_iters: int = 40) -> pa.Table:
    """HITS by dense numpy power iteration (bincount transposed
    products, L2-normalized each half-step) — single-process, no shard
    routing, matching graph.algorithms.hits at tol=0 to float-sum
    error (<< the ROUND quantum after 40 iterations)."""
    e, n = _fixture_graph(fix_dir)
    src, dst = e[:, 0], e[:, 1]
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(max_iters):
        a = np.bincount(dst, weights=h[src], minlength=n)
        norm = np.sqrt(np.dot(a, a))
        if norm > 0:
            a /= norm
        h = np.bincount(src, weights=a[dst], minlength=n)
        norm = np.sqrt(np.dot(h, h))
        if norm > 0:
            h /= norm
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "hub": pa.array(_round_col(h)),
                     "authority": pa.array(_round_col(a))})


def diameter_golden(fix_dir: str, seed_node: int = 0, sweeps: int = 2) -> pa.Table:
    """Double-sweep diameter lower bound by plain python/numpy BFS —
    same tie rule (smallest node id at the max distance) and sweep
    count as graph.algorithms.diameter_estimate."""
    e, n = _fixture_graph(fix_dir)
    sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
    sym = sym[sym[:, 0] != sym[:, 1]]
    order = np.argsort(sym[:, 0], kind="stable")
    src, dst = sym[order, 0], sym[order, 1]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)

    def bfs(s: int) -> np.ndarray:
        dist = np.full(n, -1, np.int64)
        dist[s] = 0
        frontier = np.array([s], np.int64)
        d = 0
        while frontier.size:
            d += 1
            nbrs = np.concatenate([dst[indptr[v]:indptr[v + 1]] for v in frontier]) \
                if frontier.size else np.empty(0, np.int64)
            nbrs = np.unique(nbrs)
            frontier = nbrs[dist[nbrs] == -1]
            dist[frontier] = d
        return dist

    cur = int(seed_node)
    prev, dia, far, reached = cur, 0, cur, 1
    for _ in range(max(1, sweeps)):
        dist = bfs(cur)
        seen = dist >= 0
        dia = int(dist[seen].max())
        far = int(np.nonzero(dist == dia)[0].min())
        reached = int(seen.sum())
        if far == cur or dia == 0:
            break
        prev, cur = cur, far
    return pa.table({"diameter_lb": pa.array([dia]),
                     "far_a": pa.array([prev]),
                     "far_b": pa.array([far]),
                     "n_reached": pa.array([reached])})


def _read_docs(sf_dir: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


_PROFILES_REF = [
    ("en", {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"}),
    ("de", {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"}),
    ("fr", {"le", "la", "les", "et", "est", "un", "une", "des", "pas", "pour"}),
    ("es", {"el", "la", "los", "y", "es", "un", "una", "de", "no", "por"}),
]


def _langid_texts(texts: list) -> list[str]:
    """Stopword-ratio argmax, first-profile-wins on ties, >0.02 floor —
    the documented heuristic, recomputed with plain counting loops."""
    preds = []
    for txt in texts:
        toks = _WORD.findall((txt or "").lower())
        if not toks:
            preds.append("unknown")
            continue
        best, best_score = "unknown", 0.0
        for lang, stop in _PROFILES_REF:
            hits = 0
            for w in toks:
                if w in stop:
                    hits += 1
            score = hits / len(toks)
            if score > best_score:
                best, best_score = lang, score
        preds.append(best if best_score > 0.02 else "unknown")
    return preds


def langid_golden(sf_dir: str) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "lang_pred": pa.array(_langid_texts(texts), pa.string())})


def fingerprints_golden(sf_dir: str, window: int = 8) -> pa.Table:
    """Winnowing-style min-of-rolling-window word-hash fingerprint,
    recomputed with explicit per-window python loops."""
    ids, texts = _read_docs(sf_dir)
    fps = []
    for txt in texts:
        words = _WORD.findall((txt or "").lower())
        if not words:
            fps.append(0)
            continue
        h = hash_str_u64(words)
        if h.size <= window:
            mixed = [int(mix64(np.uint64(v), np.uint64(i))) for i, v in enumerate(h)]
        else:
            rolls = [min(h[i: i + window].tolist()) for i in range(h.size - window + 1)]
            mixed = [int(mix64(np.uint64(v), np.uint64(i))) for i, v in enumerate(rolls)]
        fps.append(min(mixed))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "fingerprint": pa.array(np.array(fps, dtype=np.uint64), pa.uint64())})


def _bucket_pair_set(buckets: dict, cap: int = 512) -> list[tuple[int, int]]:
    """Sorted unique (a, b) candidate pairs, a < b, across all buckets —
    mirrors pipelines.dedup._bucket_pairs including the oversize-bucket
    sub-sharding (secondary hash) and sub-shard-min bridge pairs."""
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        if len(ms) > cap:
            n_sub = -(-len(ms) // cap)
            root = ms[0]
            shards: dict[int, list[int]] = {}
            for did in ms:
                s = int(mix64(np.uint64(did), np.uint64(0x5CA1AB1E)) % np.uint64(n_sub))
                shards.setdefault(s, []).append(did)
            for part in shards.values():
                for i, x in enumerate(part):
                    for y in part[i + 1:]:
                        pairs.add((min(x, y), max(x, y)))
                if part and min(part) != root:
                    pairs.add((min(root, min(part)), max(root, min(part))))
            continue
        for i, x in enumerate(ms):
            for y in ms[i + 1:]:
                pairs.add((x, y))
    return sorted(pairs)


def _shingle_set(words: list[str], k: int) -> frozenset:
    if not words:
        return frozenset()
    if len(words) < k:
        return frozenset(hash_str_u64([" ".join(words)]).tolist())
    return frozenset(
        hash_str_u64([" ".join(words[i: i + k]) for i in range(len(words) - k + 1)]).tolist()
    )


def _minhash_pairs_core(ids, texts, threshold: float, num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 5, seed: int = 42
                        ) -> list[tuple[int, int]]:
    """MinHash-LSH near-dup pairs: per-doc signature, banded buckets,
    all-pairs candidates, exact-Jaccard verification — one process, one
    dict of buckets, no sharding anywhere."""
    rows_per_band = num_perm // bands
    perm_seeds = mix64(np.uint64(seed), np.arange(num_perm, dtype=np.uint64))
    shingles: dict[int, frozenset] = {}
    buckets: dict[tuple[int, int], set[int]] = {}
    for did, txt in zip(ids, texts):
        words = _WORD.findall((txt or "").lower())
        ss = _shingle_set(words, shingle_k)
        shingles[did] = ss
        if ss:
            sh = np.array(sorted(ss), dtype=np.uint64)
            sig = mix64(sh[None, :], perm_seeds[:, None]).min(axis=1)
        else:
            sig = np.full(num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        for b in range(bands):
            chunk = sig[b * rows_per_band: (b + 1) * rows_per_band]
            h = int(mix64(chunk, np.uint64(b)).sum() & np.uint64(0xFFFFFFFFFFFFFFFF))
            buckets.setdefault((b, h), set()).add(int(did))
    out = []
    for a, b in _bucket_pair_set(buckets):
        sa, sb = shingles[a], shingles[b]
        if not sa and not sb:
            jac = 1.0
        else:
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out.append((a, b))
    return out


def minhash_pairs_golden(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    pairs = _minhash_pairs_core(ids, texts, threshold)
    return pa.table({"a": pa.array([p[0] for p in pairs], pa.int64()),
                     "b": pa.array([p[1] for p in pairs], pa.int64())})


def ngram_jaccard_pairs_golden(sf_dir: str, threshold: float = 0.5,
                               shingle_k: int = 3) -> pa.Table:
    """Brute-force O(n^2) exact n-gram-Jaccard pairs — no LSH, no
    prefix filter, completely independent of the pipeline's AllPairs
    candidate generation.  Docs with zero shingles are skipped (same
    semantic as pipelines.dedup.ngram_jaccard_dups)."""
    ids, texts = _read_docs(sf_dir)
    shingles: dict[int, frozenset] = {}
    for did, txt in zip(ids, texts):
        words = _WORD.findall((txt or "").lower())
        ss = _shingle_set(words, shingle_k)
        if ss:
            shingles[int(did)] = ss
    out_a, out_b = [], []
    sids = sorted(shingles)
    for i, a in enumerate(sids):
        sa = shingles[a]
        for b in sids[i + 1:]:
            sb = shingles[b]
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= threshold:
                out_a.append(a)
                out_b.append(b)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64())})


def simhash_pairs_golden(sf_dir: str, hamming_thresh: int = 3, seed: int = 42) -> pa.Table:
    """SimHash near-dup pairs: 64-bit sign-aggregated word-hash votes,
    4x16-bit band buckets, hamming verification — single process."""
    ids, texts = _read_docs(sf_dir)
    sigs: dict[int, int] = {}
    buckets: dict[tuple[int, int], set[int]] = {}
    shifts = np.arange(64, dtype=np.uint64)
    for did, txt in zip(ids, texts):
        words = _WORD.findall((txt or "").lower())
        if not words:
            s = 0
        else:
            h = mix64(hash_str_u64(words), np.uint64(seed))
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            s = int(((votes > 0).astype(np.uint64) << shifts).sum())
        sigs[int(did)] = s
        for b in range(4):
            buckets.setdefault((b, (s >> (16 * b)) & 0xFFFF), set()).add(int(did))
    out_a, out_b = [], []
    for a, b in _bucket_pair_set(buckets):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= hamming_thresh:
            out_a.append(a)
            out_b.append(b)
    return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})


def _quality_texts(texts: list) -> list[float]:
    """Mirror of the documented quality heuristic (length / stopword /
    punctuation / digit composite), plain python loops."""
    stop = set()
    for _, s in _PROFILES_REF:
        stop |= s
    punct = re.compile(r"[^\w\s]")
    digit = re.compile(r"\d")
    out = []
    for txt in texts:
        s = txt or ""
        toks = _WORD.findall(s.lower())
        nc, nt = len(s), len(toks)
        pr = len(punct.findall(s)) / max(nc, 1)
        sr = (sum(1 for w in toks if w in stop) / nt) if nt else 0.0
        dr = len(digit.findall(s)) / max(nc, 1)
        sc = (
            min(nt / 50.0, 1.0) * 0.4
            + min(sr / 0.2, 1.0) * 0.3
            + (1.0 - min(pr / 0.3, 1.0)) * 0.2
            + (1.0 - min(dr / 0.3, 1.0)) * 0.1
        )
        out.append(sc)
    return out


def curation_golden(sf_dir: str, min_quality: float = 0.2,
                    near_dup_threshold: float = 0.7, seed: int = 42) -> pa.Table:
    """Single-process replay of the curation decisions: quality filter,
    sha256 exact-dedup winners, MinHash near-dup clusters with
    best-quality-keeps, language attach.  Mirrors the parameters of the
    driver's `curation` query."""
    from .functions.hashing import sha256_hex

    ids, texts = _read_docs(sf_dir)
    quality = dict(zip(ids, _quality_texts(texts)))
    text_of = dict(zip(ids, texts))
    good = [i for i in ids if quality[i] >= min_quality]
    # exact winners: min doc_id per sha256(text)
    by_digest: dict[str, int] = {}
    for i in good:
        d = sha256_hex(text_of[i] or "")
        if d not in by_digest or i < by_digest[d]:
            by_digest[d] = i
    uniq = sorted(by_digest.values())
    pairs = _minhash_pairs_core(
        uniq, [text_of[i] for i in uniq], near_dup_threshold, seed=seed)
    # union-find clusters, label = min member
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for i in uniq:
        clusters.setdefault(find(i), []).append(i)
    kept = sorted(
        min(members, key=lambda i: (-quality[i], i)) for members in clusters.values()
    )
    preds = _langid_texts([text_of[i] for i in kept])
    return pa.table({"doc_id": pa.array(kept, pa.int64()),
                     "lang_pred": pa.array(preds, pa.string())})


def embedding_dups_golden(sf_dir: str, threshold: float = 0.8, n_bands: int = 8,
                          planes_per_band: int = 8, seed: int = 42) -> pa.Table:
    """Single-process replay of embedding near-dup detection: banded
    random-hyperplane signatures, capped buckets (same sub-shard +
    bridge policy), exact cosine verification."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((V.shape[1], n_bands * planes_per_band))
    sig = (V @ planes > 0).astype(np.uint64)
    buckets: dict[tuple[int, int], set[int]] = {}
    shifts = np.arange(planes_per_band, dtype=np.uint64)
    for b in range(n_bands):
        chunk = sig[:, b * planes_per_band:(b + 1) * planes_per_band]
        key = (chunk << shifts[None, :]).sum(axis=1)
        for r, k_ in enumerate(key):
            buckets.setdefault((b, int(k_)), set()).add(int(ids[r]))
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    Vn = V / norms[:, None]
    row_of = {int(i): r for r, i in enumerate(ids)}
    out_a, out_b = [], []
    for a, b in _bucket_pair_set(buckets):
        if float(Vn[row_of[a]] @ Vn[row_of[b]]) >= threshold:
            out_a.append(a)
            out_b.append(b)
    return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})


def dup_clusters_golden(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    """Union-find over the MinHash golden pairs; every doc gets a
    cluster label = min member id (singletons label themselves)."""
    ids, texts = _read_docs(sf_dir)
    pairs = _minhash_pairs_core(ids, texts, threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = [find(int(i)) if int(i) in parent else int(i) for i in ids]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(labels, pa.int64())})


def multimodal_features_golden(sf_dir: str, dim: int = 16) -> pa.Table:
    """Deterministic fake-decode feature oracle: sha256(payload) ->
    `dim` uint16 words.  Verifies the multimodal actor-pool plumbing
    (schema, batching, filter, output layout) end-to-end; the real
    codec is environment-blocked and stubbed by design."""
    import hashlib

    ids, texts = _read_docs(sf_dir)
    cols: dict[str, list[int]] = {f"f{i}": [] for i in range(dim)}
    for txt in texts:
        d = hashlib.sha256((txt or "").encode()).digest()
        words = np.frombuffer(d[: dim * 2], dtype=np.uint16)
        for i in range(dim):
            cols[f"f{i}"].append(int(words[i]))
    out = {"media_id": pa.array(ids, pa.int64())}
    for i in range(dim):
        out[f"f{i}"] = pa.array(cols[f"f{i}"], pa.int64())
    return pa.table(out)


def multimodal_decode_golden(sf_dir: str, n: int = 60, seed: int = 7,
                             dim: int = 16) -> pa.Table:
    """REAL-decode feature oracle, computed WITHOUT the codecs: replays
    synthesize_media_table(real=True)'s RNG stream to regenerate the
    SOURCE pixel/sample arrays, then featurizes them with independent
    numpy (explicit deviation formula, repeat-based 2x upsample).  The
    engine path goes pixels -> encode_bmp/ppm/wav -> binary column ->
    actor-pool decode -> features; agreement proves the stdlib
    encode/decode round-trip and the distributed featurization."""
    rng = np.random.default_rng(seed)
    ids, kinds_out, feats = [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "video":
            # mirror the corpus's real-AVI frame draw to keep the RNG
            # stream aligned (video rows aren't featurized here)
            rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
            continue
        if kind == "image":
            img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
            img[:, :, 0] = np.linspace(0, 255, 16, dtype=np.uint8)[None, :]
            # 16 -> 32 nearest-neighbor == each pixel repeated 2x2
            small = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1) / 255.0
            flat = small.reshape(-1, 3)
            mu = flat.sum(axis=0) / flat.shape[0]
            var = ((flat - mu) ** 2).sum(axis=0) / flat.shape[0]
            gray = small.mean(axis=2)
            hist, _ = np.histogram(gray, bins=10, range=(0.0, 1.0))
            f = np.concatenate([mu, np.sqrt(var), hist / gray.size])
        else:
            t = np.arange(400) / 8000.0
            freq = 200.0 + float(rng.integers(0, 800))
            wave = (8000.0 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
            mono = wave.astype(np.float64) / 32768.0  # mono: mean of 1 ch
            zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            hist, _ = np.histogram(np.abs(mono), bins=8, range=(0.0, 1.0))
            f = np.concatenate([
                [mono.size / 8000.0, 8000.0 / 48000.0, 1.0,
                 np.sqrt((mono ** 2).sum() / mono.size),
                 mono.sum() / mono.size, np.std(mono),
                 np.abs(mono).max(), zc / mono.size],
                hist / mono.size,
            ])
        ids.append(i)
        kinds_out.append(kind)
        feats.append(f)
    M = np.round(np.stack(feats), ROUND)
    out = {"media_id": pa.array(ids, pa.int64()),
           "kind": pa.array(kinds_out, pa.string())}
    for j in range(dim):
        out[f"f{j}"] = pa.array(M[:, j], pa.float64())
    return pa.table(out)


def ann_ivf_golden(sf_dir: str, k: int = 10, nq: int = 8, nlist: int = 16,
                   nprobe: int = 4, seed: int = 42, sample_size: int = 4096) -> pa.Table:
    """Single-process IVF replay.  Centroid fitting reuses the engine's
    _kmeans_lite (the index *configuration*); assignment, probing,
    per-list search and the global merge are recomputed here with plain
    numpy over the whole table — what the golden verifies is that the
    distributed centroid-groupby search returns the same ranking."""
    from .pipelines.ann import _kmeans_lite, _normalize

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    C = _kmeans_lite(V[:sample_size], nlist, seed=seed)
    qsel = np.argsort(ids, kind="stable")[:nq]  # nq smallest vec_ids
    Q = _normalize(V[qsel])
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    Vn = _normalize(V)
    assign = np.argmax(Vn @ C.T, axis=1)
    out_q, out_r, out_id = [], [], []
    for qi in range(Q.shape[0]):
        mask = np.isin(assign, probe[qi])
        cids = ids[mask]
        scores = Vn[mask] @ Q[qi]
        top = np.lexsort((cids, -scores))[:k]
        for r, j in enumerate(top, 1):
            out_q.append(qi)
            out_r.append(r)
            out_id.append(int(cids[j]))
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "vec_id": pa.array(out_id, pa.int64())})


def ann_lsh_golden(sf_dir: str, k: int = 10, nq: int = 8, n_tables: int = 16,
                   n_planes: int = 10, seed: int = 42,
                   probe_radius: int = 1) -> pa.Table:
    """Single-process LSH-ANN replay.  Plane generation reuses the
    engine's _lsh_planes/_lsh_codes (the index *configuration*); the
    candidate union over probed buckets, scoring and merge are
    recomputed here with plain numpy over the whole table — the golden
    verifies that the distributed bucket-groupby search (including the
    cross-table candidate dedup) returns the same ranking."""
    from .pipelines.ann import _lsh_codes, _lsh_planes, _normalize

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    Vn = _normalize(V)
    qsel = np.argsort(ids, kind="stable")[:nq]  # nq smallest vec_ids
    Q = Vn[qsel]
    planes = _lsh_planes(V.shape[1], n_tables, n_planes, seed)
    codes = _lsh_codes(Vn, planes)   # (n, T)
    qcodes = _lsh_codes(Q, planes)   # (nq, T)
    flips = np.concatenate([[np.int64(0)],
                            (np.int64(1) << np.arange(n_planes, dtype=np.int64))
                            if probe_radius >= 1 else []]).astype(np.int64)
    out_q, out_r, out_id = [], [], []
    for qi in range(Q.shape[0]):
        probe = qcodes[qi][:, None] ^ flips[None, :]       # (T, 1+p)
        mask = (codes[:, :, None] == probe[None, :, :]).any(axis=(1, 2))
        cids = ids[mask]
        scores = Vn[mask] @ Q[qi]
        top = np.lexsort((cids, -scores))[:k]
        for r, j in enumerate(top, 1):
            out_q.append(qi)
            out_r.append(r)
            out_id.append(int(cids[j]))
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "vec_id": pa.array(out_id, pa.int64())})


# --------------------------------------------------------------------------
# generation + cache
# --------------------------------------------------------------------------

def _sorted_csr(fix_dir: str):
    """Adjacency as CSR over logical ids, rows sorted by dst ascending —
    the identity-permutation engine layout the corpus/sampling operators
    assert (stages/csr.py lexsorts (dst, loc))."""
    e, n = _fixture_graph(fix_dir)
    order = np.lexsort((e[:, 1], e[:, 0]))
    src, dst = e[order, 0], e[order, 1]
    counts = np.bincount(src, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return indptr, dst.astype(np.int64), n


def scc_golden(fix_dir: str) -> pa.Table:
    """Iterative-Tarjan SCC labels (fora_ray.oracle.scc_oracle) — fully
    independent of the engine's min-label intersection kernel."""
    from .oracle import scc_oracle

    e, n = _fixture_graph(fix_dir)
    comp = scc_oracle(e, n)
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "scc": pa.array(comp)})


def walk_corpus_golden(fix_dir: str, nwalks: int = 2, walk_len: int = 5,
                       seed: int = 42) -> pa.Table:
    """Single-process replay of random_walk_corpus: same counter-RNG
    (key = mix64(seed, walk_id); draw = rng(mix64(key, hop)); slot =
    floor(u*d) into the dst-sorted CSR row) — shares only the hashing
    primitives; the walk loop itself is an independent numpy replay."""
    from .functions.hashing import rng_uniform

    indptr, indices, n = _sorted_csr(fix_dir)
    deg = np.diff(indptr)
    wid = np.repeat(np.arange(n, dtype=np.int64) * nwalks, nwalks) \
        + np.tile(np.arange(nwalks, dtype=np.int64), n)
    key = mix64(np.uint64(seed), wid.astype(np.uint64))
    cur = np.repeat(np.arange(n, dtype=np.int64), nwalks)
    recs = [(wid, np.zeros(wid.size, np.int64), cur)]
    w, k, c = wid, key, cur
    for hop in range(1, walk_len):
        alive = deg[c] > 0
        if not alive.any():
            break
        w, k, c = w[alive], k[alive], c[alive]
        d = deg[c]
        u = rng_uniform(mix64(k, np.full(k.size, np.uint64(hop), np.uint64)))
        c = indices[indptr[c] + np.minimum((u * d).astype(np.int64), d - 1)]
        recs.append((w, np.full(w.size, hop, np.int64), c))
    t = pa.table({
        "walk_id": pa.array(np.concatenate([r[0] for r in recs])),
        "step": pa.array(np.concatenate([r[1] for r in recs])),
        "node_id": pa.array(np.concatenate([r[2] for r in recs])),
    })
    return t.sort_by([("walk_id", "ascending"), ("step", "ascending")])


def node2vec_corpus_golden(fix_dir: str, nwalks: int = 2, walk_len: int = 5,
                           p: float = 0.5, q: float = 2.0,
                           seed: int = 42) -> pa.Table:
    """Single-process replay of node2vec_corpus: the same counter-RNG
    rejection-sampling protocol (u_prop = rng(mix64(hkey, 2*attempt)),
    u_acc = rng(mix64(hkey, 2*attempt + 1)), hkey = mix64(key, hop),
    GLOBAL lockstep attempt counter, accept alpha / M) replayed over the
    fixture's dst-sorted CSR — shares only the hashing primitives with
    the engine; the walk loop is an independent numpy replay."""
    from .functions.hashing import rng_uniform

    indptr, indices, n = _sorted_csr(fix_dir)
    deg = np.diff(indptr)
    invp, invq = 1.0 / p, 1.0 / q
    m_env = max(invp, 1.0, invq)
    wid = np.repeat(np.arange(n, dtype=np.int64) * nwalks, nwalks) \
        + np.tile(np.arange(nwalks, dtype=np.int64), n)
    key = mix64(np.uint64(seed), wid.astype(np.uint64))
    cur = np.repeat(np.arange(n, dtype=np.int64), nwalks)
    prev = np.full(wid.size, -1, np.int64)
    recs = [(wid, np.zeros(wid.size, np.int64), cur)]
    w, k, c, pv = wid, key, cur, prev
    for hop in range(1, walk_len):
        alive = deg[c] > 0
        if not alive.any():
            break
        w, k, c, pv = w[alive], k[alive], c[alive], pv[alive]
        hkey = mix64(k, np.full(k.size, np.uint64(hop), np.uint64))
        new_c = np.empty_like(c)
        idx = np.arange(c.size, dtype=np.int64)
        attempt = 0
        while idx.size:
            a2 = np.uint64(2 * attempt)
            u_p = rng_uniform(mix64(hkey[idx], np.full(idx.size, a2, np.uint64)))
            d = deg[c[idx]]
            x = indices[indptr[c[idx]] + np.minimum((u_p * d).astype(np.int64), d - 1)]
            u_a = rng_uniform(mix64(
                hkey[idx], np.full(idx.size, a2 + np.uint64(1), np.uint64)))
            first = pv[idx] < 0
            back = (~first) & (x == pv[idx])
            others = ~first & ~back
            alpha = np.ones(idx.size)
            alpha[back] = invp
            if others.any():
                po, xo = pv[idx][others], x[others]
                found = np.zeros(po.size, dtype=bool)
                for i in range(po.size):  # golden-side clarity; rows tiny
                    row = indices[indptr[po[i]]:indptr[po[i] + 1]]
                    j = np.searchsorted(row, xo[i])
                    found[i] = j < row.size and row[j] == xo[i]
                alpha[others] = np.where(found, 1.0, invq)
            acc = first | (u_a < alpha / m_env)
            new_c[idx[acc]] = x[acc]
            idx = idx[~acc]
            attempt += 1
        pv, c = c, new_c
        recs.append((w, np.full(w.size, hop, np.int64), c))
    t = pa.table({
        "walk_id": pa.array(np.concatenate([r[0] for r in recs])),
        "step": pa.array(np.concatenate([r[1] for r in recs])),
        "node_id": pa.array(np.concatenate([r[2] for r in recs])),
    })
    return t.sort_by([("walk_id", "ascending"), ("step", "ascending")])


def neighbor_sample_golden(fix_dir: str, n_seeds: int = 8,
                           fanouts=(3, 2), seed: int = 42) -> pa.Table:
    """Single-process replay of neighbor_sample over seeds 0..n_seeds-1:
    per frontier node keep the fanout smallest
    mix64(mix64(mix64(seed, hop), src), dst) neighbors."""
    indptr, indices, n = _sorted_csr(fix_dir)
    frontier = np.arange(min(n_seeds, n), dtype=np.int64)
    rows = []
    for hop, f in enumerate(fanouts):
        if frontier.size == 0:
            break
        seed_hop = mix64(np.uint64(seed), np.uint64(hop))
        srcs, dsts = [], []
        for s in frontier:
            nb = indices[indptr[s]:indptr[s + 1]]
            if nb.size == 0:
                continue
            keys = mix64(mix64(np.full(nb.size, seed_hop, np.uint64),
                               np.full(nb.size, np.uint64(s), np.uint64)),
                         nb.astype(np.uint64))
            pick = nb[np.argsort(keys, kind="stable")[:f]]
            srcs.append(np.full(pick.size, s, np.int64))
            dsts.append(pick)
        if not srcs:
            break
        sa, da = np.concatenate(srcs), np.concatenate(dsts)
        rows.append((sa, da, np.full(sa.size, hop, np.int64)))
        frontier = np.unique(da)
    if not rows:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "hop": pa.array([], pa.int64())})
    t = pa.table({
        "src": pa.array(np.concatenate([r[0] for r in rows])),
        "dst": pa.array(np.concatenate([r[1] for r in rows])),
        "hop": pa.array(np.concatenate([r[2] for r in rows])),
    })
    return t.sort_by([("hop", "ascending"), ("src", "ascending"),
                      ("dst", "ascending")])


def _shingle_u64(text: str, k: int) -> np.ndarray:
    """Plain replay of the engine shingling contract (lowercased \\w+
    words; < k words -> whole text as one shingle) over the shared
    hash_str_u64 primitive."""
    words = re.findall(r"\w+", (text or "").lower())
    if not words:
        return np.empty(0, np.uint64)
    if len(words) < k:
        return hash_str_u64([" ".join(words)])
    return hash_str_u64([" ".join(words[i:i + k]) for i in range(len(words) - k + 1)])


def decontaminate_golden(sf_dir: str, n_bench: int = 5, ngram: int = 8) -> pa.Table:
    """Single-process replay: benchmark = the n_bench lowest doc_ids;
    n_hits = |distinct shingles of doc ∩ benchmark shingle set|."""
    ids, texts = _read_docs(sf_dir)
    order = np.argsort(np.asarray(ids))
    bench_ids = [ids[i] for i in order[:n_bench]]
    bench = set()
    for i in order[:n_bench]:
        bench.update(_shingle_u64(texts[i], ngram).tolist())
    out_ids, out_hits = [], []
    for i, txt in zip(ids, texts):
        u = set(np.unique(_shingle_u64(txt, ngram)).tolist())
        n = len(u & bench)
        if n > 0:
            out_ids.append(i)
            out_hits.append(n)
    t = pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                  "n_hits": pa.array(out_hits, pa.int64())})
    return t.sort_by([("doc_id", "ascending")])


def harmonic_golden(fix_dir: str, n_pivots: int = 8, seed: int = 42) -> pa.Table:
    """Python replay of pivot-sampled harmonic centrality on the
    symmetrized fixture graph: same hash pivot sample, per-pivot BFS,
    H(v) = ((n-1)/k) * sum 1/d(p, v), accumulated in the same pivot
    order so float sums are bit-identical."""
    from collections import deque

    e, n = _fixture_graph(fix_dir)
    und = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
    adj = [[] for _ in range(n)]
    for s, d in und:
        adj[int(s)].append(int(d))
    deg = np.array([len(a) for a in adj])
    ids = np.nonzero(deg > 0)[0].astype(np.int64)
    keys = mix64(np.uint64(seed), ids.astype(np.uint64))
    order = np.lexsort((ids, keys))[:n_pivots]
    pivots = [int(v) for v in ids[order]]
    harm = np.zeros(n, np.float64)
    for p in pivots:
        dist = np.full(n, -1, np.int64)
        dist[p] = 0
        dq = deque([p])
        while dq:
            v = dq.popleft()
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    dq.append(w)
        reach = dist > 0
        harm[reach] += 1.0 / dist[reach]
    harm *= (n - 1) / max(len(pivots), 1)
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "harmonic": pa.array(_round_col(harm))})


def greedy_color_golden(fix_dir: str, seed: int = 42) -> pa.Table:
    """Python replay of iterated-Luby greedy coloring on the
    symmetrized fixture graph: color class c = MIS of the uncolored
    residual under priorities mix64(mix64(mix64(seed, c), round), id) —
    bit-identical to the engine at any partition count."""
    e, n = _fixture_graph(fix_dir)
    und = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
    und = und[und[:, 0] != und[:, 1]]
    adj = [[] for _ in range(n)]
    for s, d in und:
        adj[int(s)].append(int(d))
    color = np.full(n, -1, np.int64)
    ids = np.arange(n, dtype=np.int64)
    c = 0
    while (color < 0).any():
        cseed = mix64(np.uint64(seed), np.uint64(c))
        status = np.where(color >= 0, np.int8(0), np.int8(-1))
        rnd = 0
        while (status == -1).any():
            rseed = mix64(cseed, np.uint64(rnd))
            keys = mix64(np.full(n, rseed, np.uint64), ids.astype(np.uint64))
            joined = []
            for v in np.nonzero(status == -1)[0]:
                nb = [u for u in adj[v] if status[u] == -1]
                if all((keys[v], v) < (keys[u], u) for u in nb):
                    joined.append(v)
            status[joined] = 1
            for v in joined:
                for u in adj[v]:
                    if status[u] == -1:
                        status[u] = 0
            rnd += 1
        color[status == 1] = c
        c += 1
    return pa.table({"node_id": pa.array(ids), "color": pa.array(color)})


def ktruss_golden(fix_dir: str, k: int = 3) -> pa.Table:
    """Python replay of k-truss peeling on the symmetrized fixture
    graph: iterate [support(u,v) = |N(u) & N(v)|; keep support >= k-2]
    to fixpoint.  Deterministic set output — no float anywhere."""
    e, n = _fixture_graph(fix_dir)
    und = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
    und = und[und[:, 0] < und[:, 1]]
    edges = {(int(a), int(b)) for a, b in und}
    while True:
        adj: dict[int, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        kept = {(a, b) for a, b in edges
                if len(adj[a] & adj[b]) >= k - 2}
        if kept == edges:
            break
        edges = kept
    rows = sorted(edges)
    return pa.table({
        "lo": pa.array([r[0] for r in rows], pa.int64()),
        "hi": pa.array([r[1] for r in rows], pa.int64()),
    })


def trussness_golden(fix_dir: str) -> pa.Table:
    """Python replay of full truss decomposition on the symmetrized
    fixture graph: trussness(e) = max k with e in the k-truss.  Peels
    level by level (k = 3, 4, ...); edges dropped while peeling at k
    get trussness k-1; triangle-free edges get 2.  Deterministic set
    output — no float anywhere."""
    e, n = _fixture_graph(fix_dir)
    und = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
    und = und[und[:, 0] < und[:, 1]]
    cur = {(int(a), int(b)) for a, b in und}
    truss = {edge: 2 for edge in cur}
    k = 3
    while cur:
        while True:
            adj: dict[int, set] = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {(a, b) for a, b in cur
                    if len(adj[a] & adj[b]) < k - 2}
            if not drop:
                break
            for edge in drop:
                truss[edge] = k - 1
            cur -= drop
        k += 1
    rows = sorted(truss)
    return pa.table({
        "lo": pa.array([r[0] for r in rows], pa.int64()),
        "hi": pa.array([r[1] for r in rows], pa.int64()),
        "trussness": pa.array([truss[r] for r in rows], pa.int64()),
    })


def mis_golden(fix_dir: str, seed: int = 42) -> pa.Table:
    """Python replay of the deterministic Luby-style MIS on the
    symmetrized fixture graph: same counter-RNG priorities
    (mix64(mix64(seed, round), id)), same strict (key, id) local-min
    join rule, self-loops dropped — bit-identical to the engine at any
    partition count."""
    e, n = _fixture_graph(fix_dir)
    und = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
    und = und[und[:, 0] != und[:, 1]]
    adj = [[] for _ in range(n)]
    for s, d in und:
        adj[int(s)].append(int(d))
    status = np.full(n, -1, np.int8)
    rnd = 0
    while (status == -1).any():
        rseed = mix64(np.uint64(seed), np.uint64(rnd))
        ids = np.arange(n, dtype=np.int64)
        keys = mix64(np.full(n, rseed, np.uint64), ids.astype(np.uint64))
        joined = []
        for v in np.nonzero(status == -1)[0]:
            nb = [u for u in adj[v] if status[u] == -1]
            if all((keys[v], v) < (keys[u], u) for u in nb):
                joined.append(v)
        status[joined] = 1
        for v in joined:
            for u in adj[v]:
                if status[u] == -1:
                    status[u] = 0
        rnd += 1
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "in_mis": pa.array(status == 1)})


def betweenness_golden(fix_dir: str, n_pivots: int = 8,
                       seed: int = 42) -> pa.Table:
    """Python replay of pivot-sampled Brandes betweenness on the
    DIRECTED fixture graph: same hash pivot sample (k smallest
    mix64(seed, id) over out-degree > 0 nodes), per-pivot BFS +
    dependency accumulation, scaled n/k.  Summation order differs from
    the engine's shard order, so both sides round to 6 decimals (the
    engine is run-deterministic at fixed P, so the comparison is too)."""
    from collections import deque

    e, n = _fixture_graph(fix_dir)
    adj = [[] for _ in range(n)]
    for s, d in e:
        adj[int(s)].append(int(d))
    deg = np.array([len(a) for a in adj])
    ids = np.nonzero(deg > 0)[0].astype(np.int64)
    keys = mix64(np.uint64(seed), ids.astype(np.uint64))
    order = np.lexsort((ids, keys))[:n_pivots]
    pivots = [int(v) for v in ids[order]]
    bc = np.zeros(n, np.float64)
    for s in pivots:
        dist = np.full(n, -1, np.int64)
        sigma = np.zeros(n, np.float64)
        dist[s], sigma[s] = 0, 1.0
        bfs_order = [s]
        dq = deque([s])
        while dq:
            v = dq.popleft()
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                    bfs_order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(n, np.float64)
        for v in reversed(bfs_order):
            for w in adj[v]:
                if dist[w] == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        delta[s] = 0.0
        bc += delta
    bc *= n / max(len(pivots), 1)
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "betweenness": pa.array(np.round(bc, 6))})


def local_cluster_golden(fix_dir: str, rmax: float = 1e-4,
                         seed_node: int = 0) -> pa.Table:
    """ACL PPR-Nibble oracle: the push phase replays the P-shard
    protocol bit-exactly (ProtocolSim), the sweep is an INDEPENDENT
    python implementation (set-membership adjacency walk instead of
    the engine's vectorized rank-bincount prefix)."""
    import math as _math

    from .protocol_ref import ProtocolSim

    e, n = _fixture_graph(fix_dir)
    sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
    sym = sym[sym[:, 0] != sym[:, 1]]
    sim = ProtocolSim(sym, n, P=4)
    for sh in sim.shards:
        sh.init_single(seed_node)
    sim._push_loop(seed_node, rmax)
    reserve = sim._reserve_dense()
    sup = np.flatnonzero(reserve).astype(np.int64)
    ppr = reserve[sup]
    deg_all = np.bincount(sym[:, 0], minlength=n)
    deg = deg_all[sup]
    S = len(sup)
    if S and deg.max(initial=0) == 0:
        return pa.table({"node_id": pa.array(sup),
                         "sweep_rank": pa.array(np.zeros(S, np.int64)),
                         "ppr": pa.array(_round_col(ppr)),
                         "deg": pa.array(deg),
                         "in_cluster": pa.array(np.ones(S, bool))})
    key = np.where(deg > 0, ppr / np.maximum(deg, 1), -1.0)
    order = np.lexsort((sup, -key))
    supset = set(sup.tolist())
    nbrs: dict[int, list[int]] = {int(u): [] for u in sup}
    for u, v in sym:
        if int(u) in supset and int(v) in supset:
            nbrs[int(u)].append(int(v))
    M = len(sym)
    members: set[int] = set()
    vol = internal = 0
    best_phi, best_k = _math.inf, S - 1
    for k in range(S):
        v = int(sup[order[k]])
        vol += int(deg_all[v])
        internal += sum(1 for w in nbrs[v] if w in members)
        members.add(v)
        denom = min(vol, M - vol)
        if denom > 0:
            phi = (vol - 2 * internal) / denom
            if phi < best_phi:
                best_phi, best_k = phi, k
    rank = np.empty(S, np.int64)
    rank[order] = np.arange(S)
    return pa.table({"node_id": pa.array(sup),
                     "sweep_rank": pa.array(rank),
                     "ppr": pa.array(_round_col(ppr)),
                     "deg": pa.array(deg),
                     "in_cluster": pa.array(rank <= best_k)})


def eigenvector_golden(fix_dir: str, max_iters: int = 30) -> pa.Table:
    """Shifted power iteration x <- normalize(A^T x + x), fixed
    iterations — single-process numpy replay of the engine's sweep
    spec (algorithms.eigenvector_centrality)."""
    e, n = _fixture_graph(fix_dir)
    x = np.full(n, 1.0 / np.sqrt(n), np.float64)
    for _ in range(max_iters):
        y = np.zeros(n, np.float64)
        np.add.at(y, e[:, 1], x[e[:, 0]])
        x = y + x
        nrm = np.linalg.norm(x)
        if nrm > 0:
            x /= nrm
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "ev": pa.array(_round_col(x))})


def katz_golden(fix_dir: str, alpha: float = 0.01, beta: float = 1.0,
                max_iters: int = 30) -> pa.Table:
    """Truncated Katz series x <- alpha * A^T x + beta from x = 0,
    fixed iterations, L2-normalized once at the end."""
    e, n = _fixture_graph(fix_dir)
    x = np.zeros(n, np.float64)
    for _ in range(max_iters):
        y = np.zeros(n, np.float64)
        np.add.at(y, e[:, 1], x[e[:, 0]])
        x = alpha * y + beta
    nrm = np.linalg.norm(x)
    if nrm > 0:
        x /= nrm
    return pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                     "katz": pa.array(_round_col(x))})


_GRAPH_GOLDENS = {
    "pagerank": pagerank_golden,
    "ppr_exact": ppr_exact_golden,
    "backward_ppr": backward_ppr_golden,
    "lpa": lpa_golden,
    "kcore": kcore_golden,
    "hits": hits_golden,
    "diameter_est": diameter_golden,
    "fora_ppr": fora_ppr_golden,
    "monte_carlo_ppr": monte_carlo_golden,
    "ppr_batch": ppr_batch_golden,
    "fora_indexed": fora_indexed_golden,
    "topk_ppr": topk_ppr_golden,
    "hubppr": hubppr_golden,
    "walk_corpus": walk_corpus_golden,
    "node2vec_corpus": node2vec_corpus_golden,
    "betweenness": betweenness_golden,
    "mis": mis_golden,
    "ktruss": ktruss_golden,
    "trussness": trussness_golden,
    "greedy_color": greedy_color_golden,
    "scc": scc_golden,
    "harmonic": harmonic_golden,
    "neighbor_sample": neighbor_sample_golden,
    "eigenvector": eigenvector_golden,
    "katz": katz_golden,
    "local_cluster": local_cluster_golden,
}
def distinct_users_hll_golden(sf_dir: str, p: int = 12) -> pa.Table:
    """Pure-python HyperLogLog replay over events.user_id — independent
    of pipelines.sketches' vectorized kernels (shares only the splitmix64
    hash, which is the spec).  Register max-merge is order-invariant, so
    this single-process replay is bit-identical to the distributed
    aggregate at any partitioning."""
    import math as _math

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    m = 1 << p
    regs = [0] * m
    for v in t["user_id"].to_pylist():
        if v is None:
            continue
        h = int(splitmix64(np.uint64(np.int64(v).astype(np.uint64))))
        idx = h & (m - 1)
        suf = (h >> p) | (1 << (64 - p))
        rho = (suf & -suf).bit_length()  # trailing zeros + 1
        if rho > regs[idx]:
            regs[idx] = rho
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if e <= 2.5 * m and zeros > 0:
        e = m * _math.log(m / zeros)
    return pa.table({"distinct_users": pa.array([int(round(e))], pa.int64())})


def value_quantiles_golden(sf_dir: str, qs=(0.1, 0.5, 0.9), bins: int = 4096) -> pa.Table:
    """Pure-python replay of the fixed-bin histogram quantile sketch over
    events.value (bin sum-merge is order-invariant, so this matches the
    distributed aggregate bit-for-bit)."""
    import bisect
    import math as _math

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["value"])
    vals = [float(v) for v in t["value"].to_pylist() if v is not None]
    lo, hi = min(vals), max(vals)
    width = (hi - lo) / bins
    counts = [0] * bins
    for v in vals:
        idx = int((v - lo) / width)
        counts[min(max(idx, 0), bins - 1)] += 1
    cums = []
    c = 0
    for x in counts:
        c += x
        cums.append(c)
    n = len(vals)
    out = []
    for q in qs:
        r = q * (n - 1)
        b = min(bisect.bisect_left(cums, _math.floor(r) + 1), bins - 1)
        below = cums[b - 1] if b > 0 else 0
        in_bin = counts[b]
        frac = ((r - below) / in_bin) if in_bin > 0 else 0.0
        out.append(lo + (b + min(max(frac, 0.0), 1.0)) * width)
    return pa.table({
        "q": pa.array([float(q) for q in qs], pa.float64()),
        "value": pa.array(_round_col(np.asarray(out)), pa.float64()),
    })


def video_frames_golden(sf_dir: str, n: int = 60, seed: int = 7) -> pa.Table:
    """Frame-sampling oracle computed WITHOUT the AVI codec: replays
    synthesize_media_table(real=True)'s RNG stream to regenerate the
    SOURCE frame arrays and emits each frame's mean luminance — the
    engine path goes frames -> encode_avi_raw -> binary column ->
    actor-pool decode_avi_raw -> per-frame stats (FrameSampler)."""
    rng = np.random.default_rng(seed)
    ids, fidx, lums = [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        elif kind == "audio":
            rng.integers(0, 800)
        else:
            frames = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
            for k in range(4):
                ids.append(i)
                fidx.append(k)
                lums.append(float(frames[k].astype(np.float64).mean()) / 255.0)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "frame_idx": pa.array(fidx, pa.int32()),
        "mean_lum": pa.array(np.round(np.array(lums), ROUND), pa.float64()),
    })


_DOC_GOLDENS = {
    "events_distinct_users": distinct_users_hll_golden,
    "video_frames": video_frames_golden,
    "events_value_quantiles": value_quantiles_golden,
    "langid": langid_golden,
    "doc_fingerprints": fingerprints_golden,
    "minhash_dups": minhash_pairs_golden,
    "ngram_jaccard_dups": ngram_jaccard_pairs_golden,
    "simhash_dups": simhash_pairs_golden,
    "curation": curation_golden,
    "ann_ivf": ann_ivf_golden,
    "ann_lsh": ann_lsh_golden,
    "embedding_dups": embedding_dups_golden,
    "dup_clusters": dup_clusters_golden,
    "multimodal_features": multimodal_features_golden,
    "multimodal_decode": multimodal_decode_golden,
    "decontaminate": decontaminate_golden,
}


def write_goldens(fix_dir: str, sf_dir: str,
                  root: str = "/tmp/fora_ray_goldens") -> dict[str, str]:
    """Generate (or reuse) every golden parquet for one (fixture, sf)
    pair.  Returns {query_name: parquet_path}."""
    tag = f"{os.path.basename(fix_dir.rstrip('/'))}__{os.path.basename(sf_dir.rstrip('/'))}_v{_VERSION}"
    out_dir = os.path.join(root, tag)
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_GOLDEN_OK.json")
    names = list(_GRAPH_GOLDENS) + list(_DOC_GOLDENS)
    paths = {nm: os.path.join(out_dir, f"{nm}.parquet") for nm in names}
    params = {"fix": fix_dir, "sf": sf_dir, "version": _VERSION, "round": ROUND}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return paths
    for nm, fn in _GRAPH_GOLDENS.items():
        pq.write_table(fn(fix_dir), paths[nm])
    for nm, fn in _DOC_GOLDENS.items():
        pq.write_table(fn(sf_dir), paths[nm])
    fd, tmp = tempfile.mkstemp(dir=out_dir)
    with os.fdopen(fd, "w") as f:
        json.dump(params, f)
    os.replace(tmp, marker)
    return paths
