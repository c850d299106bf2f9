"""Deduplication pipelines over a documents table — first-class
training-data-pipeline operators (task brief; SURVEY.md 2.5 A4 analog).

All operate on a Dataset with (doc_id:int64, text:string, ...):

- exact_dedup          sha256(text) -> groupby -> min doc_id per group
- minhash_lsh          shingle -> minhash -> banded LSH buckets ->
                       candidate pairs -> exact Jaccard verify
- simhash              64-bit simhash -> 4x16-bit band buckets ->
                       hamming verify
- embedding_dups       random-hyperplane LSH over embedding vectors ->
                       within-bucket cosine verify
- dup_clusters         connected components over verified dup pairs

Everything vectorized per batch (numpy over token hashes); every hash
is seeded/counter-based so results are identical at any parallelism.
Scale notes: the only shuffles are the bucket groupbys; candidate
verification joins texts back via broadcast at test scale (the scale
path is a hash join on doc_id, same shape as stages/edges.py).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count

from ..functions.hashing import hash_str_u64, mix64, sha256_hex

_WORD = re.compile(r"\w+")


def add_text_sha256(batch: pa.Table, col: str = "text") -> pa.Table:
    digs = [sha256_hex(v) if v is not None else None for v in batch[col].to_pylist()]
    return batch.append_column("text_sha256", pa.array(digs, pa.string()))




def _pool_size() -> tuple[int, int]:
    """Verify-stage actor pool: scale with the session (the broadcast
    text/signature table deserializes once per actor, so actors beat
    tasks here — but a fixed small cap serializes the whole verify)."""
    try:
        return (1, max(4, int(ray.cluster_resources().get("CPU", 8))))
    except Exception:
        return (1, 8)

def exact_dedup(docs_ds, id_col: str = "doc_id"):
    """Keep the minimum doc_id per identical text.  Returns a Dataset
    with one column (doc_id), sorted."""
    hashed = docs_ds.map_batches(
        lambda t: pa.table(
            {
                id_col: t[id_col],
                "text_sha256": add_text_sha256(t)["text_sha256"],
            }
        ),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Min

    kept = hashed.groupby("text_sha256").aggregate(Min(id_col, alias_name=id_col))
    return kept.select_columns([id_col]).sort(id_col)


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of word k-shingles (vectorized over the shingle list)."""
    words = _WORD.findall(text.lower())
    if len(words) < k:
        return hash_str_u64([" ".join(words)]) if words else np.empty(0, np.uint64)
    shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return hash_str_u64(shingles)


def _minhash_sig(sh: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """num_perm minhashes via seeded xor-permutations of shingle hashes."""
    if sh.size == 0:
        return np.full(num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
    seeds = mix64(np.uint64(seed), np.arange(num_perm, dtype=np.uint64))
    # (num_perm, n_shingles) via broadcasting, min over shingles
    return mix64(sh[None, :], seeds[:, None]).min(axis=1)


class MinHasher:
    """Task stage (plain callable): doc -> (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perm=64, bands=16, shingle_k=5, seed=42):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k, self.seed = num_perm, bands, shingle_k, seed
        self.rows_per_band = num_perm // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        o_band, o_hash, o_id = [], [], []
        for did, txt in zip(ids, texts):
            sig = _minhash_sig(_shingle_hashes(txt or "", self.k), self.num_perm, self.seed)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                o_band.append(b)
                o_hash.append(int(mix64(chunk, np.uint64(b)).sum() & np.uint64(0xFFFFFFFFFFFFFFFF)))
                o_id.append(int(did))
        return pa.table(
            {
                "band_id": pa.array(o_band, pa.int32()),
                "band_hash": pa.array(o_hash, pa.uint64()),
                "doc_id": pa.array(o_id, pa.int64()),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """All doc-id pairs within one (band_id, band_hash) bucket."""
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
    if ids.size < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    i, j = np.triu_indices(ids.size, 1)
    return pa.table({"a": pa.array(ids[i]), "b": pa.array(ids[j])})


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact word-k-shingle Jaccard similarity (verification kernel)."""
    sa = set(_shingle_hashes(text_a or "", k).tolist())
    sb = set(_shingle_hashes(text_b or "", k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_lsh_dups(docs_ds, threshold: float = 0.7, num_perm: int = 64,
                     bands: int = 16, shingle_k: int = 5, seed: int = 42):
    """Near-duplicate pairs by MinHash-LSH, Jaccard-verified.

    Returns Dataset (a, b, jaccard) with a < b, jaccard >= threshold,
    sorted.  Texts for verification are broadcast (test scale); at 100 TB
    the verify stage becomes a doc_id hash join.
    """
    sigs = docs_ds.map_batches(
        MinHasher(num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow",
    )  # plain-callable task stage: setup is trivial, tasks reuse warm workers
    pairs = (
        sigs.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    # dedup candidate pairs across bands (one groupby on packed key)
    from ..stages.edges import dedup_edges

    cand = dedup_edges(
        pairs.map_batches(
            lambda t: pa.table({"src": t["a"], "dst": t["b"]}), batch_format="pyarrow"
        )
    )
    # broadcast texts for verification
    texts: dict[int, str] = {}
    for blk in ray.get(docs_ds.select_columns(["doc_id", "text"]).to_arrow_refs()):
        for i, txt in zip(blk["doc_id"].to_pylist(), blk["text"].to_pylist()):
            texts[i] = txt
    texts_ref = ray.put(texts)

    class Verify:
        def __init__(self, ref, thr, k):
            self.texts, self.thr, self.k = ray.get(ref), thr, k
            self._sets: dict[int, frozenset] = {}  # per-actor shingle cache:
            # a doc appears in many candidate pairs; shingling it once per
            # actor instead of once per pair is a ~10x verify speedup

        def _set(self, i: int) -> frozenset:
            s = self._sets.get(i)
            if s is None:
                s = frozenset(_shingle_hashes(self.texts.get(i) or "", self.k).tolist())
                self._sets[i] = s
            return s

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["src"].to_numpy(zero_copy_only=False)
            b = t["dst"].to_numpy(zero_copy_only=False)
            jac = np.empty(len(a))
            for i, (x, y) in enumerate(zip(a, b)):
                sa, sb = self._set(int(x)), self._set(int(y))
                if not sa and not sb:
                    jac[i] = 1.0
                else:
                    inter = len(sa & sb)
                    jac[i] = inter / (len(sa) + len(sb) - inter)
            keep = jac >= self.thr
            return pa.table({
                "a": pa.array(a[keep]), "b": pa.array(b[keep]),
                "jaccard": pa.array(jac[keep]),
            })

    return cand.map_batches(
        Verify, fn_constructor_kwargs={"ref": texts_ref, "thr": threshold, "k": shingle_k},
        batch_format="pyarrow", concurrency=_pool_size(), batch_size=2048,
    ).sort(["a", "b"])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(text: str, seed: int = 42) -> int:
    """64-bit simhash over word hashes (sign-aggregated bit votes)."""
    words = _WORD.findall((text or "").lower())
    if not words:
        return 0
    h = mix64(hash_str_u64(words), np.uint64(seed))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


class SimHasher:
    def __init__(self, seed=42):
        self.seed = seed

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sh = np.array([simhash64(x, self.seed) for x in t["text"].to_pylist()], dtype=np.uint64)
        return pa.table({"doc_id": pa.array(ids), "simhash": pa.array(sh, pa.uint64())})


def simhash_dups(docs_ds, hamming_thresh: int = 3, seed: int = 42):
    """Near-dup pairs by SimHash banding (4 x 16-bit chunks: hamming<=3
    implies at least one identical chunk) + hamming verification.
    Returns Dataset (a, b, hamming) sorted."""
    sigs = docs_ds.map_batches(
        SimHasher(seed=seed), batch_format="pyarrow",
    ).materialize()  # reused: banding + verification lookup

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands, hashes, out_ids = [], [], []
        for b in range(4):
            chunk = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bands.append(np.full(ids.size, b, np.int32))
            hashes.append(chunk)
            out_ids.append(ids)
        return pa.table({
            "band_id": pa.array(np.concatenate(bands)),
            "band_hash": pa.array(np.concatenate(hashes).astype(np.uint64), pa.uint64()),
            "doc_id": pa.array(np.concatenate(out_ids)),
        })

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    from ..stages.edges import dedup_edges

    cand = dedup_edges(
        pairs.map_batches(lambda t: pa.table({"src": t["a"], "dst": t["b"]}), batch_format="pyarrow")
    )
    lookup = {}
    for blk in ray.get(sigs.to_arrow_refs()):
        for i, s in zip(blk["doc_id"].to_pylist(), blk["simhash"].to_pylist()):
            lookup[i] = s
    ref = ray.put(lookup)

    class Verify:
        def __init__(self, r, thr):
            self.lk, self.thr = ray.get(r), thr

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["src"].to_numpy(zero_copy_only=False)
            b = t["dst"].to_numpy(zero_copy_only=False)
            ha = np.array([self.lk[int(x)] for x in a], dtype=np.uint64)
            hb = np.array([self.lk[int(x)] for x in b], dtype=np.uint64)
            ham = np.array([bin(int(x ^ y)).count("1") for x, y in zip(ha, hb)])
            keep = ham <= self.thr
            return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                             "hamming": pa.array(ham[keep].astype(np.int32))})

    return cand.map_batches(
        Verify, fn_constructor_kwargs={"r": ref, "thr": hamming_thresh},
        batch_format="pyarrow", concurrency=_pool_size(), batch_size=4096,
    ).sort(["a", "b"])


# --------------------------------------------------------------------------
# Embedding near-dup (cosine)
# --------------------------------------------------------------------------

def embedding_dups(emb_ds, threshold: float = 0.95, n_planes: int = 16, seed: int = 42):
    """Near-dup vector pairs: random-hyperplane LSH bucket -> within-bucket
    cosine verify.  Dataset (a, b, cosine) with a < b, sorted."""
    # draw hyperplanes deterministically; dim probed from first block
    first = ray.get(emb_ds.limit(1).to_arrow_refs())[0]
    dim = len(first["embedding"][0].as_py())
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    class Bucket:
        def __init__(self, ref):
            self.planes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
            sig = (vecs @ self.planes > 0).astype(np.uint64)
            key = (sig << np.arange(self.planes.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)
            return pa.table({"bucket": pa.array(key, pa.uint64()), "vec_id": pa.array(ids)})

    buckets = emb_ds.map_batches(
        Bucket, fn_constructor_kwargs={"ref": planes_ref},
        batch_format="pyarrow", concurrency=(1, 4),
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group["vec_id"].to_numpy(zero_copy_only=False))
        if ids.size < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        i, j = np.triu_indices(ids.size, 1)
        return pa.table({"a": pa.array(ids[i]), "b": pa.array(ids[j])})

    cand = buckets.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    vecs = {}
    for blk in ray.get(emb_ds.select_columns(["vec_id", "embedding"]).to_arrow_refs()):
        for i, v in zip(blk["vec_id"].to_pylist(), blk["embedding"].to_pylist()):
            a = np.asarray(v, dtype=np.float64)
            vecs[i] = a / (np.linalg.norm(a) or 1.0)
    vref = ray.put(vecs)

    class Verify:
        def __init__(self, r, thr):
            self.v, self.thr = ray.get(r), thr

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            cos = np.array([float(self.v[int(x)] @ self.v[int(y)]) for x, y in zip(a, b)])
            keep = cos >= self.thr
            return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                             "cosine": pa.array(cos[keep])})

    from ..stages.edges import dedup_edges

    cand = dedup_edges(
        cand.map_batches(lambda t: pa.table({"src": t["a"], "dst": t["b"]}), batch_format="pyarrow")
    ).map_batches(lambda t: pa.table({"a": t["src"], "b": t["dst"]}), batch_format="pyarrow")
    return cand.map_batches(
        Verify, fn_constructor_kwargs={"r": vref, "thr": threshold},
        batch_format="pyarrow", concurrency=_pool_size(), batch_size=4096,
    ).sort(["a", "b"])


def dup_clusters(pairs_ds, ids_ds, id_col: str = "doc_id",
                 strategy: str = "auto", distributed_threshold: int = 2_000_000):
    """Cluster verified dup pairs into groups: connected components with
    label = min member id.

    strategy='unionfind' gathers the (small) pair set to the driver;
    'distributed' reuses the superstep CC runtime over the pair graph —
    the scale path when the candidate set is itself huge.  'auto' picks
    by pair count."""
    if strategy == "auto":
        strategy = (
            "distributed" if pairs_ds.count() > distributed_threshold else "unionfind"
        )
    if strategy == "distributed":
        import pyarrow.compute as _pc

        from ..graph.algorithms import connected_components
        from ..graph.runtime import GraphHandle
        from ..stages.edges import symmetrize

        n = int(ids_ds.max(id_col)) + 1
        edges = pairs_ds.map_batches(
            lambda t: pa.table({"src": t["a"], "dst": t["b"]}), batch_format="pyarrow"
        )
        with GraphHandle.from_edges(symmetrize(edges), n, P=8) as h:
            labels, _ = connected_components(h)
            lab = labels.rename_columns({"node_id": id_col, "label": "cluster"})
            # restrict to ids present in ids_ds (the CC handle covers 0..n-1)
            want = set()
            for blk in ray.get(ids_ds.select_columns([id_col]).to_arrow_refs()):
                want.update(blk[id_col].to_pylist())
            return lab.map_batches(
                lambda t, w=want: t.filter(
                    pa.array([i in w for i in t[id_col].to_pylist()])
                ),
                batch_format="pyarrow",
            ).sort(id_col)
    pairs = pairs_ds.to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = []
    for blk in ray.get(ids_ds.select_columns([id_col]).to_arrow_refs()):
        for i in blk[id_col].to_pylist():
            rows.append((i, find(int(i)) if i in parent else i))
    t = pa.table({
        id_col: pa.array([r[0] for r in rows], pa.int64()),
        "cluster": pa.array([r[1] for r in rows], pa.int64()),
    })
    return ray.data.from_arrow(t).sort(id_col)
