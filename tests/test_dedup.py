"""Dedup pipelines vs DuckDB / brute-force oracles."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from fora_ray.pipelines.dedup import (
    dup_clusters,
    embedding_dups,
    exact_dedup,
    minhash_lsh_dups,
    ngram_jaccard,
    ngram_jaccard_dups,
    simhash_dups,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_exact_dedup_matches_duckdb():
    got = exact_dedup(_docs()).to_pandas()["doc_id"].tolist()
    want = (
        duckdb.sql(
            f"SELECT min(doc_id) AS doc_id FROM read_parquet('{SF}/documents.parquet') "
            "GROUP BY text ORDER BY 1"
        )
        .df()["doc_id"]
        .tolist()
    )
    assert got == want


def _dup_corpus():
    """Tiny corpus with planted near-dups."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about graphs and pagerank " * 6
    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [base, near, far, base],
    }
    return ray.data.from_arrow(pa.table(rows))


def test_minhash_lsh_finds_planted_dups():
    pairs = minhash_lsh_dups(_dup_corpus(), threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 3) in got  # identical
    assert (0, 1) in got  # near-dup
    assert all((2 not in p) for p in got)  # unrelated doc never matched
    # jaccard column is the exact verification value
    row = pairs[(pairs.a == 0) & (pairs.b == 1)].iloc[0]
    assert abs(row["jaccard"] - ngram_jaccard(
        _dup_corpus().take(2)[0]["text"], _dup_corpus().take(2)[1]["text"]
    )) < 1e-12


def test_sigs_from_sets_matches_minhasher():
    """The shingle-once signature stage must be bit-identical to the
    original MinHasher text stage (same bands, hashes, doc ids)."""
    from fora_ray.pipelines.dedup import MinHasher, _shingle_sets, _sigs_from_sets

    docs = _docs()
    a = (
        docs.map_batches(MinHasher(), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "band_id"])
        .reset_index(drop=True)
    )
    b = (
        _sigs_from_sets(_shingle_sets(docs, 5), num_perm=64, bands=16, seed=42)
        .to_pandas()
        .sort_values(["doc_id", "band_id"])
        .reset_index(drop=True)
    )
    assert a[["doc_id", "band_id", "band_hash"]].equals(
        b[["doc_id", "band_id", "band_hash"]]
    )


def test_ngram_jaccard_dups_exact_vs_bruteforce():
    """Prefix-filtered similarity join == O(n^2) brute force on the sf
    corpus, on BOTH verify strategies (exactness: no LSH recall loss)."""
    from fora_ray.goldens import ngram_jaccard_pairs_golden

    want = ngram_jaccard_pairs_golden(SF, threshold=0.5).to_pandas()
    want = list(map(tuple, want[["a", "b"]].to_numpy()))
    for strat in ("broadcast", "join"):
        got = (
            ngram_jaccard_dups(_docs(), threshold=0.5, verify_strategy=strat)
            .select_columns(["a", "b"])
            .to_pandas()
        )
        assert list(map(tuple, got[["a", "b"]].to_numpy())) == want
    assert len(want) > 0  # the sf corpus plants real near-dups


def test_ngram_jaccard_dups_planted():
    pairs = ngram_jaccard_dups(_dup_corpus(), threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 3) in got  # identical
    assert (0, 1) in got  # near-dup
    assert all((2 not in p) for p in got)
    # jaccard column is the exact word-3-gram jaccard
    row = pairs[(pairs.a == 0) & (pairs.b == 1)].iloc[0]
    texts = [r["text"] for r in _dup_corpus().take(2)]
    assert abs(row["jaccard"] - ngram_jaccard(texts[0], texts[1], k=3)) < 1e-12


def test_simhash_finds_planted_dups():
    pairs = simhash_dups(_dup_corpus(), hamming_thresh=6).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 3) in got
    assert all((2 not in p) for p in got)


def test_dup_clusters():
    pairs = minhash_lsh_dups(_dup_corpus(), threshold=0.5)
    clusters = dup_clusters(pairs, _dup_corpus()).to_pandas()
    c = dict(zip(clusters["doc_id"], clusters["cluster"]))
    assert c[0] == c[1] == c[3] == 0
    assert c[2] == 2


def test_embedding_dups():
    rng = np.random.default_rng(0)
    base = rng.standard_normal(32)
    rows = {
        "vec_id": [0, 1, 2],
        "embedding": [
            base.tolist(),
            (base + 0.01 * rng.standard_normal(32)).tolist(),
            rng.standard_normal(32).tolist(),
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    pairs = embedding_dups(ds, threshold=0.95, n_bands=4, planes_per_band=4).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 1) in got
    assert all((2 not in p) for p in got)


def test_dup_clusters_distributed_matches_unionfind():
    pairs = minhash_lsh_dups(_dup_corpus(), threshold=0.5)
    a = dup_clusters(pairs, _dup_corpus(), strategy="unionfind").to_pandas()
    b = dup_clusters(pairs, _dup_corpus(), strategy="distributed").to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def _sorted_pairs(df):
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def test_minhash_verify_join_matches_broadcast():
    a = _sorted_pairs(minhash_lsh_dups(_docs(), threshold=0.6,
                                       verify_strategy="broadcast").to_pandas())
    b = _sorted_pairs(minhash_lsh_dups(_docs(), threshold=0.6,
                                       verify_strategy="join").to_pandas())
    assert a.equals(b)


def test_simhash_verify_join_matches_broadcast():
    a = _sorted_pairs(simhash_dups(_docs(), hamming_thresh=3,
                                   verify_strategy="broadcast").to_pandas())
    b = _sorted_pairs(simhash_dups(_docs(), hamming_thresh=3,
                                   verify_strategy="join").to_pandas())
    assert a.equals(b)


def test_embedding_verify_join_matches_broadcast():
    rng = np.random.default_rng(5)
    V = rng.standard_normal((40, 16))
    V[7] = V[3]  # planted exact dups
    V[21] = V[3] + 1e-4 * rng.standard_normal(16)
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in V]),
    }))
    a = _sorted_pairs(embedding_dups(emb, threshold=0.95,
                                     verify_strategy="broadcast").to_pandas())
    b = _sorted_pairs(embedding_dups(emb, threshold=0.95,
                                     verify_strategy="join").to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_bucket_cap_bounds_pairs_and_keeps_connectivity():
    from fora_ray.pipelines.dedup import _bucket_pairs

    n = 2000
    g = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    t = _bucket_pairs(g, cap=100)
    # far below the n^2/2 blow-up (the uncapped count would be 1_999_000)
    assert t.num_rows < 150_000
    # the sub-shard bridge pairs keep the bucket one connected component
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(t["a"].to_pylist(), t["b"].to_pylist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    assert len({find(i) for i in range(n)}) == 1


def test_hot_bucket_pipeline_completes_bounded():
    """1200 identical docs = one hot LSH bucket in every band; the cap
    must keep candidate generation bounded and dup_clusters must still
    collapse everything into a single cluster via the bridge pairs."""
    text = "identical boilerplate content repeated across the corpus " * 4
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(1200, dtype=np.int64)),
        "text": pa.array([text] * 1200),
    }))
    pairs = minhash_lsh_dups(docs, threshold=0.9).materialize()
    # bounded: sub-sharded buckets, not the 719_400 all-pairs
    assert 0 < pairs.count() < 400_000
    clusters = dup_clusters(pairs, docs).to_pandas()
    assert clusters["cluster"].nunique() == 1


def test_minhash_handles_huge_doc_ids():
    """Snowflake-style int64 doc ids (past 2^32) must flow through the
    whole near-dup pipeline — the candidate dedup takes the pair-safe
    path, never packed u64 keys."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    big = 1 << 40
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([big, big + 1, big + 7], pa.int64()),
        "text": [base, base, "entirely different text about shuffles " * 6],
    }))
    pairs = minhash_lsh_dups(docs, threshold=0.5).to_pandas()
    assert set(map(tuple, pairs[["a", "b"]].to_numpy())) == {(big, big + 1)}


def test_dup_clusters_distributed_sparse_snowflake_ids():
    """ADVICE r03: the distributed path must densify arbitrary int64 ids
    (max(id) >> count) instead of sizing worker state by max(id)+1, and
    singleton ids must come back as their own cluster."""
    big = 3_000_000_000_000  # far past 2^32
    ids = [big + 1, big + 5, big + 9, big + 12, big + 50]
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([big + 1, big + 5], pa.int64()),
        "b": pa.array([big + 5, big + 9], pa.int64()),
        "jaccard": pa.array([0.9, 0.8]),
    }))
    ids_ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    got = dup_clusters(pairs, ids_ds, strategy="distributed").to_pandas()
    c = dict(zip(got["doc_id"], got["cluster"]))
    assert c[big + 1] == c[big + 5] == c[big + 9] == big + 1
    assert c[big + 12] == big + 12 and c[big + 50] == big + 50
    # matches the driver union-find path exactly
    uf = dup_clusters(pairs, ids_ds, strategy="unionfind").to_pandas()
    assert got.reset_index(drop=True).equals(uf.reset_index(drop=True))


def test_broadcast_threshold_is_byte_metered():
    """VERDICT r03 #3: 'auto' verify routing must be decided on BYTES.
    A wide-text corpus with few rows must fail the broadcast budget, and
    the auto-join route must produce identical pairs to broadcast."""
    from fora_ray.stages.shuffle import broadcast_fits

    wide = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(["lorem ipsum " * 50_000] * 8),  # ~600 KB/doc
    }))
    assert not broadcast_fits(wide, 1 << 20)   # 8 rows but > 1 MB
    assert broadcast_fits(wide, 1 << 30)
    # auto with a tiny byte budget must route to the join path and
    # still match the explicit broadcast results
    via_auto_join = minhash_lsh_dups(
        _dup_corpus(), threshold=0.5, broadcast_bytes=1
    ).to_pandas()
    via_broadcast = minhash_lsh_dups(
        _dup_corpus(), threshold=0.5, verify_strategy="broadcast"
    ).to_pandas()
    assert via_auto_join.reset_index(drop=True).equals(
        via_broadcast.reset_index(drop=True))


def test_jac_vectorized_matches_scalar():
    """The batched sort-merge Jaccard kernel must agree with the
    per-pair np.intersect1d reference bit-for-bit, including empty
    sets (union==0 -> 1.0) and absent doc_ids (empty set)."""
    from fora_ray.pipelines.dedup import (
        _binary_flat_u64, _jac_arrays, _jac_vectorized, _ragged_gather)

    rng = np.random.default_rng(7)
    sets = [np.unique(rng.integers(0, 40, size=rng.integers(0, 25)).astype(np.uint64))
            for _ in range(60)]
    sets[3] = np.empty(0, np.uint64)
    sets[4] = np.empty(0, np.uint64)
    ids = np.arange(100, 160, dtype=np.int64)  # doc_ids 100..159
    col = pa.array([s.tobytes() for s in sets], pa.binary())
    lens, flat = _binary_flat_u64(col)
    assert lens.tolist() == [s.size for s in sets]
    starts = np.concatenate([[0], np.cumsum(lens[:-1])]).astype(np.int64)

    a = rng.integers(95, 165, size=200).astype(np.int64)  # some absent
    b = rng.integers(95, 165, size=200).astype(np.int64)
    la, fa = _ragged_gather(a, ids, starts, lens, flat)
    lb, fb = _ragged_gather(b, ids, starts, lens, flat)
    got = _jac_vectorized(la, fa, lb, fb)

    def lookup(x):
        return sets[x - 100] if 100 <= x < 160 else np.empty(0, np.uint64)

    want = np.array([_jac_arrays(lookup(int(x)), lookup(int(y)))
                     for x, y in zip(a, b)])
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# fixed-granularity exact substring (chunk) dedup
# ---------------------------------------------------------------------------

def _brute_chunks(ids, texts, W):
    """first-occurrence chunk flags, python replay."""
    seen = {}
    rows = []
    for did, txt in sorted(zip(ids, texts), key=lambda kv: kv[0]):
        if txt is None:
            continue
        ws = txt.split(" ")
        for i in range(0, len(ws), W):
            c = " ".join(ws[i:i + W])
            key = (did, i // W)
            if c in seen:
                rows.append((did, i // W, True))
            else:
                seen[c] = key
                rows.append((did, i // W, False))
    rows.sort()
    return rows


def test_chunk_dedup_matches_brute():
    from fora_ray.pipelines.dedup import chunk_dedup

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids, txts = t["doc_id"].to_pylist(), t["text"].to_pylist()
    got = chunk_dedup(_docs(), chunk_words=20).to_pandas()
    got_rows = list(got.itertuples(index=False, name=None))
    assert got_rows == _brute_chunks(ids, txts, 20)
    # non-vacuous: the fixture plants dup chunks
    assert got["is_dup"].sum() > 0


def test_chunk_dedup_stats_and_reshard_stability(ray_session):
    from fora_ray.pipelines.dedup import chunk_dedup, chunk_dedup_stats

    a = chunk_dedup_stats(_docs(), chunk_words=20).to_pandas()
    b = chunk_dedup_stats(_docs().repartition(13), chunk_words=20).to_pandas()
    assert a.equals(b)
    assert (a["n_chunks"] > 0).all()
    assert a["n_dup_chunks"].sum() == int(
        chunk_dedup(_docs(), chunk_words=20).to_pandas()["is_dup"].sum())


def test_drop_dup_chunks_matches_brute():
    from fora_ray.pipelines.dedup import drop_dup_chunks

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids, txts = t["doc_id"].to_pylist(), t["text"].to_pylist()
    W = 20
    flags = {}
    for did, ci, dup in _brute_chunks(ids, txts, W):
        if dup:
            flags.setdefault(did, set()).add(ci)
    want = {}
    for did, txt in zip(ids, txts):
        ws = (txt or "").split(" ")
        kept = [" ".join(ws[i:i + W]) for i in range(0, len(ws), W)
                if i // W not in flags.get(did, set())]
        want[did] = " ".join(kept)
    got = drop_dup_chunks(_docs(), chunk_words=W).to_pandas()
    assert dict(zip(got["doc_id"], got["text"])) == want
    # docs with no dup chunks pass through byte-identical
    clean = [did for did in ids if did not in flags]
    orig = dict(zip(ids, txts))
    gmap = dict(zip(got["doc_id"], got["text"]))
    assert all(gmap[d] == orig[d] for d in clean)


def test_chunk_dedup_guards():
    import pytest as _pt

    from fora_ray.pipelines.dedup import chunk_dedup

    with _pt.raises(ValueError):
        chunk_dedup(_docs(), chunk_words=0)


def test_minhash_star_mode_subset_and_same_clusters(ray_session):
    """pairs='star' emits a subset of the all-pairs result, and on
    identical-copy dup groups dup_clusters reconstructs the SAME
    clusters from the star pairs (the web-scale cluster-dedup path)."""
    import pandas as pd

    from fora_ray.pipelines.dedup import minhash_lsh_dups

    alla = minhash_lsh_dups(_dup_corpus(), threshold=0.6).to_pandas()
    star = minhash_lsh_dups(_dup_corpus(), threshold=0.6,
                            pairs="star").to_pandas()
    all_set = set(zip(alla["a"], alla["b"]))
    star_set = set(zip(star["a"], star["b"]))
    assert star_set <= all_set
    assert 0 < len(star_set) < len(all_set) or len(all_set) <= 1

    def clusters(df: pd.DataFrame):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(df["a"], df["b"]):
            parent[find(a)] = find(b)
        out = {}
        for x in list(parent):
            out.setdefault(find(x), set()).add(x)
        return sorted(frozenset(v) for v in out.values())

    assert clusters(alla) == clusters(star)


def test_minhash_pairs_guard():
    import pytest as _pt

    from fora_ray.pipelines.dedup import minhash_lsh_dups

    with _pt.raises(ValueError):
        minhash_lsh_dups(_docs(), pairs="bogus")


def test_chunk_dedup_null_text_matches_oracle_semantics(ray_session):
    """NULL text emits no chunks (the SQL oracle's string_split(NULL)
    unnests to zero rows); '' emits exactly one '' chunk on both sides,
    and two ''-docs are chunk-dups of each other."""
    from fora_ray.pipelines.dedup import chunk_dedup, drop_dup_chunks

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c", None, "", ""], pa.string()),
    }))
    flags = chunk_dedup(docs, chunk_words=2).to_pandas()
    assert 2 not in set(flags["doc_id"])  # NULL doc absent
    e = flags[flags.doc_id.isin([3, 4])]
    assert len(e) == 2 and e["is_dup"].tolist() == [False, True]
    cleaned = drop_dup_chunks(docs, chunk_words=2).to_pandas()
    got = dict(zip(cleaned["doc_id"], cleaned["text"]))
    assert got[1] == "a b c" and got[2] is None and got[3] == "" and got[4] == ""
