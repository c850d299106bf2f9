"""Text analysis + ANN pipelines."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from fora_ray.pipelines.ann import brute_force_topk, ivf_topk
from fora_ray.pipelines.text import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

SF = "/root/testdata/sf0.001"


def test_token_counts_match_duckdb():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = token_counts(docs).to_pandas()
    want = duckdb.sql(
        f"SELECT doc_id, length(regexp_extract_all(text, '\\w+')) AS n_tokens "
        f"FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_language_id():
    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the cat is in the house and it is warm",
            "der Hund ist nicht in der Stadt und das ist gut",
            "le chat est dans la maison et il est pour les amis",
            "",
        ],
    }
    out = language_id(ray.data.from_arrow(pa.table(rows))).to_pandas()
    assert out["lang_pred"].tolist() == ["en", "de", "fr", "unknown"]


def test_quality_scores_deterministic():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    a = quality_scores(docs).to_pandas()
    b = quality_scores(docs).to_pandas()
    assert a.equals(b)
    assert ((a["quality"] >= 0) & (a["quality"] <= 1)).all()
    # n_chars must agree with the table's own n_chars column
    raw = docs.to_pandas().sort_values("doc_id")
    assert a["n_chars"].tolist() == raw["n_chars"].tolist()


def test_fingerprints_stable_under_whitespace():
    rows = {
        "doc_id": [0, 1],
        "text": ["alpha beta gamma delta " * 4, "alpha  beta\n gamma   delta " * 4],
    }
    out = fingerprints(ray.data.from_arrow(pa.table(rows))).to_pandas()
    assert out["fingerprint"][0] == out["fingerprint"][1]


def _emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_brute_force_topk_matches_numpy():
    emb = _emb().to_pandas()
    M = np.stack(emb["embedding"].to_numpy())
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    queries = M[:3]
    got = brute_force_topk(_emb(), queries, k=5).to_pandas()
    for qi in range(3):
        S = M @ queries[qi]
        order = np.lexsort((emb["vec_id"].to_numpy(), -S))
        want_ids = emb["vec_id"].to_numpy()[order[:5]].tolist()
        got_ids = got[got.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert got_ids == want_ids


def test_ivf_recall():
    emb = _emb().to_pandas()
    M = np.stack(emb["embedding"].to_numpy())
    queries = M[:4]
    exact = brute_force_topk(_emb(), queries, k=10).to_pandas()
    approx = ivf_topk(_emb(), queries, k=10, nlist=8, nprobe=3).to_pandas()
    recalls = []
    for qi in range(4):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # nprobe=3/8 lists


def test_lsh_recall_and_golden_replay():
    """lsh_topk: (a) recall vs brute force is high at 8 tables x 10
    planes + radius-1 multiprobe; (b) the distributed bucket search is
    row-identical to the single-process golden replay (same planes,
    candidate union, ranking) — the exactness claim the driver oracle
    relies on."""
    from fora_ray.goldens import ann_lsh_golden
    from fora_ray.pipelines.ann import lsh_topk

    emb = _emb().to_pandas().sort_values("vec_id")
    queries = np.stack(emb["embedding"].to_numpy()[:8])
    exact = brute_force_topk(_emb(), queries, k=10).to_pandas()
    approx = lsh_topk(_emb(), queries, k=10, n_tables=16, n_planes=10).to_pandas()
    recalls = []
    for qi in range(8):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # The synthetic table is uniform-random 64-dim: top-10 'neighbors'
    # sit at cos ~0.3 (P[bit agree] ~0.6) — the adversarial case for
    # LSH.  Measured 0.72 recall while probing ~19% of candidates
    # (3.6x enrichment over a random scan); real near-dup workloads
    # (cos > 0.8) recall >0.99 per the collision math in the docstring.
    assert np.mean(recalls) >= 0.6

    gold = ann_lsh_golden(SF, k=10, nq=8, n_tables=16, n_planes=10).to_pandas()
    got = approx[["query_id", "rank", "vec_id"]].reset_index(drop=True)
    assert got.equals(gold[["query_id", "rank", "vec_id"]].reset_index(drop=True))


def test_multimodal_stub_plumbing():
    from fora_ray.pipelines.multimodal import (
        ImageDecoder,
        decode_images,
        sample_frames,
        synthesize_media_table,
    )

    media = ray.data.from_arrow(synthesize_media_table(30))
    feats = decode_images(media, fake=True).to_pandas()
    assert len(feats) == 10  # a third are images
    assert all(len(f) == 16 for f in feats["features"])
    # deterministic: same payload -> same features
    feats2 = decode_images(media, fake=True).to_pandas()
    assert feats["media_id"].tolist() == feats2["media_id"].tolist()
    frames = sample_frames(media, fps=2.0, fake=True).to_pandas()
    assert (frames["frame_idx"] >= 0).all() and len(frames) > 10
    # real decoder is an explicit stub
    import pytest

    with pytest.raises(NotImplementedError):
        ImageDecoder(fake=False)


def test_curation_pipeline():
    """Composite curation: planted low-quality + exact + near dups all
    removed; best-quality near-dup kept."""
    import pyarrow as pa

    from fora_ray.pipelines.curate import curate_documents

    base = "the quick brown fox jumps over the lazy dog and runs to the hills " * 8
    near = base.replace("lazy", "sleepy", 2)
    junk = "@@@ ### $$$ !!! 123 456 789 000 %%% ^^^ &&& *** ((( )))"
    rows = {
        "doc_id": [0, 1, 2, 3, 4],
        "text": [base, base, near, junk, "completely different words about graphs " * 10],
    }
    docs = ray.data.from_arrow(pa.table(rows))
    curated, stats = curate_documents(docs, min_quality=0.25, near_dup_threshold=0.5)
    ids = sorted(curated.to_pandas()["doc_id"].tolist())
    assert 3 not in ids                      # junk dropped by quality
    assert stats["dropped_exact_dup"] == 1   # doc 1 == doc 0
    assert stats["dropped_near_dup"] == 1    # doc 2 near-dups doc 0
    assert 4 in ids and len(ids) == 2
    cols = set(curated.schema().names)
    assert {"quality", "lang_pred"} <= cols


def test_redact_batch_patterns_and_order():
    import pyarrow as pa

    from fora_ray.pipelines.text import redact_batch

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "visit https://u:p@ex.io/a?b=1#f and mail a.b+c@ex-2.org",
            "server 10.0.0.1 and 255.255.255.255, not 1.2.3 or a.b.c.d",
            None,
            "url http://x.io/@handle keeps the email inside it hidden",
        ],
    })
    out = redact_batch(t).to_pydict()
    assert out["redacted"][0] == "visit <URL> and mail <EMAIL>"
    # counts are RAW-text counts: the u:p@ex.io userinfo also matches
    # the email pattern even though the URL replacement consumes it
    assert out["n_urls"][0] == 1 and out["n_emails"][0] == 2
    assert out["redacted"][1] == "server <IP> and <IP>, not 1.2.3 or a.b.c.d"
    assert out["n_ips"][1] == 2
    assert out["redacted"][2] == "" and out["n_urls"][2] == 0
    # URL replaced FIRST, so the '@' inside it never reads as an email
    assert out["redacted"][3] == "url <URL> keeps the email inside it hidden"
    assert out["n_emails"][3] == 0


def test_redact_dataset_roundtrip(ray_session):
    import pyarrow as pa
    import ray

    from fora_ray.pipelines.text import redact

    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(8)),
        "text": [f"doc {i} mail u{i}@ex.org" for i in range(8)],
    }))
    df = redact(docs).to_pandas()
    assert list(df["doc_id"]) == list(range(8))
    assert all(r == f"doc {i} mail <EMAIL>" for i, r in enumerate(df["redacted"]))
    assert df["n_emails"].sum() == 8
