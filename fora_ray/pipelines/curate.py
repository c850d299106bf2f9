"""Composite training-data curation pipeline (task brief flagship):

    documents
      -> quality scoring (pipelines.text)      drop low-quality docs
      -> exact dedup (sha256)                  keep min doc_id per text
      -> MinHash-LSH near-dup clustering       keep the best-quality doc
                                               per near-dup cluster
      -> optional language filter (langid)

Everything composes the existing operators; the keep/drop decisions are
broadcast id-sets applied in one vectorized filter pass over the
documents Dataset (no row ever leaves Arrow).  Returns (curated
Dataset, stats dict) — the curated set streams straight into
write_parquet for training consumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .dedup import dup_clusters, exact_dedup, minhash_lsh_dups
from .text import language_id, quality_scores


def curate_documents(docs_ds, min_quality: float = 0.25,
                     near_dup_threshold: float = 0.7,
                     langs: list[str] | None = None,
                     seed: int = 42):
    """-> (curated Dataset (doc_id, text, ... + quality, lang_pred), stats)."""
    stats: dict = {}
    total = docs_ds.count()
    stats["input_docs"] = total

    q = quality_scores(docs_ds).select_columns(["doc_id", "quality"]).to_pandas()
    quality_of = dict(zip(q["doc_id"], q["quality"]))
    good = set(q[q["quality"] >= min_quality]["doc_id"])
    stats["dropped_low_quality"] = total - len(good)

    # exact dedup winners (among quality survivors)
    def _only_good(t: pa.Table) -> pa.Table:
        return t.filter(pa.array([i in good for i in t["doc_id"].to_pylist()]))

    survivors = docs_ds.map_batches(_only_good, batch_format="pyarrow").materialize()
    exact_keep = set(exact_dedup(survivors).to_pandas()["doc_id"])
    stats["dropped_exact_dup"] = len(good) - len(exact_keep)

    # near-dup clusters among the exact winners: keep max-quality member
    # (tie-break min doc_id)
    def _only_exact(t: pa.Table) -> pa.Table:
        return t.filter(pa.array([i in exact_keep for i in t["doc_id"].to_pylist()]))

    uniq = survivors.map_batches(_only_exact, batch_format="pyarrow").materialize()
    pairs = minhash_lsh_dups(uniq, threshold=near_dup_threshold, seed=seed)
    clusters = dup_clusters(pairs, uniq).to_pandas()
    keep_near: set[int] = set()
    for _, grp in clusters.groupby("cluster"):
        ids = grp["doc_id"].to_numpy()
        qs = np.array([quality_of.get(int(i), 0.0) for i in ids])
        order = np.lexsort((ids, -qs))
        keep_near.add(int(ids[order[0]]))
    stats["dropped_near_dup"] = len(exact_keep) - len(keep_near)

    curated = uniq.map_batches(
        lambda t: t.filter(pa.array([i in keep_near for i in t["doc_id"].to_pylist()])),
        batch_format="pyarrow",
    )
    # attach quality + predicted language
    lang = language_id(curated).to_pandas()
    lang_of = dict(zip(lang["doc_id"], lang["lang_pred"]))

    def _attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        t = t.append_column("quality", pa.array([quality_of.get(i, 0.0) for i in ids]))
        t = t.append_column("lang_pred", pa.array([lang_of.get(i, "unknown") for i in ids], pa.string()))
        return t

    curated = curated.map_batches(_attach, batch_format="pyarrow")
    if langs is not None:
        lset = set(langs)
        curated = curated.map_batches(
            lambda t: t.filter(pa.array([v in lset for v in t["lang_pred"].to_pylist()])),
            batch_format="pyarrow",
        )
    stats["curated_docs"] = curated.count()
    return curated, stats
