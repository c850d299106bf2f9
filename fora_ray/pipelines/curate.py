"""Composite training-data curation pipeline (task brief flagship):

    documents
      -> quality scoring (pipelines.text)      drop low-quality docs
      -> exact dedup (sha256)                  keep min doc_id per text
      -> MinHash-LSH near-dup clustering       keep the best-quality doc
                                               per near-dup cluster
      -> optional language filter (langid)

Every keep/drop decision is a Dataset join: quality filter -> inner
join on the surviving ids, exact/near-dup winners -> inner joins on the
winner tables, quality/lang attach -> joins on doc_id.  Nothing
corpus-sized ever lands on the driver — driver memory is O(1) at any
input size (the round-1 version kept five per-doc id sets/dicts on the
driver; VERDICT r01 "what's wrong" #4).  Returns (curated Dataset
(doc_id, text, ... + quality, lang_pred), stats dict) — the curated
set streams straight into write_parquet for training consumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import dup_clusters, exact_dedup, minhash_lsh_dups
from .text import language_id, quality_scores


def curate_documents(docs_ds, min_quality: float = 0.25,
                     near_dup_threshold: float = 0.7,
                     langs: list[str] | None = None,
                     seed: int = 42, num_partitions: int | None = None):
    """-> (curated Dataset (doc_id, text, ... + quality, lang_pred), stats)."""
    from ..stages.shuffle import drop_empty_blocks, join_partitions, safe_join

    num_partitions = join_partitions(num_partitions)
    stats: dict = {}
    total = docs_ds.count()
    stats["input_docs"] = total

    # quality filter (predicate pushed into the scoring output)
    good = quality_scores(docs_ds).select_columns(["doc_id", "quality"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality"], pa.scalar(min_quality))),
        batch_format="pyarrow",
    ).materialize()
    n_good = good.count()
    stats["dropped_low_quality"] = total - n_good

    # survivors carry their quality column from here on.  docs_ds is
    # pure read/map lineage (cannot produce schema-less empty blocks),
    # so only the right side is stripped — the corpus STREAMS into the
    # join instead of being materialized by drop_empty_blocks
    # (ADVICE r02).
    survivors = safe_join(
        docs_ds, good, on=("doc_id",), num_partitions=num_partitions,
        drop=("right",),
    ).materialize()

    # exact-dedup winners among quality survivors (min doc_id per text);
    # aggregate/map_groups shuffles can emit schema-less empty blocks
    # that acero join sides reject -> coerce before joining
    id_schema = pa.schema([("doc_id", pa.int64())])
    exact_keep = drop_empty_blocks(exact_dedup(survivors, sort=False), id_schema)
    uniq = safe_join(
        survivors, exact_keep, on=("doc_id",), num_partitions=num_partitions
    ).materialize()
    n_uniq = uniq.count()
    stats["dropped_exact_dup"] = n_good - n_uniq

    # near-dup clusters among the exact winners: keep the max-quality
    # member per cluster (tie-break min doc_id)
    pairs = minhash_lsh_dups(uniq, threshold=near_dup_threshold, seed=seed)
    clusters = dup_clusters(pairs, uniq, sort=False)  # (doc_id, cluster)

    def best_member(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        qs = g["quality"].to_numpy(zero_copy_only=False)
        win = np.lexsort((ids, -qs))[0]
        return pa.table({"doc_id": pa.array([int(ids[win])], pa.int64())})

    keep_near = drop_empty_blocks(
        safe_join(clusters, good, on=("doc_id",), num_partitions=num_partitions)
        .groupby("cluster").map_groups(best_member, batch_format="pyarrow"),
        id_schema,
    )
    stats["dropped_near_dup"] = n_uniq - keep_near.count()

    curated = safe_join(
        uniq, keep_near, on=("doc_id",), num_partitions=num_partitions
    ).materialize()

    # attach predicted language via join
    lang = drop_empty_blocks(
        language_id(curated, sort=False),
        pa.schema([("doc_id", pa.int64()), ("lang_pred", pa.string())]),
    )
    curated = safe_join(curated, lang, on=("doc_id",), num_partitions=num_partitions)
    if langs is not None:
        lset = pa.array(list(langs), pa.string())
        curated = curated.map_batches(
            lambda t, ls=lset: t.filter(pc.is_in(t["lang_pred"], value_set=ls)),
            batch_format="pyarrow",
        )
    stats["curated_docs"] = curated.count()
    return curated, stats
