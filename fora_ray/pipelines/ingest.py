"""IngestPipeline — corpus Parquet -> nodes / edges / degrees / CSR shards
(SURVEY.md section 3.3; operators M1-M8, H1, A7).

Every stage is a streaming ``map_batches`` over Arrow batches; the only
all-to-all exchanges are the nodes sort (id assignment), the edge-dedup
groupby, and the CSR-build groupby — exactly the shuffles the design
calls for (SURVEY 4.2).  Nothing materializes the corpus.
"""

from __future__ import annotations

import ray

from ..stages.degrees import compute_degrees
from ..stages.edges import dedup_edges, resolve_to_ids, symmetrize
from ..stages.ids import assign_node_ids
from ..stages.resolve import extract_resolve_batch
from ..stages.verify import Sha256Verifier


def read_corpus(path: str, columns=None, num_blocks: int | None = None) -> "ray.data.Dataset":
    """S1 — corpus reader (column-pruned parquet read).  Block count
    defaults to 2x session CPUs: Ray's default file splitting produces
    hundreds of tiny blocks at test scale, and every downstream shuffle
    pays per-block overhead."""
    if num_blocks is None:
        try:
            num_blocks = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            num_blocks = 32
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=num_blocks)


def build_graph_tables(
    corpus_ds,
    manifest_ref=None,
    langs: list[str] | None = None,
    join_strategy: str = "auto",
    num_partitions: int | None = None,
    verify_concurrency: int | tuple | None = None,
    id_sort_partitions: int | None = None,
):
    """Run M1..M7: returns dict with nodes/edges/edges_undirected/degrees
    Datasets plus n_nodes.  All lazy except nodes (id assignment sorts and
    pins the metadata-sized nodes table).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = corpus_ds
    if langs:
        lvals = pa.array(sorted(set(langs)), pa.string())
        ds = ds.map_batches(  # M8 lang filter — vectorized is_in kernel
            lambda t, ls=lvals: t.filter(pc.is_in(t["lang"], value_set=ls)),
            batch_format="pyarrow",
        )
    if manifest_ref is not None:
        from ..stages.shuffle import pool_size

        vc = verify_concurrency if verify_concurrency is not None else pool_size()
        ds = ds.map_batches(
            Sha256Verifier,
            fn_constructor_kwargs={"manifest_ref": manifest_ref},
            batch_format="pyarrow",
            concurrency=(1, vc) if isinstance(vc, int) else vc,
        ).map_batches(lambda t: t.filter(t["ok"]), batch_format="pyarrow")

    nodes, n = assign_node_ids(ds, sort_partitions=id_sort_partitions)

    # M2+M3 fused: one task per block goes corpus -> candidate pairs
    # without materializing the exploded refs table in between
    cands = ds.map_batches(extract_resolve_batch, batch_format="pyarrow")
    raw_edges = resolve_to_ids(  # M4 + id apply
        cands, nodes, n, strategy=join_strategy, num_partitions=num_partitions
    )
    # Materialize the deduped edge table ONCE: degrees, the undirected
    # view and every downstream consumer derive from it, and Ray Datasets
    # are lazy — without the pin each consumer would re-run the whole
    # extract/resolve/dedup pipeline (measured 3-4x ingest cost).
    # The edge table is the small derived artifact (two int64 columns),
    # so pinning it in the object store is the right trade at any scale.
    wide = n >= (1 << 32)  # ids past 2^32 need the two-column distinct
    from ..stages.shuffle import coalesce_blocks

    # coalesce_blocks: the bucketed distinct keeps the producer's block
    # count (e.g. 144 ~20k-row blocks at 32 CPUs) and every downstream
    # sort/groupby pays fan-in per block — right-size at the pin
    edges = coalesce_blocks(dedup_edges(raw_edges, wide_ids=wide))  # M6
    degrees = compute_degrees(edges, nodes)  # M7
    return {
        "nodes": nodes,
        "edges": edges,
        "edges_undirected": symmetrize(edges, wide_ids=wide),  # A7 (CC/LPA/triangles)
        "degrees": degrees,
        "n_nodes": n,
    }


def ingest_fixture(fix_dir: str, **kw):
    """Convenience: run ingest over a fixture directory's corpus."""
    return build_graph_tables(read_corpus(f"{fix_dir}/corpus"), **kw)
