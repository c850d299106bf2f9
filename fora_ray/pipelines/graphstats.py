"""Whole-graph summary statistics over the edge table (SURVEY §2.9).

Two link-graph measures a curation pipeline reads before deciding how to
sample or weight a crawl graph:

- ``degree_assortativity`` — Pearson correlation of (out_deg(src),
  in_deg(dst)) across the directed edges (Newman '02 mixing
  coefficient).  Strong disassortativity is the hub-and-spoke signature
  that drives the engine's degree-balanced sharding choice.
- ``modularity`` — per-community Newman modularity contributions
  Q_c = m_c/m − (d_c/2m)² of a node-labelling (e.g. LPA communities)
  over the symmetrized graph, plus the global Q as their sum.

Both are ONE streaming pass over the edge table with per-block partial
sums — no shuffle at all on the broadcast path (node attributes ship as
dense int64 numpy arrays via ray.put, indexed by the dense node id; the
same ≤30M-node threshold discipline as stages.edges.resolve_to_ids).
The 'join' strategy swaps the broadcast for hash joins + a small
groupby — the >30M-node tier — and is parity-tested against broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.shuffle import drop_empty_blocks, safe_join

ROUND6 = 6  # float outputs rounded like betweenness (independent sums)

# broadcast two dense int64 node columns while they fit one worker heap;
# identical knob to resolve_to_ids (16 B/node -> ~0.5 GB at the cap)
BROADCAST_MAX_NODES = 30_000_000


def _dense_node_col(ds, n: int, col: str) -> np.ndarray:
    """Gather a node-indexed int64 Dataset column into a dense array
    (driver holds one int64[n] — the broadcast-tier contract)."""
    out = np.zeros(n, np.int64)
    for ref in ds.select_columns(["node_id", col]).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "node_id" not in t.schema.names:
            continue
        idx = t["node_id"].to_numpy(zero_copy_only=False)
        out[idx] = t[col].to_numpy(zero_copy_only=False)
    return out


class _AssortPartial:
    """Per-block moment sums for the Pearson correlation of
    (out_deg[src], in_deg[dst]) — one tiny row per block."""

    def __init__(self, out_ref, in_ref):
        self.out_deg = ray.get(out_ref)
        self.in_deg = ray.get(in_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.schema.names:
            return _moment_row(0, 0.0, 0.0, 0.0, 0.0, 0.0)
        x = self.out_deg[t["src"].to_numpy(zero_copy_only=False)].astype(np.float64)
        y = self.in_deg[t["dst"].to_numpy(zero_copy_only=False)].astype(np.float64)
        return _moment_row(t.num_rows, x.sum(), y.sum(),
                           float(x @ y), float(x @ x), float(y @ y))


def _moment_row(m, sx, sy, sxy, sxx, syy) -> pa.Table:
    return pa.table({
        "m": pa.array([m], pa.int64()),
        "sx": pa.array([float(sx)], pa.float64()),
        "sy": pa.array([float(sy)], pa.float64()),
        "sxy": pa.array([float(sxy)], pa.float64()),
        "sxx": pa.array([float(sxx)], pa.float64()),
        "syy": pa.array([float(syy)], pa.float64()),
    })


def _moment_partials_join(edges_ds, degrees_ds, num_partitions=None):
    """Scale path: attach out_deg(src) / in_deg(dst) by hash join, then
    the same per-block moment rows."""
    ex = safe_join(
        edges_ds,
        degrees_ds.select_columns(["node_id", "out_deg"]),
        on=("src",), right_on=("node_id",), num_partitions=num_partitions,
    )
    exy = safe_join(
        ex,
        degrees_ds.select_columns(["node_id", "in_deg"])
        .rename_columns({"node_id": "d_id"}),
        on=("dst",), right_on=("d_id",), num_partitions=num_partitions,
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "out_deg" not in t.schema.names:
            return _moment_row(0, 0.0, 0.0, 0.0, 0.0, 0.0)
        x = t["out_deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["in_deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return _moment_row(t.num_rows, x.sum(), y.sum(),
                           float(x @ y), float(x @ x), float(y @ y))

    return exy.map_batches(block, batch_format="pyarrow", batch_size=None)


def degree_assortativity(edges_ds, degrees_ds, n: int,
                         strategy: str = "auto",
                         num_partitions: int | None = None) -> pa.Table:
    """Directed out-in degree assortativity over the edge table.

    Returns a one-row (edges:int64, assortativity:float64) table;
    the coefficient is rounded to 6 decimals (sample Pearson r, the
    same estimator DuckDB's corr() computes, so the driver oracle is
    plain SQL over the golden edge/degree tables — no golden parquet).
    """
    if strategy == "auto":
        strategy = "broadcast" if n <= BROADCAST_MAX_NODES else "join"
    if strategy == "broadcast":
        fn = _AssortPartial(
            ray.put(_dense_node_col(degrees_ds, n, "out_deg")),
            ray.put(_dense_node_col(degrees_ds, n, "in_deg")),
        )
        partials = edges_ds.map_batches(fn, batch_format="pyarrow",
                                batch_size=None)
    else:
        partials = _moment_partials_join(edges_ds, degrees_ds, num_partitions)
    # explicit schema: on an EMPTY edge table map operators skip every
    # block, leaving no schema for the fully-empty rebuild
    agg = drop_empty_blocks(
        partials, schema=_moment_row(0, 0, 0, 0, 0, 0).schema
    ).sum(["m", "sx", "sy", "sxy", "sxx", "syy"])
    if agg is None or agg.get("sum(m)") is None:  # zero edges
        return pa.table({"edges": pa.array([0], pa.int64()),
                         "assortativity": pa.array([float("nan")], pa.float64())})
    m = int(agg["sum(m)"])
    sx, sy = agg["sum(sx)"], agg["sum(sy)"]
    sxy, sxx, syy = agg["sum(sxy)"], agg["sum(sxx)"], agg["sum(syy)"]
    num = m * sxy - sx * sy
    den = np.sqrt(max(m * sxx - sx * sx, 0.0)) * np.sqrt(max(m * syy - sy * sy, 0.0))
    # sample-covariance form: identical to population form after the
    # (m-1) factors cancel; den == 0 (constant degrees) -> NaN like corr()
    r = float(num / den) if den > 0 else float("nan")
    return pa.table({
        "edges": pa.array([m], pa.int64()),
        "assortativity": pa.array([np.round(r, ROUND6)], pa.float64()),
    })


class _ModularityPartial:
    """Per-block (label, deg_cnt, within_directed) partial sums over the
    SYMMETRIZED edge table: each directed row (u, v) adds 1 to deg(u)'s
    community and, when label[u] == label[v], 1 to the within count
    (each undirected within-edge is seen twice -> /2 at finalize)."""

    def __init__(self, labels_ref):
        self.labels = ray.get(labels_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table({
            "label": pa.array([], pa.int64()),
            "deg_cnt": pa.array([], pa.int64()),
            "within2": pa.array([], pa.int64()),
        })
        if t.num_rows == 0 or "src" not in t.schema.names:
            return empty
        ls = self.labels[t["src"].to_numpy(zero_copy_only=False)]
        ld = self.labels[t["dst"].to_numpy(zero_copy_only=False)]
        uniq, inv = np.unique(ls, return_inverse=True)
        deg_cnt = np.bincount(inv, minlength=len(uniq))
        within2 = np.bincount(inv, weights=(ls == ld).astype(np.float64),
                              minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(uniq.astype(np.int64)),
            "deg_cnt": pa.array(deg_cnt.astype(np.int64)),
            "within2": pa.array(within2),
        })


def modularity(edges_sym_ds, labels_ds, n: int, strategy: str = "auto",
               num_partitions: int | None = None) -> pa.Table:
    """Newman modularity of a labelling over the symmetrized graph.

    `edges_sym_ds` must carry BOTH directions of every undirected edge
    (the engine's `edges_undirected` table); `labels_ds` is
    (node_id, label) over all n nodes (e.g. label_propagation output).

    Returns one row per community, sorted by label:
    (label, n_nodes, within_edges, degree_sum, q_contrib) with
    q_contrib = within/m − (degree_sum/2m)² rounded to 6 decimals;
    Q = Σ q_contrib.
    """
    import pandas as pd

    if strategy == "auto":
        strategy = "broadcast" if n <= BROADCAST_MAX_NODES else "join"
    sizes = None
    if strategy == "broadcast":
        labels = _dense_node_col(labels_ds, n, "label")
        partials = edges_sym_ds.map_batches(
            _ModularityPartial(ray.put(labels)), batch_format="pyarrow",
            batch_size=None)
        # community sizes fall out of the already-gathered label array —
        # no extra Ray groupby on the broadcast tier
        uniq, cnt = np.unique(labels, return_counts=True)
        sizes = pd.DataFrame({"label": uniq.astype(np.int64),
                              "n_nodes": cnt.astype(np.int64)})
    else:
        ej = safe_join(
            edges_sym_ds, labels_ds, on=("src",), right_on=("node_id",),
            num_partitions=num_partitions,
        )
        ej2 = safe_join(
            ej,
            labels_ds.rename_columns({"node_id": "d_id", "label": "label_d"}),
            on=("dst",), right_on=("d_id",), num_partitions=num_partitions,
        )

        def block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "label" not in t.schema.names:
                return pa.table({
                    "label": pa.array([], pa.int64()),
                    "deg_cnt": pa.array([], pa.int64()),
                    "within2": pa.array([], pa.int64()),
                })
            ls = t["label"].to_numpy(zero_copy_only=False)
            ld = t["label_d"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(ls, return_inverse=True)
            return pa.table({
                "label": pa.array(uniq.astype(np.int64)),
                "deg_cnt": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "within2": pa.array(np.bincount(
                    inv, weights=(ls == ld).astype(np.float64),
                    minlength=len(uniq)).astype(np.int64)),
            })

        partials = ej2.map_batches(block, batch_format="pyarrow",
                                   batch_size=None)

    part_schema = pa.schema([("label", pa.int64()),
                             ("deg_cnt", pa.int64()),
                             ("within2", pa.int64())])
    summed = (
        drop_empty_blocks(partials, schema=part_schema)
        .groupby("label")
        .sum(["deg_cnt", "within2"])
        .to_pandas()
    )  # one row per community — metadata-sized
    for c in ("sum(deg_cnt)", "sum(within2)"):
        if c not in summed.columns:  # zero-edge graph: empty aggregate
            summed[c] = np.zeros(0, np.int64)
    if "label" not in summed.columns:
        summed["label"] = np.zeros(0, np.int64)
    if sizes is None:
        from ray.data.aggregate import Count

        sizes = (
            labels_ds.groupby("label")
            .aggregate(Count(alias_name="n_nodes"))
            .to_pandas()
        )
    df = sizes.merge(summed, on="label", how="left").fillna(0)
    two_m = int(df["sum(deg_cnt)"].sum())
    m = two_m // 2
    within = (df["sum(within2)"].to_numpy(np.int64) // 2)
    dsum = df["sum(deg_cnt)"].to_numpy(np.int64)
    q = within / m - (dsum / (2.0 * m)) ** 2 if m > 0 else np.zeros(len(df))
    out = pa.table({
        "label": pa.array(df["label"].to_numpy(np.int64)),
        "n_nodes": pa.array(df["n_nodes"].to_numpy(np.int64)),
        "within_edges": pa.array(within),
        "degree_sum": pa.array(dsum),
        "q_contrib": pa.array(np.round(q, ROUND6)),
    })
    return out.sort_by("label")
