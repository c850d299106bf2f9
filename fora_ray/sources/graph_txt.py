"""S1 compat — reference graph.txt format reader/writer.

The reference loads graphs from ``<dataset>/graph.txt`` (whitespace
"u v" edge list) plus ``attribute.txt`` ("n=<int>" / "m=<int>" lines)
[SURVEY 2.1 S1; reference graph.h].  This reader maps that layout onto
a (src, dst) edge Dataset so reference fixtures can be ingested
directly; the parquet corpus path (pipelines/ingest.py) is the primary
source.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray


def read_attribute(dataset_dir: str) -> dict:
    out: dict = {}
    with open(os.path.join(dataset_dir, "attribute.txt")) as f:
        for line in f:
            line = line.strip()
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = int(v)
    return out


def _parse_lines(batch: pa.Table) -> pa.Table:
    src, dst = [], []
    for line in batch["text"].to_pylist():
        parts = line.split()
        if len(parts) >= 2:
            try:
                src.append(int(parts[0]))
                dst.append(int(parts[1]))
            except ValueError:
                continue  # comment / malformed line
    return pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )


def read_graph_txt(dataset_dir: str) -> tuple["ray.data.Dataset", int, int]:
    """-> (edges Dataset (src, dst), n, m).  n/m from attribute.txt when
    present, else computed (one pass)."""
    edges = ray.data.read_text(os.path.join(dataset_dir, "graph.txt")).map_batches(
        _parse_lines, batch_format="pyarrow"
    )
    attr_path = os.path.join(dataset_dir, "attribute.txt")
    if os.path.exists(attr_path):
        attr = read_attribute(dataset_dir)
        return edges, int(attr["n"]), int(attr["m"])
    mx = edges.map_batches(
        lambda t: pa.table({
            "mx": pa.array([
                int(max(
                    t["src"].to_numpy(zero_copy_only=False).max(initial=-1),
                    t["dst"].to_numpy(zero_copy_only=False).max(initial=-1),
                ))
            ], pa.int64())
        }),
        batch_format="pyarrow",
    ).to_pandas()["mx"].max()
    return edges, int(mx) + 1, edges.count()


def write_graph_txt(edges_ds, dataset_dir: str, n: int) -> None:
    os.makedirs(dataset_dir, exist_ok=True)
    m = 0
    with open(os.path.join(dataset_dir, "graph.txt"), "w") as f:
        for batch in edges_ds.iter_batches(batch_format="pyarrow"):
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            m += len(src)
            np.savetxt(f, np.stack([src, dst], axis=1), fmt="%d")
    with open(os.path.join(dataset_dir, "attribute.txt"), "w") as f:
        f.write(f"n={n}\nm={m}\n")
