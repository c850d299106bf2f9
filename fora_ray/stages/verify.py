"""M1 — sha256 content verification (SURVEY.md section 2.2, BASELINE.json
input_hint per-row invariant: content sha256 equality vs the manifest).

A stateless ``map_batches`` stage over zero-copy Arrow batches.  sha256 is
inherently per-string (hashlib, C speed per call); the batch granularity
keeps scheduling overhead amortized.  Rows whose digest mismatches the
expected manifest are quarantined (returned with ok=False) rather than
failing the whole pipeline — the caller filters or raises.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def add_sha256(batch: pa.Table, column: str = "content", out: str = "sha256") -> pa.Table:
    """Append hex sha256 of `column` to the batch."""
    col = batch[column]
    digests = [
        hashlib.sha256(v.encode() if isinstance(v, str) else v).hexdigest() if v is not None else None
        for v in col.to_pylist()
    ]
    return batch.append_column(out, pa.array(digests, pa.string()))


class Sha256Verifier:
    """Actor-pool stage: verifies content sha256 against a broadcast manifest.

    The manifest dict {(repo, path): sha256_hex} is ray.put() once by the
    caller and the ObjectRef passed here — each actor fetches it ONCE in
    __init__ (zero-copy from the local object store), not per batch.
    Emits the input columns + sha256 + ok(bool).
    """

    def __init__(self, manifest_ref=None):
        import ray

        self.manifest = ray.get(manifest_ref) if manifest_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = add_sha256(batch)
        if self.manifest is None:
            ok = pa.array([True] * batch.num_rows, pa.bool_())
        else:
            repos = batch["repo"].to_pylist()
            paths = batch["path"].to_pylist()
            digs = batch["sha256"].to_pylist()
            ok = pa.array(
                [self.manifest.get((r, p)) == d for r, p, d in zip(repos, paths, digs)],
                pa.bool_(),
            )
        return batch.append_column("ok", ok)


def quarantine_split(ds, manifest_ref, concurrency=None):
    """Verify a corpus Dataset; return (clean_ds, quarantined_ds) — A7 split.

    concurrency defaults to the session-sized actor pool (shuffle.pool_size);
    pass an int or (min, max) to override."""
    from .shuffle import pool_size

    if concurrency is None:
        concurrency = pool_size()
    verified = ds.map_batches(
        Sha256Verifier,
        fn_constructor_kwargs={"manifest_ref": manifest_ref},
        batch_format="pyarrow",
        concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
    )
    clean = verified.map_batches(
        lambda t: t.filter(t["ok"]).drop_columns(["ok"]), batch_format="pyarrow"
    )
    bad = verified.map_batches(
        lambda t: t.filter(pc.invert(t["ok"])).drop_columns(["ok"]), batch_format="pyarrow"
    )
    return clean, bad
