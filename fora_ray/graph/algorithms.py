"""Driver-side graph algorithms over a GraphHandle
(SURVEY.md section 2.4: G1-G4, G9, G10, G12; parameters section 1.4).

All functions return Ray Datasets assembled zero-copy from per-shard
Arrow tables; nothing row-sized ever crosses the driver.

Modes (SURVEY 1.4 determinism note):
- mode="exact": forward push to convergence (full sweeps == power
  iteration) — deterministic, allclose 1e-6 vs the numpy oracle.
- mode="fora": two-phase FORA — thresholded push at rmax, then a
  seeded Monte-Carlo walk phase with counter-based RNG; reproducible
  bit-for-bit at any parallelism for a fixed seed, and statistically
  within the paper's (eps, delta, pfail) guarantee.
"""

from __future__ import annotations

import math

import numpy as np
import ray

from ..state.checkpoint import checkpoint_step, latest_step, restore_step


def fora_params(n: int, m: int, eps: float = 0.5, delta: float | None = None,
                pfail: float | None = None, rmax_scale: float = 1.0) -> dict:
    """rmax / omega per the FORA paper (SURVEY 1.4, paper Thm 3.3/3.4).

    omega here is the per-unit-residual walk multiplier: a vertex with
    residual r spawns ceil(r * omega) walks.
    """
    delta = delta if delta is not None else 1.0 / n
    pfail = pfail if pfail is not None else 1.0 / n
    log_term = math.log(2.0 / pfail)
    omega = (2.0 * eps / 3.0 + 2.0) * log_term / (eps * eps * delta)
    rmax = eps * math.sqrt(delta / (3.0 * max(m, 1) * log_term)) * rmax_scale
    return {"eps": eps, "delta": delta, "pfail": pfail, "rmax": rmax, "omega": omega}


def _push_loop(handle, source, rmax: float, sweep_all: bool, tol: float = 1e-12,
               max_rounds: int = 10_000, ckpt_dir: str | None = None,
               ckpt_every: int = 1, start_round: int = 0) -> dict:
    """Synchronous forward-push supersteps until convergence (G1/H2/A1).

    Uses the combined apply+push actor round (push_round2): ONE driver
    barrier per superstep; the previous round's frontier payloads are
    handed to the next round's calls by reference."""
    import ray as _ray

    P = handle.P
    rounds = start_round
    outs = None
    dang = 0.0
    rsum = None
    stats = {"rounds": 0, "rsum": None}
    while rounds < max_rounds:
        calls = []
        for p, w in enumerate(handle.workers):
            pls = [outs[q][p + 1] for q in range(P) if q != p] if outs else []
            calls.append(
                w.push_round2.options(num_returns=P + 1).remote(
                    rmax, sweep_all, source, dang, *pls
                )
            )
        metas = _ray.get([c[0] for c in calls])
        outs = calls
        dang = sum(m["dangling"] for m in metas)
        active = sum(m["active"] for m in metas)
        rsum = sum(m["rsum"] for m in metas) + dang
        rounds += 1
        if ckpt_dir is not None and rounds % ckpt_every == 0:
            # flush in-flight payloads + dangling so the checkpoint is a
            # consistent cut (reserve + residual sums to full mass)
            _ray.get([
                w.apply_residual.remote(*[outs[q][p + 1] for q in range(P) if q != p])
                for p, w in enumerate(handle.workers)
            ])
            outs = None
            if dang > 0:
                if source is None:
                    handle.call_all("add_uniform_residual", dang)
                else:
                    handle.call_all("add_source_residual", source, dang)
                dang = 0.0
            checkpoint_step(
                handle, ckpt_dir, rounds, ("reserve", "residual"),
                extra={"rsum": rsum, "active": active, "source": source, "rmax": rmax},
            )
        if (active == 0 and dang == 0) or (sweep_all and rsum < tol):
            if outs is not None:
                # apply the final round's in-flight payloads (mass < tol)
                _ray.get([
                    w.apply_residual.remote(*[outs[q][p + 1] for q in range(P) if q != p])
                    for p, w in enumerate(handle.workers)
                ])
                if dang > 0:
                    if source is None:
                        handle.call_all("add_uniform_residual", dang)
                    else:
                        handle.call_all("add_source_residual", source, dang)
            stats.update(rounds=rounds, rsum=rsum)
            break
    else:
        # max_rounds exhaustion: flush the final round's in-flight
        # payloads and re-inject accumulated dangling mass, exactly as
        # the convergence path does — otherwise reserve+residual no
        # longer sums to the full mass and callers see silent loss
        if outs is not None:
            _ray.get([
                w.apply_residual.remote(*[outs[q][p + 1] for q in range(P) if q != p])
                for p, w in enumerate(handle.workers)
            ])
            if dang > 0:
                if source is None:
                    handle.call_all("add_uniform_residual", dang)
                else:
                    handle.call_all("add_source_residual", source, dang)
        stats.update(rounds=rounds, rsum=rsum)
    return stats


def _walk_loop(handle, omega: float, seed: int, source, fold: bool = True) -> dict:
    """Monte-Carlo walk phase (G2): message rounds until no walker alive.
    Expected O(1/alpha) rounds; each walker's RNG stream is a pure
    function of (seed, origin, walk index, hop).  Combined apply+step
    rounds (walk_round2) — one barrier per hop.  fold=False leaves the
    hits in acc (top-k trials read reserve + acc without folding)."""
    import ray as _ray

    P = handle.P
    total = sum(handle.call_all("walk_init", omega, seed))
    hop, alive, outs = 0, total, None
    while alive > 0:
        calls = []
        for p, w in enumerate(handle.workers):
            pls = [outs[q][p + 1] for q in range(P) if q != p] if outs else []
            calls.append(w.walk_round2.options(num_returns=P + 1).remote(hop, source, *pls))
        metas = _ray.get([c[0] for c in calls])
        outs = calls
        alive = sum(m["alive"] for m in metas)
        hop += 1
    if fold:
        handle.call_all("walk_fold")
    return {"walks": total, "hops": hop}


def personalized_pagerank(handle, source: int, mode: str = "exact",
                          eps: float = 0.5, delta: float | None = None,
                          pfail: float | None = None, rmax_scale: float = 1.0,
                          seed: int = 42, tol: float = 1e-12,
                          ckpt_dir: str | None = None, ckpt_every: int = 1,
                          resume: bool = False):
    """Single-source PPR (reference entry point 'query', SURVEY 3.1).

    Returns (scores Dataset (node_id, ppr), stats dict).
    """
    src_e = handle.to_engine(source)  # engine id under degree balancing
    if mode == "exact":
        p, rmax = None, 0.0
    elif mode in ("fora", "fwdpush"):
        p = fora_params(handle.n, handle.m, eps, delta, pfail, rmax_scale)
        rmax = p["rmax"]
    else:
        raise ValueError(f"unknown mode {mode!r}")
    start = 0
    if resume and ckpt_dir is not None:
        k = latest_step(ckpt_dir, handle.P)
        if k is not None:
            restore_step(handle, ckpt_dir, k, ("reserve", "residual"),
                         expect={"source": src_e, "rmax": rmax})
            start = k
        else:
            handle.call_all("ppr_init", src_e)
    else:
        handle.call_all("ppr_init", src_e)
    if mode == "exact":
        stats = _push_loop(handle, src_e, rmax=0.0, sweep_all=True, tol=tol,
                           ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, start_round=start)
    else:
        stats = _push_loop(handle, src_e, rmax=p["rmax"], sweep_all=False,
                           ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, start_round=start)
        if mode == "fora":
            wstats = _walk_loop(handle, p["omega"], seed ^ (source * 0x9E3779B9), src_e)
            stats.update(wstats)
        stats.update(p)
    stats["counters"] = handle.counters()
    return handle.scores_dataset(), stats


def ppr_batch(handle, sources: list[int], mode: str = "fora", eps: float = 0.5,
              delta: float | None = None, pfail: float | None = None,
              rmax_scale: float = 1.0, seed: int = 42, tol: float = 1e-12,
              max_rounds: int = 10_000, ckpt_dir: str | None = None,
              ckpt_every: int = 1, resume: bool = False):
    """Batched multi-source SSPPR: all Q queries advance in the same
    superstep wave, amortizing the per-round driver barrier Q-fold
    (SURVEY 4.4).  Returns (scores Dataset (query_idx, node_id, ppr),
    stats).  query_idx indexes into `sources`.

    ckpt_dir enables per-superstep checkpoints of BOTH phases
    (consistent cut: in-flight payloads + dangling flushed first);
    resume restores the latest committed step after validating the
    manifest's sources/rmax (push) or sources/seed (walk) against this
    call.  Walk-phase checkpoints live under ``{ckpt_dir}/walk`` — per
    part: the (reserve, acc) matrices plus the pending walker arrays —
    so a dead driver resumes mid-walk instead of replaying every hop
    (at 10^9-walk scale replay is the dominant recovery cost)."""
    import os as _os

    import numpy as np

    import ray as _ray

    from ..state.checkpoint import checkpoint_walk_step, restore_walk_step

    P = handle.P
    sources_e = [handle.to_engine(s) for s in sources]
    handle.call_all("ppr_init_batch", sources_e)
    if mode == "exact":
        p, rmax, sweep = None, 0.0, True
    else:
        p = fora_params(handle.n, handle.m, eps, delta, pfail, rmax_scale)
        rmax, sweep = p["rmax"], False
    walk_dir = _os.path.join(ckpt_dir, "walk") if ckpt_dir is not None else None
    # a committed WALK step supersedes any push step: restore it, skip
    # the push loop entirely, and continue the walk from that hop
    resumed_hop = None
    walk_alive = 0
    if resume and walk_dir is not None and mode == "fora":
        wk = latest_step(walk_dir, P)
        if wk is not None:
            _, walk_alive = restore_walk_step(
                handle, walk_dir, wk,
                expect={"sources": [int(s) for s in sources_e], "seed": seed},
            )
            resumed_hop = wk
    start = 0
    if resumed_hop is None and resume and ckpt_dir is not None:
        k = latest_step(ckpt_dir, P)
        if k is not None:
            restore_step(handle, ckpt_dir, k, ("reserve", "residual"),
                         expect={"sources": [int(s) for s in sources_e], "rmax": rmax})
            start = k
    rounds, outs, dang = start, None, None
    rsum = None
    while resumed_hop is None and rounds < max_rounds:
        calls = []
        for q_, w in enumerate(handle.workers):
            pls = [outs[r][q_ + 1] for r in range(P) if r != q_] if outs else []
            calls.append(
                w.push_round_batch2.options(num_returns=P + 1).remote(rmax, sweep, dang, *pls)
            )
        metas = _ray.get([c[0] for c in calls])
        outs = calls
        dang = np.sum([np.asarray(m["dangling"]) for m in metas], axis=0)
        active = sum(m["active"] for m in metas)
        rsum = sum(m["rsum"] for m in metas) + float(dang.sum())
        rounds += 1
        if ckpt_dir is not None and rounds % ckpt_every == 0:
            # flush in-flight payloads + dangling so the checkpoint is a
            # consistent cut (reserve + residual sums to full mass)
            _ray.get([
                w.apply_residual_batch.remote(*[outs[r][q_ + 1] for r in range(P) if r != q_])
                for q_, w in enumerate(handle.workers)
            ])
            outs = None
            if dang.sum() > 0:
                handle.call_all("add_source_residual_batch", dang)
                dang = np.zeros(len(sources))
            checkpoint_step(
                handle, ckpt_dir, rounds, ("reserve", "residual"),
                extra={"rsum": rsum, "active": active,
                       "sources": [int(s) for s in sources_e], "rmax": rmax},
            )
        if (active == 0 and dang.sum() == 0) or (sweep and rsum < tol * len(sources)):
            if outs is not None:
                _ray.get([
                    w.apply_residual_batch.remote(*[outs[r][q_ + 1] for r in range(P) if r != q_])
                    for q_, w in enumerate(handle.workers)
                ])
                if dang.sum() > 0:
                    handle.call_all("add_source_residual_batch", dang)
            break
    stats = {"rounds": rounds, "rsum": rsum}
    if mode == "fora":
        if resumed_hop is not None:
            hop, alive, wouts, total = resumed_hop, walk_alive, None, walk_alive
            stats["resumed_walk_hop"] = resumed_hop
        else:
            total = sum(handle.call_all("walk_init_batch", p["omega"], seed))
            hop, alive, wouts = 0, total, None
        while alive > 0:
            calls = []
            for q_, w in enumerate(handle.workers):
                pls = [wouts[r][q_ + 1] for r in range(P) if r != q_] if wouts else []
                calls.append(w.walk_round_batch2.options(num_returns=P + 1).remote(hop, *pls))
            ms = _ray.get([c[0] for c in calls])
            wouts = calls
            alive = sum(m["alive"] for m in ms)
            hop += 1
            if walk_dir is not None and alive > 0 and hop % ckpt_every == 0:
                # flush in-flight walker payloads -> consistent cut
                _ray.get([
                    w.apply_walkers_batch.remote(*[wouts[r][q_ + 1] for r in range(P) if r != q_])
                    for q_, w in enumerate(handle.workers)
                ])
                wouts = None
                checkpoint_walk_step(
                    handle, walk_dir, hop,
                    extra={"sources": [int(s) for s in sources_e], "seed": seed,
                           "alive": alive},
                )
        stats.update(walks=total, hops=hop, **p)
    refs = [w.get_scores_batch.remote() for w in handle.workers]
    import ray as _ray

    return _ray.data.from_arrow_refs(refs), stats


def make_replicas(edges_ds, n: int, replicas: int, P: int = 4, m: int | None = None,
                  balance: str | None = None,
                  balance_threshold: int = 20_000_000,
                  degrees=None):
    """Build `replicas` independent engine replicas (each its own
    P-shard actor set) over the same edge table.  The CSR shards (and,
    with balance='degree', the permutation) are built ONCE and shared
    zero-copy through the object store — replica actors only differ in
    mutable query state.  Balancing matters for replicas exactly as for
    single handles: on a power-law graph, unbalanced mod-P shards leave
    one actor holding the hubs and every superstep waits on it.

    Mirrors GraphHandle.from_edges on scale (VERDICT r02 missing #2):
    the driver-side O(n) permutation is used while n <= balance_threshold;
    past it the fully distributed sort-rank + join relabel runs once and
    its per-partition (logical, perm) block refs are shared by every
    replica's workers — no O(n) array on the driver at any replica count."""
    from ..stages.csr import build_csr_shards
    from .runtime import (
        GraphHandle, ShardWorker, _block_parts,
        _distributed_degree_balance, _driver_degree_balance,
    )

    perm = inv = None
    logical_refs = perm_refs = None
    if balance == "degree" and n > balance_threshold:
        edges_ds, logical_refs, perm_refs = _distributed_degree_balance(
            edges_ds, n, P, degrees_ds=degrees)
    elif balance == "degree":
        edges_ds, perm, inv = _driver_degree_balance(edges_ds, n, degrees_ds=degrees)
    inv_ref = ray.put(inv) if inv is not None else None
    shards = build_csr_shards(edges_ds, n, P).materialize()
    refs = shards.to_arrow_refs()
    parts_per_block = ray.get([_block_parts.remote(r) for r in refs])
    ref_of_part = {}
    for ref, parts in zip(refs, parts_per_block):
        for p in parts:
            ref_of_part[p] = ref
    if m is None:
        m = edges_ds.count()
    out = []
    for _ in range(replicas):
        workers = [
            ShardWorker.remote(
                p, P, n, shard=ref_of_part.get(p),
                logical_ids=(inv[p::P] if inv is not None else None),
                logical_block=(logical_refs.get(p) if logical_refs else None),
                perm_block=(perm_refs.get(p) if perm_refs else None),
                inv_ref=inv_ref,
            )
            for p in range(P)
        ]
        h = GraphHandle(workers, n, m, P, perm=perm, inv=inv)
        h.remote_perm = logical_refs is not None
        out.append(h)
    return out


def build_local_indexes(handles, eps: float = 0.5, delta: float | None = None,
                        pfail: float | None = None, seed: int = 42,
                        share_path: str | None = None) -> dict:
    """FORA+ index for a P=1 replica fleet: built once on the first
    replica, persisted, loaded by the rest (identical endpoints)."""
    import os as _os
    import tempfile as _tf

    h0 = handles[0]
    p = fora_params(h0.n, h0.m, eps, delta, pfail)
    wpd = p["rmax"] * p["omega"]
    size = ray.get(h0.workers[0].local_build_index.remote(wpd, seed))
    if len(handles) > 1:
        d = share_path or _tf.mkdtemp(prefix="fora_idx_")
        _os.makedirs(d, exist_ok=True)
        path = _os.path.join(d, "part=0000.parquet")
        ray.get(h0.workers[0].index_save.remote(path))
        ray.get([h.workers[0].index_load.remote(path) for h in handles[1:]])
    return {**p, "walks_per_deg": wpd, "index_size": size}


def local_ppr_batch(handles, sources: list[int], mode: str = "fora",
                    eps: float = 0.5, delta: float | None = None,
                    pfail: float | None = None, seed: int = 42,
                    chunk: int | None = None, topk: int | None = None):
    """Latency-tier query serving: every handle is a P=1 replica holding
    the whole CSR; queries run in CHUNKS of one actor call each (push
    loop + walks with zero driver barriers), round-robin across
    replicas.  Chunking amortizes the two-object-per-query dispatch
    overhead that capped throughput scaling at high replica counts;
    chunk='auto' aims for ~4 waves per replica so stragglers rebalance.

    Per-query results and seeds are identical to single-query calls.
    Returns (list of (source, pyarrow scores table), stats)."""
    for h in handles:
        assert h.P == 1, "local_ppr_batch requires P=1 replicas"
    h0 = handles[0]
    p = fora_params(h0.n, h0.m, eps, delta, pfail)
    R = len(handles)
    if chunk is None:
        chunk = max(1, len(sources) // (4 * R))
    pending = []
    for ci, start in enumerate(range(0, len(sources), chunk)):
        h = handles[ci % R]
        batch = [int(s) for s in sources[start:start + chunk]]
        fut = h.workers[0].local_query_batch.remote(
            [h.to_engine(s) for s in batch], mode, p["rmax"], p["omega"], seed,
            topk, batch,  # logical ids: seeds stay logical-derived
        )
        pending.append((batch, fut))
    results = []
    for batch, fut in pending:
        results.extend(zip(batch, ray.get(fut)))
    return results, {**p, "replicas": R, "queries": len(sources), "chunk": chunk}


def ppr_batch_replicated(handles, sources: list[int], mode: str = "fora",
                         seed: int = 42, **kw):
    """Query-throughput scale-out: shard the query batch across
    pre-built engine replicas running concurrently (driver threads —
    the loops are ray.get waits, so the GIL is idle).  Latency of ONE
    query scales with P; aggregate queries/sec scales with replicas.
    Returns (results list of (scores, stats) per replica, source shards)."""
    import threading

    replicas = len(handles)
    shards = [list(sources[i::replicas]) for i in range(replicas)]
    results: list = [None] * replicas

    def run(i):
        if shards[i]:
            results[i] = ppr_batch(handles[i], shards[i], mode=mode, seed=seed + i, **kw)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(replicas)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results, shards


def monte_carlo_ppr(handle, source: int, eps: float = 0.5,
                    delta: float | None = None, pfail: float | None = None,
                    seed: int = 42):
    """G3 — pure Monte-Carlo baseline: omega walks from the source, no
    push phase (residual == e_s)."""
    src_e = handle.to_engine(source)
    handle.call_all("ppr_init", src_e)
    p = fora_params(handle.n, handle.m, eps, delta, pfail)
    wstats = _walk_loop(handle, p["omega"], seed ^ (source * 0x9E3779B9), src_e)
    return handle.scores_dataset(), {**p, **wstats}


def pagerank(handle, mode: str = "exact", tol: float = 1e-12,
             ckpt_dir: str | None = None, ckpt_every: int = 5,
             resume: bool = False):
    """G12 — global PageRank = PPR with uniform source (alpha teleport,
    dangling mass redistributed uniformly)."""
    start = 0
    if resume and ckpt_dir is not None:
        k = latest_step(ckpt_dir, handle.P)
        if k is not None:
            restore_step(handle, ckpt_dir, k, ("reserve", "residual"),
                         expect={"source": None, "rmax": 0.0})
            start = k
        else:
            handle.call_all("ppr_init", None)
    else:
        handle.call_all("ppr_init", None)
    stats = _push_loop(handle, None, rmax=0.0, sweep_all=True, tol=tol,
                       ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, start_round=start)
    stats["counters"] = handle.counters()
    return handle.scores_dataset(), stats


def backward_ppr(handle_rev, target: int, mode: str = "exact",
                 rmax_b: float = 1e-8, tol: float = 1e-12,
                 max_rounds: int = 10_000):
    """G5 — backward push from `target` over the weighted reverse graph
    (handle_rev = GraphHandle.from_reverse_edges).  Returns (scores
    Dataset (node_id, ppr) where ppr[v] ~= pi(v -> target), stats).

    mode='exact': push to convergence (residuals ~ 0) — matches the
    forward oracle column allclose.  mode='push': stop at rmax_b
    (additive error bound per BiPPR)."""
    import ray as _ray

    P = handle_rev.P
    handle_rev.call_all("ppr_init", handle_rev.to_engine(target))
    sweep = mode == "exact"
    rmax = 0.0 if sweep else rmax_b
    rounds, outs = 0, None
    rsum = None
    while rounds < max_rounds:
        calls = []
        for p, w in enumerate(handle_rev.workers):
            pls = [outs[q][p + 1] for q in range(P) if q != p] if outs else []
            calls.append(
                w.bpush_round2.options(num_returns=P + 1).remote(rmax, sweep, None, 0.0, *pls)
            )
        metas = _ray.get([c[0] for c in calls])
        outs = calls
        active = sum(m["active"] for m in metas)
        rsum = sum(m["rsum"] for m in metas)
        rounds += 1
        if active == 0 or (sweep and rsum < tol):
            if outs is not None:
                _ray.get([
                    w.apply_residual.remote(*[outs[q][p + 1] for q in range(P) if q != p])
                    for p, w in enumerate(handle_rev.workers)
                ])
            break
    return handle_rev.scores_dataset(), {"rounds": rounds, "rsum": rsum}


def bippr(handle_fwd, handle_rev, source: int, target: int, eps: float = 0.5,
          rmax_b: float | None = None, seed: int = 42) -> tuple[float, dict]:
    """G5 — BiPPR pairwise estimate: backward push from target (residuals
    r_t) + forward alpha-walks from source (endpoint distribution
    ~ pi(s, .)): pi(s,t) ~= reserve_t(s) + E_endpoint[r_t(endpoint)].

    The combine term sum_v acc(v)*r_t(v) is computed as P shard-local
    dot products: both handles share the v % P partitioning, so each
    reverse shard ships its sparse residual slice (by ObjectRef,
    worker-to-worker through the object store) to the aligned forward
    shard, which dots it against its own endpoint accumulator.  The
    driver only ever sees P floats — no n-sized array anywhere."""
    import math as _math

    n = handle_fwd.n
    assert handle_fwd.P == handle_rev.P, "BiPPR combine requires aligned v %% P shards"
    # The shard-aligned combine pairs reverse-shard local indices 1:1
    # with forward-shard local indices — valid whenever BOTH handles map
    # logical ids to the same engine ids: identity, or one SHARED
    # driver-side degree permutation (build the reverse handle with
    # perm=fwd.perm, inv=fwd.inv).  Mismatched or distributed
    # permutations would produce a silently WRONG estimate, so refuse.
    _require_pair(handle_fwd, handle_rev, "bippr")
    if rmax_b is None:
        rmax_b = eps / _math.sqrt(max(n, 2))
    _scores, bstats = backward_ppr(handle_rev, target, mode="push", rmax_b=rmax_b)
    src_e = handle_rev.to_engine(source)
    reserve_t_source = ray.get(
        handle_rev.workers[src_e % handle_rev.P].get_state_value.remote("reserve", src_e)
    )
    # forward walks: endpoints of W alpha-walks from source ~ pi(s, .)
    W = int(_math.ceil(16.0 * _math.log(max(n, 2)) / (eps * eps)))
    src_e = handle_fwd.to_engine(source)
    handle_fwd.call_all("ppr_init", src_e)
    handle_fwd.call_all("spawn_live_walks", src_e, 1.0, W, seed ^ (source * 0x85EBCA6B))
    hop, alive = 0, W
    while alive > 0:
        # source=-1: dangling nodes absorb (BiPPR self-loop convention,
        # matching the backward pass)
        ms, _ = handle_fwd._exchange("walk_round", "apply_walkers", hop, -1)
        alive = sum(m["alive"] for m in ms)
        hop += 1
    handle_fwd.call_all("walk_fold")
    resid_refs = [w.get_residual_sparse.remote() for w in handle_rev.workers]
    dots = ray.get([
        fw.dot_state_sparse.remote(ref, "reserve")
        for fw, ref in zip(handle_fwd.workers, resid_refs)
    ])
    estimate = float(reserve_t_source) + float(sum(dots))
    return estimate, {"walks": W, "rmax_b": rmax_b, **bstats}


# ---- G6 HubPPR (Wang/Tang/Xiao VLDB'16, re-expressed on the superstep
# runtime; SURVEY 2.4 G6 — supersedes the round-1/2 documented skip) -----

def _require_local_perm(handle, op: str) -> None:
    """Walk / sample draws need per-edge logical ids ON the workers to
    stay a pure function of the logical graph.  Identity and
    driver-balanced handles always qualify; distributed-permutation
    handles qualify when their CSR shards carry the ind_logical column
    (every shard built by this repo's distributed path does — the guard
    catches only permuted shards loaded from a pre-r4 persisted dir)."""
    if getattr(handle, "remote_perm", False):
        import ray as _ray

        if not all(_ray.get([w.has_logical_edges.remote() for w in handle.workers])):
            raise ValueError(
                f"{op} on a distributed-permutation handle requires CSR shards "
                "carrying ind_logical (rebuild the graph with this version)"
            )


def _require_pair(a, b, op: str) -> None:
    """Shard-aligned pairwise ops: both pools must share ONE logical ->
    engine mapping so local indices pair 1:1 (identity + identity, or
    rev built with perm=fwd.perm)."""
    if not a.same_perm_as(b):
        raise ValueError(
            f"{op} requires shard-aligned handles sharing the same "
            "permutation: both identity, or the second built with "
            "perm=first.perm, inv=first.inv (distributed permutations "
            "are not supported for pairwise ops)"
        )


def select_hubs(handle, H: int) -> np.ndarray:
    """Top-H nodes by shard out-degree (deg desc, LOGICAL id asc —
    deterministic under ties and permutation-invariant).  Returns
    LOGICAL ids.  Per-shard exact top-H + driver merge of P*H candidates
    (every global-top element is in its shard's top-H under the same
    total order), so no n-sized degree vector touches the driver.  On
    the forward handle this ranks by out-degree (the paper's degree
    heuristic for frequently-visited nodes); on a reverse handle the
    shard out-degree IS the original in-degree, i.e. backward-push
    cost."""
    if H <= 0:
        return np.empty(0, np.int64)
    parts = handle.call_all("top_degree_local", H)
    ids = np.concatenate([p[0] for p in parts])
    degs = np.concatenate([p[1] for p in parts])
    if ids.size == 0:
        return ids
    order = np.lexsort((ids, -degs))[:H]
    return np.sort(ids[order])


def build_hub_index(handle, hub_ids, pool_size: int = 1024, seed: int = 42) -> dict:
    """Forward hub walk pools: `pool_size` complete alpha-walk endpoints
    per hub, generated by the FORA+ index walk machinery under the
    BiPPR absorb-dangling convention (index_walk_round absorb=True).
    `hub_ids` are LOGICAL ids (select_hubs output)."""
    hub_ids = np.asarray(hub_ids, dtype=np.int64)
    hub_eng = handle.to_engine_array(hub_ids)
    total = sum(handle.call_all("hub_index_init", hub_eng, pool_size, seed))
    hop, alive = 0, total
    while alive > 0:
        metas, _ = handle._exchange("index_walk_round", "apply_index_walkers", hop, True)
        alive = sum(m["alive"] for m in metas)
        hop += 1
    handle._exchange("index_endpoint_exchange", "apply_endpoints")
    sizes = handle.call_all("hub_index_build")
    return {"hubs": int(hub_ids.size), "pool_size": pool_size,
            "stored": int(sum(sizes)), "hops": hop}


def build_backward_hub_oracle(handle_rev, hub_ids, rmax_hub: float,
                              max_rounds: int = 10_000) -> dict:
    """Backward hub oracles: one fine-rmax backward push per hub
    (logical hub id ascending); each shard captures ITS OWN sparse
    (reserve, residual) slice in place — the oracle never moves through
    the driver or the object store.  `hub_ids` are LOGICAL ids; oracle
    bookkeeping keys on engine ids (what bpush_round_hub compares
    against)."""
    hub_ids = np.sort(np.asarray(hub_ids, dtype=np.int64))
    entries = 0
    for h in hub_ids:
        _scores, _stats = backward_ppr(handle_rev, int(h), mode="push",
                                       rmax_b=rmax_hub, max_rounds=max_rounds)
        entries += sum(handle_rev.call_all(
            "bpush_oracle_capture", handle_rev.to_engine(int(h))))
    handle_rev.call_all("bpush_oracle_finalize",
                        handle_rev.to_engine_array(hub_ids))
    return {"hubs": int(hub_ids.size), "rmax_hub": rmax_hub, "entries": entries}


def hubppr(handle_fwd, handle_rev, source: int, target: int, eps: float = 0.5,
           rmax_b: float | None = None, seed: int = 42,
           max_rounds: int = 10_000) -> tuple[float, dict]:
    """G6 — HubPPR pairwise estimate, same estimator as bippr
    (pi(s,t) ~= reserve_t(s) + E_endpoint[r_t(endpoint)]) with both
    phases hub-accelerated: backward push short-circuits hub residuals
    through pre-stored fine-rmax oracles (exact — invariant
    substitution), forward walks terminate at hubs by consuming stored
    endpoints (unbiased; slot drawn from the walker's own key, see
    runtime.walk_round).  Call build_hub_index(handle_fwd, ...) and
    build_backward_hub_oracle(handle_rev, ...) first; with no hubs
    prepared this degrades to exactly bippr's behavior."""
    import math as _math

    n = handle_fwd.n
    assert handle_fwd.P == handle_rev.P, "HubPPR combine requires aligned v %% P shards"
    _require_pair(handle_fwd, handle_rev, "hubppr")
    if rmax_b is None:
        rmax_b = eps / _math.sqrt(max(n, 2))
    P = handle_rev.P
    handle_rev.call_all("ppr_init", handle_rev.to_engine(target))
    consumed: list = []
    outs = None
    rounds = hub_applies = 0
    while rounds < max_rounds:
        calls = []
        for p, w in enumerate(handle_rev.workers):
            pls = [outs[q][p + 1] for q in range(P) if q != p] if outs else []
            calls.append(
                w.bpush_round_hub.options(num_returns=P + 1).remote(rmax_b, consumed, *pls)
            )
        metas = ray.get([c[0] for c in calls])
        outs = calls
        consumed = [pair for m in metas for pair in m["consumed"]]
        hub_applies += len(consumed)
        active = sum(m["active"] for m in metas)
        rounds += 1
        if active == 0 and not consumed:
            ray.get([
                w.apply_residual.remote(*[outs[q][p + 1] for q in range(P) if q != p])
                for p, w in enumerate(handle_rev.workers)
            ])
            break
    src_e = handle_rev.to_engine(source)
    reserve_t_source = ray.get(
        handle_rev.workers[src_e % P].get_state_value.remote("reserve", src_e)
    )
    W = int(_math.ceil(16.0 * _math.log(max(n, 2)) / (eps * eps)))
    handle_fwd.call_all("ppr_init", src_e)
    handle_fwd.call_all("spawn_live_walks", src_e, 1.0, W, seed ^ (source * 0x85EBCA6B))
    hop, alive = 0, W
    while alive > 0:
        ms, _ = handle_fwd._exchange("walk_round", "apply_walkers", hop, -1, True)
        alive = sum(m["alive"] for m in ms)
        hop += 1
    tmetas, _ = handle_fwd._exchange("hub_term_exchange", "apply_acc")
    handle_fwd.call_all("walk_fold")
    resid_refs = [w.get_residual_sparse.remote() for w in handle_rev.workers]
    dots = ray.get([
        fw.dot_state_sparse.remote(ref, "reserve")
        for fw, ref in zip(handle_fwd.workers, resid_refs)
    ])
    estimate = float(reserve_t_source) + float(sum(dots))
    return estimate, {
        "walks": W, "rmax_b": rmax_b, "rounds": rounds,
        "hub_oracle_applies": hub_applies,
        "hub_hits": sum(m["n"] for m in tmetas),
    }


def build_walk_index(handle, eps: float = 0.5, delta: float | None = None,
                     pfail: float | None = None, rmax_scale: float = 1.0,
                     seed: int = 42, save_dir: str | None = None) -> dict:
    """G8 — FORA+ walk index: precompute ceil(rmax*omega*out_deg(v)) walk
    endpoints per vertex (paper TODS section 5).  One-time job; makes the
    query-time MC phase a deterministic index lookup.  Walks that hit a
    dangling vertex are stored as -1 (restart marker) and re-run live
    from the query source at query time."""
    import os as _os

    p = fora_params(handle.n, handle.m, eps, delta, pfail, rmax_scale)
    walks_per_deg = p["rmax"] * p["omega"]
    total = sum(handle.call_all("index_init", walks_per_deg, seed))
    hop, alive = 0, total
    while alive > 0:
        metas, _ = handle._exchange("index_walk_round", "apply_index_walkers", hop)
        alive = sum(m["alive"] for m in metas)
        hop += 1
    handle._exchange("index_endpoint_exchange", "apply_endpoints")
    sizes = handle.call_all("index_build")
    if save_dir is not None:
        import json as _json

        _os.makedirs(save_dir, exist_ok=True)
        import ray as _ray

        _ray.get([
            w.index_save.remote(_os.path.join(save_dir, f"part={q:04d}.parquet"))
            for q, w in enumerate(handle.workers)
        ])
        meta = {"n": handle.n, "m": handle.m, "P": handle.P, "seed": seed,
                "eps": eps, "walks_per_deg": walks_per_deg}
        tmp = _os.path.join(save_dir, ".meta.tmp")
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        _os.replace(tmp, _os.path.join(save_dir, "meta.json"))
    return {**p, "walks_per_deg": walks_per_deg, "index_walks": total,
            "index_size": sum(sizes), "hops": hop}


def load_walk_index(handle, save_dir: str) -> None:
    """Reload a persisted walk index; refuses a (P, n)-mismatched index
    instead of failing obscurely or corrupting results."""
    import json as _json
    import os as _os

    import ray as _ray

    meta_path = _os.path.join(save_dir, "meta.json")
    if _os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = _json.load(f)
        if meta.get("P") != handle.P or meta.get("n") != handle.n:
            raise ValueError(
                f"walk index at {save_dir} was built for P={meta.get('P')}, "
                f"n={meta.get('n')}; this handle has P={handle.P}, n={handle.n}"
            )
    _ray.get([
        w.index_load.remote(_os.path.join(save_dir, f"part={q:04d}.parquet"))
        for q, w in enumerate(handle.workers)
    ])


def fora_ssppr_indexed(handle, source: int, eps: float = 0.5,
                       delta: float | None = None, pfail: float | None = None,
                       rmax_scale: float = 1.0, seed: int = 42):
    """FORA+ query: push at rmax, then MC phase from the stored index
    (no RNG except for restart-marker walks re-run from the source)."""
    src_e = handle.to_engine(source)
    handle.call_all("ppr_init", src_e)
    p = fora_params(handle.n, handle.m, eps, delta, pfail, rmax_scale)
    stats = _push_loop(handle, src_e, rmax=p["rmax"], sweep_all=False)
    metas, _ = handle._exchange("walk_from_index", "apply_acc", p["omega"])
    restart_mass = sum(m["restart"] for m in metas)
    if restart_mass > 0:
        count = max(int(math.ceil(restart_mass * p["omega"])), 1)
        handle.call_all("spawn_live_walks", src_e, restart_mass, count,
                        seed ^ (source * 0x9E3779B9))
        hop, alive = 0, count
        while alive > 0:
            ms, _ = handle._exchange("walk_round", "apply_walkers", hop, src_e)
            alive = sum(m["alive"] for m in ms)
            hop += 1
    handle.call_all("walk_fold")
    stats.update(p)
    stats["restart_mass"] = restart_mass
    return handle.scores_dataset(), stats


def topk_ppr(handle, source: int, k: int, eps: float = 0.5, seed: int = 42,
             pfail: float | None = None, max_iters: int = 8,
             use_index: bool = False):
    """G7 — top-k SSPPR with confidence-bound early termination (paper
    section 4, Alg.4/5 structure): FORA at geometrically tightening
    delta (delta_0 = 1/k, /4 each trial).  At guarantee level
    (eps, delta), every estimate above delta satisfies
    |pi_hat - pi| <= eps*pi, so pi lies in
    [pi_hat/(1+eps), pi_hat/(1-eps)]; estimates below delta are bounded
    above by delta*(1+eps).  Both bounds are monotone in pi_hat, so the
    stop test is LB(k-th) >= UB((k+1)-th) — the k-th candidate provably
    beats every non-candidate.

    PUSH STATE IS REUSED ACROSS TRIALS (paper Alg.5; VERDICT r03 #3):
    trial i+1 continues draining the trial-i (reserve, residual) state
    at the halved rmax instead of re-pushing from e_s — each trial only
    pays the incremental push frontier.  The walk phase runs on a
    residual SNAPSHOT into the separate acc accumulator (estimate =
    reserve + acc, never folded), so a non-converged trial restores the
    residual, clears acc and re-walks at the 4x omega.  Replayed
    bit-exactly by protocol_ref.ShardedFora.topk_ppr (the driver
    golden).  Returns (topk Dataset (node_id, ppr) sorted desc, stats).
    """
    src_e = handle.to_engine(source)
    handle.call_all("ppr_init", src_e)
    delta = max(1.0 / max(k, 1), 1.0 / handle.n)
    stats: dict = {"iters": 0, "converged": False,
                   "push_rounds": 0, "walks": 0}
    scores = None
    for i in range(max_iters):
        p = fora_params(handle.n, handle.m, eps, delta, pfail)
        pst = _push_loop(handle, src_e, rmax=p["rmax"], sweep_all=False)
        stats["push_rounds"] += pst["rounds"]
        handle.call_all("residual_snapshot")
        wseed = (seed + i) ^ (source * 0x9E3779B9)
        if use_index:
            metas, _ = handle._exchange("walk_from_index", "apply_acc", p["omega"])
            restart_mass = sum(m["restart"] for m in metas)
            stats["walks"] += sum(m["used"] for m in metas)
            if restart_mass > 0:
                count = max(int(math.ceil(restart_mass * p["omega"])), 1)
                handle.call_all("spawn_live_walks", src_e, restart_mass, count, wseed)
                hop, alive = 0, count
                while alive > 0:
                    ms, _ = handle._exchange("walk_round", "apply_walkers", hop, src_e)
                    alive = sum(m["alive"] for m in ms)
                    hop += 1
        else:
            wst = _walk_loop(handle, p["omega"], wseed, src_e, fold=False)
            stats["walks"] += wst["walks"]
        stats["iters"] = i + 1
        stats["delta"] = delta
        scores = handle.scores_est_dataset()
        top = (
            scores.sort(["ppr", "node_id"], descending=[True, False])
            .limit(k + 1).to_pandas()
        )
        est = top["ppr"].to_numpy()
        at_floor = delta <= 1.0 / handle.n + 1e-18
        if len(est) >= k:
            lb_k = max(est[k - 1] / (1.0 + eps), 0.0)
            if len(est) > k:
                ub_next = max(est[k] / (1.0 - eps), delta * (1.0 + eps))
            else:
                ub_next = delta * (1.0 + eps)  # everything else is < delta
            if lb_k >= ub_next:
                stats["converged"] = True
                break
        if at_floor:
            break
        handle.call_all("residual_restore")
        handle.call_all("clear_acc")
        delta = max(delta / 4.0, 1.0 / handle.n)
    # deterministic selection AND ordering among exactly-tied scores
    return scores.sort(["ppr", "node_id"], descending=[True, False]).limit(k), stats


def connected_components(handle, max_rounds: int = 10_000):
    """G9 — hash-min label propagation on the symmetrized graph.
    Deterministic; label = min node id of the component."""
    handle.call_all("cc_init")
    rounds = 0
    while rounds < max_rounds:
        metas, changed = handle._exchange("cc_round", "cc_apply")
        rounds += 1
        if sum(changed) == 0 and sum(m["sent"] for m in metas) == 0:
            break
    return handle.labels_dataset(), {"rounds": rounds}


def maximal_independent_set(handle, seed: int = 42, max_rounds: int = 10_000):
    """Deterministic Luby-style maximal independent set over the
    SYMMETRIZED graph (Luby '86 / Blelloch et al. random-priority
    greedy): each round every undecided node draws a counter-RNG
    priority key = mix64(mix64(seed, round), logical_id); a node joins
    the MIS iff its (key, id) is strictly smaller than every undecided
    neighbor's, then joined nodes knock their neighbors out.  Two
    pre-aggregated supersteps per round (a lexicographic-min priority
    exchange + an exclusion broadcast), O(log n) rounds w.h.p., and
    the result is a pure function of (logical graph, seed) — identical
    at any partition count and permutation.

    Returns (Dataset (node_id, in_mis) over ALL nodes, stats).
    Independence and maximality are exact (ties broken by id, so
    adjacent u64 hash collisions cannot both join).
    """
    handle.call_all("mis_init", int(seed))
    rounds = _mis_rounds(handle, max_rounds)
    refs = [w.mis_table.remote() for w in handle.workers]
    return ray.data.from_arrow_refs(refs), {"rounds": rounds}


def _mis_rounds(handle, max_rounds: int) -> int:
    """Run armed MIS supersteps to convergence (shared by
    maximal_independent_set and greedy_color)."""
    rounds = 0
    while rounds < max_rounds:
        metas, _ = handle._exchange("mis_round", "mis_apply", rounds)
        if sum(m["undecided"] for m in metas) == 0:
            return rounds
        handle._exchange("mis_commit", "mis_exclude_apply", rounds)
        rounds += 1
    raise RuntimeError("MIS did not converge")


def greedy_color(handle, seed: int = 42, max_colors: int = 4096,
                 max_rounds: int = 10_000):
    """Distributed greedy graph coloring by iterated Luby MIS (Luby '86
    / Jones-Plassmann shape): color class c is a maximal independent
    set of the still-uncolored residual graph (fresh counter-RNG
    priorities per class: mix64(seed, c)), so every node's color is <=
    its residual degree when chosen and adjacent nodes never share a
    color.  Pass the SYMMETRIZED handle.

    Per class: one armed MIS run (two pre-aggregated supersteps per
    inner round); classes shrink geometrically, so total work ~ O(m ·
    colors) with colors <= max-degree + 1.  Deterministic — a pure
    function of (logical graph, seed) at any partition count.

    Returns (Dataset (node_id, color) over ALL nodes, stats).
    """
    handle.call_all("color_init")
    colors = inner_rounds = 0
    while True:
        rem = sum(handle.call_all("mis_reset_uncolored", int(seed), colors))
        if rem == 0:
            break
        if colors >= max_colors:
            raise RuntimeError(
                f"greedy_color exceeded max_colors={max_colors}: "
                f"{rem} nodes uncolored")
        inner_rounds += _mis_rounds(handle, max_rounds)
        handle.call_all("color_commit", colors)
        colors += 1
    refs = [w.color_table.remote() for w in handle.workers]
    return ray.data.from_arrow_refs(refs), {
        "colors": colors, "mis_rounds": inner_rounds}


def kcore(handle, max_rounds: int = 10_000):
    """k-core decomposition: per-vertex core numbers via the distributed
    h-index iteration (init core = degree, repeatedly replace with the
    h-index of neighbor values; the fixpoint is the coreness — Lü et
    al., PNAS 2016).  Pass the SYMMETRIZED handle.  Verified against the
    independent peeling reimplementation in fora_ray.oracle.kcore_oracle.

    Each round costs one full edge sweep (like a PageRank iteration),
    with per-(dst, value) pre-counting inside the sender so hub fan-in
    arrives as compressed histogram cells; rounds needed in practice are
    tens even on power-law graphs.
    """
    import ray as _ray

    handle.call_all("kcore_init")
    rounds = 0
    while rounds < max_rounds:
        handle._exchange("kcore_round", "kcore_vote")
        changed = sum(handle.call_all("kcore_commit"))
        rounds += 1
        if changed == 0:
            break
    refs = [w.get_cores.remote() for w in handle.workers]
    return _ray.data.from_arrow_refs(refs), {"rounds": rounds}


def bfs_hops(handle, sources, max_rounds: int = 10_000):
    """Multi-source BFS hop distance (unit-weight relaxation on the
    handle's out-adjacency; pass the symmetrized handle for undirected
    distance).  Deterministic.  Returns (Dataset (node_id, dist) over
    REACHED nodes only, stats) — unreached nodes are absent, not inf.

    Same superstep shape as connected_components: only the frontier
    (nodes whose dist changed last round) gathers edges, messages are
    min-combined per destination cell before the exchange, so hub
    fan-in is bounded at P-1 payloads per round.
    """
    import ray as _ray

    eng = [handle.to_engine(int(s)) for s in sources]
    handle.call_all("bfs_init", eng)
    rounds = 0
    while rounds < max_rounds:
        metas, changed = handle._exchange("bfs_round", "bfs_apply")
        rounds += 1
        if sum(changed) == 0 and sum(m["sent"] for m in metas) == 0:
            break
    refs = [w.get_dists.remote() for w in handle.workers]
    return _ray.data.from_arrow_refs(refs), {"rounds": rounds}


def ego_network(handle, edges_sym_ds, seed_node: int, k: int = 2):
    """k-hop ego-network extraction: the induced undirected subgraph on
    all nodes within `k` hops of the seed — the debugging/visualization
    primitive behind GNN neighborhood inspection.  `handle` and
    `edges_sym_ds` must describe the SAME symmetrized graph.

    Distribution: k BFS supersteps (level-synchronous, so every node at
    dist <= k is settled after exactly k rounds — the frontier never
    expands past the ego radius), then ONE membership-filtered
    streaming pass over the edge table keeps canonical (lo < hi) edges
    with BOTH endpoints inside the ego set.  The member list rides to
    the filter tasks as one sorted int64 array via ray.put — ego sets
    are local by construction, which is what bounds the broadcast.

    Returns ((lo, hi) Dataset of induced edges, stats {members, rounds}).
    """
    import pyarrow as pa

    if k < 0:
        raise ValueError("ego_network: k must be >= 0")
    dists, stats = bfs_hops(handle, [seed_node], max_rounds=max(k, 1))
    dp = dists.to_pandas()
    members = np.sort(dp.loc[dp["dist"] <= k, "node_id"].to_numpy().astype(np.int64))

    class _EgoFilter:
        def __init__(self, mem_ref):
            self.mem = ray.get(mem_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table({"lo": pa.array([], pa.int64()),
                              "hi": pa.array([], pa.int64())})
            if t.num_rows == 0 or "src" not in t.schema.names:
                return empty
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = s < d  # canonical: each undirected edge once
            s, d = s[keep], d[keep]
            m = self.mem

            def _isin(x):
                i = np.searchsorted(m, x)
                return (i < len(m)) & (m[np.minimum(i, len(m) - 1)] == x)

            both = _isin(s) & _isin(d)
            return pa.table({"lo": pa.array(s[both]), "hi": pa.array(d[both])})

    out = edges_sym_ds.map_batches(
        _EgoFilter(ray.put(members)), batch_format="pyarrow", batch_size=None)
    from ..stages.shuffle import clean_sort

    return clean_sort(out, ["lo", "hi"]), {
        "members": int(len(members)), "rounds": stats["rounds"]}


def label_propagation(handle, max_rounds: int = 20):
    """G10 — synchronous LPA, most-frequent neighbor label, smallest-label
    tie-break (matches fora_ray.oracle.lpa_oracle exactly)."""
    handle.call_all("lpa_init")
    rounds = 0
    while rounds < max_rounds:
        handle._exchange("lpa_round", "lpa_vote")
        changed = sum(handle.call_all("lpa_commit"))
        rounds += 1
        if changed == 0:
            break
    return handle.labels_dataset(), {"rounds": rounds}


def _farthest(dists_ds):
    """(max dist, smallest node id at that dist, reached count) from a
    (node_id, dist) Dataset — per-block partials (1 row each), tiny
    driver reduce; no full sort for an argmax."""
    import numpy as _np
    import pyarrow as _pa

    def partial(t: _pa.Table) -> _pa.Table:
        if t.num_rows == 0 or "dist" not in t.schema.names:
            return _pa.table({"d": _pa.array([], _pa.int64()),
                              "v": _pa.array([], _pa.int64()),
                              "c": _pa.array([], _pa.int64())})
        d = t["dist"].to_numpy(zero_copy_only=False)
        v = t["node_id"].to_numpy(zero_copy_only=False)
        m = d.max()
        return _pa.table({"d": _pa.array([int(m)]),
                          "v": _pa.array([int(v[d == m].min())]),
                          "c": _pa.array([t.num_rows])})

    rows = dists_ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return 0, None, 0
    best = max(rows, key=lambda r: (r["d"], -r["v"]))
    return int(best["d"]), int(best["v"]), int(sum(r["c"] for r in rows))


def diameter_estimate(handle, seed_node: int = 0, sweeps: int = 2):
    """Double-sweep diameter lower bound (Magnien-Latapy-Habib '09):
    BFS from `seed_node`, then from the farthest node found (smallest
    id on ties), `sweeps` times.  Pass the SYMMETRIZED handle; the
    estimate is within the connected component of `seed_node` —
    standard for the lower-bound family.  Each sweep costs one BFS
    (frontier supersteps, min-combined payloads); the argmax between
    sweeps is a per-block partial + driver reduce over block count,
    never a full sort.

    Returns ({diameter_lb, far_a, far_b, n_reached}, stats)."""
    src = int(seed_node)
    prev = src
    dia, far, reached = 0, src, 1
    rounds_total = 0
    for _ in range(max(1, sweeps)):
        dists, stats = bfs_hops(handle, [src])
        rounds_total += stats["rounds"]
        dia, far, reached = _farthest(dists)
        if far == src or dia == 0:
            break
        prev, src = src, far
    return (
        {"diameter_lb": dia, "far_a": prev, "far_b": far, "n_reached": reached},
        {"rounds": rounds_total},
    )


def hits(handle_fwd, handle_rev, max_iters: int = 40, tol: float = 0.0):
    """G13 — HITS hubs & authorities (Kleinberg '99) as alternating
    routed full sweeps over two shard-aligned pools:

        a_{k} = normalize(A^T h_{k-1})   sweep of hub over FORWARD CSR
        h_{k} = normalize(A a_{k})       sweep of auth over REVERSE CSR

    ``handle_rev`` must be built from the SAME edge table with src/dst
    swapped (``GraphHandle.from_edges(swap(edges), n, P)``) so each
    reverse shard q holds the in-edges of exactly the vertices whose
    authority slice it owns (v % P alignment, identity permutations —
    asserted, same contract as ``bippr``).  Per iteration: 2 sweeps, 2
    normalization barriers (P floats each); payload traffic bounded by
    2·P dense slices, pre-aggregated per destination so hub fan-in
    cannot hotspot.  L2-normalized each half-step.  tol=0 runs exactly
    ``max_iters`` iterations (deterministic — the driver-oracle mode);
    tol>0 stops early when the combined L1 delta falls below it.

    Returns ((node_id, hub, authority) Dataset over ALL nodes, stats).
    """
    P = handle_fwd.P
    if handle_rev.P != P or handle_rev.n != handle_fwd.n:
        raise ValueError("hits requires shard-aligned fwd/rev handles (same n, P)")
    # the slice exchange pairs local indices 1:1 across the pools, which
    # holds for any SHARED logical->engine mapping: identity, or a rev
    # handle built with perm=fwd.perm (degree balancing)
    _require_pair(handle_fwd, handle_rev, "hits")
    handle_fwd.call_all("hits_init", "hub", 1.0 / math.sqrt(handle_fwd.n))
    iters = 0
    delta = math.inf
    while iters < max_iters:
        delta = 0.0
        for src_h, dst_h, src_f, dst_f in (
            (handle_fwd, handle_rev, "hub", "auth"),
            (handle_rev, handle_fwd, "auth", "hub"),
        ):
            outs = [w.hits_sweep.options(num_returns=P).remote(src_f)
                    for w in src_h.workers]
            ss = ray.get([
                w.hits_apply.remote(dst_f, *[outs[p][q] for p in range(P)])
                for q, w in enumerate(dst_h.workers)
            ])
            total = sum(ss)
            c = 1.0 / math.sqrt(total) if total > 0 else 0.0
            delta += sum(ray.get([w.hits_scale.remote(dst_f, c)
                                  for w in dst_h.workers]))
        iters += 1
        if tol > 0 and delta < tol:
            break
    tables = [
        fw.hits_table.remote(rw.hits_get.remote("auth"))
        for fw, rw in zip(handle_fwd.workers, handle_rev.workers)
    ]
    return ray.data.from_arrow_refs(tables), {"iters": iters, "delta": delta}


def local_cluster(handle, edges_sym_ds, seed_node: int, rmax: float = 1e-4):
    """PPR-Nibble local clustering — the canonical application of
    approximate PPR (Andersen-Chung-Lang, FOCS'06: "Local Graph
    Partitioning using PageRank Vectors").  `handle` and
    `edges_sym_ds` must describe the SAME symmetrized graph.

    Phase 1: deterministic thresholded forward push (G1) from the seed
    at `rmax` — no walk phase, so the APPR vector is reproducible and
    the support volume is bounded by 1/(alpha*rmax) (ACL Lemma 2).
    That bound is what makes the driver-side sweep legitimate at 100 TB
    scale: the sweep set is a LOCAL neighborhood sized by rmax, never
    the graph.

    Phase 2: ONE membership-filtered streaming pass over the edge
    table gathers the support's global degrees and induced adjacency
    (<= vol(support) rows by the same bound), then the classic sweep:
    order the support by reserve/degree, take the prefix of minimum
    conductance phi(S) = cut(S) / min(vol(S), vol(V)-vol(S)).  cut,
    vol and the internal-edge counts are integers, so the sweep is
    bit-deterministic.

    Returns (pa.Table (node_id, sweep_rank, ppr, deg, in_cluster),
    stats {conductance, cluster_size, support_size, rounds}).
    """
    import pyarrow as pa

    src_e = handle.to_engine(seed_node)
    handle.call_all("ppr_init", src_e)
    pstats = _push_loop(handle, src_e, rmax=rmax, sweep_all=False)
    sc = handle.scores_dataset().to_pandas()
    if "node_id" in sc.columns:  # empty nonzero-only blocks drop schema
        sup = np.sort(sc["node_id"].to_numpy().astype(np.int64))
    else:
        sup = np.empty(0, np.int64)
    S = len(sup)
    if S == 0:
        # rmax * deg(seed) >= 1: the push threshold was never crossed,
        # nothing drained into reserve — no local cluster at this rmax
        import pyarrow as pa

        tab = pa.table({"node_id": pa.array([], pa.int64()),
                        "sweep_rank": pa.array([], pa.int64()),
                        "ppr": pa.array([], pa.float64()),
                        "deg": pa.array([], pa.int64()),
                        "in_cluster": pa.array([], pa.bool_())})
        return tab, {"conductance": float("nan"), "cluster_size": 0,
                     "support_size": 0, "rounds": pstats["rounds"]}
    ppr = np.zeros(S)
    ppr[np.searchsorted(sup, sc["node_id"].to_numpy().astype(np.int64))] = \
        sc["ppr"].to_numpy()

    class _SupportEdges:
        """Keep edge rows whose src is in the support; flag dst
        membership.  The support array rides once via ray.put."""

        def __init__(self, sup_ref):
            self.sup = ray.get(sup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table({"src": pa.array([], pa.int64()),
                              "dst": pa.array([], pa.int64()),
                              "dst_in": pa.array([], pa.int8())})
            if t.num_rows == 0 or "src" not in t.schema.names:
                return empty
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(self.sup, s)
            keep = (si < len(self.sup)) & (self.sup[np.minimum(si, len(self.sup) - 1)] == s)
            if not keep.any():
                return empty
            s, d = s[keep], d[keep]
            di = np.searchsorted(self.sup, d)
            din = (di < len(self.sup)) & (self.sup[np.minimum(di, len(self.sup) - 1)] == d)
            return pa.table({"src": pa.array(s), "dst": pa.array(d),
                             "dst_in": pa.array(din.astype(np.int8))})

    rows = edges_sym_ds.map_batches(
        _SupportEdges(ray.put(sup)), batch_format="pyarrow", batch_size=None)
    deg = np.zeros(S, np.int64)
    int_src, int_dst = [], []
    for ref in rows.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "src" not in t.schema.names:
            continue
        s = np.searchsorted(sup, t["src"].to_numpy(zero_copy_only=False))
        deg += np.bincount(s, minlength=S)
        din = t["dst"].to_numpy(zero_copy_only=False)[
            t["dst_in"].to_numpy(zero_copy_only=False).astype(bool)]
        int_src.append(s[t["dst_in"].to_numpy(zero_copy_only=False).astype(bool)])
        int_dst.append(np.searchsorted(sup, din))
    if deg.max(initial=0) == 0:  # isolated seed: trivial singleton
        tab = pa.table({"node_id": pa.array(sup), "sweep_rank": pa.array(
            np.zeros(S, np.int64)), "ppr": pa.array(ppr),
            "deg": pa.array(deg), "in_cluster": pa.array(np.ones(S, bool))})
        return tab, {"conductance": float("nan"), "cluster_size": S,
                     "support_size": S, "rounds": pstats["rounds"]}
    # sweep order: reserve/degree descending, node id ascending
    key = np.where(deg > 0, ppr / np.maximum(deg, 1), -1.0)
    order = np.lexsort((sup, -key))
    rank = np.empty(S, np.int64)
    rank[order] = np.arange(S)
    iu = np.concatenate(int_src) if int_src else np.empty(0, np.int64)
    iv = np.concatenate(int_dst) if int_dst else np.empty(0, np.int64)
    ru, rv = rank[iu], rank[iv]
    late = np.maximum(ru, rv)[ru > rv]  # each undirected internal edge once
    internal = np.cumsum(np.bincount(late, minlength=S))
    vol = np.cumsum(deg[order])
    cut = vol - 2 * internal
    M = handle.m
    denom = np.minimum(vol, M - vol)
    valid = denom > 0
    if not valid.any():
        best_k, best_phi = S - 1, float("nan")
    else:
        phi = np.where(valid, cut / np.maximum(denom, 1), np.inf)
        best_k = int(np.argmin(phi))
        best_phi = float(phi[best_k])
    in_cluster = rank <= best_k
    tab = pa.table({
        "node_id": pa.array(sup),
        "sweep_rank": pa.array(rank),
        "ppr": pa.array(ppr),
        "deg": pa.array(deg),
        "in_cluster": pa.array(in_cluster),
    })
    return tab, {"conductance": best_phi, "cluster_size": int(best_k + 1),
                 "support_size": S, "rounds": pstats["rounds"]}


def eigenvector_centrality(handle, max_iters: int = 30, tol: float = 0.0):
    """Eigenvector centrality (Bonacich '72) of the DIRECTED graph —
    in-edge based like the classic formulation: x_v ∝ Σ_{u→v} x_u, i.e.
    the dominant eigenvector of A^T, via the shifted power iteration

        x_{k+1} = normalize_L2( A^T x_k + x_k )

    (the +x_k shift keeps the iteration convergent on bipartite-ish
    structure without changing the eigenvector).  Distribution is the
    HITS sweep machinery on ONE pool: each round is a routed full sweep
    of the forward CSR (per-destination pre-aggregated bincounts — hub
    fan-in cannot hotspot), an apply-shift barrier returning P local
    sum-of-squares scalars, and an O(P)-float L2 scale barrier.  Exactly
    ``max_iters`` rounds when tol=0 (the deterministic driver-oracle
    mode, matching goldens.eigenvector_golden's numpy replay); tol>0
    early-stops on the L1 delta.

    Returns ((node_id, ev) Dataset over ALL nodes, stats).
    """
    n, P = handle.n, handle.P
    handle.call_all("hits_init", "ev", 1.0 / math.sqrt(n))
    iters, delta = 0, math.inf
    while iters < max_iters:
        outs = [w.hits_sweep.options(num_returns=P).remote("ev")
                for w in handle.workers]
        ss = ray.get([
            w.hits_apply_shift.remote("ev", *[outs[p][q] for p in range(P)])
            for q, w in enumerate(handle.workers)
        ])
        total = sum(ss)
        c = 1.0 / math.sqrt(total) if total > 0 else 0.0
        delta = sum(ray.get([w.hits_scale.remote("ev", c)
                             for w in handle.workers]))
        iters += 1
        if tol > 0 and delta < tol:
            break
    tables = [w.hits_field_table.remote("ev", "ev") for w in handle.workers]
    return ray.data.from_arrow_refs(tables), {"iters": iters, "delta": delta}


def katz_centrality(handle, alpha: float = 0.01, beta: float = 1.0,
                    max_iters: int = 30):
    """Katz centrality (Katz '53), in-edge based:

        x_{k+1} = alpha * A^T x_k + beta,   x_0 = 0

    run for exactly ``max_iters`` iterations (the truncated Neumann
    series Σ_k alpha^k (A^T)^k beta — deterministic, oracle-matching),
    then L2-normalized once at the end (networkx convention).  Same
    single-pool sweep/apply shape as eigenvector_centrality; the only
    per-round barriers are the apply (P scalars) — no per-round
    normalization.  Requires alpha < 1/λ_max for the series to converge;
    with fixed iterations the result is well-defined either way.

    Returns ((node_id, katz) Dataset over ALL nodes, stats).
    """
    P = handle.P
    handle.call_all("hits_init", "katz", 0.0)
    last_ss = 0.0
    for _ in range(max_iters):
        outs = [w.hits_sweep.options(num_returns=P).remote("katz")
                for w in handle.workers]
        ss = ray.get([
            w.hits_apply_affine.remote("katz", float(alpha), float(beta),
                                       *[outs[p][q] for p in range(P)])
            for q, w in enumerate(handle.workers)
        ])
        last_ss = sum(ss)
    c = 1.0 / math.sqrt(last_ss) if last_ss > 0 else 0.0
    ray.get([w.hits_scale.remote("katz", c) for w in handle.workers])
    tables = [w.hits_field_table.remote("katz", "katz") for w in handle.workers]
    return ray.data.from_arrow_refs(tables), {"iters": max_iters}


def random_walk_corpus(handle, nwalks: int = 2, walk_len: int = 5,
                       seed: int = 42, spill_dir: str | None = None,
                       flush_rows: int = 2_000_000):
    """DeepWalk-style random-walk corpus generation (Perozzi et al.,
    KDD'14): `nwalks` fixed-length uniform walks from EVERY node, emitted
    as a (walk_id, step, node_id) trace table — the training corpus a
    skip-gram embedding stage consumes.  node2vec with p = q = 1 is this
    walk; biased p/q walks are node2vec_corpus (exact rejection
    sampling — prev's adjacency never ships with the walker).

    Distribution: the FORA walk superstep shape — each hop advances all
    pending walkers shard-locally and routes survivors to the owner of
    their next node; the receiving shard records the visit, so the trace
    is written where it lives and `corpus_table` refs assemble it with
    zero driver materialization.  A walker at a dangling node truncates
    (shorter trace, no restart).  Counter-RNG (key = mix64(seed,
    walk_id), draw = rng(mix64(key, hop))) makes the corpus identical at
    any partition count; neighbor slots index the row's neighbors in
    LOGICAL-id order (runtime._walk_dst), so the corpus is a pure
    function of the logical graph on identity AND degree-balanced
    handles — bit-identical between them, including the distributed
    permutation tier, whose CSR shards carry per-edge logical ids
    (see _require_local_perm).

    Returns (Dataset (walk_id, step, node_id), stats).  Rows total
    <= n * nwalks * walk_len; each shard buffers only its own slice —
    and with `spill_dir` set (the 100 TB path), each shard flushes its
    buffer to `spill_dir/part=<p>/rec-<seq>.parquet` every `flush_rows`
    records (atomic rename per part), so actor memory stays bounded at
    flush_rows and the returned Dataset reads the partitioned parquet
    (resumable: finished parts survive a dead driver).
    """
    _require_local_perm(handle, "random_walk_corpus")
    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    # unconditional: spill_dir=None clears any sticky config from a
    # previous spilled run on the same handle (ADVICE r03)
    handle.call_all("corpus_spill_config", spill_dir, int(flush_rows))
    spawned = sum(handle.call_all("corpus_init", int(nwalks), int(seed)))
    hops = 0
    for hop in range(1, walk_len):
        metas, _ = handle._exchange("corpus_round", "corpus_apply", hop)
        hops += 1
        if sum(m["alive"] for m in metas) == 0:
            break
    if spill_dir is not None:
        handle.call_all("corpus_spill")
        ds = ray.data.read_parquet(spill_dir).select_columns(
            ["walk_id", "step", "node_id"])  # drop the hive part= column
        return ds, {"walks": spawned, "hops": hops}
    refs = [w.corpus_table.remote() for w in handle.workers]
    return ray.data.from_arrow_refs(refs), {"walks": spawned, "hops": hops}


def node2vec_corpus(handle, nwalks: int = 2, walk_len: int = 5,
                    p: float = 1.0, q: float = 1.0, seed: int = 42,
                    spill_dir: str | None = None,
                    flush_rows: int = 2_000_000, max_attempts: int = 256,
                    attempt_batch: int = 8):
    """node2vec biased-walk corpus (Grover & Leskovec, KDD'16): `nwalks`
    second-order walks from EVERY node, where the step from cur with
    previous node prev weights each neighbor x by alpha = 1/p (x ==
    prev), 1 (x in N(prev)) or 1/q (otherwise).  Emitted as the same
    (walk_id, step, node_id) trace table random_walk_corpus produces;
    p = q = 1 is the uniform DeepWalk distribution (different RNG
    stream, same law).

    Distribution: alpha needs N(prev), which lives on prev's owner —
    never on cur's.  Instead of shipping adjacency lists with walkers
    (hub walkers would carry O(max_deg)), the step is sampled EXACTLY
    by rejection (the KnightKing scheme, Yang et al., SOSP'19): cur's
    owner proposes a uniform neighbor and an accept uniform; proposals
    route to prev's owner, which binary-searches each proposal in
    prev's logically-sorted adjacency and accepts with alpha / M
    (M = max(1/p, 1, 1/q)).  Rejected walkers retry in GLOBAL lockstep
    rounds; expected attempts per hop <= M / min(1/p, 1, 1/q) — a
    small constant for practical p, q — and every payload is O(pending
    walkers), so hub degree never inflates messages.  Each lockstep
    round draws `attempt_batch` (K) candidates per walker and resolves
    the whole batch in ONE membership exchange, accepting the FIRST
    passing candidate in counter order — bit-identical to K sequential
    rounds with ~K x fewer driver barriers (VERDICT r04 #3).  Draws
    are counter-RNG on (mix64(seed, walk_id), hop, attempt) over
    LOGICAL ids, so the corpus is bit-identical at any partition
    count, any K, and on identity / degree-balanced handles alike.

    Returns (Dataset (walk_id, step, node_id), stats).  `spill_dir`
    behaves exactly as in random_walk_corpus (per-shard parquet flush,
    bounded actor memory, resumable parts).
    """
    _require_local_perm(handle, "node2vec_corpus")
    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("node2vec p and q must be > 0")
    if attempt_batch < 1:
        raise ValueError("attempt_batch must be >= 1")
    K = int(attempt_batch)
    handle.call_all("corpus_spill_config", spill_dir, int(flush_rows))
    spawned = sum(handle.call_all(
        "n2v_init", int(nwalks), int(seed), float(p), float(q)))
    P, workers = handle.P, handle.workers
    hops = rounds_total = 0
    for hop in range(1, walk_len):
        retry = [[] for _ in range(P)]  # per-DESTINATION shard refs
        base = 0
        while True:
            outs = [
                w.n2v_propose.options(num_returns=2 * P + 1)
                .remote(hop, base, K, *retry[pi])
                for pi, w in enumerate(workers)
            ]
            metas = ray.get([o[0] for o in outs])
            ray.get([
                w.n2v_apply_moves.remote(hop, *[outs[s][1 + pd] for s in range(P)])
                for pd, w in enumerate(workers)
            ])
            n_test = sum(m["tests"] for m in metas)
            retry = [[] for _ in range(P)]
            n_retry = 0
            if n_test:
                touts = [
                    w.n2v_test.options(num_returns=2 * P + 1)
                    .remote(hop, *[outs[s][1 + P + pd] for s in range(P)])
                    for pd, w in enumerate(workers)
                ]
                tmetas = ray.get([t[0] for t in touts])
                ray.get([
                    w.n2v_apply_moves.remote(
                        hop, *[touts[s][1 + pd] for s in range(P)])
                    for pd, w in enumerate(workers)
                ])
                retry = [[touts[s][1 + P + pd] for s in range(P)]
                         for pd in range(P)]
                n_retry = sum(m["retries"] for m in tmetas)
            rounds_total += 1
            if n_retry == 0:
                break
            base += K
            if base >= max_attempts:
                raise RuntimeError(
                    f"node2vec rejection sampling did not settle within "
                    f"{max_attempts} attempts at hop {hop} (extreme p/q?)")
        hops += 1
        if sum(handle.call_all("n2v_advance")) == 0:
            break
    if spill_dir is not None:
        handle.call_all("corpus_spill")
        ds = ray.data.read_parquet(spill_dir).select_columns(
            ["walk_id", "step", "node_id"])
        return ds, {"walks": spawned, "hops": hops,
                    "attempt_rounds": rounds_total}
    refs = [w.corpus_table.remote() for w in handle.workers]
    return ray.data.from_arrow_refs(refs), {
        "walks": spawned, "hops": hops, "attempt_rounds": rounds_total}


def neighbor_sample(handle, seeds, fanouts=(10, 5), seed: int = 42):
    """GraphSAGE-style k-hop neighborhood sampling (Hamilton et al.,
    NeurIPS'17): starting from `seeds`, draw up to fanouts[h] neighbors
    per frontier node at hop h; the sampled edges form the minibatch
    subgraph a GNN trains on.

    Selection is hash-rank — the fanouts[h] smallest values of
    mix64(mix64(mix64(seed, h), src), dst) per src, keyed on LOGICAL
    ids — a fixed total order over logical (src, dst), so the sample is
    deterministic and independent of partition count AND of the handle's
    degree permutation (identity and driver-balanced handles produce
    bit-identical subgraphs; the distributed-permutation tier is
    refused).  Each hop is one parallel shard call: a shard touches only
    the adjacency of the frontier nodes it owns.  The returned subgraph
    (and therefore driver memory) is bounded by |seeds| * prod(fanouts)
    edges — the caller sizes it, exactly like a training minibatch.

    Returns (pyarrow.Table (src, dst, hop) in LOGICAL ids, stats).
    """
    import pyarrow as _pa

    _require_local_perm(handle, "neighbor_sample")
    seeds_l = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seeds_l.size and (seeds_l[0] < 0 or seeds_l[-1] >= handle.n):
        # an out-of-range seed passes the ownership filter (numpy modulo
        # is positive) and would silently sample a different node's
        # adjacency via a wrong local index (ADVICE r03)
        bad = seeds_l[(seeds_l < 0) | (seeds_l >= handle.n)]
        raise ValueError(
            f"neighbor_sample: seeds outside [0, {handle.n}): {bad[:5].tolist()}")
    frontier = handle.to_engine_array(seeds_l)  # routing is by engine id
    layers = []
    for hop, f in enumerate(fanouts):
        if frontier.size == 0:
            break
        tabs = handle.call_all("sample_neighbors", frontier, int(f),
                               int(seed), int(hop))
        tab = _pa.concat_tables([t for t in tabs if t.num_rows],
                                promote_options="none") \
            if any(t.num_rows for t in tabs) else None
        if tab is None or tab.num_rows == 0:
            frontier = np.empty(0, np.int64)
            break
        layers.append(
            tab.drop_columns(["dst_e"]).append_column(
                "hop", _pa.array(np.full(tab.num_rows, hop, np.int64))))
        frontier = np.unique(tab["dst_e"].to_numpy(zero_copy_only=False))
    if not layers:
        out = _pa.table({"src": _pa.array([], _pa.int64()),
                         "dst": _pa.array([], _pa.int64()),
                         "hop": _pa.array([], _pa.int64())})
    else:
        out = _pa.concat_tables(layers, promote_options="none")
    return out, {"edges": out.num_rows, "hops": len(layers)}


def scc(handle_fwd, handle_rev, max_outer: int = 10_000):
    """Strongly connected components via iterative min-label
    forward/backward intersection: per outer round, compute over the
    UNASSIGNED subgraph minF(v) = min id that reaches v (min-label
    fixpoint on the forward CSR, the connected_components kernel with an
    active mask) and minB(v) = min id v reaches (same fixpoint on the
    reverse CSR); every v with minF(v) == minB(v) == c joins SCC(c) —
    c reaches v and v reaches c, so membership is exact, and the SCC of
    the globally smallest unassigned id is always fully carved, which
    guarantees progress.  Real link graphs (one giant SCC + periphery)
    finish in a handful of outer rounds.

    `handle_rev` must be built from the same edges with src/dst swapped
    (`GraphHandle.from_reverse_edges`), shard-aligned and identity-
    permuted (asserted, same contract as hits/bippr) — the assigned
    masks and label slices pair local indices 1:1 between the pools.

    Label = smallest node id in the SCC (matches oracle.scc_oracle).
    Returns ((node_id, scc) Dataset over ALL nodes, stats).
    """
    P = handle_fwd.P
    if handle_rev.P != P or handle_rev.n != handle_fwd.n:
        raise ValueError("scc requires shard-aligned fwd/rev handles (same n, P)")
    # min-label values are LOGICAL ids and the assigned-mask exchange
    # pairs local indices 1:1 — valid for any shared permutation
    _require_pair(handle_fwd, handle_rev, "scc")
    handle_fwd.call_all("scc_reset")
    handle_rev.call_all("scc_reset")
    n = handle_fwd.n
    assigned = 0
    outer = inner = 0
    while assigned < n and outer < max_outer:
        for h in (handle_fwd, handle_rev):
            h.call_all("minlabel_init")
            while True:
                metas, changed = h._exchange("minlabel_round", "minlabel_apply")
                inner += 1
                if sum(changed) == 0 and sum(m["sent"] for m in metas) == 0:
                    break
        minb = [w.minlabel_get.remote() for w in handle_rev.workers]
        newly = sum(ray.get([
            fw.scc_assign.remote(mb)
            for fw, mb in zip(handle_fwd.workers, minb)
        ]))
        assigned += newly
        outer += 1
        if newly == 0:
            raise RuntimeError("scc made no progress (internal invariant broken)")
        if assigned < n:
            masks = [fw.scc_assigned_mask.remote() for fw in handle_fwd.workers]
            ray.get([rw.scc_set_assigned.remote(mk)
                     for rw, mk in zip(handle_rev.workers, masks)])
    if assigned < n:
        # a partial labeling (scc=-1 rows) must never be returned
        # silently: chain-like graphs need O(#SCCs) outer rounds, and a
        # too-small max_outer would otherwise look like a result
        # (ADVICE r03)
        raise RuntimeError(
            f"scc: max_outer={max_outer} exhausted with {n - assigned} of "
            f"{n} nodes unassigned; raise max_outer")
    refs = [w.scc_table.remote() for w in handle_fwd.workers]
    return ray.data.from_arrow_refs(refs), {"outer_rounds": outer,
                                            "label_rounds": inner,
                                            "assigned": assigned}


def harmonic_centrality(handle, pivots=None, n_pivots: int = 8,
                        seed: int = 42, max_rounds: int = 10_000,
                        lane_batch: int = 32):
    """Approximate harmonic centrality (Boldi-Vigna '14 / Eppstein-Wang
    sampling): H(v) = sum_u 1/d(u, v), estimated from `n_pivots` BFS
    sources as ((n-1)/k) * sum_pivots 1/d(p, v).  Pass the SYMMETRIZED
    handle for undirected distance.

    Pivots default to a deterministic hash sample over NON-DANGLING
    nodes (k smallest mix64(seed, id): per-shard exact top-k + driver
    merge of P*k candidates — nothing n-sized crosses the driver).
    Pivots run as K-lane BATCHED BFS waves (`lane_batch` pivots per
    wave, r5 — VERDICT r04 #2): one wave costs max-depth supersteps
    instead of sum-of-depths, cutting driver barriers ~K x; the 1/d
    fold happens shard-locally per lane in pivot order (bitwise-equal
    to the sequential fold), so the driver sees only metas.  Per-shard
    lane state is n_local/P * lane_batch * 4 bytes — lower lane_batch
    on memory-tight clusters.

    Returns (Dataset (node_id, harmonic) over ALL nodes, stats).
    Deterministic for a fixed (pivot set | seed) at ANY lane_batch.
    """
    if pivots is None:
        parts = handle.call_all("pivot_candidates", int(n_pivots), int(seed))
        ids = np.concatenate([p[0] for p in parts])
        keys = np.concatenate([p[1] for p in parts])
        if ids.size == 0:
            raise ValueError("harmonic_centrality: graph has no non-dangling nodes")
        order = np.lexsort((ids, keys))[:n_pivots]
        pivots = [int(v) for v in ids[order]]
    handle.call_all("harm_init")
    rounds_total = waves = 0
    lane_batch = max(1, int(lane_batch))
    for i in range(0, len(pivots), lane_batch):
        chunk = pivots[i:i + lane_batch]
        eng = [handle.to_engine(int(p)) for p in chunk]
        handle.call_all("msbfs_init", eng)
        rounds = 0
        while rounds < max_rounds:
            metas, changed = handle._exchange("msbfs_round", "msbfs_apply")
            rounds += 1
            if sum(changed) == 0 and sum(m["sent"] for m in metas) == 0:
                break
        rounds_total += rounds
        handle.call_all("harm_accumulate")
        waves += 1
    scale = (handle.n - 1) / max(len(pivots), 1)
    refs = [w.harm_table.remote(float(scale)) for w in handle.workers]
    return ray.data.from_arrow_refs(refs), {
        "pivots": pivots, "bfs_rounds": rounds_total, "waves": waves,
    }


def betweenness_centrality(handle, handle_rev, pivots=None,
                           n_pivots: int = 8, seed: int = 42,
                           max_rounds: int = 10_000,
                           lane_batch: int = 32):
    """Pivot-sampled betweenness centrality (Brandes '01 with the
    Brandes-Pich '07 source-sampling estimator): bc(v) ~= (n/k) *
    sum_{s in pivots} delta_s(v), where delta_s is the shortest-path
    dependency of source s.  Directed; pass the same pivots= list of
    ALL nodes for the exact (unscaled) value on small graphs.

    Pivots run as K-lane BATCHED waves of `lane_batch` (r5 — VERDICT
    r04 #2; a wave costs max-depth supersteps, not sum-of-depths):
    (1) a level-synchronous forward superstep run on the FORWARD pool
    computes per-lane dist and shortest-path counts sigma (float64 —
    counts overflow int64 on large graphs) with per-(node, lane)-cell
    pre-summed payloads; (2) (dist, sigma) hand off to the aligned
    REVERSE pool as P object-store blobs (shared permutation — shard
    p's local indices match); (3) the backward dependency pass walks
    levels deepest-first, each level one superstep pushing
    (1 + delta)/sigma along REVERSE edges, receivers accepting only
    from true shortest-path-DAG edges in the same lane (dist
    difference of exactly 1); lanes shallower than the wave's max
    depth contribute no cells at the deeper levels.  Nothing n-sized
    ever crosses the driver; per-round payloads are pre-aggregated per
    destination cell, so hub fan-in cannot hotspot.  Per-shard lane
    state is n/P * lane_batch * 28 bytes (dist + sigma + delta) —
    lower lane_batch on memory-tight clusters.

    Pivots default to the same deterministic hash sample over
    non-dangling nodes harmonic_centrality uses.  Returns
    (Dataset (node_id, betweenness) over ALL nodes, stats).
    """
    if handle_rev.P != handle.P or handle_rev.n != handle.n:
        raise ValueError(
            "betweenness_centrality requires shard-aligned fwd/rev handles "
            "(same n, P)")
    _require_pair(handle, handle_rev, "betweenness_centrality")
    if pivots is None:
        parts = handle.call_all("pivot_candidates", int(n_pivots), int(seed))
        ids = np.concatenate([p[0] for p in parts])
        keys = np.concatenate([p[1] for p in parts])
        if ids.size == 0:
            raise ValueError(
                "betweenness_centrality: graph has no non-dangling nodes")
        order = np.lexsort((ids, keys))[:n_pivots]
        pivots = [int(v) for v in ids[order]]
    handle_rev.call_all("bc_init")
    fwd_rounds = bwd_rounds = waves = 0
    lane_batch = max(1, int(lane_batch))
    for i in range(0, len(pivots), lane_batch):
        chunk = pivots[i:i + lane_batch]
        eng = [int(handle.to_engine(int(pvt))) for pvt in chunk]
        handle.call_all("bc_fwd_init", eng)
        level = 0
        while level < max_rounds:
            metas, newly = handle._exchange("bc_fwd_round", "bc_fwd_apply",
                                            level)
            if sum(newly) + sum(m["self_new"] for m in metas) == 0:
                break
            level += 1
        fwd_rounds += level + 1
        srefs = [w.bc_state.remote() for w in handle.workers]
        ray.get([rw.bc_bwd_init.remote(sref)
                 for rw, sref in zip(handle_rev.workers, srefs)])
        for lv in range(level, 0, -1):
            handle_rev._exchange("bc_bwd_round", "bc_bwd_apply", lv)
            bwd_rounds += 1
        handle_rev.call_all("bc_accumulate", eng)
        waves += 1
    scale = handle.n / max(len(pivots), 1)
    refs = [w.bc_table.remote(float(scale)) for w in handle_rev.workers]
    return ray.data.from_arrow_refs(refs), {
        "pivots": pivots, "fwd_rounds": fwd_rounds, "bwd_rounds": bwd_rounds,
        "waves": waves,
    }
