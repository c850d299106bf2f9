"""Superstep runtime: named CSR shard actors + driver-orchestrated
frontier exchange (SURVEY.md section 3.3; operators G1/G2/G9/G10/G12,
H2 frontier shuffle, section 4.3 checkpointing).

Design (why not plain ``map_batches``): frontier routing must target
the actor *owning* part(dst); an anonymous actor-pool ``map_batches``
cannot guarantee that affinity, so the runtime uses P explicit
``@ray.remote`` ShardWorker actors.  Dataset ops still do the
shuffle-heavy, stateless work (CSR build, result assembly).

Message protocol: every ``*_round`` actor method is invoked with
``num_returns=P+1`` — return slot 0 is a small metadata dict (the only
thing the driver ever ray.get()s), slots 1..P are per-destination
payloads that the driver passes BY REFERENCE to the owning actor's
apply method (Ray auto-dereferences top-level args), so frontier data
moves actor-to-actor through the object store and never lands on the
driver.  Payloads are pre-aggregated per destination vertex inside the
sender (the combiner of SURVEY 4.2) and sent sparse (ids, vals) or
dense depending on touched fraction.

Partitioning: part(v) = v % P, local(v) = v // P (see stages/csr.py).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import mix64, rng_uniform
from ..stages.csr import n_local_of

_DENSE_CUTOFF = 0.25  # send dense vector when >25% of dest shard touched


def _list_np(col: "pa.ChunkedArray | pa.Array", dtype=np.int64) -> np.ndarray:
    """Zero-copy extraction of a (single-row) large_list column into a
    flat numpy array: combine_chunks + flatten stays inside Arrow
    buffers end-to-end.  The previous ``col[0].as_py()`` materialized
    the whole list as Python objects — at 10^9 edges per shard that is
    tens of GB of PyObjects and minutes of CPU on every actor
    (re)start, resume and replica spawn (VERDICT r02 "what's wrong"
    #1).  ``flatten`` (not ``.values``) so sliced/filtered arrays
    honor their list offsets."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return np.asarray(flat.to_numpy(zero_copy_only=False), dtype=dtype)


def _sparsify(acc: np.ndarray):
    """Dense accumulator -> ('dense', arr) or ('sparse', ids, vals)."""
    nz = np.nonzero(acc)[0]
    if nz.size > _DENSE_CUTOFF * acc.size:
        return ("dense", acc)
    return ("sparse", nz.astype(np.int64), acc[nz])


class ShardWorkerImpl:
    """One graph partition: CSR + per-query numpy state, alive across
    supersteps.  Wrapped in ray.remote by GraphHandle."""

    def __init__(self, part: int, P: int, n: int, shard: pa.Table | None = None,
                 shard_file: str | None = None, alpha: float = 0.2,
                 logical_ids: np.ndarray | None = None,
                 logical_block: pa.Table | None = None,
                 perm_block: pa.Table | None = None,
                 inv_ref=None):
        self.part, self.P, self.n, self.alpha = part, P, n, alpha
        self.n_local = n_local_of(n, P, part)
        self.global_ids = np.arange(part, n, P, dtype=np.int64)
        # logical ids reported in outputs / used as CC-LPA label values.
        # Under degree-balanced partitioning (GraphHandle balance='degree')
        # engine ids are a degree-ranked permutation of logical ids; this
        # slice maps local engine rows back.  Identity when not balanced.
        # logical_block/perm_block are the distributed-balance variants:
        # one (part_id, vals) row per partition, delivered by ObjectRef so
        # the permutation never materializes on the driver.
        if logical_ids is None and logical_block is not None:
            rows = logical_block.filter(pa.compute.equal(logical_block["part_id"], part))
            logical_ids = _list_np(rows["vals"])
        self.logical_ids = (
            np.asarray(logical_ids, dtype=np.int64) if logical_ids is not None
            else self.global_ids
        )
        self.perm_slice = None  # engine ids of logical ids p, p+P, ... (lookup_engine)
        if perm_block is not None:
            rows = perm_block.filter(pa.compute.equal(perm_block["part_id"], part))
            self.perm_slice = _list_np(rows["vals"])
        # full engine->logical permutation (driver-balance tier): ONE
        # ray.put array, passed by ObjectRef and auto-dereferenced by Ray
        # into a zero-copy plasma-backed view shared by every worker —
        # what lets walk/sample draws be a pure function of the LOGICAL
        # graph under degree balancing (VERDICT r03 next #1).  None on
        # identity handles and on the distributed-permutation tier.
        self._inv = np.asarray(inv_ref) if inv_ref is not None else None
        self._wdst = None
        self._wdst_l = None
        indptr = indices = None
        if shard is None and shard_file is not None:
            shard = pq.read_table(shard_file, filters=[("part_id", "=", part)])
        self.edge_weights = None
        self.ind_logical = None  # per-edge logical dst (distributed-perm tier)
        if shard is not None and shard.num_rows:
            rows = shard.filter(pa.compute.equal(shard["part_id"], part))
            if rows.num_rows:
                indptr = _list_np(rows["indptr"])
                indices = _list_np(rows["indices"])
                if "weights" in rows.schema.names:
                    self.edge_weights = _list_np(rows["weights"], dtype=np.float64)
                if "ind_logical" in rows.schema.names:
                    self.ind_logical = _list_np(rows["ind_logical"])
        if indptr is None:
            indptr = np.zeros(self.n_local + 1, dtype=np.int64)
            indices = np.empty(0, dtype=np.int64)
        self.indptr, self.indices = indptr, indices
        self.out_deg = np.diff(indptr)
        self.reserve = self.residual = self.acc = self.labels = None
        self._pending = None  # in-flight walkers
        self.counters = {"pushes": 0, "walks": 0, "walk_hops": 0, "msgs_out": 0}

    # ---- generic helpers -------------------------------------------------
    def _gather_edges(self, idx: np.ndarray):
        """Fully vectorized ragged gather of out-edges for source rows idx.
        Returns (dsts, edge_to_row) where edge_to_row maps each edge back
        to its position in idx."""
        counts = self.out_deg[idx]
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        starts = self.indptr[idx]
        cum = np.concatenate([[0], np.cumsum(counts[:-1])])
        pos = np.arange(total, dtype=np.int64)
        row = np.repeat(np.arange(idx.size, dtype=np.int64), counts)
        eidx = np.repeat(starts, counts) + (pos - np.repeat(cum, counts))
        return self.indices[eidx], row

    def _gather_edges_idx(self, idx: np.ndarray):
        """_gather_edges variant that also returns the per-edge CSR
        positions (for gathering parallel per-edge arrays)."""
        counts = self.out_deg[idx]
        total = int(counts.sum())
        if total == 0:
            e = np.empty(0, np.int64)
            return e, e, e
        starts = self.indptr[idx]
        cum = np.concatenate([[0], np.cumsum(counts[:-1])])
        pos = np.arange(total, dtype=np.int64)
        row = np.repeat(np.arange(idx.size, dtype=np.int64), counts)
        eidx = np.repeat(starts, counts) + (pos - np.repeat(cum, counts))
        return self.indices[eidx], row, eidx

    def _logical_dst(self) -> np.ndarray | None:
        """Per-edge LOGICAL dst ids aligned with self.indices, or None
        on identity handles.  Sources, in order: the ind_logical column
        carried through the distributed CSR build (no O(n) array
        anywhere), or the driver-perm inverse array (inv[indices],
        cached)."""
        if self.ind_logical is not None:
            return self.ind_logical
        if self._inv is None:
            return None
        if getattr(self, "_ind_l_cache", None) is None:
            self._ind_l_cache = self._inv[self.indices]
        return self._ind_l_cache

    def _walk_dst(self) -> np.ndarray:
        """Per-row neighbor array in LOGICAL-id order — the array walk /
        corpus / index / sample draws index with their CSR slot.  CSR
        rows are built sorted by engine dst (stages/csr.py lexsort), so
        on identity handles this IS ``self.indices`` (alias, zero cost)
        and behavior is bit-identical to before.  Under a degree
        permutation (driver OR distributed tier) the rows are re-sorted
        by logical dst once (lazy, one lexsort of the shard), making
        every neighbor draw a pure function of the logical graph —
        balanced and identity handles produce bit-identical walks for
        the same seed."""
        if self._wdst is None:
            lg = self._logical_dst()
            if lg is None:
                self._wdst = self.indices
                self._wdst_l = self.indices  # logical == engine
            else:
                edge_row = np.repeat(
                    np.arange(self.n_local, dtype=np.int64), self.out_deg)
                order = np.lexsort((lg, edge_row))
                self._wdst = self.indices[order]
                self._wdst_l = lg[order]
        return self._wdst

    def _walk_dst_logical(self) -> np.ndarray:
        """Per-row neighbor LOGICAL ids, sorted ascending within each
        row (same order as _walk_dst) — i.e. each row's slice is a
        sorted set, which the node2vec membership test binary-searches.
        On identity handles this aliases ``self.indices``."""
        self._walk_dst()
        return self._wdst_l

    def _row_member(self, loc: np.ndarray, x_l: np.ndarray) -> np.ndarray:
        """Vectorized ragged membership: for each (local row loc[i],
        logical id x_l[i]) return whether x_l[i] is an out-neighbor of
        the row.  Each row's slice of _walk_dst_logical is sorted, so a
        lockstep binary search over all queries costs O(log max_deg)
        vectorized passes — no per-row Python loop."""
        wl = self._walk_dst_logical()
        lo = self.indptr[loc].copy()
        hi = lo + self.out_deg[loc]
        end = hi - 1
        while True:
            open_m = lo < hi
            if not open_m.any():
                break
            mid = (lo + hi) // 2
            v = wl[np.minimum(mid, np.maximum(end, 0))]
            go_right = open_m & (v < x_l)
            lo = np.where(go_right, mid + 1, lo)
            hi = np.where(open_m & ~go_right, mid, hi)
        deg = self.out_deg[loc]
        valid = (deg > 0) & (lo < self.indptr[loc] + deg)
        found = np.zeros(loc.size, dtype=bool)
        if valid.any():
            found[valid] = wl[lo[valid]] == x_l[valid]
        return found

    def _route_add(self, dst: np.ndarray, vals: np.ndarray, apply_local_sparse):
        """Sum-aggregate (dst, vals) per destination partition; apply own
        slice locally via apply_local_sparse(ids, vals); return (payload
        slots, mass sent to remote parts).  Aggregation is compact
        (unique touched rows) — a dense n_local accumulator per peer per
        round was the dominant memory traffic for sparse frontiers."""
        payloads = [None] * self.P
        remote_mass = 0.0
        owner = (dst % self.P).astype(np.int64)
        for p in np.unique(owner):
            m = owner == p
            d_loc = dst[m] // self.P
            nl = n_local_of(self.n, self.P, int(p))
            if d_loc.size > nl // 4:
                # dense frontier: direct bincount (O(E)) beats the
                # unique-sort compaction (O(E log E)) — this is the
                # PageRank / full-sweep regime
                acc = np.bincount(d_loc, weights=vals[m], minlength=nl)
                if p == self.part:
                    nz = np.nonzero(acc)[0]
                    apply_local_sparse(nz, acc[nz])
                else:
                    payloads[int(p)] = _sparsify(acc)
                    remote_mass += float(acc.sum())
                    self.counters["msgs_out"] += 1
            else:
                # sparse frontier: compact on the touched rows only
                uk, inv = np.unique(d_loc, return_inverse=True)
                acc = np.bincount(inv, weights=vals[m])
                if p == self.part:
                    apply_local_sparse(uk, acc)
                else:
                    payloads[int(p)] = ("sparse", uk.astype(np.int64), acc)
                    remote_mass += float(acc.sum())
                    self.counters["msgs_out"] += 1
        return payloads, remote_mass

    def _add_payload(self, target: np.ndarray, payload):
        if payload is None:
            return
        if payload[0] == "dense":
            target += payload[1]
        else:
            np.add.at(target, payload[1], payload[2])

    def rsum(self) -> float:
        return float(self.residual.sum()) if self.residual is not None else 0.0

    def edge_count(self) -> int:
        """This shard's edge mass (skew diagnostics, A6 convention)."""
        return int(self.indices.size)

    def get_counters(self):
        return dict(self.counters)

    # ---- PPR / PageRank: init -------------------------------------------
    def ppr_init(self, source: int | None):
        """source=None -> uniform (PageRank); else single-source e_s."""
        self.reserve = np.zeros(self.n_local)
        self.residual = np.zeros(self.n_local)
        self.acc = np.zeros(self.n_local)
        self._hub_term = []
        if source is None:
            self.residual[:] = 1.0 / self.n
        elif source % self.P == self.part:
            self.residual[source // self.P] = 1.0
        self.counters = {k: 0 for k in self.counters}
        return True

    def add_uniform_residual(self, mass_total: float):
        """Uniform redistribution of dangling mass (PageRank mode)."""
        self.residual += mass_total / self.n
        return True

    def add_source_residual(self, source: int, mass: float):
        if source % self.P == self.part:
            self.residual[source // self.P] += mass
        return True

    # ---- G1 Forward Push -------------------------------------------------
    def _ensure_sweep_cache(self):
        """Static per-edge routing structure for full sweeps: which local
        source row each edge belongs to, pre-split by destination part.
        Computed once; turns a power-iteration round into one gather +
        one bincount per peer (no per-round index construction)."""
        if getattr(self, "_sweep_cache", None) is not None:
            return
        edge_row = np.repeat(np.arange(self.n_local, dtype=np.int64), self.out_deg)
        owner = (self.indices % self.P).astype(np.int64)
        cache = {}
        for p in range(self.P):
            m = owner == p
            if m.any():
                cache[p] = (edge_row[m], (self.indices[m] // self.P).astype(np.int64))
        self._sweep_cache = cache

    def warm_sweep_cache(self):
        """Prewarm hook (see GraphHandle.from_edges prewarm=True)."""
        self._ensure_sweep_cache()
        return True

    def warm_walk_order(self):
        """Prewarm the logical-order walk array (one lexsort of the
        shard under a degree permutation; free on identity handles) so
        the first walk/corpus/sample round doesn't pay it inline."""
        self._walk_dst()
        return True

    def _push_full_sweep(self):
        """Vectorized full sweep (exact/PageRank mode): every vertex's
        residual pushed in one shot over the cached edge structure."""
        self._ensure_sweep_cache()
        r = self.residual
        nz = int(np.count_nonzero(r))
        meta = {"active": nz, "dangling": 0.0, "drained": float(r.sum()), "sent_mass": 0.0}
        if nz == 0:
            return tuple([meta] + [None] * self.P)
        self.reserve += self.alpha * r
        outflow = (1.0 - self.alpha) * r
        d = self.out_deg
        dangling = float(outflow[d == 0].sum())
        meta["dangling"] = dangling
        rates = np.where(d > 0, outflow / np.maximum(d, 1), 0.0)
        self.counters["pushes"] += nz
        r[:] = 0.0
        payloads = [None] * self.P
        sent = 0.0
        local_acc = None
        for p, (erow, dloc) in self._sweep_cache.items():
            nl = n_local_of(self.n, self.P, int(p))
            acc = np.bincount(dloc, weights=rates[erow], minlength=nl)
            if p == self.part:
                local_acc = acc
            else:
                payloads[int(p)] = _sparsify(acc)
                sent += float(acc.sum())
                self.counters["msgs_out"] += 1
        if local_acc is not None:
            r += local_acc
        meta["sent_mass"] = sent
        return tuple([meta] + payloads)

    def push_round(self, rmax: float, sweep_all: bool):
        """One synchronous push superstep (SURVEY G1, paper Alg.1).

        active: r(v) > rmax * out_deg(v) (dangling: r(v) > rmax); or all
        nonzero when sweep_all (exact/convergence mode == power iteration,
        specialized static-structure path).
        Returns (meta, payload_0..payload_{P-1}).
        """
        r = self.residual
        if sweep_all:
            return self._push_full_sweep()
        idx = np.nonzero(r > rmax * np.maximum(self.out_deg, 1))[0]
        meta = {"active": int(idx.size), "dangling": 0.0, "drained": 0.0}
        if idx.size == 0:
            return tuple([meta] + [None] * self.P)
        ra = r[idx].copy()
        self.reserve[idx] += self.alpha * ra
        r[idx] = 0.0
        outflow = (1.0 - self.alpha) * ra
        d = self.out_deg[idx]
        dang = float(outflow[d == 0].sum())
        meta["dangling"] = dang
        meta["drained"] = float(ra.sum())
        self.counters["pushes"] += int(idx.size)
        has = np.nonzero(d > 0)[0]
        payloads = [None] * self.P
        if has.size:
            dsts, row = self._gather_edges(idx[has])
            per_edge = (outflow[has] / d[has])[row]
            payloads, remote_mass = self._route_add(
                dsts, per_edge, lambda ids, v: np.add.at(self.residual, ids, v)
            )
            meta["sent_mass"] = remote_mass
        return tuple([meta] + payloads)

    def apply_residual(self, *payloads):
        for pl in payloads:
            self._add_payload(self.residual, pl)
        return float(self.residual.sum())

    def push_round2(self, rmax: float, sweep_all: bool, source, dang_in: float, *payloads):
        """Combined superstep: apply the previous round's incoming
        residual payloads + dangling redistribution, THEN push.  One
        actor call (and one driver barrier) per round instead of three
        (push / apply / dangling) — halves superstep latency."""
        for pl in payloads:
            self._add_payload(self.residual, pl)
        if dang_in:
            if source is None:
                self.residual += dang_in / self.n
            elif source % self.P == self.part:
                self.residual[source // self.P] += dang_in
        out = self.push_round(rmax, sweep_all)
        meta = out[0]
        # convergence mass = local residual + mass in flight to peers
        meta["rsum"] = float(self.residual.sum()) + meta.get("sent_mass", 0.0)
        return out

    # ---- G2 Monte-Carlo walk phase ----------------------------------------
    def walk_init(self, omega: float, seed: int, from_reserve_clear: bool = False):
        """Spawn ceil(residual[v] * omega) walkers per residual vertex, each
        carrying weight residual[v]/omega_v (paper Alg.3).  Residuals are
        consumed.  Counter-based RNG: key = mix64(seed, v, k) — identical
        results at any parallelism."""
        r = self.residual
        idx = np.nonzero(r > 0)[0]
        if idx.size == 0:
            self._pending = None
            return 0
        omega_v = np.ceil(r[idx] * omega).astype(np.int64)
        wt = np.repeat(r[idx] / omega_v, omega_v)
        cur = np.repeat(self.global_ids[idx], omega_v)
        total = int(omega_v.sum())
        cum = np.concatenate([[0], np.cumsum(omega_v[:-1])])
        k_in_origin = np.arange(total, dtype=np.int64) - np.repeat(cum, omega_v)
        # keys derive from LOGICAL origin ids (== engine on identity
        # handles, so bit-identical to before): walks become a pure
        # function of the logical graph under degree balancing
        lg = np.repeat(self.logical_ids[idx], omega_v)
        wkey = mix64(np.uint64(seed), mix64(lg.astype(np.uint64), k_in_origin.astype(np.uint64)))
        self._pending = (cur, wt, wkey)
        r[idx] = 0.0
        self.counters["walks"] += total
        return total

    def walk_round(self, hop: int, source: int | None, use_hubs: bool = False):
        """Advance all pending walkers one hop.  Terminating walkers add
        their weight to the local accumulator; survivors are routed to
        the owner of their next node.  Walk payloads are (cur, wt, key)
        triples (not aggregatable — each walker has its own RNG stream).

        use_hubs (G6 HubPPR): before the stop draw, a walker sitting at a
        local hub with a stored endpoint pool terminates by drawing a
        pool slot from its own key (stream key^0x4855B, counter=hop) —
        the stored walk includes its own hop-0 stop draw at the hub, so
        substitution is exactly an alpha-walk future.  Endpoint weights
        are buffered and routed by hub_term_exchange after the loop."""
        meta = {"alive": 0}
        if self._pending is None:
            return tuple([meta] + [None] * self.P)
        cur, wt, wkey = self._pending
        self._pending = None
        loc = cur // self.P
        if use_hubs and getattr(self, "hub_indptr", None) is not None:
            pool = self.hub_indptr[loc + 1] - self.hub_indptr[loc]
            hit = pool > 0
            if hit.any():
                slot = (
                    mix64(wkey[hit] ^ np.uint64(0x4855B),
                          np.full(int(hit.sum()), np.uint64(hop), np.uint64))
                    % pool[hit].astype(np.uint64)
                ).astype(np.int64)
                ep = self.hub_endpoints[self.hub_indptr[loc[hit]] + slot]
                if getattr(self, "_hub_term", None) is None:
                    self._hub_term = []
                self._hub_term.append((ep, wt[hit].copy()))
                self.counters["hub_hits"] = self.counters.get("hub_hits", 0) + int(hit.sum())
                keep = ~hit
                cur, wt, wkey, loc = cur[keep], wt[keep], wkey[keep], loc[keep]
                if cur.size == 0:
                    return tuple([meta] + [None] * self.P)
        h = np.uint64(2 * hop)
        stop = rng_uniform(mix64(wkey, np.full(len(wkey), h, np.uint64))) < self.alpha
        if stop.any():
            np.add.at(self.acc, loc[stop], wt[stop])
        alive = ~stop
        cur, wt, wkey, loc = cur[alive], wt[alive], wkey[alive], loc[alive]
        self.counters["walk_hops"] += int(alive.sum())
        if cur.size == 0:
            return tuple([meta] + [None] * self.P)
        d = self.out_deg[loc]
        dang = d == 0
        nxt = np.empty_like(cur)
        if dang.any():
            # dangling: walk restarts at the source (SURVEY 2.4 convention);
            # source=-1: absorb at the dangling node (BiPPR self-loop
            # convention — the walk terminates here with prob 1);
            # source=None (PageRank): teleport to a uniform random node.
            if source == -1:
                np.add.at(self.acc, loc[dang], wt[dang])
                cur, wt, wkey, loc, d = (
                    cur[~dang], wt[~dang], wkey[~dang], loc[~dang], d[~dang]
                )
                meta["alive"] = int(cur.size)
                dang = np.zeros(cur.size, dtype=bool)
                nxt = np.empty_like(cur)
                if cur.size == 0:
                    return tuple([meta] + [None] * self.P)
            elif source is not None:
                nxt[dang] = source
            else:
                u = rng_uniform(mix64(wkey[dang], np.full(int(dang.sum()), np.uint64(2 * hop + 1), np.uint64)))
                nxt[dang] = np.minimum((u * self.n).astype(np.int64), self.n - 1)
        ok = ~dang
        if ok.any():
            u2 = rng_uniform(mix64(wkey[ok], np.full(int(ok.sum()), np.uint64(2 * hop + 1), np.uint64)))
            choice = np.minimum((u2 * d[ok]).astype(np.int64), d[ok] - 1)
            nxt[ok] = self._walk_dst()[self.indptr[loc[ok]] + choice]
        meta["alive"] = int(cur.size)
        # route walkers by owner of next node
        payloads = [None] * self.P
        owner = nxt % self.P
        for p in np.unique(owner):
            m = owner == p
            pl = (nxt[m], wt[m], wkey[m])
            if p == self.part:
                self._append_walkers(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def _append_walkers(self, pl):
        if pl is None:
            return
        if self._pending is None:
            self._pending = pl
        else:
            self._pending = tuple(np.concatenate([a, b]) for a, b in zip(self._pending, pl))

    def apply_walkers(self, *payloads):
        for pl in payloads:
            self._append_walkers(pl)
        return True

    def walk_fold(self):
        """Fold walk accumulator into reserve -> final estimate."""
        self.reserve += self.acc
        self.acc[:] = 0.0
        return True

    # ---- G7 top-k state reuse (paper Alg.4/5 shape; VERDICT r03 #3) -------
    def residual_snapshot(self):
        """Copy the residual before a walk phase consumes it, so a
        non-converged top-k trial can RESUME pushing from the same
        state at the next (tighter) rmax instead of replaying the whole
        push from the source."""
        self._rsnap = self.residual.copy()
        return True

    def residual_restore(self):
        self.residual = self._rsnap
        self._rsnap = None
        return True

    def clear_acc(self):
        """Reset the walk accumulator between top-k trials (each trial
        re-runs its walks at the new omega from the restored residual)."""
        self.acc[:] = 0.0
        return True

    def get_scores_est(self, nonzero_only: bool = True) -> pa.Table:
        """reserve + acc WITHOUT folding — the top-k trial estimate,
        leaving reserve clean for further incremental pushes."""
        vals = self.reserve + self.acc
        if nonzero_only:
            nz = np.nonzero(vals)[0]
            return pa.table(
                {"node_id": pa.array(self.logical_ids[nz]), "ppr": pa.array(vals[nz])}
            )
        return pa.table({"node_id": pa.array(self.logical_ids), "ppr": pa.array(vals)})

    # ---- random-walk corpus generation (DeepWalk-style training data) -----
    def corpus_init(self, nwalks: int, seed: int):
        """Spawn `nwalks` fixed-length walkers at every local node.
        walk_id = logical_src * nwalks + k (dense logical ids make this
        globally unique and deterministic); walker RNG key =
        mix64(seed, walk_id) — identical at any partition count.  Step-0
        records are written immediately; later steps are recorded by the
        shard that RECEIVES the walker (it owns the node's logical id)."""
        nl = self.n_local
        self._crec: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._crec_rows = 0
        self._cpending = None
        if nl == 0 or nwalks <= 0:
            return 0
        wid = np.repeat(self.logical_ids * nwalks, nwalks) \
            + np.tile(np.arange(nwalks, dtype=np.int64), nl)
        key = mix64(np.uint64(seed), wid.astype(np.uint64))
        cur = np.repeat(self.global_ids, nwalks)
        self._crec.append((wid, np.zeros(wid.size, np.int64),
                           np.repeat(self.logical_ids, nwalks)))
        self._crec_rows = int(wid.size)
        if getattr(self, "_cspill_dir", None) is not None \
                and self._crec_rows >= self._cspill_rows:
            self.corpus_spill()
        self._cpending = (cur, wid, key)
        return int(wid.size)

    def corpus_round(self, hop: int):
        """Advance pending corpus walkers one uniform hop.  A walker at a
        node with out_deg == 0 truncates (its walk simply ends — shorter
        trace, no restart).  Draw: u = rng(mix64(key, hop)); neighbor =
        slot floor(u*d) of the row's neighbors in LOGICAL-id order
        (_walk_dst), so the trace is a pure function of the logical
        graph under identity and driver-balanced permutations alike."""
        meta = {"alive": 0}
        if getattr(self, "_cpending", None) is None:
            return tuple([meta] + [None] * self.P)
        cur, wid, key = self._cpending
        self._cpending = None
        loc = cur // self.P
        d = self.out_deg[loc]
        alive = d > 0
        if not alive.any():
            return tuple([meta] + [None] * self.P)
        cur, wid, key, loc, d = cur[alive], wid[alive], key[alive], loc[alive], d[alive]
        u = rng_uniform(mix64(key, np.full(key.size, np.uint64(hop), np.uint64)))
        choice = np.minimum((u * d).astype(np.int64), d - 1)
        nxt = self._walk_dst()[self.indptr[loc] + choice]
        meta["alive"] = int(nxt.size)
        self.counters["walk_hops"] += int(nxt.size)
        payloads = [None] * self.P
        owner = nxt % self.P
        for p in np.unique(owner):
            m = owner == p
            pl = (int(hop), nxt[m], wid[m], key[m])
            if p == self.part:
                self._corpus_append(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def _corpus_append(self, pl):
        if pl is None:
            return
        hop, nxt, wid, key = pl
        self._crec.append((wid, np.full(wid.size, hop, np.int64),
                           self.logical_ids[nxt // self.P]))
        self._crec_rows += wid.size
        if getattr(self, "_cspill_dir", None) is not None \
                and self._crec_rows >= self._cspill_rows:
            self.corpus_spill()
        if self._cpending is None:
            self._cpending = (nxt, wid, key)
        else:
            self._cpending = tuple(
                np.concatenate([a, b]) for a, b in zip(self._cpending, (nxt, wid, key))
            )

    def corpus_spill_config(self, spill_dir: str | None, flush_rows: int):
        """Scale path: flush this shard's record buffer to partitioned
        parquet (one directory per shard, one part file per flush) so
        the trace of a 10^9-node corpus never accumulates in actor
        memory and a consumer can resume from finished parts.

        spill_dir=None CLEARS the config — random_walk_corpus calls this
        unconditionally, so a non-spill run on a handle that previously
        spilled can't silently flush to the stale directory (ADVICE r03)."""
        import os

        if spill_dir is None:
            self._cspill_dir = None
            self._cspill_rows = 0
            self._cspill_seq = 0
            return True
        self._cspill_dir = os.path.join(spill_dir, f"part={self.part}")
        os.makedirs(self._cspill_dir, exist_ok=True)
        self._cspill_rows = int(flush_rows)
        self._cspill_seq = 0
        return True

    def corpus_spill(self) -> int:
        import os

        if not self._crec:
            return 0
        t = pa.table({
            "walk_id": pa.array(np.concatenate([r[0] for r in self._crec])),
            "step": pa.array(np.concatenate([r[1] for r in self._crec])),
            "node_id": pa.array(np.concatenate([r[2] for r in self._crec])),
        })
        self._crec, self._crec_rows = [], 0
        path = os.path.join(self._cspill_dir, f"rec-{self._cspill_seq:05d}.parquet")
        self._cspill_seq += 1
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic: a reader never sees a torn part
        return t.num_rows

    def corpus_apply(self, *payloads):
        for pl in payloads:
            self._corpus_append(pl)
        return True

    def corpus_table(self) -> pa.Table:
        """Emit and clear this shard's walk records.  Per-shard buffer is
        bounded by the walker-steps that LAND here — i.e. this shard's
        slice of the output corpus itself (nwalks * n * walk_len rows
        total across shards), so memory is proportional to the shard's
        own output, never the global corpus."""
        recs = getattr(self, "_crec", [])
        self._crec, self._cpending = [], None
        if not recs:
            return pa.table({"walk_id": pa.array([], pa.int64()),
                             "step": pa.array([], pa.int64()),
                             "node_id": pa.array([], pa.int64())})
        return pa.table({
            "walk_id": pa.array(np.concatenate([r[0] for r in recs])),
            "step": pa.array(np.concatenate([r[1] for r in recs])),
            "node_id": pa.array(np.concatenate([r[2] for r in recs])),
        })

    # ---- GNN neighborhood sampling (GraphSAGE-style fan-out) --------------
    def sample_neighbors(self, frontier: np.ndarray, fanout: int,
                         seed: int, hop: int) -> pa.Table:
        """Deterministic up-to-`fanout` neighbor sample for the frontier
        nodes this shard owns (ENGINE ids in, table out).  Selection =
        the `fanout` smallest values of mix64(mix64(seed_hop, src_l),
        dst_l) per src, keyed on LOGICAL ids — a fixed total order over
        logical (src, dst), so the sample is independent of partition
        count, batch order, fanout history AND the handle's degree
        permutation (logical == engine on identity handles, so output is
        bit-identical to before).  Returned columns: (src, dst) logical
        pairs plus dst_e, the engine id the driver routes the next hop's
        frontier with.  One ragged gather + one lexsort per call; never
        materializes non-sampled edges beyond this shard's frontier
        adjacency."""
        src = np.asarray(frontier, dtype=np.int64)
        src = src[src % self.P == self.part]
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "dst_e": pa.array([], pa.int64())})
        if src.size == 0:
            return empty
        loc = src // self.P
        dsts, row, eidx = self._gather_edges_idx(loc)
        if dsts.size == 0:
            return empty
        src_l = self.logical_ids[loc]
        lg = self._logical_dst()
        dst_l = lg[eidx] if lg is not None else dsts
        seed_hop = mix64(np.uint64(seed), np.uint64(hop))
        keys = mix64(mix64(np.full(dsts.size, seed_hop, np.uint64),
                           src_l[row].astype(np.uint64)),
                     dst_l.astype(np.uint64))
        order = np.lexsort((keys, row))
        r_sorted = row[order]
        counts = np.bincount(row, minlength=loc.size)
        starts = np.concatenate([[0], np.cumsum(counts[:-1])])
        pos_in_row = np.arange(dsts.size, dtype=np.int64) - starts[r_sorted]
        keep = order[pos_in_row < fanout]
        return pa.table({"src": pa.array(src_l[row[keep]]),
                         "dst": pa.array(dst_l[keep]),
                         "dst_e": pa.array(dsts[keep])})

    # ---- node2vec biased walks (exact rejection sampling) -----------------
    def n2v_init(self, nwalks: int, seed: int, p: float, q: float):
        """Spawn `nwalks` node2vec walkers at every local node (same
        walk_id / key scheme as corpus_init; step-0 records written
        here).  Transition weights (Grover & Leskovec, KDD'16):
        alpha = 1/p if dst == prev, 1 if dst in N(prev), 1/q otherwise —
        sampled EXACTLY by rejection (the KnightKing scheme, Yang et
        al., SOSP'19): propose uniform from N(cur), accept with
        alpha / M, M = max(1/p, 1, 1/q).  Every draw is counter-RNG on
        (key, hop, attempt) with a GLOBAL lockstep attempt counter, so
        the corpus is a pure function of the logical graph — identical
        at any partition count and under any local degree permutation."""
        nl = self.n_local
        self._crec = []
        self._crec_rows = 0
        self._cpending = None
        self._n2v_invp = 1.0 / float(p)
        self._n2v_invq = 1.0 / float(q)
        self._n2v_m = max(self._n2v_invp, 1.0, self._n2v_invq)
        self._n2v_pending = None
        self._n2v_next = None
        if nl == 0 or nwalks <= 0:
            return 0
        wid = np.repeat(self.logical_ids * nwalks, nwalks) \
            + np.tile(np.arange(nwalks, dtype=np.int64), nl)
        key = mix64(np.uint64(seed), wid.astype(np.uint64))
        cur = np.repeat(self.global_ids, nwalks)
        self._crec.append((wid, np.zeros(wid.size, np.int64),
                           np.repeat(self.logical_ids, nwalks)))
        self._crec_rows = int(wid.size)
        if getattr(self, "_cspill_dir", None) is not None \
                and self._crec_rows >= self._cspill_rows:
            self.corpus_spill()
        prev = np.full(wid.size, -1, np.int64)  # hop 1 has no prev: uniform
        self._n2v_pending = (cur, prev, prev.copy(), wid, key)
        return int(wid.size)

    @staticmethod
    def _n2v_cat(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return tuple(np.concatenate([x, y]) for x, y in zip(a, b))

    def _n2v_record(self, hop: int, pl):
        """Accepted move lands here (this shard owns the new node):
        record the visit and queue the walker for the NEXT hop with
        prev = the node it came from."""
        if pl is None:
            return True
        x_e, pl_l, pe, wid, key = pl
        self._crec.append((wid, np.full(wid.size, hop, np.int64),
                           self.logical_ids[x_e // self.P]))
        self._crec_rows += int(wid.size)
        if getattr(self, "_cspill_dir", None) is not None \
                and self._crec_rows >= self._cspill_rows:
            self.corpus_spill()
        self._n2v_next = self._n2v_cat(self._n2v_next, (x_e, pl_l, pe, wid, key))
        return True

    def n2v_propose(self, hop: int, base: int, K: int, *retry_payloads):
        """Phase A of one rejection round, K candidates per walker (r5
        attempt batching — VERDICT r04 #3): each pending walker draws K
        uniform (proposal, accept) pairs from its current node's
        adjacency at counter attempts base..base+K-1.  Hop-1 walkers
        (prev < 0) accept their first candidate unconditionally; every
        other walker ships ALL K candidates to PREV's owner, which
        resolves the whole batch in ONE membership round (n2v_test) and
        accepts the first passing candidate in counter order — bit-
        identical to the K=1 sequential protocol, with ~K x fewer
        barriers.  Returns meta + P move payloads + P test payloads."""
        meta = {"tests": 0, "moved": 0}
        pend = self._n2v_pending
        self._n2v_pending = None
        for pl in retry_payloads:
            pend = self._n2v_cat(pend, pl)
        if pend is None or pend[0].size == 0:
            return tuple([meta] + [None] * (2 * self.P))
        cur, prev_l, prev_e, wid, key = pend
        loc = cur // self.P
        d = self.out_deg[loc]
        alive = d > 0  # walkers at dangling nodes truncate
        if not alive.any():
            return tuple([meta] + [None] * (2 * self.P))
        cur, prev_l, prev_e, wid, key, loc, d = (
            cur[alive], prev_l[alive], prev_e[alive], wid[alive],
            key[alive], loc[alive], d[alive])
        n = cur.size
        hkey = mix64(key, np.full(n, np.uint64(hop), np.uint64))
        # counters 2t / 2t+1 for t = base..base+K-1 — the SAME stream
        # the sequential protocol consumed one attempt at a time
        t2 = np.uint64(2) * (np.uint64(base) + np.arange(K, dtype=np.uint64))
        u_prop = rng_uniform(mix64(hkey[:, None],
                                   np.broadcast_to(t2, (n, K))))
        u_acc = rng_uniform(mix64(hkey[:, None],
                                  np.broadcast_to(t2 + np.uint64(1),
                                                  (n, K))))
        slot = self.indptr[loc][:, None] + np.minimum(
            (u_prop * d[:, None]).astype(np.int64), (d - 1)[:, None])
        x_e = self._walk_dst()[slot]
        x_l = self._walk_dst_logical()[slot]
        cur_l = self.logical_ids[loc]
        first = prev_l < 0
        move_pl = [None] * self.P
        test_pl = [None] * self.P
        if first.any():
            mv = (x_e[first, 0], cur_l[first], cur[first],
                  wid[first], key[first])
            owner = mv[0] % self.P
            for pp in np.unique(owner):
                m = owner == pp
                pl = tuple(a[m] for a in mv)
                if pp == self.part:
                    self._n2v_record(hop, pl)
                else:
                    move_pl[int(pp)] = pl
            meta["moved"] = int(first.sum())
        test = ~first
        if test.any():
            tv = (cur[test], cur_l[test], prev_e[test], x_e[test],
                  x_l[test], u_acc[test], wid[test], key[test])
            owner = tv[2] % self.P
            for pp in np.unique(owner):
                m = owner == pp
                test_pl[int(pp)] = tuple(a[m] for a in tv)
            meta["tests"] = int(test.sum())
        return tuple([meta] + move_pl + test_pl)

    def n2v_test(self, hop: int, *payloads):
        """Phase B at prev's owner, batched: for each walker's K ordered
        candidates, alpha = 1/p if the candidate IS prev, 1 if it is an
        out-neighbor of prev (ragged binary search over the row's
        logically-sorted adjacency), 1/q otherwise; candidate j accepts
        iff u_j < alpha_j / M, and the walker takes the FIRST accepting
        candidate in counter order (exactly what K sequential rounds
        would have chosen).  Accepted walkers route to the winning
        candidate's owner (move); walkers with no accepting candidate
        route back to cur's owner for the next K-attempt batch."""
        meta = {"retries": 0, "moved": 0}
        pend = None
        for pl in payloads:
            pend = self._n2v_cat(pend, pl)
        if pend is None or pend[0].size == 0:
            return tuple([meta] + [None] * (2 * self.P))
        cur, cur_l, prev_e, x_e, x_l, u_acc, wid, key = pend
        n, K = x_l.shape
        loc = prev_e // self.P
        prev_ll = self.logical_ids[loc]
        found = self._row_member(np.repeat(loc, K),
                                 x_l.ravel()).reshape(n, K)
        is_back = x_l == prev_ll[:, None]
        alpha = np.where(is_back, self._n2v_invp,
                         np.where(found, 1.0, self._n2v_invq))
        acc = u_acc < alpha / self._n2v_m
        hit = acc.any(axis=1)
        move_pl = [None] * self.P
        retry_pl = [None] * self.P
        if hit.any():
            win = np.argmax(acc[hit], axis=1)
            mv = (x_e[hit][np.arange(win.size), win], cur_l[hit],
                  cur[hit], wid[hit], key[hit])
            owner = mv[0] % self.P
            for pp in np.unique(owner):
                m = owner == pp
                pl = tuple(a[m] for a in mv)
                if pp == self.part:
                    self._n2v_record(hop, pl)
                else:
                    move_pl[int(pp)] = pl
            meta["moved"] = int(hit.sum())
        rej = ~hit
        if rej.any():
            rv = (cur[rej], prev_ll[rej], prev_e[rej], wid[rej], key[rej])
            owner = rv[0] % self.P
            for pp in np.unique(owner):
                m = owner == pp
                retry_pl[int(pp)] = tuple(a[m] for a in rv)
            meta["retries"] = int(rej.sum())
        return tuple([meta] + move_pl + retry_pl)

    def n2v_apply_moves(self, hop: int, *payloads):
        for pl in payloads:
            self._n2v_record(hop, pl)
        return True

    def n2v_advance(self) -> int:
        """End of hop: promote walkers that moved this hop to pending."""
        self._n2v_pending = self._n2v_next
        self._n2v_next = None
        return 0 if self._n2v_pending is None else int(self._n2v_pending[0].size)

    # ---- G5 backward push (BiPPR; weighted reverse CSR) -------------------
    def bpush_round(self, rmax: float, sweep_all: bool):
        """One backward-push superstep over the weighted reverse graph:
        active v pushes (1-alpha)*r(v)*w_e along each reverse edge (w_e =
        1/out_deg of the original source).  No dangling redistribution —
        backward push conserves the invariant
        pi(s,t) = reserve(s) + sum_v r(v) pi(s,v), not total mass."""
        r = self.residual
        if sweep_all:
            idx = np.nonzero(r)[0]
        else:
            idx = np.nonzero(r > rmax)[0]
        meta = {"active": int(idx.size), "dangling": 0.0, "drained": float(r[idx].sum()) if idx.size else 0.0}
        if idx.size == 0:
            meta["rsum"] = float(r.sum())
            return tuple([meta] + [None] * self.P)
        ra = r[idx].copy()
        self.reserve[idx] += self.alpha * ra
        r[idx] = 0.0
        self.counters["pushes"] += int(idx.size)
        payloads = [None] * self.P
        counts = self.out_deg[idx]
        if counts.sum():
            dsts, row = self._gather_edges(idx)
            starts = self.indptr[idx]
            cum = np.concatenate([[0], np.cumsum(counts[:-1])])
            pos = np.arange(int(counts.sum()), dtype=np.int64)
            eidx = np.repeat(starts, counts) + (pos - np.repeat(cum, counts))
            w = self.edge_weights[eidx]
            per_edge = (1.0 - self.alpha) * ra[row] * w
            payloads, sent = self._route_add(
                dsts, per_edge, lambda ids, v: np.add.at(self.residual, ids, v)
            )
            meta["sent_mass"] = sent
        meta["rsum"] = float(r.sum()) + meta.get("sent_mass", 0.0)
        return tuple([meta] + payloads)

    def bpush_round2(self, rmax: float, sweep_all: bool, source, dang_in, *payloads):
        for pl in payloads:
            self._add_payload(self.residual, pl)
        return self.bpush_round(rmax, sweep_all)

    def get_residuals(self) -> pa.Table:
        nz = np.nonzero(self.residual)[0]
        return pa.table({
            "node_id": pa.array(self.logical_ids[nz]),
            "residual": pa.array(self.residual[nz]),
        })

    def get_residual_sparse(self):
        """(local_ids, values) of the nonzero residual slice — consumed
        by a PARTITION-ALIGNED peer's dot_state_sparse (BiPPR combine):
        both handles share v % P, so local indices line up 1:1."""
        nz = np.nonzero(self.residual)[0]
        return nz.astype(np.int64), self.residual[nz]

    def dot_state_sparse(self, payload, field: str = "reserve") -> float:
        """Shard-local <state[field], sparse vector> — the scale path for
        BiPPR's sum_v acc(v) * r_t(v): each shard dots its own slice,
        the driver sums P floats (no n-sized array ever leaves a worker)."""
        ids, vals = payload
        return float(getattr(self, field)[ids] @ vals)

    def get_state_value(self, field: str, v: int) -> float:
        """One state entry by engine id (0.0 when this shard doesn't own v)."""
        if v % self.P != self.part:
            return 0.0
        return float(getattr(self, field)[v // self.P])

    def lookup_engine(self, v: int) -> int:
        """logical id -> engine id under distributed degree balancing
        (this shard holds the slice for logical ids ≡ part mod P)."""
        return int(self.perm_slice[v // self.P])

    def lookup_engine_batch(self, vs: np.ndarray) -> np.ndarray:
        """Vectorized lookup_engine for the logical ids this shard's
        perm slice covers (vs ≡ part mod P)."""
        return self.perm_slice[np.asarray(vs, dtype=np.int64) // self.P]

    def has_logical_edges(self) -> bool:
        """True when this shard can order neighbor draws by logical id
        (identity, driver inverse array, the ind_logical column the
        distributed CSR build carries, or trivially: no edges)."""
        return (self.indices.size == 0
                or self.ind_logical is not None or self._inv is not None
                or self.logical_ids is self.global_ids
                or bool(np.array_equal(self.logical_ids, self.global_ids)))

    # ---- multi-source batched PPR (SURVEY 4.4: "batch multiple queries
    # per superstep wave" — amortizes the driver barrier over Q queries;
    # state arrays become (n_local, Q) matrices) ---------------------------
    def ppr_init_batch(self, sources: list[int]):
        Q = len(sources)
        self.reserve = np.zeros((self.n_local, Q))
        self.residual = np.zeros((self.n_local, Q))
        self.acc = np.zeros((self.n_local, Q))
        self._sources = list(sources)
        for q, s in enumerate(sources):
            if s % self.P == self.part:
                self.residual[s // self.P, q] = 1.0
        self.counters = {k: 0 for k in self.counters}
        return True

    def push_round_batch(self, rmax: float, sweep_all: bool):
        """Batched push: a row is active if ANY query's residual exceeds
        its threshold; the whole row is drained (over-pushing only adds
        accuracy and saves walks — guarantee unaffected)."""
        R = self.residual
        thresh = rmax * np.maximum(self.out_deg, 1)[:, None]
        mask = (R > thresh) if not sweep_all else (R != 0)
        rows = np.nonzero(mask.any(axis=1))[0]
        meta = {"active": int(rows.size), "dangling": None, "drained": 0.0}
        if rows.size == 0:
            meta["dangling"] = np.zeros(R.shape[1])
            return tuple([meta] + [None] * self.P)
        Ra = R[rows].copy()
        self.reserve[rows] += self.alpha * Ra
        R[rows] = 0.0
        outflow = (1.0 - self.alpha) * Ra  # (rows, Q)
        d = self.out_deg[rows]
        dangling_vec = outflow[d == 0].sum(axis=0)
        meta["dangling"] = dangling_vec
        meta["drained"] = float(Ra.sum())
        self.counters["pushes"] += int(rows.size)
        has = np.nonzero(d > 0)[0]
        payloads = [None] * self.P
        sent = 0.0
        if has.size:
            dsts, row = self._gather_edges(rows[has])
            per_edge = outflow[has] / d[has][:, None]  # (has, Q)
            vals = per_edge[row]  # (E, Q)
            owner = dsts % self.P
            for p in np.unique(owner):
                m = owner == p
                # compact aggregation: (touched_rows, Q) only — a dense
                # (n_local, Q) accumulator per peer per round is 100s of
                # MB of memory traffic at moderate Q (measured 10x cost)
                uk, inv = np.unique(dsts[m] // self.P, return_inverse=True)
                acc = np.zeros((uk.size, R.shape[1]))
                np.add.at(acc, inv, vals[m])
                if p == self.part:
                    np.add.at(self.residual, uk, acc)
                else:
                    payloads[int(p)] = ("sparse2d", uk.astype(np.int64), acc)
                    sent += float(acc.sum())
                    self.counters["msgs_out"] += 1
        meta["sent_mass"] = sent
        return tuple([meta] + payloads)

    def apply_residual_batch(self, *payloads):
        for pl in payloads:
            if pl is None:
                continue
            _, ids, vals = pl
            np.add.at(self.residual, ids, vals)
        return float(self.residual.sum())

    def push_round_batch2(self, rmax: float, sweep_all: bool, dang_vec, *payloads):
        """Combined batched superstep (see push_round2)."""
        self.apply_residual_batch(*payloads)
        if dang_vec is not None and np.sum(dang_vec) > 0:
            for q, s in enumerate(self._sources):
                if dang_vec[q] > 0 and s % self.P == self.part:
                    self.residual[s // self.P, q] += dang_vec[q]
        out = self.push_round_batch(rmax, sweep_all)
        out[0]["rsum"] = float(self.residual.sum()) + out[0].get("sent_mass", 0.0)
        return out

    def walk_round2(self, hop: int, source, *payloads):
        for pl in payloads:
            self._append_walkers(pl)
        return self.walk_round(hop, source)

    def walk_round_batch2(self, hop: int, *payloads):
        for pl in payloads:
            self._bappend(pl)
        return self.walk_round_batch(hop)

    def add_source_residual_batch(self, dangling_vec):
        """Per-query dangling mass returns to that query's source."""
        for q, s in enumerate(self._sources):
            if dangling_vec[q] > 0 and s % self.P == self.part:
                self.residual[s // self.P, q] += dangling_vec[q]
        return True

    def walk_init_batch(self, omega: float, seed: int):
        """Spawn walks for every nonzero (vertex, query) residual cell;
        walkers carry their query index."""
        R = self.residual
        loc, qs = np.nonzero(R > 0)
        if loc.size == 0:
            self._bpending = None
            return 0
        r = R[loc, qs]
        omega_v = np.ceil(r * omega).astype(np.int64)
        wt = np.repeat(r / omega_v, omega_v)
        cur = np.repeat(self.global_ids[loc], omega_v)
        qidx = np.repeat(qs.astype(np.int64), omega_v)
        total = int(omega_v.sum())
        cum = np.concatenate([[0], np.cumsum(omega_v[:-1])])
        k_in = np.arange(total, dtype=np.int64) - np.repeat(cum, omega_v)
        lg = np.repeat(self.logical_ids[loc], omega_v)  # logical origins
        wkey = mix64(
            mix64(np.uint64(seed), qidx.astype(np.uint64)),
            mix64(lg.astype(np.uint64), k_in.astype(np.uint64)),
        )
        self._bpending = (cur, qidx, wt, wkey)
        R[loc, qs] = 0.0
        self.counters["walks"] += total
        return total

    def walk_round_batch(self, hop: int):
        """One hop for all batched walkers.  Dangling -> restart at that
        walker's query source."""
        meta = {"alive": 0}
        if self._bpending is None:
            return tuple([meta] + [None] * self.P)
        cur, qidx, wt, wkey = self._bpending
        self._bpending = None
        loc = cur // self.P
        stop = rng_uniform(mix64(wkey, np.full(len(wkey), np.uint64(2 * hop), np.uint64))) < self.alpha
        if stop.any():
            np.add.at(self.acc, (loc[stop], qidx[stop]), wt[stop])
        alive = ~stop
        cur, qidx, wt, wkey, loc = cur[alive], qidx[alive], wt[alive], wkey[alive], loc[alive]
        self.counters["walk_hops"] += int(alive.sum())
        if cur.size == 0:
            return tuple([meta] + [None] * self.P)
        d = self.out_deg[loc]
        dang = d == 0
        nxt = np.empty_like(cur)
        if dang.any():
            nxt[dang] = np.asarray(self._sources, dtype=np.int64)[qidx[dang]]
        ok = ~dang
        if ok.any():
            u2 = rng_uniform(mix64(wkey[ok], np.full(int(ok.sum()), np.uint64(2 * hop + 1), np.uint64)))
            choice = np.minimum((u2 * d[ok]).astype(np.int64), d[ok] - 1)
            nxt[ok] = self._walk_dst()[self.indptr[loc[ok]] + choice]
        meta["alive"] = int(cur.size)
        payloads = [None] * self.P
        owner = nxt % self.P
        for p in np.unique(owner):
            m = owner == p
            pl = (nxt[m], qidx[m], wt[m], wkey[m])
            if p == self.part:
                self._bappend(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def _bappend(self, pl):
        if pl is None:
            return
        if self._bpending is None:
            self._bpending = pl
        else:
            self._bpending = tuple(np.concatenate([a, b]) for a, b in zip(self._bpending, pl))

    def apply_walkers_batch(self, *payloads):
        for pl in payloads:
            self._bappend(pl)
        return True

    def get_scores_batch(self) -> pa.Table:
        """(query_idx, node_id, ppr) for all nonzero cells of
        reserve+acc."""
        est = self.reserve + self.acc
        loc, qs = np.nonzero(est)
        return pa.table({
            "query_idx": pa.array(qs.astype(np.int64)),
            "node_id": pa.array(self.logical_ids[loc]),
            "ppr": pa.array(est[loc, qs]),
        })

    # ---- G8 FORA+ walk index (SURVEY 2.4 G8, paper TODS section 5) --------
    def index_init(self, walks_per_deg: float, seed: int):
        """Spawn ceil(walks_per_deg * max(out_deg,1)) index walks per local
        vertex (walks_per_deg = rmax * omega, the paper's per-degree walk
        budget).  Payloads carry (cur, origin, kidx, key); endpoints are
        recorded at termination and shipped back to the origin's owner."""
        K = np.ceil(walks_per_deg * np.maximum(self.out_deg, 1)).astype(np.int64)
        total = int(K.sum())
        self._endpoint_buf = []
        if total == 0:
            self._ipending = None
            return 0
        origin = np.repeat(self.global_ids, K)
        cum = np.concatenate([[0], np.cumsum(K[:-1])])
        kidx = np.arange(total, dtype=np.int64) - np.repeat(cum, K)
        lg = np.repeat(self.logical_ids, K)  # logical-keyed (== engine on identity)
        wkey = mix64(np.uint64(seed) ^ np.uint64(0xF0F0), mix64(lg.astype(np.uint64), kidx.astype(np.uint64)))
        self._ipending = (origin.copy(), origin, kidx, wkey)  # (cur, origin, kidx, key)
        return total

    def index_walk_round(self, hop: int, absorb: bool = False):
        """Advance index walkers one hop.  Dangling nodes are recorded as
        endpoint -1 (restart marker): the query re-runs those walks live
        from its source, keeping semantics identical to mode='fora'.
        absorb=True (hub index, G6): a dangling node stores ITSELF — the
        BiPPR self-loop convention, so a stored walk is a complete
        alpha-walk future under the same dangling semantics the pairwise
        query walks use (source=-1)."""
        meta = {"alive": 0}
        if self._ipending is None:
            return tuple([meta] + [None] * self.P)
        cur, origin, kidx, wkey = self._ipending
        self._ipending = None
        loc = cur // self.P
        stop = rng_uniform(mix64(wkey, np.full(len(wkey), np.uint64(2 * hop), np.uint64))) < self.alpha
        d = self.out_deg[loc]
        dang = (~stop) & (d == 0)
        done = stop | dang
        if done.any():
            ep = (cur if absorb else np.where(stop, cur, -1))[done]
            self._endpoint_buf.append((origin[done], kidx[done], ep))
        alive = ~done
        cur, origin, kidx, wkey, loc, d = (
            cur[alive], origin[alive], kidx[alive], wkey[alive], loc[alive], d[alive]
        )
        payloads = [None] * self.P
        if cur.size:
            u2 = rng_uniform(mix64(wkey, np.full(len(wkey), np.uint64(2 * hop + 1), np.uint64)))
            choice = np.minimum((u2 * d).astype(np.int64), d - 1)
            nxt = self._walk_dst()[self.indptr[loc] + choice]
            owner = nxt % self.P
            for p in np.unique(owner):
                m = owner == p
                pl = (nxt[m], origin[m], kidx[m], wkey[m])
                if p == self.part:
                    self._iappend(pl)
                else:
                    payloads[int(p)] = pl
        meta["alive"] = int(cur.size)
        return tuple([meta] + payloads)

    def _iappend(self, pl):
        if pl is None:
            return
        if self._ipending is None:
            self._ipending = pl
        else:
            self._ipending = tuple(np.concatenate([a, b]) for a, b in zip(self._ipending, pl))

    def apply_index_walkers(self, *payloads):
        for pl in payloads:
            self._iappend(pl)
        return True

    def index_endpoint_exchange(self):
        """Route recorded (origin, kidx, endpoint) triples to origin owners."""
        if self._endpoint_buf:
            origin = np.concatenate([b[0] for b in self._endpoint_buf])
            kidx = np.concatenate([b[1] for b in self._endpoint_buf])
            ep = np.concatenate([b[2] for b in self._endpoint_buf])
        else:
            origin = kidx = ep = np.empty(0, np.int64)
        self._endpoint_buf = []
        payloads = [None] * self.P
        owner = origin % self.P if origin.size else origin
        for p in (np.unique(owner) if origin.size else []):
            m = owner == p
            pl = (origin[m], kidx[m], ep[m])
            if p == self.part:
                self.apply_endpoints(pl)
            else:
                payloads[int(p)] = pl
        return tuple([{"n": int(origin.size)}] + payloads)

    def apply_endpoints(self, *payloads):
        if not hasattr(self, "_ep_in") or self._ep_in is None:
            self._ep_in = []
        for pl in payloads:
            if pl is not None:
                self._ep_in.append(pl)
        return True

    def _assemble_endpoint_index(self):
        """Collected (origin, kidx, endpoint) triples -> per-vertex CSR
        (walks in kidx order so prefixes / slots are deterministic)."""
        if getattr(self, "_ep_in", None):
            origin = np.concatenate([p[0] for p in self._ep_in])
            kidx = np.concatenate([p[1] for p in self._ep_in])
            ep = np.concatenate([p[2] for p in self._ep_in])
        else:
            origin = kidx = ep = np.empty(0, np.int64)
        self._ep_in = None
        loc = origin // self.P
        counts = np.bincount(loc, minlength=self.n_local) if loc.size else np.zeros(self.n_local, np.int64)
        order = np.lexsort((kidx, loc)) if loc.size else np.empty(0, np.int64)
        indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return indptr, ep[order]

    def index_build(self):
        """Assemble the per-vertex endpoint index (CSR layout, walks in
        kidx order so the first omega_v endpoints are a deterministic
        prefix)."""
        self.idx_indptr, self.idx_endpoints = self._assemble_endpoint_index()
        return int(self.idx_endpoints.size)

    def index_save(self, path: str):
        from ..stages.csr import _large_list

        tmp = path + ".tmp"
        pq.write_table(
            pa.table({
                "indptr": _large_list(self.idx_indptr),
                "endpoints": _large_list(self.idx_endpoints),
            }),
            tmp,
        )
        os.replace(tmp, path)
        return True

    def index_load(self, path: str):
        t = pq.read_table(path)
        self.idx_indptr = _list_np(t["indptr"])
        self.idx_endpoints = _list_np(t["endpoints"])
        return True

    def walk_from_index(self, omega: float):
        """Query-time MC phase via index lookup (no RNG): for each local v
        with residual r, take the first ceil(r*omega) stored endpoints,
        each contributing r/omega_v.  Returns additive payloads for real
        endpoints; -1 (restart) endpoints come back as (weights) to be
        re-run live from the query source."""
        r = self.residual
        idx = np.nonzero(r > 0)[0]
        meta = {"restart": 0.0, "used": 0}
        if idx.size == 0:
            return tuple([meta] + [None] * self.P)
        omega_v = np.ceil(r[idx] * omega).astype(np.int64)
        stored = self.idx_indptr[idx + 1] - self.idx_indptr[idx]
        take = np.minimum(omega_v, stored)
        # gather first `take` endpoints of each vertex
        total = int(take.sum())
        wt_per = r[idx] / omega_v
        if total:
            cum = np.concatenate([[0], np.cumsum(take[:-1])])
            pos = np.arange(total, dtype=np.int64)
            rows = np.repeat(np.arange(idx.size), take)
            eidx = np.repeat(self.idx_indptr[idx], take) + (pos - np.repeat(cum, take))
            eps_ = self.idx_endpoints[eidx]
            wts = wt_per[rows]
            live = eps_ < 0  # restart markers -> rerun from source
            meta["restart"] += float(wts[live].sum())
            meta["used"] = total
            real, wts_r = eps_[~live], wts[~live]
            self.counters["walks"] += total
        else:
            real = np.empty(0, np.int64)
            wts_r = np.empty(0, np.float64)
        # shortfall (omega_v > stored) also re-run live from residual vertex;
        # cannot happen when walks_per_deg >= rmax*omega and push ran with
        # the same rmax, but guard anyway:
        short = omega_v - take
        if short.sum():
            meta["short"] = int(short.sum())
            meta["restart"] += float((wt_per * short).sum())
        r[idx] = 0.0
        payloads = [None] * self.P
        if real.size:
            payloads, _ = self._route_add(real, wts_r, lambda ids, v: np.add.at(self.acc, ids, v))
        return tuple([meta] + payloads)

    def apply_acc(self, *payloads):
        for pl in payloads:
            self._add_payload(self.acc, pl)
        return True

    def spawn_live_walks(self, source: int, mass: float, count_hint: int, seed: int):
        """Re-inject restart/shortfall mass as live walks from the query
        source (each walk weight mass/count)."""
        if source % self.P != self.part or mass <= 0:
            return 0
        k = max(int(count_hint), 1)
        wt = np.full(k, mass / k)
        cur = np.full(k, source, dtype=np.int64)
        kidx = np.arange(k, dtype=np.int64)
        lsrc = np.uint64(self.logical_ids[source // self.P])  # logical key stream
        wkey = mix64(np.uint64(seed) ^ np.uint64(0xABCD),
                     mix64(np.full(k, lsrc, np.uint64), kidx.astype(np.uint64)))
        self._append_walkers((cur, wt, wkey))
        return k

    # ---- G6 HubPPR: forward hub walk pool + backward hub oracle -----------
    # (Wang/Tang/Xiao, "HubPPR", VLDB'16 — re-expressed on the superstep
    # runtime.  SURVEY 2.4 G6.)  Forward: hub nodes pre-store a pool of
    # alpha-walk endpoints; a live walker arriving at a hub terminates by
    # drawing a stored endpoint WITH REPLACEMENT, slot selected from the
    # walker's own counter-RNG key — order-free, hence deterministic at
    # any parallelism (the paper's at-most-once bookkeeping would make
    # results depend on distributed arrival order; with-replacement keeps
    # the estimator unbiased since each stored endpoint is an iid draw of
    # the walk-from-hub termination law, at a small variance cost that
    # shrinks with pool size).  Backward: hubs pre-store a fine-rmax
    # backward push result (rho_h, sigma_h); pushing residual r at hub h
    # applies reserve += r*rho_h, residual += r*sigma_h instead of an
    # in-degree-sized edge push — exact by the backward invariant
    # pi(v,h) = rho_h(v) + sum_u sigma_h(u) pi(v,u).

    def hub_index_init(self, hub_ids, pool_size: int, seed: int):
        """Spawn `pool_size` index walks from each LOCAL hub.  Reuses the
        FORA+ walk machinery (index_walk_round with absorb=True).  Key
        stream seed^0x4855 is disjoint from the FORA+ index (^0xF0F0)
        and live-walk (^0xABCD) streams."""
        hub_ids = np.asarray(hub_ids, dtype=np.int64)
        mine = np.sort(hub_ids[hub_ids % self.P == self.part])
        self._endpoint_buf = []
        if mine.size == 0 or pool_size <= 0:
            self._ipending = None
            return 0
        origin = np.repeat(mine, pool_size)
        kidx = np.tile(np.arange(pool_size, dtype=np.int64), mine.size)
        lg = np.repeat(self.logical_ids[mine // self.P], pool_size)  # logical keys
        wkey = mix64(np.uint64(seed) ^ np.uint64(0x4855),
                     mix64(lg.astype(np.uint64), kidx.astype(np.uint64)))
        self._ipending = (origin.copy(), origin, kidx, wkey)
        return int(origin.size)

    def hub_index_build(self):
        self.hub_indptr, self.hub_endpoints = self._assemble_endpoint_index()
        return int(self.hub_endpoints.size)

    def hub_term_exchange(self):
        """Route endpoint weights of hub-consumed walkers into the acc
        of the endpoints' owners (one superstep after the walk loop)."""
        if getattr(self, "_hub_term", None):
            ep = np.concatenate([t[0] for t in self._hub_term])
            wt = np.concatenate([t[1] for t in self._hub_term])
        else:
            ep, wt = np.empty(0, np.int64), np.empty(0)
        self._hub_term = []
        meta = {"n": int(ep.size), "mass": float(wt.sum())}
        payloads = [None] * self.P
        if ep.size:
            payloads, _ = self._route_add(ep, wt, lambda ids, v: np.add.at(self.acc, ids, v))
        return tuple([meta] + payloads)

    def get_state_sparse(self, field: str = "residual"):
        """Sparse copy of a state vector — detached from the live state,
        so the caller can keep it across subsequent queries."""
        v = getattr(self, field)
        nz = np.nonzero(v)[0]
        return nz.astype(np.int64), v[nz].copy()

    def bpush_oracle_capture(self, h: int):
        """Store this shard's slice of the CURRENT backward-push state as
        hub h's oracle (called right after a fine-rmax push from h) —
        the slice never leaves the worker that will apply it."""
        if getattr(self, "hub_oracle", None) is None:
            self.hub_oracle = {}
        nzr = np.nonzero(self.reserve)[0]
        nzd = np.nonzero(self.residual)[0]
        self.hub_oracle[int(h)] = (
            nzr.astype(np.int64), self.reserve[nzr].copy(),
            nzd.astype(np.int64), self.residual[nzd].copy(),
        )
        return int(nzr.size + nzd.size)

    def bpush_oracle_finalize(self, hub_ids):
        self._hub_oracle_ids = np.sort(np.asarray(hub_ids, dtype=np.int64))
        return True

    def bpush_round_hub(self, rmax: float, consumed, *payloads):
        """Backward-push superstep with hub short-circuit: (1) apply
        incoming residual payloads (sender order), (2) apply the hub
        oracles for the (hub, r) pairs every shard consumed LAST round
        (driver-broadcast, collected shard-ascending), (3) drain local
        hub actives by consumption (returned in meta) and non-hub
        actives by a normal weighted push."""
        for pl in payloads:
            self._add_payload(self.residual, pl)
        for h, rv in consumed:
            sl = self.hub_oracle.get(int(h)) if getattr(self, "hub_oracle", None) else None
            if sl is not None:
                res_ids, res_vals, rsd_ids, rsd_vals = sl
                if res_ids.size:
                    self.reserve[res_ids] += rv * res_vals
                if rsd_ids.size:
                    self.residual[rsd_ids] += rv * rsd_vals
        r = self.residual
        idx = np.nonzero(r > rmax)[0]
        my_consumed = []
        if idx.size and getattr(self, "_hub_oracle_ids", None) is not None and self._hub_oracle_ids.size:
            gid = self.global_ids[idx]
            is_hub = np.isin(gid, self._hub_oracle_ids)
            if is_hub.any():
                for lr in idx[is_hub]:
                    my_consumed.append((int(self.global_ids[lr]), float(r[lr])))
                    r[lr] = 0.0
                idx = idx[~is_hub]
        meta = {"active": int(idx.size), "consumed": my_consumed, "dangling": 0.0}
        payloads_out = [None] * self.P
        if idx.size:
            ra = r[idx].copy()
            self.reserve[idx] += self.alpha * ra
            r[idx] = 0.0
            self.counters["pushes"] += int(idx.size)
            counts = self.out_deg[idx]
            if counts.sum():
                dsts, row = self._gather_edges(idx)
                starts = self.indptr[idx]
                cum = np.concatenate([[0], np.cumsum(counts[:-1])])
                pos = np.arange(int(counts.sum()), dtype=np.int64)
                eidx = np.repeat(starts, counts) + (pos - np.repeat(cum, counts))
                w = self.edge_weights[eidx]
                per_edge = (1.0 - self.alpha) * ra[row] * w
                payloads_out, sent = self._route_add(
                    dsts, per_edge, lambda ids, v: np.add.at(self.residual, ids, v)
                )
                meta["sent_mass"] = sent
        meta["rsum"] = float(r.sum()) + meta.get("sent_mass", 0.0)
        return tuple([meta] + payloads_out)

    def top_degree_local(self, k: int):
        """This shard's top-k (out_deg desc, LOGICAL id asc) — exact
        local sort, so the driver merge of P*k candidates is
        deterministic and permutation-invariant (logical == engine on
        identity handles).  Returns LOGICAL ids."""
        d = self.out_deg
        k = min(int(k), int(d.size))
        if k <= 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        order = np.lexsort((self.logical_ids, -d))[:k]
        return self.logical_ids[order], d[order].astype(np.int64)

    # ---- P=1 local fast path ----------------------------------------------
    def local_query(self, source, mode: str, rmax: float, omega: float,
                    seed: int, tol: float = 1e-12) -> dict:
        """Complete SSPPR query inside one actor call (P=1 shards only):
        push loop + walk phase with zero driver barriers.  The latency
        tier for graphs whose CSR fits a single shard; throughput scales
        by running many P=1 replicas (see algorithms.local_ppr_batch).
        Results identical to the distributed path (same kernels)."""
        assert self.P == 1, "local_query requires a P=1 handle"
        self.ppr_init(source)
        sweep = mode == "exact"
        rounds = 0
        if sweep:
            while rounds < 100_000:
                out = self.push_round(0.0, True)
                meta = out[0]
                if meta["dangling"] > 0:
                    if source is None:
                        self.add_uniform_residual(meta["dangling"])
                    else:
                        self.add_source_residual(source, meta["dangling"])
                rounds += 1
                if meta["active"] == 0 and meta["dangling"] == 0:
                    break
                if float(self.residual.sum()) < tol:
                    break
        else:
            # queue-based push (reference algo.h forward_local_update_linear
            # shape): track the active frontier explicitly instead of
            # scanning the dense residual vector every round
            r, d = self.residual, self.out_deg
            thresh = rmax * np.maximum(d, 1)
            queue = np.nonzero(r > thresh)[0]
            while queue.size and rounds < 100_000:
                idx = queue
                ra = r[idx].copy()
                self.reserve[idx] += self.alpha * ra
                r[idx] = 0.0
                outflow = (1.0 - self.alpha) * ra
                dang = float(outflow[d[idx] == 0].sum())
                has = idx[d[idx] > 0]
                touched_parts = []
                if has.size:
                    dsts, row = self._gather_edges(has)
                    per_edge = (outflow[d[idx] > 0] / d[has])[row]
                    uk, inv = np.unique(dsts, return_inverse=True)
                    np.add.at(r, uk, np.bincount(inv, weights=per_edge))
                    touched_parts.append(uk)
                if dang > 0 and source is not None:
                    r[source] += dang
                    touched_parts.append(np.array([source]))
                elif dang > 0:
                    r += dang / self.n  # uniform: rare in serving; full scan next
                    touched_parts.append(np.arange(self.n_local))
                self.counters["pushes"] += int(idx.size)
                rounds += 1
                if touched_parts:
                    cand = np.unique(np.concatenate(touched_parts))
                    queue = cand[r[cand] > thresh[cand]]
                else:
                    queue = np.empty(0, np.int64)
        stats = {"rounds": rounds, "walks": 0, "hops": 0}
        if mode == "fora":
            total = self.walk_init(omega, seed)
            hop = 0
            while self._pending is not None and self._pending[0].size:
                self.walk_round(hop, source)
                hop += 1
            self.walk_fold()
            stats.update(walks=total, hops=hop)
        elif mode == "fora+":
            # FORA+ (G8): MC phase from the precomputed endpoint index —
            # no RNG except restart-marker walks re-run live from source
            out = self.walk_from_index(omega)
            meta = out[0]
            restart = meta["restart"]
            if restart > 0 and source is not None:
                count = max(int(np.ceil(restart * omega)), 1)
                self.spawn_live_walks(source, restart, count, seed ^ 0xBEEF)
                hop = 0
                while self._pending is not None and self._pending[0].size:
                    self.walk_round(hop, source)
                    hop += 1
            self.walk_fold()
            stats.update(walks=meta["used"], restart_mass=restart)
        return stats

    def local_query_batch(self, sources, mode: str, rmax: float, omega: float,
                          seed_base: int, topk: int | None = None,
                          logical: list[int] | None = None) -> list[pa.Table]:
        """Run a CHUNK of SSPPR queries in one actor call (P=1 serving
        tier): queries share the warm CSR and pay one task dispatch +
        one result object per chunk instead of two per query — the
        per-query driver round-trip was the throughput ceiling at high
        replica counts.  Per-query seeds match local_query exactly.

        topk trims each result to its k best rows (ppr desc, node_id
        asc) INSIDE the actor — the serving answer is a top-k list, and
        shipping full score vectors to the caller was the next
        bottleneck after dispatch overhead.

        `sources` are ENGINE ids; `logical` (parallel list, defaults to
        sources) carries the caller-facing logical ids the per-query
        seeds derive from — under a degree-balanced replica the seeds
        must match what single-query calls (seeded from the logical
        source) produce (ADVICE r02)."""
        if logical is None:
            logical = sources
        out = []
        for s, lg in zip(sources, logical):
            self.local_query(int(s), mode, rmax, omega,
                             seed_base ^ (int(lg) * 0x9E3779B9))
            t = self.get_scores(True)
            if topk is not None and t.num_rows > topk:
                ppr = t["ppr"].to_numpy(zero_copy_only=False)
                ids = t["node_id"].to_numpy(zero_copy_only=False)
                sel = np.lexsort((ids, -ppr))[:topk]
                t = t.take(sel)
            out.append(t)
        return out

    def local_build_index(self, walks_per_deg: float, seed: int) -> int:
        """Build the FORA+ walk index fully locally (P=1 shards)."""
        assert self.P == 1
        self.index_init(walks_per_deg, seed)
        hop = 0
        while self._ipending is not None and self._ipending[0].size:
            self.index_walk_round(hop)
            hop += 1
        self.index_endpoint_exchange()
        return self.index_build()

    # ---- result extraction ------------------------------------------------
    def get_scores(self, nonzero_only: bool = True) -> pa.Table:
        vals = self.reserve
        if nonzero_only:
            nz = np.nonzero(vals)[0]
            return pa.table(
                {"node_id": pa.array(self.logical_ids[nz]), "ppr": pa.array(vals[nz])}
            )
        return pa.table({"node_id": pa.array(self.logical_ids), "ppr": pa.array(vals)})

    def get_labels(self) -> pa.Table:
        return pa.table(
            {"node_id": pa.array(self.logical_ids), "label": pa.array(self.labels)}
        )

    # ---- G9 connected components (hash-min) -------------------------------
    def cc_init(self):
        self.labels = self.logical_ids.copy()
        self._changed = np.ones(self.n_local, dtype=bool)
        return True

    def cc_round(self):
        idx = np.nonzero(self._changed)[0]
        self._changed[:] = False
        meta = {"sent": int(idx.size)}
        if idx.size == 0:
            return tuple([meta] + [None] * self.P)
        dsts, row = self._gather_edges(idx)
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        lab = self.labels[idx][row]  # int64: labels are node ids and must
        # never round-trip through float64 (ids above 2^53 would round)
        _SENT = np.iinfo(np.int64).max
        # min-aggregate per destination partition
        payloads = [None] * self.P
        owner = dsts % self.P
        for p in np.unique(owner):
            m = owner == p
            nl = n_local_of(self.n, self.P, int(p))
            acc = np.full(nl, _SENT, dtype=np.int64)
            np.minimum.at(acc, dsts[m] // self.P, lab[m])
            nz = np.nonzero(acc != _SENT)[0]
            pl = (nz.astype(np.int64), acc[nz])
            if p == self.part:
                self.cc_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def cc_apply(self, *payloads):
        changed = 0
        for pl in payloads:
            if pl is None:
                continue
            ids, vals = pl
            better = vals < self.labels[ids]
            if better.any():
                self.labels[ids[better]] = vals[better]
                self._changed[ids[better]] = True
                changed += int(better.sum())
        return changed

    # ---- maximal independent set (Luby-style random priorities) ------------
    def mis_init(self, seed: int):
        self._mis = np.full(self.n_local, -1, np.int8)  # -1 und / 1 in / 0 out
        self._mis_seed = np.uint64(seed)
        self._mis_key = None
        return int(self.n_local)

    def mis_round(self, rnd: int):
        """Priority exchange: every UNDECIDED node draws key =
        mix64(mix64(seed, round), logical_id) and sends (key, id) along
        its edges; receivers keep the lexicographic min (key, id) per
        cell (one lexsort per peer — ids break u64 key ties exactly, so
        adjacent hash collisions cannot both join).  Self-loops are
        dropped (a node never competes with itself)."""
        _UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
        _IMAX = np.iinfo(np.int64).max
        self._mis_min_key = np.full(self.n_local, _UMAX, np.uint64)
        self._mis_min_id = np.full(self.n_local, _IMAX, np.int64)
        und = np.nonzero(self._mis == -1)[0]
        meta = {"undecided": int(und.size)}
        if und.size == 0:
            self._mis_key = (und, np.empty(0, np.uint64))
            return tuple([meta] + [None] * self.P)
        rseed = mix64(self._mis_seed, np.uint64(rnd))
        key = mix64(np.full(und.size, rseed, np.uint64),
                    self.logical_ids[und].astype(np.uint64))
        self._mis_key = (und, key)
        dsts, row = self._gather_edges(und)
        payloads = [None] * self.P
        if dsts.size:
            keep = dsts != self.global_ids[und][row]  # drop self-loops
            dsts, row = dsts[keep], row[keep]
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        k_e, s_e = key[row], self.logical_ids[und][row]
        owner = dsts % self.P
        for p in np.unique(owner):
            m = owner == p
            d = dsts[m] // self.P
            order = np.lexsort((s_e[m], k_e[m], d))
            ds_, ks_, ss_ = d[order], k_e[m][order], s_e[m][order]
            first = np.concatenate([[True], ds_[1:] != ds_[:-1]])
            pl = (ds_[first], ks_[first], ss_[first])
            if p == self.part:
                self.mis_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def mis_apply(self, *payloads):
        for pl in payloads:
            if pl is None:
                continue
            ids, k, sid = pl
            cur_k, cur_i = self._mis_min_key[ids], self._mis_min_id[ids]
            better = (k < cur_k) | ((k == cur_k) & (sid < cur_i))
            if better.any():
                bi = ids[better]
                self._mis_min_key[bi] = k[better]
                self._mis_min_id[bi] = sid[better]
        return True

    def mis_commit(self, rnd: int):
        """An undecided node joins the MIS iff its (key, id) is strictly
        smaller than the best undecided neighbor's (no neighbor ->
        joins); joined nodes broadcast exclusion along their edges."""
        und, key = self._mis_key
        meta = {"joined": 0}
        if und.size == 0:
            return tuple([meta] + [None] * self.P)
        mk, mid = self._mis_min_key[und], self._mis_min_id[und]
        lid = self.logical_ids[und]
        win = (key < mk) | ((key == mk) & (lid < mid))
        join = und[win]
        self._mis[join] = 1
        meta["joined"] = int(join.size)
        payloads = [None] * self.P
        if join.size == 0:
            return tuple([meta] + [None] * self.P)
        dsts, _row = self._gather_edges(join)
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        owner = dsts % self.P
        for p in np.unique(owner):
            m = owner == p
            pl = np.unique(dsts[m] // self.P)
            if p == self.part:
                self.mis_exclude_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def mis_exclude_apply(self, *payloads):
        for ids in payloads:
            if ids is None:
                continue
            m = self._mis[ids] == -1
            if m.any():
                self._mis[ids[m]] = 0
        return True

    def mis_table(self) -> pa.Table:
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            "in_mis": pa.array(self._mis == 1),
        })

    # ---- greedy coloring = iterated MIS over the uncolored residual --------
    def color_init(self):
        self._color = np.full(self.n_local, -1, np.int64)
        return True

    def mis_reset_uncolored(self, seed: int, color: int):
        """Arm one MIS round-set over the UNCOLORED residual: colored
        nodes enter as decided-out (they never send, join, or block),
        and the round's RNG stream is mix64(seed, color) so every color
        class draws fresh priorities."""
        self._mis = np.where(self._color >= 0,
                             np.int8(0), np.int8(-1)).astype(np.int8)
        self._mis_seed = mix64(np.uint64(seed), np.uint64(color))
        self._mis_key = None
        return int((self._mis == -1).sum())

    def color_commit(self, c: int):
        sel = self._mis == 1
        self._color[sel] = c
        return int(sel.sum())

    def color_table(self) -> pa.Table:
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            "color": pa.array(self._color),
        })

    # ---- SCC (min-label forward/backward intersection) ---------------------
    def scc_reset(self):
        self.scc = np.full(self.n_local, -1, np.int64)
        self._scc_assigned = np.zeros(self.n_local, dtype=bool)
        return True

    def minlabel_init(self):
        """(Re)start a min-label fixpoint over the ACTIVE (unassigned)
        subgraph.  Assigned nodes hold the sentinel, never send (changed
        stays False) and never accept (filtered in minlabel_apply), so
        labels cannot relay through a carved-out SCC."""
        _SENT = np.iinfo(np.int64).max
        self.labels = np.where(self._scc_assigned, _SENT, self.logical_ids)
        self._changed = ~self._scc_assigned
        return True

    def minlabel_round(self):
        """cc_round over the active subgraph: changed active nodes push
        their label along out-edges, min-aggregated per destination cell
        before the exchange (hub fan-in bounded at P-1 payloads)."""
        idx = np.nonzero(self._changed)[0]
        self._changed[:] = False
        meta = {"sent": int(idx.size)}
        if idx.size == 0:
            return tuple([meta] + [None] * self.P)
        dsts, row = self._gather_edges(idx)
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        lab = self.labels[idx][row]
        _SENT = np.iinfo(np.int64).max
        payloads = [None] * self.P
        owner = dsts % self.P
        for p in np.unique(owner):
            m = owner == p
            nl = n_local_of(self.n, self.P, int(p))
            acc = np.full(nl, _SENT, dtype=np.int64)
            np.minimum.at(acc, dsts[m] // self.P, lab[m])
            nz = np.nonzero(acc != _SENT)[0]
            pl = (nz.astype(np.int64), acc[nz])
            if p == self.part:
                self.minlabel_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def minlabel_apply(self, *payloads):
        changed = 0
        for pl in payloads:
            if pl is None:
                continue
            ids, vals = pl
            better = (vals < self.labels[ids]) & ~self._scc_assigned[ids]
            if better.any():
                self.labels[ids[better]] = vals[better]
                self._changed[ids[better]] = True
                changed += int(better.sum())
        return changed

    def minlabel_get(self) -> np.ndarray:
        return self.labels

    def scc_assign(self, minb: np.ndarray) -> int:
        """Carve: node v joins SCC(c) iff minF(v) == minB(v) == c (then
        c reaches v and v reaches c).  minF is this (forward) worker's
        labels; minb is the aligned reverse worker's slice."""
        _SENT = np.iinfo(np.int64).max
        new = (~self._scc_assigned) & (self.labels == np.asarray(minb)) \
            & (self.labels != _SENT)
        self.scc[new] = self.labels[new]
        self._scc_assigned |= new
        return int(new.sum())

    def scc_assigned_mask(self) -> np.ndarray:
        return self._scc_assigned

    def scc_set_assigned(self, mask: np.ndarray) -> bool:
        self._scc_assigned = np.asarray(mask, dtype=bool).copy()
        return True

    def scc_table(self) -> pa.Table:
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            "scc": pa.array(self.scc),
        })

    # ---- BFS hop distance (multi-source) -----------------------------------
    def bfs_init(self, sources_engine):
        _SENT = np.iinfo(np.int64).max
        self.dist = np.full(self.n_local, _SENT, dtype=np.int64)
        self._changed = np.zeros(self.n_local, dtype=bool)
        src = np.asarray(sources_engine, dtype=np.int64)
        mine = src[src % self.P == self.part] // self.P
        self.dist[mine] = 0
        self._changed[mine] = True
        return int(mine.size)

    def bfs_round(self):
        idx = np.nonzero(self._changed)[0]
        self._changed[:] = False
        meta = {"sent": int(idx.size)}
        if idx.size == 0:
            return tuple([meta] + [None] * self.P)
        dsts, row = self._gather_edges(idx)
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        nd = self.dist[idx][row] + 1  # unit-weight relaxation
        _SENT = np.iinfo(np.int64).max
        payloads = [None] * self.P
        owner = dsts % self.P
        for p in np.unique(owner):
            m = owner == p
            nl = n_local_of(self.n, self.P, int(p))
            acc = np.full(nl, _SENT, dtype=np.int64)
            np.minimum.at(acc, dsts[m] // self.P, nd[m])
            nz = np.nonzero(acc != _SENT)[0]
            pl = (nz.astype(np.int64), acc[nz])
            if p == self.part:
                self.bfs_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def bfs_apply(self, *payloads):
        changed = 0
        for pl in payloads:
            if pl is None:
                continue
            ids, vals = pl
            better = vals < self.dist[ids]
            if better.any():
                self.dist[ids[better]] = vals[better]
                self._changed[ids[better]] = True
                changed += int(better.sum())
        return changed

    # ---- K-lane (multi-pivot) BFS: batched supersteps -----------------------
    # VERDICT r04 #2: per-pivot sequential BFS cost sum-of-depths driver
    # barriers; lanes batch k pivots into ONE superstep wave so k pivots
    # cost max-depth rounds.  State is a flat (n_local * K) vector indexed
    # local_row * K + lane; payload cells are (dest, lane) pairs reduced
    # per cell before shipping, so hub fan-in stays pre-aggregated.
    def _lane_expand(self, flat: np.ndarray, K: int):
        """Expand a flat (local_row * K + lane) frontier into per-out-edge
        (dst_engine, lane, src_flat) triples — the K-lane analogue of
        _gather_edges.  Edges are gathered ONCE per unique frontier row
        and repeated per active lane, so a row hot in many lanes costs a
        single CSR slice."""
        rows = flat // K
        lanes = flat % K
        order = np.argsort(rows, kind="stable")
        rows_s, lanes_s = rows[order], lanes[order]
        u_rows, starts, cnt = np.unique(rows_s, return_index=True,
                                        return_counts=True)
        dsts, erow = self._gather_edges(u_rows)
        if dsts.size == 0:
            e = np.empty(0, np.int64)
            return e, e, e
        rep = cnt[erow]
        tot = int(rep.sum())
        edge_rep = np.repeat(np.arange(dsts.size, dtype=np.int64), rep)
        ends = np.cumsum(rep)
        within = np.arange(tot, dtype=np.int64) - np.repeat(ends - rep, rep)
        lane_idx = lanes_s[starts[erow[edge_rep]] + within]
        src_flat = u_rows[erow[edge_rep]] * K + lane_idx
        return dsts[edge_rep], lane_idx, src_flat

    @staticmethod
    def _cell_reduce(dflat: np.ndarray, vals: np.ndarray, reduce_min: bool):
        """Reduce expanded (dest_flat, val) contributions to one value per
        (dest, lane) cell — sort + reduceat, no dense (n_local * K)
        scratch allocation per destination shard."""
        o = np.argsort(dflat, kind="stable")
        df, v = dflat[o], vals[o]
        first = np.empty(df.size, bool)
        first[0] = True
        first[1:] = df[1:] != df[:-1]
        st = np.nonzero(first)[0]
        red = (np.minimum if reduce_min else np.add).reduceat(v, st)
        return df[st], red

    def msbfs_init(self, sources_engine):
        """Lane k's source is sources_engine[k]; dist is int32 (BFS depth
        always < 2^31), flat (n_local * K)."""
        K = len(sources_engine)
        self._ms_K = K
        self._ms_dist = np.full(self.n_local * K, np.iinfo(np.int32).max,
                                np.int32)
        src = np.asarray(sources_engine, dtype=np.int64)
        lanes = np.arange(K, dtype=np.int64)
        mine = src % self.P == self.part
        flat = (src[mine] // self.P) * K + lanes[mine]
        self._ms_dist[flat] = 0
        self._ms_front = flat
        return int(flat.size)

    def msbfs_round(self):
        flat = self._ms_front
        self._ms_front = np.empty(0, np.int64)
        meta = {"sent": int(flat.size)}
        if flat.size == 0:
            return tuple([meta] + [None] * self.P)
        K = self._ms_K
        dsts, lane_idx, src_flat = self._lane_expand(flat, K)
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        nd = self._ms_dist[src_flat] + np.int32(1)
        dflat = (dsts // self.P) * K + lane_idx
        owner = dsts % self.P
        payloads = [None] * self.P
        for p in np.unique(owner):
            m = owner == p
            pl = self._cell_reduce(dflat[m], nd[m], reduce_min=True)
            if p == self.part:
                self.msbfs_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def msbfs_apply(self, *payloads):
        changed = 0
        for pl in payloads:
            if pl is None:
                continue
            ids, vals = pl
            better = vals < self._ms_dist[ids]
            if better.any():
                bi = ids[better]
                self._ms_dist[bi] = vals[better]
                self._ms_front = np.concatenate([self._ms_front, bi])
                changed += int(better.sum())
        return changed

    # ---- harmonic centrality accumulation over pivot BFS waves --------------
    def harm_init(self):
        self.harm = np.zeros(self.n_local, np.float64)
        return True

    def harm_accumulate(self):
        """Fold the finished K-lane BFS dist matrix into the harmonic sum
        (harm[v] += 1/d(pivot_k, v) for reached v != pivot_k), lane by
        lane in pivot order — bitwise-stable vs the r4 sequential
        per-pivot fold (tests assert np.array_equal against the brute)."""
        _S32 = np.iinfo(np.int32).max
        d = self._ms_dist.reshape(self.n_local, self._ms_K)
        total = 0
        for k in range(self._ms_K):
            col = d[:, k]
            reach = (col < _S32) & (col > 0)
            self.harm[reach] += 1.0 / col[reach]
            total += int(reach.sum())
        return total

    def harm_table(self, scale: float) -> pa.Table:
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            "harmonic": pa.array(self.harm * scale),
        })

    def pivot_candidates(self, k: int, seed: int):
        """k smallest mix64(seed, logical_id) among local NON-dangling
        nodes — per-shard exact top-k, merged on the driver (select_hubs
        shape, nothing n-sized crosses)."""
        ids = self.logical_ids[self.out_deg > 0]
        if ids.size == 0:
            return ids, np.empty(0, np.uint64)
        keys = mix64(np.uint64(seed), ids.astype(np.uint64))
        order = np.argsort(keys, kind="stable")[:k]
        return ids[order], keys[order]

    def get_dists(self) -> pa.Table:
        reach = self.dist < np.iinfo(np.int64).max
        return pa.table({
            "node_id": pa.array(self.logical_ids[reach]),
            "dist": pa.array(self.dist[reach]),
        })

    # ---- betweenness centrality (pivot-sampled Brandes) --------------------
    def bc_init(self):
        """Zero the betweenness accumulator (lives on the REVERSE pool,
        where the backward dependency pass applies its updates)."""
        self._bc_acc = np.zeros(self.n_local, np.float64)
        return True

    def bc_fwd_init(self, sources_engine):
        """K-lane Brandes forward state (VERDICT r04 #2): lane k runs
        pivot sources_engine[k]'s BFS+sigma sweep; all lanes advance in
        the same superstep, so a pivot chunk costs max-depth rounds
        instead of sum-of-depths.  dist int32, sigma float64, flat
        (n_local * K) row-major local_row * K + lane."""
        K = len(sources_engine)
        self._bc_K = K
        self._bc_dist = np.full(self.n_local * K, np.iinfo(np.int32).max,
                                np.int32)
        self._bc_sig = np.zeros(self.n_local * K, np.float64)
        src = np.asarray(sources_engine, dtype=np.int64)
        lanes = np.arange(K, dtype=np.int64)
        mine = src % self.P == self.part
        flat = (src[mine] // self.P) * K + lanes[mine]
        self._bc_dist[flat] = 0
        self._bc_sig[flat] = 1.0
        self._bc_front = flat
        return int(flat.size)

    def bc_fwd_round(self, level: int):
        """Brandes forward superstep over all lanes: the level-`level`
        frontier cells push their shortest-path counts (sigma, float64)
        along out-edges, pre-summed per destination (node, lane) cell;
        receivers at unset dist join level+1, receivers already at
        level+1 add counts (bc_fwd_apply).  Level-synchronous, so every
        sigma contribution to a cell arrives in the one round its level
        is discovered."""
        flat = self._bc_front
        self._bc_front = np.empty(0, np.int64)
        meta = {"sent": int(flat.size), "self_new": 0}
        if flat.size == 0:
            return tuple([meta] + [None] * self.P)
        dsts, lane_idx, src_flat = self._lane_expand(flat, self._bc_K)
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        vals = self._bc_sig[src_flat]
        dflat = (dsts // self.P) * self._bc_K + lane_idx
        owner = dsts % self.P
        payloads = [None] * self.P
        for p in np.unique(owner):
            m = owner == p
            ids, sums = self._cell_reduce(dflat[m], vals[m], reduce_min=False)
            pl = (level, ids, sums)
            if p == self.part:
                meta["self_new"] = self.bc_fwd_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def bc_fwd_apply(self, *payloads):
        _S32 = np.iinfo(np.int32).max
        newly = 0
        for pl in payloads:
            if pl is None:
                continue
            level, ids, vals = pl
            fresh = self._bc_dist[ids] == _S32
            if fresh.any():
                fi = ids[fresh]
                self._bc_dist[fi] = level + 1
                self._bc_front = np.concatenate([self._bc_front, fi])
                newly += int(fresh.sum())
            ok = self._bc_dist[ids] == level + 1
            # cell ids are unique within one payload (pre-reduced), so a
            # direct fancy += is safe — no np.add.at needed
            oi = ids[ok]
            self._bc_sig[oi] += vals[ok]
        return newly

    def bc_state(self):
        """(dist, sigma, K) hand-off to the aligned reverse pool — shard
        p's arrays index the same (node, lane) cells on both pools
        (shared permutation), so the transfer is P object-store blobs,
        nothing through the driver."""
        return self._bc_dist, self._bc_sig, self._bc_K

    def bc_bwd_init(self, state):
        dist, sig, K = state
        self._bc_dist = np.asarray(dist)
        self._bc_sig = np.asarray(sig)
        self._bc_K = int(K)
        self._bc_delta = np.zeros(self._bc_dist.size, np.float64)
        return True

    def bc_bwd_round(self, level: int):
        """Backward dependency superstep on the REVERSE pool: cells at
        dist == level push (1 + delta)/sigma along reverse edges
        (pre-summed per destination cell); a receiver u accepts only if
        dist(u, lane) == level - 1 — then u->w is a shortest-path-DAG
        edge in that lane — and folds sigma(u) * sum into delta(u)
        (bc_bwd_apply).  Lanes whose BFS depth is shallower than `level`
        simply have no cells at this level."""
        flat = np.nonzero(self._bc_dist == level)[0]
        meta = {"sent": int(flat.size)}
        if flat.size == 0:
            return tuple([meta] + [None] * self.P)
        dsts, lane_idx, src_flat = self._lane_expand(flat, self._bc_K)
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        vals = (1.0 + self._bc_delta[src_flat]) / self._bc_sig[src_flat]
        dflat = (dsts // self.P) * self._bc_K + lane_idx
        owner = dsts % self.P
        payloads = [None] * self.P
        for p in np.unique(owner):
            m = owner == p
            ids, sums = self._cell_reduce(dflat[m], vals[m], reduce_min=False)
            pl = (level, ids, sums)
            if p == self.part:
                self.bc_bwd_apply(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def bc_bwd_apply(self, *payloads):
        applied = 0
        for pl in payloads:
            if pl is None:
                continue
            level, ids, vals = pl
            ok = self._bc_dist[ids] == level - 1
            if ok.any():
                oi = ids[ok]
                self._bc_delta[oi] += self._bc_sig[oi] * vals[ok]
                applied += int(ok.sum())
        return applied

    def bc_accumulate(self, pivots_engine):
        """Fold every lane's delta into the betweenness accumulator, lane
        by lane in pivot order (matches the r4 sequential fold order
        bitwise); Brandes excludes each source's own dependency."""
        K = self._bc_K
        src = np.asarray(pivots_engine, dtype=np.int64)
        lanes = np.arange(K, dtype=np.int64)
        mine = src % self.P == self.part
        self._bc_delta[(src[mine] // self.P) * K + lanes[mine]] = 0.0
        d = self._bc_delta.reshape(self.n_local, K)
        for k in range(K):
            self._bc_acc += d[:, k]
        return True

    def bc_table(self, scale: float) -> pa.Table:
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            "betweenness": pa.array(self._bc_acc * scale),
        })

    # ---- G10 label propagation --------------------------------------------
    def lpa_init(self):
        self.labels = self.logical_ids.copy()
        self._votes = None
        return True

    @staticmethod
    def _pair_counts(a: np.ndarray, b: np.ndarray, weights: np.ndarray | None = None):
        """Aggregate counts per unique (a, b) pair via lexsort — no
        packed-u64 keys, so labels/ids may span the full int64 range
        (the previous (dst<<32)|label packing silently corrupted votes
        past 2^32 ids)."""
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        new = np.empty(a_s.size, dtype=bool)
        new[0] = True
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        idx = np.nonzero(new)[0]
        if weights is None:
            counts = np.diff(np.append(idx, a_s.size))
        else:
            counts = np.add.reduceat(weights[order], idx)
        return a_s[idx], b_s[idx], counts.astype(np.int64)

    def lpa_round(self):
        """Emit (dst, my_label) votes along all out-edges (symmetrized
        graph), pre-counted per (dst, label) pair inside the sender."""
        idx = np.arange(self.n_local)
        dsts, row = self._gather_edges(idx)
        meta = {"votes": int(dsts.size)}
        payloads = [None] * self.P
        if dsts.size == 0:
            self._votes = None
            return tuple([meta] + [None] * self.P)
        lab = self.labels[row]  # row indexes into idx == local index
        owner = dsts % self.P
        self._votes = None
        for p in np.unique(owner):
            m = owner == p
            dk, lk, ck = self._pair_counts(dsts[m] // self.P, lab[m])
            pl = (dk, lk, ck)
            if p == self.part:
                self.lpa_vote(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def lpa_vote(self, *payloads):
        for pl in payloads:
            if pl is None:
                continue
            if self._votes is None:
                self._votes = pl
            else:
                self._votes = tuple(
                    np.concatenate([v, p]) for v, p in zip(self._votes, pl)
                )
        return True

    def lpa_commit(self):
        """Merge votes, per-dst argmax with smallest-label tie-break."""
        if self._votes is None:
            return 0
        dst_loc, lab, tot = self._pair_counts(*self._votes[:2], weights=self._votes[2])
        # order by (dst, -count, label); first row per dst wins
        order = np.lexsort((lab, -tot, dst_loc))
        dst_o = dst_loc[order]
        first = np.concatenate([[True], dst_o[1:] != dst_o[:-1]])
        win_dst, win_lab = dst_o[first], lab[order][first]
        changed = int((self.labels[win_dst] != win_lab).sum())
        self.labels[win_dst] = win_lab
        self._votes = None
        return changed

    # ---- k-core decomposition (h-index iteration) --------------------------
    def kcore_init(self):
        """core(v) starts at deg(v); each round every vertex replaces its
        value with the h-index of its neighbors' values — the fixpoint is
        the core number (Lü et al., PNAS 2016, public result).  Values
        only decrease, so the iteration is monotone and terminates."""
        self.core = self.out_deg.astype(np.int64).copy()
        self._kvotes = None
        return True

    def kcore_round(self):
        """Emit (dst, my_core) along all out-edges (symmetrized graph),
        pre-counted per (dst, value) pair inside the sender — hubs whose
        neighbors share values compress to one (value, count) cell."""
        idx = np.arange(self.n_local)
        dsts, row = self._gather_edges(idx)
        meta = {"msgs": int(dsts.size)}
        payloads = [None] * self.P
        self._kvotes = None
        if dsts.size == 0:
            return tuple([meta] + [None] * self.P)
        val = self.core[row]
        owner = dsts % self.P
        for p in np.unique(owner):
            m = owner == p
            dk, vk, ck = self._pair_counts(dsts[m] // self.P, val[m])
            pl = (dk, vk, ck)
            if p == self.part:
                self.kcore_vote(pl)
            else:
                payloads[int(p)] = pl
        return tuple([meta] + payloads)

    def kcore_vote(self, *payloads):
        for pl in payloads:
            if pl is None:
                continue
            if self._kvotes is None:
                self._kvotes = pl
            else:
                self._kvotes = tuple(
                    np.concatenate([v, p]) for v, p in zip(self._kvotes, pl)
                )
        return True

    def kcore_commit(self):
        """Weighted h-index per destination from (value, count) cells:
        sort values descending per dst, h = max_i min(v_i, cumcount_i);
        new core = min(old, h).  Vertices receiving no message (isolated)
        keep core 0 from init."""
        if self._kvotes is None:
            return 0
        dst_loc, val, cnt = self._pair_counts(*self._kvotes[:2], weights=self._kvotes[2])
        order = np.lexsort((-val, dst_loc))
        d_o, v_o, c_o = dst_loc[order], val[order], cnt[order]
        first = np.concatenate([[True], d_o[1:] != d_o[:-1]])
        starts = np.flatnonzero(first)
        cum = np.cumsum(c_o)
        seg_base = np.concatenate([[0], cum[:-1]])[starts]
        within = cum - seg_base[np.cumsum(first) - 1]
        cand = np.minimum(v_o, within)
        h = np.maximum.reduceat(cand, starts)
        dsts = d_o[first]
        new = np.minimum(self.core[dsts], h)
        changed = int((new < self.core[dsts]).sum())
        self.core[dsts] = new
        self._kvotes = None
        return changed

    def get_cores(self) -> pa.Table:
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            "core": pa.array(self.core),
        })

    # ---- HITS hubs & authorities (G13) -------------------------------------
    # Two aligned actor pools (forward CSR holds the hub slices, reverse
    # CSR the authority slices, both sliced v % P) alternate routed full
    # sweeps: a = A^T h is a sweep of h over the FORWARD shards (each
    # edge (v, w) sends h[v] to owner(w)), h = A a a sweep of a over the
    # REVERSE shards.  Payloads are per-destination pre-aggregated
    # bincounts (the _push_full_sweep discipline), so hub fan-in cannot
    # hotspot and per-round traffic is bounded by P dense slices.
    def hits_init(self, field: str, value: float) -> None:
        # clear the previous run's converged vectors — hits_scale deltas
        # against _hits_prev, and a stale entry would let a second run
        # spuriously early-stop after one iteration (ADVICE r03)
        self._hits_prev = {}
        setattr(self, "hits_" + field, np.full(self.n_local, value, np.float64))

    def hits_sweep(self, field: str):
        """Route this shard's `field` slice along its CSR, summed per
        destination.  ALL P slots are returned as payloads (own part
        included) because the apply side lives in the opposite pool."""
        self._ensure_sweep_cache()
        vec = getattr(self, "hits_" + field)
        payloads = [None] * self.P
        for p, (erow, dloc) in self._sweep_cache.items():
            nl = n_local_of(self.n, self.P, int(p))
            payloads[int(p)] = _sparsify(np.bincount(dloc, weights=vec[erow], minlength=nl))
            self.counters["msgs_out"] += 1
        return tuple(payloads)

    def hits_apply(self, field: str, *payloads) -> float:
        """Overwrite `field` with the payload sum; return the local sum
        of squares for the global L2 normalization."""
        vec = np.zeros(self.n_local, np.float64)
        for pl in payloads:
            self._add_payload(vec, pl)
        setattr(self, "hits_" + field, vec)
        return float(np.dot(vec, vec))

    def hits_scale(self, field: str, c: float) -> float:
        """Scale `field` in place; return sum|new - prev| (L1 delta vs
        the previous scaled value of this field) for convergence."""
        vec = getattr(self, "hits_" + field)
        vec *= c
        prev = getattr(self, "_hits_prev", {}).get(field)
        delta = float(np.abs(vec - prev).sum()) if prev is not None else float("inf")
        if not hasattr(self, "_hits_prev"):
            self._hits_prev = {}
        self._hits_prev[field] = vec.copy()
        return delta

    def hits_get(self, field: str) -> np.ndarray:
        return getattr(self, "hits_" + field)

    def hits_table(self, auth_slice: np.ndarray) -> pa.Table:
        """Final assembly on the forward worker: own hub slice + the
        aligned reverse worker's authority slice (shipped by ObjectRef,
        never through the driver)."""
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            "hub": pa.array(self.hits_hub),
            "authority": pa.array(np.asarray(auth_slice, np.float64)),
        })

    # ---- single-pool spectral sweeps (eigenvector / Katz centrality) ------
    # Reuse the HITS sweep (per-destination pre-aggregated bincounts over
    # the forward CSR = one A^T x matvec slice) with different apply
    # rules.  Single pool: the inflow payloads land back on the same
    # workers, so no aligned reverse handle is needed.
    def hits_apply_shift(self, field: str, *payloads) -> float:
        """x <- (A^T x) + x  (the (I + A)^T shifted power iteration —
        same dominant eigenvector as A^T, immune to period-2 cycles).
        Returns the local sum of squares for the L2 barrier."""
        vec = np.zeros(self.n_local, np.float64)
        for pl in payloads:
            self._add_payload(vec, pl)
        vec += getattr(self, "hits_" + field)
        setattr(self, "hits_" + field, vec)
        return float(np.dot(vec, vec))

    def hits_apply_affine(self, field: str, a: float, b: float, *payloads) -> float:
        """x <- a * (A^T x) + b  (one Katz iteration).  Returns the
        local sum of squares (used only for the FINAL normalization)."""
        vec = np.zeros(self.n_local, np.float64)
        for pl in payloads:
            self._add_payload(vec, pl)
        vec = a * vec + b
        setattr(self, "hits_" + field, vec)
        return float(np.dot(vec, vec))

    def hits_field_table(self, field: str, colname: str) -> pa.Table:
        return pa.table({
            "node_id": pa.array(self.logical_ids),
            colname: pa.array(getattr(self, "hits_" + field)),
        })

    # ---- walk-phase checkpoint (VERDICT r02 missing #3) -------------------
    def walk_checkpoint(self, path: str) -> int:
        """Persist the pending batched walkers (cur, qidx, wt, wkey).
        Separate file from the state checkpoint because the walker count
        is unrelated to n_local.  At 10^9-walk scale this is what makes
        a dead driver resume mid-walk instead of replaying every hop."""
        if getattr(self, "_bpending", None) is not None:
            cur, qidx, wt, wkey = self._bpending
        else:
            cur = qidx = np.empty(0, np.int64)
            wt = np.empty(0, np.float64)
            wkey = np.empty(0, np.uint64)
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "cur": pa.array(np.asarray(cur, np.int64)),
            "qidx": pa.array(np.asarray(qidx, np.int64)),
            "wt": pa.array(np.asarray(wt, np.float64)),
            "wkey": pa.array(np.asarray(wkey, np.uint64), pa.uint64()),
        }), tmp)
        os.replace(tmp, path)
        return int(len(cur))

    def walk_restore(self, path: str) -> int:
        t = pq.read_table(path)
        if t.num_rows == 0:
            self._bpending = None
            return 0
        self._bpending = (
            t["cur"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["qidx"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["wt"].to_numpy(zero_copy_only=False).astype(np.float64),
            t["wkey"].to_numpy(zero_copy_only=False).astype(np.uint64),
        )
        return t.num_rows

    def set_sources(self, sources: list[int]):
        """Re-arm _sources after a walk-phase restore (dangling walkers
        restart at their query's source)."""
        self._sources = list(sources)
        return True

    # ---- checkpoint / restore (SURVEY 4.3) --------------------------------
    def checkpoint(self, path: str, fields=("reserve", "residual")) -> dict:
        """Persist state fields.  Batched (n_local, Q) matrices are
        written as one column per query (`field__q<i>`) so the parquet
        layout stays flat and restore can rebuild either shape."""
        arrays = {"node_id": self.logical_ids}
        for f in fields:
            v = getattr(self, f if f != "labels" else "labels")
            if getattr(v, "ndim", 1) == 2:
                for q in range(v.shape[1]):
                    arrays[f"{f}__q{q}"] = v[:, q]
            else:
                arrays[f] = v
        tmp = path + ".tmp"
        pq.write_table(pa.table({k: pa.array(v) for k, v in arrays.items()}), tmp)
        os.replace(tmp, path)
        return dict(self.counters)

    def restore(self, path: str, fields=("reserve", "residual")) -> bool:
        t = pq.read_table(path)
        for f in fields:
            if f in t.column_names:
                arr = t[f].to_numpy(zero_copy_only=False).copy()
            else:
                qcols = sorted(
                    (c for c in t.column_names if c.startswith(f + "__q")),
                    key=lambda c: int(c.rsplit("q", 1)[1]),
                )
                arr = np.stack(
                    [t[c].to_numpy(zero_copy_only=False) for c in qcols], axis=1
                ).copy()
            setattr(self, f, arr)
        if "reserve" in fields and (
            self.acc is None or np.shape(self.acc) != np.shape(self.reserve)
        ):
            self.acc = np.zeros_like(self.reserve)
        if "labels" in fields:
            self._changed = np.ones(self.n_local, dtype=bool)
        return True


# num_cpus=0 by default: supersteps are barrier-synchronized, so shard
# actors and Dataset tasks never compute at the same time — reserving a
# CPU per actor would deadlock a session whose CPU budget equals P
# (actors starve the Dataset stages).  On a production cluster pass
# worker_num_cpus=1 to GraphHandle.from_edges to give each shard a
# dedicated core.
ShardWorker = ray.remote(num_cpus=0)(ShardWorkerImpl)


@ray.remote
def _block_parts(tbl: pa.Table) -> list[int]:
    if tbl.num_rows == 0 or "part_id" not in tbl.schema.names:
        return []
    return tbl["part_id"].to_pylist()


@ray.remote
def _block_nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _with_rank(tbl: pa.Table, offset: int, col: str = "engine_id") -> pa.Table:
    return tbl.append_column(
        col, pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
    )


def _degrees_frame(degrees_ds):
    """Normalize a caller-supplied degrees Dataset to (node_id, deg).
    Accepts the ingest degrees table (node_id, out_deg[, in_deg]) or any
    (node_id, deg) table."""
    cols = degrees_ds.schema().names
    col = "deg" if "deg" in cols else "out_deg"
    return degrees_ds.select_columns(["node_id", col]).rename_columns(
        {col: "deg"} if col != "deg" else {}
    )


def _relabel_edges(edges_ds, perm_ref):
    """Relabel (src, dst) through a ray.put logical->engine permutation."""

    def relabel(t: pa.Table) -> pa.Table:
        pm = ray.get(perm_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(pm[src]), "dst": pa.array(pm[dst])})

    return edges_ds.map_batches(relabel, batch_format="pyarrow")


def _driver_degree_balance(edges_ds, n: int, degrees_ds=None):
    """Degree-descending rank permutation built on the driver (one O(n)
    int64 array — the fast path below GraphHandle's balance_threshold).
    `degrees_ds` (node_id, out_deg|deg) skips the degree-count pass —
    at the 100 TB tier recomputing out-degrees is a full extra scan of
    the edge table, and ingest has already produced them (M7).
    Returns (relabeled_edges_ds, perm logical->engine, inv engine->logical)."""
    from ..stages.shuffle import count_by_key

    if degrees_ds is not None:
        deg_pd = _degrees_frame(degrees_ds).to_pandas()
    else:
        deg_pd = count_by_key(
            edges_ds.select_columns(["src"]).rename_columns({"src": "node_id"}),
            "node_id", alias="deg",
        ).to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    deg[deg_pd["node_id"].to_numpy()] = deg_pd["deg"].to_numpy()
    order = np.lexsort((np.arange(n), -deg))  # degree desc, id asc
    perm = np.empty(n, dtype=np.int64)
    perm[order] = np.arange(n)  # logical -> engine (rank)
    return _relabel_edges(edges_ds, ray.put(perm)), perm, order


def _distributed_degree_balance(edges_ds, n: int, P: int,
                                num_partitions: int | None = None,
                                degrees_ds=None):
    """Degree-balanced permutation computed with NO O(n) driver array
    (the scale path behind GraphHandle balance='degree'):

      1. out-degrees by bucketed count; zero-degree nodes restored by a
         range left-join,
      2. engine_id = global rank under (deg desc, node_id asc) via a
         distributed sort + per-block offsets (same recipe as
         stages/ids.assign_node_ids),
      3. edges relabeled by two hash joins on the permutation table,
      4. per-worker id slices ((part_id, vals) rows) delivered as
         ObjectRefs — logical ids per engine partition for output
         mapping, engine ids per logical partition for to_engine
         lookups.

    Returns (relabeled_edges_ds, logical_block_refs, perm_block_refs)."""
    import pyarrow.compute as pc

    from ..stages.csr import _large_list
    from ..stages.shuffle import count_by_key, safe_join

    if degrees_ds is not None:
        # ingest degrees are already zero-filled over all n nodes (M7) —
        # no count pass, no range anti-join
        full = _degrees_frame(degrees_ds)
    else:
        deg_ds = count_by_key(
            edges_ds.select_columns(["src"]).rename_columns({"src": "node_id"}),
            "node_id", alias="deg",
        )
        full = safe_join(
            ray.data.range(n), deg_ds, on=("id",), right_on=("node_id",),
            join_type="left_outer", num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({
                "node_id": t["id"],
                "deg": pc.fill_null(t["deg"], 0),
            }) if t.num_rows and "id" in t.schema.names else pa.table({
                "node_id": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
    ranked = full.sort(["deg", "node_id"], descending=[True, False]).materialize()
    refs = ranked.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    perm_ds = ray.data.from_arrow_refs(
        [_with_rank.remote(r, int(o)) for r, o in zip(refs, offsets)]
    ).select_columns(["node_id", "engine_id"]).materialize()

    e1 = safe_join(
        edges_ds, perm_ds.rename_columns({"node_id": "s_id", "engine_id": "src_e"}),
        on=("src",), right_on=("s_id",), num_partitions=num_partitions,
    )
    e2 = safe_join(
        e1, perm_ds.rename_columns({"node_id": "d_id", "engine_id": "dst_e"}),
        on=("dst",), right_on=("d_id",), num_partitions=num_partitions,
    )
    # dst_l (the logical dst) rides into the CSR build as ind_logical —
    # the distributed tier's substitute for the driver-perm inverse
    # array, keeping walk/sample draws logical-ordered at any n
    relabeled = e2.map_batches(
        lambda t: pa.table({"src": t["src_e"], "dst": t["dst_e"], "dst_l": t["dst"]})
        if t.num_rows and "src_e" in t.schema.names
        else pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                       "dst_l": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )

    def _slices(key_col: str, val_col: str):
        def add_part(t: pa.Table) -> pa.Table:
            k = t[key_col].to_numpy(zero_copy_only=False)
            return t.append_column("part_id", pa.array((k % P).astype(np.int32)))

        def build(g: pa.Table) -> pa.Table:
            order = np.argsort(g[key_col].to_numpy(zero_copy_only=False), kind="stable")
            vals = g[val_col].to_numpy(zero_copy_only=False)[order]
            return pa.table({
                "part_id": pa.array([int(g["part_id"][0].as_py())], pa.int32()),
                "vals": _large_list(vals.astype(np.int64)),
            })

        slices = (
            perm_ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part_id").map_groups(build, batch_format="pyarrow")
            .materialize()
        )
        srefs = slices.to_arrow_refs()
        parts = ray.get([_block_parts.remote(r) for r in srefs])
        return {p: r for r, ps in zip(srefs, parts) for p in ps}

    logical_refs = _slices("engine_id", "node_id")  # engine part -> logical ids
    perm_refs = _slices("node_id", "engine_id")     # logical part -> engine ids
    return relabeled, logical_refs, perm_refs


class GraphHandle:
    """Shard manifest + live actor pool for one graph (SURVEY 3.3).

    balance='degree' (SURVEY 4.2 / north_star "degree-balanced CSR
    partitions"): engine node ids are the degree-descending rank of the
    logical ids, so plain mod-P partitioning deals hubs round-robin and
    every shard carries ~equal edge mass.  All worker internals stay on
    engine ids (O(1) routing, no lookup tables); outputs and label
    values are mapped back through per-shard logical-id slices, and
    query sources are translated once on the driver (``to_engine``)."""

    def __init__(self, workers, n: int, m: int, P: int, alpha: float = 0.2,
                 perm: np.ndarray | None = None,
                 inv: np.ndarray | None = None):
        self.workers, self.n, self.m, self.P, self.alpha = workers, n, m, P, alpha
        self.perm = perm  # logical -> engine, or None (identity)
        self.inv = inv    # engine -> logical, or None

    def to_engine(self, v: int) -> int:
        if self.perm is not None:
            return int(self.perm[v])
        if getattr(self, "remote_perm", False):
            # distributed balancing: the permutation lives sharded on the
            # workers (logical id v's engine id at worker v % P)
            return int(ray.get(self.workers[int(v) % self.P].lookup_engine.remote(int(v))))
        return int(v)

    def to_engine_array(self, arr) -> np.ndarray:
        """Vectorized logical -> engine translation.  Driver-perm tier:
        one array gather.  Distributed tier: batched per-owner worker
        lookups (each worker holds the perm slice for logical ids ≡ its
        part mod P) — sized for query/seed batches, not corpus columns."""
        arr = np.asarray(arr, dtype=np.int64)
        if self.perm is not None:
            return self.perm[arr]
        if getattr(self, "remote_perm", False):
            out = np.empty_like(arr)
            owner = arr % self.P
            parts = np.unique(owner)
            refs, masks = [], []
            for p in parts:
                m = owner == p
                refs.append(self.workers[int(p)].lookup_engine_batch.remote(arr[m]))
                masks.append(m)
            for m, vals in zip(masks, ray.get(refs)):
                out[m] = vals
            return out
        return arr

    def same_perm_as(self, other: "GraphHandle") -> bool:
        """True when both handles map logical ids to the SAME engine ids
        (both identity, or built from one shared driver permutation) —
        the contract the shard-aligned pairwise ops (bippr / hubppr /
        hits / scc) need so local indices pair 1:1 across the pools."""
        if getattr(self, "remote_perm", False) or getattr(other, "remote_perm", False):
            return False
        if self.perm is None and other.perm is None:
            return True
        return self.perm is not None and self.perm is other.perm

    @classmethod
    def from_edges(cls, edges_ds, n: int, P: int = 8, alpha: float = 0.2,
                   m: int | None = None, worker_num_cpus: float = 0,
                   balance: str | None = None,
                   balance_threshold: int = 20_000_000,
                   degrees=None, prewarm: bool = False,
                   perm: np.ndarray | None = None,
                   inv: np.ndarray | None = None):
        """Build CSR shards with one groupby shuffle, hand each actor a
        zero-copy ref to the block holding its partition.

        balance='degree' uses the driver-side permutation while
        n <= balance_threshold (one O(n) int64 array, metadata-sized at
        this tier) and switches to the fully distributed sort-rank +
        join relabel past it (no O(n) driver array; to_engine becomes a
        sharded worker lookup).

        `degrees` (node_id, out_deg|deg Dataset, zero-filled — e.g. the
        ingest degrees table) skips the balance path's degree-count
        pass: without it, balance='degree' re-scans the full edge table
        to count out-degrees — an entire extra pass at the 100 TB tier.

        `prewarm=True` fire-and-forgets a sweep-cache build on every
        worker right after spawn, so the first full-sweep call
        (PageRank / exact PPR) does not pay actor cold-start + O(m)
        cache construction inline; the build overlaps whatever the
        driver does next.  Opt-in because the cache costs ~16 B/edge of
        worker heap that walk-mode-only handles never need."""
        from ..stages.csr import build_csr_shards

        logical_refs = perm_refs = None
        if perm is not None:
            # externally shared permutation (pairwise fwd/rev handle
            # pairs: hits / scc / bippr / hubppr under degree balancing)
            if inv is None:
                inv = np.empty(n, dtype=np.int64)
                inv[perm] = np.arange(n)
            edges_ds = _relabel_edges(edges_ds, ray.put(perm))
        elif balance == "degree" and n > balance_threshold:
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
        worker_cls = (
            ShardWorker if worker_num_cpus == 0
            else ray.remote(num_cpus=worker_num_cpus)(ShardWorkerImpl)
        )
        workers = [
            worker_cls.remote(
                p, P, n, shard=ref_of_part.get(p), alpha=alpha,
                logical_ids=(inv[p::P] if inv is not None else None),
                logical_block=(logical_refs.get(p) if logical_refs else None),
                perm_block=(perm_refs.get(p) if perm_refs else None),
                inv_ref=inv_ref,
            )
            for p in range(P)
        ]
        if m is None:
            m = edges_ds.count()
        handle = cls(workers, n, m, P, alpha, perm=perm, inv=inv)
        handle.remote_perm = logical_refs is not None
        if prewarm:
            # refs kept on the handle so the calls are never cancelled;
            # nothing awaits them — the first sweep call finds the cache
            # built (or blocks only on the in-flight build, not a cold one)
            handle._prewarm_refs = [w.warm_sweep_cache.remote() for w in workers]
        return handle

    def close(self):
        """Kill shard actors and release their state."""
        for w in self.workers:
            ray.kill(w, no_restart=True)
        self.workers = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    @classmethod
    def from_reverse_edges(cls, edges_ds, n: int, P: int = 8, alpha: float = 0.2,
                           m: int | None = None, strategy: str = "auto",
                           perm: np.ndarray | None = None,
                           inv: np.ndarray | None = None):
        """Weighted reverse-graph handle for backward push (G5/BiPPR).
        Edge weights = 1/out_deg(original source), baked into the shards.
        strategy='broadcast' ships the degree vector once (fast path);
        'join' attaches weights by a degrees hash join and derives the
        dangling self-loops by range anti-join — no O(n) driver array
        (the 10^12-node path).  'auto' switches on n.

        `perm`/`inv`: share a forward handle's degree permutation (pass
        ``fwd.perm``, ``fwd.inv``) so the reverse pool is shard-aligned
        with it — edges are relabeled BEFORE weights are derived
        (out-degree is permutation-invariant, so the weights are the
        same numbers attached to relabeled ids)."""
        if perm is not None:
            if inv is None:
                inv = np.empty(n, dtype=np.int64)
                inv[perm] = np.arange(n)
            edges_ds = _relabel_edges(edges_ds, ray.put(perm))
        inv_ref = ray.put(inv) if inv is not None else None
        if strategy == "auto":
            strategy = "broadcast" if n <= 50_000_000 else "join"
        if strategy == "join":
            from ..stages.csr import build_weighted_reverse_shards_join

            shards = build_weighted_reverse_shards_join(edges_ds, n, P).materialize()
        else:
            from ..stages.csr import build_weighted_reverse_shards
            from ..stages.shuffle import count_by_key

            deg_pd = count_by_key(
                edges_ds.select_columns(["src"]).rename_columns({"src": "node_id"}),
                "node_id", alias="deg",
            ).to_pandas()
            out_deg = np.zeros(n, dtype=np.int64)
            if len(deg_pd) and "node_id" in deg_pd.columns:  # empty edge
                # table -> schema-less empty frame, no columns to index
                out_deg[deg_pd["node_id"].to_numpy()] = deg_pd["deg"].to_numpy()
            shards = build_weighted_reverse_shards(edges_ds, n, P, out_deg).materialize()
        refs = shards.to_arrow_refs()
        parts_per_block = ray.get([_block_parts.remote(r) for r in refs])
        ref_of_part = {}
        for ref, parts in zip(refs, parts_per_block):
            for p in parts:
                ref_of_part[p] = ref
        workers = [
            ShardWorker.remote(
                p, P, n, shard=ref_of_part.get(p), alpha=alpha,
                logical_ids=(inv[p::P] if inv is not None else None),
                inv_ref=inv_ref,
            )
            for p in range(P)
        ]
        if m is None:
            m = edges_ds.count()
        return cls(workers, n, m, P, alpha, perm=perm, inv=inv)

    @classmethod
    def from_dir(cls, shard_dir: str, alpha: float = 0.2):
        with open(os.path.join(shard_dir, "meta.json")) as f:
            meta = json.load(f)
        n, m, P = meta["n"], meta["m"], meta["P"]
        files = [
            os.path.join(shard_dir, "shards", f)
            for f in sorted(os.listdir(os.path.join(shard_dir, "shards")))
            if f.endswith(".parquet")
        ]
        # map part -> file via parquet metadata only
        part_file = {}
        for fp in files:
            t = pq.read_table(fp, columns=["part_id"])
            for p in t["part_id"].to_pylist():
                part_file[p] = fp
        workers = [
            ShardWorker.remote(p, P, n, shard_file=part_file.get(p), alpha=alpha)
            for p in range(P)
        ]
        return cls(workers, n, m, P, alpha)

    # ---- driver-side superstep helpers -----------------------------------
    def _exchange(self, round_method: str, apply_method: str, *args) -> list[dict]:
        """One superstep: invoke round on all workers (num_returns=P+1),
        route payload refs to owners' apply, barrier, return metas."""
        P = self.P
        outs = [
            getattr(w, round_method).options(num_returns=P + 1).remote(*args)
            for w in self.workers
        ]
        metas = ray.get([o[0] for o in outs])
        applies = []
        for p, w in enumerate(self.workers):
            payloads = [outs[q][p + 1] for q in range(P) if q != p]
            applies.append(getattr(w, apply_method).remote(*payloads))
        apply_results = ray.get(applies)
        return metas, apply_results

    def call_all(self, method: str, *args):
        return ray.get([getattr(w, method).remote(*args) for w in self.workers])

    def scores_dataset(self, nonzero_only: bool = True):
        refs = [w.get_scores.remote(nonzero_only) for w in self.workers]
        return ray.data.from_arrow_refs(refs)

    def scores_est_dataset(self, nonzero_only: bool = True):
        """reserve + acc estimates (unfolded top-k trials)."""
        refs = [w.get_scores_est.remote(nonzero_only) for w in self.workers]
        return ray.data.from_arrow_refs(refs)

    def labels_dataset(self):
        refs = [w.get_labels.remote() for w in self.workers]
        return ray.data.from_arrow_refs(refs)

    def counters(self) -> dict:
        per = self.call_all("get_counters")
        tot: dict = {}
        for c in per:
            for k, v in c.items():
                tot[k] = tot.get(k, 0) + v
        return tot
