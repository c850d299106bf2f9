"""Single-process reference of the P-shard FORA superstep protocol.

The engine's seeded modes (FORA push+walks, Monte-Carlo, FORA+ index,
batched multi-source) are *deterministic by construction*: counter-based
RNG (functions/hashing.py) plus a fixed superstep protocol (SURVEY 3.3,
graph/runtime.py module docstring) make every result a pure function of
(edge table, n, P, alpha, seed, parameters).  This module replays that
protocol in one process with plain numpy — no Ray, no actors, no object
store — and is the oracle behind the driver goldens for
fora_ppr / monte_carlo_ppr / ppr_batch / fora_indexed / topk_ppr.

What this establishes, and what it doesn't (SURVEY §5 layering):
- pytest verifies the FORA estimates against the *mathematical* oracle
  (numpy power iteration) within the paper's (eps, delta, pfail) bound —
  that gates the algorithm.
- this reference gates the *distributed execution*: payload routing,
  apply ordering, barrier placement, per-shard aggregation and the walk
  index must reproduce the single-process protocol bit-for-bit (modulo
  float summation order in the final accumulator, which the shared
  ROUND=9 rounding absorbs).

Protocol invariants mirrored here (changing any of them in runtime.py
must change this file too — the goldens would fail loudly):
- part(v) = v % P, local(v) = v // P; per-shard CSR sorted (local, dst).
- push round: apply incoming payloads (sender order q ascending, self
  skipped), inject dangling at the source, then drain every vertex with
  r > rmax * max(deg, 1); same-shard mass lands same round, cross-shard
  mass next round; terminate when active == 0 and dangling == 0.
- walk keys: mix64(seed, mix64(origin, k)); stop draw mix64(key, 2*hop),
  step draw mix64(key, 2*hop+1); dangling restarts at the source.
- batch mode: a row is drained when ANY query exceeds its threshold;
  per-query dangling returns to that query's source; walk keys
  mix64(mix64(seed, q), mix64(origin, k)).
- index walks: keys mix64(seed ^ 0xF0F0, mix64(origin, k)); dangling
  stores the -1 restart marker; query takes the first ceil(r*omega)
  endpoints per vertex and re-runs restart mass live with keys
  mix64(seed' ^ 0xABCD, mix64(source, k)).
"""

from __future__ import annotations

import math

import numpy as np

from .functions.hashing import mix64, rng_uniform
from .graph.algorithms import fora_params
from .stages.csr import n_local_of


class _ShardSim:
    """State + push kernel of one partition, mirroring ShardWorkerImpl's
    float-op order exactly (the residual at walk time feeds ceil())."""

    def __init__(self, p: int, P: int, n: int, src: np.ndarray, dst: np.ndarray,
                 alpha: float):
        self.p, self.P, self.n, self.alpha = p, P, n, alpha
        self.n_local = n_local_of(n, P, p)
        self.global_ids = np.arange(p, n, P, dtype=np.int64)
        m = (src % P) == p
        s, d = src[m], dst[m]
        loc = s // P
        order = np.lexsort((d, loc))
        counts = np.bincount(loc[order], minlength=self.n_local)
        self.indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.indices = d[order].astype(np.int64)
        self.out_deg = np.diff(self.indptr)
        self.reserve = self.residual = None

    def init_single(self, source: int):
        self.reserve = np.zeros(self.n_local)
        self.residual = np.zeros(self.n_local)
        if source % self.P == self.p:
            self.residual[source // self.P] = 1.0

    def init_batch(self, sources: list[int]):
        Q = len(sources)
        self.reserve = np.zeros((self.n_local, Q))
        self.residual = np.zeros((self.n_local, Q))
        for q, s in enumerate(sources):
            if s % self.P == self.p:
                self.residual[s // self.P, q] = 1.0

    def _gather(self, idx: np.ndarray):
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

    def push(self, rmax: float):
        """-> (active, dangling, payloads[q] = (local_ids, vals) | None)."""
        r = self.residual
        idx = np.nonzero(r > rmax * np.maximum(self.out_deg, 1))[0]
        payloads = [None] * self.P
        if idx.size == 0:
            return 0, 0.0, payloads
        ra = r[idx].copy()
        self.reserve[idx] += self.alpha * ra
        r[idx] = 0.0
        outflow = (1.0 - self.alpha) * ra
        d = self.out_deg[idx]
        dang = float(outflow[d == 0].sum())
        has = np.nonzero(d > 0)[0]
        if has.size:
            dsts, row = self._gather(idx[has])
            per_edge = (outflow[has] / d[has])[row]
            owner = (dsts % self.P).astype(np.int64)
            for q in np.unique(owner):
                m = owner == q
                uk, inv = np.unique(dsts[m] // self.P, return_inverse=True)
                acc = np.bincount(inv, weights=per_edge[m])
                if q == self.p:
                    np.add.at(r, uk, acc)
                else:
                    payloads[int(q)] = (uk.astype(np.int64), acc)
        return int(idx.size), dang, payloads

    def push_batch(self, rmax: float, sources: list[int]):
        """Batched push: row drained when ANY query exceeds threshold."""
        R = self.residual
        thresh = rmax * np.maximum(self.out_deg, 1)[:, None]
        rows = np.nonzero((R > thresh).any(axis=1))[0]
        payloads = [None] * self.P
        if rows.size == 0:
            return 0, np.zeros(R.shape[1]), payloads
        Ra = R[rows].copy()
        self.reserve[rows] += self.alpha * Ra
        R[rows] = 0.0
        outflow = (1.0 - self.alpha) * Ra
        d = self.out_deg[rows]
        dangling_vec = outflow[d == 0].sum(axis=0)
        has = np.nonzero(d > 0)[0]
        if has.size:
            dsts, row = self._gather(rows[has])
            vals = (outflow[has] / d[has][:, None])[row]
            owner = (dsts % self.P).astype(np.int64)
            for q in np.unique(owner):
                m = owner == q
                uk, inv = np.unique(dsts[m] // self.P, return_inverse=True)
                acc = np.zeros((uk.size, R.shape[1]))
                np.add.at(acc, inv, vals[m])
                if q == self.p:
                    np.add.at(R, uk, acc)
                else:
                    payloads[int(q)] = (uk.astype(np.int64), acc)
        return int(rows.size), dangling_vec, payloads


class _RevShardSim:
    """One weighted reverse-graph partition (backward push, G5/G6):
    mirrors ShardWorkerImpl with edge_weights + bpush_round_hub's
    float-op order (flat rmax threshold, no dangling redistribution)."""

    def __init__(self, p: int, P: int, n: int, src: np.ndarray, dst: np.ndarray,
                 w: np.ndarray, alpha: float):
        self.p, self.P, self.n, self.alpha = p, P, n, alpha
        self.n_local = n_local_of(n, P, p)
        self.global_ids = np.arange(p, n, P, dtype=np.int64)
        m = (src % P) == p
        s, d, wv = src[m], dst[m], w[m]
        loc = s // P
        order = np.lexsort((d, loc))
        counts = np.bincount(loc[order], minlength=self.n_local)
        self.indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.indices = d[order].astype(np.int64)
        self.weights = wv[order].astype(np.float64)
        self.out_deg = np.diff(self.indptr)
        self.reserve = self.residual = None
        self.oracle: dict = {}

    def init_single(self, target: int):
        self.reserve = np.zeros(self.n_local)
        self.residual = np.zeros(self.n_local)
        if target % self.P == self.p:
            self.residual[target // self.P] = 1.0

    def bpush_hub(self, rmax: float, hubs):
        """-> (active, consumed [(hub, r)], payloads) — hub rows drained
        by consumption, others by the weighted push (bpush_round_hub)."""
        r = self.residual
        idx = np.nonzero(r > rmax)[0]
        consumed: list = []
        if idx.size and hubs is not None and hubs.size:
            gid = self.global_ids[idx]
            is_hub = np.isin(gid, hubs)
            if is_hub.any():
                for lr in idx[is_hub]:
                    consumed.append((int(self.global_ids[lr]), float(r[lr])))
                    r[lr] = 0.0
                idx = idx[~is_hub]
        payloads = [None] * self.P
        if idx.size == 0:
            return 0, consumed, payloads
        ra = r[idx].copy()
        self.reserve[idx] += self.alpha * ra
        r[idx] = 0.0
        counts = self.out_deg[idx]
        if counts.sum():
            total = int(counts.sum())
            starts = self.indptr[idx]
            cum = np.concatenate([[0], np.cumsum(counts[:-1])])
            pos = np.arange(total, dtype=np.int64)
            row = np.repeat(np.arange(idx.size, dtype=np.int64), counts)
            eidx = np.repeat(starts, counts) + (pos - np.repeat(cum, counts))
            dsts = self.indices[eidx]
            per_edge = (1.0 - self.alpha) * ra[row] * self.weights[eidx]
            owner = (dsts % self.P).astype(np.int64)
            for q in np.unique(owner):
                m = owner == q
                uk, inv = np.unique(dsts[m] // self.P, return_inverse=True)
                acc = np.bincount(inv, weights=per_edge[m])
                if q == self.p:
                    np.add.at(r, uk, acc)
                else:
                    payloads[int(q)] = (uk.astype(np.int64), acc)
        return int(idx.size), consumed, payloads


class ProtocolSim:
    """P-shard protocol replay over one edge table (engine ids only —
    callers using balance='degree' must translate, as the driver does)."""

    def __init__(self, edges: np.ndarray, n: int, P: int = 4, alpha: float = 0.2):
        e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
        src, dst = e[:, 0], e[:, 1]
        self.n, self.P, self.alpha, self.m = n, P, alpha, len(e)
        self.shards = [_ShardSim(p, P, n, src, dst, alpha) for p in range(P)]
        # global CSR (sorted src, dst) for the walk phase: a vertex's
        # neighbor list here is identical to its shard-CSR list
        order = np.lexsort((dst, src))
        counts = np.bincount(src[order], minlength=n)
        self.gindptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.gindices = dst[order].astype(np.int64)
        self.gdeg = np.diff(self.gindptr)

    # ---- push loop (mirrors algorithms._push_loop round protocol) --------
    def _push_loop(self, source: int, rmax: float, max_rounds: int = 10_000):
        P = self.P
        inflight = None  # inflight[q][p]: payload from shard q to shard p
        dang = 0.0
        for _ in range(max_rounds):
            new_out, metas = [], []
            for p, sh in enumerate(self.shards):
                if inflight is not None:
                    for q in range(P):
                        if q != p and inflight[q][p] is not None:
                            ids, vals = inflight[q][p]
                            np.add.at(sh.residual, ids, vals)
                if dang and source % P == p:
                    sh.residual[source // P] += dang
                metas.append(sh.push(rmax))
                new_out.append(metas[-1][2])
            inflight = new_out
            dang = sum(m[1] for m in metas)
            active = sum(m[0] for m in metas)
            if active == 0 and dang == 0:
                break

    def _residual_dense(self) -> np.ndarray:
        r = np.zeros(self.n)
        for sh in self.shards:
            r[sh.global_ids] = sh.residual
        return r

    def _reserve_dense(self) -> np.ndarray:
        v = np.zeros(self.n)
        for sh in self.shards:
            v[sh.global_ids] = sh.reserve
        return v

    # ---- walk phase (global replay; every walker steps once per hop) -----
    def _spawn_from_residual(self, omega: float, seed: int):
        """Per shard, ascending local index — mirrors walk_init."""
        curs, wts, keys = [], [], []
        for sh in self.shards:
            r = sh.residual
            idx = np.nonzero(r > 0)[0]
            if idx.size == 0:
                continue
            omega_v = np.ceil(r[idx] * omega).astype(np.int64)
            wts.append(np.repeat(r[idx] / omega_v, omega_v))
            cur = np.repeat(sh.global_ids[idx], omega_v)
            total = int(omega_v.sum())
            cum = np.concatenate([[0], np.cumsum(omega_v[:-1])])
            k = np.arange(total, dtype=np.int64) - np.repeat(cum, omega_v)
            keys.append(mix64(np.uint64(seed), mix64(cur.astype(np.uint64), k.astype(np.uint64))))
            curs.append(cur)
            r[idx] = 0.0
        if not curs:
            return (np.empty(0, np.int64), np.empty(0), np.empty(0, np.uint64))
        return (np.concatenate(curs), np.concatenate(wts), np.concatenate(keys))

    def _walk(self, cur, wt, key, source: int, acc: np.ndarray):
        hop = 0
        while cur.size:
            stop = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop), np.uint64))) < self.alpha
            np.add.at(acc, cur[stop], wt[stop])
            alive = ~stop
            cur, wt, key = cur[alive], wt[alive], key[alive]
            if cur.size == 0:
                break
            d = self.gdeg[cur]
            dang = d == 0
            nxt = np.empty_like(cur)
            if dang.any():
                nxt[dang] = source
            ok = ~dang
            if ok.any():
                u2 = rng_uniform(mix64(key[ok], np.full(int(ok.sum()), np.uint64(2 * hop + 1), np.uint64)))
                choice = np.minimum((u2 * d[ok]).astype(np.int64), d[ok] - 1)
                nxt[ok] = self.gindices[self.gindptr[cur[ok]] + choice]
            cur = nxt
            hop += 1

    # ---- public queries (one per driver golden) --------------------------
    def fora_ppr(self, source: int, seed: int = 42, eps: float = 0.5,
                 delta: float | None = None, pfail: float | None = None,
                 rmax_scale: float = 1.0) -> np.ndarray:
        p = fora_params(self.n, self.m, eps, delta, pfail, rmax_scale)
        for sh in self.shards:
            sh.init_single(source)
        self._push_loop(source, p["rmax"])
        acc = np.zeros(self.n)
        cur, wt, key = self._spawn_from_residual(p["omega"], seed ^ (source * 0x9E3779B9))
        self._walk(cur, wt, key, source, acc)
        return self._reserve_dense() + acc

    def monte_carlo_ppr(self, source: int, seed: int = 42, eps: float = 0.5,
                        delta: float | None = None, pfail: float | None = None) -> np.ndarray:
        p = fora_params(self.n, self.m, eps, delta, pfail)
        for sh in self.shards:
            sh.init_single(source)
        acc = np.zeros(self.n)
        cur, wt, key = self._spawn_from_residual(p["omega"], seed ^ (source * 0x9E3779B9))
        self._walk(cur, wt, key, source, acc)
        return self._reserve_dense() + acc

    def ppr_batch(self, sources: list[int], seed: int = 42, eps: float = 0.5,
                  delta: float | None = None, pfail: float | None = None) -> np.ndarray:
        """-> dense (n, Q) estimate matrix."""
        p = fora_params(self.n, self.m, eps, delta, pfail)
        P, Q = self.P, len(sources)
        for sh in self.shards:
            sh.init_batch(sources)
        inflight, dang = None, None
        while True:
            new_out, metas = [], []
            for q_, sh in enumerate(self.shards):
                if inflight is not None:
                    for r_ in range(P):
                        if r_ != q_ and inflight[r_][q_] is not None:
                            ids, vals = inflight[r_][q_]
                            np.add.at(sh.residual, ids, vals)
                if dang is not None and np.sum(dang) > 0:
                    for q, s in enumerate(sources):
                        if dang[q] > 0 and s % P == q_:
                            sh.residual[s // P, q] += dang[q]
                metas.append(sh.push_batch(p["rmax"], sources))
                new_out.append(metas[-1][2])
            inflight = new_out
            dang = np.sum([np.asarray(m[1]) for m in metas], axis=0)
            active = sum(m[0] for m in metas)
            if active == 0 and dang.sum() == 0:
                break
        # batched walks: keys mix64(mix64(seed, q), mix64(origin, k))
        acc = np.zeros((self.n, Q))
        curs, qidxs, wts, keys = [], [], [], []
        for sh in self.shards:
            R = sh.residual
            loc, qs = np.nonzero(R > 0)
            if loc.size == 0:
                continue
            r = R[loc, qs]
            omega_v = np.ceil(r * p["omega"]).astype(np.int64)
            wts.append(np.repeat(r / omega_v, omega_v))
            cur = np.repeat(sh.global_ids[loc], omega_v)
            qi = np.repeat(qs.astype(np.int64), omega_v)
            total = int(omega_v.sum())
            cum = np.concatenate([[0], np.cumsum(omega_v[:-1])])
            k = np.arange(total, dtype=np.int64) - np.repeat(cum, omega_v)
            keys.append(mix64(
                mix64(np.uint64(seed), qi.astype(np.uint64)),
                mix64(cur.astype(np.uint64), k.astype(np.uint64)),
            ))
            curs.append(cur)
            qidxs.append(qi)
            R[loc, qs] = 0.0
        if curs:
            cur = np.concatenate(curs)
            qidx = np.concatenate(qidxs)
            wt = np.concatenate(wts)
            key = np.concatenate(keys)
            src_arr = np.asarray(sources, dtype=np.int64)
            hop = 0
            while cur.size:
                stop = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop), np.uint64))) < self.alpha
                np.add.at(acc, (cur[stop], qidx[stop]), wt[stop])
                alive = ~stop
                cur, qidx, wt, key = cur[alive], qidx[alive], wt[alive], key[alive]
                if cur.size == 0:
                    break
                d = self.gdeg[cur]
                dang_m = d == 0
                nxt = np.empty_like(cur)
                if dang_m.any():
                    nxt[dang_m] = src_arr[qidx[dang_m]]
                ok = ~dang_m
                if ok.any():
                    u2 = rng_uniform(mix64(key[ok], np.full(int(ok.sum()), np.uint64(2 * hop + 1), np.uint64)))
                    choice = np.minimum((u2 * d[ok]).astype(np.int64), d[ok] - 1)
                    nxt[ok] = self.gindices[self.gindptr[cur[ok]] + choice]
                cur = nxt
                hop += 1
        est = np.zeros((self.n, Q))
        for sh in self.shards:
            est[sh.global_ids] = sh.reserve
        return est + acc

    # ---- FORA+ index (G8) ------------------------------------------------
    def build_walk_index(self, seed: int = 42, eps: float = 0.5,
                         delta: float | None = None, pfail: float | None = None,
                         rmax_scale: float = 1.0) -> dict:
        p = fora_params(self.n, self.m, eps, delta, pfail, rmax_scale)
        wpd = p["rmax"] * p["omega"]
        # spawn ceil(wpd * max(deg,1)) walks per vertex, per shard
        curs, origins, kidxs, keys = [], [], [], []
        for sh in self.shards:
            K = np.ceil(wpd * np.maximum(sh.out_deg, 1)).astype(np.int64)
            total = int(K.sum())
            if total == 0:
                continue
            origin = np.repeat(sh.global_ids, K)
            cum = np.concatenate([[0], np.cumsum(K[:-1])])
            kidx = np.arange(total, dtype=np.int64) - np.repeat(cum, K)
            keys.append(mix64(np.uint64(seed) ^ np.uint64(0xF0F0),
                              mix64(origin.astype(np.uint64), kidx.astype(np.uint64))))
            curs.append(origin.copy())
            origins.append(origin)
            kidxs.append(kidx)
        cur = np.concatenate(curs)
        origin = np.concatenate(origins)
        kidx = np.concatenate(kidxs)
        key = np.concatenate(keys)
        ep_origin, ep_kidx, ep_end = [], [], []
        hop = 0
        while cur.size:
            stop = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop), np.uint64))) < self.alpha
            d = self.gdeg[cur]
            dang = (~stop) & (d == 0)
            done = stop | dang
            if done.any():
                ep_origin.append(origin[done])
                ep_kidx.append(kidx[done])
                ep_end.append(np.where(stop, cur, -1)[done])
            alive = ~done
            cur, origin, kidx, key, d = cur[alive], origin[alive], kidx[alive], key[alive], d[alive]
            if cur.size:
                u2 = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop + 1), np.uint64)))
                choice = np.minimum((u2 * d).astype(np.int64), d - 1)
                cur = self.gindices[self.gindptr[cur] + choice]
            hop += 1
        o = np.concatenate(ep_origin)
        k_ = np.concatenate(ep_kidx)
        e_ = np.concatenate(ep_end)
        order = np.lexsort((k_, o))
        o, e_ = o[order], e_[order]
        counts = np.bincount(o, minlength=self.n)
        self.idx_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.idx_endpoints = e_
        return p

    def fora_indexed(self, source: int, seed: int = 42, eps: float = 0.5,
                     delta: float | None = None, pfail: float | None = None,
                     rmax_scale: float = 1.0) -> np.ndarray:
        p = fora_params(self.n, self.m, eps, delta, pfail, rmax_scale)
        for sh in self.shards:
            sh.init_single(source)
        self._push_loop(source, p["rmax"])
        acc = np.zeros(self.n)
        restart_mass = 0.0
        for sh in self.shards:  # walk_from_index, per shard ascending p
            r = sh.residual
            idx = np.nonzero(r > 0)[0]
            shard_restart = 0.0
            if idx.size:
                omega_v = np.ceil(r[idx] * p["omega"]).astype(np.int64)
                gids = sh.global_ids[idx]
                stored = self.idx_indptr[gids + 1] - self.idx_indptr[gids]
                take = np.minimum(omega_v, stored)
                total = int(take.sum())
                wt_per = r[idx] / omega_v
                if total:
                    cum = np.concatenate([[0], np.cumsum(take[:-1])])
                    pos = np.arange(total, dtype=np.int64)
                    rows = np.repeat(np.arange(idx.size), take)
                    eidx = np.repeat(self.idx_indptr[gids], take) + (pos - np.repeat(cum, take))
                    eps_ = self.idx_endpoints[eidx]
                    wts = wt_per[rows]
                    live = eps_ < 0
                    shard_restart += float(wts[live].sum())
                    np.add.at(acc, eps_[~live], wts[~live])
                short = omega_v - take
                if short.sum():
                    shard_restart += float((wt_per * short).sum())
                r[idx] = 0.0
            restart_mass += shard_restart  # shard order = meta-sum order
        if restart_mass > 0:
            seed2 = seed ^ (source * 0x9E3779B9)
            count = max(int(math.ceil(restart_mass * p["omega"])), 1)
            wt = np.full(count, restart_mass / count)
            cur = np.full(count, source, dtype=np.int64)
            k = np.arange(count, dtype=np.int64)
            key = mix64(np.uint64(seed2) ^ np.uint64(0xABCD),
                        mix64(cur.astype(np.uint64), k.astype(np.uint64)))
            self._walk(cur, wt, key, source, acc)
        return self._reserve_dense() + acc

    def topk_ppr(self, source: int, k: int, seed: int = 42, eps: float = 0.5,
                 pfail: float | None = None, max_iters: int = 8):
        """Mirrors algorithms.topk_ppr's tightening-delta driver loop
        WITH push-state reuse (paper Alg.5 shape): each trial continues
        the previous trial's (reserve, residual) push at the halved
        rmax; walks run per trial on a residual snapshot and accumulate
        into a cleared acc (estimate = reserve + acc, never folded).
        Returns (node_ids, ppr) of the final top-k, sorted
        (ppr desc, node_id asc)."""
        delta = max(1.0 / max(k, 1), 1.0 / self.n)
        for sh in self.shards:
            sh.init_single(source)
        est = None
        for i in range(max_iters):
            p = fora_params(self.n, self.m, eps, delta, pfail)
            self._push_loop(source, p["rmax"])
            snaps = [sh.residual.copy() for sh in self.shards]
            acc = np.zeros(self.n)
            cur, wt, key = self._spawn_from_residual(
                p["omega"], (seed + i) ^ (source * 0x9E3779B9))
            self._walk(cur, wt, key, source, acc)
            est = self._reserve_dense() + acc
            nz = np.nonzero(est)[0]
            order = nz[np.lexsort((nz, -est[nz]))][: k + 1]
            vals = est[order]
            at_floor = delta <= 1.0 / self.n + 1e-18
            if len(vals) >= k:
                lb_k = max(vals[k - 1] / (1.0 + eps), 0.0)
                if len(vals) > k:
                    ub_next = max(vals[k] / (1.0 - eps), delta * (1.0 + eps))
                else:
                    ub_next = delta * (1.0 + eps)
                if lb_k >= ub_next:
                    break
            if at_floor:
                break
            for sh, snap in zip(self.shards, snaps):
                sh.residual = snap
            delta = max(delta / 4.0, 1.0 / self.n)
        nz = np.nonzero(est)[0]
        order = nz[np.lexsort((nz, -est[nz]))][:k]
        return order, est[order]

    # ---- G6 HubPPR replay (runtime hub_index_* / bpush_round_hub /
    # walk_round(use_hubs=True); invariants: hub-index walk keys
    # mix64(seed^0x4855, mix64(origin, kidx)) with absorb-dangling
    # endpoints; consumption slot mix64(key^0x4855B, hop) % pool;
    # backward rounds apply payloads (q ascending) THEN last round's
    # consumed (hub, r) pairs (collected shard-ascending), then drain
    # hubs by consumption and non-hubs by weighted push) ------------------

    def _ensure_reverse(self):
        """Weighted reverse shard sims (csr.build_weighted_reverse_shards:
        reversed edges weighted 1/out_deg(orig src), dangling self-loops
        weight 1, per-shard lexsort (local, dst))."""
        if getattr(self, "rshards", None) is not None:
            return
        src = np.repeat(np.arange(self.n, dtype=np.int64), self.gdeg)
        dst = self.gindices
        w = 1.0 / np.maximum(self.gdeg[src], 1.0)
        dang = np.nonzero(self.gdeg == 0)[0]
        rsrc = np.concatenate([dst, dang])
        rdst = np.concatenate([src, dang])
        rw = np.concatenate([w, np.ones(dang.size)])
        self.rshards = [
            _RevShardSim(p, self.P, self.n, rsrc, rdst, rw, self.alpha)
            for p in range(self.P)
        ]

    def _select_hubs(self, deg: np.ndarray, H: int) -> np.ndarray:
        """Top-H by (deg desc, id asc) — the per-shard top-H + merge in
        algorithms.select_hubs realizes the same global total order."""
        if H <= 0:
            return np.empty(0, np.int64)
        ids = np.arange(deg.size, dtype=np.int64)
        order = np.lexsort((ids, -deg))[:H]
        return np.sort(ids[order])

    def select_hubs_fwd(self, H: int) -> np.ndarray:
        return self._select_hubs(self.gdeg, H)

    def select_hubs_bwd(self, H: int) -> np.ndarray:
        self._ensure_reverse()
        rdeg = np.zeros(self.n, dtype=np.int64)
        for sh in self.rshards:
            rdeg[sh.global_ids] = sh.out_deg
        return self._select_hubs(rdeg, H)

    def build_hub_index(self, hub_ids, pool_size: int, seed: int = 42) -> None:
        curs, origins, kidxs, keys = [], [], [], []
        hub_ids = np.asarray(hub_ids, dtype=np.int64)
        for sh in self.shards:
            mine = np.sort(hub_ids[hub_ids % self.P == sh.p])
            if mine.size == 0:
                continue
            origin = np.repeat(mine, pool_size)
            kidx = np.tile(np.arange(pool_size, dtype=np.int64), mine.size)
            keys.append(mix64(np.uint64(seed) ^ np.uint64(0x4855),
                              mix64(origin.astype(np.uint64), kidx.astype(np.uint64))))
            curs.append(origin.copy())
            origins.append(origin)
            kidxs.append(kidx)
        if not curs:
            self.hub_indptr = np.zeros(self.n + 1, np.int64)
            self.hub_endpoints = np.empty(0, np.int64)
            return
        cur = np.concatenate(curs)
        origin = np.concatenate(origins)
        kidx = np.concatenate(kidxs)
        key = np.concatenate(keys)
        ep_origin, ep_kidx, ep_end = [], [], []
        hop = 0
        while cur.size:
            stop = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop), np.uint64))) < self.alpha
            d = self.gdeg[cur]
            dang = (~stop) & (d == 0)
            done = stop | dang
            if done.any():
                ep_origin.append(origin[done])
                ep_kidx.append(kidx[done])
                ep_end.append(cur[done])  # absorb: dangling stores itself
            alive = ~done
            cur, origin, kidx, key, d = cur[alive], origin[alive], kidx[alive], key[alive], d[alive]
            if cur.size:
                u2 = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop + 1), np.uint64)))
                choice = np.minimum((u2 * d).astype(np.int64), d - 1)
                cur = self.gindices[self.gindptr[cur] + choice]
            hop += 1
        o = np.concatenate(ep_origin)
        k_ = np.concatenate(ep_kidx)
        e_ = np.concatenate(ep_end)
        order = np.lexsort((k_, o))
        o, e_ = o[order], e_[order]
        counts = np.bincount(o, minlength=self.n)
        self.hub_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.hub_endpoints = e_

    def build_backward_hub_oracle(self, hub_ids, rmax_hub: float,
                                  max_rounds: int = 10_000) -> None:
        self._ensure_reverse()
        hub_ids = np.sort(np.asarray(hub_ids, dtype=np.int64))
        self.bwd_hub_ids = hub_ids
        for sh in self.rshards:
            sh.oracle = {}
        for h in hub_ids:
            self._bpush_loop(int(h), rmax_hub, hubs=None, max_rounds=max_rounds)
            for sh in self.rshards:
                nzr = np.nonzero(sh.reserve)[0]
                nzd = np.nonzero(sh.residual)[0]
                sh.oracle[int(h)] = (
                    nzr.astype(np.int64), sh.reserve[nzr].copy(),
                    nzd.astype(np.int64), sh.residual[nzd].copy(),
                )

    def _bpush_loop(self, target: int, rmax: float, hubs,
                    max_rounds: int = 10_000):
        """Backward push rounds; hubs=array enables oracle short-circuit
        (mirrors the hubppr driver loop + bpush_round_hub)."""
        P = self.P
        for sh in self.rshards:
            sh.init_single(target)
        inflight = None
        consumed: list = []
        for _ in range(max_rounds):
            new_out, metas = [], []
            for p, sh in enumerate(self.rshards):
                if inflight is not None:
                    for q in range(P):
                        if q != p and inflight[q][p] is not None:
                            ids, vals = inflight[q][p]
                            np.add.at(sh.residual, ids, vals)
                for h, rv in consumed:
                    sl = sh.oracle.get(int(h)) if getattr(sh, "oracle", None) else None
                    if sl is not None:
                        res_ids, res_vals, rsd_ids, rsd_vals = sl
                        if res_ids.size:
                            sh.reserve[res_ids] += rv * res_vals
                        if rsd_ids.size:
                            sh.residual[rsd_ids] += rv * rsd_vals
                metas.append(sh.bpush_hub(rmax, hubs))
                new_out.append(metas[-1][2])
            inflight = new_out
            consumed = [pair for m in metas for pair in m[1]]
            active = sum(m[0] for m in metas)
            if active == 0 and not consumed:
                break

    def hubppr(self, source: int, target: int, eps: float = 0.5,
               seed: int = 42) -> float:
        """Pairwise estimate replay of algorithms.hubppr (call
        build_hub_index + build_backward_hub_oracle first)."""
        self._ensure_reverse()
        n = self.n
        rmax_b = eps / math.sqrt(max(n, 2))
        self._bpush_loop(target, rmax_b, hubs=self.bwd_hub_ids)
        sh_s = self.rshards[source % self.P]
        reserve_t_source = float(sh_s.reserve[source // self.P])
        W = int(math.ceil(16.0 * math.log(max(n, 2)) / (eps * eps)))
        seed2 = seed ^ (source * 0x85EBCA6B)
        wt = np.full(W, 1.0 / W)
        cur = np.full(W, source, dtype=np.int64)
        kidx = np.arange(W, dtype=np.int64)
        key = mix64(np.uint64(seed2) ^ np.uint64(0xABCD),
                    mix64(cur.astype(np.uint64), kidx.astype(np.uint64)))
        acc = np.zeros(n)
        hop = 0
        while cur.size:
            # hub consumption BEFORE the stop draw (walk_round use_hubs)
            pool = self.hub_indptr[cur + 1] - self.hub_indptr[cur]
            hit = pool > 0
            if hit.any():
                slot = (
                    mix64(key[hit] ^ np.uint64(0x4855B),
                          np.full(int(hit.sum()), np.uint64(hop), np.uint64))
                    % pool[hit].astype(np.uint64)
                ).astype(np.int64)
                ep = self.hub_endpoints[self.hub_indptr[cur[hit]] + slot]
                np.add.at(acc, ep, wt[hit])
                keep = ~hit
                cur, wt, key = cur[keep], wt[keep], key[keep]
                if cur.size == 0:
                    break
            stop = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop), np.uint64))) < self.alpha
            np.add.at(acc, cur[stop], wt[stop])
            alive = ~stop
            cur, wt, key = cur[alive], wt[alive], key[alive]
            if cur.size == 0:
                break
            d = self.gdeg[cur]
            dang = d == 0
            if dang.any():  # source=-1: absorb at the dangling node
                np.add.at(acc, cur[dang], wt[dang])
                ok = ~dang
                cur, wt, key, d = cur[ok], wt[ok], key[ok], d[ok]
                if cur.size == 0:
                    break
            u2 = rng_uniform(mix64(key, np.full(cur.size, np.uint64(2 * hop + 1), np.uint64)))
            choice = np.minimum((u2 * d).astype(np.int64), d - 1)
            cur = self.gindices[self.gindptr[cur] + choice]
            hop += 1
        dots = []
        for sh in self.rshards:
            nz = np.nonzero(sh.residual)[0]
            dots.append(float(acc[sh.global_ids][nz] @ sh.residual[nz]))
        return float(reserve_t_source) + float(sum(dots))
