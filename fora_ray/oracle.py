"""Single-process reference oracles (SURVEY.md section 5.2).

These define the behavioral contract the distributed engine must match:

- ``ppr_power_iteration`` — exact PPR/PageRank by iterated residual
  propagation, identical semantics to forward push to convergence
  (alpha-mass conservation; dangling mass returns to the source
  distribution — the convention fixed in SURVEY 2.4 G1).
- ``cc_oracle`` — union-find; component label = min node id.
- ``lpa_oracle`` — synchronous label propagation, most-frequent
  neighbor label, deterministic smallest-label tie-break (SURVEY G10).
- ``triangles_oracle`` — per-vertex triangle counts on the
  symmetrized simple graph.

numpy only; no Ray anywhere.
"""

from __future__ import annotations

import numpy as np


def _adj(edges: np.ndarray, n: int):
    """CSR over the full graph from an (E,2) edge array."""
    if len(edges) == 0:
        return np.zeros(n + 1, dtype=np.int64), np.empty(0, dtype=np.int64)
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    src, dst = edges[order, 0], edges[order, 1]
    counts = np.bincount(src, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return indptr, dst.astype(np.int64)


def ppr_power_iteration(
    edges: np.ndarray,
    n: int,
    alpha: float = 0.2,
    source: int | None = None,
    tol: float = 1e-14,
    max_iter: int = 2000,
    dangling: str = "source",
) -> np.ndarray:
    """Exact (to tol) PPR vector.  source=None -> global PageRank
    (uniform source distribution).  Returns dense float64 of size n.

    dangling='source' (engine forward convention: mass restarts at the
    source distribution) or 'selfloop' (BiPPR backward-push convention:
    dangling nodes hold their mass)."""
    indptr, indices = _adj(np.asarray(edges, dtype=np.int64).reshape(-1, 2), n)
    deg = np.diff(indptr)
    s = np.full(n, 1.0 / n) if source is None else None
    q = s.copy() if source is None else np.zeros(n)
    if source is not None:
        q[source] = 1.0
    pi = np.zeros(n)
    for _ in range(max_iter):
        pi += alpha * q
        nz = np.nonzero(q)[0]
        nxt = np.zeros(n)
        dangling_acc = 0.0
        for v in nz:
            mass = (1.0 - alpha) * q[v]
            if deg[v] == 0:
                if dangling == "selfloop":
                    nxt[v] += mass
                else:
                    dangling_acc += mass
            else:
                nxt[indices[indptr[v] : indptr[v + 1]]] += mass / deg[v]
        if dangling_acc > 0:
            if source is None:
                nxt += dangling_acc * s
            else:
                nxt[source] += dangling_acc
        q = nxt
        if q.sum() < tol:
            break
    return pi


def ppr_column_oracle(
    edges: np.ndarray,
    n: int,
    target: int,
    alpha: float = 0.2,
    tol: float = 1e-14,
    max_iter: int = 5000,
) -> np.ndarray:
    """Exact column of the PPR matrix: x[v] ~= pi(v -> target) for every
    v, under the BiPPR dangling-self-loop convention (the backward-push
    operand, SURVEY 2.4 G5).  Fixed point of
        x = alpha * e_t + (1-alpha) * P x
    where P is the out-transition matrix with self-loops at dangling
    nodes; contraction factor (1-alpha) guarantees convergence."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    src, dst = e[:, 0], e[:, 1]
    deg = np.bincount(src, minlength=n).astype(np.float64)
    et = np.zeros(n)
    et[target] = alpha
    x = np.zeros(n)
    for _ in range(max_iter):
        y = np.zeros(n)
        np.add.at(y, src, x[dst])
        y = np.where(deg > 0, y / np.maximum(deg, 1.0), x)  # selfloop when dangling
        x_new = et + (1.0 - alpha) * y
        if np.abs(x_new - x).max() < tol:
            x = x_new
            break
        x = x_new
    return x


def cc_oracle(edges: np.ndarray, n: int) -> np.ndarray:
    """Connected components on the undirected view; label = min node id."""
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in np.asarray(edges, dtype=np.int64).reshape(-1, 2):
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def lpa_oracle(edges_sym: np.ndarray, n: int, max_rounds: int = 20) -> np.ndarray:
    """Synchronous LPA over the symmetrized edge list: every round each
    vertex adopts the most frequent label among its neighbors (previous
    round's labels), tie-break = smallest label; isolated vertices keep
    their label.  Stops on convergence or after max_rounds."""
    indptr, indices = _adj(np.asarray(edges_sym, dtype=np.int64).reshape(-1, 2), n)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        new = labels.copy()
        for v in range(n):
            nb = indices[indptr[v] : indptr[v + 1]]
            if nb.size == 0:
                continue
            lab = labels[nb]
            vals, counts = np.unique(lab, return_counts=True)
            new[v] = vals[np.argmax(counts)]  # np.unique sorts -> ties pick smallest
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangles_oracle(edges_sym: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Per-vertex triangle counts + global count on the undirected simple
    graph (each triangle counted once globally, once per member vertex)."""
    e = np.asarray(edges_sym, dtype=np.int64).reshape(-1, 2)
    und = e[e[:, 0] < e[:, 1]]  # each undirected edge once
    adj = [set() for _ in range(n)]
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for u, v in und:
        common = adj[u] & adj[v]
        for w in common:
            if w > v:  # u < v < w: count each triangle once
                per[u] += 1
                per[v] += 1
                per[w] += 1
                total += 1
    return per, total


def kcore_oracle(edges_sym: np.ndarray, n: int) -> np.ndarray:
    """Core numbers by classic iterative peeling (Batagelj–Zaveršnik
    style, queue-based): repeatedly remove every vertex whose remaining
    degree is below k, for k ascending; a vertex removed during stage k
    has core number k - 1.  Independent of the engine's h-index
    iteration (Lü et al., PNAS 2016) — agreement is real evidence."""
    from collections import deque

    e = np.asarray(edges_sym, dtype=np.int64).reshape(-1, 2)
    indptr, indices = _adj(e, n)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64).copy()
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    remaining = n
    k = 1
    while remaining > 0:
        dq = deque(np.nonzero(alive & (deg < k))[0].tolist())
        while dq:
            v = dq.popleft()
            if not alive[v]:
                continue
            alive[v] = False
            core[v] = k - 1
            remaining -= 1
            for u in indices[indptr[v]: indptr[v + 1]]:
                if alive[u]:
                    deg[u] -= 1
                    if deg[u] < k:
                        dq.append(int(u))
        k += 1
    return core


def scc_oracle(edges: np.ndarray, n: int) -> np.ndarray:
    """Strongly connected components via iterative Tarjan; label = the
    smallest node id in each SCC (matching the engine's min-label
    convention).  Independent of the distributed kernels."""
    indptr, indices = _adj(edges, n)
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # iterative Tarjan: frames of (node, next-edge-offset)
        work = [(root, indptr[root])]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, ei = work[-1]
            if ei < indptr[v + 1]:
                work[-1] = (v, ei + 1)
                w = int(indices[ei])
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, indptr[w]))
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            else:
                work.pop()
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])
                if low[v] == index[v]:
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        members.append(w)
                        if w == v:
                            break
                    label = min(members)
                    for w in members:
                        comp[w] = label
    return comp
