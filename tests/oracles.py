"""Straight-line NumPy/SciPy oracles (FIXTURES.md §4) — the conformance
definition for every engine algorithm."""

from __future__ import annotations

import numpy as np


def pagerank_oracle(
    src, dst, w, n, damping=0.85, tol=1e-9, max_iter=1000, fixed_iters=None
):
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.asarray(w, np.float64)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    dangling = out_w == 0
    w_norm = w / out_w[src]
    r = np.full(n, 1.0 / n)
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        recv = np.zeros(n)
        np.add.at(recv, dst, r[src] * w_norm)
        dm = r[dangling].sum()
        r_new = (1 - damping) / n + damping * (recv + dm / n)
        l1 = np.abs(r_new - r).sum()
        r = r_new
        if fixed_iters is None and l1 < tol:
            break
    return r


def cc_oracle(src, dst, n):
    """Undirected connected components via union-find, canonical
    min-vertex-id labels (no scipy in this environment)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(np.asarray(src), np.asarray(dst)):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    # root chosen as min via union direction; canonicalize anyway
    canon = {}
    for i, r in enumerate(roots):
        canon.setdefault(int(r), i)
    return np.array([canon[int(r)] for r in roots], dtype=np.int64)


def lpa_oracle(src, dst, w, n, max_iters=20):
    """Synchronous weighted label propagation: every vertex adopts the label
    with the max incident weight among neighbor labels (tie → min label);
    undirected edges expected already symmetrized; self never votes.
    Stops early when no label changes."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.asarray(w, np.float64)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iters):
        new = labels.copy()
        for v in range(n):
            mask = dst == v
            if not mask.any():
                continue
            nb = labels[src[mask]]
            wt = w[mask]
            tot: dict[int, float] = {}
            for lab, ww in zip(nb, wt):
                tot[int(lab)] = tot.get(int(lab), 0.0) + ww
            best = max(tot.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangles_oracle(src, dst, n):
    """Undirected triangle counts: total and per-vertex, via dense
    A²∘A (test graphs are small). Input may contain both directions
    and/or duplicates; dedup to simple undirected edges."""
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    a = np.zeros((n, n), dtype=np.int64)
    a[lo[keep], hi[keep]] = 1
    a = np.maximum(a, a.T)
    per_vertex = ((a @ a) * a).sum(axis=1) // 2
    total = int(per_vertex.sum() // 3)
    return total, per_vertex.astype(np.int64)


def sssp_oracle(src, dst, w, n, source, iters=None):
    """Bellman-Ford rounds (synchronous relaxation — one round = one BSP
    superstep of algorithms/sssp.py)."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.asarray(w, np.float64)
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    rounds = iters if iters is not None else n
    for _ in range(rounds):
        cand = dist[src] + w
        new = dist.copy()
        np.minimum.at(new, dst, cand)
        if np.array_equal(
            np.nan_to_num(new, posinf=1e300), np.nan_to_num(dist, posinf=1e300)
        ):
            break
        dist = new
    return dist


def ppr_oracle(src, dst, w, n, sources, damping=0.85, fixed_iters=20):
    """Personalized PageRank power iteration (teleport + dangling mass to
    the uniform source-set vector) — mirrors algorithms/pagerank.py::
    PersonalizedPageRank in straight NumPy."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.asarray(w, np.float64)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    dangling = out_w == 0
    w_norm = w / out_w[src]
    e = np.zeros(n)
    e[np.asarray(sources)] = 1.0 / len(sources)
    r = e.copy()
    for _ in range(fixed_iters):
        recv = np.zeros(n)
        np.add.at(recv, dst, r[src] * w_norm)
        dm = r[dangling].sum()
        r = (1 - damping) * e + damping * (recv + dm * e)
    return r
