"""Single-source shortest paths (directed, weighted) — frontier BSP.

Beyond the north rule's four algorithms; included because SSSP is the
canonical second Pregel application the reference's README points at
(/root/reference/README.md:146-153) and exercises the min-combiner path
with a shrinking frontier.

dist starts at 0 for the source, +inf elsewhere; each superstep the
changed frontier relaxes its out-edges (messages = dist[src] + w,
combined by Min map-side via masked minimum.reduceat and again at apply);
terminates when no distance improves. Matches a NumPy Bellman-Ford oracle
exactly (same +/min algebra, no float reassociation).
"""

from __future__ import annotations

import numpy as np

from .base import Algorithm

INF = np.inf


class ShortestPaths(Algorithm):
    name = "sssp"
    directed = True
    supports_chaining = True  # metrics/agg-only cross-step globals

    def __init__(self, source_vid: int, max_iters: int | None = None):
        self.source = int(source_vid)
        self.max_iters = max_iters  # fixed-iteration mode for oracle parity

    def init(self, part, n_local, pmeta, ctx):
        P = ctx["P"]
        dist = np.full(n_local, INF)
        changed = np.zeros(n_local, np.uint8)
        if self.source % P == part and self.source // P < n_local:
            dist[self.source // P] = 0.0
            changed[self.source // P] = 1
        return {"dist": dist, "changed": changed}, {"active": int(changed.sum())}

    def scatter(self, shard, pmeta, state, ctx):
        mask = state["changed"][shard["src_local"]].astype(bool)
        if not mask.any():
            return []
        dst = shard["dst"][mask]  # stays dst-sorted under the mask
        cand = state["dist"][shard["src_local"][mask]] + shard["w"][mask]
        dst_u, d_min = self.combine_by_dst(dst, cand, ufunc=np.minimum)
        return self.split_by_dst_part(ctx["P"], dst_u, {"m": d_min})

    def apply(self, part, pmeta, state, msgs, ctx):
        dist = state["dist"].copy()
        P = ctx["P"]
        changed = np.zeros(len(dist), np.uint8)
        nmsg = 0
        if msgs is not None and len(msgs["dst"]):
            nmsg = int(len(msgs["dst"]))
            dst_u, m_min = self.combine_by_dst(msgs["dst"], msgs["m"], ufunc=np.minimum)
            li = dst_u // P
            better = m_min < dist[li]
            dist[li[better]] = m_min[better]
            changed[li[better]] = 1
        return (
            {"dist": dist, "changed": changed},
            {"active": int(changed.sum()), "nmsg": nmsg},
            None,
        )

    def should_stop(self, metrics, superstep):
        if self.max_iters is not None:
            return superstep >= self.max_iters
        return metrics.active == 0
