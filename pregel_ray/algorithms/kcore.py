"""K-core decomposition (fixed k) via synchronous BSP peeling.

The first scatter (of state_0) is a degree census: +1 over every
undirected arc, sum-combined map-side (the reference's eager-combiner
analogue, queue.lua:39-52). The first apply installs degrees and kills
deg < k vertices (peel 1); every later round, vertices that just fell
out of the core send −1 to their neighbors and survivors re-test
deg ≥ k. One superstep == one synchronous peel; termination when a peel
removes nobody (quiescence, master.lua:77-84).

Phase is tracked IN STATE (`censused`), not by the superstep counter:
the engine scatters twice at superstep 1 (once from state_0 in
init_state, once fused after the first apply — engine.py init_state /
run), so a counter branch would re-send the census.

Final state: alive == membership in the k-core; deg of an alive vertex
== its degree WITHIN the core (initial degree minus one decrement per
dead neighbor — each dead vertex scatters exactly once, on its death
superstep).

Scale shape: identical to CC — frontier-filtered scatter (only dying
vertices emit), message volume bounded by Σ deg(dead), no global state
beyond the summed metrics.
"""

from __future__ import annotations

import numpy as np

from .base import Algorithm


class KCore(Algorithm):
    name = "kcore"
    directed = False
    supports_chaining = True  # cross-step globals are metrics-only

    def __init__(self, k: int):
        assert k >= 1
        self.k = k

    def init(self, part, n_local, pmeta, ctx):
        return (
            {
                "deg": np.zeros(n_local, np.int64),
                "alive": np.ones(n_local, np.uint8),
                "newly_dead": np.zeros(n_local, np.uint8),
                "censused": np.zeros(n_local, np.uint8),
            },
            {"active": n_local},
        )

    def scatter(self, shard, pmeta, state, ctx):
        P = ctx["P"]
        if len(state["censused"]) and not state["censused"][0]:
            # scatter of state_0: degree census, +1 over every arc
            dst = shard["dst"]
            if len(dst) == 0:
                return []
            dst_u, cnt = self.combine_by_dst(dst, np.ones(len(dst), np.int64))
            return self.split_by_dst_part(P, dst_u, {"m": cnt})
        mask = state["newly_dead"][shard["src_local"]].astype(bool)
        if not mask.any():
            return []
        dst = shard["dst"][mask]
        dst_u, dec = self.combine_by_dst(dst, np.ones(int(mask.sum()), np.int64))
        return self.split_by_dst_part(P, dst_u, {"m": dec})

    def apply(self, part, pmeta, state, msgs, ctx):
        P = ctx["P"]
        deg = state["deg"].copy()
        alive = state["alive"].copy()
        census = not (len(state["censused"]) and state["censused"][0])
        nmsg = 0
        if msgs is not None and len(msgs["dst"]):
            nmsg = int(len(msgs["dst"]))
            dst_u, m = self.combine_by_dst(msgs["dst"], msgs["m"], ufunc=np.add)
            li = dst_u // P
            if census:
                deg[li] = m  # census result (unreached vertices stay 0)
            else:
                deg[li] -= m  # neighbor deaths
        newly_dead = (alive.astype(bool) & (deg < self.k)).astype(np.uint8)
        alive[newly_dead.astype(bool)] = 0
        return (
            {
                "deg": deg,
                "alive": alive,
                "newly_dead": newly_dead,
                "censused": np.ones(len(deg), np.uint8),
            },
            {"active": int(newly_dead.sum()), "nmsg": nmsg},
            None,
        )

    def should_stop(self, metrics, superstep):
        return metrics.active == 0
