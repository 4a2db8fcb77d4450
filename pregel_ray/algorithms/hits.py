"""HITS (hubs & authorities, Kleinberg 1999) on the BSP engine via a
doubled-graph reduction.

The engine scatters along FORWARD arcs only, but HITS needs both
A·a (hub update) and Aᵀ·h (authority update). Reduction: split every
vertex into a hub copy and an authority copy, and give each original
edge u→v TWO arcs — h(u)→a(v) and a(v)→h(u) (pipelines.hits_shards).
One superstep of plain "scatter value, sum at dst" on the doubled graph
then performs the simultaneous synchronous HITS update:

    a_k(v) = ( Σ_{u→v} w·h_{k-1}(u) ) / ‖h_{k-1}‖₂
    h_k(u) = ( Σ_{u→v} w·a_{k-1}(v) ) / ‖a_{k-1}‖₂

Normalization happens IN APPLY using the PREVIOUS step's global norms,
which ride the engine metrics (m1 = Σ hub², m2 = Σ auth² — the same
prev-metrics channel PageRank's dangling mass uses), so scatter ships
raw value·w and needs no global state. Superstep 1's apply reads the
init metrics (hub/auth counts: all values start at 1).

Copy-vid scheme (partition-aligned, pipelines.hits_shards): original
vid = l·P+q → hub copy (2l)·P+q = 2·vid − vid%P, authority copy +P.
Role is the parity of the LOCAL index: even = hub — so role masks are
pure arange-parity, no lookups.

Weighted by edge weight w (the transcript graph is weighted); set w=1
upstream for the unweighted classic.
"""

from __future__ import annotations

import numpy as np

from .base import Algorithm


def _inv(x: float) -> float:
    return 1.0 / np.sqrt(x) if x > 0 else 0.0


class HITS(Algorithm):
    name = "hits"
    directed = True
    supports_chaining = True  # cross-step globals are metrics-only

    def __init__(self, max_iters: int = 10):
        self.max_iters = max_iters

    def init(self, part, n_local, pmeta, ctx):
        value = np.ones(n_local)
        n_hub = (n_local + 1) // 2  # even locals
        return (
            {"value": value},
            {"active": n_local, "m1": float(n_hub), "m2": float(n_local - n_hub)},
        )

    def scatter(self, shard, pmeta, state, ctx):
        if len(shard["src_local"]) == 0:
            return []
        contrib = state["value"][shard["src_local"]] * shard["w"]
        combined = np.add.reduceat(contrib, shard["seg_starts"])
        if "dstp_order" in shard:
            return self.split_precomputed(shard, combined)
        return self.split_by_dst_part(ctx["P"], shard["dst_unique"], {"m": combined})

    def apply(self, part, pmeta, state, msgs, ctx):
        n = len(state["value"])
        P = ctx["P"]
        recv = np.zeros(n)
        nmsg = 0
        if msgs is not None and len(msgs["dst"]):
            nmsg = int(len(msgs["dst"]))
            dst_u, m_u = self.combine_by_dst(msgs["dst"], msgs["m"])
            recv[dst_u // P] = m_u
        prev = ctx["prev"]
        hub = (np.arange(n) % 2) == 0
        # hub copies receive from authority copies and vice versa
        value = np.where(hub, recv * _inv(prev["m2"]), recv * _inv(prev["m1"]))
        m1 = float((value[hub] ** 2).sum())
        m2 = float((value[~hub] ** 2).sum())
        return (
            {"value": value},
            {"active": n, "nmsg": nmsg, "m1": m1, "m2": m2},
            None,
        )

    def should_stop(self, metrics, superstep):
        return superstep >= self.max_iters
