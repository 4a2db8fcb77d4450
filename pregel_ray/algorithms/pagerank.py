"""Weighted PageRank, damping 0.85, L1 < 1e-6 convergence.

Semantics (the conformance oracle, tests/test_pagerank.py, mirrors this
exactly in straight-line NumPy):

    r_0[v]   = 1/N
    r_s[v]   = (1-d)/N + d * ( Σ_{u→v} r_{s-1}[u] * w(u,v)/W_out(u)
                               + DM_{s-1}/N )
    DM_s     = Σ_{u dangling} r_s[u]        (dangling mass, redistributed
                                             uniformly in the NEXT step's
                                             formula — i.e. same-iteration
                                             semantics of standard power
                                             iteration)
    stop when Σ_v |r_s - r_{s-1}| < tol  (default 1e-6)

DM flows through engine metrics (m2): apply at superstep s computes the
per-part dangling sum of the NEW ranks; the driver's metric fold makes
it global, and superstep s+1 reads it from ctx["prev"]["m2"]. No extra
barrier — the metric fold rides the superstep barrier that exists
anyway.

Scatter is one gather + one np.add.reduceat over the dst-sorted shard
(graph.py layout): map-side combining is structural, matching the
reference's eager sum-combiner (/root/reference/pregel/queue.lua:39-52).
"""

from __future__ import annotations

import numpy as np

from .base import Algorithm


class PageRank(Algorithm):
    name = "pagerank"
    directed = True
    supports_chaining = True  # metrics/agg-only cross-step globals
    # tol-mode stop is tolerance-based, not quiescent: post-convergence
    # supersteps keep refining, so a chained chunk that overshoots must be
    # replayed clipped at the converged step (engine.run). Fixed-iteration
    # mode never overshoots (chunks clip at max_iters).
    quiescent_convergence = False

    def __init__(self, damping: float = 0.85, tol: float = 1e-6, max_iters: int | None = None):
        self.damping = damping
        self.tol = tol
        self.max_iters = max_iters  # fixed-iteration mode when set (tol ignored)

    def init(self, part, n_local, pmeta, ctx):
        N = ctx["N"]
        rank = np.full(n_local, 1.0 / N) if N else np.zeros(0)
        dangling = float(rank[pmeta["out_deg"] == 0].sum()) if n_local else 0.0
        return {"rank": rank}, {"active": n_local, "m2": dangling}

    def scatter(self, shard, pmeta, state, ctx):
        if len(shard["src_local"]) == 0:
            return []
        contrib = state["rank"][shard["src_local"]] * shard["w_norm"]
        combined = np.add.reduceat(contrib, shard["seg_starts"])
        if "dstp_order" in shard:  # build-time dst-part split (no sort)
            return self.split_precomputed(shard, combined)
        return self.split_by_dst_part(ctx["P"], shard["dst_unique"], {"m": combined})

    def apply(self, part, pmeta, state, msgs, ctx):
        rank = state["rank"]
        n = len(rank)
        N, P, d = ctx["N"], ctx["P"], self.damping
        recv = np.zeros(n)
        if msgs is not None and len(msgs["dst"]):
            # sub-shard cuts can split a dst segment → exact re-combine here
            dst_u, m_u = self.combine_by_dst(msgs["dst"], msgs["m"])
            recv[dst_u // P] = m_u
        dm_prev = ctx["prev"]["m2"]  # global dangling mass of r_{s-1}
        new_rank = (1.0 - d) / N + d * (recv + dm_prev / N)
        l1 = float(np.abs(new_rank - rank).sum())
        dangling = float(new_rank[pmeta["out_deg"] == 0].sum()) if n else 0.0
        nmsg = int(len(msgs["dst"])) if msgs else 0
        return {"rank": new_rank}, {"active": n, "nmsg": nmsg, "m1": l1, "m2": dangling}, None

    def precombine(self, msgs):
        # rank contributions sum associatively → sender-side cross-shard
        # combine is legal (float regrouping: ≈1e-16/fold, not bitwise)
        d, m = self.combine_by_dst(msgs["dst"], msgs["m"])
        return {"dst": d, "m": m}

    def should_stop(self, metrics, superstep):
        if self.max_iters is not None:
            return superstep >= self.max_iters
        return metrics.m1 < self.tol


class PersonalizedPageRank(PageRank):
    """Topic-sensitive PageRank (Haveliwala 2002): the teleport vector is
    uniform over a SOURCE SET instead of all vertices —

        r_0       = e
        r_s[v]    = (1-d)·e[v] + d·( Σ_{u→v} r_{s-1}[u]·w/W_out(u)
                                     + DM_{s-1}·e[v] )
        e[v]      = 1/|S| if v ∈ S else 0

    (dangling mass teleports to the source set too — the standard PPR
    power iteration). Everything else — scatter, combining, DM-via-m2,
    L1 stop — is inherited from PageRank; e is recomputed per partition
    with one sorted-array isin (never shipped through state)."""

    name = "ppr"

    def __init__(self, source_vids, damping: float = 0.85, tol: float = 1e-6,
                 max_iters: int | None = None):
        super().__init__(damping, tol, max_iters)
        self.source_vids = np.asarray(sorted(source_vids), np.int64)
        assert len(self.source_vids) > 0

    def _e_local(self, part: int, n_local: int, ctx: dict) -> np.ndarray:
        P = ctx["P"]
        vids = np.arange(n_local, dtype=np.int64) * P + part
        e = np.zeros(n_local)
        e[np.isin(vids, self.source_vids)] = 1.0 / len(self.source_vids)
        return e

    def init(self, part, n_local, pmeta, ctx):
        rank = self._e_local(part, n_local, ctx)
        dangling = float(rank[pmeta["out_deg"] == 0].sum()) if n_local else 0.0
        return {"rank": rank}, {"active": n_local, "m2": dangling}

    def apply(self, part, pmeta, state, msgs, ctx):
        rank = state["rank"]
        n = len(rank)
        P, d = ctx["P"], self.damping
        recv = np.zeros(n)
        if msgs is not None and len(msgs["dst"]):
            dst_u, m_u = self.combine_by_dst(msgs["dst"], msgs["m"])
            recv[dst_u // P] = m_u
        e = self._e_local(part, n, ctx)
        dm_prev = ctx["prev"]["m2"]
        new_rank = (1.0 - d) * e + d * (recv + dm_prev * e)
        l1 = float(np.abs(new_rank - rank).sum())
        dangling = float(new_rank[pmeta["out_deg"] == 0].sum()) if n else 0.0
        nmsg = int(len(msgs["dst"])) if msgs else 0
        return (
            {"rank": new_rank},
            {"active": n, "nmsg": nmsg, "m1": l1, "m2": dangling},
            None,
        )
