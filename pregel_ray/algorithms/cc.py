"""Connected components via min-label propagation (undirected view).

Reference-conformant BSP semantics (SURVEY.md §7.1): a vertex computes
iff it has mail or is unhalted; computed vertices are reactivated and
re-vote halt (worker.lua:143-146, 158); messages sent at S are visible
at S+1; combiner = Min (the groupby-reduction analogue of
queue.lua:39-52); termination when no vertex changed and no mail is
pending (master.lua:77-84).

labels start as own vid; scatter sends the CURRENT label of every
vertex that changed last superstep (superstep 1: everyone); apply
adopts min(own, incoming). Labels converge to the minimum vid of each
component — compared exactly against scipy.sparse.csgraph.
"""

from __future__ import annotations

import numpy as np

from .base import Algorithm


class ConnectedComponents(Algorithm):
    name = "cc"
    directed = False
    supports_chaining = True  # metrics/agg-only cross-step globals

    def init(self, part, n_local, pmeta, ctx):
        P = ctx["P"]
        labels = np.arange(n_local, dtype=np.int64) * P + part  # own vid
        changed = np.ones(n_local, dtype=np.uint8)  # frontier: everyone sends once
        return {"label": labels, "changed": changed}, {"active": n_local}

    def scatter(self, shard, pmeta, state, ctx):
        mask = state["changed"][shard["src_local"]].astype(bool)
        if not mask.any():
            return []
        # frontier-filtered edges; dst stays sorted → min-combine by run
        dst = shard["dst"][mask]
        lab = state["label"][shard["src_local"][mask]]
        dst_u, lab_min = self.combine_by_dst(dst, lab, ufunc=np.minimum)
        return self.split_by_dst_part(ctx["P"], dst_u, {"m": lab_min})

    def apply(self, part, pmeta, state, msgs, ctx):
        label = state["label"].copy()
        n = len(label)
        P = ctx["P"]
        changed = np.zeros(n, dtype=np.uint8)
        nmsg = 0
        if msgs is not None and len(msgs["dst"]):
            nmsg = int(len(msgs["dst"]))
            dst_u, m_min = self.combine_by_dst(msgs["dst"], msgs["m"], ufunc=np.minimum)
            li = dst_u // P
            better = m_min < label[li]
            label[li[better]] = m_min[better]
            changed[li[better]] = 1
        active = int(changed.sum())
        return {"label": label, "changed": changed}, {"active": active, "nmsg": nmsg}, None

    def should_stop(self, metrics, superstep):
        return metrics.active == 0
