"""Max-value propagation — vectorized port of the REFERENCE's own example
algorithm (/root/reference/example/test-worker.lua:25-43, combiner max
common.lua:23-39): every vertex converges to the maximum initial value
over its ancestors-and-self in the directed graph.

Same shape as ConnectedComponents with np.maximum instead of np.minimum
and a DIRECTED scatter; initial values are global name ranks (the
LabelPropagation init-source contract: a plasma LUT below the broadcast
threshold, a partition-sliced parquet read above it). The per-vertex
compute-API version (pipelines.maxprop_ranks) is kept as the
reference-conformance twin; this is the fast path
(tests/test_maxprop.py pins bit-identical results between the two).
"""

from __future__ import annotations

import numpy as np

from .base import Algorithm


class MaxProp(Algorithm):
    name = "maxprop"
    directed = True
    supports_chaining = True  # metrics/agg-only cross-step globals

    def __init__(self, init_values_ref=None, init_values_path: str | None = None):
        # same sources as LabelPropagation.init: ranks_by_part LUT ref
        # (broadcast) or the partition-sliced name_ranks dir (fallback)
        self.init_values_ref = init_values_ref
        self.init_values_path = init_values_path

    def init(self, part, n_local, pmeta, ctx):
        P = ctx["P"]
        if self.init_values_ref is not None:
            import ray

            val = ray.get(self.init_values_ref)["ranks_by_part"][part].copy()
            assert len(val) == n_local
        elif self.init_values_path is not None:
            from ..namemap import _part_ranks

            val = _part_ranks(self.init_values_path, part, P).copy()
            assert len(val) == n_local
        else:
            val = np.arange(n_local, dtype=np.int64) * P + part  # own vid
        changed = np.ones(n_local, dtype=np.uint8)  # frontier: everyone sends once
        return {"val": val, "changed": changed}, {"active": n_local}

    def scatter(self, shard, pmeta, state, ctx):
        mask = state["changed"][shard["src_local"]].astype(bool)
        if not mask.any():
            return []
        dst = shard["dst"][mask]
        v = state["val"][shard["src_local"][mask]]
        dst_u, v_max = self.combine_by_dst(dst, v, ufunc=np.maximum)
        return self.split_by_dst_part(ctx["P"], dst_u, {"m": v_max})

    def apply(self, part, pmeta, state, msgs, ctx):
        val = state["val"].copy()
        n = len(val)
        P = ctx["P"]
        changed = np.zeros(n, dtype=np.uint8)
        nmsg = 0
        if msgs is not None and len(msgs["dst"]):
            nmsg = int(len(msgs["dst"]))
            dst_u, m_max = self.combine_by_dst(msgs["dst"], msgs["m"], ufunc=np.maximum)
            li = dst_u // P
            better = m_max > val[li]
            val[li[better]] = m_max[better]
            changed[li[better]] = 1
        active = int(changed.sum())
        return {"val": val, "changed": changed}, {"active": active, "nmsg": nmsg}, None

    def should_stop(self, metrics, superstep):
        return metrics.active == 0
