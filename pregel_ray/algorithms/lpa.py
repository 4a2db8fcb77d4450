"""Label propagation clustering (synchronous, weighted, deterministic).

Semantics (mirrored by tests/oracles.py::lpa_oracle): every vertex
starts with its own vid as label; each superstep every vertex adopts the
incident-weight-maximal neighbor label (tie → smallest label); stops
when no label changes or after ``max_iters``. Undirected weighted view
(self-loops dropped at symmetrize, graph.py).

Messages are (dst, label, weight) triples, pre-combined per shard by
summing weight per (dst, label) — an associative combiner, so map-side
partial + apply-side final combining is exact (the mode itself is NOT
associative; shipping (label, weight-sum) pairs is what makes two-level
combining sound — SURVEY.md §4 skew note).
"""

from __future__ import annotations

import numpy as np

from .base import Algorithm


def _sum_by_pairs(dst: np.ndarray, lab: np.ndarray, w: np.ndarray):
    """Sum w over (dst, lab) pairs → unique (dst, lab, w_sum), dst-major order."""
    order = np.lexsort((lab, dst))
    d, l, v = dst[order], lab[order], w[order]
    new_seg = np.empty(len(d), dtype=bool)
    new_seg[0] = True
    np.not_equal(d[1:], d[:-1], out=new_seg[1:])
    lab_change = np.empty(len(d), dtype=bool)
    lab_change[0] = True
    np.not_equal(l[1:], l[:-1], out=lab_change[1:])
    bounds = np.flatnonzero(new_seg | lab_change)
    return d[bounds], l[bounds], np.add.reduceat(v, bounds)


class LabelPropagation(Algorithm):
    """``init_labels_ref``: optional ObjectRef to a dict carrying
    ``ranks_by_part[part] -> int64[n_local]`` (namemap._name_lut_task).
    When given, labels start as global NAME-RANKS instead of vids, making
    the tie→min-label rule equal tie→min-name — the property the unrolled
    DuckDB LPA oracle needs. Default (None) keeps vid labels (the
    engine-internal canonical form used by the pytest oracle parity)."""

    name = "lpa"
    directed = False
    supports_chaining = True  # metrics/agg-only cross-step globals

    def __init__(self, max_iters: int = 20, init_labels_ref=None,
                 init_labels_path: str | None = None):
        self.max_iters = max_iters
        self.init_labels_ref = init_labels_ref
        # partition-sliced name_ranks parquet (namemap.build_name_ranks):
        # the above-broadcast-threshold source — each partition's init
        # reads only its own slice, nothing |V|-bounded in one object
        self.init_labels_path = init_labels_path

    def init(self, part, n_local, pmeta, ctx):
        P = ctx["P"]
        if self.init_labels_ref is not None:
            import ray

            labels = ray.get(self.init_labels_ref)["ranks_by_part"][part].copy()
            assert len(labels) == n_local
        elif self.init_labels_path is not None:
            from ..namemap import _part_ranks

            labels = _part_ranks(self.init_labels_path, part, P).copy()
            assert len(labels) == n_local
        else:
            labels = np.arange(n_local, dtype=np.int64) * P + part
        return {"label": labels}, {"active": n_local}

    def scatter(self, shard, pmeta, state, ctx):
        if len(shard["dst"]) == 0:
            return []
        lab = state["label"][shard["src_local"]]
        d, l, v = _sum_by_pairs(shard["dst"], lab, shard["w"])
        return self.split_by_dst_part(ctx["P"], d, {"lab": l, "w": v})

    def precombine(self, msgs):
        # (dst, label) weight sums are associative (the mode itself is not —
        # shipping (label, weight-sum) pairs is what makes this legal)
        d, l, v = _sum_by_pairs(msgs["dst"], msgs["lab"], msgs["w"])
        return {"dst": d, "lab": l, "w": v}

    def apply(self, part, pmeta, state, msgs, ctx):
        label = state["label"].copy()
        P = ctx["P"]
        changed = 0
        nmsg = 0
        if msgs is not None and len(msgs["dst"]):
            nmsg = int(len(msgs["dst"]))
            d, l, v = _sum_by_pairs(msgs["dst"], msgs["lab"], msgs["w"])
            # per dst: argmax weight, tie → min label. lexsort by (label asc,
            # weight asc, dst) then take the LAST entry per dst after sorting
            # by (dst, weight, -label)… simpler: sort by (dst, weight desc,
            # label asc) via compound key.
            order = np.lexsort((l, -v, d))
            d2, l2 = d[order], l[order]
            first = np.concatenate(([True], d2[1:] != d2[:-1]))
            dst_u = d2[first]
            best = l2[first]
            li = dst_u // P
            diff = best != label[li]
            label[li[diff]] = best[diff]
            changed = int(diff.sum())
        return {"label": label}, {"active": changed, "nmsg": nmsg}, None

    def should_stop(self, metrics, superstep):
        return metrics.active == 0 or superstep >= self.max_iters
