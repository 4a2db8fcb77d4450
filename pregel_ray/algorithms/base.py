"""Vectorized algorithm protocol for the BSP engine.

The reference's user-extension surface is `compute(vertex)` + combiner +
aggregators (/root/reference/pregel/worker.lua:369-387, SURVEY.md §2.9).
Here the fast path is partition-vectorized: an algorithm works on whole
numpy columns of one partition at a time. The per-vertex API of the
reference is provided on top by algorithms/compute_api.py.

Contract per superstep S (engine.py):
  scatter(shard, pmeta, state, ctx)  — runs once per CSR (sub-)shard of the
      partition; emits (dst_part, cols) message chunks. Must pre-combine
      within the shard where the semantics allow (the reference's eager
      combiner, queue.lua:39-52). `cols` must contain "dst" (int64 vids).
  apply(part, pmeta, state, msgs, ctx) — msgs = concatenated message
      columns for this partition (deterministic producing-shard order),
      or None. Returns (new_state, metrics, agg_contrib|None).
      metrics keys: active, nmsg, m1, m2.
  should_stop(metrics, superstep) — termination test on globally summed
      metrics (reference: __in_progress/__messages, master.lua:77-84).
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np


class Algorithm:
    name = "algorithm"
    directed = True  # which shard variant to build/load
    # Opt-in to superstep chaining (engine.run: K supersteps as one lazy
    # plan). Safe when (a) cross-step globals are only the engine-folded
    # metrics/aggregators (they resolve through the mailbox in-flow) and
    # (b) up to K-1 post-convergence steps are harmless. Mutating or
    # driver-interactive algorithms leave this False.
    supports_chaining = False
    # True when should_stop means quiescence (vote-halt / no label changed):
    # post-convergence supersteps are identity, so a chained chunk that
    # overshoots needs no correction. Tolerance-stopped algorithms (PageRank
    # tol mode) set False and the engine replays the final chunk clipped at
    # the converged step.
    quiescent_convergence = True

    # Optional sender-side cross-shard combine (actor executor,
    # EngineConfig.presum_push): fold the chunks a worker emits toward one
    # destination partition into ONE chunk before the push. Implement only
    # when the combiner is ASSOCIATIVE — regrouping reorders float folds,
    # so results match the default path to ~1e-15 per fold, not bitwise
    # (the reason presum_push is opt-in). Returns the combined cols dict
    # (must keep the "dst" column).
    precombine = None

    # -- lifecycle ---------------------------------------------------------
    def init(self, part: int, n_local: int, pmeta: dict, ctx: dict):
        raise NotImplementedError

    def scatter(
        self, shard: dict, pmeta: dict, state: dict, ctx: dict
    ) -> Iterable[tuple[int, dict]]:
        raise NotImplementedError

    def apply(self, part: int, pmeta: dict, state: dict, msgs: dict | None, ctx: dict):
        raise NotImplementedError

    def should_stop(self, metrics, superstep: int) -> bool:
        return metrics.active == 0 and metrics.nmsg == 0

    def decode_state(self, cols: dict) -> dict:
        """Per-vertex OUTPUT columns from one partition's state columns —
        what vertex_table()/write_solution (the reference's S13
        write_solution hook, vertex.lua:55-57) emits. Default: every
        non-underscore numpy column (vectorized algorithms store plain
        per-vertex arrays). Algorithms with encoded state (pickled values,
        outboxes) override to decode (ComputeAlgorithm)."""
        return {k: v for k, v in cols.items() if not k.startswith("_")}

    # -- aggregators (merged driver-side between supersteps; the merged dict
    #    is visible to the NEXT superstep via ctx["agg"] — matches the
    #    reference's available-in-S+1 contract, README.md:276-279) ---------
    def merge_agg(self, contribs: list[Any]) -> dict:
        return {}

    # -- helpers shared by implementations --------------------------------
    @staticmethod
    def split_by_dst_part(P: int, dst: np.ndarray, cols: dict) -> list[tuple[int, dict]]:
        """Group message arrays by destination partition (vectorized)."""
        if len(dst) == 0:
            return []
        dp = (dst % P).astype(np.int64)
        order = np.argsort(dp, kind="stable")
        dp_sorted = dp[order]
        bounds = np.flatnonzero(np.diff(dp_sorted)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(dp_sorted)]))
        out = []
        for a, b in zip(starts, ends):
            idx = order[a:b]
            chunk = {"dst": dst[idx]}
            for k, v in cols.items():
                chunk[k] = v[idx]
            out.append((int(dp_sorted[a]), chunk))
        return out

    @staticmethod
    def split_precomputed(shard: dict, combined: np.ndarray, col: str = "m"):
        """Split per-dst_unique combined values by destination partition
        using the shard's build-time precomputed order/boundaries
        (graph.py) — no per-superstep sort."""
        order = shard.get("dstp_order")
        if order is None or len(order) == 0:
            return []
        ds = shard["dst_unique"][order]
        cs = combined[order]
        starts = shard["dstp_starts"]
        ids = shard["dstp_ids"]
        return [
            (int(ids[k]), {"dst": ds[starts[k]:starts[k + 1]],
                           col: cs[starts[k]:starts[k + 1]]})
            for k in range(len(ids))
        ]

    @staticmethod
    def combine_by_dst(dst: np.ndarray, vals: np.ndarray, ufunc=np.add):
        """Sort-free exact combine of (dst, val) pairs → unique dst + folded vals."""
        order = np.argsort(dst, kind="stable")
        d, v = dst[order], vals[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(d)) + 1))
        return d[bounds], ufunc.reduceat(v, bounds)
