"""Per-vertex compute API — reference surface parity.

Re-exposes the programming model of the reference engine
(/root/reference/pregel/vertex.lua, README.md:89-131) on top of the
vectorized BSP engine: a user writes ``compute(vertex)`` and the engine
runs it over every *active* vertex each superstep with the exact
reference semantics (SURVEY.md §7.1):

- active  = has mail OR not halted (worker.lua:143-146);
- a computed vertex is reactivated before compute and must re-vote halt
  (worker.lua:158);
- messages sent at S are delivered at S+1, unordered, combined en route
  when a combiner is given (queue.lua:39-52);
- messages to nonexistent/deleted vertices are dropped (worker.lua:187-195);
- aggregator values readable at S are the merged values of S-1
  (README.md:276-279); reduce is the worker-local fold, merge the
  global fold (aggregator.lua:38-57);
- termination: zero pending messages and zero active vertices
  (master.lua:77-84).

Vertex values and message payloads may be arbitrary picklable Python
objects (the reference's `'*'` MsgPack columns, worker.lua:423); this
is the compatibility path — per-vertex Python dispatch, deliberately
row-wise. Production algorithms use the vectorized Algorithm protocol
(pagerank.py etc.).

Topology mutation intents (add/delete vertex/edge, vertex.lua:140-210)
are collected per superstep in the reference's deterministic apply
order (worker.lua:197-309) and surfaced on RunResult; between-superstep
application incl. shard rebuild lands via Engine mutation support.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from ..chunks import pack_obj as _pack_obj
from ..chunks import unpack_obj as _unpack_obj
from .base import Algorithm


@dataclass
class Aggregator:
    """default/reduce/merge triple (aggregator.lua:38-57)."""

    default: Any = None
    reduce: Callable[[Any, Any], Any] = None  # fold(acc, contributed) -> acc
    merge: Callable[[Any, Any], Any] = None  # defaults to reduce

    def __post_init__(self):
        if self.reduce is None:
            self.reduce = lambda acc, v: v  # reference default: replace
        if self.merge is None:
            self.merge = self.reduce


class Vertex:
    """The object handed to user compute() — accessor parity with
    vertex.lua:80-213."""

    __slots__ = (
        "_algo", "_vid", "_li", "_state", "_msgs", "_ctx", "_out",
        "_halt", "_value", "_dirty", "_aggs", "_muts",
    )

    def __init__(self, algo, vid, li, state_values, msgs, ctx, out, aggs, muts):
        self._algo = algo
        self._vid = vid
        self._li = li
        self._value = state_values
        self._msgs = msgs
        self._ctx = ctx
        self._out = out
        self._halt = None  # tri-state: None = untouched this compute
        self._dirty = False
        self._aggs = aggs
        self._muts = muts

    # identity / state -----------------------------------------------------
    def get_name(self):
        return self._vid  # dense vid is the engine-level vertex name

    def get_superstep(self):
        return self._ctx["superstep"]

    def get_value(self):
        return self._value[self._li]

    def set_value(self, v):
        self._value[self._li] = v
        self._dirty = True

    def vote_halt(self, halt: bool = True):
        self._halt = bool(halt)

    # edges ---------------------------------------------------------------
    def pairs_edges(self):
        """(idx, dst_vid, weight) over the vertex's out-edges
        (vertex.lua:88-101; zero-copy views of the cached adjacency)."""
        indptr, dst, w = self._ctx["_adj"]
        lo, hi = int(indptr[self._li]), int(indptr[self._li + 1])
        for i in range(lo, hi):
            yield i - lo, int(dst[i]), float(w[i])

    def out_degree(self):
        indptr, _, _ = self._ctx["_adj"]
        return int(indptr[self._li + 1] - indptr[self._li])

    # messaging ------------------------------------------------------------
    def pairs_messages(self):
        yield from self._msgs

    def send_message(self, receiver_vid: int, message):
        self._out.append((int(receiver_vid), message))

    # aggregators ----------------------------------------------------------
    def get_aggregation(self, name: str):
        return self._ctx["agg"].get(name, self._algo.aggregators[name].default)

    def set_aggregation(self, name: str, value):
        agg = self._algo.aggregators[name]
        cur = self._aggs.get(name, agg.default)
        self._aggs[name] = agg.reduce(cur, value)

    # worker context: the reference's per-worker MUTABLE object
    # (vertex.lua:211-213, worker.lua:378,401). Here "worker" = partition:
    # the object is carried in the partition's state chunk, so mutations by
    # one vertex are visible to later vertices in the same partition the
    # same superstep AND persist across supersteps (tested in
    # test_compute_api.py::test_worker_context_persists).
    def get_worker_context(self):
        return self._ctx.get("_wctx")

    # topology mutation intents (vertex.lua:140-210) -----------------------
    def add_vertex(self, value, name: str | None = None):
        """`name` is the reference's obtain_name contract: the new vertex's
        partition derives from stable_hash(name) % P, and an add whose name
        already exists is logged-and-skipped (worker.lua third-phase
        dedup). Without a name the engine assigns an epoch-unique one."""
        self._muts.append(("add_vertex", name, value))

    def add_edge(self, src_vid, dst_vid, value=1.0):
        self._muts.append(("add_edge", int(src_vid), int(dst_vid), float(value)))

    def delete_vertex(self, vid, edges: bool = False):
        """Tombstones the vertex and drops its OUT-edges (the reference's
        data_space:delete drops the vertex tuple, whose edges are inline).
        ``edges=True`` ALSO cascades the IN-edge delete (every edge whose
        dst is ``vid``) — an extension: the reference declares the flag but
        leaves it NIY (`assert(edges == false)`, vertex.lua:183). The
        cascade costs one more vectorized dst-match in the same streaming
        boundary pass; affected partitions extend to the deleted in-edges'
        SOURCE parts (where those edges live in the CSR)."""
        self._muts.append(
            ("delete_vertex_cascade" if edges else "delete_vertex", int(vid))
        )

    def delete_edge(self, src_vid, dst_vid):
        self._muts.append(("delete_edge", int(src_vid), int(dst_vid)))


class ComputeAlgorithm(Algorithm):
    """Runs user compute(vertex) with reference BSP semantics."""

    name = "compute"
    directed = True

    def __init__(
        self,
        compute: Callable[[Vertex], None],
        initial_value: Any | Callable[[int], Any] = None,
        combiner: Callable[[Any, Any], Any] | None = None,
        aggregators: dict[str, Aggregator] | None = None,
        worker_context: Any = None,
        halt_on_init: bool = False,
    ):
        self.compute = compute
        self.initial_value = initial_value
        self.combiner = combiner
        self.aggregators = aggregators or {}
        self.worker_context = worker_context
        self.halt_on_init = halt_on_init

    # -- state layout: value_pkl (pickled list), halted uint8, outbox,
    #    _wctx_pkl (the partition's mutable worker-context object) ---------
    def init(self, part, n_local, pmeta, ctx):
        import copy

        P = ctx["P"]
        if callable(self.initial_value):
            vals = [self.initial_value(i * P + part) for i in range(n_local)]
        else:
            vals = [self.initial_value] * n_local
        halted = np.full(n_local, 1 if self.halt_on_init else 0, dtype=np.uint8)
        state = {
            "value_pkl": _pack_obj(vals),
            "halted": halted,
            "outbox_dst": np.array([], np.int64),
            "outbox_pkl": _pack_obj([]),
            # each partition ("worker") gets its own context instance,
            # like the reference's per-worker table (worker.lua:378)
            "_wctx_pkl": _pack_obj([copy.deepcopy(self.worker_context)]),
        }
        return state, {"active": int((halted == 0).sum())}

    # -- scatter: emit the outbox recorded by last superstep's computes ----
    def scatter(self, shard, pmeta, state, ctx):
        # outbox-style scatter ignores the shard CONTENT, so a hub-split
        # partition must emit only from its FIRST sub-shard — the engine
        # marks it via ctx["_first_shard"] (else every sub-shard would
        # duplicate the partition's messages; latent until splits met the
        # per-vertex API, caught round 4)
        if not ctx.get("_first_shard", True):
            return []
        dst = state["outbox_dst"]
        if len(dst) == 0:
            return []
        payloads = _unpack_obj(state["outbox_pkl"])
        # map-side combine per (dst) when a combiner is given
        order = np.argsort(dst, kind="stable")
        out_dst, out_pl = [], []
        if self.combiner is not None:
            cur_d, acc = None, None
            for i in order:
                d = int(dst[i])
                if d != cur_d:
                    if cur_d is not None:
                        out_dst.append(cur_d)
                        out_pl.append(acc)
                    cur_d, acc = d, payloads[i]
                else:
                    acc = self.combiner(acc, payloads[i])
            out_dst.append(cur_d)
            out_pl.append(acc)
        else:
            out_dst = [int(dst[i]) for i in order]
            out_pl = [payloads[i] for i in order]
        d_arr = np.asarray(out_dst, np.int64)
        # split by destination partition, keeping payload lists aligned
        dp = (d_arr % ctx["P"]).astype(np.int64)
        out = []
        for p in np.unique(dp):
            m = dp == p
            out.append(
                (
                    int(p),
                    {
                        "dst": d_arr[m],
                        "pl_pkl": _pack_obj([out_pl[i] for i in np.flatnonzero(m)]),
                    },
                )
            )
        return out

    # the engine decodes *_pkl message columns per chunk and concatenates
    # the LISTS (engine._make_apply), exposing them as msgs["_obj_pl_pkl"]
    needs_edges_in_apply = True

    def apply(self, part, pmeta, state, msgs, ctx):
        P = ctx["P"]
        values = _unpack_obj(state["value_pkl"])
        halted = state["halted"].copy()
        n = len(halted)

        # unpickle the partition's worker context; mutations made through
        # vertex.get_worker_context() are re-pickled into the new state
        wctx = (
            _unpack_obj(state["_wctx_pkl"])[0]
            if "_wctx_pkl" in state else self.worker_context
        )
        ctx["_wctx"] = wctx

        dead = ctx.get("dead") or frozenset()

        # inbox per local vertex
        inbox: dict[int, list] = {}
        nmsg_in = 0
        if msgs is not None and len(msgs.get("dst", ())):
            dsts = msgs["dst"]
            pls = msgs["_obj_pl_pkl"]  # list of payloads aligned with dsts
            nmsg_in = len(dsts)
            for d, pl in zip(dsts, pls):
                li = int(d) // P
                if li < n and int(d) not in dead:
                    inbox.setdefault(li, []).append(pl)
                # else: message to nonexistent/deleted vertex → dropped (M3)

        out: list[tuple[int, Any]] = []
        aggs: dict[str, Any] = {}
        muts: list[tuple] = []
        computed = 0
        for li in range(n):
            if (li * P + part) in dead:
                halted[li] = 1  # tombstoned: never computes again
                continue
            mail = inbox.get(li, [])
            # combiner also folds at delivery (reference eager combine)
            if self.combiner is not None and len(mail) > 1:
                acc = mail[0]
                for m in mail[1:]:
                    acc = self.combiner(acc, m)
                mail = [acc]
            if halted[li] and not mail:
                continue  # inactive (C2)
            halted[li] = 0  # reactivate (C3)
            v = Vertex(self, li * P + part, li, values, mail, ctx, out, aggs, muts)
            self.compute(v)
            computed += 1
            if v._halt is not None:
                halted[li] = 1 if v._halt else 0

        new_state = {
            "value_pkl": _pack_obj(values),
            "halted": halted,
            "outbox_dst": np.asarray([d for d, _ in out], np.int64),
            "outbox_pkl": _pack_obj([m for _, m in out]),
            "_wctx_pkl": _pack_obj([wctx]),
        }
        metrics = {
            "active": int((halted == 0).sum()),
            "nmsg": len(out),  # pending messages (delivered next superstep)
            "m1": float(computed),
            "m2": float(len(muts)),
        }
        agg_contrib = {"aggs": aggs, "muts": muts} if (aggs or muts) else None
        return new_state, metrics, agg_contrib

    def extend_state(self, state: dict, new_values: list, part: int) -> dict:
        """Append state slots for vertices added via add_vertex (engine
        mutation application). New vertices start active (reference: stored
        vertices start unhalted)."""
        vals = _unpack_obj(state["value_pkl"]) + list(new_values)
        halted = np.concatenate(
            [state["halted"], np.zeros(len(new_values), np.uint8)]
        )
        out = dict(state)
        out["value_pkl"] = _pack_obj(vals)
        out["halted"] = halted
        return out

    def decode_state(self, cols: dict) -> dict:
        """Output = decoded vertex values + halt flags (outbox/context are
        engine internals, not per-vertex results)."""
        return {
            "value": _unpack_obj(cols["value_pkl"]),
            "halted": cols["halted"].astype(bool),
        }

    def merge_agg(self, contribs):
        merged: dict[str, Any] = {}
        muts: list[tuple] = []
        for c in contribs:
            for name, v in c.get("aggs", {}).items():
                spec = self.aggregators[name]
                merged[name] = v if name not in merged else spec.merge(merged[name], v)
            muts.extend(c.get("muts", []))
        if muts:
            merged["_mutations"] = muts
        return merged

    def should_stop(self, metrics, superstep):
        return metrics.active == 0 and metrics.nmsg == 0

    # decode helper for results
    @staticmethod
    def values_from_state(state_ds, P):
        import pyarrow as pa

        from ..chunks import unpack

        def _expand(t: pa.Table) -> pa.Table:
            vids, vals = [], []
            for i in range(t.num_rows):
                if t["kind"][i].as_py() != 0:
                    continue
                cols = unpack(t["blob"][i].as_py())
                part = t["part"][i].as_py()
                values = _unpack_obj(cols["value_pkl"])
                for li, v in enumerate(values):
                    vids.append(li * P + part)
                    vals.append(v)
            return pa.table({"vid": pa.array(vids, pa.int64()), "value": pa.array(vals)})

        return state_ds.map_batches(_expand, batch_format="pyarrow")
