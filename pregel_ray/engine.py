"""The BSP superstep engine, Ray-Data-native.

One superstep is ONE Ray Data execution (reference superstep loop:
/root/reference/pregel/master.lua:54-88, re-expressed as a dataset
pipeline; the `materialize()` is the BSP barrier that `mpool:send_wait`
provides in the reference, mpool.lua:251-287):

    state (P chunk rows, materialized)
      → map_batches(scatter)            # gather CSR shard from plasma (zero-copy),
                                        #   emit per-(shard → dst_part) combined
                                        #   message chunks   [reference: run_superstep,
                                        #   worker.lua:140-180 + combiner queue.lua:39-52]
    state.union(msgs)
      → groupby("part")                 # THE shuffle — message routing + state
                                        #   co-location in one exchange
      → map_groups(apply)               # reduce messages, compute new vertex values,
                                        #   vote halt, per-part metrics/aggregators
      → materialize()                   # superstep barrier
    driver: fold per-part metrics/aggregators (P rows), test termination
            [reference: master.lua:64-84 aggregator merge + termination]

Vertex state never lives on the driver: it flows between supersteps as a
Dataset of per-partition chunk rows `{part, kind, shard, active, nmsg,
m1, m2, agg, blob}` where `blob` packs the partition's named numpy
columns (chunks.py). Immutable CSR shards are plasma objects loaded once
by remote tasks (graph.py) and gathered zero-copy inside scatter tasks —
on a multi-node cluster each node fetches a shard at most once (object
locality), the Ray-native analogue of the reference's worker-owned
vertex spaces (worker.lua:417-431).

Messages sent while computing superstep S are delivered in S+1 and
combined en route; supersteps are numbered from 1; aggregator values
visible to compute are the previous superstep's merged values — all
matching the reference contract (SURVEY.md §7.1).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .chunks import pack, unpack, unpack_obj
from .config import EngineConfig
from .graph import ShardSet
from .io_util import read_parquet as _read_parquet

CHUNK_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("kind", pa.int8()),  # 0 = state, 1 = message chunk
        ("shard", pa.int32()),  # producing shard gid (msg rows; determinism sort key)
        ("active", pa.int64()),
        ("nmsg", pa.int64()),
        ("m1", pa.float64()),  # algorithm metric (PageRank: L1 delta)
        ("m2", pa.float64()),  # algorithm metric (PageRank: dangling mass)
        ("agg", pa.large_binary()),  # pickled per-part aggregator contributions
        ("blob", pa.large_binary()),  # packed numpy columns (chunks.py)
    ]
)


@ray.remote(num_cpus=0)
class _Mailbox:
    """Per-run metrics/aggregator side-channel: apply tasks post their
    per-part metrics here so the driver reads them with one actor call
    instead of a second Dataset execution per superstep. Posts are
    idempotent by (superstep, part) — task retries are safe.

    With superstep chaining (one lazy plan covering K supersteps,
    EngineConfig.chain_supersteps) the mailbox also serves the CHAINED
    apply tasks: step S+1's apply reads step S's merged metrics/aggregates
    with `get_all` — safe because the plan's sort stage is a barrier (every
    step-S apply posted before any step-S+1 apply starts)."""

    def __init__(self):
        self.store: dict = {}

    def put(self, superstep: int, part: int, metrics: dict, agg: bytes) -> None:
        self.store.setdefault(superstep, {})[part] = (metrics, agg)

    def get_all(self, superstep: int):
        return self.store.get(superstep, {})

    def collect(self, superstep: int):
        return self.store.pop(superstep, {})


@ray.remote
def _scatter_one(algorithm, ctx, shard, gid, state, pmeta, first=True):
    """One sub-shard's scatter as its own task — restores sub-shard
    parallelism for hub-split partitions (the fused scatter otherwise
    serializes a partition's sub-shards inside its apply task; the hub
    partition was a ~0.2 s/superstep straggler at sf1.0). `shard`,
    `state` and `pmeta` are passed as ObjectRefs, which Ray auto-derefs
    into zero-copy plasma views at the worker. `first` marks the
    partition's first sub-shard (ctx["_first_shard"]) so outbox-style
    scatters (compute_api) emit exactly once per partition."""
    pmeta = pmeta if pmeta is not None else {}
    ctx = dict(ctx)
    ctx["_first_shard"] = bool(first)
    out = []
    for dst_part, cols in algorithm.scatter(shard, pmeta, state, ctx):
        n = len(cols["dst"])
        if n:
            out.append(_row(dst_part, 1, gid, pack(cols), nmsg=n))
    return out


_ADJ_CACHE: dict = {}  # per-worker-process src-sorted adjacency cache
_PREV_CACHE: dict = {}  # per-worker-process folded (metrics, agg) of chained steps


def _part_adjacency(token: str, part: int, refs, shards_of_part, n_local_map):
    """src-sorted (indptr, dst, w) adjacency of one partition, built from its
    dst-sorted CSR shards on first use and cached in the worker process
    (workers are long-lived; one sort per part per process, not per
    superstep). Only the per-vertex compute API needs this layout.
    ``token`` identifies the shard store epoch — topology mutations rebuild
    shards into a new directory, invalidating the cache."""
    gids = tuple(shards_of_part.get(part, ()))
    key = (token, part, gids)
    hit = _ADJ_CACHE.get(key)
    if hit is not None:
        return hit
    n = n_local_map.get(part, 0)
    if not gids:
        adj = (np.zeros(n + 1, np.int64), np.array([], np.int64), np.array([], np.float64))
    else:
        shards = [ray.get(refs[g]) for g in gids]
        src = np.concatenate([s["src_local"] for s in shards])
        dst = np.concatenate([s["dst"] for s in shards])
        w = np.concatenate([s["w"] for s in shards])
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, src + 1, 1)
        np.cumsum(indptr, out=indptr)
        adj = (indptr, dst, w)
    _ADJ_CACHE[key] = adj
    return adj


def combine_msg_chunks(msg_chunks: list[dict]) -> dict | None:
    """Concatenate unpacked message-chunk column dicts (already in
    deterministic producing-shard order) into the single msgs dict
    `Algorithm.apply` receives. ``*_pkl`` columns decode to Python lists
    exposed as ``_obj_*`` keys. Shared by the Dataset apply path and the
    raw-actor executor (actor_loop.py) so delivery semantics are
    bit-identical."""
    if not msg_chunks:
        return None
    msgs: dict = {}
    for k in msg_chunks[0]:
        if k.endswith("_pkl"):
            lst: list = []
            for c in msg_chunks:
                lst.extend(unpack_obj(c[k]))
            msgs["_obj_" + k] = lst
        else:
            msgs[k] = np.concatenate([c[k] for c in msg_chunks])
    return msgs


def _row(part, kind, shard, blob, active=0, nmsg=0, m1=0.0, m2=0.0, agg=b""):
    return {
        "part": np.int32(part),
        "kind": np.int8(kind),
        "shard": np.int32(shard),
        "active": np.int64(active),
        "nmsg": np.int64(nmsg),
        "m1": np.float64(m1),
        "m2": np.float64(m2),
        "agg": agg,
        "blob": blob,
    }


def _table(rows: list[dict]) -> pa.Table:
    if not rows:
        return CHUNK_SCHEMA.empty_table()
    cols = {k: [r[k] for r in rows] for k in CHUNK_SCHEMA.names}
    return pa.table(
        {k: pa.array(v, CHUNK_SCHEMA.field(k).type) for k, v in cols.items()},
        schema=CHUNK_SCHEMA,
    )


@dataclass
class Metrics:
    superstep: int
    active: int = 0
    nmsg: int = 0
    m1: float = 0.0
    m2: float = 0.0
    duration: float = 0.0
    rows: int = 0
    # PREGEL_PROFILE_APPLY only: raw per-part metric dicts (stage timings)
    parts: dict | None = field(default=None, repr=False, compare=False)

    def to_dict(self):
        d = self.__dict__.copy()
        d.pop("parts", None)
        return d


@dataclass
class RunResult:
    state: rd.Dataset
    history: list[Metrics]
    supersteps: int
    converged: bool
    algorithm: Any
    P: int

    def vertex_table(self, columns: list[str] | None = None) -> rd.Dataset:
        """Per-vertex result Dataset (vid + the algorithm's decoded output
        columns — Algorithm.decode_state)."""
        return state_to_vertices(self.state, self.P, columns, self.algorithm)

    def write_solution(self, out_dir: str, columns: list[str] | None = None) -> None:
        """Write the per-vertex result as partitioned Parquet — the
        reference's (never-wired) write_solution hook, S13 in SURVEY.md §2.1
        (vertex.lua:55-57), as a real sink."""
        self.vertex_table(columns).write_parquet(out_dir)


def _concat_state_tables(outs: list[pa.Table]) -> pa.Table:
    """Concat per-part vertex tables.

    permissive: per-part decoded object columns can infer different types
    (an all-None part infers `null` vs another's float64) — latent until
    block packing co-located such parts (surfaced when the per-step
    repartition stopped reshuffling state rows). Permissive promotion
    also allows int64→float64 unification, which silently corrupts ints
    > 2^53 — fail fast if that ever happens (unit-tested directly:
    tests/test_compute_api.py::test_state_concat_int_widening_guard)."""
    merged = pa.concat_tables(outs, promote_options="permissive")
    for f in merged.schema:
        if pa.types.is_floating(f.type) and any(
            pa.types.is_integer(o.schema.field(f.name).type) for o in outs
        ):
            raise TypeError(
                f"state column {f.name!r}: integer parts were widened to "
                f"{f.type} during concat (lossy above 2^53); unify the "
                "per-part dtypes in the algorithm's state instead"
            )
    return merged


def state_to_vertices(
    state: rd.Dataset, P: int, columns: list[str] | None = None, algorithm=None
) -> rd.Dataset:
    def _decode(cols: dict) -> dict:
        if algorithm is not None:
            return algorithm.decode_state(cols)
        return {k: v for k, v in cols.items() if not k.startswith("_")}

    def _expand(t: pa.Table) -> pa.Table:
        outs = []
        for i in range(t.num_rows):
            part = t["part"][i].as_py()
            decoded = _decode(unpack(t["blob"][i].as_py()))
            names = columns or list(decoded)
            n = len(decoded[names[0]]) if names else 0
            vid = np.arange(n, dtype=np.int64) * P + part
            d = {"vid": pa.array(vid)}
            for k in names:
                d[k] = pa.array(decoded[k])
            outs.append(pa.table(d))
        if not outs:
            return pa.table({"vid": pa.array([], pa.int64())})
        return _concat_state_tables(outs)

    return state.filter(lambda r: r["kind"] == 0).map_batches(_expand, batch_format="pyarrow")


class Engine:
    """Drives Algorithm instances over a ShardSet (SURVEY.md §2.7 D2 master)."""

    def __init__(self, shardset: ShardSet, cfg: EngineConfig | None = None,
                 graph_source: dict | None = None):
        self.shards = shardset
        self.cfg = cfg or EngineConfig(num_parts=shardset.P)
        assert self.cfg.num_parts == shardset.P
        if self.cfg.state_blocks is not None:
            self._state_blocks = min(shardset.P, self.cfg.state_blocks)
        else:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                cpus = 8
            # scatter-task granularity: per-task launch overhead dominates at
            # small data, so batch several parts per block; see config.py
            self._state_blocks = max(1, min(shardset.P, max(8, cpus // 2)))
        # topology-mutation support (SURVEY.md §2.6): where the edge table
        # lives and where rebuilt shard stores may be written. Optional —
        # algorithms that never mutate don't need it.
        self.graph_source = graph_source
        self._mutation_epoch = 0
        self.dead: set[int] = set()  # tombstoned vids (delete_vertex)
        self._actor_pools: dict = {}  # (shard_dir, W) -> actor-executor pool

    def close(self) -> None:
        """Release the actor-executor pool (executor="actors") explicitly.
        Pools also die with the Engine via GC, but a pinned pool holds
        `actor_workers` CPUs — call this before building another Engine in
        the same session so two full-width pools never contend for cores.
        RunResult.state survives (block ownership is transferred out of the
        pool at collection, actor_loop._collect_ds)."""
        for pool in self._actor_pools.values():
            for w in pool[0]:
                ray.kill(w)
        self._actor_pools.clear()

    def _edges_of_part(self, part: int) -> int:
        """Total edges across a partition's sub-shards (manifest sums,
        cached per shard-store epoch; runs inside pickled Engine copies in
        workers, each caching independently)."""
        ss = self.shards
        if getattr(self, "_pe_token", None) != ss.shard_dir:
            pe: dict[int, int] = {}
            for srow in ss.shards:
                pe[srow["part"]] = pe.get(srow["part"], 0) + int(srow["n_edges"])
            self._part_edges = pe
            self._pe_token = ss.shard_dir
        return self._part_edges.get(part, 0)

    # -- superstep stage factories (plain functions → stateless Ray tasks that
    #    reuse warm workers; CSR state is plasma-resident, so actor affinity
    #    is unnecessary and per-superstep actor-pool relaunch cost is avoided)

    def _scatter_rows(self, algorithm, ctx, refs, shards_of_part, meta_refs,
                      part, state, pmeta) -> list[dict]:
        """Messages this partition sends given its (fresh) state — emitted as
        kind=1 chunk rows addressed to the destination partitions. Runs
        inside apply (fused scatter: messages computed while applying
        superstep S are delivered at S+1, the reference's send semantics).

        Hybrid mode: a hub-split partition (>1 sub-shard) fans its
        sub-shards out as child Ray tasks — the blocked ray.get releases
        this task's CPU, so the children parallelize instead of running
        serially inside the apply task. Results are collected in gid order:
        bit-identical to the serial path. Gated on the partition's total
        edge count (cfg.parallel_scatter_min_edges): below it the child
        round-trip costs far more than the inline compute it saves
        (measured — see config.py)."""
        gids = shards_of_part.get(part, [])
        if (
            len(gids) > 1
            and self.cfg.parallel_scatter
            and self._edges_of_part(part) >= self.cfg.parallel_scatter_min_edges
        ):
            slim = {k: v for k, v in ctx.items() if not k.startswith("_")}
            state_ref = ray.put(state)
            futs = [
                _scatter_one.remote(
                    algorithm, slim, refs[g], g, state_ref, meta_refs.get(part),
                    first=(g == gids[0]),
                )
                for g in gids
            ]
            out = []
            for rows in ray.get(futs):
                out.extend(rows)
            return out
        out = []
        for gid in gids:
            shard = ray.get(refs[gid])  # zero-copy plasma views
            # first-sub-shard marker: outbox-style scatters (compute_api)
            # emit once per PARTITION, not once per sub-shard
            local_ctx = dict(ctx)
            local_ctx["_first_shard"] = gid == gids[0]
            for dst_part, cols in algorithm.scatter(shard, pmeta, state, local_ctx):
                n = len(cols["dst"])
                if n:
                    out.append(_row(dst_part, 1, gid, pack(cols), nmsg=n))
        return out

    def _make_apply(self, algorithm, ctx, meta_refs, refs=None, shards_of_part=None,
                    mailbox=None, resolve_prev=False):
        needs_edges = getattr(algorithm, "needs_edges_in_apply", False)
        n_local_map = dict(self.shards.n_local)
        token = self.shards.shard_dir

        def apply(group: pa.Table) -> pa.Table:
            if resolve_prev:
                # chained superstep: the previous step's merged metrics /
                # aggregates come from the mailbox instead of the driver
                # (all posts landed — the upstream sort is a barrier);
                # cached per worker process, one actor RTT per superstep
                key = (ctx["_mbx_token"], ctx["superstep"] - 1)
                hit = _PREV_CACHE.get(key)
                if hit is None:
                    posted = ray.get(mailbox.get_all.remote(ctx["superstep"] - 1))
                    hit = self._fold_mailbox(posted, ctx["superstep"] - 1, algorithm)
                    _PREV_CACHE[key] = hit
                    for k in [k for k in _PREV_CACHE if k[1] < key[1] - 2]:
                        _PREV_CACHE.pop(k, None)
                prev_m, prev_agg = hit
                local_ctx = dict(ctx)
                local_ctx["prev"] = prev_m.to_dict()
                local_ctx["agg"] = prev_agg
            else:
                local_ctx = ctx
            return self._apply_one(
                algorithm, local_ctx, meta_refs, refs, shards_of_part, mailbox,
                needs_edges, n_local_map, token, group,
            )

        return apply

    def _apply_one(self, algorithm, ctx, meta_refs, refs, shards_of_part, mailbox,
                   needs_edges, n_local_map, token, group: pa.Table) -> pa.Table:
        import time as _time

        profile = bool(os.environ.get("PREGEL_PROFILE_APPLY"))
        t0 = _time.monotonic()
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        state_idx = np.flatnonzero(kinds == 0)
        assert len(state_idx) == 1, f"expected 1 state row, got {len(state_idx)}"
        i = int(state_idx[0])
        part = int(group["part"][i].as_py())
        state = unpack(group["blob"][i].as_py())

        # deterministic message order: sort chunk rows by producing shard
        msg_idx = np.flatnonzero(kinds == 1)
        shards = group["shard"].to_numpy(zero_copy_only=False)
        msg_idx = msg_idx[np.argsort(shards[msg_idx], kind="stable")]
        msg_chunks = [unpack(group["blob"][int(j)].as_py()) for j in msg_idx]
        msgs = combine_msg_chunks(msg_chunks)
        t1 = _time.monotonic()

        if needs_edges:
            ctx["_adj"] = _part_adjacency(token, part, refs, shards_of_part, n_local_map)
        pmeta = ray.get(meta_refs[part]) if part in meta_refs else {}
        new_state, metrics, agg = algorithm.apply(part, pmeta, state, msgs, ctx)
        t2 = _time.monotonic()
        # fused scatter: emit this partition's S+1 messages from the
        # fresh state, so one groupby IS the whole superstep
        rows = self._scatter_rows(
            algorithm, ctx, refs, shards_of_part, meta_refs, part, new_state, pmeta
        )
        metrics = dict(metrics)
        metrics["nmsg"] = int(sum(r["nmsg"] for r in rows))
        if profile:
            # PREGEL_PROFILE_APPLY=1: per-part stage timings ride the
            # mailbox (driver exposes them as Metrics.parts) — the D6
            # instrumentation used for the hub-skew decomposition
            metrics["t_msg"] = t1 - t0
            metrics["t_apply"] = t2 - t1
            metrics["t_scatter"] = _time.monotonic() - t2
            metrics["rows_in"] = int(len(msgs["dst"])) if msgs else 0
            metrics["chunks_in"] = len(msg_chunks)
        agg_bytes = pickle.dumps(agg) if agg is not None else b""
        if mailbox is not None:
            # synchronous post: guarantees arrival before the barrier
            ray.get(mailbox.put.remote(ctx["superstep"], part, metrics, agg_bytes))
        rows.insert(
            0,
            _row(
                part, 0, -1, pack(new_state),
                active=metrics.get("active", 0),
                nmsg=metrics.get("nmsg", 0),
                m1=metrics.get("m1", 0.0),
                m2=metrics.get("m2", 0.0),
                agg=agg_bytes,
            ),
        )
        return _table(rows)

    def _fold_mailbox(self, posted: dict, superstep: int, algorithm) -> tuple[Metrics, dict]:
        """Fold per-part (metrics, agg) posts — deterministic part order."""
        m = Metrics(superstep=superstep, rows=len(posted))
        aggs = []
        for part in sorted(posted):
            pm, agg_bytes = posted[part]
            m.active += int(pm.get("active", 0))
            m.nmsg += int(pm.get("nmsg", 0))
            m.m1 += float(pm.get("m1", 0.0))
            m.m2 += float(pm.get("m2", 0.0))
            if agg_bytes:
                aggs.append(pickle.loads(agg_bytes))
        if os.environ.get("PREGEL_PROFILE_APPLY"):
            m.parts = {part: pm for part, (pm, _) in posted.items()}
        merged = algorithm.merge_agg(aggs) if aggs else {}
        return m, merged

    def _apply_mutations(self, muts: list[tuple], state: rd.Dataset, algorithm):
        """Apply topology mutations at the superstep boundary in the
        reference's deterministic order — delete edges, delete vertices,
        add vertices, add edges (worker.lua:197-309) — then rebuild the
        CSR shards of ONLY the affected partitions and extend per-part
        state for new vertices.

        Dataset-native: the edge table is never materialized on the
        driver — deletes are a broadcast-set streaming filter, adds a
        small union, and the rebuilt epoch reuses every untouched
        partition's shard files (graph.build_shards_delta). Only the
        intent lists and the rows they delete (bounded by the intents'
        incident edges) pass through the driver.

        delete_vertex tombstones the vertex and drops its OUT-edges —
        the reference's data_space:delete semantics; the cascading
        IN-edge delete stays NIY exactly like the reference
        (vertex.lua:183). Inbound messages to tombstones are dropped (M3).
        add_vertex carries an optional user NAME (the reference's
        obtain_name contract): part = stable_hash(name) % P, and adds
        whose name already exists are logged-and-skipped like the
        reference's third-phase "exists" dedup (worker.lua:270-285)."""
        import logging

        import pyarrow.compute as pc

        from .graph import DIRECTED, UNDIRECTED, build_shards_delta

        if self.graph_source is None:
            raise RuntimeError(
                "topology mutations need Engine(graph_source={'edges_dir', "
                "'vertices_dir', 'work_dir'})"
            )
        log = logging.getLogger("pregel_ray.mutations")
        gs = self.graph_source
        P = self.shards.P
        n_local = dict(self.shards.n_local)
        undirected = not algorithm.directed

        # deterministic intent order within each phase
        del_edges = sorted((int(m[1]), int(m[2])) for m in muts if m[0] == "delete_edge")
        cascade_vertices = sorted(
            int(m[1]) for m in muts if m[0] == "delete_vertex_cascade"
        )
        del_vertices = sorted(
            set(int(m[1]) for m in muts if m[0] == "delete_vertex")
            | set(cascade_vertices)
        )
        add_vertices = [m[1:] for m in muts if m[0] == "add_vertex"]  # (name, value)
        add_edges = sorted(m[1:] for m in muts if m[0] == "add_edge")

        edges = _read_parquet(gs["edges_dir"])
        affected: set[int] = set()

        # -- phases 1+2: deletes. One streaming pass COLLECTS the matching
        # rows (small: bounded by the intents' incident edges) for conflict
        # logging + affected-part discovery; a second streaming pass filters.
        del_pairs = frozenset(del_edges)
        del_vids = frozenset(del_vertices)

        del_vids_arr = np.fromiter(del_vids, np.int64, len(del_vids))
        cascade_arr = np.array(cascade_vertices, np.int64)
        pair_src = np.fromiter((s for s, _ in del_pairs), np.int64, len(del_pairs))
        pair_dst = np.fromiter((d for _, d in del_pairs), np.int64, len(del_pairs))

        def _sel(t: pa.Table) -> np.ndarray:
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            hit = np.isin(src, del_vids_arr)
            if len(cascade_arr):  # edges=True extension: in-edges go too
                hit |= np.isin(dst, cascade_arr)
            if del_pairs:
                # vectorized candidate prefilter, exact set test on the
                # (small) candidate rows only
                cand = np.flatnonzero(np.isin(src, pair_src) & np.isin(dst, pair_dst))
                for i in cand:
                    if (int(src[i]), int(dst[i])) in del_pairs:
                        hit[i] = True
            return hit

        if del_pairs or del_vids:
            def _matches(t: pa.Table) -> pa.Table:
                return t.filter(pa.array(_sel(t)))

            deleted = edges.map_batches(_matches, batch_format="pyarrow").take_all()
            found_pairs = {(r["src"], r["dst"]) for r in deleted}
            for s, d in del_pairs - found_pairs:
                log.warning("delete_edge (%s,%s): not exists", s, d)
            for r in deleted:
                affected.add(int(r["src"]) % P)
                if undirected:
                    affected.add(int(r["dst"]) % P)
            self.dead.update(del_vids)

            def _filt(t: pa.Table) -> pa.Table:
                return t.filter(pa.array(~_sel(t)))

            edges = edges.map_batches(_filt, batch_format="pyarrow")

        # -- phase 3: add vertices. Name-derived partition (edges.py
        # partitioner); dedupe against existing names via one streaming
        # containment check of the (small) added-name set.
        from .edges import stable_hash

        new_local: dict[int, list] = {}  # part -> [(vid, name, value)]
        if add_vertices:
            names = [
                n if n is not None else f"__added_e{self._mutation_epoch + 1}_{i}"
                for i, (n, _) in enumerate(add_vertices)
            ]
            name_set = set(names)

            def _existing(t: pa.Table) -> pa.Table:
                return t.select(["vid", "name"]).filter(
                    pc.is_in(t["name"], value_set=pa.array(sorted(name_set)))
                )

            existing = _read_parquet(gs["vertices_dir"]).map_batches(
                _existing, batch_format="pyarrow"
            ).take_all()
            # A tombstoned vid does not reserve its name: the reference's
            # data_space:delete removes the tuple, so delete-then-add of the
            # same name succeeds (vertex.lua:183 area / ADVICE r2). The stale
            # (name, dead vid) row is dropped from the vertices table below
            # so name→vid stays unique among live vertices.
            taken = {
                r["name"] for r in existing if int(r["vid"]) not in self.dead
            }
            seen: set = set()
            for name, (_, value) in sorted(
                zip(names, add_vertices), key=lambda x: x[0]
            ):
                if name in taken or name in seen:
                    log.warning("add_vertex %r: exists, skipped", name)
                    continue
                seen.add(name)
                part = int(stable_hash(np.array([name], object))[0] % P)
                vid = n_local.get(part, 0) * P + part
                n_local[part] = n_local.get(part, 0) + 1
                new_local.setdefault(part, []).append((vid, name, value))
                affected.add(part)  # meta arrays are n_local-sized

        # -- phase 4: add edges. Endpoint validity is ARITHMETIC — vids are
        # dense per part (vid // P < n_local[vid % P]) — no table lookup.
        def _vid_ok(v: int) -> bool:
            return (
                v >= 0 and (v // P) < n_local.get(v % P, 0) and v not in self.dead
            )

        add_rows = []
        for src, dst, w in add_edges:
            if not (_vid_ok(int(src)) and _vid_ok(int(dst))):
                log.warning("add_edge (%s,%s): vertex not exists, skipped", src, dst)
                continue
            add_rows.append((int(src), int(dst), float(w)))
            affected.add(int(src) % P)
            if undirected:
                affected.add(int(dst) % P)
        if add_rows:
            adds = pa.table(
                {
                    "src": pa.array([r[0] for r in add_rows], pa.int64()),
                    "dst": pa.array([r[1] for r in add_rows], pa.int64()),
                    "w": pa.array([r[2] for r in add_rows], pa.float64()),
                }
            )
            edges = edges.union(rd.from_arrow(adds))

        # -- persist the epoch: streaming parquet writes, delta shard build
        self._mutation_epoch += 1
        epoch_dir = os.path.join(gs["work_dir"], f"epoch{self._mutation_epoch}")
        new_edges_dir = os.path.join(epoch_dir, "edges")
        edges.write_parquet(new_edges_dir)
        from .edges import EDGE_SCHEMA, _ensure_parquet_dir

        _ensure_parquet_dir(new_edges_dir, EDGE_SCHEMA)
        gs["edges_dir"] = new_edges_dir

        new_verts_dir = os.path.join(epoch_dir, "vertices")
        verts = _read_parquet(gs["vertices_dir"])
        if new_local:
            # drop stale rows of re-added names (dead vid, same name) so the
            # vertices table keeps one live row per name
            readded = {name for lst in new_local.values() for _, name, _ in lst}
            dead_list = sorted(self.dead)
            if dead_list:
                readd_arr = pa.array(sorted(readded))
                dead_arr = pa.array(dead_list, pa.int64())

                def _drop_stale(t: pa.Table) -> pa.Table:
                    stale = pc.and_(
                        pc.is_in(t["name"], value_set=readd_arr),
                        pc.is_in(t["vid"], value_set=dead_arr),
                    )
                    return t.filter(pc.invert(stale))

                verts = verts.map_batches(_drop_stale, batch_format="pyarrow")
            vt = pa.table(
                {
                    "name": pa.array(
                        [name for lst in new_local.values() for _, name, _ in lst]
                    ),
                    "part": pa.array(
                        [p for p, lst in new_local.items() for _ in lst], pa.int32()
                    ),
                    "vid": pa.array(
                        [vid for lst in new_local.values() for vid, _, _ in lst],
                        pa.int64(),
                    ),
                }
            )
            verts = verts.union(rd.from_arrow(vt))
        verts.write_parquet(new_verts_dir)
        gs["vertices_dir"] = new_verts_dir

        self.shards = build_shards_delta(
            self.shards,
            _read_parquet(new_edges_dir),
            os.path.join(epoch_dir, "shards"),
            self.cfg,
            affected,
            n_local,
            variant=DIRECTED if algorithm.directed else UNDIRECTED,
        )
        refs, meta_refs = self.shards.load_refs()

        # extend per-part state for the added vertices + propagate tombstones
        adds = {p: [val for _, _, val in lst] for p, lst in new_local.items()}

        def _extend(t: pa.Table) -> pa.Table:
            rows = []
            for i in range(t.num_rows):
                part = int(t["part"][i].as_py())
                r = {k: t[k][i].as_py() for k in t.column_names}
                # only STATE rows get new vertex slots; pending message
                # chunks (kind=1, fused scatter) pass through untouched
                if int(t["kind"][i].as_py()) == 0 and part in adds:
                    st = unpack(t["blob"][i].as_py())
                    st = {k: v.copy() for k, v in st.items()}
                    st = algorithm.extend_state(st, adds[part], part)
                    r["blob"] = pack(st)
                rows.append(r)
            if not rows:
                return CHUNK_SCHEMA.empty_table()
            return pa.table(
                {k: pa.array([r[k] for r in rows], CHUNK_SCHEMA.field(k).type)
                 for k in CHUNK_SCHEMA.names},
                schema=CHUNK_SCHEMA,
            )

        state = state.map_batches(_extend, batch_format="pyarrow").materialize()
        state = rd.from_arrow_refs(state.to_arrow_refs())
        return state, refs, meta_refs

    def _collect(self, state: rd.Dataset, superstep: int, algorithm) -> tuple[Metrics, dict]:
        rows = state.select_columns(
            ["part", "kind", "active", "nmsg", "m1", "m2", "agg"]
        ).take_all()
        rows = sorted((r for r in rows if r["kind"] == 0), key=lambda r: r["part"])
        m = Metrics(
            superstep=superstep,
            active=int(sum(r["active"] for r in rows)),
            nmsg=int(sum(r["nmsg"] for r in rows)),
            m1=float(sum(r["m1"] for r in rows)),
            m2=float(sum(r["m2"] for r in rows)),
            rows=len(rows),
        )
        aggs = [pickle.loads(r["agg"]) for r in rows if r["agg"]]
        merged = algorithm.merge_agg(aggs) if aggs else {}
        return m, merged

    def _base_ctx(self, params: dict) -> dict:
        return {
            "N": self.shards.n_vertices,
            "P": self.shards.P,
            "params": params,
        }

    def init_state(self, algorithm, params: dict | None = None) -> tuple[rd.Dataset, Metrics, dict]:
        """Initial state chunks + the initial scatter (messages delivered at
        superstep 1 — scatter of state_0, reference: first run_superstep
        reads an empty inbox unless the algorithm pre-sends)."""
        params = {**self.cfg.params, **(params or {})}
        ctx = self._base_ctx(params)
        ctx["superstep"] = 1
        refs, meta_refs = self.shards.load_refs()
        shards_of_part = self.shards.shards_of_part
        n_local = self.shards.n_local

        def _init(batch: pa.Table) -> pa.Table:
            out = []
            for i in range(batch.num_rows):
                part = int(batch["id"][i].as_py())
                pmeta = ray.get(meta_refs[part]) if part in meta_refs else {}
                state, metrics = algorithm.init(part, n_local.get(part, 0), pmeta, ctx)
                rows = self._scatter_rows(
                    algorithm, ctx, refs, shards_of_part, meta_refs, part, state, pmeta
                )
                out.append(
                    _row(
                        part, 0, -1, pack(state),
                        active=metrics.get("active", 0),
                        nmsg=int(sum(r["nmsg"] for r in rows)),
                        m1=metrics.get("m1", 0.0),
                        m2=metrics.get("m2", 0.0),
                    )
                )
                out.extend(rows)
            return _table(out)

        state = (
            rd.range(self.shards.P, override_num_blocks=self._state_blocks)
            .map_batches(_init, batch_format="pyarrow")
            .materialize()
        )
        m, merged = self._collect(state, 0, algorithm)
        return state, m, merged

    def run(
        self,
        algorithm,
        params: dict | None = None,
        run_dir: str | None = None,
        resume: bool = True,
    ) -> RunResult:
        import time

        from . import checkpoint as ckpt

        if self.cfg.executor == "actors":
            from .actor_loop import run_actor_loop

            return run_actor_loop(self, algorithm, params, run_dir, resume)

        params = {**self.cfg.params, **(params or {})}

        def _engine_meta() -> dict:
            return {
                "shard_dir": self.shards.shard_dir,
                "mutation_epoch": self._mutation_epoch,
                "dead": sorted(self.dead),
                "graph_source": dict(self.graph_source) if self.graph_source else None,
            }

        start = 1
        state = prev = None
        history: list[Metrics] = []
        if run_dir and resume:
            resumed = ckpt.try_resume(run_dir)
            if resumed is not None:
                start, state, history, emeta = resumed
                # restore the topology epoch the checkpoint was taken on —
                # a mutated-then-resumed run must continue on the mutated
                # graph, not the ShardSet the Engine was constructed with
                if emeta:
                    if emeta["shard_dir"] != self.shards.shard_dir:
                        self.shards = ShardSet(emeta["shard_dir"])
                    self._mutation_epoch = int(emeta.get("mutation_epoch", 0))
                    self.dead = set(emeta.get("dead", ()))
                    if emeta.get("graph_source"):
                        self.graph_source = dict(emeta["graph_source"])
                prev, agg = self._collect(state, start - 1, algorithm)
                prev = history[-1] if history else prev
        refs, meta_refs = self.shards.load_refs()
        if state is None:
            state, prev, agg = self.init_state(algorithm, params)
            history = [prev]
            if run_dir:
                ckpt.write(run_dir, 0, state, history, engine_meta=_engine_meta())
            start = 1

        converged = False
        mailbox = _Mailbox.remote()
        s = start - 1
        if s > 0 and algorithm.should_stop(prev, s):
            # resumed a run that had already terminated — do not over-iterate
            converged = True
            return RunResult(state=state, history=history, supersteps=s,
                             converged=True, algorithm=algorithm, P=self.shards.P)
        # Superstep chaining: K supersteps build as ONE lazy plan (K chained
        # groupby(part)→map_groups stages) and materialize once — the Ray
        # Data per-execution overhead (~0.2 s: plan build, executor spin-up,
        # stage scheduling) amortizes K×, which is what the N→4N efficiency
        # of small/medium graphs is bound by (BENCH/BASELINE.md). Cross-step
        # global scalars (prev metrics, merged aggregators) resolve through
        # the mailbox INSIDE the plan; the sort stages are the barriers.
        # Chaining is exact: fixed-iteration caps never overshoot (chunks
        # clip at max_iters) and convergence-stopped algorithms run at most
        # K-1 extra supersteps, which are identity for quiescent vote-halt
        # algorithms and extra refinement for tolerance-based PageRank.
        # Algorithms that mutate topology or need per-step driver decisions
        # opt out via supports_chaining=False → K=1 (reference per-step
        # barrier semantics, master.lua:54-88).
        K = max(1, self.cfg.chain_supersteps) if getattr(
            algorithm, "supports_chaining", False
        ) else 1
        algo_cap = getattr(algorithm, "max_iters", None) or self.cfg.max_supersteps

        def _run_chunk(state0, prev0, agg0, k, s0) -> rd.Dataset:
            """k supersteps as ONE lazy plan from state0 (k=1 = the plain
            per-step barrier). refs/meta_refs resolve at call time so
            mutation epochs are picked up."""
            plan = state0
            mbx_token = mailbox._actor_id.hex()
            for j in range(k):
                ss = s0 + 1 + j
                ctx = self._base_ctx(params)
                ctx.update({"superstep": ss, "dead": frozenset(self.dead),
                            "_mbx_token": mbx_token})
                ctx["N"] = self.shards.n_vertices  # mutations may change it
                if j == 0:
                    ctx.update({"prev": prev0.to_dict(), "agg": agg0})
                # ONE groupby is one whole superstep: the state rows carry
                # the previous step's message chunks (fused scatter), the
                # part-shuffle routes them, apply reduces + computes + emits
                # the next round's messages.
                apply = self._make_apply(
                    algorithm, ctx, meta_refs, refs, self.shards.shards_of_part,
                    mailbox, resolve_prev=(j > 0),
                )
                plan = plan.groupby("part").map_groups(apply, batch_format="pyarrow")
            new_state = plan.materialize()
            if new_state.num_blocks() > self._state_blocks:
                # bound block count (growth would compound every superstep).
                # The groupby sort PRESERVES its input block count, so with
                # state0 already at ≤ _state_blocks this never fires in the
                # steady loop — the unconditional per-step repartition was
                # pure overhead (round-4 old-vs-new interleaved A/B, sf2.0
                # @8 cpus ×8 reps: median step 1.37 → 0.95 s, new faster in
                # 7/8 reps, results bit-identical)
                new_state = new_state.repartition(self._state_blocks).materialize()
            # hard lineage cut: rebuild from the materialized blocks so the
            # next chunk's plan starts at Input — without this the union
            # branch re-executes the whole superstep history (observed:
            # duration doubling per superstep from s7 on)
            return rd.from_arrow_refs(new_state.to_arrow_refs())

        s = start - 1
        while s < min(self.cfg.max_supersteps, algo_cap) and not converged:
            t0 = time.monotonic()
            k_steps = min(K, self.cfg.max_supersteps - s, algo_cap - s)
            if self.cfg.checkpoint_interval:
                # land chunk ends exactly on checkpoint boundaries so the
                # every-K-supersteps checkpoint contract survives chaining
                k_steps = min(
                    k_steps,
                    self.cfg.checkpoint_interval - s % self.cfg.checkpoint_interval,
                )
            chunk_in = (state, prev, agg)
            state = _run_chunk(state, prev, agg, k_steps, s)
            chunk_dur = time.monotonic() - t0
            done_steps = k_steps
            for j in range(k_steps):
                ss = s + 1 + j
                prev, agg = self._fold_mailbox(
                    ray.get(mailbox.collect.remote(ss)), ss, algorithm
                )
                prev.duration = chunk_dur / k_steps
                history.append(prev)
                if algorithm.should_stop(prev, ss):
                    converged = True
                    done_steps = j + 1
                    break
            s += done_steps
            if converged and done_steps < k_steps and not getattr(
                algorithm, "quiescent_convergence", True
            ):
                # Tolerance-stopped (e.g. PageRank L1<tol): the chunk's
                # trailing steps are extra refinement, not identity — replay
                # the chunk clipped at the converged step so chaining returns
                # exactly the per-step-barrier (K=1) converged state.
                # Quiescent vote-halt algorithms skip this: their post-
                # convergence steps are identity, the state is already exact.
                st0, pv0, ag0 = chunk_in
                state = _run_chunk(st0, pv0, ag0, done_steps, s - done_steps)

            muts = agg.pop("_mutations", None)
            if muts:
                state, refs, meta_refs = self._apply_mutations(muts, state, algorithm)

            if run_dir and self.cfg.checkpoint_interval and s % self.cfg.checkpoint_interval == 0:
                ckpt.write(run_dir, s, state, history, engine_meta=_engine_meta())

        if run_dir:
            ckpt.write(run_dir, s, state, history, final=True,
                       engine_meta=_engine_meta())
        return RunResult(
            state=state,
            history=history,
            supersteps=s,
            converged=converged,
            algorithm=algorithm,
            P=self.shards.P,
        )
