"""Raw-actor superstep executor (opt-in, ``EngineConfig.executor="actors"``).

The Dataset executor pays a fixed ~0.2 s per superstep — plan build,
streaming-executor spin-up, stage scheduling — measured constant in data
size (BENCH/BASELINE.md). That floor is irrelevant at 100 TB (a superstep
moves minutes of data) but dominates small/medium graphs and is exactly
what capped the sf1.0 two-parallelism scaling at 0.60. Superstep chaining
(K sorts in one lazy plan) was measured and rejected (config.py); this is
the remaining lever the round-2 verdict named: keep the per-step barrier
but drop the per-step plan build.

Design — the Dataset pipeline's roles, redistributed:

    actor pool (W long-lived actors)   each actor OWNS a fixed set of
                                       partitions: CSR shard views
                                       (zero-copy plasma, fetched once),
                                       per-part meta, and the mutable
                                       per-part state dicts
    one superstep                      driver calls step(ctx) on every
                                       actor; each actor applies + fused-
                                       scatters its parts and pushes each
                                       destination's chunks DIRECTLY to
                                       the owning peer (post.remote, keyed
                                       by delivery superstep) — Ray inlines
                                       small pushes in the RPC and spills
                                       big ones to plasma, so the exchange
                                       batches adaptively and never moves
                                       bytes through the driver (a ray.put
                                       per destination was measured 5×
                                       slower at W=30: 900 small store
                                       objects/step contending on plasma)
    barrier                            ray.get of the W step returns, then
                                       of the returned push-ack refs — so
                                       every inbox is complete before any
                                       step(S+1) is issued
    metrics / aggregators              per-part (metrics, agg) ride the
                                       step returns; folded with the same
                                       Engine._fold_mailbox as the
                                       Dataset path

Semantics are bit-identical to the Dataset executor: the same
``Algorithm.scatter``/``apply`` run per partition, inbox chunks are
combined by the shared ``engine.combine_msg_chunks`` in the same
producing-shard (gid-sorted) order, and metrics fold in part order
(tested in tests/test_actor_loop.py, including cross-executor checkpoint
resume). Checkpoints are the same CHUNK_SCHEMA state datasets — a run
checkpointed under one executor resumes under the other.

Trade-offs vs the Dataset path (why this is OPT-IN, not the default):
per-partition state and message volume must fit the owning actor's heap
(no streaming spill), a hub partition's APPLY/combine stays serial inside
its owner (its sub-shards' scatter does fan out to child tasks, like the
Dataset path's hybrid scatter), and a lost actor loses its state (recover
from the last checkpoint; the Dataset path instead re-executes lineage).
At 100 TB with large per-step data movement the Dataset executor's
streaming/backpressure wins; for latency-bound regimes — many supersteps
over a graph whose partitions fit memory, i.e. the reference's own
workload shape (worker.lua's in-memory vertex spaces) — this pool is the
right shape and removes the floor.
"""

from __future__ import annotations

import pickle
import time

import numpy as np
import ray
import ray.data as rd

from .chunks import pack, unpack
from .engine import Metrics, RunResult, _row, _table, combine_msg_chunks

# outbox/inbox chunk tuple: (dst_part, producing shard gid, nmsg, packed cols)


@ray.remote(num_cpus=0)
def _scatter_shard(algo, ctx, shard, gid, state, pmeta, first=True):
    """One sub-shard's scatter as a child task of its owning pool actor —
    the actor-loop twin of engine._scatter_one (hub-split partitions
    otherwise scatter their sub-shards serially inside the owner, the
    documented skew trade-off). `shard` and `state` arrive as ObjectRefs
    → zero-copy plasma views. num_cpus=0: pool actors HOLD their CPU
    while blocked in ray.get (actor reservations are for life, unlike
    tasks), so a CPU-reserving child could never schedule when the pool
    spans every core — the children are short vectorized bursts that run
    while their parent blocks."""
    ctx = dict(ctx)
    ctx["_first_shard"] = bool(first)
    out = []
    for dst_part, cols in algo.scatter(shard, pmeta or {}, state, ctx):
        n = len(cols["dst"])
        if n:
            out.append((int(dst_part), gid, n, pack(cols)))
    return out


@ray.remote
class _PartWorker:
    """One pool member: owns `parts`, their CSR shard plasma views, meta,
    and mutable state. Message chunks carry the producing shard gid so
    delivery order is deterministic regardless of arrival order."""

    def __init__(self, widx, parts, shard_refs, meta_refs, shards_of_part,
                 n_local_map, part_to_widx, token, parallel_scatter=True,
                 parallel_scatter_min_edges=16_000_000, presum_push=False):
        self.widx = widx
        self.parts = sorted(parts)
        self.shards_of_part = {p: list(shards_of_part.get(p, ())) for p in self.parts}
        self.shard_refs = dict(shard_refs)  # kept for child-task scatter
        self.parallel_scatter = bool(parallel_scatter)
        self.parallel_scatter_min_edges = int(parallel_scatter_min_edges)
        self.presum_push = bool(presum_push)
        # fetch once, hold zero-copy plasma views for the pool's lifetime
        self.shards = {
            gid: ray.get(shard_refs[gid])
            for p in self.parts
            for gid in self.shards_of_part[p]
        }
        self.meta = {
            p: (ray.get(meta_refs[p]) if p in meta_refs else {}) for p in self.parts
        }
        self.n_local = {p: int(n_local_map.get(p, 0)) for p in self.parts}
        self.part_to_widx = dict(part_to_widx)
        self.token = token
        self.algo = None
        self.peers = None  # full pool handle list (set_peers)
        self.state: dict = {}  # part -> state column dict
        self.last: dict = {}  # part -> (metrics dict, agg bytes) of last apply
        self.inbox: dict = {}  # delivery superstep -> inbox chunk list
        self._adj: dict = {}  # part -> src-sorted adjacency (per-vertex API)

    def set_peers(self, peers):
        self.peers = peers

    def post(self, ss, chunks):
        """Inbox push from a peer's fused scatter, keyed by DELIVERY
        superstep: exact regardless of cross-caller arrival interleaving
        (Ray orders actor tasks per caller, not globally), and delivery
        itself sorts by producing shard gid — arrival order never matters."""
        self.inbox.setdefault(ss, []).extend(chunks)

    # -- internals ---------------------------------------------------------

    def _adjacency(self, part):
        """Same math as engine._part_adjacency, over the held shard views."""
        hit = self._adj.get(part)
        if hit is not None:
            return hit
        n = self.n_local[part]
        gids = self.shards_of_part[part]
        if not gids:
            adj = (np.zeros(n + 1, np.int64), np.array([], np.int64),
                   np.array([], np.float64))
        else:
            shards = [self.shards[g] for g in gids]
            src = np.concatenate([s["src_local"] for s in shards])
            dst = np.concatenate([s["dst"] for s in shards])
            w = np.concatenate([s["w"] for s in shards])
            order = np.lexsort((dst, src))
            src, dst, w = src[order], dst[order], w[order]
            indptr = np.zeros(n + 1, np.int64)
            np.add.at(indptr, src + 1, 1)
            np.cumsum(indptr, out=indptr)
            adj = (indptr, dst, w)
        self._adj[part] = adj
        return adj

    def _scatter(self, algo, ctx, part, state):
        gids = self.shards_of_part[part]
        if (
            len(gids) > 1
            and self.parallel_scatter
            and sum(len(self.shards[g]["dst"]) for g in gids)
            >= self.parallel_scatter_min_edges
        ):
            # hub-split partition: fan sub-shards out as child tasks (the
            # blocked ray.get yields this actor's CPU to the children);
            # gid-ordered collection keeps the chunk stream bit-identical
            # to the serial path.
            slim = {k: v for k, v in ctx.items() if not k.startswith("_")}
            state_ref = ray.put(state)
            futs = [
                _scatter_shard.remote(
                    algo, slim, self.shard_refs[g], g, state_ref,
                    self.meta.get(part), first=(g == gids[0]),
                )
                for g in gids
            ]
            out = []
            for rows in ray.get(futs):
                out.extend(rows)
            return out
        out = []
        for gid in gids:
            # first-sub-shard marker: outbox-style scatters (compute_api)
            # emit once per PARTITION, not once per sub-shard
            local_ctx = dict(ctx)
            local_ctx["_first_shard"] = gid == gids[0]
            for dst_part, cols in algo.scatter(self.shards[gid], self.meta[part],
                                               state, local_ctx):
                n = len(cols["dst"])
                if n:
                    out.append((int(dst_part), gid, n, pack(cols)))
        return out

    def _presum(self, algo, out):
        """Opt-in sender-side cross-shard combine (EngineConfig.presum_push):
        fold this worker's chunks per destination PARTITION into one chunk
        before the push — the exchange then carries ≤ P chunks per worker
        per step instead of (#owned shards × P), and the receiver unpacks
        W-fold fewer chunk rows. Legal only for algorithms declaring an
        associative `precombine` (float regrouping ≈1e-16/fold — why this
        is not the default). Folded chunks keep the MINIMUM member gid so
        the receiver's gid-sort stays deterministic."""
        fold = getattr(algo, "precombine", None)
        if fold is None:
            return out
        by_dst: dict[int, list] = {}
        for ch in out:
            by_dst.setdefault(ch[0], []).append(ch)
        folded = []
        for dst_part in sorted(by_dst):
            lst = sorted(by_dst[dst_part], key=lambda c: c[1])
            if len(lst) == 1:
                folded.append(lst[0])
                continue
            cols = combine_msg_chunks([unpack(c[3]) for c in lst])
            comb = fold(cols)
            folded.append((dst_part, lst[0][1], len(comb["dst"]), pack(comb)))
        return folded

    def _deliver(self, ss, chunks):
        """Push outgoing chunks straight to their destination workers
        (`peer.post.remote`, delivery superstep ``ss``) and return the ack
        refs — the driver awaits them as part of the superstep barrier.
        Ray inlines small call args in the RPC and auto-spills large ones
        to plasma, so the exchange batches adaptively; an explicit
        ray.put-per-destination was measured 5× slower at W=30 (900 small
        objects/step contending on the store). Own-partition messages
        short-circuit locally."""
        by_w: dict[int, list] = {}
        for ch in chunks:
            by_w.setdefault(self.part_to_widx[ch[0]], []).append(ch)
        acks = []
        px = getattr(self, "_px", None) or [0, 0, 0, 0]  # rbytes, rchunks, pushes, lbytes
        for w, lst in sorted(by_w.items()):
            if w == self.widx:
                self.inbox.setdefault(ss, []).extend(lst)
                px[3] += sum(len(c[3]) for c in lst)
            else:
                acks.append(self.peers[w].post.remote(ss, lst))
                px[0] += sum(len(c[3]) for c in lst)
                px[1] += len(lst)
                px[2] += 1
        self._px = px
        return acks

    # -- lifecycle ---------------------------------------------------------

    def init_parts(self, algo, ctx):
        """algorithm.init per owned part + the fused initial scatter
        (identical to Engine.init_state's per-part body; the initial
        scatter delivers at superstep 1)."""
        self.algo = algo
        self.state, self.last, self.inbox = {}, {}, {}
        self._adj = {}
        posts, out = {}, []
        for part in self.parts:
            c = dict(ctx)
            state, metrics = algo.init(part, self.n_local[part], self.meta[part], c)
            rows = self._scatter(algo, c, part, state)
            metrics = dict(metrics)
            metrics["nmsg"] = int(sum(r[2] for r in rows))
            self.state[part] = state
            self.last[part] = (metrics, b"")
            posts[part] = (metrics, b"")
            out.extend(rows)
        if self.presum_push:
            out = self._presum(algo, out)
        return posts, self._deliver(1, out)

    def load_state(self, algo, block_refs, next_ss):
        """Resume / post-mutation load from a CHUNK_SCHEMA state dataset:
        pick out this worker's state rows, and its pending inbox chunks
        keyed for delivery at ``next_ss`` (the superstep the run continues
        at). Returns per-part (metrics, agg) so the driver can rebuild
        `prev` exactly like Engine._collect does on resume."""
        self.algo = algo
        self.state, self.last, self.inbox = {}, {}, {}
        self._adj = {}
        mine = set(self.parts)
        posts = {}
        for ref in block_refs:
            t = ray.get(ref)
            for i in range(t.num_rows):
                part = int(t["part"][i].as_py())
                if part not in mine:
                    continue
                blob = t["blob"][i].as_py()  # bytes copy → owns its memory
                if int(t["kind"][i].as_py()) == 0:
                    self.state[part] = unpack(blob)
                    m = {
                        "active": int(t["active"][i].as_py()),
                        "nmsg": int(t["nmsg"][i].as_py()),
                        "m1": float(t["m1"][i].as_py()),
                        "m2": float(t["m2"][i].as_py()),
                    }
                    agg = t["agg"][i].as_py() or b""
                    self.last[part] = (m, agg)
                    posts[part] = (m, agg)
                else:
                    self.inbox.setdefault(next_ss, []).append(
                        (part, int(t["shard"][i].as_py()),
                         int(t["nmsg"][i].as_py()), blob)
                    )
        return posts

    def timings(self):
        """Per-worker probe counters (BENCH decompositions): cumulative
        compute/push seconds + step count, and the exchange volume —
        remote push bytes/chunks/pushes and locally short-circuited bytes."""
        t = getattr(self, "_t", None) or [0.0, 0.0, 0]
        px = getattr(self, "_px", None) or [0, 0, 0, 0]
        return {
            "compute_sec": t[0], "push_sec": t[1], "steps": t[2],
            "remote_bytes": px[0], "remote_chunks": px[1],
            "remote_pushes": px[2], "local_bytes": px[3],
        }

    def step(self, ctx):
        """One superstep over the owned parts: combine inbox → apply →
        fused scatter. Returns per-part (metrics, agg bytes) and the ack
        refs of the pushes delivering S+1's messages (the driver awaits
        them as part of the barrier, so every inbox is complete before
        any step(S+1) call is issued)."""
        t0 = time.monotonic()
        algo = self.algo
        ss = int(ctx["superstep"])
        chunks = self.inbox.pop(ss, [])
        by_part: dict[int, list] = {}
        for ch in chunks:
            by_part.setdefault(ch[0], []).append(ch)
        needs_edges = getattr(algo, "needs_edges_in_apply", False)
        posts, out = {}, []
        for part in self.parts:
            pchunks = sorted(by_part.get(part, ()), key=lambda c: c[1])
            msgs = combine_msg_chunks([unpack(c[3]) for c in pchunks])
            c = dict(ctx)
            if needs_edges:
                c["_adj"] = self._adjacency(part)
            new_state, metrics, agg = algo.apply(
                part, self.meta[part], self.state[part], msgs, c
            )
            rows = self._scatter(algo, c, part, new_state)
            metrics = dict(metrics)
            metrics["nmsg"] = int(sum(r[2] for r in rows))
            agg_bytes = pickle.dumps(agg) if agg is not None else b""
            self.state[part] = new_state
            self.last[part] = (metrics, agg_bytes)
            posts[part] = (metrics, agg_bytes)
            out.extend(rows)
        if self.presum_push:
            out = self._presum(algo, out)
        t_compute = time.monotonic() - t0
        acks = self._deliver(ss + 1, out)
        t_push = time.monotonic() - t0 - t_compute
        t = getattr(self, "_t", None) or [0.0, 0.0, 0]
        self._t = [t[0] + t_compute, t[1] + t_push, t[2] + 1]
        return posts, acks

    def collect_state(self):
        """This worker's slice of the run state as a CHUNK_SCHEMA Arrow
        table: one kind=0 row per owned part (same blob `pack` as the
        Dataset path) plus kind=1 rows for the not-yet-consumed inbox
        chunks (the driver awaits all delivery acks before calling this,
        so the inbox is complete). Read-only — the pool keeps running."""
        rows = []
        for part in self.parts:
            m, agg_bytes = self.last.get(part, ({}, b""))
            rows.append(
                _row(
                    part, 0, -1, pack(self.state[part]),
                    active=m.get("active", 0), nmsg=m.get("nmsg", 0),
                    m1=m.get("m1", 0.0), m2=m.get("m2", 0.0), agg=agg_bytes,
                )
            )
        for ss in sorted(self.inbox):
            for dst_part, gid, n, blob in self.inbox[ss]:
                rows.append(_row(dst_part, 1, gid, blob, nmsg=n))
        return _table(rows)


# -- driver side ------------------------------------------------------------


def _assign_parts(shardset, W: int) -> list[list[int]]:
    """Deterministic greedy LPT by per-part edge count: heaviest partitions
    spread first so no actor owns two hubs (the actor pool's skew answer —
    sub-shards of one part still apply serially inside their owner)."""
    sizes = dict.fromkeys(range(shardset.P), 0)
    for s in shardset.shards:
        sizes[int(s["part"])] = sizes.get(int(s["part"]), 0) + int(s["n_edges"])
    order = sorted(sizes, key=lambda p: (-sizes[p], p))
    loads = [0] * W
    assign: list[list[int]] = [[] for _ in range(W)]
    for p in order:
        w = min(range(W), key=lambda i: (loads[i], i))
        assign[w].append(p)
        loads[w] += sizes[p] + 1
    return assign


def _pool_size(engine) -> int:
    if engine.cfg.actor_workers is not None:
        return max(1, min(engine.shards.P, engine.cfg.actor_workers))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    try:
        n_nodes = max(1, sum(1 for n in ray.nodes() if n.get("Alive")))
    except Exception:
        n_nodes = 1
    # per-node ceiling: the kernels are bandwidth-bound, extra workers on
    # one bus only add O(W²) exchange (config.actor_workers_per_node)
    cap = max(1, engine.cfg.actor_workers_per_node) * n_nodes
    return max(1, min(engine.shards.P, cpus - 2, cap))


def _get_pool(engine, W: int):
    """Engine-cached pool: shard views reload only when the shard epoch
    (mutations) or W changes; stale-epoch pools are killed."""
    key = (engine.shards.shard_dir, W)
    pool = engine._actor_pools.get(key)
    if pool is not None:
        return pool
    for old_key, old in list(engine._actor_pools.items()):
        for w in old[0]:
            ray.kill(w)
        del engine._actor_pools[old_key]
    refs, meta_refs = engine.shards.load_refs()
    assign = _assign_parts(engine.shards, W)
    part_to_widx = {p: w for w, ps in enumerate(assign) for p in ps}
    workers = [
        _PartWorker.remote(
            w,
            assign[w],
            {g: refs[g] for p in assign[w]
             for g in engine.shards.shards_of_part.get(p, ())},
            {p: meta_refs[p] for p in assign[w] if p in meta_refs},
            engine.shards.shards_of_part,
            dict(engine.shards.n_local),
            part_to_widx,
            engine.shards.shard_dir,
            engine.cfg.parallel_scatter,
            engine.cfg.parallel_scatter_min_edges,
            engine.cfg.presum_push,
        )
        for w in range(W)
    ]
    pool = (workers, part_to_widx)
    ray.get([w.set_peers.remote(workers) for w in workers])
    engine._actor_pools[key] = pool
    return pool


def _gather(results):
    """results[i] = (posts, ack refs) in worker order → merged posts + the
    flat ack list; the driver ray.gets the acks as the second half of the
    superstep barrier (every peer post landed before the next step)."""
    posts: dict = {}
    acks: list = []
    for r in results:
        posts.update(r[0])
        acks.extend(r[1])
    return posts, acks


def _collect_ds(workers, acks) -> rd.Dataset:
    """State dataset (CHUNK_SCHEMA) from the pool (owned parts + any
    not-yet-consumed inbox chunks; `acks` awaited first so deliveries are
    complete). The identity map_batches transfers block ownership out of
    the actors so the result outlives the pool (checkpoints,
    RunResult.state, mutation application all consume this)."""
    if acks:
        ray.get(list(acks))
    futs = [w.collect_state.remote() for w in workers]
    ds = rd.from_arrow_refs(futs).map_batches(
        lambda t: t, batch_format="pyarrow"
    ).materialize()
    return rd.from_arrow_refs(ds.to_arrow_refs())


def run_actor_loop(engine, algorithm, params=None, run_dir=None,
                   resume=True) -> RunResult:
    """Engine.run body for cfg.executor == "actors" — same contract,
    checkpoints and history as the Dataset executor."""
    from . import checkpoint as ckpt
    from .graph import ShardSet

    cfg = engine.cfg
    params = {**cfg.params, **(params or {})}

    def _engine_meta() -> dict:
        return {
            "shard_dir": engine.shards.shard_dir,
            "mutation_epoch": engine._mutation_epoch,
            "dead": sorted(engine.dead),
            "graph_source": dict(engine.graph_source) if engine.graph_source else None,
        }

    def _ctx(superstep: int, prev=None, agg=None) -> dict:
        c = engine._base_ctx(params)
        c["superstep"] = superstep
        c["dead"] = frozenset(engine.dead)
        if prev is not None:
            c["prev"] = prev.to_dict()
            c["agg"] = agg
        return c

    # -- resume (same semantics as Engine.run) -----------------------------
    start = 1
    state_ds = None
    history: list[Metrics] = []
    if run_dir and resume:
        resumed = ckpt.try_resume(run_dir)
        if resumed is not None:
            start, state_ds, history, emeta = resumed
            if emeta:
                if emeta["shard_dir"] != engine.shards.shard_dir:
                    engine.shards = ShardSet(emeta["shard_dir"])
                engine._mutation_epoch = int(emeta.get("mutation_epoch", 0))
                engine.dead = set(emeta.get("dead", ()))
                if emeta.get("graph_source"):
                    engine.graph_source = dict(emeta["graph_source"])

    W = _pool_size(engine)
    workers, _ = _get_pool(engine, W)
    acks: list = []

    if state_ds is not None:
        block_refs = list(state_ds.to_arrow_refs())
        posts = {}
        for p in ray.get([w.load_state.remote(algorithm, block_refs, start)
                          for w in workers]):
            posts.update(p)
        prev, agg = engine._fold_mailbox(posts, start - 1, algorithm)
        prev = history[-1] if history else prev
    else:
        results = ray.get(
            [w.init_parts.remote(algorithm, _ctx(1)) for w in workers]
        )
        posts, acks = _gather(results)
        prev, agg = engine._fold_mailbox(posts, 0, algorithm)
        history = [prev]
        if run_dir:
            ckpt.write(run_dir, 0, _collect_ds(workers, acks), history,
                       engine_meta=_engine_meta())
        start = 1

    s = start - 1
    if s > 0 and algorithm.should_stop(prev, s):
        return RunResult(state=_collect_ds(workers, acks), history=history,
                         supersteps=s, converged=True, algorithm=algorithm,
                         P=engine.shards.P)

    algo_cap = getattr(algorithm, "max_iters", None) or cfg.max_supersteps
    converged = False
    while s < min(cfg.max_supersteps, algo_cap) and not converged:
        t0 = time.monotonic()
        ss = s + 1
        ctx = _ctx(ss, prev, agg)
        # barrier half 1: inbox[ss] is complete before any step(ss) runs
        if acks:
            ray.get(acks)
        results = ray.get([w.step.remote(ctx) for w in workers])
        posts, acks = _gather(results)  # half 2 awaited before step(ss+1)
        prev, agg = engine._fold_mailbox(posts, ss, algorithm)
        prev.duration = time.monotonic() - t0
        history.append(prev)
        s = ss
        converged = algorithm.should_stop(prev, s)

        muts = agg.pop("_mutations", None)
        if muts:
            # boundary mutations: pull the run state out of the pool, apply
            # through the shared Dataset-native path (delta shard rebuild),
            # then reload a pool on the new epoch
            state_ds = _collect_ds(workers, acks)
            state_ds, _, _ = engine._apply_mutations(muts, state_ds, algorithm)
            workers, _ = _get_pool(engine, W)  # new shard_dir → fresh pool
            block_refs = list(state_ds.to_arrow_refs())
            ray.get([w.load_state.remote(algorithm, block_refs, s + 1)
                     for w in workers])
            acks = []

        if run_dir and cfg.checkpoint_interval and s % cfg.checkpoint_interval == 0:
            ckpt.write(run_dir, s, _collect_ds(workers, acks), history,
                       engine_meta=_engine_meta())

    final_state = _collect_ds(workers, acks)
    if run_dir:
        ckpt.write(run_dir, s, final_state, history, final=True,
                   engine_meta=_engine_meta())
    return RunResult(state=final_state, history=history, supersteps=s,
                     converged=converged, algorithm=algorithm, P=engine.shards.P)
