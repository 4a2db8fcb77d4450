"""Engine configuration.

Reference analogue: the `config` dict of /root/reference/pregel/worker.lua:369-387
(workers list, pool_size, delayed_push, squash_only, obtain_name, ...) — re-expressed
as explicit Ray-Data knobs (SURVEY.md §2.7 D4).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # Number of vertex partitions. Independent of cluster size (the reference pins
    # partitions == workers, mpool.lua:294-296; we deliberately do not). At scale
    # choose ~4× total cores; vid % num_parts == part by construction.
    num_parts: int = 32
    # Conversation-bucket count for the edge-materialization groupby.
    num_buckets: int = 32
    # Hub split: a partition whose CSR shard exceeds this many edges is split into
    # contiguous dst-sorted sub-shards that scatter in parallel (out-degree skew).
    max_edges_per_shard: int = 2_000_000
    # Name→vid mapping is broadcast (sorted-array LUT via ray.put) below this
    # vertex count, hash-partitioned Dataset.join above it. 32M names ≈ ~3 GB
    # against the object store (fits any real worker); the join path costs a
    # full extra shuffle of the edge table AND hits the aggregator-actor
    # starvation regime at low CPU counts (measured: sf4.0's 8.7M vertices
    # crossing the old 8M threshold hard-hung a 2-cpu edge build).
    broadcast_vertex_threshold: int = 32_000_000
    # State chunk rows per block in the superstep loop = scatter task count.
    # None → auto: min(num_parts, max(8, cpus//2)). Fewer blocks cut Ray
    # Data's fixed per-task launch cost (dominant at small data); at real
    # scale set ≈ num_parts so every partition scatters as its own task.
    state_blocks: int | None = None
    # Hybrid scatter: a hub-split partition's sub-shards scatter as child
    # Ray tasks instead of serially inside its apply task (engine.py
    # _scatter_rows). Deterministic either way; off only for debugging.
    parallel_scatter: bool = True
    # Child-task scatter engages only when the partition's sub-shards carry
    # at least this many edges in total. Measured (round 4, sf2.0 @32 cpus,
    # BENCH/BASELINE.md "hub residual"): the inline scatter of a 1.15M-edge
    # sub-shard is ~35 ms while the child-task round trip (spawn + return
    # ~17 MB of packed chunks through plasma) costs 0.3-9 s EVEN ON AN IDLE
    # cluster — the fan-out only amortizes when a partition's serial
    # scatter compute (~15-30 ms per M edges) reaches seconds, i.e. tens
    # of millions of edges.
    parallel_scatter_min_edges: int = 16_000_000
    # Actor executor only: sender-side cross-shard combine before the peer
    # push (one chunk per worker per destination partition). Needs the
    # algorithm to declare an associative `precombine`; OFF by default
    # twice over: regrouping float folds breaks bit-identity with the
    # Dataset executor (results agree to ~1e-15/fold — allclose, not
    # bitwise), and the single-box A/B REJECTED it (sender fold costs more
    # compute than the receiver chunk overhead it removes: sf1.0 W=4 wall
    # 10-50% slower; 16× fewer chunks, ~18% fewer bytes — the trade may
    # flip on real NICs, which is why the knob survives). Numbers in
    # BENCH/BASELINE.md ("presum_push").
    presum_push: bool = False
    # Superstep chaining: build this many supersteps as ONE lazy Ray Data
    # plan and materialize once, amortizing the ~0.2 s per-execution
    # executor overhead. Only algorithms declaring supports_chaining use
    # it; 1 = classic per-superstep barrier. Exactness: fixed-iteration
    # caps are clipped per chunk; convergence-stopped runs may compute
    # ≤ K-1 extra steps (identity for quiescent vote-halt algorithms).
    # DEFAULT 1: measured on one node (BENCH/BASELINE.md) a K-sort lazy
    # plan splits the streaming executor's per-operator resource
    # reservations and runs SLOWER than K separate executions (sf1.0
    # @8 cpus: 38 s → 65 s at K=4); opt-in, semantics-tested either way.
    chain_supersteps: int = 1
    # Superstep executor. "dataset" (default): each superstep is one Ray
    # Data execution — streaming, spill-friendly, the 100 TB shape.
    # "actors" (opt-in, actor_loop.py): a pool of long-lived actors holds
    # per-partition state in process memory and exchanges combined message
    # chunks through plasma with the driver routing only ObjectRefs —
    # bypassing the ~0.2 s/step Dataset plan-build/executor floor that
    # dominates small/medium graphs (BENCH/BASELINE.md). Bit-identical
    # semantics (same scatter/apply/combine code paths, tested); trades
    # the streaming executor's spill/backpressure for latency, so prefer
    # it when per-partition state+shards fit worker heaps.
    executor: str = "dataset"
    # Actor-executor pool size. None → min(num_parts, cluster CPUs - 2,
    # actor_workers_per_node × alive nodes). Two CPUs stay free so shard
    # loads / checkpoint writes / mutation rebuilds — plain Ray tasks —
    # can run beside the pinned pool.
    actor_workers: int | None = None
    # Per-NODE ceiling for the default pool size: the scatter/apply
    # kernels are memory-bandwidth bound, so beyond ~10 single-CPU
    # workers per node extra workers only add O(W²) peer exchange —
    # measured r5 @32 cpus, one node: W=10 beats W=30 by 2.2× at sf0.1
    # (3.8 vs 8.5 s) and 2.1× at sf2.0 (16.1 vs 34.0 s); W=cpus-2 was
    # never the optimum at any scale (BENCH/BASELINE.md). On a multi-node
    # cluster the cap scales with the node count (per-node buses).
    actor_workers_per_node: int = 10
    # BSP loop
    max_supersteps: int = 200
    checkpoint_interval: int = 0  # 0 = only final; K = every K supersteps
    checkpoint_dir: str | None = None
    # Per-algorithm parameters (damping, tolerance, ...)
    params: dict = field(default_factory=dict)
