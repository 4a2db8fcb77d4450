"""pregel_ray — a Ray-Data-native BSP link-graph analytics engine.

Brand-new engine with the capabilities of the reference `tarantool/pregel`
(/root/reference, studied in SURVEY.md) re-expressed Ray-Data-first:

- Edge materialization from Parquet conversation transcripts
  (`conv_id, turn_idx, role, text, tool, ts`) via consecutive-turn
  co-occurrence adjacency under stable turn ordering (edges.py).
- A BSP superstep engine (engine.py): vertex state flows as a chunked
  `ray.data.Dataset`; the per-superstep message shuffle is
  `union(state, msgs).groupby("part").map_groups(apply)`; CSR shards are
  immutable plasma objects gathered zero-copy inside scatter tasks.
- Algorithms: PageRank (damping 0.85, L1 convergence), connected
  components (min-label), label propagation, triangle counting, plus a
  per-vertex `compute(vertex)` API mirroring the reference's surface
  (send_message / vote_halt / aggregators / combiners / topology
  mutation) — algorithms/.
- Training-data pipeline ops over document/embedding tables: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  ANN similarity search, text analysis, multimodal stubs — ops/.

Nothing in this package calls ray.init()/ray.shutdown(); the caller
(driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"
