"""Headline benchmark: transcript link-graph pipeline at $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {stage: sec, ...}, "sf": ..., "num_cpus": N,
   "supersteps": K, "supersteps_per_sec": ..., "edges_per_sec": ...}

`--scaling` runs the same job twice in fresh interpreter sessions
(num_cpus=8 and num_cpus=32, same input) and prints the two headline
times plus scaling efficiency — the sandbox substitute for the north
rule's N vs 4N node clusters (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# Size the object store to the recommended 50% of available memory (the
# sandbox default is ~43%, which Ray warns about at every executor start);
# must be set before ray.init reads it.
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # NB: Ray's warning names DEFAULT_ENABLE_PROGRESS_BAR_NAME_TRUNCATION,
    # but the live DataContext field is the lowercase one.
    ctx.enable_progress_bar_name_truncation = False

    # Ray's sort-based groupby emits SCHEMA-LESS empty blocks for empty
    # reduce partitions (inevitable when distinct keys < sort partitions);
    # the streaming executor then warns once per op ("RefBundle with a
    # different schema ... new schema: ."). The empty blocks carry no rows
    # and no user code can type them (they are built inside the sort
    # exchange, ray/data/_internal/execution/streaming_executor_state.py:794).
    # Filter exactly that empty-schema variant — real schema divergences
    # (non-empty "new schema:") still surface.
    import logging

    class _EmptySchemaDivergence(logging.Filter):
        def filter(self, rec: logging.LogRecord) -> bool:
            m = rec.getMessage()
            return not ("RefBundle with a different schema" in m
                        and "new schema: ." in m)

    # NB: logger-level filters do not apply to child loggers — attach to
    # the emitting module's logger, not the "ray.data" parent.
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaDivergence())

    import ray.data as rd

    from pregel_ray.algorithms import PageRank
    from pregel_ray.algorithms.cc import ConnectedComponents
    from pregel_ray.algorithms.lpa import LabelPropagation
    from pregel_ray.algorithms.triangles import triangle_counts, triangle_total
    from pregel_ray.config import EngineConfig
    from pregel_ray.edges import build_graph_tables, transcript_columns
    from pregel_ray.engine import Engine
    from pregel_ray.fixtures import sf_of_dir, transcripts_path
    from pregel_ray.graph import DIRECTED, UNDIRECTED, build_shards
    from pregel_ray.io_util import read_parquet as _read_parquet

    sf = sf_of_dir(sf_dir)
    t_path = transcripts_path(sf_dir)  # untimed: deterministic input synthesis
    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(t_path).count()

    work = f"/tmp/pregel_bench/cpus{num_cpus}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    # Superstep executor: the actor pool (actor_loop.py) removes the
    # ~0.2 s/step Dataset plan-build floor — bit-identical semantics
    # (tests/test_actor_loop.py), measured per-scale in BENCH/BASELINE.md.
    # GRAFT_EXECUTOR=dataset reruns the Dataset-native path.
    executor = os.environ.get("GRAFT_EXECUTOR", "actors")
    aw = os.environ.get("GRAFT_ACTOR_WORKERS")
    cfg = EngineConfig(
        num_parts=max(16, 2 * num_cpus), num_buckets=max(8, num_cpus),
        executor=executor, actor_workers=int(aw) if aw else None,
    )
    times: dict[str, float] = {}

    t0 = time.monotonic()
    ds = _read_parquet(t_path, columns=transcript_columns())
    meta = build_graph_tables(ds, f"{work}/graph", cfg)
    edges = _read_parquet(f"{work}/graph/edges").materialize()
    verts = _read_parquet(f"{work}/graph/vertices").materialize()
    shards_d = build_shards(edges, verts, f"{work}/shards_d", cfg, variant=DIRECTED)
    times["build_graph"] = time.monotonic() - t0

    t0 = time.monotonic()
    eng_d = Engine(shards_d, cfg)
    res = eng_d.run(PageRank())
    times["pagerank"] = time.monotonic() - t0
    eng_d.close()  # free the pinned actor pool before the next engine
    supersteps = res.supersteps
    # per-superstep medians are robust to transient stalls (virtualized CPU
    # steal causes 1.5× run-to-run swings in single wall-clock samples)
    import statistics

    step_durs = [m.duration for m in res.history if m.superstep > 0]
    median_step = statistics.median(step_durs) if step_durs else 0.0

    # GRAFT_STAGES=pagerank: build+pagerank only — the scaling criterion
    # is PageRank throughput, so scaling legs can skip the other stages
    stages = os.environ.get("GRAFT_STAGES", "all")

    t0 = time.monotonic()
    if stages == "pagerank":
        tri = 0
        times["cc"] = times["lpa"] = times["triangles"] = 0.0
        shards_u = None
    else:
        shards_u = build_shards(edges, verts, f"{work}/shards_u", cfg, variant=UNDIRECTED)
    if shards_u is not None:
        eng_u = Engine(shards_u, cfg)  # shared: cc+lpa reuse one pool
        rcc = eng_u.run(ConnectedComponents())
        times["cc"] = time.monotonic() - t0

        t0 = time.monotonic()
        eng_u.run(LabelPropagation(max_iters=10))
        times["lpa"] = time.monotonic() - t0
        eng_u.close()

        t0 = time.monotonic()
        pv = triangle_counts(edges, num_buckets=cfg.num_buckets,
                             broadcast_vertex_threshold=cfg.broadcast_vertex_threshold).materialize()
        tri = triangle_total(pv)
        times["triangles"] = time.monotonic() - t0

    # Op-family rows (round-4 judge task #8): the dedup and ANN pipelines
    # measured like the engine stages so ops/ regressions get caught too.
    # They run the exact driver-gate workloads over the sf dir's documents/
    # embeddings tables (present at the driver scales; the synthesized
    # transcript-only fixtures above sf0.1 skip them).
    if stages != "pagerank" and os.path.exists(
        f"{sf_dir}/documents.parquet"
    ) and os.path.exists(f"{sf_dir}/embeddings.parquet"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import __ray_entry__ as _entry

        qs = _entry.queries()
        qs.update(_entry.extra_queries())
        for name, label in (
            ("dedup_minhash_verified", "dedup_minhash_verify"),
            ("dedup_clusters", "dedup_clusters"),
            ("ann_ivf_topk", "ann_ivf"),
            ("doc_tfidf_top3", "tfidf"),
            ("doc_top5_longest_per_lang", "grouped_topk"),
            ("x_doc_pack_512", "pack_sequences"),
            ("x_doc_shuffle_shards", "shuffle_shards"),
            ("x_emb_knn_graph", "knn_graph"),
            ("x_graph_random_walks", "random_walks"),
            ("x_training_corpus_e2e", "training_corpus"),
            ("x_doc_collocations_pmi", "collocations"),
            ("x_doc_chunks_40_10", "chunking"),
            ("x_doc_textrank_keywords", "textrank"),
        ):
            t0 = time.monotonic()
            r = qs[name](sf_dir)
            # force execution (Dataset results are lazy; frames are done)
            _ = r.count() if isinstance(r, rd.Dataset) else len(r)
            times[f"op_{label}"] = time.monotonic() - t0

        # BPE has no gate row (iterative — pytest-pinned), so time it here
        from pregel_ray.io_util import read_parquet as _rp
        from pregel_ray.ops.bpe import learn_bpe

        t0 = time.monotonic()
        _, vocab = learn_bpe(
            _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
            num_merges=20,
        )
        vocab.count()
        times["op_bpe_20merges"] = time.monotonic() - t0

    headline = times["pagerank"]
    out = {
        "metric": "pagerank_convergence_sec_l1_1e-6",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "sf": sf,
        "num_cpus": num_cpus,
        "executor": executor,
        "n_vertices": meta["n_vertices"],
        "n_edges": meta["n_edges"],
        "supersteps": supersteps,
        "supersteps_per_sec": round(supersteps / headline, 3),
        "median_superstep_sec": round(median_step, 4),
        "supersteps_per_sec_median": round(1.0 / median_step, 3) if median_step else 0.0,
        "edges_per_sec": round(meta["n_edges"] * supersteps / headline, 1),
        "pagerank_converged": bool(res.converged),
        "triangle_total": int(tri),
    }
    ray.shutdown()
    return out


def run_scaling() -> None:
    """N vs 4N parallelism on the same input, fresh sessions.

    Defaults to cpus 2 vs 8 on the sf=4.0 fixture (32.8M edges): the regime
    where per-superstep work dominates the per-step Ray-Data executor
    floor on BOTH legs — the sandbox analogue of 10^12 turns on N nodes.
    The round-3 schema-hashing fix halved per-step work, which moved the
    floor/work crossover up one scale: sf2.0 (round-2's work-dominated
    default, then 0.88) now measures floor-bound (0.43 headline, 0.71
    median-step), so the default is sf4.0 (full curve + the W/c + F
    decomposition: BENCH/BASELINE.md). Override with GRAFT_SCALING_CPUS
    ("2,8") and GRAFT_SCALING_SF ("4.0" → synthesized fixture scale)."""
    lo_cpus, hi_cpus = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "2,8").split(",")
    )
    sf = os.environ.get("GRAFT_SCALING_SF", "4.0")
    results = {}
    # Scaling is measured on the DATASET executor (the 100 TB-shaped path:
    # streaming shuffle, backpressure, spill). The actor pool is absolutely
    # faster at every measured scale but its 1-worker leg short-circuits
    # EVERY message locally (zero exchange), so its N-vs-4N ratio
    # structurally flatters the small leg — measured sf1.0 2-vs-8: 0.37
    # headline even though both legs beat the Dataset executor's absolute
    # times (BENCH/BASELINE.md, round-3 actor-exchange analysis).
    executor = os.environ.get("GRAFT_EXECUTOR", "dataset")
    for n in (lo_cpus, hi_cpus):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                   GRAFT_SF_DIR=f"/root/testdata/sf{sf}",
                   GRAFT_EXECUTOR=executor)
        # scaling criterion = PageRank throughput; legs skip the other
        # stages unless the caller overrides GRAFT_STAGES explicitly
        env.setdefault("GRAFT_STAGES", "pagerank")
        if executor == "actors" and "GRAFT_ACTOR_WORKERS" not in os.environ:
            # pool = cpus/2 on BOTH legs so the engine's parallelism ratio
            # equals the CPU ratio — the default (cpus-2) would give the
            # 8-cpu leg 6× the 2-cpu leg's workers and overstate efficiency
            env["GRAFT_ACTOR_WORKERS"] = str(max(1, n // 2))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if p.returncode != 0:
            sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-8000:] + "\n")
            raise SystemExit(f"scaling leg cpus={n} failed rc={p.returncode}")
        results[n] = json.loads(p.stdout.strip().splitlines()[-1])
    t_lo, t_hi = results[lo_cpus]["value"], results[hi_cpus]["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    m_lo = results[lo_cpus].get("median_superstep_sec", 0.0)
    m_hi = results[hi_cpus].get("median_superstep_sec", 0.0)
    eff_median = (m_lo / m_hi) / (hi_cpus / lo_cpus) if m_hi else 0.0
    total = {n: round(sum(r["queries"].values()), 3) for n, r in results.items()}
    print(
        json.dumps(
            {
                f"sec_{lo_cpus}": t_lo,
                f"sec_{hi_cpus}": t_hi,
                "speedup": round(t_lo / t_hi, 3),
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_median_step": round(eff_median, 3),
                f"median_superstep_sec_{lo_cpus}": m_lo,
                f"median_superstep_sec_{hi_cpus}": m_hi,
                f"pipeline_total_sec_{lo_cpus}": total[lo_cpus],
                f"pipeline_total_sec_{hi_cpus}": total[hi_cpus],
                f"edges_per_sec_{lo_cpus}": results[lo_cpus]["edges_per_sec"],
                f"edges_per_sec_{hi_cpus}": results[hi_cpus]["edges_per_sec"],
                f"supersteps_per_sec_{lo_cpus}": results[lo_cpus]["supersteps_per_sec"],
                f"supersteps_per_sec_{hi_cpus}": results[hi_cpus]["supersteps_per_sec"],
                "sf": results[hi_cpus]["sf"],
                "cpus": [lo_cpus, hi_cpus],
                "executor": executor,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
