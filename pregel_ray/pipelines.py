"""High-level named pipelines — the surface __ray_entry__ and bench.py call.

Each function takes `sf_dir` (a /root/testdata/sfX directory). Transcript
inputs are the deterministic synthetic fixture for that scale
(fixtures.transcripts_path); graph tables and CSR shards are built once
per scale and cached under the fixture root (resumable `_SUCCESS`
layouts all the way down).

Result schemas use stable, named columns that match the DuckDB oracle
SQL in __ray_entry__ exactly (driver hash-compare requirement).

vid↔name mapping: ``namemap.NameMap``, gated on
``EngineConfig.broadcast_vertex_threshold`` — below it a plasma LUT +
vectorized searchsorted per batch; above it bucketed map-side joins and
a partition-sliced distributed name-rank table. Nothing |V|-bounded ever
lands in one object on the fallback path (the broadcast path mirrors the
reference's per-worker id space, /root/reference/pregel/mpool.lua:31-42).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .config import EngineConfig
from .edges import build_graph_tables, transcript_columns
from .engine import Engine
from .fixtures import transcripts_path
from .graph import DIRECTED, UNDIRECTED, build_shards
from .io_util import read_parquet as _read_parquet
from .namemap import NameMap

PAGERANK_DAMPING = 0.85
PAGERANK_TOL = 1e-6
PAGERANK_FIXED_ITERS = 20  # the SQL-oracle-matched fixed-iteration variant
LPA_FIXED_ITERS = 20  # unrolled-SQL round count (early-stop is a fixed point)


def default_cfg() -> EngineConfig:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cfg = EngineConfig(num_parts=max(16, 2 * cpus), num_buckets=max(8, cpus))
    # Evidence knob (BENCH/BASELINE.md "LUT gate"): force the
    # above-threshold distributed path at any scale, e.g.
    # PREGEL_BROADCAST_VERTEX_THRESHOLD=0 python tests/gate_check.py
    env = os.environ.get("PREGEL_BROADCAST_VERTEX_THRESHOLD")
    if env is not None:
        cfg.broadcast_vertex_threshold = int(env)
    # Evidence knob: run every engine-backed query on the raw-actor
    # executor (PREGEL_EXECUTOR=actors python tests/gate_check.py ... —
    # wipe the fixture run_pr_* checkpoint dirs first or the pagerank
    # queries resume from the finished dataset-executor run instead of
    # re-executing)
    env = os.environ.get("PREGEL_EXECUTOR")
    if env:
        cfg.executor = env
    return cfg


def graph_paths(sf_dir: str) -> dict:
    t_path = transcripts_path(sf_dir)
    root = os.path.dirname(t_path)
    return {
        "transcripts": t_path,
        "graph": os.path.join(root, "graph"),
        "shards_d": os.path.join(root, "shards_directed"),
        "shards_u": os.path.join(root, "shards_undirected"),
    }


def build_graph(sf_dir: str, cfg: EngineConfig | None = None):
    """transcripts → edges/vertices tables (cached). Returns (paths, cfg, meta)."""
    cfg = cfg or default_cfg()
    p = graph_paths(sf_dir)
    ds = _read_parquet(p["transcripts"], columns=transcript_columns())
    meta = build_graph_tables(ds, p["graph"], cfg)
    cfg.num_parts = meta["num_parts"]  # honor cached build's partitioning
    return p, cfg, meta


def shardset(sf_dir: str, variant: str = DIRECTED, cfg: EngineConfig | None = None):
    p, cfg, meta = build_graph(sf_dir, cfg)
    edges = _read_parquet(os.path.join(p["graph"], "edges"))
    verts = _read_parquet(os.path.join(p["graph"], "vertices"))
    sdir = p["shards_d"] if variant == DIRECTED else p["shards_u"]
    ss = build_shards(edges, verts, sdir, cfg, variant=variant)
    return ss, p, cfg


# ---------------------------------------------------------------------------
# vid↔name lookup (namemap.NameMap — broadcast LUT or bucketed-join fallback)
# ---------------------------------------------------------------------------


def _namemap(p, cfg) -> NameMap:
    with open(os.path.join(p["graph"], "meta.json")) as f:
        n_vertices = json.load(f)["n_vertices"]
    return NameMap(p["graph"], cfg, n_vertices)


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------


def edges_named(sf_dir: str) -> rd.Dataset:
    """(src_name, dst_name, w) — the materialized edge table in name space."""
    p, cfg, _ = build_graph(sf_dir)
    nm = _namemap(p, cfg)
    return nm.rename(
        _read_parquet(os.path.join(p["graph"], "edges")),
        {"src_name": "src", "dst_name": "dst"},
        keep=["w"],
    )


def vertex_out_degrees(sf_dir: str) -> rd.Dataset:
    from .agg import grouped_apply

    def _deg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("src_name", sort=False, as_index=False).agg(
            out_deg=("w", "size"), out_w=("w", "sum")
        )
        # rename here: Dataset.rename_columns assumes Arrow blocks and breaks
        # on the pandas blocks map_groups produces
        return out.rename(columns={"src_name": "name"})

    return grouped_apply(edges_named(sf_dir), ["src_name"], _deg)


def _pagerank_result(sf_dir: str, fixed_iters: int | None, tol: float):
    from .algorithms import PageRank

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    res = Engine(ss, cfg).run(
        PageRank(damping=PAGERANK_DAMPING, tol=tol, max_iters=fixed_iters),
        run_dir=os.path.join(os.path.dirname(p["graph"]),
                             f"run_pr_{fixed_iters or 'conv'}"),
    )
    return res, p, cfg


def _round_rank(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "vid": t["vid"],
            "rank": pa.array(np.round(t["rank"].to_numpy(zero_copy_only=False), 6)),
        }
    )


def pagerank_fixed(sf_dir: str, iters: int = PAGERANK_FIXED_ITERS) -> rd.Dataset:
    """(name, rank) after exactly `iters` power iterations, round 6 —
    matched by the unrolled SQL oracle."""
    res, p, cfg = _pagerank_result(sf_dir, iters, 0.0)
    nm = _namemap(p, cfg)
    return nm.rename(
        res.vertex_table().map_batches(_round_rank, batch_format="pyarrow"),
        {"name": "vid"}, keep=["rank"],
    )


def ppr_fixed(sf_dir: str, source_names: list[str], iters: int = 20) -> rd.Dataset:
    """(name, rank) — personalized PageRank from `source_names`, exactly
    `iters` iterations, round 6 (unrolled SQL oracle with a CASE teleport
    vector)."""
    from .algorithms.pagerank import PersonalizedPageRank

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    nm = _namemap(p, cfg)
    src_vids = [nm.vid_of_name(s) for s in source_names]
    res = Engine(ss, cfg).run(
        PersonalizedPageRank(src_vids, damping=PAGERANK_DAMPING,
                             max_iters=iters)
    )
    return nm.rename(
        res.vertex_table().map_batches(_round_rank, batch_format="pyarrow"),
        {"name": "vid"}, keep=["rank"],
    )


def pagerank_converged(sf_dir: str, tol: float = PAGERANK_TOL):
    """Full L1<tol convergence; returns (RunResult, named vertex Dataset)."""
    res, p, cfg = _pagerank_result(sf_dir, None, tol)
    named = _namemap(p, cfg).rename(
        res.vertex_table(), {"name": "vid"}, keep=["rank"]
    )
    return res, named


def pagerank_top20(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top `k` of the FIXED-iteration PageRank (deterministic: rank
    rounded to 6, ordered rank desc then name — exactly the SQL oracle's
    ORDER BY over the unrolled power iteration).

    Distributed: per-block top-k partials keep every row TIED with the
    block's k-th rank (so the name tie-break can't lose a winner), only
    those ≤ (k+ties)·blocks candidate rows are renamed and pulled — never
    the full per-vertex table (the relational.py top-k pattern)."""
    res, p, cfg = _pagerank_result(sf_dir, PAGERANK_FIXED_ITERS, 0.0)
    nm = _namemap(p, cfg)

    def _partial(t: pa.Table) -> pa.Table:
        t = _round_rank(t)
        r = t["rank"].to_numpy(zero_copy_only=False)
        if len(r) > k:
            thresh = np.partition(r, len(r) - k)[len(r) - k]
            t = t.filter(pa.array(r >= thresh))
        return t

    cand = nm.rename(
        res.vertex_table().map_batches(_partial, batch_format="pyarrow"),
        {"name": "vid"}, keep=["rank"],
    )
    df = cand.to_pandas()  # ≤ (k+ties)·blocks rows, bounded by k not |V|
    df = df.sort_values(["rank", "name"], ascending=[False, True], ignore_index=True)
    return df.head(k)


def cc_labels(sf_dir: str) -> rd.Dataset:
    """(name, component) — component = lexicographically smallest member
    NAME (canonical across systems: the engine's internal min-vid label is
    remapped so the DuckDB oracle, which only knows names, can compare).

    The label→min-name mapping is computed distributed (grouped_apply);
    the relabel broadcasts it only below the vertex threshold (component
    count is |V|-bounded in the all-singletons worst case), else it is a
    bucketed join."""
    from .agg import grouped_apply
    from .algorithms.cc import ConnectedComponents

    ss, p, cfg = shardset(sf_dir, UNDIRECTED)
    res = Engine(ss, cfg).run(ConnectedComponents())
    nm = _namemap(p, cfg)

    named = nm.rename(
        res.vertex_table(), {"name": "vid"}, keep=["label"]
    ).materialize()

    def _min_name(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("label", sort=False, as_index=False)["name"].min()
        return out.rename(columns={"name": "component"})

    mapping = grouped_apply(named, ["label"], _min_name)

    if nm.broadcast:
        mp = mapping.to_pandas()  # component-count bounded (≤ |V| ≤ threshold)
        order = np.argsort(mp["label"].to_numpy(), kind="stable")
        map_ref = ray.put(
            {
                "labels": mp["label"].to_numpy()[order],
                "comp": mp["component"].to_numpy()[order].astype(str),
            }
        )

        def _relabel(t: pa.Table) -> pa.Table:
            m = ray.get(map_ref)
            lab = t["label"].to_numpy(zero_copy_only=False)
            comp = m["comp"][np.searchsorted(m["labels"], lab)]
            return pa.table({"name": t["name"], "component": pa.array(comp)})

        return named.map_batches(_relabel, batch_format="pyarrow")

    from .agg import bucketed_join

    out = bucketed_join(
        named, mapping, ["label"],
        num_buckets=max(cfg.num_buckets, cfg.num_parts),
    )
    return out.select_columns(["name", "component"])


def cc_sizes(sf_dir: str) -> rd.Dataset:
    from .agg import group_count

    return group_count(cc_labels(sf_dir), ["component"], alias="size")


def lpa_labels(sf_dir: str, max_iters: int = LPA_FIXED_ITERS) -> rd.Dataset:
    """(name, cluster) — synchronous weighted LPA, labels initialized to
    the vertex's global NAME-RANK (not vid): the engine's max-weight /
    tie→min-label rule then equals max-weight / tie→min-NAME, which the
    unrolled SQL oracle reproduces exactly. Early stop is a fixed point,
    so the fixed `max_iters`-round SQL matches regardless of when the
    engine stops."""
    from .algorithms.lpa import LabelPropagation

    ss, p, cfg = shardset(sf_dir, UNDIRECTED)
    nm = _namemap(p, cfg)
    res = Engine(ss, cfg).run(
        LabelPropagation(max_iters=max_iters, **nm.lpa_init_kwargs())
    )
    named = nm.rename(res.vertex_table(), {"name": "vid"}, keep=["label"])
    # label is a global name rank → decode to the cluster name
    return nm.rank_decode(named, {"cluster": "label"}, keep=["name"])


def sssp_from_hub(sf_dir: str, source_name: str = "tool-00", iters: int = 10) -> rd.Dataset:
    """(name, dist) — shortest paths from a hub vertex, fixed `iters`
    Bellman-Ford rounds (matched by the unrolled SQL oracle); only reached
    vertices are returned."""
    from .algorithms.sssp import ShortestPaths

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    nm = _namemap(p, cfg)
    source_vid = nm.vid_of_name(source_name)
    res = Engine(ss, cfg).run(ShortestPaths(source_vid=source_vid, max_iters=iters))

    def _finite(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy(zero_copy_only=False)
        keep = np.isfinite(d)
        return pa.table(
            {
                "vid": pa.array(t["vid"].to_numpy(zero_copy_only=False)[keep]),
                "dist": pa.array(d[keep]),
            }
        )

    return nm.rename(
        res.vertex_table().map_batches(_finite, batch_format="pyarrow"),
        {"name": "vid"}, keep=["dist"],
    )


def hits_shards(sf_dir: str):
    """Doubled-graph shard store for HITS (algorithms/hits.py): each
    original vid l·P+q becomes a hub copy 2·vid−vid%P and an authority
    copy +P (both partition-aligned, locals interleaved h/a), and each
    edge u→v becomes the arc pair h(u)→a(v), a(v)→h(u). Built once and
    cached next to the graph (build_shards manifest short-circuit)."""
    p, cfg, _ = build_graph(sf_dir)
    from .graph import DIRECTED as _DIR
    from .graph import build_shards

    P = cfg.num_parts
    hits_dir = os.path.join(p["graph"], f"shards_hits_p{P}")
    edges = _read_parquet(os.path.join(p["graph"], "edges")).map_batches(
        hits_double_edges(P), batch_format="pyarrow"
    )
    verts = _read_parquet(
        os.path.join(p["graph"], "vertices"), columns=["vid"]
    ).map_batches(hits_double_verts(P), batch_format="pyarrow")
    return build_shards(edges, verts, hits_dir, cfg, variant=_DIR), p, cfg


def hits_double_edges(P: int):
    """map_batches fn: (src,dst,w) vid-space edges → the HITS doubled-graph
    arc pairs (see hits_shards)."""

    def _f(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        h_src = 2 * src - src % P
        a_dst = 2 * dst - dst % P + P
        return pa.table(
            {
                "src": pa.array(np.concatenate([h_src, a_dst])),
                "dst": pa.array(np.concatenate([a_dst, h_src])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    return _f


def hits_double_verts(P: int):
    def _f(t: pa.Table) -> pa.Table:
        vid = t["vid"].to_numpy(zero_copy_only=False)
        h = 2 * vid - vid % P
        vv = np.concatenate([h, h + P])
        return pa.table(
            {"vid": pa.array(vv), "part": pa.array((vv % P).astype(np.int32))}
        )

    return _f


def hits_scores(sf_dir: str, iters: int = 10) -> rd.Dataset:
    """(name, role∈{hub,authority}, score) — `iters` simultaneous HITS
    updates on the doubled graph, final scores L2-normalized per role,
    round 6 (matched by the unrolled SQL oracle)."""
    from .algorithms.hits import HITS

    ss, p, cfg = hits_shards(sf_dir)
    P = cfg.num_parts
    res = Engine(ss, cfg).run(HITS(max_iters=iters))
    last = res.history[-1]
    inv_h = 1.0 / np.sqrt(last.m1) if last.m1 > 0 else 0.0
    inv_a = 1.0 / np.sqrt(last.m2) if last.m2 > 0 else 0.0
    nm = _namemap(p, cfg)

    def _score(t: pa.Table) -> pa.Table:
        vid = t["vid"].to_numpy(zero_copy_only=False)
        local = vid // P
        hub = (local % 2) == 0
        orig = (local // 2) * P + vid % P
        val = t["value"].to_numpy(zero_copy_only=False)
        score = np.round(val * np.where(hub, inv_h, inv_a), 6)
        return pa.table(
            {
                "vid": pa.array(orig),  # original-graph vid for the rename
                "role": pa.array(np.where(hub, "hub", "authority")),
                "score": pa.array(score),
            }
        )

    return nm.rename(
        res.vertex_table().map_batches(_score, batch_format="pyarrow"),
        {"name": "vid"}, keep=["role", "score"],
    )


def maxprop_ranks(sf_dir: str) -> rd.Dataset:
    """(name, max_seen) — the REFERENCE's own example algorithm
    (max-value propagation with combiner max and vote-to-halt,
    /root/reference/example/test-worker.lua:25-43, common.lua:23-39) on
    the directed transcript graph, values initialized to global name
    ranks. Converges to the max rank over each vertex's
    ancestors-and-self; the SQL oracle unrolls the same monotone
    relaxation (generous round count = identity past the fixpoint, same
    trick as k-core).

    Runs on the VECTORIZED fast path (algorithms/maxprop.py); the
    per-vertex compute-API version is kept as the reference-conformance
    twin (`maxprop_ranks_compute_api`), pinned bit-identical by
    tests/test_maxprop.py."""
    from .algorithms.maxprop import MaxProp

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    nm = _namemap(p, cfg)
    kw = nm.lpa_init_kwargs()
    algo = MaxProp(
        init_values_ref=kw.get("init_labels_ref"),
        init_values_path=kw.get("init_labels_path"),
    )
    res = Engine(ss, cfg).run(algo)

    def _vals(t: pa.Table) -> pa.Table:
        return pa.table({"vid": t["vid"], "max_seen": t["val"].cast(pa.int64())})

    return nm.rename(
        res.vertex_table().map_batches(_vals, batch_format="pyarrow"),
        {"name": "vid"}, keep=["max_seen"],
    )


def maxprop_ranks_compute_api(sf_dir: str) -> rd.Dataset:
    """Per-vertex compute-API twin of `maxprop_ranks` (the reference's
    user-facing extension surface, row-wise by design — SURVEY §2.3 C5);
    kept for conformance parity, not the fast path."""
    from .algorithms.compute_api import ComputeAlgorithm

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    nm = _namemap(p, cfg)

    def compute(v):
        if v.get_superstep() == 1:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, v.get_value())
        else:
            changed = False
            for m in v.pairs_messages():
                if m > v.get_value():
                    v.set_value(m)
                    changed = True
            if changed:
                for _, dst, _ in v.pairs_edges():
                    v.send_message(dst, v.get_value())
        v.vote_halt(True)

    algo = ComputeAlgorithm(compute=compute, initial_value=nm.rank_of_vid_fn(),
                            combiner=max)
    res = Engine(ss, cfg).run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts)

    def _vals(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t["vid"],
                "max_seen": pa.array(np.asarray(t["value"].to_pylist(), np.int64)),
            }
        )

    return nm.rename(
        vt.map_batches(_vals, batch_format="pyarrow"),
        {"name": "vid"}, keep=["max_seen"],
    )


def kcore_members(sf_dir: str, k: int = 5) -> rd.Dataset:
    """(name, core_deg) — vertices of the k-core of the undirected
    transcript graph, with their degree WITHIN the core (≥ k). One BSP
    superstep per synchronous peel (algorithms/kcore.py); the SQL oracle
    unrolls the same peels, and extra rounds past the fixpoint are
    identity, so a fixed generous unroll matches any convergence step."""
    from .algorithms.kcore import KCore

    ss, p, cfg = shardset(sf_dir, UNDIRECTED)
    nm = _namemap(p, cfg)
    res = Engine(ss, cfg).run(KCore(k))

    def _alive(t: pa.Table) -> pa.Table:
        keep = t["alive"].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "vid": pa.array(t["vid"].to_numpy(zero_copy_only=False)[keep]),
                "core_deg": pa.array(t["deg"].to_numpy(zero_copy_only=False)[keep]),
            }
        )

    return nm.rename(
        res.vertex_table().map_batches(_alive, batch_format="pyarrow"),
        {"name": "vid"}, keep=["core_deg"],
    )


def triangles_per_vertex(sf_dir: str) -> rd.Dataset:
    """(name, triangles) — only vertices in ≥1 triangle."""
    from .algorithms.triangles import triangle_counts

    p, cfg, _ = build_graph(sf_dir)
    edges = _read_parquet(os.path.join(p["graph"], "edges"))
    pv = triangle_counts(edges, num_buckets=cfg.num_buckets,
                         broadcast_vertex_threshold=cfg.broadcast_vertex_threshold)
    return _namemap(p, cfg).rename(pv, {"name": "vid"}, keep=["triangles"])


def triangle_total_table(sf_dir: str) -> pd.DataFrame:
    from .algorithms.triangles import triangle_counts, triangle_total

    p, cfg, _ = build_graph(sf_dir)
    edges = _read_parquet(os.path.join(p["graph"], "edges"))
    pv = triangle_counts(edges, num_buckets=cfg.num_buckets,
                         broadcast_vertex_threshold=cfg.broadcast_vertex_threshold).materialize()
    return pd.DataFrame({"total": [triangle_total(pv)]})


def training_corpus(
    sf_dir: str,
    seq_len: int = 256,
    quality_min_ppm: int = 490_000,
    train_frac: float = 0.9,
) -> rd.Dataset:
    """End-to-end training-corpus construction over the documents table —
    the composed pipeline a 100 TB run chains (each stage is the
    already-oracled op, so the whole chain has one exact SQL oracle):

      1. quality filter (ops.text.QualityScore integer heuristics,
         inline — text never leaves the map pass it arrived in)
      2. exact dedup (first-of-group survivor per md5 fingerprint)
      3. deterministic train split (ops.mix.split_fractions, keep 'train')
      4. GPT-style sequence packing (ops.pack.pack_sequences)

    Output: (doc_id, seq_id, doc_start, seq_start, n_tokens) span rows of
    the packed train stream. Every stage is md5/integer-deterministic, so
    the result is invariant to block layout and cluster size."""
    import pyarrow as pa

    from .io_util import read_parquet
    from .ops.mix import split_fractions
    from .ops.pack import pack_sequences
    from .ops.text import QualityScore

    class _QualityFilter(QualityScore):
        # reuse the compiled-regex heuristics but keep (doc_id, text):
        # the downstream dedup/pack stages need the text, and recomputing
        # quality in a second scan would read the corpus twice
        def __call__(self, batch):
            m = super().__call__(batch)
            keep = m["quality_ppm"].to_numpy() >= quality_min_ppm
            return pa.table(
                {
                    "doc_id": pa.array(batch["doc_id"].to_numpy(np.int64)),
                    "text": pa.array(batch["text"], pa.string()),
                }
            ).filter(pa.array(keep))

    from .ops.dedup import dedup_exact

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    good = docs.map_batches(
        _QualityFilter, batch_format="pandas", batch_size=4096, concurrency=2
    )
    unique = dedup_exact(good).drop_columns(["fp"])
    def _keep_train(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["split"], "train")).drop_columns(["split"])

    train = split_fractions(
        unique, "doc_id", {"train": train_frac, "rest": 1.0 - train_frac}
    ).map_batches(_keep_train, batch_format="pyarrow")
    return pack_sequences(train, seq_len=seq_len)


def textrank_keywords(
    sf_dir: str, k: int = 30, iters: int = PAGERANK_FIXED_ITERS
) -> rd.Dataset:
    """(token, rank): TextRank keyword extraction (Mihalcea & Tarau
    2004) — the engine run on a SECOND graph domain. Adjacent
    whitespace tokens form a symmetric co-occurrence graph (self-loops
    dropped, w = co-occurrence count, both directions emitted), built
    through `build_graph_tables_from_pairs` into the same partition-
    aligned CSR layout the transcript graph uses, then weighted
    PageRank runs `iters` fixed power iterations on the BSP engine;
    top-k by (rank round6 desc, token asc) — matched by the unrolled
    SQL oracle over the identical token-graph CTE.

    Scale shape: bigram explode is a zero-shuffle flat-map; the
    symmetric pair table is map-side-combined (group_sum); everything
    after is the engine's own bounded-shuffle machinery. Cached under
    the scale's fixture root like every other graph build."""
    from .agg import group_sum
    from .algorithms import PageRank
    from .edges import build_graph_tables_from_pairs
    from .ops.text import _bigram_explode

    cfg = default_cfg()
    root = os.path.dirname(transcripts_path(sf_dir))
    work = os.path.join(root, "textrank")

    import pyarrow.compute as pc

    def _sym(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["w1"], t["w2"])))
        a = t["w1"].combine_chunks()
        b = t["w2"].combine_chunks()
        return pa.table(
            {
                "src_name": pa.concat_arrays([a, b]),
                "dst_name": pa.concat_arrays([b, a]),
                "w": pa.array(np.ones(2 * t.num_rows, np.float64)),
            }
        )

    docs = _read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = group_sum(
        docs.map_batches(_bigram_explode, batch_format="pyarrow")
        .map_batches(_sym, batch_format="pyarrow"),
        ["src_name", "dst_name"], "w",
        num_buckets=max(32, cfg.num_buckets),
    )
    graph_dir = os.path.join(work, "graph")
    meta = build_graph_tables_from_pairs(pairs, graph_dir, cfg)
    cfg.num_parts = meta["num_parts"]
    edges = _read_parquet(os.path.join(graph_dir, "edges"))
    verts = _read_parquet(os.path.join(graph_dir, "vertices"))
    ss = build_shards(edges, verts, os.path.join(work, "shards"), cfg,
                      variant=DIRECTED)
    res = Engine(ss, cfg).run(
        PageRank(damping=PAGERANK_DAMPING, tol=0.0, max_iters=iters),
        run_dir=os.path.join(work, f"run_tr_{iters}"),
    )
    nm = NameMap(graph_dir, cfg, meta["n_vertices"])
    named = nm.rename(
        res.vertex_table().map_batches(_round_rank, batch_format="pyarrow"),
        {"token": "vid"}, keep=["rank"],
    )
    return named.sort(["rank", "token"], descending=[True, False]).limit(k)


def clustering_coefficient(sf_dir: str) -> rd.Dataset:
    """(name, degree, triangles, cc_ppm): local clustering coefficient
    over the simple undirected graph — cc = 2T / (d(d-1)), floored to
    integer ppm via pure integer arithmetic (exact vs the SQL twin, no
    float division). All vertices with degree >= 2; T fills 0.

    Composition row: triangle_counts' per-vertex counts and its
    already-materialized simple-degree table (return_degrees=True — no
    recompute), one bucketed left join, one map."""
    import pyarrow.compute as pc

    from .agg import bucketed_join
    from .algorithms.triangles import triangle_counts

    p, cfg, _ = build_graph(sf_dir)
    edges = _read_parquet(os.path.join(p["graph"], "edges"))
    pv, degrees = triangle_counts(
        edges, num_buckets=cfg.num_buckets,
        broadcast_vertex_threshold=cfg.broadcast_vertex_threshold,
        return_degrees=True,
    )

    deg2 = degrees.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count()"], pa.scalar(2))),
        batch_format="pyarrow",
    )
    j = bucketed_join(deg2, pv, ["vid"], how="left",
                      num_buckets=cfg.num_buckets)

    def _cc(t: pa.Table) -> pa.Table:
        d = t["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        tri = pc.fill_null(t["triangles"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cc = (2 * tri * 1_000_000) // (d * (d - 1))
        return pa.table(
            {
                "vid": t["vid"],
                "degree": pa.array(d),
                "triangles": pa.array(tri),
                "cc_ppm": pa.array(cc),
            }
        )

    out = j.map_batches(_cc, batch_format="pyarrow")
    nm = _namemap(p, cfg)
    return nm.rename(out, {"name": "vid"},
                     keep=["degree", "triangles", "cc_ppm"])


def degree_assortativity_moments(sf_dir: str) -> rd.Dataset:
    """One row (m, s_x, s_y, s_xx, s_yy, s_xy): the exact integer
    moments of (source-degree, dest-degree) over every DIRECTED
    endpoint pair of the simple undirected graph (each undirected edge
    contributes both orientations, the standard Newman convention — so
    s_x = s_y and s_xx = s_yy, kept separately as a self-check).
    Degree assortativity derives exactly:

        r = (m·s_xy − s_x·s_y) / sqrt((m·s_xx − s_x²)(m·s_yy − s_y²))

    The group_moments trick on graphs: integer sums are associative,
    so the moments are layout-independent and the SQL twin is exact;
    the float r is left to the consumer (one scalar, no sum-order
    hazard). Shape: the triangles simple/degree tables reused, two
    bucketed joins attach endpoint degrees, one map-side-combined
    global integer sum."""
    import pyarrow.compute as pc

    from .agg import bucketed_join, distinct, group_count
    from .algorithms.triangles import _canonical

    p, cfg, _ = build_graph(sf_dir)
    edges = _read_parquet(os.path.join(p["graph"], "edges"))
    simple = distinct(
        edges.map_batches(_canonical, batch_format="pyarrow"), ["a", "b"],
        num_buckets=cfg.num_buckets,
    ).materialize()

    def _endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.int64()),
             t["b"].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"vid": v})

    degrees = group_count(
        simple.map_batches(_endpoints, batch_format="pyarrow"), ["vid"],
        alias="d", num_buckets=cfg.num_buckets,
    )

    # both orientations, then attach the degree at each endpoint
    def _orient(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table(
            {"x": pa.concat_arrays([a, b]), "y": pa.concat_arrays([b, a])}
        )

    arcs = simple.map_batches(_orient, batch_format="pyarrow")
    j1 = bucketed_join(arcs, degrees, left_on=["x"], right_on=["vid"],
                       num_buckets=cfg.num_buckets, rsuffix="_x")
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            [{"d": "dx"}.get(c, c) for c in t.column_names]),
        batch_format="pyarrow",
    )
    j2 = bucketed_join(j1, degrees, left_on=["y"], right_on=["vid"],
                       num_buckets=cfg.num_buckets, rsuffix="_y")

    def _moments(t: pa.Table) -> pa.Table:
        dx = t["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        dy = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "m": pa.array([len(dx)], pa.int64()),
                "s_x": pa.array([int(dx.sum())], pa.int64()),
                "s_y": pa.array([int(dy.sum())], pa.int64()),
                "s_xx": pa.array([int((dx * dx).sum())], pa.int64()),
                "s_yy": pa.array([int((dy * dy).sum())], pa.int64()),
                "s_xy": pa.array([int((dx * dy).sum())], pa.int64()),
            }
        )

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("_g", as_index=False).agg(
            m=("m", "sum"), s_x=("s_x", "sum"), s_y=("s_y", "sum"),
            s_xx=("s_xx", "sum"), s_yy=("s_yy", "sum"), s_xy=("s_xy", "sum"),
        ).drop(columns="_g")

    from .agg import grouped_apply

    partials = j2.map_batches(_moments, batch_format="pyarrow").map_batches(
        lambda t: t.append_column(
            "_g", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    return grouped_apply(partials, ["_g"], _fold)
