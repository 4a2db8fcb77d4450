"""High-level named pipelines — the surface __ray_entry__ and bench.py call.

Each function takes `sf_dir` (a /root/testdata/sfX directory). Transcript
inputs are the deterministic synthetic fixture for that scale
(fixtures.transcripts_path); graph tables and CSR shards are built once
per scale and cached under the fixture root (resumable `_SUCCESS`
layouts all the way down).

Result schemas use stable, named columns that match the DuckDB oracle
SQL in __ray_entry__ exactly (driver hash-compare requirement).

vid↔name mapping: one remote task builds sorted-vid / sorted-name arrays
(plus name-rank arrays) from the vertices parquet — the arrays live in
plasma (the driver only holds the ObjectRef) and every map_batches does
a vectorized ``np.searchsorted`` / fancy-index lookup, never a Python
dict loop. Above ``EngineConfig.broadcast_vertex_threshold`` vertices the
same mapping is a ``Dataset.join`` (see edges.encode_edges for the
partition-count guard); the broadcast is |V|-bounded like the reference's
per-worker id space (/root/reference/pregel/mpool.lua:31-42).
"""

from __future__ import annotations

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

PAGERANK_DAMPING = 0.85
PAGERANK_TOL = 1e-6
PAGERANK_FIXED_ITERS = 20  # the SQL-oracle-matched fixed-iteration variant
LPA_FIXED_ITERS = 20  # unrolled-SQL round count (early-stop is a fixed point)


def default_cfg() -> EngineConfig:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return EngineConfig(num_parts=max(16, 2 * cpus), num_buckets=max(8, cpus))


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
# vid↔name lookup (plasma-resident, vectorized)
# ---------------------------------------------------------------------------


@ray.remote
def _name_lut_task(vertices_dir: str, P: int) -> dict:
    """Build the lookup arrays in a remote task — they stay in plasma.

    vids/names: aligned, sorted by vid (searchsorted key).
    ranks: aligned with vids — global rank of the vertex's name in
        lexicographic name order (dense 0..n-1; used as LPA labels so the
        engine's min-label tie-break equals min-NAME, which SQL can mirror).
    names_sorted: names in rank order (rank → name decode).
    ranks_by_part[p]: rank per local index (vid // P) for partition p.
    """
    import pyarrow.dataset as pds

    t = pds.dataset(vertices_dir, format="parquet").to_table(columns=["vid", "name"])
    vids = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
    names = np.asarray(t["name"].to_pylist(), dtype=str)
    order = np.argsort(vids, kind="stable")
    vids, names = vids[order], names[order]
    name_order = np.argsort(names, kind="stable")
    ranks = np.empty(len(vids), np.int64)
    ranks[name_order] = np.arange(len(vids), dtype=np.int64)
    vids_by_rank = vids[name_order]
    parts = (vids % P).astype(np.int64)
    lis = vids // P
    ranks_by_part = {}
    for p in np.unique(parts):
        m = parts == p
        arr = np.empty(int(m.sum()), np.int64)
        arr[lis[m]] = ranks[m]
        ranks_by_part[int(p)] = arr
    return {
        "vids": vids,
        "names": names,
        "ranks": ranks,
        "names_sorted": names[name_order],
        "vids_by_rank": vids_by_rank,
        "ranks_by_part": ranks_by_part,
    }


def _name_lut_ref(p, cfg) -> "ray.ObjectRef":
    return _name_lut_task.remote(os.path.join(p["graph"], "vertices"), cfg.num_parts)


def _names_of(lut: dict, vid_arr: np.ndarray) -> np.ndarray:
    return lut["names"][np.searchsorted(lut["vids"], vid_arr)]


def _rename_vids(lut_ref, spec: dict[str, str], keep: list[str] = ()):
    """map_batches fn factory: for each (out_col ← vid_col) in spec, add the
    name column; pass `keep` columns through unchanged. Fully vectorized."""

    def _fn(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)  # zero-copy plasma read, node-cached
        cols = {}
        for out, src in spec.items():
            cols[out] = pa.array(
                _names_of(lut, t[src].to_numpy(zero_copy_only=False))
            )
        for k in keep:
            cols[k] = t[k]
        return pa.table(cols)

    return _fn


@ray.remote
def _vid_of_name(lut_ref_inner: dict, name: str) -> int:
    i = int(np.searchsorted(lut_ref_inner["names_sorted"], name))
    return int(lut_ref_inner["vids_by_rank"][i])


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------


def edges_named(sf_dir: str) -> rd.Dataset:
    """(src_name, dst_name, w) — the materialized edge table in name space."""
    p, cfg, _ = build_graph(sf_dir)
    lut_ref = _name_lut_ref(p, cfg)
    return _read_parquet(os.path.join(p["graph"], "edges")).map_batches(
        _rename_vids(lut_ref, {"src_name": "src", "dst_name": "dst"}, keep=["w"]),
        batch_format="pyarrow",
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


def pagerank_fixed(sf_dir: str, iters: int = PAGERANK_FIXED_ITERS) -> rd.Dataset:
    """(name, rank) after exactly `iters` power iterations, round 6 —
    matched by the unrolled SQL oracle."""
    res, p, cfg = _pagerank_result(sf_dir, iters, 0.0)
    lut_ref = _name_lut_ref(p, cfg)

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "name": pa.array(_names_of(lut, t["vid"].to_numpy(zero_copy_only=False))),
                "rank": pa.array(np.round(t["rank"].to_numpy(zero_copy_only=False), 6)),
            }
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def ppr_fixed(sf_dir: str, source_names: list[str], iters: int = 20) -> rd.Dataset:
    """(name, rank) — personalized PageRank from `source_names`, exactly
    `iters` iterations, round 6 (unrolled SQL oracle with a CASE teleport
    vector)."""
    from .algorithms.pagerank import PersonalizedPageRank

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    lut_ref = _name_lut_ref(p, cfg)
    src_vids = [ray.get(_vid_of_name.remote(lut_ref, s)) for s in source_names]
    res = Engine(ss, cfg).run(
        PersonalizedPageRank(src_vids, damping=PAGERANK_DAMPING,
                             max_iters=iters)
    )

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "name": pa.array(_names_of(lut, t["vid"].to_numpy(zero_copy_only=False))),
                "rank": pa.array(np.round(t["rank"].to_numpy(zero_copy_only=False), 6)),
            }
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def pagerank_converged(sf_dir: str, tol: float = PAGERANK_TOL):
    """Full L1<tol convergence; returns (RunResult, named vertex Dataset)."""
    res, p, cfg = _pagerank_result(sf_dir, None, tol)
    lut_ref = _name_lut_ref(p, cfg)
    named = res.vertex_table().map_batches(
        _rename_vids(lut_ref, {"name": "vid"}, keep=["rank"]),
        batch_format="pyarrow",
    )
    return res, named


def pagerank_top20(sf_dir: str) -> pd.DataFrame:
    """Top 20 of the FIXED-iteration PageRank (deterministic: rank rounded
    to 6, ordered rank desc then name — exactly the SQL oracle's ORDER BY
    over the unrolled power iteration)."""
    df = pagerank_fixed(sf_dir, PAGERANK_FIXED_ITERS).to_pandas()
    df = df.sort_values(["rank", "name"], ascending=[False, True], ignore_index=True)
    return df.head(20)


def cc_labels(sf_dir: str) -> rd.Dataset:
    """(name, component) — component = lexicographically smallest member
    NAME (canonical across systems: the engine's internal min-vid label is
    remapped so the DuckDB oracle, which only knows names, can compare)."""
    from .agg import grouped_apply
    from .algorithms.cc import ConnectedComponents

    ss, p, cfg = shardset(sf_dir, UNDIRECTED)
    res = Engine(ss, cfg).run(ConnectedComponents())
    lut_ref = _name_lut_ref(p, cfg)

    def _rank(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        idx = np.searchsorted(lut["vids"], t["vid"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "vid": t["vid"],
                "rank": pa.array(lut["ranks"][idx]),
                "label": t["label"],
            }
        )

    ranked = res.vertex_table().map_batches(_rank, batch_format="pyarrow").materialize()

    # canonical relabel: label → min member name-rank; component count is
    # small, so the mapping broadcasts as two sorted arrays
    def _min_rank(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("label", sort=False, as_index=False)["rank"].min()

    mapping = grouped_apply(ranked, ["label"], _min_rank).to_pandas()
    order = np.argsort(mapping["label"].to_numpy(), kind="stable")
    map_ref = ray.put(
        {
            "labels": mapping["label"].to_numpy()[order],
            "minrank": mapping["rank"].to_numpy()[order],
        }
    )

    def _relabel(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        mp = ray.get(map_ref)
        vids = t["vid"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lut["vids"], vids)
        lab = t["label"].to_numpy(zero_copy_only=False)
        mr = mp["minrank"][np.searchsorted(mp["labels"], lab)]
        return pa.table(
            {
                "name": pa.array(lut["names"][idx]),
                "component": pa.array(lut["names_sorted"][mr]),
            }
        )

    return ranked.map_batches(_relabel, batch_format="pyarrow")


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
    lut_ref = _name_lut_ref(p, cfg)
    res = Engine(ss, cfg).run(
        LabelPropagation(max_iters=max_iters, init_labels_ref=lut_ref)
    )

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        vids = t["vid"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lut["vids"], vids)
        lab = t["label"].to_numpy(zero_copy_only=False)  # name ranks
        return pa.table(
            {
                "name": pa.array(lut["names"][idx]),
                "cluster": pa.array(lut["names_sorted"][lab]),
            }
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def sssp_from_hub(sf_dir: str, source_name: str = "tool-00", iters: int = 10) -> rd.Dataset:
    """(name, dist) — shortest paths from a hub vertex, fixed `iters`
    Bellman-Ford rounds (matched by the unrolled SQL oracle); only reached
    vertices are returned."""
    from .algorithms.sssp import ShortestPaths

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    lut_ref = _name_lut_ref(p, cfg)
    source_vid = ray.get(_vid_of_name.remote(lut_ref, source_name))
    res = Engine(ss, cfg).run(ShortestPaths(source_vid=source_vid, max_iters=iters))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        d = t["dist"].to_numpy(zero_copy_only=False)
        keep = np.isfinite(d)
        vids = t["vid"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {"name": pa.array(_names_of(lut, vids)), "dist": pa.array(d[keep])}
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


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
    lut_ref = _name_lut_ref(p, cfg)

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        vid = t["vid"].to_numpy(zero_copy_only=False)
        local = vid // P
        hub = (local % 2) == 0
        orig = (local // 2) * P + vid % P
        val = t["value"].to_numpy(zero_copy_only=False)
        score = np.round(val * np.where(hub, inv_h, inv_a), 6)
        return pa.table(
            {
                "name": pa.array(_names_of(lut, orig)),
                "role": pa.array(np.where(hub, "hub", "authority")),
                "score": pa.array(score),
            }
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def maxprop_ranks(sf_dir: str) -> rd.Dataset:
    """(name, max_seen) — the REFERENCE's own example algorithm
    (max-value propagation with combiner max and vote-to-halt,
    /root/reference/example/test-worker.lua:25-43, common.lua:23-39) run
    through the PER-VERTEX compute API on the directed transcript graph,
    values initialized to global name ranks. Converges to the max rank
    over each vertex's ancestors-and-self; the SQL oracle unrolls the
    same monotone relaxation (generous round count = identity past the
    fixpoint, same trick as k-core)."""
    from .algorithms.compute_api import ComputeAlgorithm

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    lut_ref = _name_lut_ref(p, cfg)

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

    def init_val(vid, _ref=lut_ref):
        lut = ray.get(_ref)  # node-cached plasma read
        return int(lut["ranks"][np.searchsorted(lut["vids"], vid)])

    algo = ComputeAlgorithm(compute=compute, initial_value=init_val,
                            combiner=max)
    res = Engine(ss, cfg).run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts)

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        vids = t["vid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "name": pa.array(_names_of(lut, vids)),
                "max_seen": pa.array(
                    np.asarray(t["value"].to_pylist(), np.int64)
                ),
            }
        )

    return vt.map_batches(_name, batch_format="pyarrow")


def kcore_members(sf_dir: str, k: int = 5) -> rd.Dataset:
    """(name, core_deg) — vertices of the k-core of the undirected
    transcript graph, with their degree WITHIN the core (≥ k). One BSP
    superstep per synchronous peel (algorithms/kcore.py); the SQL oracle
    unrolls the same peels, and extra rounds past the fixpoint are
    identity, so a fixed generous unroll matches any convergence step."""
    from .algorithms.kcore import KCore

    ss, p, cfg = shardset(sf_dir, UNDIRECTED)
    lut_ref = _name_lut_ref(p, cfg)
    res = Engine(ss, cfg).run(KCore(k))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        keep = t["alive"].to_numpy(zero_copy_only=False).astype(bool)
        vids = t["vid"].to_numpy(zero_copy_only=False)[keep]
        deg = t["deg"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {"name": pa.array(_names_of(lut, vids)), "core_deg": pa.array(deg)}
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def triangles_per_vertex(sf_dir: str) -> rd.Dataset:
    """(name, triangles) — only vertices in ≥1 triangle."""
    from .algorithms.triangles import triangle_counts

    p, cfg, _ = build_graph(sf_dir)
    edges = _read_parquet(os.path.join(p["graph"], "edges"))
    pv = triangle_counts(edges, num_buckets=cfg.num_buckets)
    lut_ref = _name_lut_ref(p, cfg)
    return pv.map_batches(
        _rename_vids(lut_ref, {"name": "vid"}, keep=["triangles"]),
        batch_format="pyarrow",
    )


def triangle_total_table(sf_dir: str) -> pd.DataFrame:
    from .algorithms.triangles import triangle_counts, triangle_total

    p, cfg, _ = build_graph(sf_dir)
    edges = _read_parquet(os.path.join(p["graph"], "edges"))
    pv = triangle_counts(edges, num_buckets=cfg.num_buckets).materialize()
    return pd.DataFrame({"total": [triangle_total(pv)]})
