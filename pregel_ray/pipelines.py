"""High-level named pipelines — the surface __ray_entry__ and bench.py call.

Each function takes `sf_dir` (a /root/testdata/sfX directory). Transcript
inputs are the deterministic synthetic fixture for that scale
(fixtures.transcripts_path); graph tables and CSR shards are built once
per scale and cached under the fixture root (resumable `_SUCCESS`
layouts all the way down).

Result schemas use stable, named columns that match the DuckDB oracle
SQL in __ray_entry__ exactly (driver hash-compare requirement).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .config import EngineConfig
from .edges import build_graph_tables, transcript_columns
from .engine import Engine
from .fixtures import transcripts_path
from .graph import DIRECTED, UNDIRECTED, build_shards

PAGERANK_DAMPING = 0.85
PAGERANK_TOL = 1e-6
PAGERANK_FIXED_ITERS = 20  # the SQL-oracle-matched fixed-iteration variant


def default_cfg() -> EngineConfig:
    import ray

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
    ds = rd.read_parquet(p["transcripts"], columns=transcript_columns())
    meta = build_graph_tables(ds, p["graph"], cfg)
    cfg.num_parts = meta["num_parts"]  # honor cached build's partitioning
    return p, cfg, meta


def shardset(sf_dir: str, variant: str = DIRECTED, cfg: EngineConfig | None = None):
    p, cfg, meta = build_graph(sf_dir, cfg)
    edges = rd.read_parquet(os.path.join(p["graph"], "edges"))
    verts = rd.read_parquet(os.path.join(p["graph"], "vertices"))
    sdir = p["shards_d"] if variant == DIRECTED else p["shards_u"]
    ss = build_shards(edges, verts, sdir, cfg, variant=variant)
    return ss, p, cfg


def _vid_names(p) -> pd.DataFrame:
    return rd.read_parquet(os.path.join(p["graph"], "vertices")).to_pandas()


def edges_named(sf_dir: str) -> rd.Dataset:
    """(src_name, dst_name, w) — the materialized edge table in name space."""
    import ray

    p, cfg, _ = build_graph(sf_dir)
    verts = _vid_names(p)
    lut_ref = ray.put(dict(zip(verts["vid"], verts["name"])))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "src_name": pa.array([lut[v] for v in t["src"].to_pylist()]),
                "dst_name": pa.array([lut[v] for v in t["dst"].to_pylist()]),
                "w": t["w"],
            }
        )

    return rd.read_parquet(os.path.join(p["graph"], "edges")).map_batches(
        _name, batch_format="pyarrow"
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
    import ray

    res, p, cfg = _pagerank_result(sf_dir, iters, 0.0)
    verts = _vid_names(p)
    lut_ref = ray.put(dict(zip(verts["vid"], verts["name"])))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "name": pa.array([lut[v] for v in t["vid"].to_pylist()]),
                "rank": pa.array(np.round(t["rank"].to_numpy(zero_copy_only=False), 6)),
            }
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def pagerank_converged(sf_dir: str, tol: float = PAGERANK_TOL):
    """Full L1<tol convergence; returns (RunResult, named vertex Dataset)."""
    import ray

    res, p, cfg = _pagerank_result(sf_dir, None, tol)
    verts = _vid_names(p)
    lut_ref = ray.put(dict(zip(verts["vid"], verts["name"])))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "name": pa.array([lut[v] for v in t["vid"].to_pylist()]),
                "rank": t["rank"],
            }
        )

    return res, res.vertex_table().map_batches(_name, batch_format="pyarrow")


def pagerank_top20(sf_dir: str) -> pd.DataFrame:
    _, named = pagerank_converged(sf_dir)
    df = named.to_pandas()
    df["rank"] = df["rank"].round(6)
    df = df.sort_values(["rank", "name"], ascending=[False, True], ignore_index=True)
    return df.head(20)


def cc_labels(sf_dir: str) -> rd.Dataset:
    """(name, component) — component = lexicographically smallest member
    NAME (canonical across systems: the engine's internal min-vid label is
    remapped so the DuckDB oracle, which only knows names, can compare)."""
    import ray

    from .agg import grouped_apply
    from .algorithms.cc import ConnectedComponents

    ss, p, cfg = shardset(sf_dir, UNDIRECTED)
    res = Engine(ss, cfg).run(ConnectedComponents())
    verts = _vid_names(p)
    lut_ref = ray.put(dict(zip(verts["vid"], verts["name"])))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "name": pa.array([lut[v] for v in t["vid"].to_pylist()]),
                "label": t["label"],
            }
        )

    named = res.vertex_table().map_batches(_name, batch_format="pyarrow").materialize()

    # canonical relabel: label(vid-min) → min member name; component count is
    # small, so the mapping is a broadcast lookup
    def _min_name(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("label", sort=False, as_index=False)["name"].min().rename(
            columns={"name": "component"}
        )

    mapping = grouped_apply(named, ["label"], _min_name).to_pandas()
    map_ref = ray.put(dict(zip(mapping["label"], mapping["component"])))

    def _relabel(t: pa.Table) -> pa.Table:
        lut = ray.get(map_ref)
        return pa.table(
            {
                "name": t["name"],
                "component": pa.array([lut[x] for x in t["label"].to_pylist()]),
            }
        )

    return named.map_batches(_relabel, batch_format="pyarrow")


def cc_sizes(sf_dir: str) -> rd.Dataset:
    from ray.data.aggregate import Count

    return cc_labels(sf_dir).groupby("component").aggregate(Count(alias_name="size"))


def lpa_labels(sf_dir: str, max_iters: int = 20) -> rd.Dataset:
    import ray

    from .algorithms.lpa import LabelPropagation

    ss, p, cfg = shardset(sf_dir, UNDIRECTED)
    res = Engine(ss, cfg).run(LabelPropagation(max_iters=max_iters))
    verts = _vid_names(p)
    lut_ref = ray.put(dict(zip(verts["vid"], verts["name"])))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "name": pa.array([lut[v] for v in t["vid"].to_pylist()]),
                "cluster": pa.array([lut[v] for v in t["label"].to_pylist()]),
            }
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def sssp_from_hub(sf_dir: str, source_name: str = "tool-00", iters: int = 10) -> rd.Dataset:
    """(name, dist) — shortest paths from a hub vertex, fixed `iters`
    Bellman-Ford rounds (matched by the unrolled SQL oracle); only reached
    vertices are returned."""
    import ray

    from .algorithms.sssp import ShortestPaths

    ss, p, cfg = shardset(sf_dir, DIRECTED)
    verts = _vid_names(p)
    source_vid = int(verts.loc[verts["name"] == source_name, "vid"].iloc[0])
    res = Engine(ss, cfg).run(ShortestPaths(source_vid=source_vid, max_iters=iters))
    lut_ref = ray.put(dict(zip(verts["vid"], verts["name"])))

    def _name(t: pa.Table) -> pa.Table:
        import ray as _r

        lut = _r.get(lut_ref)
        d = t["dist"].to_numpy(zero_copy_only=False)
        keep = np.isfinite(d)
        vids = t["vid"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {"name": pa.array([lut[v] for v in vids]), "dist": pa.array(d[keep])}
        )

    return res.vertex_table().map_batches(_name, batch_format="pyarrow")


def triangles_per_vertex(sf_dir: str) -> rd.Dataset:
    """(name, triangles) — only vertices in ≥1 triangle."""
    import ray

    from .algorithms.triangles import triangle_counts

    p, cfg, _ = build_graph(sf_dir)
    edges = rd.read_parquet(os.path.join(p["graph"], "edges"))
    pv = triangle_counts(edges, num_buckets=cfg.num_buckets)
    verts = _vid_names(p)
    lut_ref = ray.put(dict(zip(verts["vid"], verts["name"])))

    def _name(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        return pa.table(
            {
                "name": pa.array([lut[v] for v in t["vid"].to_pylist()]),
                "triangles": t["triangles"],
            }
        )

    return pv.map_batches(_name, batch_format="pyarrow")


def triangle_total_table(sf_dir: str) -> pd.DataFrame:
    from .algorithms.triangles import triangle_counts, triangle_total

    p, cfg, _ = build_graph(sf_dir)
    edges = rd.read_parquet(os.path.join(p["graph"], "edges"))
    pv = triangle_counts(edges, num_buckets=cfg.num_buckets).materialize()
    return pd.DataFrame({"total": [triangle_total(pv)]})
