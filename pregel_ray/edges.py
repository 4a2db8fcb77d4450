"""Transcript → edge-table materialization (stage 1 of the engine).

Semantics (FIXTURES.md §1, BASELINE.json north_star): vertex identity of a
turn is ``tool`` when non-null else ``conv_id + "/" + role`` (tool vertices
are global hubs; role vertices are conversation-scoped). Within each
conversation, turns are sorted by ``turn_idx`` (the stable turn ordering);
one directed edge per consecutive turn pair; weight = occurrence count
after ``groupby(src, dst)``.

Execution shape (all Ray Data, streaming):

    read_parquet(columns=[conv_id,turn_idx,role,tool])     # text pruned at read
      → map_batches(names, pyarrow)                        # stateless, vectorized
      → groupby(bucket).map_groups(pairs_in_bucket)        # shuffle #1: conv bucket
          (bucket = stable_hash(conv_id) % B keeps every conversation's turns
           together while batching ~n_convs/B conversations per vectorized group)
      → groupby(src_name, dst_name).aggregate(Sum(w))      # shuffle #2: dedup/weight
      → dictionary-encode names → dense part-aligned vids  # shuffle #3: part
      → write_parquet(edges/, vertices/)

Vertex ids are **partition-aligned**: ``part = stable_hash(name) % P`` and
``vid = local_rank * P + part`` (local_rank = rank of name within its
partition, sorted). Hence ``vid % P == part`` and ``vid // P`` is a dense
per-partition index — CSR shards index local arrays directly and message
routing needs no hash lookups. This replaces the reference's
guava-jump-hash-of-crc32 partitioner (/root/reference/pregel/mpool.lua:29-42)
with a scheme that is self-consistent and skew-measurable.

The id assignment is fully distributed: ranks are assigned inside
``groupby(part).map_groups`` — no global coordination, no driver-side pass.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .config import EngineConfig


def stable_hash(arr) -> np.ndarray:
    """Deterministic (cross-process, cross-run) uint64 hash of a string array."""
    a = np.asarray(arr, dtype=object)
    return pd.util.hash_array(a, categorize=False)


def transcript_columns() -> list[str]:
    """Columns the edge pipeline needs — pass to read_parquet to prune `text`/`ts`."""
    return ["conv_id", "turn_idx", "role", "tool"]


def _name_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Vertex name + conversation bucket, vectorized Arrow."""
    name = pc.coalesce(
        batch["tool"],
        pc.binary_join_element_wise(batch["conv_id"], batch["role"], "/"),
    )
    bucket = (stable_hash(batch["conv_id"].to_numpy(zero_copy_only=False)) % num_buckets).astype(
        np.int32
    )
    return pa.table(
        {
            "bucket": pa.array(bucket),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "name": name,
        }
    )


_EMPTY_PAIRS = pa.table(
    {"src_name": pa.array([], pa.string()), "dst_name": pa.array([], pa.string()),
     "w": pa.array([], pa.float64())}
)


def _pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
    """Consecutive-pair edges for every conversation in one bucket, with
    bucket-local partial weights (map-side combine before the global
    groupby). Arrow out: typed empties + no pandas block schemas."""
    g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    name = g["name"].to_numpy()
    conv = g["conv_id"].to_numpy()
    if len(name) < 2:
        return _EMPTY_PAIRS
    same = conv[1:] == conv[:-1]
    df = pd.DataFrame({"src_name": name[:-1][same], "dst_name": name[1:][same]})
    out = df.groupby(["src_name", "dst_name"], sort=False, as_index=False).size()
    return pa.table(
        {
            "src_name": pa.array(out["src_name"], pa.string()),
            "dst_name": pa.array(out["dst_name"], pa.string()),
            "w": pa.array(out["size"].to_numpy(np.float64)),
        }
    )


def derive_pairs(transcripts: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """transcripts → weighted named edge table (src_name, dst_name, w).

    The global weight combine is a bucketed vectorized group-sum (agg.py) —
    Ray Data's aggregate() on a high-cardinality string pair key folds rows
    per key in Python (measured 64× slower)."""
    from .agg import group_sum

    named = transcripts.select_columns(transcript_columns()).map_batches(
        _name_batch,
        batch_format="pyarrow",
        fn_kwargs={"num_buckets": cfg.num_buckets},
    )
    pairs = named.groupby("bucket").map_groups(_pairs_in_bucket, batch_format="pandas")
    return group_sum(pairs, ["src_name", "dst_name"], "w",
                     num_buckets=max(32, cfg.num_buckets))


def encode_vertices(
    pairs: rd.Dataset, cfg: EngineConfig, extra_names: list[str] | None = None
) -> rd.Dataset:
    """Distinct vertex names → (name, part, vid) with partition-aligned ids.

    ``extra_names`` registers vertices with no incident edges (isolates)."""
    P = cfg.num_parts

    def _names(batch: pa.Table) -> pa.Table:
        n = pa.concat_arrays(
            [batch["src_name"].combine_chunks(), batch["dst_name"].combine_chunks()]
        )
        # batch-local distinct before the global one (map-side combine)
        return pa.table({"name": pc.unique(n)})

    name_src = pairs.map_batches(_names, batch_format="pyarrow")
    if extra_names:
        name_src = name_src.union(rd.from_arrow(pa.table({"name": pa.array(extra_names)})))

    def _part(batch: pa.Table) -> pa.Table:
        batch = batch.select(["name"])
        part = (stable_hash(batch["name"].to_numpy(zero_copy_only=False)) % P).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    def _assign(g: pd.DataFrame) -> pa.Table:
        # every copy of a name hashes to the same part, so the GLOBAL
        # dedup happens here — one shuffle total (r5: the separate
        # distinct stage was a second full exchange of the same names)
        g = (
            g.drop_duplicates("name")
            .sort_values("name", kind="mergesort")
            .reset_index(drop=True)
        )
        part = int(g["part"].iloc[0])
        return pa.table(
            {
                "name": pa.array(g["name"], pa.string()),
                "part": pa.array(g["part"].to_numpy(np.int32)),
                "vid": pa.array(np.arange(len(g), dtype=np.int64) * P + part),
            }
        )

    return (
        name_src.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_assign, batch_format="pandas")
    )


def encode_edges(
    pairs: rd.Dataset, vertices: rd.Dataset, cfg: EngineConfig, n_vertices: int | None = None
) -> rd.Dataset:
    """Map (src_name, dst_name, w) → (src, dst, w) int64 vids.

    Small vertex sets (the common case — vertex cardinality ≪ edge count)
    are broadcast once via ``ray.put`` and looked up vectorized per batch;
    large ones fall back to two hash-partitioned ``Dataset.join`` passes.
    """
    if n_vertices is None:
        n_vertices = vertices.count()

    if n_vertices <= cfg.broadcast_vertex_threshold:
        # Broadcast lookup: sorted fixed-width name array + aligned vid array,
        # ray.put once, binary-searched vectorized per batch (np.searchsorted
        # on U-dtype is pure C). No shuffle.
        blocks = [t for t in ray.get(vertices.to_arrow_refs()) if t.num_rows > 0]
        if not blocks:  # zero-edge graph (e.g. all conversations single-turn)
            empty = pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "w": pa.array([], pa.float64())}
            )
            return rd.from_arrow(empty)
        vt = pa.concat_tables(blocks)
        names = np.asarray(vt["name"].to_pylist(), dtype=str)
        order = np.argsort(names, kind="stable")
        lut_ref = ray.put(
            {"names": names[order], "vids": vt["vid"].to_numpy(zero_copy_only=False)[order]}
        )

        def _lookup(batch: pa.Table) -> pa.Table:
            lut = ray.get(lut_ref)  # zero-copy plasma read, node-cached
            ln, lv = lut["names"], lut["vids"]
            src_n = np.asarray(batch["src_name"].to_pylist(), dtype=ln.dtype)
            dst_n = np.asarray(batch["dst_name"].to_pylist(), dtype=ln.dtype)
            src = lv[np.searchsorted(ln, src_n)]
            dst = lv[np.searchsorted(ln, dst_n)]
            return pa.table({"src": pa.array(src), "dst": pa.array(dst), "w": batch["w"]})

        return pairs.map_batches(_lookup, batch_format="pyarrow")

    # Large-vertex path: two bucketed map-side joins on the name key
    # (agg.bucketed_join). Dataset.join is avoided entirely: its
    # hash-shuffle aggregator actors starve/hang when partitions approach
    # the core count (observed: 64-partition join crawling at 5% CPU, and
    # a hard hang at 2 cpus/sf4 even with a num_partitions guard).
    from .agg import bucketed_join

    v = vertices.select_columns(["name", "vid"])
    nb = max(cfg.num_buckets, cfg.num_parts)
    e1 = bucketed_join(pairs, v, ["src_name"], ["name"], num_buckets=nb)
    e1 = e1.rename_columns({"vid": "src"}).select_columns(["src", "dst_name", "w"])
    e2 = bucketed_join(e1, v, ["dst_name"], ["name"], num_buckets=nb)
    e2 = e2.rename_columns({"vid": "dst"})
    return e2.select_columns(["src", "dst", "w"])


EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("w", pa.float64())])


def _ensure_parquet_dir(path: str, schema: pa.Schema) -> None:
    """write_parquet of an empty Dataset writes no files; give readers a
    schema'd empty file instead of a FileNotFoundError."""
    import pyarrow.parquet as pq

    if not os.path.isdir(path) or not os.listdir(path):
        os.makedirs(path, exist_ok=True)
        pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))


def build_graph_tables(
    transcripts: rd.Dataset, graph_dir: str, cfg: EngineConfig
) -> dict:
    """Full stage-1 pipeline → graph_dir/{edges,vertices}/ parquet + meta.json.

    Resumable: if graph_dir/_SUCCESS exists the build is skipped entirely.
    """
    success = os.path.join(graph_dir, "_SUCCESS")
    if os.path.exists(success):
        with open(os.path.join(graph_dir, "meta.json")) as f:
            return json.load(f)
    return build_graph_tables_from_pairs(
        derive_pairs(transcripts, cfg), graph_dir, cfg
    )


def build_graph_tables_from_pairs(
    pairs: rd.Dataset, graph_dir: str, cfg: EngineConfig
) -> dict:
    """Stage-1 from an ALREADY-DERIVED weighted named edge table
    (src_name, dst_name, w) — any domain whose entities can be named
    strings gets the whole engine this way (e.g. pipelines.textrank's
    token co-occurrence graph). Same layout, caching and partition
    invariants as build_graph_tables; `pairs` must be pre-combined
    (one row per directed pair)."""
    success = os.path.join(graph_dir, "_SUCCESS")
    meta_path = os.path.join(graph_dir, "meta.json")
    if os.path.exists(success):
        with open(meta_path) as f:
            return json.load(f)

    os.makedirs(graph_dir, exist_ok=True)
    pairs = pairs.materialize()
    vertices = encode_vertices(pairs, cfg).materialize()
    n_vertices = vertices.count()
    edges = encode_edges(pairs, vertices, cfg, n_vertices=n_vertices)

    edges_dir = os.path.join(graph_dir, "edges")
    edges.write_parquet(edges_dir)
    vertices.write_parquet(os.path.join(graph_dir, "vertices"))
    _ensure_parquet_dir(edges_dir, EDGE_SCHEMA)
    _ensure_parquet_dir(
        os.path.join(graph_dir, "vertices"),
        pa.schema([("name", pa.string()), ("part", pa.int32()), ("vid", pa.int64())]),
    )
    n_edges = rd.read_parquet(edges_dir).count()
    meta = {
        "num_parts": cfg.num_parts,
        "n_vertices": int(n_vertices),
        "n_edges": int(n_edges),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with open(success, "w") as f:
        f.write("")
    return meta
