"""CSR shard store: per-partition scatter-optimized edge layouts.

Stage 2 of the engine (SURVEY.md §7.3 step 3). Edges are hash-partitioned
by source (``part = src % P`` — vids are partition-aligned by
construction, edges.py) and each partition's edge list is compacted into
a **dst-sorted** layout with precomputed combine segments:

    src_local  int64[E]   src // P  (dense per-part index, gather key)
    dst        int64[E]   destination vid, ascending
    w          float64[E] edge weight
    w_norm     float64[E] w / weighted-out-degree(src)   (PageRank scatter)
    dst_unique int64[U]   distinct dst in this shard
    seg_starts int64[U]   reduceat boundaries into the edge arrays

so a full-frontier scatter is one vectorized gather + one
``np.<ufunc>.reduceat`` — map-side combining is baked into the layout
(the reference's eager combiner, /root/reference/pregel/queue.lua:39-52,
done columnar). Per-part vertex meta (``out_deg``, ``out_w``, n_local)
lives beside the shards.

**Hub splitting** (out-degree skew): a partition whose edge list exceeds
``cfg.max_edges_per_shard`` is cut into contiguous dst-sorted sub-shards
that scatter as independent tasks; partial sums for a dst that straddles
a cut are re-combined at apply. The reference has no skew answer
(SURVEY.md §4); this is ours.

Shards are persisted as ``.npz`` files (atomic tmp+rename, resumable) and
loaded into the Ray object store by remote tasks — the arrays never pass
through the driver; scatter tasks ``ray.get`` them zero-copy.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .config import EngineConfig

DIRECTED = "directed"
UNDIRECTED = "undirected"


def symmetrize(edges: rd.Dataset) -> rd.Dataset:
    """Undirected simple-graph view: both directions, self-loops dropped,
    weights summed per (src, dst) — bucketed vectorized group-sum (agg.py)."""
    import pyarrow as pa

    from .agg import group_sum

    def _both(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t["src"], t["dst"]))
        rev = pa.table({"src": t["dst"], "dst": t["src"], "w": t["w"]})
        return pa.concat_tables([t.select(["src", "dst", "w"]), rev])

    return group_sum(edges.map_batches(_both, batch_format="pyarrow"),
                     ["src", "dst"], "w")


def _build_part_shards(
    g: pd.DataFrame, *, P: int, n_local_map: dict[int, int], max_edges: int, out_dir: str
) -> pd.DataFrame:
    """map_groups body: one src-partition's edges → meta npz + shard npz files.

    Returns manifest rows. Deterministic: edges lexsorted by (dst, src);
    writes are atomic (tmp + os.replace) so re-runs converge.
    """
    part = int(g["part"].iloc[0])
    src = g["src"].to_numpy(np.int64)
    dst = g["dst"].to_numpy(np.int64)
    w = g["w"].to_numpy(np.float64)
    n_local = n_local_map.get(part, 0)

    order = np.lexsort((src, dst))
    src, dst, w = src[order], dst[order], w[order]
    src_local = src // P

    out_w = np.zeros(n_local, np.float64)
    out_deg = np.zeros(n_local, np.int64)
    np.add.at(out_w, src_local, w)
    np.add.at(out_deg, src_local, 1)

    meta_path = os.path.join(out_dir, f"part{part:06d}.meta.npz")
    _atomic_savez(meta_path, out_deg=out_deg, out_w=out_w)

    w_norm = w / out_w[src_local]  # out_w > 0 wherever a src edge exists

    n_edges = len(src)
    n_shards = max(1, -(-n_edges // max_edges))
    rows = []
    for s in range(n_shards):
        lo = s * n_edges // n_shards
        hi = (s + 1) * n_edges // n_shards
        d = dst[lo:hi]
        # segment starts: positions where dst changes (d is sorted)
        if hi > lo:
            change = np.flatnonzero(np.diff(d)) + 1
            seg_starts = np.concatenate(([0], change))
            dst_unique = d[seg_starts]
        else:
            seg_starts = np.array([], np.int64)
            dst_unique = np.array([], np.int64)
        # precomputed dst-part split of dst_unique: full-frontier scatters
        # (PageRank) skip the per-superstep mod+argsort entirely
        dp = (dst_unique % P).astype(np.int64)
        dstp_order = np.argsort(dp, kind="stable")
        dp_sorted = dp[dstp_order]
        if len(dp_sorted):
            b = np.flatnonzero(np.diff(dp_sorted)) + 1
            dstp_starts = np.concatenate(([0], b, [len(dp_sorted)]))
            dstp_ids = dp_sorted[np.concatenate(([0], b))]
        else:
            dstp_starts = np.array([0], np.int64)
            dstp_ids = np.array([], np.int64)
        path = os.path.join(out_dir, f"part{part:06d}_s{s:04d}.npz")
        _atomic_savez(
            path,
            src_local=src_local[lo:hi],
            dst=d,
            w=w[lo:hi],
            w_norm=w_norm[lo:hi],
            dst_unique=dst_unique,
            seg_starts=seg_starts.astype(np.int64),
            dstp_order=dstp_order.astype(np.int64),
            dstp_starts=dstp_starts.astype(np.int64),
            dstp_ids=dstp_ids.astype(np.int64),
        )
        rows.append({"part": part, "shard": s, "n_edges": hi - lo, "path": path})
    import pyarrow as pa

    return pa.table(
        {
            "part": pa.array([r["part"] for r in rows], pa.int64()),
            "shard": pa.array([r["shard"] for r in rows], pa.int64()),
            "n_edges": pa.array([r["n_edges"] for r in rows], pa.int64()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
        }
    )


def _atomic_savez(path: str, **arrays) -> None:
    tmp = path + f".tmp{os.getpid()}.npz"  # .npz suffix: stop np.savez renaming
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


@ray.remote
def _load_npz(path: str) -> dict[str, np.ndarray]:
    """Load a shard/meta file into the object store. Runs as a remote task so
    the arrays are plasma-resident where the task ran — never on the driver."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


class ShardSet:
    """A built shard store for one graph variant (directed / undirected)."""

    def __init__(self, shard_dir: str):
        self.shard_dir = shard_dir
        with open(os.path.join(shard_dir, "manifest.json")) as f:
            m = json.load(f)
        self.P: int = m["P"]
        self.n_vertices: int = m["n_vertices"]
        self.n_edges: int = m["n_edges"]
        self.n_local: dict[int, int] = {int(k): v for k, v in m["n_local"].items()}
        # manifest order defines the global shard id (determinism anchor)
        self.shards: list[dict] = m["shards"]
        # meta paths recorded per part so delta builds can point unaffected
        # parts at a previous epoch's immutable files; fall back to the
        # derived in-dir path for manifests written before this field
        self.meta_paths: dict[int, str] = {
            int(k): v for k, v in m.get("meta_paths", {}).items()
        } or {
            p: os.path.join(shard_dir, f"part{p:06d}.meta.npz")
            for p in self.n_local
        }
        self.shards_of_part: dict[int, list[int]] = {}
        for gid, srow in enumerate(self.shards):
            self.shards_of_part.setdefault(srow["part"], []).append(gid)
        self._refs = None
        self._meta_refs = None

    def load_refs(self):
        """ObjectRefs for every shard + part meta (idempotent)."""
        if self._refs is None:
            self._refs = {gid: _load_npz.remote(s["path"]) for gid, s in enumerate(self.shards)}
            self._meta_refs = {
                p: _load_npz.remote(self.meta_paths[p]) for p in sorted(self.n_local)
            }
        return self._refs, self._meta_refs

    def parts(self) -> list[int]:
        return sorted(self.n_local)


def build_shards(
    edges: rd.Dataset,
    vertices: rd.Dataset,
    shard_dir: str,
    cfg: EngineConfig,
    variant: str = DIRECTED,
) -> ShardSet:
    """Build (or reuse) the shard store for a graph variant."""
    manifest_path = os.path.join(shard_dir, "manifest.json")
    if os.path.exists(manifest_path):
        return ShardSet(shard_dir)
    os.makedirs(shard_dir, exist_ok=True)

    P = cfg.num_parts
    # n_local per part from the vertex table (vertices may lack out-edges)
    nl = vertices.groupby("part").count().to_pandas()
    n_local_map = dict(zip(nl["part"].astype(int), nl["count()"].astype(int)))
    n_vertices = int(sum(n_local_map.values()))

    if variant == UNDIRECTED:
        edges = symmetrize(edges)

    manifest_rows = _build_parts_shards(
        edges, None, P, n_local_map, cfg.max_edges_per_shard, shard_dir
    )
    _write_manifest(
        shard_dir, P, n_vertices, n_local_map, manifest_rows,
        meta_paths={
            p: os.path.join(shard_dir, f"part{p:06d}.meta.npz") for p in n_local_map
        },
    )
    return ShardSet(shard_dir)


def _build_parts_shards(
    edges: rd.Dataset, only_parts: set[int] | None, P: int,
    n_local_map: dict[int, int], max_edges: int, shard_dir: str,
) -> pd.DataFrame:
    """Shard-build fan-out: partition edges by src part (optionally only
    `only_parts`), build each part's CSR shard files, write meta files for
    the (selected) parts that have vertices but no out-edges."""
    import pyarrow as pa

    def _with_part(t: pa.Table) -> pa.Table:
        part = (t["src"].to_numpy(zero_copy_only=False) % P).astype(np.int32)
        t = t.append_column("part", pa.array(part))
        if only_parts is not None:
            t = t.filter(
                pa.compute.is_in(
                    t["part"], value_set=pa.array(sorted(only_parts), pa.int32())
                )
            )
        return t

    manifest_rows = (
        edges.map_batches(_with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            _build_part_shards,
            batch_format="pandas",
            fn_kwargs={
                "P": P,
                "n_local_map": n_local_map,
                "max_edges": max_edges,
                "out_dir": shard_dir,
            },
        )
        .to_pandas()
    )
    seen = set(manifest_rows["part"].astype(int)) if len(manifest_rows) else set()
    targets = n_local_map.keys() if only_parts is None else only_parts
    for p in targets:
        if p not in seen:
            n = n_local_map.get(p, 0)
            _atomic_savez(
                os.path.join(shard_dir, f"part{p:06d}.meta.npz"),
                out_deg=np.zeros(n, np.int64),
                out_w=np.zeros(n, np.float64),
            )
    return manifest_rows


def _write_manifest(shard_dir, P, n_vertices, n_local_map, manifest_rows, meta_paths):
    manifest_rows = manifest_rows.sort_values(["part", "shard"], ignore_index=True)
    manifest = {
        "P": P,
        "n_vertices": n_vertices,
        "n_edges": int(manifest_rows["n_edges"].sum()) if len(manifest_rows) else 0,
        "n_local": {str(p): int(n) for p, n in sorted(n_local_map.items())},
        "shards": manifest_rows.to_dict("records"),
        "meta_paths": {str(p): path for p, path in sorted(meta_paths.items())},
    }
    manifest_path = os.path.join(shard_dir, "manifest.json")
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, manifest_path)


def build_shards_delta(
    old: ShardSet,
    edges: rd.Dataset,
    shard_dir: str,
    cfg: EngineConfig,
    affected: set[int],
    n_local_new: dict[int, int],
    variant: str = DIRECTED,
) -> ShardSet:
    """Topology-mutation rebuild: re-shard ONLY the affected partitions
    from the (already mutated) edge Dataset; unaffected partitions keep
    their previous epoch's immutable shard/meta files by path. This is the
    100 TB mutation shape — work scales with the touched partitions, not
    the graph (SURVEY.md §2.6 T5 mapping)."""
    manifest_path = os.path.join(shard_dir, "manifest.json")
    if os.path.exists(manifest_path):
        return ShardSet(shard_dir)
    os.makedirs(shard_dir, exist_ok=True)
    P = old.P
    if variant == UNDIRECTED:
        edges = symmetrize(edges)
        # symmetrize moves every touched edge's reverse too: the caller
        # must include both endpoint parts in `affected` for undirected

    new_rows = _build_parts_shards(
        edges, set(affected), P, n_local_new, cfg.max_edges_per_shard, shard_dir
    )
    kept = pd.DataFrame(
        [s for s in old.shards if s["part"] not in affected],
        columns=["part", "shard", "n_edges", "path"],
    )
    manifest_rows = pd.concat([kept, new_rows], ignore_index=True) if len(new_rows) else kept
    # Brand-new parts (first vertex added there) must be in `affected` —
    # _apply_mutations guarantees it — or their meta .npz would never be
    # written (only _build_parts_shards writes fresh meta files).
    new_parts = {p for p in n_local_new if p not in old.n_local}
    assert new_parts <= affected, f"new parts {new_parts - affected} not rebuilt"
    meta_paths = {
        p: (os.path.join(shard_dir, f"part{p:06d}.meta.npz")
            if p in affected else old.meta_paths[p])
        for p in n_local_new
    }
    _write_manifest(
        shard_dir, P, int(sum(n_local_new.values())), n_local_new, manifest_rows,
        meta_paths,
    )
    return ShardSet(shard_dir)
