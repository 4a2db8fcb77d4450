"""vid↔name mapping for query pipelines, gated on
``EngineConfig.broadcast_vertex_threshold``.

Below the threshold (the common case — vertex cardinality ≪ edge count)
one remote task builds sorted vid/name/rank arrays that live in plasma
(``ray.put``-style broadcast: the driver holds only the ObjectRef, every
``map_batches`` does a vectorized ``np.searchsorted``). This mirrors the
reference's per-worker id space (/root/reference/pregel/mpool.lua:31-42),
which is likewise |V|-bounded per process.

Above the threshold (or with it forced to 0) nothing |V|-bounded may
land in a single object (at 10^9+ vertices the LUT is tens of GB), so:

- vid→name renames become bucketed map-side joins against the vertices
  parquet (``agg.bucketed_join`` — one hash shuffle, no broadcast);
- name→vid point lookups become a predicate-pushdown parquet scan in a
  remote task;
- global NAME RANKS (LPA init labels, rank→name decodes) come from a
  DISTRIBUTED dense-rank build — sort by name, per-block row-number
  offsets, written as a partition-sliced parquet table
  (``name_ranks_pP/part-K/``) so every consumer reads only its
  partition's slice.

The two paths are value-identical; tests/test_namemap.py pins that by
running the same pipelines with the threshold forced to 0.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .config import EngineConfig
from .io_util import read_parquet as _read_parquet


@ray.remote
def _name_lut_task(vertices_dir: str, P: int) -> dict:
    """Broadcast-path lookup arrays, built in a remote task so they stay
    in plasma.

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


def _names_of(lut: dict, vid_arr: np.ndarray) -> np.ndarray:
    # clip + equality fail-fast (relational._lookup_names pattern): a vid
    # absent from the LUT (e.g. dangling after delete_vertex) must raise,
    # not silently map to an adjacent entry's name.
    idx = np.clip(np.searchsorted(lut["vids"], vid_arr), 0, len(lut["vids"]) - 1)
    if not np.array_equal(lut["vids"][idx], vid_arr):
        missing = np.unique(np.asarray(vid_arr)[lut["vids"][idx] != vid_arr])
        raise KeyError(f"vids not in vertex table: {missing[:10].tolist()}")
    return lut["names"][idx]


@ray.remote
def _vid_of_name_bcast(lut: dict, name: str) -> int:
    ns = lut["names_sorted"]
    i = min(int(np.searchsorted(ns, name)), len(ns) - 1)
    if ns[i] != name:
        raise KeyError(f"vertex name {name!r} not in vertex table")
    return int(lut["vids_by_rank"][i])


@ray.remote
def _vid_of_name_scan(vertices_dir: str, name: str) -> int:
    """Point lookup via predicate pushdown — only matching row groups are
    read; never materializes the vertex table."""
    import pyarrow.dataset as pds

    t = pds.dataset(vertices_dir, format="parquet").to_table(
        columns=["vid"], filter=pds.field("name") == name
    )
    if t.num_rows != 1:
        raise KeyError(f"vertex name {name!r}: {t.num_rows} matches")
    return int(t["vid"][0].as_py())


# ---------------------------------------------------------------------------
# distributed name-rank table (fallback path)
# ---------------------------------------------------------------------------


@ray.remote
def _block_nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _block_add_rank(t: pa.Table, offset: int, P: int) -> pa.Table:
    vid = t["vid"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "vid": t["vid"],
            "name": t["name"],
            "rank": pa.array(offset + np.arange(t.num_rows, dtype=np.int64)),
            "part": pa.array((vid % P).astype(np.int32)),
        }
    )


def build_name_ranks(vertices_dir: str, out_dir: str, P: int) -> str:
    """Distributed dense rank of vertex names: global sort by name →
    per-block row-number offsets (the only driver-side data is one count
    per block) → partition-sliced committed parquet
    ``out_dir/part-K/data.parquet``. Names are unique by construction
    (encode_vertices distinct), so dense rank == row number."""
    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ds = _read_parquet(vertices_dir, columns=["vid", "name"]).sort("name")
    refs = ds.materialize().to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])  # ≤ #blocks ints
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    ranked = rd.from_arrow_refs(
        [_block_add_rank.remote(r, int(o), P) for r, o in zip(refs, offsets)]
    )

    def _commit(g) -> pa.Table:
        part = int(g["part"].iloc[0])
        d = os.path.join(out_dir, f"part-{part:05d}")
        os.makedirs(d, exist_ok=True)
        tbl = pa.Table.from_pandas(
            g.drop(columns="part"), preserve_index=False
        ).replace_schema_metadata(None)
        pq.write_table(tbl, os.path.join(d, "data.parquet"))
        return pa.table({"part": pa.array([part], pa.int32())})

    manifest = (
        ranked.groupby("part")
        .map_groups(_commit, batch_format="pandas")
        .to_pandas()  # ≤ P rows
    )
    # empty input → schema-less manifest (same guard as sinks.py)
    written = set(manifest["part"]) if "part" in manifest.columns else set()
    empty = pa.schema(
        [("vid", pa.int64()), ("name", pa.string()), ("rank", pa.int64())]
    ).empty_table()
    for part in range(P):
        d = os.path.join(out_dir, f"part-{part:05d}")
        if part not in written:
            os.makedirs(d, exist_ok=True)
            pq.write_table(empty, os.path.join(d, "data.parquet"))
    with open(success, "w") as f:
        f.write("ok\n")
    return out_dir


class NameMap:
    """Facade over the two paths. Construct once per pipeline call."""

    def __init__(self, graph_dir: str, cfg: EngineConfig, n_vertices: int):
        self.graph_dir = graph_dir
        self.cfg = cfg
        self.n_vertices = int(n_vertices)
        self.vertices_dir = os.path.join(graph_dir, "vertices")
        self._lut_ref = None

    @property
    def broadcast(self) -> bool:
        return self.n_vertices <= self.cfg.broadcast_vertex_threshold

    def lut_ref(self):
        assert self.broadcast
        if self._lut_ref is None:
            self._lut_ref = _name_lut_task.remote(self.vertices_dir, self.cfg.num_parts)
        return self._lut_ref

    # -- vid → name rename ---------------------------------------------------

    def rename(self, ds: rd.Dataset, spec: dict[str, str], keep=()) -> rd.Dataset:
        """For each (out_col ← vid_col) in spec, add the name column; pass
        `keep` columns through. Broadcast: vectorized searchsorted per
        batch. Fallback: one bucketed map-side join per vid column."""
        keep = list(keep)
        if self.broadcast:
            lut_ref = self.lut_ref()

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

            return ds.map_batches(_fn, batch_format="pyarrow")

        from .agg import bucketed_join

        nb = max(self.cfg.num_buckets, self.cfg.num_parts)
        for out, src in spec.items():
            right = _read_parquet(
                self.vertices_dir, columns=["vid", "name"]
            ).rename_columns({"name": out})
            ds = bucketed_join(ds, right, [src], ["vid"], num_buckets=nb)
        return ds.select_columns(list(spec.keys()) + keep)

    # -- name → vid point lookup ----------------------------------------------

    def vid_of_name(self, name: str) -> int:
        if self.broadcast:
            return ray.get(_vid_of_name_bcast.remote(self.lut_ref(), name))
        return ray.get(_vid_of_name_scan.remote(self.vertices_dir, name))

    # -- global name ranks ----------------------------------------------------

    def ranks_dir(self) -> str:
        """Partition-sliced (vid, name, rank) table (fallback path); built
        once per graph and cached by `_SUCCESS`."""
        out = os.path.join(self.graph_dir, f"name_ranks_p{self.cfg.num_parts}")
        return build_name_ranks(self.vertices_dir, out, self.cfg.num_parts)

    def rank_decode(self, ds: rd.Dataset, spec: dict[str, str], keep=()) -> rd.Dataset:
        """For each (out_col ← rank_col) in spec, decode the global name
        RANK back to the name. Broadcast: names_sorted fancy-index.
        Fallback: bucketed join against the rank table on `rank`."""
        keep = list(keep)
        if self.broadcast:
            lut_ref = self.lut_ref()

            def _fn(t: pa.Table) -> pa.Table:
                lut = ray.get(lut_ref)
                cols = {}
                for out, src in spec.items():
                    r = t[src].to_numpy(zero_copy_only=False)
                    if len(r) and (r.min() < 0 or r.max() >= len(lut["names_sorted"])):
                        raise KeyError(
                            f"name rank out of range [0, {len(lut['names_sorted'])}) "
                            f"in column {src!r}"
                        )
                    cols[out] = pa.array(lut["names_sorted"][r])
                for k in keep:
                    cols[k] = t[k]
                return pa.table(cols)

            return ds.map_batches(_fn, batch_format="pyarrow")

        from .agg import bucketed_join

        nb = max(self.cfg.num_buckets, self.cfg.num_parts)
        rdir = self.ranks_dir()
        # part-NNNNN (no '='): a slice layout, not Hive values — avoids
        # both spurious partition-column inference and Ray's
        # columns+partitioning=None UnboundLocalError (parquet_datasource)
        paths = sorted(
            os.path.join(rdir, d, "data.parquet")
            for d in os.listdir(rdir)
            if d.startswith("part-")
        )
        for out, src in spec.items():
            right = _read_parquet(
                paths, columns=["rank", "name"]
            ).rename_columns({"name": out})
            ds = bucketed_join(ds, right, [src], ["rank"], num_buckets=nb)
        return ds.select_columns(list(spec.keys()) + keep)

    def lpa_init_kwargs(self) -> dict:
        """Init-label source for LabelPropagation (name-rank labels)."""
        if self.broadcast:
            return {"init_labels_ref": self.lut_ref()}
        return {"init_labels_path": self.ranks_dir()}

    def rank_of_vid_fn(self):
        """Per-vid rank lookup callable (the per-vertex compute API's
        initial_value). Broadcast: searchsorted against the plasma LUT.
        Fallback: partition-sliced parquet read, cached per process —
        partition-bounded memory inside the partition's own task."""
        P = self.cfg.num_parts
        if self.broadcast:
            ref = self.lut_ref()

            def _bcast(vid: int, _ref=ref) -> int:
                lut = ray.get(_ref)  # node-cached plasma read
                return int(lut["ranks"][np.searchsorted(lut["vids"], vid)])

            return _bcast

        rdir = self.ranks_dir()

        def _sliced(vid: int, _dir=rdir, _P=P) -> int:
            arr = _part_ranks(_dir, int(vid) % _P, _P)
            return int(arr[int(vid) // _P])

        return _sliced


@lru_cache(maxsize=256)
def _part_ranks(ranks_dir: str, part: int, P: int) -> np.ndarray:
    """rank per local index (vid // P) for one partition; the fallback
    analogue of the LUT's ranks_by_part[part]."""
    t = pq.read_table(
        os.path.join(ranks_dir, f"part-{part:05d}", "data.parquet"),
        columns=["vid", "rank"],
    )
    vids = t["vid"].to_numpy(zero_copy_only=False)
    ranks = t["rank"].to_numpy(zero_copy_only=False)
    arr = np.empty(len(vids), np.int64)
    arr[vids // P] = ranks
    return arr
