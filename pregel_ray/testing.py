"""Helpers for driving the engine on in-memory integer edge tables
(micro-graph fixtures, FIXTURES.md §2) — used by tests and examples."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .config import EngineConfig
from .edges import encode_edges, encode_vertices
from .graph import DIRECTED, ShardSet, build_shards


class MicroGraph:
    """Engine-ready graph from a small (src:int, dst:int, w) pyarrow table.

    Keeps the original-int-id ↔ engine-vid mapping so oracle results
    (indexed by original ids) can be compared against engine output.
    """

    def __init__(
        self,
        edge_tbl: pa.Table,
        workdir: str,
        cfg: EngineConfig,
        n_vertices: int | None = None,
        variant: str = DIRECTED,
    ):
        self.cfg = cfg
        src = edge_tbl["src"].to_numpy(zero_copy_only=False)
        dst = edge_tbl["dst"].to_numpy(zero_copy_only=False)
        ids = np.union1d(src, dst)
        if n_vertices is not None:  # isolated vertices beyond the edge set
            ids = np.union1d(ids, np.arange(n_vertices))
        self.ids = ids

        def name(i):
            return f"v{i:08d}"

        pairs = rd.from_arrow(
            pa.table(
                {
                    "src_name": pa.array([name(i) for i in src]),
                    "dst_name": pa.array([name(i) for i in dst]),
                    "w": edge_tbl["w"],
                }
            )
        )
        vertices = encode_vertices(
            pairs, cfg, extra_names=[name(i) for i in ids]
        ).materialize()
        edges = encode_edges(pairs, vertices, cfg).materialize()

        vt = vertices.to_pandas()
        self.name2vid = dict(zip(vt["name"], vt["vid"]))
        self.vid_of = np.array([self.name2vid[name(i)] for i in ids], np.int64)
        self.id_of_vid = {int(v): int(i) for i, v in zip(ids, self.vid_of)}

        # persist tables so Engine mutation support can rebuild shards
        self.graph_source = {
            "edges_dir": f"{workdir}_graph/edges",
            "vertices_dir": f"{workdir}_graph/vertices",
            "work_dir": f"{workdir}_graph/mutations",
        }
        edges.write_parquet(self.graph_source["edges_dir"])
        vertices.write_parquet(self.graph_source["vertices_dir"])

        self.shards: ShardSet = build_shards(edges, vertices, workdir, cfg, variant=variant)

    def to_engine_order(self, values_by_id: np.ndarray) -> dict[int, float]:
        """oracle array indexed by original id → {vid: value}."""
        return {int(v): values_by_id[int(i)] for i, v in zip(self.ids, self.vid_of)}

    def result_by_id(self, vertex_df, col: str) -> np.ndarray:
        """engine vertex table (vid,col) → array indexed by original id."""
        out = np.zeros(int(self.ids.max()) + 1, dtype=np.asarray(vertex_df[col]).dtype)
        for vid, val in zip(vertex_df["vid"], vertex_df[col]):
            out[self.id_of_vid[int(vid)]] = val
        return out
