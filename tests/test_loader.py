"""Reference edge-list text format round-trip (FIXTURES.md §3)."""

import numpy as np

from pregel_ray import fixtures
from pregel_ray.loader import read_edge_list, write_reference_format


def test_roundtrip(ray_session, tmp_path):
    tbl = fixtures.g_two_cliques_bridge()
    e = tbl.to_pandas()
    verts = sorted(set(e["src"]) | set(e["dst"]))
    path = str(tmp_path / "graph.txt")
    write_reference_format(
        path,
        [(v, f"v{v}", float(v) * 1.5) for v in verts],
        list(zip(e["src"], e["dst"], e["w"])),
    )
    vds, eds = read_edge_list(path)
    v = vds.to_pandas().sort_values("id", ignore_index=True)
    assert list(v["id"]) == verts
    assert list(v["name"]) == [f"v{x}" for x in verts]
    np.testing.assert_allclose(v["value"], [x * 1.5 for x in verts])
    e2 = eds.to_pandas().sort_values(["src", "dst"], ignore_index=True)
    e1 = e.sort_values(["src", "dst"], ignore_index=True)
    assert (e1[["src", "dst"]].to_numpy() == e2[["src", "dst"]].to_numpy()).all()


def test_both_ingestion_paths_agree(ray_session, tmp_path):
    """Text-loaded edges must build the same graph as the direct table path."""
    import ray.data as rd

    from pregel_ray.config import EngineConfig
    from pregel_ray.engine import Engine
    from pregel_ray.algorithms import PageRank
    from pregel_ray.testing import MicroGraph

    tbl = fixtures.g_triangle_plus_tail()
    e = tbl.to_pandas()
    path = str(tmp_path / "g.txt")
    write_reference_format(path, [], list(zip(e["src"], e["dst"], e["w"])))
    _, eds = read_edge_list(path)
    import pyarrow as pa

    tbl2 = pa.Table.from_pandas(eds.to_pandas(), preserve_index=False)

    cfg = EngineConfig(num_parts=4)
    g1 = MicroGraph(tbl, str(tmp_path / "s1"), cfg)
    g2 = MicroGraph(tbl2, str(tmp_path / "s2"), cfg)
    r1 = Engine(g1.shards, cfg).run(PageRank(max_iters=8))
    r2 = Engine(g2.shards, cfg).run(PageRank(max_iters=8))
    a = g1.result_by_id(r1.vertex_table().to_pandas(), "rank")
    b = g2.result_by_id(r2.vertex_table().to_pandas(), "rank")
    np.testing.assert_array_equal(a, b)
