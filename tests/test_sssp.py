"""SSSP vs Bellman-Ford oracle (exact — identical +/min algebra)."""

import numpy as np
import pytest

from pregel_ray import fixtures
from pregel_ray.algorithms.sssp import ShortestPaths
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.testing import MicroGraph

from tests.oracles import sssp_oracle


@pytest.mark.parametrize("maker,n,source", [
    (fixtures.g_line4, 4, 0),
    (fixtures.g_two_cliques_bridge, None, 0),
    (fixtures.g_hub, None, 0),
])
def test_sssp_micrographs(ray_session, tmp_path, maker, n, source):
    tbl = maker()
    e = tbl.to_pandas()
    nv = n or int(max(e["src"].max(), e["dst"].max())) + 1
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=nv)
    res = Engine(g.shards, cfg).run(ShortestPaths(source_vid=int(g.vid_of[source])))
    assert res.converged
    vt = res.vertex_table().to_pandas()
    got = np.full(nv, np.inf)
    for vid, d in zip(vt["vid"], vt["dist"]):
        got[g.id_of_vid[int(vid)]] = d
    want = sssp_oracle(e["src"], e["dst"], e["w"], nv, source)
    np.testing.assert_array_equal(got, want)


def test_sssp_weighted_random(ray_session, tmp_path):
    rng = np.random.default_rng(17)
    nv = 50
    src = rng.integers(0, nv, 200)
    dst = rng.integers(0, nv, 200)
    w = rng.integers(1, 10, 200).astype(float)
    tbl = fixtures.edge_table(list(zip(src.tolist(), dst.tolist(), w.tolist())))
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=nv)
    res = Engine(g.shards, cfg).run(ShortestPaths(source_vid=int(g.vid_of[0])))
    vt = res.vertex_table().to_pandas()
    got = np.full(nv, np.inf)
    for vid, d in zip(vt["vid"], vt["dist"]):
        got[g.id_of_vid[int(vid)]] = d
    # engine sums weights per duplicate edge at encode? no: duplicates stay
    # as parallel edges; min relaxation is unaffected by parallel edges of
    # higher weight, and the oracle sees the same raw edge list.
    want = sssp_oracle(src, dst, w, nv, 0)
    np.testing.assert_array_equal(got, want)
