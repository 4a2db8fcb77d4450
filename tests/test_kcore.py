"""K-core BSP peeling vs an independent Python peeling oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pregel_ray import fixtures
from pregel_ray.algorithms.kcore import KCore
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.graph import UNDIRECTED
from pregel_ray.testing import MicroGraph


def kcore_oracle(src, dst, n, k):
    """Sequential peeling: (alive bool array, core-internal degrees)."""
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = np.ones(n, bool)
    while True:
        deg = np.array(
            [sum(alive[u] for u in adj[v]) if alive[v] else 0 for v in range(n)]
        )
        dead = alive & (deg < k)
        if not dead.any():
            return alive, deg
        alive &= ~dead


def _run(tbl, tmp_path, k, n_vertices=None, cfg=None):
    cfg = cfg or EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "shards"), cfg,
                   n_vertices=n_vertices, variant=UNDIRECTED)
    res = Engine(g.shards, cfg).run(KCore(k))
    return g, res, res.vertex_table().to_pandas()


@pytest.mark.parametrize("maker,n", [
    (fixtures.g_line4, 4),                 # no 2-core at all
    (fixtures.g_cycle3_isolate, 4),        # cycle = its own 2-core
    (fixtures.g_two_cliques_bridge, None),
    (fixtures.g_hub, None),
])
@pytest.mark.parametrize("k", [2, 3])
def test_kcore_micrographs(ray_session, tmp_path, maker, n, k):
    tbl = maker()
    e = tbl.to_pandas()
    nv = n or int(max(e["src"].max(), e["dst"].max())) + 1
    g, res, vt = _run(tbl, tmp_path, k, n_vertices=nv)
    want_alive, want_deg = kcore_oracle(
        e["src"].to_numpy(), e["dst"].to_numpy(), nv, k
    )
    got_alive = g.result_by_id(vt, "alive").astype(bool)
    got_deg = g.result_by_id(vt, "deg")
    assert res.converged
    np.testing.assert_array_equal(got_alive, want_alive)
    np.testing.assert_array_equal(got_deg[got_alive], want_deg[want_alive])


def test_kcore_random_graph(ray_session, tmp_path):
    rng = np.random.default_rng(17)
    n, m = 300, 1400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    tbl = pa.table(
        {"src": pa.array(src), "dst": pa.array(dst),
         "w": pa.array(np.ones(m))}
    )
    for k in (2, 4):
        g, res, vt = _run(tbl, tmp_path, k, n_vertices=n,
                          cfg=EngineConfig(num_parts=6))
        want_alive, want_deg = kcore_oracle(src, dst, n, k)
        got_alive = g.result_by_id(vt, "alive").astype(bool)
        got_deg = g.result_by_id(vt, "deg")
        np.testing.assert_array_equal(got_alive, want_alive)
        np.testing.assert_array_equal(got_deg[got_alive], want_deg[want_alive])
