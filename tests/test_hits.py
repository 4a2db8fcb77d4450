"""HITS doubled-graph reduction vs a straight-NumPy simultaneous-update
oracle (trajectory parity at atol 1e-9)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pregel_ray.algorithms.hits import HITS
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.graph import DIRECTED, build_shards
from pregel_ray.pipelines import hits_double_edges, hits_double_verts


def hits_oracle(src, dst, w, n, iters):
    """Simultaneous synchronous HITS: both vectors update from the
    PREVIOUS (h, a); inputs normalized, outputs normalized at the end."""
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(iters):
        nh, na = np.linalg.norm(h), np.linalg.norm(a)
        a_new = np.zeros(n)
        np.add.at(a_new, dst, w * h[src])
        h_new = np.zeros(n)
        np.add.at(h_new, src, w * a[dst])
        a, h = a_new / nh, h_new / na
    return h / np.linalg.norm(h), a / np.linalg.norm(a)


def _run(src, dst, w, n, iters, tmp_path, P=4):
    """Vertices get vid == original id (ids 0..n-1 dense, part = id % P),
    so the doubled-graph copy formulas apply directly."""
    cfg = EngineConfig(num_parts=P)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "w": pa.array(w, pa.float64())})
    ).map_batches(hits_double_edges(P), batch_format="pyarrow")
    verts = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(n))})
    ).map_batches(hits_double_verts(P), batch_format="pyarrow")
    ss = build_shards(edges, verts, str(tmp_path / "hits_shards"), cfg,
                      variant=DIRECTED)
    res = Engine(ss, cfg).run(HITS(max_iters=iters))
    last = res.history[-1]
    inv_h = 1.0 / np.sqrt(last.m1) if last.m1 > 0 else 0.0
    inv_a = 1.0 / np.sqrt(last.m2) if last.m2 > 0 else 0.0
    vt = res.vertex_table().to_pandas()
    vid = vt["vid"].to_numpy()
    local = vid // P
    hub = (local % 2) == 0
    orig = (local // 2) * P + vid % P
    val = vt["value"].to_numpy()
    h = np.zeros(n)
    a = np.zeros(n)
    h[orig[hub]] = val[hub] * inv_h
    a[orig[~hub]] = val[~hub] * inv_a
    assert res.supersteps == iters
    return h, a


def test_hits_random_graph(ray_session, tmp_path):
    rng = np.random.default_rng(31)
    n, m = 120, 600
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, 5, m).astype(float)
    got_h, got_a = _run(src, dst, w, n, iters=8, tmp_path=tmp_path)
    want_h, want_a = hits_oracle(src, dst, w, n, iters=8)
    np.testing.assert_allclose(got_h, want_h, atol=1e-9)
    np.testing.assert_allclose(got_a, want_a, atol=1e-9)
    # sanity: scores are unit-norm distributions with mass on hubs
    assert abs(np.linalg.norm(got_h) - 1) < 1e-9
    assert abs(np.linalg.norm(got_a) - 1) < 1e-9


def test_hits_star_graph(ray_session, tmp_path):
    """Star u0 → {v1..v5}: u0 is the sole hub, leaves are the
    authorities."""
    src = np.zeros(5, np.int64)
    dst = np.arange(1, 6)
    w = np.ones(5)
    h, a = _run(src, dst, w, 6, iters=6, tmp_path=tmp_path)
    assert h[0] == pytest.approx(1.0)
    np.testing.assert_allclose(a[1:], 1 / np.sqrt(5), atol=1e-9)
    assert a[0] == 0 and np.allclose(h[1:], 0)
