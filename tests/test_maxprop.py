"""Vectorized MaxProp (VERDICT r4 #7): parity vs the per-vertex
compute-API conformance twin and vs a numpy fixpoint oracle."""

import numpy as np
import pandas as pd
import pytest


def _maxprop_oracle(src, dst, init):
    """Fixpoint of val[d] = max(val[d], max over in-edges of val[s])."""
    val = init.copy()
    for _ in range(len(init) + 1):
        new = val.copy()
        np.maximum.at(new, dst, val[src])
        if np.array_equal(new, val):
            break
        val = new
    return val


def test_maxprop_vs_oracle(ray_session, tmp_path):
    from pregel_ray import fixtures
    from pregel_ray.algorithms.maxprop import MaxProp
    from pregel_ray.config import EngineConfig
    from pregel_ray.engine import Engine
    from pregel_ray.testing import MicroGraph

    rng = np.random.default_rng(3)
    n = 40
    src = rng.integers(0, n, 150)
    dst = rng.integers(0, n, 150)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    tbl = fixtures.edge_table(list(zip(src.tolist(), dst.tolist())))
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "shards"), cfg, n_vertices=n)
    res = Engine(g.shards, cfg).run(MaxProp())
    vt = res.vertex_table().to_pandas()
    got = g.result_by_id(vt, "val")  # indexed by original id
    assert res.converged
    # default init = own engine VID; oracle over original ids with
    # init(id) = vid(id) via the MicroGraph mapping
    init = g.vid_of.astype(np.int64)  # ids are 0..n-1 in order
    want = _maxprop_oracle(src, dst, init)
    np.testing.assert_array_equal(got, want)


def test_maxprop_pipeline_parity_compute_api(ray_session):
    """Fast path == compute-API twin, value-identical, at fixture scale."""
    from pregel_ray.pipelines import maxprop_ranks, maxprop_ranks_compute_api

    sf = "/root/testdata/sf0.001"
    fast = maxprop_ranks(sf).to_pandas().sort_values("name", ignore_index=True)
    slow = (
        maxprop_ranks_compute_api(sf)
        .to_pandas().sort_values("name", ignore_index=True)
    )
    pd.testing.assert_frame_equal(fast, slow)
