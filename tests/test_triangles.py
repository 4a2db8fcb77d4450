"""Triangle counting vs dense A²∘A oracle (exact)."""

import numpy as np
import pytest

from pregel_ray import fixtures
from pregel_ray.algorithms.triangles import triangle_counts, triangle_total

from tests.oracles import triangles_oracle


def run_triangles(tbl):
    import ray.data as rd

    per_v = triangle_counts(rd.from_arrow(tbl), num_buckets=8).to_pandas()
    e = tbl.to_pandas()
    n = int(max(e["src"].max(), e["dst"].max())) + 1
    total, want = triangles_oracle(e["src"].to_numpy(), e["dst"].to_numpy(), n)
    got = np.zeros(n, dtype=np.int64)
    if len(per_v):
        for vid, t in zip(per_v["vid"], per_v["triangles"]):
            got[int(vid)] = t
    return got, want, total


def test_triangle_plus_tail(ray_session):
    got, want, total = run_triangles(fixtures.g_triangle_plus_tail())
    assert total == 1
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got[:4], [1, 1, 1, 0])


def test_two_cliques_bridge(ray_session):
    got, want, total = run_triangles(fixtures.g_two_cliques_bridge())
    assert total == 8  # each 4-clique has C(4,3)=4 triangles
    np.testing.assert_array_equal(got, want)


def test_random_graph(ray_session):
    rng = np.random.default_rng(11)
    n = 60
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    tbl = fixtures.edge_table(list(zip(src.tolist(), dst.tolist())))
    got, want, total = run_triangles(tbl)
    np.testing.assert_array_equal(got, want)
    assert total == int(want.sum() // 3)


def test_no_triangles(ray_session):
    got, want, total = run_triangles(fixtures.g_line4())
    assert total == 0
    assert got.sum() == 0


def test_joined_degree_path_matches_broadcast(ray_session):
    """VERDICT r4 #3: with the degree-LUT broadcast forced off
    (threshold=0), the bucketed-join degree-attach path is value-identical
    on a random graph."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 50
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    tbl = fixtures.edge_table(list(zip(src.tolist(), dst.tolist())))
    bcast = (
        triangle_counts(rd.from_arrow(tbl), num_buckets=8)
        .to_pandas().sort_values("vid", ignore_index=True)
    )
    joined = (
        triangle_counts(rd.from_arrow(tbl), num_buckets=8,
                        broadcast_vertex_threshold=0)
        .to_pandas().sort_values("vid", ignore_index=True)
    )
    import pandas as pd
    pd.testing.assert_frame_equal(bcast, joined)
