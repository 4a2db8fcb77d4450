"""PageRank engine vs NumPy power-iteration oracle (allclose 1e-6)."""

import numpy as np
import pytest

from pregel_ray import fixtures
from pregel_ray.algorithms import PageRank
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.testing import MicroGraph

from tests.oracles import pagerank_oracle


def run_pagerank(tbl, tmp_path, n_vertices=None, cfg=None, fixed_iters=12, **pr_kwargs):
    """Fixed-iteration trajectory parity: engine after K supersteps must match
    the oracle after K power iterations (stronger than fixed-point parity,
    and fast enough for CI; full convergence covered once below)."""
    cfg = cfg or EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "shards"), cfg, n_vertices=n_vertices)
    eng = Engine(g.shards, cfg)
    res = eng.run(PageRank(max_iters=fixed_iters, **pr_kwargs))
    vt = res.vertex_table().to_pandas()
    got = g.result_by_id(vt, "rank")
    e = tbl.to_pandas()
    n = n_vertices or int(max(e["src"].max(), e["dst"].max())) + 1
    want = pagerank_oracle(e["src"], e["dst"], e["w"], n, fixed_iters=fixed_iters)
    return got, want, res, g


@pytest.mark.parametrize(
    "maker,n",
    [
        (fixtures.g_line4, 4),
        (fixtures.g_cycle3_isolate, 4),
        (fixtures.g_triangle_plus_tail, None),
        (fixtures.g_two_cliques_bridge, None),
    ],
)
def test_pagerank_micrographs(ray_session, tmp_path, maker, n):
    got, want, res, _ = run_pagerank(maker(), tmp_path, n_vertices=n)
    assert res.supersteps == 12
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9  # rank mass conserved


def test_pagerank_hub_split_equals_unsplit(ray_session, tmp_path):
    """Skew path: forcing sub-shard splits must not change the result."""
    tbl = fixtures.g_hub()
    # min_edges=0 forces the CHILD-TASK scatter path (production gates it
    # on partition edge volume) so the parallel path stays covered
    cfg_split = EngineConfig(num_parts=4, max_edges_per_shard=16,
                             parallel_scatter_min_edges=0)
    got_split, want, _, g = run_pagerank(tbl, tmp_path / "a", cfg=cfg_split)
    assert any(len(v) > 1 for v in g.shards.shards_of_part.values()), "split not exercised"
    got_plain, _, _, _ = run_pagerank(tbl, tmp_path / "b")
    np.testing.assert_allclose(got_split, want, atol=1e-9)
    np.testing.assert_allclose(got_split, got_plain, atol=0)


def test_pagerank_chained_supersteps_identical(ray_session, tmp_path):
    """Opt-in superstep chaining (K supersteps as one lazy plan, cross-step
    globals through the mailbox) must be BIT-identical to the per-step
    barrier on a fixed-iteration run — including a chunk-clipping K that
    does not divide the iteration count."""
    tbl = fixtures.g_two_cliques_bridge()
    got_k1, want, res1, _ = run_pagerank(tbl, tmp_path / "k1", fixed_iters=12)
    got_k5, _, res5, _ = run_pagerank(
        tbl, tmp_path / "k5",
        cfg=EngineConfig(num_parts=4, chain_supersteps=5), fixed_iters=12,
    )
    assert res1.supersteps == res5.supersteps == 12
    np.testing.assert_allclose(got_k5, got_k1, atol=0)  # bit-identical
    np.testing.assert_allclose(got_k5, want, atol=1e-9)
    # per-step metrics (from the in-flow mailbox resolution) also agree
    for m1, m5 in zip(res1.history, res5.history):
        assert (m1.superstep, m1.active, m1.nmsg) == (m5.superstep, m5.active, m5.nmsg)
        np.testing.assert_allclose([m1.m1, m1.m2], [m5.m1, m5.m2], atol=0)


def test_pagerank_chained_tol_convergence_exact(ray_session, tmp_path):
    """Tolerance-stopped chaining: when convergence lands mid-chunk the
    engine replays the chunk clipped at the converged step, so the chained
    result is BIT-identical to the per-step barrier — not K-1 extra
    refinement steps (ADVICE r2 engine.py:762)."""
    tbl = fixtures.g_two_cliques_bridge()
    cfg1 = EngineConfig(num_parts=4)
    g1 = MicroGraph(tbl, str(tmp_path / "s1"), cfg1)
    res1 = Engine(g1.shards, cfg1).run(PageRank(tol=1e-4))
    assert res1.converged
    S = res1.supersteps
    K = 5 if S % 5 else 4  # guarantee convergence mid-chunk (overshoot path)
    assert S % K != 0
    cfgK = EngineConfig(num_parts=4, chain_supersteps=K)
    gK = MicroGraph(tbl, str(tmp_path / "sK"), cfgK)
    resK = Engine(gK.shards, cfgK).run(PageRank(tol=1e-4))
    assert resK.converged and resK.supersteps == S
    got1 = g1.result_by_id(res1.vertex_table().to_pandas(), "rank")
    gotK = gK.result_by_id(resK.vertex_table().to_pandas(), "rank")
    np.testing.assert_allclose(gotK, got1, atol=0)  # bit-identical


def test_pagerank_transcript_graph(ray_session, tmp_path, tiny_transcripts):
    import ray.data as rd

    from pregel_ray.edges import build_graph_tables
    from pregel_ray.graph import build_shards

    cfg = EngineConfig(num_parts=8, num_buckets=4)
    gdir = str(tmp_path / "g")
    build_graph_tables(rd.from_arrow(tiny_transcripts), gdir, cfg)
    edges = rd.read_parquet(f"{gdir}/edges").materialize()
    verts = rd.read_parquet(f"{gdir}/vertices").materialize()
    shards = build_shards(edges, verts, str(tmp_path / "shards"), cfg)
    res = Engine(shards, cfg).run(PageRank())
    assert res.converged

    e = edges.to_pandas()
    vdf = verts.to_pandas().sort_values("vid")
    # oracle over dense positions: vids are sparse (rank*P+part); remap
    vids = vdf["vid"].to_numpy()
    pos = {v: i for i, v in enumerate(vids)}
    want = pagerank_oracle(
        e["src"].map(pos).to_numpy(), e["dst"].map(pos).to_numpy(), e["w"], len(vids)
    )
    vt = res.vertex_table().to_pandas()
    got = np.zeros(len(vids))
    got[[pos[v] for v in vt["vid"]]] = vt["rank"]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_personalized_pagerank_micrographs(ray_session, tmp_path):
    """PPR trajectory parity vs the straight-NumPy oracle (atol 1e-9),
    sources chosen to include a dangling-adjacent vertex."""
    from pregel_ray.algorithms.pagerank import PersonalizedPageRank
    from pregel_ray.config import EngineConfig
    from pregel_ray.engine import Engine
    from pregel_ray.testing import MicroGraph

    from tests.oracles import ppr_oracle

    for maker, n in [(fixtures.g_line4, 4), (fixtures.g_hub, None)]:
        tbl = maker()
        e = tbl.to_pandas()
        nv = n or int(max(e["src"].max(), e["dst"].max())) + 1
        cfg = EngineConfig(num_parts=4)
        g = MicroGraph(tbl, str(tmp_path / f"s{nv}"), cfg, n_vertices=nv)
        src_ids = [0, min(2, nv - 1)]
        src_vids = [int(g.vid_of[i]) for i in src_ids]
        res = Engine(g.shards, cfg).run(
            PersonalizedPageRank(src_vids, max_iters=12)
        )
        got = g.result_by_id(res.vertex_table().to_pandas(), "rank")
        want = ppr_oracle(e["src"], e["dst"], e["w"], nv, src_ids,
                          fixed_iters=12)
        np.testing.assert_allclose(got, want, atol=1e-9)
        assert abs(got.sum() - 1.0) < 1e-9  # PPR stays a distribution
