"""Raw-actor superstep executor (EngineConfig.executor="actors") must be
bit-identical to the Dataset executor: same scatter/apply/combine code
runs per partition, inbox chunks combine in the same producing-shard
order, metrics fold in part order. Covered here: vectorized algorithms
(PageRank incl. hub-split, CC, SSSP), the per-vertex compute API
(combiner + aggregators), cross-executor checkpoint resume, and boundary
topology mutations."""

import numpy as np
import pytest

from pregel_ray import fixtures
from pregel_ray.algorithms import PageRank
from pregel_ray.algorithms.cc import ConnectedComponents
from pregel_ray.algorithms.compute_api import Aggregator, ComputeAlgorithm
from pregel_ray.algorithms.sssp import ShortestPaths
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.graph import UNDIRECTED
from pregel_ray.testing import MicroGraph


def _cfg(**kw):
    return EngineConfig(num_parts=4, **kw)


def _history_equal(ra, rb):
    assert len(ra.history) == len(rb.history)
    for ma, mb in zip(ra.history, rb.history):
        assert (ma.superstep, ma.active, ma.nmsg) == (mb.superstep, mb.active, mb.nmsg)
        assert (ma.m1, ma.m2) == (mb.m1, mb.m2)


def test_pagerank_actor_executor_bit_identical(ray_session, tmp_path):
    tbl = fixtures.g_two_cliques_bridge()
    g = MicroGraph(tbl, str(tmp_path / "s"), _cfg())
    res_d = Engine(g.shards, _cfg()).run(PageRank(max_iters=12))
    res_a = Engine(g.shards, _cfg(executor="actors")).run(PageRank(max_iters=12))
    assert res_a.supersteps == res_d.supersteps == 12
    got_d = g.result_by_id(res_d.vertex_table().to_pandas(), "rank")
    got_a = g.result_by_id(res_a.vertex_table().to_pandas(), "rank")
    np.testing.assert_array_equal(got_a, got_d)
    _history_equal(res_a, res_d)


def test_presum_push_parity(ray_session, tmp_path):
    """Opt-in sender-side cross-shard combine (cfg.presum_push): PageRank
    matches the default path to float-regrouping precision (allclose
    1e-12, NOT bitwise — the reason it's opt-in), LPA exactly (its
    weights are integer-valued counts, summed exactly in float64)."""
    from pregel_ray.algorithms.lpa import LabelPropagation

    tbl = fixtures.g_two_cliques_bridge()
    g = MicroGraph(tbl, str(tmp_path / "s"), _cfg())
    res_d = Engine(g.shards, _cfg()).run(PageRank(max_iters=12))
    res_p = Engine(
        g.shards, _cfg(executor="actors", actor_workers=2, presum_push=True)
    ).run(PageRank(max_iters=12))
    got_d = g.result_by_id(res_d.vertex_table().to_pandas(), "rank")
    got_p = g.result_by_id(res_p.vertex_table().to_pandas(), "rank")
    np.testing.assert_allclose(got_p, got_d, rtol=0, atol=1e-12)
    assert res_p.supersteps == res_d.supersteps

    gu = MicroGraph(tbl, str(tmp_path / "u"), _cfg(), variant=UNDIRECTED)
    res_dl = Engine(gu.shards, _cfg()).run(LabelPropagation(max_iters=10))
    res_pl = Engine(
        gu.shards, _cfg(executor="actors", actor_workers=2, presum_push=True)
    ).run(LabelPropagation(max_iters=10))
    np.testing.assert_array_equal(
        gu.result_by_id(res_pl.vertex_table().to_pandas(), "label"),
        gu.result_by_id(res_dl.vertex_table().to_pandas(), "label"),
    )


def test_pagerank_actor_hub_split_and_convergence(ray_session, tmp_path):
    """Hub-split sub-shards (fanned to child tasks by their owning actor,
    gid-ordered collection) and tolerance-based convergence must match the
    Dataset executor exactly."""
    tbl = fixtures.g_hub()
    # min_edges=0 forces the CHILD-TASK path (production gates it on
    # partition edge volume) so the parallel path stays covered
    cfg_split = _cfg(max_edges_per_shard=16, parallel_scatter_min_edges=0)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg_split)
    assert any(len(v) > 1 for v in g.shards.shards_of_part.values())
    res_d = Engine(g.shards, cfg_split).run(PageRank(tol=1e-10))
    res_a = Engine(
        g.shards, _cfg(max_edges_per_shard=16, executor="actors",
                       parallel_scatter_min_edges=0)
    ).run(PageRank(tol=1e-10))
    assert res_a.converged and res_a.supersteps == res_d.supersteps
    got_d = g.result_by_id(res_d.vertex_table().to_pandas(), "rank")
    got_a = g.result_by_id(res_a.vertex_table().to_pandas(), "rank")
    np.testing.assert_array_equal(got_a, got_d)


@pytest.mark.parametrize("algo_maker,variant,col", [
    (lambda g: ConnectedComponents(), UNDIRECTED, "label"),
    (lambda g: ShortestPaths(source_vid=int(g.vid_of[0])), None, "dist"),
    (lambda g: __import__("pregel_ray.algorithms.kcore",
                          fromlist=["KCore"]).KCore(2), UNDIRECTED, "alive"),
])
def test_vectorized_algos_actor_parity(ray_session, tmp_path, algo_maker, variant, col):
    tbl = fixtures.g_two_cliques_bridge()
    kw = {"variant": variant} if variant else {}
    g = MicroGraph(tbl, str(tmp_path / "s"), _cfg(), **kw)
    algo_maker0 = algo_maker
    algo_maker = lambda: algo_maker0(g)  # noqa: E731
    res_d = Engine(g.shards, _cfg()).run(algo_maker())
    res_a = Engine(g.shards, _cfg(executor="actors")).run(algo_maker())
    assert res_a.converged == res_d.converged
    assert res_a.supersteps == res_d.supersteps
    np.testing.assert_array_equal(
        g.result_by_id(res_a.vertex_table().to_pandas(), col),
        g.result_by_id(res_d.vertex_table().to_pandas(), col),
    )
    _history_equal(res_a, res_d)


def test_compute_api_actor_parity(ray_session, tmp_path):
    """Per-vertex API under the actor pool: combiner folds map-side AND at
    delivery, aggregators merge at the barrier and read at S+1."""
    from tests.test_compute_api import maxval_compute

    rng = np.random.default_rng(9)
    init_vals = rng.integers(0, 1000, 64).astype(float)
    tbl = fixtures.g_two_cliques_bridge()
    g = MicroGraph(tbl, str(tmp_path / "s"), _cfg())

    def make_algo():
        return ComputeAlgorithm(
            compute=maxval_compute,
            initial_value=lambda vid: float(init_vals[vid % len(init_vals)]),
            combiner=max,
            aggregators={"seen_max": Aggregator(default=0.0, reduce=max)},
        )

    res_d = Engine(g.shards, _cfg()).run(make_algo())
    res_a = Engine(g.shards, _cfg(executor="actors")).run(make_algo())
    assert res_a.converged and res_a.supersteps == res_d.supersteps
    vt_d = ComputeAlgorithm.values_from_state(res_d.state, 4).to_pandas()
    vt_a = ComputeAlgorithm.values_from_state(res_a.state, 4).to_pandas()
    d = dict(zip(vt_d["vid"], vt_d["value"]))
    a = dict(zip(vt_a["vid"], vt_a["value"]))
    assert a == d
    _history_equal(res_a, res_d)


def test_cross_executor_checkpoint_resume(ray_session, tmp_path):
    """A run checkpointed under one executor resumes under the other —
    the state datasets are the same CHUNK_SCHEMA rows — and the final
    ranks are bit-identical to an uninterrupted Dataset run."""
    g = MicroGraph(fixtures.g_two_cliques_bridge(), str(tmp_path / "s"),
                   _cfg(checkpoint_interval=3))
    base = Engine(g.shards, _cfg()).run(PageRank(max_iters=10))
    want = g.result_by_id(base.vertex_table().to_pandas(), "rank")

    # actors → dataset
    run1 = str(tmp_path / "run1")
    Engine(g.shards, _cfg(checkpoint_interval=3, executor="actors")).run(
        PageRank(max_iters=6), run_dir=run1
    )
    res1 = Engine(g.shards, _cfg(checkpoint_interval=3)).run(
        PageRank(max_iters=10), run_dir=run1, resume=True
    )
    assert res1.supersteps == 10
    np.testing.assert_array_equal(
        g.result_by_id(res1.vertex_table().to_pandas(), "rank"), want
    )

    # dataset → actors
    run2 = str(tmp_path / "run2")
    Engine(g.shards, _cfg(checkpoint_interval=3)).run(
        PageRank(max_iters=6), run_dir=run2
    )
    res2 = Engine(g.shards, _cfg(checkpoint_interval=3, executor="actors")).run(
        PageRank(max_iters=10), run_dir=run2, resume=True
    )
    assert res2.supersteps == 10
    np.testing.assert_array_equal(
        g.result_by_id(res2.vertex_table().to_pandas(), "rank"), want
    )


def test_mutations_actor_parity(ray_session, tmp_path):
    """Boundary mutations under the actor pool: state is pulled out of the
    actors, applied through the shared Dataset-native delta rebuild, and a
    fresh pool loads the new epoch — same results as the Dataset executor
    (mirrors test_mutations_end_to_end)."""
    tbl = fixtures.g_line4()
    cfg = _cfg(executor="actors")
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=5)
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.delete_edge(V[0], V[1])
            v.add_edge(V[0], V[3])
            v.add_vertex(0.0)
            v.delete_vertex(V[4])
        if s == 2:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, 100.0)
        if s == 3:
            for m in v.pairs_messages():
                v.set_value(v.get_value() + m)
        v.vote_halt(s >= 3)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    res = Engine(g.shards, cfg, graph_source=g.graph_source).run(algo)
    assert res.converged
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    vals = dict(zip(vt["vid"], vt["value"]))
    assert len(vals) == 6
    assert vals[V[0]] == 3.0
    assert vals[V[1]] == 3.0
    assert vals[V[2]] == 103.0
    assert vals[V[3]] == 203.0
    assert vals[V[4]] == 1.0
    new_vid = (set(vals) - set(V.values())).pop()
    assert vals[new_vid] == 2.0


def test_pool_size_per_node_cap(ray_session):
    """Default pool = min(P, cpus-2, per_node_cap × nodes); explicit
    actor_workers still overrides (r5 sweep: BENCH/BASELINE.md)."""
    from types import SimpleNamespace

    from pregel_ray.actor_loop import _pool_size

    def eng(P, workers=None, cap=10):
        return SimpleNamespace(
            cfg=SimpleNamespace(actor_workers=workers, actor_workers_per_node=cap),
            shards=SimpleNamespace(P=P),
        )

    import ray as _r

    cpus = int(_r.cluster_resources().get("CPU", 4))
    # cap=1 on one node → exactly 1 worker regardless of cpus
    assert _pool_size(eng(64, cap=1)) == 1
    # huge cap → falls back to cpus-2 (bounded by P)
    assert _pool_size(eng(64, cap=10_000)) == max(1, min(64, cpus - 2))
    # explicit actor_workers wins over the cap
    assert _pool_size(eng(64, workers=3, cap=1)) == 3
