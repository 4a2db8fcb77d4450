"""Resume from per-superstep checkpoints must be bit-identical to an
uninterrupted run (FIXTURES.md §5; north rule resumability)."""

import os
import shutil

import numpy as np

from pregel_ray import fixtures
from pregel_ray.algorithms import PageRank
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.testing import MicroGraph


def _final_ranks(res, g):
    vt = res.vertex_table().to_pandas()
    return g.result_by_id(vt, "rank")


def test_resume_bit_identical(ray_session, tmp_path):
    cfg = EngineConfig(num_parts=4, checkpoint_interval=3)
    g = MicroGraph(fixtures.g_two_cliques_bridge(), str(tmp_path / "s"), cfg)

    run_a = str(tmp_path / "run_a")
    res_a = Engine(g.shards, cfg).run(PageRank(max_iters=10), run_dir=run_a)
    ranks_a = _final_ranks(res_a, g)

    # interrupted run: same job, checkpoints kept only through superstep 6
    run_b = str(tmp_path / "run_b")
    res_b1 = Engine(g.shards, cfg).run(PageRank(max_iters=6), run_dir=run_b)
    # drop the "final" marker dir (max_iters=6 wrote superstep=6 as final)
    # then resume with the full iteration budget
    res_b2 = Engine(g.shards, cfg).run(PageRank(max_iters=10), run_dir=run_b, resume=True)
    ranks_b = _final_ranks(res_b2, g)

    assert res_b2.supersteps == 10
    np.testing.assert_array_equal(ranks_a, ranks_b)  # bit-identical

    # lineage + metrics artifacts exist for every committed superstep
    for k in (3, 6):
        d = os.path.join(run_a, f"superstep={k}")
        assert os.path.exists(os.path.join(d, "_SUCCESS"))
        assert os.path.isdir(os.path.join(d, "lineage"))
        assert os.path.exists(os.path.join(d, "metrics.json"))


def test_resume_skips_completed_supersteps(ray_session, tmp_path):
    cfg = EngineConfig(num_parts=4, checkpoint_interval=2)
    g = MicroGraph(fixtures.g_line4(), str(tmp_path / "s"), cfg, n_vertices=4)
    run = str(tmp_path / "run")
    Engine(g.shards, cfg).run(PageRank(max_iters=8), run_dir=run)
    # resume over a finished run: loop should fast-forward (superstep 9, 10)
    res = Engine(g.shards, cfg).run(PageRank(max_iters=10), run_dir=run, resume=True)
    assert res.history[0].superstep == 0  # history restored from checkpoint
    assert res.supersteps == 10


def test_lineage_hashes_stable(ray_session, tmp_path):
    import ray.data as rd

    cfg = EngineConfig(num_parts=4, checkpoint_interval=5)
    g = MicroGraph(fixtures.g_line4(), str(tmp_path / "s"), cfg, n_vertices=4)
    run1, run2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    Engine(g.shards, cfg).run(PageRank(max_iters=5), run_dir=run1)
    Engine(g.shards, cfg).run(PageRank(max_iters=5), run_dir=run2)
    # sort by the full identity: a part can carry several rows (state +
    # message chunks) and their block order is not part of the contract —
    # the guarantee is that the SET of blobs per (part, kind) is identical
    key = ["part", "kind", "sha256"]
    l1 = rd.read_parquet(f"{run1}/superstep=5/lineage").to_pandas().sort_values(key)
    l2 = rd.read_parquet(f"{run2}/superstep=5/lineage").to_pandas().sort_values(key)
    assert list(l1["sha256"]) == list(l2["sha256"])  # deterministic state blobs
