"""Topology mutation (T1-T5, SURVEY.md §2.6): add/delete edge, add/delete
vertex applied at the superstep boundary in the reference's deterministic
order, with shard rebuild and message-drop semantics for tombstones."""

import numpy as np
import pyarrow as pa

from pregel_ray import fixtures
from pregel_ray.algorithms.compute_api import ComputeAlgorithm
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.testing import MicroGraph


def test_mutations_end_to_end(ray_session, tmp_path):
    # 0→1→2→3 plus isolate vertex 4
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=5)
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.delete_edge(V[0], V[1])      # break 0→1
            v.add_edge(V[0], V[3])         # new 0→3
            v.add_vertex(0.0)              # a brand-new vertex
            v.delete_vertex(V[4])          # tombstone the isolate
        if s == 2:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, 100.0)
        if s == 3:
            for m in v.pairs_messages():
                v.set_value(v.get_value() + m)
        v.vote_halt(s >= 3)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    eng = Engine(g.shards, cfg, graph_source=g.graph_source)
    res = eng.run(algo)
    assert res.converged

    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    vals = dict(zip(vt["vid"], vt["value"]))

    assert len(vals) == 6  # 5 original + 1 added
    assert vals[V[0]] == 3.0  # computed s1..s3, received nothing
    assert vals[V[1]] == 3.0  # 0→1 deleted before s2 sends → no message
    assert vals[V[2]] == 103.0  # 1→2 message
    assert vals[V[3]] == 203.0  # 2→3 and the NEW 0→3 edge
    assert vals[V[4]] == 1.0  # tombstoned after s1: never computed again
    new_vid = (set(vals) - set(V.values())).pop()
    assert vals[new_vid] == 2.0  # added after s1, computed s2+s3

    # engine vertex count grew; tombstone remains addressable but halted
    assert res.P == cfg.num_parts


def test_delete_vertex_with_edges_is_skipped(ray_session, tmp_path):
    """Cascading delete is NIY in the reference (vertex.lua:183) — a
    delete_vertex on a vertex with edges logs and skips."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.delete_vertex(V[1])  # v1 has edges → must be skipped
        v.vote_halt(s >= 2)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    res = Engine(g.shards, cfg, graph_source=g.graph_source).run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    vals = dict(zip(vt["vid"], vt["value"]))
    assert vals[V[1]] == 2.0  # kept computing: delete was refused
