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


def test_delete_vertex_drops_out_edges(ray_session, tmp_path):
    """Reference semantics (data_space:delete): the vertex tuple — and with
    it its inline OUT-edge list — is dropped; the cascading IN-edge delete
    stays NIY (vertex.lua:183). Deleting v1 of 0→1→2→3 must stop it
    computing AND remove 1→2, so v2 never hears from it."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.delete_vertex(V[1])
        if s == 2:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, 100.0)
        if s == 3:
            for m in v.pairs_messages():
                v.set_value(v.get_value() + m)
        v.vote_halt(s >= 3)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    res = Engine(g.shards, cfg, graph_source=g.graph_source).run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    vals = dict(zip(vt["vid"], vt["value"]))
    assert vals[V[1]] == 1.0  # tombstoned after s1: stopped computing
    assert vals[V[2]] == 3.0  # 1→2 cascade-deleted: no 100.0 received
    assert vals[V[3]] == 103.0  # 2→3 still delivers


def test_delete_vertex_cascade_in_edges(ray_session, tmp_path):
    """`delete_vertex(vid, edges=True)` — our extension of the flag the
    reference declares but leaves NIY (vertex.lua:183): the IN-edges are
    cascaded too. Deleting v2 of 0→1→2→3 with edges=True removes 1→2
    (in-edge) and 2→3 (out-edge): v1 keeps computing but its send hits a
    dropped edge, and v3 hears nothing."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.delete_vertex(V[2], edges=True)
        if s == 2:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, 100.0)
        if s == 3:
            for m in v.pairs_messages():
                v.set_value(v.get_value() + m)
        v.vote_halt(s >= 3)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    res = Engine(g.shards, cfg, graph_source=dict(g.graph_source)).run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    vals = dict(zip(vt["vid"], vt["value"]))
    assert vals[V[1]] == 103.0  # 0→1 still delivers
    assert vals[V[2]] == 1.0  # tombstoned after s1
    assert vals[V[3]] == 3.0  # 2→3 cascade-deleted with the vertex


def test_add_vertex_named_and_deduped(ray_session, tmp_path):
    """add_vertex with a user name (obtain_name contract): partition
    derives from the name hash; adding an existing name is skipped."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.add_vertex(7.0, name="extra")
            v.add_vertex(8.0, name="extra")  # dup name in same batch → skip
            v.add_vertex(9.0, name="v00000001")  # existing name → skip
        v.vote_halt(s >= 2)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    res = Engine(g.shards, cfg, graph_source=g.graph_source).run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    vals = dict(zip(vt["vid"], vt["value"]))
    assert len(vals) == 5  # exactly ONE vertex added
    new_vid = (set(vals) - set(V.values())).pop()
    # the survivor is the first add (value 7.0), computed at s2 only
    assert vals[new_vid] == 8.0

    # its partition derives from stable_hash("extra") % P
    from pregel_ray.edges import stable_hash

    assert new_vid % cfg.num_parts == int(
        stable_hash(np.array(["extra"], object))[0] % cfg.num_parts
    )


def test_delete_then_readd_name(ray_session, tmp_path):
    """Reference semantics: data_space:delete removes the vertex TUPLE, so
    its name is free again — delete-then-add of the same name succeeds with
    a fresh vid (ADVICE r2 engine.py:507). The tombstoned vid stays dead."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.delete_vertex(V[1])
        if s == 2 and v.get_name() == V[0]:
            v.add_vertex(5.0, name="v00000001")  # V[1]'s name, now free
        v.vote_halt(s >= 3)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    eng = Engine(g.shards, cfg, graph_source=dict(g.graph_source))
    res = eng.run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    vals = dict(zip(vt["vid"], vt["value"]))
    assert len(vals) == 5  # 4 original (one tombstoned) + 1 re-added
    new_vid = (set(vals) - set(V.values())).pop()
    assert new_vid != V[1]  # fresh vid, not the tombstoned slot
    assert vals[V[1]] == 1.0  # dead after s1
    assert vals[new_vid] == 6.0  # added at s2 boundary, computed s3
    # the vertices table keeps exactly ONE live row for the name
    import ray.data as rd
    names = rd.read_parquet(eng.graph_source["vertices_dir"]).to_pandas()
    rows = names[names["name"] == "v00000001"]
    assert len(rows) == 1 and int(rows["vid"].iloc[0]) == new_vid


def test_mutation_epoch_at_fixture_scale(ray_session, tmp_path):
    """VERDICT r2 #9: a mutation epoch on the transcript fixture graph
    (sf0.001: ~2.2k vertices / 8.5k edges — a real built graph, not a
    micro-graph): delete the top out-degree hub and add 10k edges sourced
    from two partitions. Asserts (a) the delta rebuild reuses every
    unaffected partition's shard+meta files by path and rebuilds exactly
    the affected ones, and (b) PageRank on the delta-rebuilt store is
    bit-identical to a from-scratch build of the mutated edge tables."""
    import ray.data as rd

    from pregel_ray.algorithms import PageRank
    from pregel_ray.edges import build_graph_tables, transcript_columns
    from pregel_ray.fixtures import transcripts_path
    from pregel_ray.graph import build_shards

    cfg = EngineConfig(num_parts=16, num_buckets=8)
    P = cfg.num_parts
    gdir = str(tmp_path / "g")
    ds = rd.read_parquet(transcripts_path(0.001), columns=transcript_columns())
    build_graph_tables(ds, gdir, cfg)
    edges = rd.read_parquet(f"{gdir}/edges").materialize()
    verts = rd.read_parquet(f"{gdir}/vertices").materialize()
    shards = build_shards(edges, verts, str(tmp_path / "shards"), cfg)

    e = edges.to_pandas()
    hub = int(e.groupby("src").size().idxmax())
    vids = verts.to_pandas()["vid"].to_numpy()
    # directed affected set = SOURCE parts: sample all 10k new-edge sources
    # from parts {0,1}, dsts anywhere live (excluding the hub, which is
    # tombstoned before the adds are validated)
    src_pool = vids[((vids % P) <= 1) & (vids != hub)]
    dst_pool = vids[vids != hub]
    assert len(np.unique(src_pool % P)) == 2  # both parts really sampled
    rng = np.random.RandomState(7)
    new_pairs = list(
        zip(
            rng.choice(src_pool, 10_000).tolist(),
            rng.choice(dst_pool, 10_000).tolist(),
        )
    )
    driver_vid = int(src_pool.min())

    def compute(v):
        s = v.get_superstep()
        if s == 1 and v.get_name() == driver_vid:
            v.delete_vertex(hub)
            for sv, dv in new_pairs:
                v.add_edge(sv, dv)
        v.vote_halt(s >= 2)

    gs = {
        "edges_dir": f"{gdir}/edges",
        "vertices_dir": f"{gdir}/vertices",
        "work_dir": str(tmp_path / "mut"),
    }
    eng = Engine(shards, cfg, graph_source=gs)
    res = eng.run(ComputeAlgorithm(compute=compute, initial_value=0.0))
    assert res.converged

    # (a) delta rebuild: exactly the affected parts point into the epoch
    # dir, every other part reuses the original epoch's immutable files
    expected_affected = {0, 1, hub % P}
    sh = eng.shards
    for srow in sh.shards:
        in_epoch = "epoch1" in srow["path"]
        assert in_epoch == (srow["part"] in expected_affected), srow
    for p, mp in sh.meta_paths.items():
        assert ("epoch1" in mp) == (p in expected_affected), (p, mp)
    assert sh.n_edges == shards.n_edges - int((e["src"] == hub).sum()) + 10_000

    # (b) PageRank parity: delta store vs a from-scratch build of the
    # mutated epoch tables (same vids: tombstones keep their rows)
    cfg_pr = EngineConfig(num_parts=16, num_buckets=8, executor="actors")
    e2 = rd.read_parquet(gs["edges_dir"]).materialize()
    v2 = rd.read_parquet(gs["vertices_dir"]).materialize()
    scratch = build_shards(e2, v2, str(tmp_path / "shards2"), cfg_pr)
    r_delta = Engine(sh, cfg_pr).run(PageRank())
    r_scratch = Engine(scratch, cfg_pr).run(PageRank())
    assert r_delta.converged and r_scratch.converged
    td = r_delta.vertex_table().to_pandas().sort_values("vid", ignore_index=True)
    ts = r_scratch.vertex_table().to_pandas().sort_values("vid", ignore_index=True)
    assert (td["vid"] == ts["vid"]).all()
    np.testing.assert_allclose(td["rank"], ts["rank"], atol=0)  # bit-identical


def test_mutation_survives_checkpoint_resume(ray_session, tmp_path):
    """A run that mutated topology, checkpointed, and is resumed by a FRESH
    Engine built from the ORIGINAL ShardSet must continue on the mutated
    graph (checkpoint engine_meta carries the shard epoch + tombstones)."""
    tbl = fixtures.g_line4()

    def make(workdir):
        cfg = EngineConfig(num_parts=4, checkpoint_interval=1)
        return cfg, MicroGraph(tbl, workdir, cfg, n_vertices=4)

    def compute(v):
        s = v.get_superstep()
        v.set_value(v.get_value() + 1)
        if s == 1 and v.get_name() == V[0]:
            v.delete_edge(V[0], V[1])
            v.add_edge(V[0], V[3])
        if s == 3:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, 100.0)
        if s == 4:
            for m in v.pairs_messages():
                v.set_value(v.get_value() + m)
        v.vote_halt(s >= 4)

    # uninterrupted reference run
    cfg, g = make(str(tmp_path / "sA"))
    V = {i: int(v) for i, v in zip(g.ids, g.vid_of)}
    algo = ComputeAlgorithm(compute=compute, initial_value=0.0)
    res_a = Engine(g.shards, cfg, graph_source=dict(g.graph_source)).run(
        algo, run_dir=str(tmp_path / "runA")
    )
    vals_a = dict(
        zip(*ComputeAlgorithm.values_from_state(res_a.state, cfg.num_parts)
            .to_pandas()[["vid", "value"]].T.values)
    )
    assert vals_a[V[3]] == 204.0  # got 2→3 AND the new 0→3

    # interrupted: run 2 supersteps (mutation applied at s1 boundary), then
    # resume with a FRESH engine pointed at the ORIGINAL shards
    cfg2, g2 = make(str(tmp_path / "sB"))
    V = {i: int(v) for i, v in zip(g2.ids, g2.vid_of)}
    algo2 = ComputeAlgorithm(compute=compute, initial_value=0.0)
    cfg_short = EngineConfig(num_parts=4, checkpoint_interval=1, max_supersteps=2)
    Engine(g2.shards, cfg_short, graph_source=dict(g2.graph_source)).run(
        algo2, run_dir=str(tmp_path / "runB")
    )
    res_b = Engine(g2.shards, cfg2, graph_source=dict(g2.graph_source)).run(
        ComputeAlgorithm(compute=compute, initial_value=0.0),
        run_dir=str(tmp_path / "runB"), resume=True,
    )
    vals_b = dict(
        zip(*ComputeAlgorithm.values_from_state(res_b.state, cfg2.num_parts)
            .to_pandas()[["vid", "value"]].T.values)
    )
    assert vals_b[V[3]] == 204.0  # resumed on the MUTATED graph
    assert vals_b[V[1]] == 4.0  # 0→1 stayed deleted after resume
