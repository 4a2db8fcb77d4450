"""Reference-conformance: per-vertex compute API running the reference's
example algorithm (max-value propagation, combiner max, vote-to-halt;
/root/reference/example/test-worker.lua:25-43, common.lua:23-39)."""

import numpy as np
import pytest

from pregel_ray import fixtures
from pregel_ray.algorithms.compute_api import Aggregator, ComputeAlgorithm
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.testing import MicroGraph


def maxval_compute(v):
    if v.get_superstep() == 1:
        for _, dst, _ in v.pairs_edges():
            v.send_message(dst, v.get_value())
    else:
        changed = False
        for m in v.pairs_messages():
            if m > v.get_value():
                v.set_value(m)
                changed = True
        if changed:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, v.get_value())
    v.set_aggregation("seen_max", v.get_value())
    v.vote_halt(True)


def maxval_oracle(src, dst, init, iters=100):
    """Fixpoint of directed max propagation."""
    val = np.array(init, dtype=float)
    for _ in range(iters):
        new = val.copy()
        for s, d in zip(src, dst):
            if val[s] > new[d]:
                new[d] = val[s]
        if np.array_equal(new, val):
            break
        val = new
    return val


@pytest.fixture()
def seeded_values():
    rng = np.random.default_rng(9)
    return rng.integers(0, 1000, 64).astype(float)


def test_maxval_conformance(ray_session, tmp_path, seeded_values):
    tbl = fixtures.g_two_cliques_bridge()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg)
    init = seeded_values[: len(g.ids)]
    vals_by_vid = {int(v): float(init[i]) for i, v in enumerate(g.vid_of)}

    algo = ComputeAlgorithm(
        compute=maxval_compute,
        initial_value=lambda vid: vals_by_vid[vid],
        combiner=max,
        aggregators={"seen_max": Aggregator(default=-1e18, reduce=max)},
    )
    res = Engine(g.shards, cfg).run(algo)
    assert res.converged, "vote-to-halt termination failed"

    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    got = g.result_by_id(vt, "value")
    e = tbl.to_pandas()
    want = maxval_oracle(e["src"], e["dst"], init[: len(g.ids)])
    np.testing.assert_array_equal(got, want)
    # bridge graph is strongly connected both ways → global max everywhere
    assert (got == init[: len(g.ids)].max()).all()


def test_maxval_directed_line(ray_session, tmp_path):
    """On 0→1→2→3 the max only flows downstream."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    init = {int(g.vid_of[i]): v for i, v in enumerate([5.0, 9.0, 1.0, 0.0])}
    algo = ComputeAlgorithm(
        compute=maxval_compute, initial_value=lambda vid: init[vid], combiner=max,
        aggregators={"seen_max": Aggregator(default=-1e18, reduce=max)},
    )
    res = Engine(g.shards, cfg).run(algo)
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    got = g.result_by_id(vt, "value")
    np.testing.assert_array_equal(got, [5.0, 9.0, 9.0, 9.0])
    assert res.converged


def test_vote_to_halt_superstep_count(ray_session, tmp_path):
    """All vertices halt instantly and send nothing → terminate after the
    superstep that discovers quiescence (reference master.lua:77-84)."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    algo = ComputeAlgorithm(compute=lambda v: v.vote_halt(True), initial_value=0.0)
    res = Engine(g.shards, cfg).run(algo)
    assert res.converged and res.supersteps == 1


def test_worker_context_persists(ray_session, tmp_path):
    """Reference parity (vertex.lua:211-213, worker.lua:378): the worker
    context is a per-worker MUTABLE object — a mutation made at superstep S
    must be observable at S+1 (and by later vertices of the same partition
    within S). Here worker = partition; every vertex lands in one partition
    with num_parts-aligned names, so counts are deterministic."""
    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=1)  # one worker → one shared context
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)

    def compute(v):
        s = v.get_superstep()
        wc = v.get_worker_context()
        wc["seen"] = wc.get("seen", 0) + 1  # mutate the shared object
        if s == 2:
            # superstep 1 saw all 4 vertices; this vertex may also see
            # earlier same-superstep mutations (reference: immediate
            # local visibility) — so the floor is 4 + 1 (its own)
            assert wc["seen"] >= 5, wc
            v.set_value(float(wc["seen"]))
        v.vote_halt(s >= 2)

    algo = ComputeAlgorithm(compute=compute, initial_value=0.0,
                            worker_context={})
    res = Engine(g.shards, cfg).run(algo)
    assert res.converged and res.supersteps == 2
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    # last computed vertex of superstep 2 saw all 8 mutations (4/superstep)
    assert vt["value"].max() == 8.0


def test_write_solution_compute_algorithm(ray_session, tmp_path):
    """S13 write_solution must work for per-vertex-API runs too: pickled
    state decodes through Algorithm.decode_state instead of crashing on
    the raw blob columns."""
    import ray.data as rd

    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    algo = ComputeAlgorithm(compute=lambda v: (v.set_value(1.5), v.vote_halt(True)),
                            initial_value=0.0)
    res = Engine(g.shards, cfg).run(algo)
    out = str(tmp_path / "solution")
    res.write_solution(out)
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 4
    assert set(back.columns) == {"vid", "value", "halted"}
    assert (back["value"] == 1.5).all() and back["halted"].all()


def test_aggregator_available_next_superstep(ray_session, tmp_path):
    """Aggregator reads must see the PREVIOUS superstep's merged value
    (reference README.md:276-279): superstep 1 reads the default, superstep 2
    reads the sum of superstep 1's contributions."""

    def compute(v):
        s = v.get_superstep()
        v.set_aggregation("count", 1)
        if s == 1:
            v.set_value(v.get_aggregation("count"))  # default: 0
        if s == 2:
            v.set_value(v.get_aggregation("count"))  # merged from s1: 4
        v.vote_halt(s >= 2)

    tbl = fixtures.g_line4()
    cfg = EngineConfig(num_parts=2)
    g = MicroGraph(tbl, str(tmp_path / "s"), cfg, n_vertices=4)
    algo = ComputeAlgorithm(
        compute=compute,
        initial_value=-1.0,
        aggregators={"count": Aggregator(default=0, reduce=lambda a, v: a + v,
                                         merge=lambda a, b: a + b)},
    )
    res = Engine(g.shards, cfg).run(algo)
    assert res.converged and res.supersteps == 2
    vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
    assert (vt["value"] == 4).all()


def test_outbox_not_duplicated_on_hub_split(ray_session, tmp_path):
    """A hub-split partition's outbox must emit ONCE, not once per
    sub-shard: a message-COUNTING algorithm (no idempotent combiner to
    mask duplicates) must produce identical counts split vs unsplit,
    on both executors."""

    def count_compute(v):
        if v.get_superstep() == 1:
            for _, dst, _ in v.pairs_edges():
                v.send_message(dst, 1)
        else:
            total = v.get_value()
            for m in v.pairs_messages():
                total += m
            v.set_value(total)
        v.vote_halt(True)

    tbl = fixtures.g_hub()

    def run(cfg, path):
        g = MicroGraph(tbl, str(tmp_path / path), cfg)
        algo = ComputeAlgorithm(compute=count_compute, initial_value=0)
        res = Engine(g.shards, cfg).run(algo)
        vt = ComputeAlgorithm.values_from_state(res.state, cfg.num_parts).to_pandas()
        return g, vt.sort_values("vid", ignore_index=True)

    cfg_plain = EngineConfig(num_parts=4)
    cfg_split = EngineConfig(num_parts=4, max_edges_per_shard=16,
                             parallel_scatter_min_edges=0)
    cfg_split_a = EngineConfig(num_parts=4, max_edges_per_shard=16,
                               parallel_scatter_min_edges=0,
                               executor="actors", actor_workers=2)
    g, plain = run(cfg_plain, "plain")
    gs, split = run(cfg_split, "split")
    assert any(len(v) > 1 for v in gs.shards.shards_of_part.values()), "no split"
    _, split_a = run(cfg_split_a, "split_a")

    # counts equal the vertex IN-degree (each in-edge sends exactly one 1)
    import pandas as pd
    e = tbl.to_pandas()
    want = e.groupby("dst").size()
    got = dict(zip(plain["vid"], plain["value"]))
    for d, n in want.items():
        assert got[gs.vid_of[d]] == n, (d, got[gs.vid_of[d]], n)
    pd.testing.assert_frame_equal(split, plain)
    pd.testing.assert_frame_equal(split_a, plain)


def test_state_concat_int_widening_guard(ray_session):
    """ADVICE r4: if per-part decoded state columns infer int64 in one
    part and float64 in another, the state concat must raise (permissive
    promotion would silently widen ints — lossy above 2^53); null+int
    and null+float mixes must still promote cleanly, and the pipeline
    path must surface the failure."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pregel_ray.chunks import pack
    from pregel_ray.engine import _concat_state_tables, state_to_vertices

    big = (1 << 53) + 1
    ti = pa.table({"vid": pa.array([0], pa.int64()), "value": pa.array([7], pa.int64())})
    tb = pa.table({"vid": pa.array([0], pa.int64()), "value": pa.array([big], pa.int64())})
    tf = pa.table({"vid": pa.array([1], pa.int64()), "value": pa.array([0.5], pa.float64())})
    tn = pa.table({"vid": pa.array([2], pa.int64()), "value": pa.array([None], pa.null())})

    # small ints widen SILENTLY in permissive concat — our guard catches
    # the type drift before it reaches a consumer
    with pytest.raises(TypeError, match="widened"):
        _concat_state_tables([ti, tf])
    # ints above 2^53 are refused by Arrow itself (lossless-cast check)
    with pytest.raises(Exception, match="not in range|widened"):
        _concat_state_tables([tb, tf])
    # legit promotions still work, values exact
    m = _concat_state_tables([tb, tn])
    assert m["value"].to_pylist() == [big, None]
    assert pa.types.is_integer(m.schema.field("value").type)
    m2 = _concat_state_tables([tf, tn])
    assert pa.types.is_floating(m2.schema.field("value").type)

    # pipeline path: the same mixed parts through state_to_vertices raise
    def _state(blobs):
        return rd.from_arrow(
            pa.table(
                {
                    "kind": pa.array([0] * len(blobs), pa.int8()),
                    "part": pa.array(list(range(len(blobs))), pa.int32()),
                    "blob": pa.array(blobs, pa.large_binary()),
                }
            )
        )

    mixed = _state(
        [pack({"value": np.array([big, 2], np.int64)}),
         pack({"value": np.array([0.5], np.float64)})]
    )
    with pytest.raises(Exception):
        state_to_vertices(mixed, P=2).to_pandas()

    ok = _state(
        [pack({"value": np.array([big], np.int64)}),
         pack({"value": np.array([7], np.int64)})]
    )
    out = state_to_vertices(ok, P=2).to_pandas()
    assert sorted(out["value"].tolist()) == [7, big]
