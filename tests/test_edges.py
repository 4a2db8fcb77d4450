"""Edge materialization vs a pandas oracle + the per-row text invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pregel_ray.config import EngineConfig
from pregel_ray.fixtures import synth_transcripts


def pandas_edge_oracle(tbl: pa.Table) -> pd.DataFrame:
    """Straight-line oracle: sort by (conv_id, turn_idx); consecutive pairs;
    weight = count (FIXTURES.md §1)."""
    df = tbl.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    name = df["tool"].where(df["tool"].notna(), df["conv_id"] + "/" + df["role"])
    name = name.to_numpy()
    conv = df["conv_id"].to_numpy()
    same = conv[1:] == conv[:-1]
    pairs = pd.DataFrame({"src_name": name[:-1][same], "dst_name": name[1:][same]})
    out = pairs.groupby(["src_name", "dst_name"], as_index=False).size()
    return out.rename(columns={"size": "w"}).astype({"w": float})


@pytest.fixture(scope="module")
def built(ray_session, tiny_transcripts, tmp_path_factory):
    import ray.data as rd

    from pregel_ray.edges import build_graph_tables

    gdir = str(tmp_path_factory.mktemp("graph"))
    cfg = EngineConfig(num_parts=8, num_buckets=4)
    ds = rd.from_arrow(tiny_transcripts)
    meta = build_graph_tables(ds, gdir, cfg)
    return gdir, cfg, meta


def test_edges_match_pandas_oracle(built, tiny_transcripts):
    import ray.data as rd

    gdir, cfg, meta = built
    edges = rd.read_parquet(f"{gdir}/edges").to_pandas()
    verts = rd.read_parquet(f"{gdir}/vertices").to_pandas()
    vid2name = dict(zip(verts["vid"], verts["name"]))
    got = pd.DataFrame(
        {
            "src_name": edges["src"].map(vid2name),
            "dst_name": edges["dst"].map(vid2name),
            "w": edges["w"],
        }
    ).sort_values(["src_name", "dst_name"], ignore_index=True)
    want = pandas_edge_oracle(tiny_transcripts).sort_values(
        ["src_name", "dst_name"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_vid_partition_alignment(built):
    import ray.data as rd

    gdir, cfg, meta = built
    verts = rd.read_parquet(f"{gdir}/vertices").to_pandas()
    assert (verts["vid"] % cfg.num_parts == verts["part"]).all()
    # vids dense per partition: vid//P covers 0..count-1 within each part
    for part, g in verts.groupby("part"):
        local = np.sort(g["vid"].to_numpy() // cfg.num_parts)
        assert np.array_equal(local, np.arange(len(g)))
    assert meta["n_vertices"] == len(verts)
    assert verts["name"].is_unique


def test_build_is_deterministic_and_resumable(built, tiny_transcripts, tmp_path):
    import ray.data as rd

    from pregel_ray.edges import build_graph_tables

    gdir, cfg, meta = built
    gdir2 = str(tmp_path / "graph2")
    meta2 = build_graph_tables(rd.from_arrow(tiny_transcripts), gdir2, cfg)
    assert meta2 == meta
    e1 = rd.read_parquet(f"{gdir}/edges").to_pandas().sort_values(["src", "dst"], ignore_index=True)
    e2 = rd.read_parquet(f"{gdir2}/edges").to_pandas().sort_values(["src", "dst"], ignore_index=True)
    pd.testing.assert_frame_equal(e1, e2)
    # _SUCCESS short-circuit
    meta3 = build_graph_tables(rd.from_arrow(tiny_transcripts), gdir2, cfg)
    assert meta3 == meta


def test_per_turn_text_invariant(ray_session, tiny_transcripts):
    """Per-row invariant (BASELINE.json input_hint): after any shuffle, text
    for each (conv_id, turn_idx) equals the synthesized text."""
    import ray.data as rd

    ds = rd.from_arrow(tiny_transcripts).random_shuffle(seed=7).repartition(5)
    back = ds.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    ref = (
        synth_transcripts(50)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert (back["text"] == ref["text"]).all()
    assert back["text"].equals(
        back["conv_id"] + ":" + back["turn_idx"].astype(str) + back["text"].str.extract(r"^[^:]+:\d+(:.*)$", expand=False)
    )


def test_encode_edges_join_path_matches_broadcast(built, tiny_transcripts):
    """The large-vertex Dataset.join path must produce the same edge table
    as the broadcast-LUT path (forced via threshold=0)."""
    import ray.data as rd

    from pregel_ray.config import EngineConfig
    from pregel_ray.edges import derive_pairs, encode_edges, encode_vertices

    cfg = EngineConfig(num_parts=8, num_buckets=4)
    ds = rd.from_arrow(tiny_transcripts)
    pairs = derive_pairs(ds, cfg).materialize()
    verts = encode_vertices(pairs, cfg).materialize()

    bc = encode_edges(pairs, verts, cfg).to_pandas()
    cfg_join = EngineConfig(num_parts=8, num_buckets=4, broadcast_vertex_threshold=0)
    jn = encode_edges(pairs, verts, cfg_join).to_pandas()
    bc = bc.sort_values(["src", "dst"], ignore_index=True)
    jn = jn.sort_values(["src", "dst"], ignore_index=True)
    pd.testing.assert_frame_equal(bc, jn, check_dtype=False)
