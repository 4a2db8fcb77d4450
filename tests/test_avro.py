"""Avro container source/sink round trips (S10/S11, SURVEY.md §2.1):
reader/writer of the public Avro 1.x container format must round-trip the
transcript schema and agree with the parquet path on the same records."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def transcripts(ray_session):
    import pyarrow.parquet as pq

    from pregel_ray.fixtures import transcripts_path

    return pq.read_table(transcripts_path("/root/testdata/sf0.001"))


def test_table_round_trip(tmp_path, transcripts):
    from pregel_ray.avro_io import read_avro_table, write_avro_table

    tbl = transcripts.slice(0, 5000)
    path = str(tmp_path / "t.avro")
    write_avro_table(tbl, path, block_rows=700)
    back = read_avro_table(open(path, "rb").read())
    assert back.schema.names == tbl.schema.names
    for col in tbl.schema.names:
        assert back[col].to_pylist() == tbl[col].to_pylist(), col


def test_dataset_round_trip_matches_parquet(ray_session, tmp_path, transcripts):
    import ray.data as rd

    from pregel_ray.avro_io import read_avro, write_avro

    ds = rd.from_arrow(transcripts.slice(0, 8000))
    paths = write_avro(ds, str(tmp_path / "avro"))
    assert paths, "no files written"
    back = read_avro(paths).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    want = transcripts.slice(0, 8000).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True
    )
    assert list(back.columns) == list(want.columns)
    for c in back.columns:
        a, b = back[c], want[c]
        if a.dtype == object:
            assert (a.fillna("\0") == b.fillna("\0")).all(), c
        else:
            assert (a.to_numpy() == b.to_numpy()).all(), c


def test_deflate_codec_round_trip(tmp_path):
    """RFC 1951 raw-deflate blocks: identical values, smaller file, and the
    container metadata advertises the codec."""
    from pregel_ray.avro_io import read_avro_table, write_avro_table

    tbl = pa.table(
        {
            "k": pa.array(list(range(4000)), pa.int64()),
            "txt": pa.array(["the same compressible text"] * 4000),
        }
    )
    raw, packed = str(tmp_path / "n.avro"), str(tmp_path / "d.avro")
    write_avro_table(tbl, raw, block_rows=512, codec="null")
    write_avro_table(tbl, packed, block_rows=512, codec="deflate")
    data = open(packed, "rb").read()
    assert b"deflate" in data[:200]  # codec in header metadata
    assert len(data) < len(open(raw, "rb").read()) / 4
    back = read_avro_table(data)
    for col in tbl.schema.names:
        assert back[col].to_pylist() == tbl[col].to_pylist(), col


def test_complex_types_round_trip(tmp_path):
    """array / map / nested record / fixed — the reference binding's full
    lattice (pregel/avro/constants.lua:9-25) minus its libavro LINK type."""
    from pregel_ray.avro_io import read_avro_table, write_avro_table

    tbl = pa.table(
        {
            "arr": pa.array([[1, 2], [], None, [3]], pa.list_(pa.int64())),
            "m": pa.array(
                [{"a": 1.5}, {}, None, {"x": -2.0, "y": 0.0}],
                pa.map_(pa.string(), pa.float64()),
            ),
            "rec": pa.array(
                [
                    {"name": "n1", "score": 0.5},
                    {"name": None, "score": 2.0},
                    None,
                    {"name": "n4", "score": None},
                ],
                pa.struct([("name", pa.string()), ("score", pa.float64())]),
            ),
            "fx": pa.array([b"abcd", b"0123", None, b"\x00\x01\x02\x03"],
                           pa.binary(4)),
            "deep": pa.array(
                [{"tags": ["a", "b"]}, {"tags": []}, None, {"tags": ["z"]}],
                pa.struct([("tags", pa.list_(pa.string()))]),
            ),
        }
    )
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"c_{codec}.avro")
        write_avro_table(tbl, path, block_rows=3, codec=codec)
        back = read_avro_table(open(path, "rb").read())
        assert back.schema == tbl.schema, codec
        for col in tbl.schema.names:
            assert back[col].to_pylist() == tbl[col].to_pylist(), (codec, col)


def test_enum_and_general_union_codec():
    """Enum and multi-branch unions have no Arrow column mapping (documented:
    project before read) but the value codec must round-trip them — that is
    the surface a third-party Avro file exercises."""
    import io

    from pregel_ray.avro_io import _decoder_for, _encoder_for

    enum_t = {"type": "enum", "name": "suit", "symbols": ["H", "S", "C", "D"]}
    enc, dec = _encoder_for(enum_t), _decoder_for(enum_t)
    for sym in ("H", "D"):
        assert dec(io.BytesIO(enc(sym))) == sym

    union_t = ["null", "long", "string", {"type": "array", "items": "long"}]
    enc, dec = _encoder_for(union_t), _decoder_for(union_t)
    for v in (None, 42, -(2**50), "text", [1, 2, 3], []):
        got = dec(io.BytesIO(enc(v)))
        assert got == (list(v) if isinstance(v, list) else v), v


def test_primitive_types_and_nulls(tmp_path):
    from pregel_ray.avro_io import read_avro_table, write_avro_table

    tbl = pa.table(
        {
            "i": pa.array([1, None, -(2**40)], pa.int64()),
            "s": pa.array(["a", None, "日本語"], pa.string()),
            "d": pa.array([0.5, None, -1e300], pa.float64()),
            "b": pa.array([True, None, False], pa.bool_()),
            "raw": pa.array([b"\x00\xff", None, b""], pa.large_binary()),
            "ts": pa.array(
                np.array([1, 2, 3], "datetime64[us]"), pa.timestamp("us")
            ),
        }
    )
    path = str(tmp_path / "p.avro")
    write_avro_table(tbl, path)
    back = read_avro_table(open(path, "rb").read())
    for col in tbl.schema.names:
        assert back[col].to_pylist() == tbl[col].to_pylist(), col


def test_avro_property_round_trip(tmp_path):
    """Property test (hypothesis): random tables over the primitive +
    nullable lattice round-trip bit-exactly through the container codec,
    both codecs, any block_rows split."""
    from hypothesis import given, settings, strategies as st

    from pregel_ray.avro_io import read_avro_table, write_avro_table

    scalar = {
        "i64": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        "f64": st.one_of(
            st.none(),
            st.floats(allow_nan=False, width=64),  # NaN != NaN breaks equality
        ),
        "s": st.one_of(st.none(), st.text(max_size=40)),
        "b": st.one_of(st.none(), st.booleans()),
        "raw": st.one_of(st.none(), st.binary(max_size=24)),
        "arr": st.one_of(
            st.none(), st.lists(st.integers(-(2**40), 2**40), max_size=6)
        ),
    }
    types = {
        "i64": pa.int64(), "f64": pa.float64(), "s": pa.string(),
        "b": pa.bool_(), "raw": pa.large_binary(),
        "arr": pa.list_(pa.int64()),
    }

    @settings(max_examples=25, deadline=None)
    @given(
        rows=st.lists(
            st.fixed_dictionaries({k: v for k, v in scalar.items()}),
            min_size=0, max_size=17,
        ),
        block_rows=st.sampled_from([1, 3, 8192]),
        codec=st.sampled_from(["null", "deflate"]),
    )
    def check(rows, block_rows, codec):
        tbl = pa.table(
            {k: pa.array([r[k] for r in rows], types[k]) for k in types}
        )
        path = str(tmp_path / "prop.avro")
        write_avro_table(tbl, path, block_rows=block_rows, codec=codec)
        back = read_avro_table(open(path, "rb").read())
        assert back.schema == tbl.schema
        for c in types:
            assert back[c].to_pylist() == tbl[c].to_pylist(), c

    check()
