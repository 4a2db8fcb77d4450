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
