"""Pin the round-3 schema-hashability fix (pregel_ray/io_util.py).

pandas-written parquet carries a ``b'pandas'`` schema-metadata blob;
``pyarrow.Schema.__hash__`` raises ``TypeError: unhashable type: 'dict'``
on schemas with metadata, which defeats Ray Data's schema-dedup early
exit and made every superstep ~2x slower (BENCH/BASELINE.md round-3
section). The wrapper must deliver metadata-free (hashable) blocks for
both plain and column-pruned reads.
"""

import pandas as pd
import pyarrow as pa

from pregel_ray.io_util import read_parquet


def _write_pandas_parquet(path):
    pd.DataFrame(
        {"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5, 1.5, 2.5]}
    ).to_parquet(path)


def test_pandas_metadata_is_unhashable_upstream(tmp_path):
    """The premise: if this ever starts passing hash(), the wrapper can
    be retired — fail loudly so we notice the pyarrow behavior change."""
    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    _write_pandas_parquet(p)
    s = pq.read_schema(p)
    assert s.metadata and b"pandas" in s.metadata
    try:
        hash(s)
    except TypeError:
        pass
    else:
        raise AssertionError(
            "pyarrow now hashes metadata-carrying schemas — io_util's "
            "strip may be unnecessary"
        )


def test_read_parquet_blocks_are_hashable(ray_session, tmp_path):
    p = str(tmp_path / "t.parquet")
    _write_pandas_parquet(p)
    ds = read_parquet(p)
    blocks = [pa.Table.from_pandas(ds.to_pandas())]  # driver view
    import ray

    for ref in read_parquet(p).to_arrow_refs():
        t = ray.get(ref)
        assert t.schema.metadata is None
        hash(t.schema)  # must not raise
    assert ds.to_pandas().shape == (3, 3)
    assert blocks[0].num_rows == 3


def test_read_parquet_column_pruning(ray_session, tmp_path):
    p = str(tmp_path / "t.parquet")
    _write_pandas_parquet(p)
    ds = read_parquet(p, columns=["b", "a"])
    df = ds.to_pandas()
    assert list(df.columns) == ["b", "a"]
    assert df["a"].tolist() == [1, 2, 3]
    import ray

    for ref in ds.to_arrow_refs():
        assert ray.get(ref).schema.metadata is None
