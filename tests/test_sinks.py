"""Resumable partitioned sink: commit protocol, crash-resume skip,
round-trip equality."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _data(n=5000):
    rng = np.random.default_rng(2)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 1000, n)),
            "v": pa.array(rng.standard_normal(n)),
        }
    )


def test_write_read_roundtrip(ray_session, tmp_path):
    from pregel_ray.sinks import read_partitioned, write_partitioned

    t = _data()
    out = str(tmp_path / "out")
    manifest = write_partitioned(
        rd.from_arrow(t).repartition(4), out, by=["k"], num_partitions=16
    )
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert len(manifest) == 16 and manifest["rows"].sum() == t.num_rows

    back = read_partitioned(out).to_pandas().sort_values(["k", "v"], ignore_index=True)
    want = t.to_pandas().sort_values(["k", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(back, want)


def test_rerun_after_full_commit(ray_session, tmp_path):
    """Re-running after every partition committed (crash between the last
    partition marker and the top-level _SUCCESS) must not crash on the
    schema-less empty manifest, and must restore the top-level marker."""
    from pregel_ray.sinks import read_partitioned, write_partitioned

    t = _data(500)
    out = str(tmp_path / "out")
    write_partitioned(rd.from_arrow(t), out, by=["k"], num_partitions=8)
    os.remove(os.path.join(out, "_SUCCESS"))  # the advertised crash point

    manifest = write_partitioned(rd.from_arrow(t), out, by=["k"], num_partitions=8)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # ADVICE r4 contract: skipped-committed partitions report their TRUE
    # row counts (sidecar), flagged skipped — not an ambiguous 0
    assert len(manifest) == 8 and manifest["rows"].sum() == 500
    assert manifest.loc[manifest["rows"] > 0, "skipped"].all()

    back = read_partitioned(out).to_pandas().sort_values(["k", "v"], ignore_index=True)
    want = t.to_pandas().sort_values(["k", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(back, want)


def test_empty_input_and_uncommitted_read(ray_session, tmp_path):
    from pregel_ray.sinks import read_partitioned, write_partitioned

    out = str(tmp_path / "empty")
    manifest = write_partitioned(
        rd.from_arrow(_data(0)), out, by=["k"], num_partitions=4
    )
    assert len(manifest) == 4 and manifest["rows"].sum() == 0
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    # a dir with zero committed partitions reads back as an empty dataset
    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    assert read_partitioned(bare).count() == 0


def test_resume_skips_committed_partitions(ray_session, tmp_path):
    """Simulated crash: wipe two partitions' markers (one fully, one
    marker-only) → the rerun rewrites exactly those, leaves the rest
    untouched (mtime check), and the content matches a clean write."""
    from pregel_ray.sinks import read_partitioned, write_partitioned

    t = _data()
    out = str(tmp_path / "out")
    write_partitioned(rd.from_arrow(t), out, by=["k"], num_partitions=16)

    # crash simulation
    os.remove(os.path.join(out, "_SUCCESS"))
    shutil.rmtree(os.path.join(out, "part=00003"))
    os.remove(os.path.join(out, "part=00007", "_SUCCESS"))

    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
        for d in os.listdir(out)
        if d.startswith("part=") and d not in ("part=00003", "part=00007")
        and os.path.exists(os.path.join(out, d, "data.parquet"))
    }

    write_partitioned(rd.from_arrow(t), out, by=["k"], num_partitions=16)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert os.path.exists(os.path.join(out, "part=00003", "_SUCCESS"))
    assert os.path.exists(os.path.join(out, "part=00007", "_SUCCESS"))
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == m, d

    back = read_partitioned(out).to_pandas().sort_values(["k", "v"], ignore_index=True)
    want = t.to_pandas().sort_values(["k", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(back, want)


def test_rerun_manifest_reports_committed_rows(ray_session, tmp_path):
    """ADVICE r4: a rerun after full commit reports each committed
    partition's true row count (sidecar) with skipped=True, rows int64."""
    from pregel_ray.sinks import write_partitioned

    t = _data()
    out = str(tmp_path / "out")
    m1 = write_partitioned(rd.from_arrow(t), out, by=["k"], num_partitions=8)
    m2 = write_partitioned(rd.from_arrow(t), out, by=["k"], num_partitions=8)
    assert m2["rows"].dtype == "int64"
    assert m1["rows"].dtype == "int64"
    nonempty = m1[m1["rows"] > 0]["partition"].tolist()
    assert nonempty, "fixture should fill some partitions"
    m2i = m2.set_index("partition")
    m1i = m1.set_index("partition")
    for p in m2i.index:
        assert m2i.loc[p, "rows"] == m1i.loc[p, "rows"]
    assert bool(m2i.loc[nonempty[0], "skipped"])
    assert not bool(m1i.loc[nonempty[0], "skipped"])
