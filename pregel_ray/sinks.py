"""Resumable partitioned Parquet sink.

A 100 TB job's output must be restartable: one directory per hash
partition of the output key, each committed atomically with its own
`_SUCCESS` marker (data file written first, marker last — the same
commit protocol as checkpoint.py and the graph-build dirs), so a rerun
skips finished partitions and never produces one giant file.

The reference's only sink is a whole-DB `box.snapshot()`
(master.lua:101-103 → worker.lua:61-63); partition-granular commit is
our scale extension (SURVEY.md §4 checkpoint row).

Layout:

    out_dir/
      part=00000/data.parquet     # one partition's rows
      part=00000/_SUCCESS
      ...
      _SUCCESS                    # top-level marker, written last

Rerun semantics: rows hashing into an already-committed partition are
dropped at the first map (so the shuffle only carries unfinished
partitions); partially-written partitions (no marker) are overwritten.
Note the skip saves the SHUFFLE + WRITE; upstream lazy transforms still
recompute unless the caller checkpoints them — the marker protocol is
the sink-side half of resumability, documented, not magic.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def _committed_rows(out_dir: str, part: int) -> int:
    """Row count of a committed partition: the `rows=N` sidecar in its
    _SUCCESS when present (new writers), else the parquet footer (old
    markers wrote 'ok')."""
    d = _part_dir(out_dir, part)
    try:
        with open(os.path.join(d, "_SUCCESS")) as f:
            line = f.read().strip()
        if line.startswith("rows="):
            return int(line.split("=", 1)[1])
    except (OSError, ValueError):
        pass
    p = os.path.join(d, "data.parquet")
    return pq.read_metadata(p).num_rows if os.path.exists(p) else 0


def write_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    by: list[str],
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Write `ds` hash-partitioned on `by` into per-partition committed
    dirs; returns the manifest (partition, rows, path — zero-row
    partitions get an empty committed dir so the top-level marker means
    'every partition final'). Safe to re-run after a crash: committed
    partitions are skipped wholesale."""
    from .agg import _hash_cols

    os.makedirs(out_dir, exist_ok=True)
    done = np.array(
        sorted(
            int(d.split("=")[1])
            for d in os.listdir(out_dir)
            if d.startswith("part=")
            and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
        ),
        np.int64,
    )

    def _bucket(t: pa.Table) -> pa.Table:
        bk = (_hash_cols(t, by) % np.uint64(num_partitions)).astype(np.int32)
        t = t.append_column("__part", pa.array(bk))
        if len(done):  # resumed run: finished partitions exit here
            t = t.filter(pa.array(~np.isin(bk, done)))
        return t

    def _commit(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        d = _part_dir(out_dir, part)
        os.makedirs(d, exist_ok=True)
        tbl = pa.Table.from_pandas(
            g.drop(columns="__part"), preserve_index=False
        ).replace_schema_metadata(None)
        pq.write_table(tbl, os.path.join(d, "data.parquet"))
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write(f"rows={len(g)}\n")  # sidecar count: reruns report it
        return pd.DataFrame({"partition": [part], "rows": [len(g)]})

    manifest = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_commit, batch_format="pandas")
        .to_pandas()  # ≤ num_partitions rows
    )
    if "partition" not in manifest.columns:
        # nothing survived the committed-partition filter (rerun after a
        # full commit, or empty input): the group output is schema-less
        manifest = pd.DataFrame(
            {
                "partition": pd.Series([], dtype=np.int64),
                "rows": pd.Series([], dtype=np.int64),
            }
        )

    # commit empty partitions too, so `_SUCCESS` at the top level is
    # unambiguous ("all partitions final"), and readers needn't guess
    written = set(manifest["partition"]) | set(done.tolist())
    for part in range(num_partitions):
        if part not in written:
            d = _part_dir(out_dir, part)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "_SUCCESS"), "w") as f:
                f.write("rows=0\n")
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    # manifest covers every partition: freshly written rows; partitions
    # skipped because a prior run committed them report the sidecar count
    # from their _SUCCESS (distinguishable via skipped=True), so rows is
    # never a silent 0 for non-empty committed data
    full = pd.DataFrame({"partition": np.arange(num_partitions, dtype=np.int64)})
    full = full.merge(manifest, on="partition", how="left")
    full["skipped"] = full["partition"].isin(done) & full["rows"].isna()
    for part in full.loc[full["skipped"], "partition"]:
        full.loc[full["partition"] == part, "rows"] = _committed_rows(
            out_dir, int(part)
        )
    full["rows"] = full["rows"].fillna(0).astype(np.int64)
    return full


def read_partitioned(out_dir: str) -> rd.Dataset:
    """Read back only COMMITTED partitions (marker-gated)."""
    from .io_util import read_parquet

    paths = [
        os.path.join(out_dir, d, "data.parquet")
        for d in sorted(os.listdir(out_dir))
        if d.startswith("part=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
        and os.path.exists(os.path.join(out_dir, d, "data.parquet"))
    ]
    if not paths:
        # no committed partitions yet (job inspected mid-write): an
        # explicit empty dataset, not read_parquet([]) (which raises)
        return rd.from_items([])
    # partitioning=None: the `part=NNNNN` dir names are a commit-unit
    # layout, not Hive partition values — don't infer a `part` column
    return read_parquet(paths, partitioning=None)
