"""Parquet read wrapper that strips schema metadata from every block.

Parquet files written through pandas (the driver's testdata tables, and
any fixture written via ``DataFrame.to_parquet``) carry a ``b'pandas'``
schema-metadata blob. ``pyarrow.Schema.__hash__`` raises ``TypeError:
unhashable type: 'dict'`` on schemas with metadata, which defeats Ray
Data's schema-deduplication early exit (``set(schemas)`` in
ray/data/_internal/arrow_ops/transform_pyarrow.py:175) — every reduce
task then logs "Failed to hash the schemas (for deduplication)" and
runs the slow unify path on each block pair.

The strip is a zero-copy ``replace_schema_metadata(None)`` per block,
fused by the streaming executor into the read stage.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def _stripped_schema(paths) -> pa.Schema | None:
    """File-level schema with metadata removed, or None if not cheaply
    resolvable. Passing it as ``schema=`` makes the READ TASK's own
    row-group unify see hashable schemas (the downstream strip alone
    still leaves the warning inside ReadParquet)."""
    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        if os.path.isdir(p):
            files = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
            if not files:
                return None
            # Heterogeneity probe: the forced schema assumes every file in
            # the directory agrees. Checking first vs last footer (2 reads,
            # not N — evolution usually changes the newest/oldest file) and
            # falling back to Ray's own unify when they disagree keeps the
            # fast path for the common homogeneous layout without silently
            # casting an evolved directory.
            if len(files) > 1:
                first = pq.read_schema(os.path.join(p, files[0])).remove_metadata()
                last = pq.read_schema(os.path.join(p, files[-1])).remove_metadata()
                if not first.equals(last):
                    return None
                return first
            p = os.path.join(p, files[0])
        return pq.read_schema(p).remove_metadata()
    except Exception:
        return None


def read_parquet(paths, **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` with hashable (metadata-free) block
    schemas. Drop-in: accepts every ``read_parquet`` kwarg."""
    if "schema" not in kwargs:
        s = _stripped_schema(paths)
        if s is not None:
            if "columns" in kwargs and kwargs["columns"] is not None:
                s = pa.schema([s.field(c) for c in kwargs["columns"]])
            kwargs["schema"] = s
    return rd.read_parquet(paths, **kwargs).map_batches(
        _strip_meta, batch_format="pyarrow"
    )
