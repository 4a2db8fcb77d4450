"""Per-superstep Parquet checkpoints with per-partition lineage.

Layout (FIXTURES.md §5; north rule: "resumable from checkpoint with
per-partition lineage + metrics"):

    run_dir/superstep=K/
        values/*.parquet    # the state chunk rows (part, metrics, agg, blob)
        lineage.parquet     # per part: blob sha256, byte size, active, nmsg
        metrics.json        # full Metrics history up to K
        _SUCCESS            # commit marker (written last)

Resume = read the max K carrying _SUCCESS and continue at K+1; the
engine's deterministic apply (messages sorted by producing shard, driver
sums in part order) makes a resumed run bit-identical to an
uninterrupted one — tested in tests/test_checkpoint.py.

Reference analogue: `box.snapshot()` whole-DB images
(/root/reference/pregel/master.lua:101-103, worker.lua:61-63) — but
per-superstep, columnar, and partition-addressable instead of a single
opaque binary image.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

import ray.data as rd

from .io_util import read_parquet as _read_parquet


def _dir(run_dir: str, superstep: int) -> str:
    return os.path.join(run_dir, f"superstep={superstep}")


def write(run_dir: str, superstep: int, state: rd.Dataset, history,
          final: bool = False, engine_meta: dict | None = None) -> None:
    """`engine_meta` carries the topology epoch (shard_dir, graph_source
    dirs, mutation_epoch, dead tombstones) so a resume in a fresh process
    continues on the MUTATED graph — the reference's box.snapshot covers
    topology, so must we (SURVEY.md §2.1 S12)."""
    d = _dir(run_dir, superstep)
    if os.path.exists(os.path.join(d, "_SUCCESS")):
        return
    os.makedirs(d, exist_ok=True)

    state.write_parquet(os.path.join(d, "values"))

    def _lineage(t: pa.Table) -> pa.Table:
        rows = {"part": [], "kind": [], "sha256": [], "nbytes": [], "active": [], "nmsg": []}
        for i in range(t.num_rows):
            blob = t["blob"][i].as_py()
            rows["part"].append(t["part"][i].as_py())
            rows["kind"].append(t["kind"][i].as_py())
            rows["sha256"].append(hashlib.sha256(blob).hexdigest())
            rows["nbytes"].append(len(blob))
            rows["active"].append(t["active"][i].as_py())
            rows["nmsg"].append(t["nmsg"][i].as_py())
        return pa.table(rows)

    state.map_batches(_lineage, batch_format="pyarrow").write_parquet(
        os.path.join(d, "lineage")
    )
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump({"superstep": superstep, "final": final,
                   "engine_meta": engine_meta,
                   "history": [m.to_dict() for m in history]}, f)
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("")


def completed_supersteps(run_dir: str) -> list[int]:
    if not os.path.isdir(run_dir):
        return []
    out = []
    for name in os.listdir(run_dir):
        if name.startswith("superstep=") and os.path.exists(
            os.path.join(run_dir, name, "_SUCCESS")
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def try_resume(run_dir: str):
    """→ (next_superstep, state Dataset, history, engine_meta|None) or None."""
    from .engine import Metrics

    done = completed_supersteps(run_dir)
    if not done:
        return None
    k = done[-1]
    d = _dir(run_dir, k)
    with open(os.path.join(d, "metrics.json")) as f:
        meta = json.load(f)
    if meta.get("final"):
        # fully finished run: caller may still resume-from-final (no-op loop)
        pass
    state = _read_parquet(os.path.join(d, "values")).materialize()
    history = [Metrics(**m) for m in meta["history"]]
    return k + 1, state, history, meta.get("engine_meta")
