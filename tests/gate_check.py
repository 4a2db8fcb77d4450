"""Local replica of the driver's correctness gate.

Runs every `__ray_entry__.queries()` entry AND its `oracle_sql()` SQL
over the same sf directory, then compares row count, column-name set,
and exact values (columns sorted by name, rows sorted by all columns —
the driver's hash is over exactly that ordering, so equality here
implies hash_match there).

Usage:  python tests/gate_check.py [sf_dir] [query ...]

Actor-executor leg (round-4 evidence): the same gate with every
engine-backed query forced onto the raw-actor superstep executor —

    rm -rf /tmp/pregel_ray_fixtures/convs=*/run_pr_*   # else pagerank
                                                       # resumes finished
                                                       # dataset-run ckpts
    PREGEL_EXECUTOR=actors python tests/gate_check.py /root/testdata/sf0.01 \
        pagerank_fixed20 pagerank_top20 cc_labels cc_sizes lpa_clusters \
        sssp_from_hub kcore5_members ppr_from_tools maxprop_ranks \
        hits_scores dedup_clusters
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


def main() -> int:
    import ray
    import ray.data as rd

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    # 50-query driver budget: merged-away variants are still value-pinned
    # locally (x_-prefixed; __ray_entry__.extra_queries docstring)
    qs.update(entry.extra_queries())
    oracles.update(entry.extra_oracle_sql())

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    # oracle_sql() is the DRIVER's contract: static SQL strings evaluated
    # at the driver's sf0.01. Oracles that embed fixture/golden paths
    # (graph queries over the transcripts fixture, the multimodal golden)
    # can only be cross-checked at that scale — at any other sf the Ray
    # side and the SQL would read different data by design.
    import os

    import __ray_entry__ as _e

    default_scale = os.path.normpath(sf_dir) == os.path.normpath(_e.SF_ORACLE)

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name:32s} SKIP (no oracle)")
            continue
        sql = oracles[name]
        if not default_scale and (
            "pregel_ray_fixtures" in sql or "tests/golden" in sql
        ):
            print(f"{name:32s} SKIP (oracle pinned to {_e.SF_ORACLE} "
                  "fixture paths)")
            continue
        try:
            res = fn(sf_dir)
            if isinstance(res, rd.Dataset):
                got = res.to_pandas()
            elif isinstance(res, pd.DataFrame):
                got = res
            else:  # pyarrow.Table
                got = res.to_pandas()
            want = con.execute(oracles[name]).fetchdf()
            g, w = _norm(got), _norm(want)
            rows = len(g) == len(w)
            schema = list(g.columns) == list(w.columns)
            if rows and schema:
                try:
                    pd.testing.assert_frame_equal(
                        g, w.astype(g.dtypes.to_dict()), check_exact=True
                    )
                    print(f"{name:32s} OK    rows={len(g)}")
                    continue
                except AssertionError as e:
                    print(f"{name:32s} VALUE-MISMATCH rows={len(g)}")
                    print("   ", str(e).splitlines()[-1][:200])
            else:
                print(f"{name:32s} ROWS/SCHEMA rows {len(g)} vs {len(w)}; "
                      f"cols {list(g.columns)} vs {list(w.columns)}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR {type(e).__name__}: {str(e)[:160]}")
        failures += 1

    ray.shutdown()
    print(f"\n{failures} failing / {len(only) if only else len(oracles)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
