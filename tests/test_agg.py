"""agg.py bucketed aggregation vs pandas ground truth."""

import numpy as np
import pandas as pd


def test_group_sum_and_count_and_distinct(ray_session):
    import ray.data as rd

    from pregel_ray.agg import distinct, group_count, group_sum, grouped_apply

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "k1": rng.choice(["a", "b", "c", "dd", "ee"], 5000),
            "k2": rng.integers(0, 50, 5000),
            "v": rng.random(5000),
        }
    )
    ds = rd.from_pandas(df)

    got = group_sum(ds, ["k1", "k2"], "v", num_buckets=16).to_pandas()
    want = df.groupby(["k1", "k2"], as_index=False)["v"].sum()
    got = got.sort_values(["k1", "k2"], ignore_index=True)
    want = want.sort_values(["k1", "k2"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)

    gc = group_count(ds, ["k1"], alias="n", num_buckets=4).to_pandas()
    wc = df.groupby("k1", as_index=False).size().rename(columns={"size": "n"})
    assert dict(zip(gc["k1"], gc["n"])) == dict(zip(wc["k1"], wc["n"]))

    d = distinct(ds, ["k1", "k2"], num_buckets=8).to_pandas()
    assert len(d) == len(df.drop_duplicates(["k1", "k2"]))

    # every row of a key lands in exactly one bucket → no key split across
    # grouped_apply calls (checked by a fn that would double-count if split)
    def one(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k1", as_index=False).agg(n=("v", "size"))

    ga = grouped_apply(ds, ["k1"], one, num_buckets=32).to_pandas()
    assert len(ga) == df["k1"].nunique()


def test_write_solution(ray_session, tmp_path):
    import ray.data as rd

    from pregel_ray import fixtures
    from pregel_ray.algorithms import PageRank
    from pregel_ray.config import EngineConfig
    from pregel_ray.engine import Engine
    from pregel_ray.testing import MicroGraph

    cfg = EngineConfig(num_parts=4)
    g = MicroGraph(fixtures.g_line4(), str(tmp_path / "s"), cfg, n_vertices=4)
    res = Engine(g.shards, cfg).run(PageRank(max_iters=3))
    out = str(tmp_path / "solution")
    res.write_solution(out)
    back = rd.read_parquet(out).to_pandas()
    assert set(back.columns) == {"vid", "rank"}
    assert len(back) == 4
