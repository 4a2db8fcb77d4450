"""agg.py bucketed aggregation vs pandas ground truth."""

import numpy as np
import pandas as pd
import pytest


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


def test_bucketed_join_inner_left_vs_pandas(ray_session):
    import ray.data as rd

    from pregel_ray.agg import bucketed_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 400, 3000),
            "lv": rng.random(3000),
            "lid": np.arange(3000),
        }
    )
    # right: only keys 0..299 present → some left rows unmatched
    right = pd.DataFrame(
        {
            "rk": np.arange(300),
            "name": [f"n{i}" for i in range(300)],
            "rint": np.arange(300) * 7,
        }
    )
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)

    for how in ("inner", "left"):
        got = bucketed_join(
            lds, rds, ["k"], ["rk"], how=how, num_buckets=16
        ).to_pandas()
        want = left.merge(
            right.rename(columns={"rk": "k"}), on="k", how=how
        )
        got = got.sort_values(["lid"], ignore_index=True)
        want = want.sort_values(["lid"], ignore_index=True)
        assert list(got.columns) == ["k", "lv", "lid", "name", "rint"]
        pd.testing.assert_frame_equal(
            got[["k", "lv", "lid"]], want[["k", "lv", "lid"]], check_dtype=False
        )
        assert got["name"].fillna("-").tolist() == want["name"].fillna("-").tolist()
        # int carrier must come back INTEGER (null where unmatched), not double
        pd.testing.assert_series_equal(
            got["rint"].astype("Int64"),
            want["rint"].astype("Int64"),
            check_names=False,
        )


def test_bucketed_join_schema_stability_and_collisions(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.agg import bucketed_join

    # left keys that match NOTHING → all-null right carriers in every
    # bucket; schema must still be the declared one (no `null` types)
    left = pd.DataFrame({"k": [1000, 2000, 3000], "v": [1.0, 2.0, 3.0]})
    right = pd.DataFrame({"k": [1, 2], "v": [9.0, 8.0], "s": ["x", "y"]})
    out = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), ["k"], how="left",
        num_buckets=4,
    )
    sch = out.schema().base_schema
    assert sch.field("k").type == pa.int64()
    assert sch.field("v_r").type == pa.float64()  # collision suffixed
    assert sch.field("s").type == pa.string()
    got = out.to_pandas().sort_values("k", ignore_index=True)
    assert got["s"].isna().all() and got["v_r"].isna().all()
    assert got["v"].tolist() == [1.0, 2.0, 3.0]

    # string keys, inner
    l2 = pd.DataFrame({"name": ["a", "b", "c", "a"], "x": [1, 2, 3, 4]})
    r2 = pd.DataFrame({"name": ["a", "c"], "y": [10, 30]})
    g2 = (
        bucketed_join(rd.from_pandas(l2), rd.from_pandas(r2), ["name"], num_buckets=8)
        .to_pandas()
        .sort_values("x", ignore_index=True)
    )
    assert g2["name"].tolist() == ["a", "c", "a"]
    assert g2["y"].tolist() == [10, 30, 10]


def test_bucketed_join_semi_anti_vs_pandas(ray_session):
    import numpy as np
    import ray.data as rd

    from pregel_ray.agg import bucketed_join

    rng = np.random.RandomState(3)
    l = pd.DataFrame({"k": rng.randint(0, 40, 200), "v": np.arange(200)})
    r = pd.DataFrame({"kk": rng.randint(0, 40, 60)})
    keys = set(r["kk"])
    for how in ("semi", "anti"):
        got = (
            bucketed_join(rd.from_pandas(l), rd.from_pandas(r), ["k"], ["kk"],
                          how=how, num_buckets=8)
            .to_pandas().sort_values(["k", "v"], ignore_index=True)
        )
        mask = l["k"].isin(keys)
        want = (l[mask] if how == "semi" else l[~mask]).sort_values(
            ["k", "v"], ignore_index=True
        )
        assert list(got.columns) == ["k", "v"], how  # left columns only
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict())), how


def test_bucketed_join_right_outer_vs_pandas(ray_session):
    import numpy as np
    import ray.data as rd

    from pregel_ray.agg import bucketed_join

    rng = np.random.RandomState(7)
    l = pd.DataFrame({"k": rng.randint(0, 30, 120), "lv": np.arange(120)})
    r = pd.DataFrame({"kk": rng.randint(15, 45, 60), "rv": np.arange(60) * 10})
    for how in ("right", "outer"):
        got = (
            bucketed_join(rd.from_pandas(l), rd.from_pandas(r), ["k"], ["kk"],
                          how=how, num_buckets=8)
            .to_pandas()
            .sort_values(["k", "lv", "rv"], ignore_index=True, na_position="last")
        )
        want = (
            pd.merge(l, r.rename(columns={"kk": "k"}), on="k", how=how)
            .sort_values(["k", "lv", "rv"], ignore_index=True, na_position="last")
        )
        assert list(got.columns) == ["k", "lv", "rv"], how
        pd.testing.assert_frame_equal(
            got.astype({"k": "float64", "lv": "float64", "rv": "float64"}),
            want.astype({"k": "float64", "lv": "float64", "rv": "float64"}),
        ), how


def test_bucketed_join_int64_above_2_53_exact(ray_session):
    """Non-key int64 carriers above 2^53 (64-bit hash/fingerprint ids)
    must round-trip exactly — a float64 detour would corrupt them."""
    import ray.data as rd

    from pregel_ray.agg import bucketed_join

    import pyarrow as pa

    big = [2**63 - 1, 2**53 + 1, 2**60 + 12345, -(2**62) - 7]
    l = pd.DataFrame({"k": [1, 2, 3, 4, 5], "lv": [10, 20, 30, 40, 50]})
    r = pd.DataFrame({"k": [1, 2, 3, 4], "fp": big})
    for how in ("inner", "left"):
        out = bucketed_join(rd.from_pandas(l), rd.from_pandas(r), ["k"],
                            how=how, num_buckets=4)
        # assert on the ARROW output (Dataset.to_pandas would itself widen
        # int64-with-null to float64 — exactly the detour under test)
        tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
        tbl = tbl.sort_by("k")
        assert tbl.schema.field("fp").type == pa.int64(), how
        fp = tbl["fp"]
        assert fp.drop_null().to_pylist() == big, how
        if how == "left":
            assert fp.null_count == 1 and fp[4].as_py() is None


def test_weighted_hash_sample(ray_session):
    """Winners equal the straight-numpy exponential race, and are
    independent of block layout."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from pregel_ray.agg import weighted_hash_sample

    rng = np.random.RandomState(9)
    n, k = 500, 20
    df = pd.DataFrame({"id": np.arange(n), "w": rng.randint(1, 50, n)})
    M = 1 << 53
    h = np.array(
        [int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little") % M
         for v in df["id"]]
    )
    e = -np.log((h + 0.5) / M) / df["w"].to_numpy()
    want = df.iloc[np.lexsort((df["id"].to_numpy(), e))[:k]].sort_values(
        "id", ignore_index=True
    )
    for blocks in (1, 7):
        got = (
            weighted_hash_sample(rd.from_pandas(df).repartition(blocks),
                                 "id", "w", k)
            .to_pandas().sort_values("id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_hash_sample_deterministic(ray_session):
    import hashlib

    import ray.data as rd

    from pregel_ray.agg import hash_sample

    df = pd.DataFrame({"id": np.arange(1000), "x": np.arange(1000) * 2})
    got = hash_sample(rd.from_pandas(df), "id", 250).to_pandas()
    keep = df[
        df["id"].map(
            lambda v: int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[8:], "little") % 1000 < 250
        )
    ]
    assert sorted(got["id"]) == sorted(keep["id"])
    # layout-independent: different block structure, same surviving rows
    got2 = hash_sample(
        rd.from_pandas(df).repartition(7), "id", 250
    ).to_pandas()
    assert sorted(got2["id"]) == sorted(got["id"])


def test_stratified_hash_sample_deterministic(ray_session):
    import hashlib

    import ray.data as rd

    from pregel_ray.agg import stratified_hash_sample

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "id": np.arange(2000),
            "grp": np.array(["a", "b", "c"])[rng.integers(0, 3, 2000)],
        }
    )
    rates = {"a": 100, "b": 500}  # c falls to default_permille=0
    got = stratified_hash_sample(
        rd.from_pandas(df), "id", "grp", rates
    ).to_pandas()

    def h(v):
        return int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[8:], "little") % 1000

    keep = df[df.apply(lambda r: h(r["id"]) < rates.get(r["grp"], 0), axis=1)]
    assert sorted(got["id"]) == sorted(keep["id"])
    assert set(got["grp"]) <= {"a", "b"}  # default stratum fully dropped
    # layout-independent
    got2 = stratified_hash_sample(
        rd.from_pandas(df).repartition(9), "id", "grp", rates
    ).to_pandas()
    assert sorted(got2["id"]) == sorted(got["id"])


def test_weighted_hash_sample_rejects_nonpositive_weights(ray_session):
    """ADVICE r4: E-S races are undefined for w<=0 — fail fast."""
    import pyarrow as pa
    import ray.data as rd
    from pregel_ray.agg import weighted_hash_sample

    t = pa.table({"k": pa.array([1, 2, 3]), "w": pa.array([1.0, 0.0, 2.0])})
    with pytest.raises((ValueError, Exception)) as ei:
        weighted_hash_sample(rd.from_arrow(t), "k", "w", 2).to_pandas()
    assert "strictly positive" in str(ei.value)
