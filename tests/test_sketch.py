"""Sketch ops: HyperLogLog (register exactness, merge law, estimate
accuracy) and Bloom-filter join pruning (bit-identical results, real
pruning), plus sessionize / exact_quantiles vs independent pandas/numpy
oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _events(n=4000, users=300, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n)),
            "user_id": pa.array(rng.integers(0, users, n)),
            "event_type": pa.array(
                np.array(["click", "view", "error"])[rng.integers(0, 3, n)]
            ),
            "ts": pa.array(
                pd.Timestamp("2024-01-01")
                + pd.to_timedelta(np.sort(rng.integers(0, 3_000_000, n)), unit="s")
            ),
        }
    )


# ---------------------------------------------------------------- HLL


def test_hll_registers_match_reference_fold(ray_session):
    """Registers from the distributed pipeline == a single-pass fold."""
    import hashlib

    from pregel_ray.ops.sketch import hll_registers

    t = _events()
    got = (
        hll_registers(rd.from_arrow(t).repartition(5), "user_id",
                      by=["event_type"], p=8)
        .to_pandas()
        .sort_values(["event_type", "register"])
        .reset_index(drop=True)
    )

    ref = {}
    for et, uid in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        h = int.from_bytes(hashlib.md5(str(uid).encode()).digest()[8:], "little")
        reg, rem = h & 255, h >> 8
        rho = 57 - rem.bit_length() if rem else 57
        ref[(et, reg)] = max(ref.get((et, reg), 0), rho)
    want = (
        pd.DataFrame(
            [(et, r, v) for (et, r), v in ref.items()],
            columns=["event_type", "register", "max_rho"],
        )
        .sort_values(["event_type", "register"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"register": np.int64, "max_rho": np.int64}),
        want.astype({"register": np.int64, "max_rho": np.int64}),
    )


def test_hll_merge_law_and_estimate_accuracy(ray_session):
    """Sketch(A ∪ B) == elementwise-max(Sketch(A), Sketch(B)); the
    estimate lands within ~3σ of the true distinct count (σ≈1.04/√m)."""
    from pregel_ray.ops.sketch import hll_estimate, hll_registers

    t = _events(n=6000, users=900)
    half = t.num_rows // 2
    a, b = t.slice(0, half), t.slice(half)

    def regs(tbl):
        return (
            hll_registers(rd.from_arrow(tbl), "user_id", p=10)
            .to_pandas()
            .set_index("register")["max_rho"]
        )

    merged = regs(a).to_frame().join(regs(b), how="outer", lsuffix="_a").max(axis=1)
    whole = regs(t)
    pd.testing.assert_series_equal(
        merged.sort_index(), whole.sort_index().astype(float), check_names=False
    )

    est = hll_estimate(
        whole.reset_index().rename(columns={"max_rho": "max_rho"}), p=10
    )["estimate"].iloc[0]
    true = len(set(t["user_id"].to_pylist()))
    assert abs(est - true) / true < 3 * 1.04 / np.sqrt(1 << 10)


def test_hll_fnv_hash_path(ray_session):
    """The vectorized production hash produces a valid sketch too
    (estimate sane; registers differ from md5 by design)."""
    from pregel_ray.ops.sketch import hll_estimate, hll_registers

    t = _events(n=5000, users=700)
    regs = hll_registers(rd.from_arrow(t), "user_id", p=10,
                         hash_fn="fnv").to_pandas()
    est = hll_estimate(regs, p=10)["estimate"].iloc[0]
    true = len(set(t["user_id"].to_pylist()))
    assert abs(est - true) / true < 3 * 1.04 / np.sqrt(1 << 10)


# -------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives(ray_session):
    from pregel_ray.ops.sketch import bloom_build, bloom_contains

    keys = pa.table({"k": pa.array(np.arange(0, 5000, 2))})  # evens
    bm = bloom_build(rd.from_arrow(keys).repartition(4), ["k"], num_bits=1 << 16)
    probe = pa.table({"k": pa.array(np.arange(5000))})
    mask = bloom_contains(probe, ["k"], bm, 1 << 16)
    assert mask[::2].all()  # every member present
    # false-positive rate on the odd half is small but nonzero
    fp = mask[1::2].mean()
    assert fp < 0.05


def test_bucketed_join_bloom_identical(ray_session):
    """inner/semi results are bit-identical with the Bloom pre-filter,
    and the filter really prunes the shuffle input."""
    from pregel_ray.agg import bucketed_join
    from pregel_ray.ops.sketch import bloom_build, bloom_contains

    rng = np.random.default_rng(3)
    left = pa.table(
        {"k": pa.array(rng.integers(0, 10_000, 20_000)),
         "v": pa.array(rng.integers(0, 100, 20_000))}
    )
    right = pa.table(
        {"k": pa.array(rng.integers(0, 300, 500)),  # selective: few keys
         "w": pa.array(rng.integers(0, 9, 500))}
    )

    def run(how, bits):
        return (
            bucketed_join(
                rd.from_arrow(left), rd.from_arrow(right), ["k"],
                how=how, num_buckets=8, bloom_bits=bits,
            )
            .to_pandas()
            .sort_values(["k", "v"] + (["w"] if how == "inner" else []))
            .reset_index(drop=True)
        )

    for how in ("inner", "semi"):
        pd.testing.assert_frame_equal(run(how, None), run(how, 1 << 16))

    bm = bloom_build(rd.from_arrow(right.select(["k"])), ["k"], 1 << 16)
    kept = bloom_contains(left, ["k"], bm, 1 << 16).sum()
    assert kept < len(left) * 0.2  # ≥80% of left pruned pre-shuffle


# -------------------------------------- sessionize / exact_quantiles


def test_sessionize_vs_pandas_oracle(ray_session):
    """Independent per-user oracle loop, covering ties (same ts) and an
    exactly-30-minute gap (NOT a new session — strict >)."""
    from pregel_ray.ops.relational import sessionize

    rows = []
    base = pd.Timestamp("2024-05-01")
    # user 1: gap exactly 30 min (same session), then 30 min + 1 s (new)
    rows += [(1, 1, base), (2, 1, base + pd.Timedelta(minutes=30)),
             (3, 1, base + pd.Timedelta(minutes=60, seconds=1))]
    # user 2: tie timestamps — event_id breaks the order
    rows += [(5, 2, base), (4, 2, base), (6, 2, base + pd.Timedelta(hours=2))]
    rng = np.random.default_rng(11)
    for i in range(400):
        rows.append(
            (100 + i, int(rng.integers(3, 20)),
             base + pd.Timedelta(seconds=int(rng.integers(0, 200_000))))
        )
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    got = (
        sessionize(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            by="user_id", ts_col="ts", gap=pd.Timedelta(minutes=30),
            tiebreak="event_id", num_buckets=4,
        )
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )

    want = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        sid, start, last, n = 0, None, None, 0
        for _, r in g.iterrows():
            if last is None or r["ts"] - last > pd.Timedelta(minutes=30):
                if last is not None:
                    want.append((uid, sid, start, end, n))
                sid, start, n = sid + 1, r["ts"], 0
            n += 1
            last, end = r["ts"], r["ts"]
        want.append((uid, sid, start, end, n))
    want = (
        pd.DataFrame(
            want,
            columns=["user_id", "session_id", "session_start",
                     "session_end", "n_events"],
        )
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"session_id": np.int64, "n_events": np.int64}), want
    )
    # the hand-built cases: user 1 → 2 sessions, user 2 → 2 sessions
    assert got[got.user_id == 1]["session_id"].max() == 2
    assert got[got.user_id == 2]["session_id"].max() == 2


def test_approx_quantiles_dkw_bound(ray_session):
    """Sampled quantiles land within the DKW rank envelope of the true
    quantiles: with s sample rows, P(sup|F_s - F| > ε) ≤ 2e^(-2sε²) —
    ε for 99.9% confidence. Checked on a continuous (all-distinct)
    column, the regime exact_quantiles can't serve."""
    from pregel_ray.ops.relational import approx_quantiles

    rng = np.random.default_rng(9)
    n = 200_000
    vals = rng.standard_normal(n)
    t = pa.table({"rid": pa.array(np.arange(n)), "v": pa.array(vals)})
    got = (
        approx_quantiles(rd.from_arrow(t).repartition(8), "v",
                         [100, 250, 500, 750, 900], key="rid",
                         sample_permille=100)
        .to_pandas()
        .sort_values("q_permille")
    )
    s = np.sort(vals)
    samp_n = n // 10
    eps = np.sqrt(np.log(2 / 0.001) / (2 * samp_n))
    for q, v in zip(got["q_permille"], got["value"]):
        # rank of the estimate in the TRUE distribution vs target rank
        rank = np.searchsorted(s, v) / n
        assert abs(rank - q / 1000) < eps + 1e-3, (q, rank)


def test_exact_quantiles_vs_numpy(ray_session):
    from pregel_ray.ops.relational import exact_quantiles

    rng = np.random.default_rng(5)
    vals = rng.integers(1, 51, 30_000).astype(float)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(6)
    got = (
        exact_quantiles(ds, "v", [250, 500, 750, 990])
        .to_pandas()
        .sort_values("q_permille")
        .reset_index(drop=True)
    )
    s = np.sort(vals)
    for q, v in zip(got["q_permille"], got["value"]):
        assert v == s[(len(s) - 1) * q // 1000]


def test_exact_quantiles_by_vs_numpy(ray_session):
    from pregel_ray.ops.relational import exact_quantiles_by

    rng = np.random.default_rng(6)
    n = 20_000
    grp = rng.integers(0, 4, n)
    vals = (rng.integers(1, 51, n) * (grp + 1)).astype(float)
    ds = rd.from_arrow(
        pa.table({"g": pa.array([f"g{i}" for i in grp]), "v": pa.array(vals)})
    ).repartition(5)
    got = exact_quantiles_by(ds, "v", [250, 500, 750, 990], by=["g"]).to_pandas()
    assert len(got) == 4 * 4
    for gi in range(4):
        s = np.sort(vals[grp == gi])
        rows = got[got["g"] == f"g{gi}"].set_index("q_permille")
        for q in (250, 500, 750, 990):
            assert rows.loc[q, "value"] == s[(len(s) - 1) * q // 1000], (gi, q)


# ----------------------------------------------------- heavy hitters


def _hh_truth(vals: np.ndarray, k: int) -> pd.DataFrame:
    """Exact top-k by (count desc, value asc) — the oracle's tiebreak."""
    vc = pd.Series(vals).value_counts().rename_axis("v").reset_index(name="cnt")
    vc = vc.sort_values(["cnt", "v"], ascending=[False, True], kind="mergesort")
    return vc.head(k).reset_index(drop=True)


def test_heavy_hitters_exact_regime(ray_session):
    """capacity >= distinct: no compression ever fires, result == exact
    top-k with the (cnt desc, value asc) tiebreak — the oracle regime."""
    from pregel_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    vals = np.repeat(np.arange(60), rng.integers(1, 50, 60))
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(7)
    got = heavy_hitters(ds, "v", k=10, capacity=64).to_pandas()
    want = _hh_truth(vals, 10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"v": np.int64, "cnt": np.int64}),
        want.astype({"v": np.int64, "cnt": np.int64}),
    )


def test_heavy_hitters_exact_regime_layout_independent(ray_session):
    """Same multiset, different block layouts → identical result."""
    from pregel_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 40, 2000)
    a = heavy_hitters(
        rd.from_arrow(pa.table({"v": vals})).repartition(2), "v", k=8,
        capacity=64,
    ).to_pandas()
    b = heavy_hitters(
        rd.from_arrow(pa.table({"v": vals})).repartition(13), "v", k=8,
        capacity=64,
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_heavy_hitters_sketch_regime_bound(ray_session):
    """Tight capacity: compression fires; every estimate satisfies
    est <= true <= est + bound, and the true heavy value survives."""
    from pregel_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(5)
    # one 25% heavy value + a 500-value tail: far over capacity=16
    vals = np.concatenate([np.full(1000, 9999), rng.integers(0, 500, 3000)])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(6)
    out, bound = heavy_hitters(ds, "v", k=5, capacity=16, return_bound=True)
    got = out.to_pandas()
    true = pd.Series(vals).value_counts()
    assert bound > 0  # compression actually exercised
    for _, r in got.iterrows():
        t = int(true[r["v"]])
        assert r["cnt"] <= t <= r["cnt"] + bound, (r["v"], r["cnt"], t, bound)
    assert 9999 in set(got["v"])  # freq 25% >> N/(capacity+1)
    # MG guarantee needs the summary itself bounded, not just the top-k
    assert len(got) <= 5


# ----------------------------------------------------- count-min sketch


def test_cms_overestimates_and_exact_without_collisions(ray_session):
    """est >= true always; with width >> distinct and no observed
    collisions, est == true exactly."""
    from pregel_ray.ops.sketch import cms_counters, cms_estimate

    rng = np.random.default_rng(7)
    vals = np.repeat(np.arange(30), rng.integers(1, 40, 30))
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(5)
    counters = cms_counters(ds, "v", depth=4, width=4096)
    true = pd.Series(vals).value_counts()
    qs = list(range(30)) + [777]  # 777 never occurs
    est = cms_estimate(counters, qs, depth=4, width=4096)
    for v, e in zip(qs, est):
        t = int(true.get(v, 0))
        assert e >= t, (v, e, t)
    # 30 distinct into 4096 cells x 4 independent rows: a collision in
    # EVERY row is ~impossible; the min over rows is exact here
    assert all(int(e) == int(true.get(v, 0)) for v, e in zip(qs, est))


def test_cms_merge_law(ray_session):
    """Counters built per half then cms_merge'd == one-pass counters
    (cellwise sums commute)."""
    from pregel_ray.ops.sketch import cms_counters, cms_merge

    rng = np.random.default_rng(13)
    vals = rng.integers(0, 200, 4000)
    whole = rd.from_arrow(pa.table({"v": vals})).repartition(4)
    h1 = rd.from_arrow(pa.table({"v": vals[:1500]})).repartition(3)
    h2 = rd.from_arrow(pa.table({"v": vals[1500:]})).repartition(2)

    def dense(t):
        df = t.to_pandas().sort_values(["d", "cell"]).reset_index(drop=True)
        return df

    one = dense(pa.concat_tables(
        cms_counters(whole, "v", depth=3, width=64)
        .to_pandas().pipe(lambda d: [pa.Table.from_pandas(d)])))
    merged = dense(cms_merge([
        pa.Table.from_pandas(cms_counters(h1, "v", depth=3, width=64).to_pandas()),
        pa.Table.from_pandas(cms_counters(h2, "v", depth=3, width=64).to_pandas()),
    ]))
    pd.testing.assert_frame_equal(
        one.astype(np.int64), merged.astype(np.int64))


def test_cms_layout_independent_and_bound(ray_session):
    """Block layout never changes the counter table; in the collision
    regime (tiny width) estimates still satisfy true <= est <= N."""
    from pregel_ray.ops.sketch import cms_counters, cms_estimate

    rng = np.random.default_rng(29)
    vals = rng.integers(0, 500, 3000)
    a = cms_counters(
        rd.from_arrow(pa.table({"v": vals})).repartition(2), "v",
        depth=4, width=32,
    ).to_pandas().sort_values(["d", "cell"]).reset_index(drop=True)
    b = cms_counters(
        rd.from_arrow(pa.table({"v": vals})).repartition(11), "v",
        depth=4, width=32,
    ).to_pandas().sort_values(["d", "cell"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # per-row totals are all mass: each depth row sums to N
    assert (a.groupby("d")["cnt"].sum() == len(vals)).all()
    true = pd.Series(vals).value_counts()
    est = cms_estimate(pa.Table.from_pandas(a), list(range(500)),
                       depth=4, width=32)
    for v, e in zip(range(500), est):
        assert int(true.get(v, 0)) <= e <= len(vals)


def test_heavy_hitters_by_group_exact_regime(ray_session):
    """Per-group MG with capacity >= per-group distinct == exact top-k
    per group (ROW_NUMBER semantics), layout-independent."""
    from pregel_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(19)
    g = rng.choice(["p", "q", "r"], 4000)
    v = rng.integers(0, 30, 4000)
    t = pa.table({"g": g, "v": v})
    got = (heavy_hitters(rd.from_arrow(t).repartition(6), "v", k=5,
                         capacity=64, by=["g"])
           .to_pandas().sort_values(["g", "cnt", "v"],
                                    ascending=[True, False, True],
                                    ignore_index=True))
    want_rows = []
    df = pd.DataFrame({"g": g, "v": v})
    for key, sub in df.groupby("g"):
        vc = sub["v"].value_counts().rename_axis("v").reset_index(name="cnt")
        vc = vc.sort_values(["cnt", "v"], ascending=[False, True],
                            kind="mergesort").head(5)
        for _, r in vc.iterrows():
            want_rows.append((key, int(r["v"]), int(r["cnt"])))
    want = pd.DataFrame(want_rows, columns=["g", "v", "cnt"]).sort_values(
        ["g", "cnt", "v"], ascending=[True, False, True], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["g", "v", "cnt"]].astype({"v": np.int64, "cnt": np.int64}), want)


def test_heavy_hitters_by_group_sketch_regime(ray_session):
    """Tight per-group capacity: the planted per-group heavy value
    still surfaces; summaries stay <= k rows per group; bound+by raises."""
    import pytest as _pytest

    from pregel_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(31)
    rows_g, rows_v = [], []
    for gi, heavy in (("a", 7000), ("b", 8000)):
        rows_g += [gi] * 1500
        rows_v += [heavy] * 500 + list(rng.integers(0, 400, 1000))
    t = pa.table({"g": rows_g, "v": np.array(rows_v, np.int64)})
    out = heavy_hitters(rd.from_arrow(t).repartition(5), "v", k=3,
                        capacity=16, by=["g"]).to_pandas()
    top = out.sort_values(["g", "cnt"], ascending=[True, False]).groupby(
        "g").head(1)
    assert dict(zip(top["g"], top["v"])) == {"a": 7000, "b": 8000}
    assert out.groupby("g").size().le(3).all()
    with _pytest.raises(ValueError):
        heavy_hitters(rd.from_arrow(t), "v", by=["g"], return_bound=True)
