"""Data-mixing op invariants (ops/mix.py).

Value-exactness vs DuckDB is pinned by the extras gate
(x_doc_split_fractions / x_doc_quota_per_lang / x_doc_mixture_epochs);
these pytests pin the structural invariants, brute-force parity, and
layout independence on the sf0.001 fixture.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _docs():
    from pregel_ray.io_util import read_parquet

    return read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"]
    )


def _h(salt, v):
    return int.from_bytes(
        hashlib.md5(f"{salt}:{v}".encode()).digest()[8:], "little"
    )


def test_split_fractions(ray_session):
    from pregel_ray.ops.mix import split_fractions

    docs = _docs().materialize()
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    out = split_fractions(docs, "doc_id", fr).to_pandas()

    # total partition: every row exactly once, split ∈ names
    assert len(out) == docs.count()
    assert set(out["split"]) <= set(fr)

    # brute-force replay of every assignment
    ppm = out["doc_id"].map(lambda d: _h("split", d) % 1_000_000)
    want = np.where(ppm < 900_000, "train",
                    np.where(ppm < 950_000, "val", "test"))
    assert (out["split"].to_numpy() == want).all()

    # assignment is per-key stable: identical under re-partitioning
    again = (
        split_fractions(docs.repartition(7), "doc_id", fr)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ref = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(again, ref)

    with pytest.raises(ValueError):
        split_fractions(docs, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_fractions(docs, "doc_id", {"a": 1.0, "b": 0.0})


def test_group_quota_sample(ray_session):
    from pregel_ray.ops.mix import group_quota_sample

    docs = _docs().materialize()
    q = 10
    out = (
        group_quota_sample(docs, ["lang"], "doc_id", quota=q)
        .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    assert list(out.columns) == ["doc_id", "lang"]

    # brute force: per lang, the q smallest md5("quota:doc_id")
    epd = docs.to_pandas()
    epd["hv"] = epd["doc_id"].map(
        lambda d: np.uint64(_h("quota", d)))
    brute = (
        epd.sort_values(["hv", "doc_id"], kind="mergesort")
        .groupby("lang", sort=False).head(q)[["doc_id", "lang"]]
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, brute)

    # min(q, group size) rows per group
    got = out.groupby("lang").size()
    sz = epd.groupby("lang").size()
    assert got.eq(sz.clip(upper=q).reindex(got.index)).all()

    # layout independence
    again = (
        group_quota_sample(docs.repartition(9), ["lang"], "doc_id", quota=q)
        .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, out)

    with pytest.raises(ValueError):
        group_quota_sample(docs, ["lang"], "doc_id", quota=0)


def test_mixture_epochs(ray_session):
    from pregel_ray.ops.mix import mixture_epochs

    docs = _docs().materialize()
    weights = {"en": 2.5, "es": 0.25, "zh": 0.0}
    out = (
        mixture_epochs(docs, "doc_id", "lang", weights, default=1.0)
        .to_pandas()
    )

    # per-row replay: reps = floor(w) + [hash ppm < frac(w) ppm]
    epd = docs.to_pandas()
    wppm = {k: int(round(w * 1e6)) for k, w in weights.items()}
    w = epd["lang"].map(lambda g: wppm.get(g, 1_000_000)).to_numpy()
    hv = epd["doc_id"].map(lambda d: _h("mix", d) % 1_000_000).to_numpy()
    reps = w // 1_000_000 + (hv < w % 1_000_000)

    per_doc = out.groupby("doc_id").size().reindex(
        epd["doc_id"], fill_value=0
    ).to_numpy()
    assert (per_doc == reps).all()

    # epoch numbering is dense 0..reps-1 per doc
    mx = out.groupby("doc_id")["epoch"].agg(["min", "max", "size"])
    assert (mx["min"] == 0).all()
    assert (mx["max"] == mx["size"] - 1).all()

    # zh dropped entirely, en at least duplicated
    langs = out.groupby("lang").size()
    assert "zh" not in langs
    n_en = (epd["lang"] == "en").sum()
    assert n_en * 2 <= langs.get("en", 0) <= n_en * 3

    with pytest.raises(ValueError):
        mixture_epochs(docs, "doc_id", "lang", {"en": -1.0})
