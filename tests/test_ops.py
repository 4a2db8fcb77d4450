"""Training-data ops vs straight-line oracles on the sf0.001 test tables."""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_token_counts(docs_ds, docs_pd):
    from pregel_ray.ops.text import token_counts

    got = token_counts(docs_ds).to_pandas().sort_values("doc_id", ignore_index=True)
    want = docs_pd["text"].str.split(" ").map(len)
    assert (got["n_tokens"].to_numpy() == want.to_numpy()).all()


def test_exact_dedup(docs_ds, docs_pd):
    from pregel_ray.ops.dedup import dedup_exact, exact_duplicates

    groups = exact_duplicates(docs_ds).to_pandas()
    fp = docs_pd["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    want = (
        pd.DataFrame({"fp": fp, "doc_id": docs_pd["doc_id"]})
        .groupby("fp")
        .agg(keep_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        .reset_index()
    )
    got = groups.sort_values("fp", ignore_index=True)
    want = want.sort_values("fp", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    survivors = dedup_exact(docs_ds).to_pandas()
    assert sorted(survivors["doc_id"]) == sorted(want["keep_id"])


def test_minhash_lsh_finds_planted_dups(ray_session, docs_pd):
    """Planted byte-identical copies have identical minhash → must appear as
    candidates and verify at jaccard 1.0; near-copies (one word changed)
    must verify above 0.7."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.dedup import minhash_lsh_candidates, ngram_jaccard_verify

    base = docs_pd.head(200).copy()
    exact = base.head(10).copy()
    exact["doc_id"] = exact["doc_id"] + 10_000
    near = base.iloc[10:20].copy()
    near["doc_id"] = near["doc_id"] + 20_000
    near["text"] = near["text"].str.replace(r"^\w+", "zzz", n=1, regex=True)
    docs = rd.from_arrow(pa.Table.from_pandas(pd.concat([base, exact, near]),
                                              preserve_index=False))

    cand = minhash_lsh_candidates(docs, num_perm=32, bands=8)
    verified = ngram_jaccard_verify(docs, cand, threshold=0.7).to_pandas()
    got_pairs = set(zip(verified["a"], verified["b"])) if len(verified) else set()
    for i in range(10):
        a = int(base["doc_id"].iloc[i])
        assert (a, a + 10_000) in got_pairs, f"missed exact dup {a}"
    exact_rows = verified[verified["b"] - verified["a"] == 10_000]
    assert len(exact_rows) >= 10 and (exact_rows["jac_ppm"] == 1_000_000).all()


def test_dedup_clusters_transitive(ray_session, docs_pd):
    """A chain a~b, b~c (no direct a~c pair) must land in ONE cluster with
    keep = min doc_id; untouched docs keep themselves."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.dedup import dedup_clusters

    docs = rd.from_arrow(
        pa.Table.from_pandas(docs_pd.head(50), preserve_index=False)
    )
    pairs = rd.from_arrow(
        pa.table({"a": pa.array([3, 7, 20], pa.int64()),
                  "b": pa.array([7, 11, 21], pa.int64())})
    )
    out = dedup_clusters(docs, pairs).to_pandas()
    keep = dict(zip(out["doc_id"], out["keep_id"]))
    assert keep[3] == keep[7] == keep[11] == 3  # chain collapses to min
    assert keep[20] == keep[21] == 20
    untouched = [i for i in range(50) if i not in (3, 7, 11, 20, 21)]
    assert all(keep[i] == i for i in untouched)


def test_simhash_identical_zero_distance(docs_ds, docs_pd):
    from pregel_ray.ops.dedup import simhash_near_dups

    pairs = simhash_near_dups(docs_ds, max_hamming=0).to_pandas()
    fp = docs_pd["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    counts = fp.value_counts()
    n_dup_pairs = int(sum(c * (c - 1) // 2 for c in counts[counts > 1]))
    assert len(pairs) >= n_dup_pairs


def test_brute_topk_matches_numpy(ray_session, docs_ds):
    import ray.data as rd

    from pregel_ray.ops.ann import brute_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    epd = emb.to_pandas()
    mat = np.stack(epd["embedding"].to_numpy()).astype(np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q_ids = np.array([0, 1, 2])
    queries = mat[q_ids]

    got = brute_topk(emb, queries, q_ids, k=5).to_pandas()
    for qi in q_ids:
        sims = matn[qi] @ matn.T
        order = np.lexsort((epd["vec_id"].to_numpy(), -sims))[:5]
        want_ids = epd["vec_id"].to_numpy()[order]
        g = got[got["query_id"] == qi].sort_values("rank")
        np.testing.assert_array_equal(g["vec_id"].to_numpy(), want_ids)


def test_ivf_recall_reasonable(ray_session):
    import ray.data as rd

    from pregel_ray.ops.ann import brute_topk, ivf_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    epd = emb.to_pandas()
    mat = np.stack(epd["embedding"].to_numpy()).astype(np.float64)
    q_ids = np.arange(5)
    exact = brute_topk(emb, mat[q_ids], q_ids, k=10).to_pandas()
    approx = ivf_topk(emb, mat[q_ids], q_ids, k=10, n_centroids=8, nprobe=3).to_pandas()
    recalls = []
    for qi in q_ids:
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_embedding_near_dups_self(ray_session):
    """Append exact copies of some vectors; near-dup must find them."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pregel_ray.ops.dedup import embedding_near_dups

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    dup = tbl.slice(0, 5).set_column(
        tbl.schema.get_field_index("vec_id"), "vec_id",
        pa.array(np.arange(100000, 100005, dtype=np.int64)),
    )
    ds = rd.from_arrow(pa.concat_tables([tbl, dup]))
    pairs = embedding_near_dups(ds, threshold=0.999).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    for i in range(5):
        assert (i, 100000 + i) in found


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from pregel_ray.ops.multimodal import media_features, synth_media

    media = rd.from_arrow(synth_media(48))
    out = media_features(media, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 48
    assert out["decoded"].all()
    assert out["feature"].map(len).eq(16).all()
    # determinism: same payload → same feature
    out2 = media_features(rd.from_arrow(synth_media(48)), concurrency=2).to_pandas()
    a = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["feature"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_asof_join_matches_merge_asof(ray_session):
    """Bucketed as-of join vs a single global pandas merge_asof."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from pregel_ray.ops.relational import error_click_asof

    got = error_click_asof(SF).to_pandas().sort_values(
        "event_id", ignore_index=True
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    errors = ev[ev["event_type"] == "error"][["event_id", "ts", "user_id"]]
    clicks = ev[ev["event_type"] == "click"][["ts", "user_id"]]
    want = pd.merge_asof(
        errors.sort_values("ts"),
        clicks.sort_values("ts").rename(columns={"ts": "click_ts"}),
        left_on="ts", right_on="click_ts", by="user_id", direction="backward",
    )
    want = want[want["click_ts"].notna()].sort_values("event_id", ignore_index=True)
    # Schema must survive the tagged-union path: pandas considers 1.0 == 1,
    # so a dtype-blind compare would hide int64→double widening (the round-2
    # events_error_click_asof hash-fail).
    assert got["event_id"].dtype == errors["event_id"].dtype, got.dtypes
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "click_ts"]],
        want[["event_id", "user_id", "click_ts"]],
        check_dtype=False,
    )


def test_events_sliding_covers_hourly(ray_session):
    """Every event lands in exactly `window` sliding windows: total count
    across windows = 3 × event count; window (t) count = sum of hourly
    counts of hours t..t+2."""
    import pyarrow.parquet as pq

    from pregel_ray.ops.relational import events_sliding

    got = events_sliding(SF, 3).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert got["n"].sum() == 3 * len(ev)

    hourly = ev.groupby([ev["event_type"], ev["ts"].dt.floor("h")]).size()
    some = got.sample(20, random_state=1)
    for _, row in some.iterrows():
        expect = sum(
            hourly.get((row["event_type"], row["wstart"] + pd.Timedelta(hours=k)), 0)
            for k in range(3)
        )
        assert row["n"] == expect, (row["event_type"], row["wstart"])


def test_frame_sample_plumbing(ray_session):
    import ray.data as rd

    from pregel_ray.ops.multimodal import frame_sample, synth_media

    media = rd.from_arrow(synth_media(12))
    out = frame_sample(media, every_k=4, n_frames=16).to_pandas()
    assert len(out) == 12 * 4  # frames 0,4,8,12 per item
    assert sorted(out["frame_idx"].unique()) == [0, 4, 8, 12]
    assert out["frame"].map(len).eq(16 * 16 * 3).all()
    # determinism: same payloads → same sampled frames
    out2 = frame_sample(rd.from_arrow(synth_media(12)), every_k=4).to_pandas()
    a = out.sort_values(["media_id", "frame_idx"])["frame"].tolist()
    b = out2.sort_values(["media_id", "frame_idx"])["frame"].tolist()
    assert a == b


def test_langid_and_quality(docs_ds, docs_pd):
    """Vectorized ops vs a straight per-row reimplementation of the spec."""
    import re

    from pregel_ray.ops.text import STOPWORDS, LangId, langid, quality_scores

    l = langid(docs_ds).to_pandas().sort_values("doc_id", ignore_index=True)
    q = quality_scores(docs_ds).to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(l) == len(q) == len(docs_pd)

    texts = docs_pd.sort_values("doc_id")["text"].tolist()
    for i, text in enumerate(texts[:100]):
        hits = {lang: sum(g in text for g in grams) for lang, grams in LangId.PROFILES}
        best = max(hits.values())
        pred = next((la for la, h in hits.items() if h == best), "und") if best else "und"
        assert l["lang_pred"].iloc[i] == pred
        assert l["lang_hits"].iloc[i] == best

        toks = re.findall(r"[a-z]+", text.lower())
        n_words, n_stop = len(toks), sum(t in STOPWORDS for t in toks)
        sum_len = sum(map(len, toks))
        n = max(n_words, 1)
        stop_x = min(n_stop * 1_000_000 // n, 600_000)
        dev = min(abs(sum_len - 5 * n) * 1_000_000 // n, 5_000_000)
        row = q.iloc[i]
        assert (row["n_words"], row["n_stop"], row["sum_len"]) == (n_words, n_stop, sum_len)
        assert row["quality_ppm"] == stop_x * 5 // 6 + (5_000_000 - dev) // 10


def test_asof_join_forward_matches_merge_asof(ray_session):
    """direction='forward' bucketed as-of vs a global pandas merge_asof."""
    import pyarrow.parquet as pq

    from pregel_ray.ops.relational import error_next_click_asof

    got = error_next_click_asof(SF).to_pandas().sort_values(
        "event_id", ignore_index=True
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    errors = ev[ev["event_type"] == "error"][["event_id", "ts", "user_id"]]
    clicks = ev[ev["event_type"] == "click"][["ts", "user_id"]]
    want = pd.merge_asof(
        errors.sort_values("ts"),
        clicks.sort_values("ts").rename(columns={"ts": "click_ts"}),
        left_on="ts", right_on="click_ts", by="user_id", direction="forward",
    )
    want = want[want["click_ts"].notna()].sort_values("event_id", ignore_index=True)
    assert got["event_id"].dtype == errors["event_id"].dtype, got.dtypes
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "click_ts"]],
        want[["event_id", "user_id", "click_ts"]],
        check_dtype=False,
    )


def test_range_join_matches_bruteforce(ray_session):
    """Vectorized bucketed range join vs a brute-force pandas merge+filter,
    on a synthetic frame engineered for edge cases: empty ranges, full-key
    ranges, duplicate right values, keys present on only one side."""
    import ray.data as rd

    from pregel_ray.ops.relational import range_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.choice(["u1", "u2", "u3", "only_left"], 300),
            "lo": rng.integers(0, 80, 300),
            "lid": np.arange(300),
        }
    )
    left["hi"] = left["lo"] + rng.integers(0, 25, 300)  # some empty ranges
    right = pd.DataFrame(
        {
            "k": rng.choice(["u1", "u2", "u3", "only_right"], 500),
            "pos": rng.integers(0, 100, 500),  # duplicates guaranteed
            "rv": rng.random(500),
        }
    )
    got = (
        range_join(
            rd.from_pandas(left), rd.from_pandas(right), by="k",
            left_lo="lo", left_hi="hi", right_on="pos",
            right_cols={"pos": "pos", "rv": "rv"}, num_buckets=8,
        )
        .to_pandas()
        .sort_values(["lid", "pos", "rv"], ignore_index=True)
    )
    brute = left.merge(right, on="k")
    brute = brute[(brute["pos"] >= brute["lo"]) & (brute["pos"] <= brute["hi"])]
    brute = brute.sort_values(["lid", "pos", "rv"], ignore_index=True)
    assert len(got) == len(brute)
    pd.testing.assert_frame_equal(
        got[["k", "lo", "lid", "hi", "pos", "rv"]],
        brute[["k", "lo", "lid", "hi", "pos", "rv"]],
        check_dtype=False,
    )


def test_error_clicks_1h_range_vs_duckdb(ray_session):
    import duckdb

    from pregel_ray.ops.relational import error_clicks_1h_range

    got = error_clicks_1h_range(SF).to_pandas().sort_values(
        "event_id", ignore_index=True
    )
    want = duckdb.sql(
        f"""
        SELECT e.event_id, COUNT(*) AS n_clicks_1h
        FROM (SELECT event_id, ts, user_id
              FROM read_parquet('{SF}/events.parquet')
              WHERE event_type = 'error') e
        JOIN (SELECT ts, user_id FROM read_parquet('{SF}/events.parquet')
              WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND c.ts BETWEEN e.ts - INTERVAL '1 hour' AND e.ts
        GROUP BY e.event_id ORDER BY e.event_id
        """
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["n_clicks_1h"].tolist() == want["n_clicks_1h"].tolist()


def test_asof_join_nearest_and_tolerance(ray_session):
    """Random int-keyed data through direction='nearest' and a backward
    tolerance bound, vs global pandas merge_asof (the untested corners of
    the direction/tolerance matrix)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import asof_join

    rng = np.random.default_rng(23)
    nl, nr = 800, 600
    left = pd.DataFrame(
        {
            "lid": np.arange(nl),
            "t": rng.integers(0, 10_000, nl),
            "g": rng.integers(0, 25, nl),
        }
    )
    right = pd.DataFrame(
        {
            "t": rng.integers(0, 10_000, nr),
            "g": rng.integers(0, 25, nr),
            "rv": rng.integers(0, 1_000_000, nr),
        }
    )
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))

    for direction, tol in [("nearest", None), ("backward", 100)]:
        got = (
            asof_join(lds, rds, on="t", by="g",
                      right_cols={"t": "rt", "rv": "rv"},
                      direction=direction, tolerance=tol, num_buckets=8)
            .to_pandas()
            .sort_values("lid", ignore_index=True)
        )
        want = pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t", kind="mergesort").rename(
                columns={"t": "rt"}),
            left_on="t", right_on="rt", by="g",
            direction=direction, tolerance=tol,
        )
        want = want[want["rt"].notna()].sort_values("lid", ignore_index=True)
        assert got["rv"].dtype == right["rv"].dtype, (direction, got.dtypes)
        pd.testing.assert_frame_equal(
            got[["lid", "t", "g", "rt", "rv"]],
            want[["lid", "t", "g", "rt", "rv"]],
            check_dtype=False,
        )


def test_inverted_index_and_keyword_search(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import build_inverted_index, keyword_search

    texts = ["a b c", "b c d", "a a c", "d", "", "c b a"]
    t = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(3)

    posts = build_inverted_index(ds).to_pandas()
    want = {(tok, i) for i, x in enumerate(texts) for tok in set(x.split(" "))}
    assert set(zip(posts["token"], posts["doc_id"])) == want  # distinct pairs

    got = sorted(keyword_search(ds, ["a", "c"]).to_pandas()["doc_id"])
    assert got == [0, 2, 5]
    assert sorted(keyword_search(ds, ["d"]).to_pandas()["doc_id"]) == [1, 3]


def test_grouped_topk_vs_pandas(ray_session):
    import numpy as np
    import ray.data as rd

    from pregel_ray.ops.text import grouped_topk

    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 300),
            "id": np.arange(300),
            "v": rng.randint(0, 40, 300),  # ties likely
        }
    )
    got = (
        grouped_topk(rd.from_pandas(df).repartition(5), ["g"], "v", 4, "id")
        .to_pandas().sort_values(["g", "v", "id"],
                                 ascending=[True, False, True],
                                 ignore_index=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False, as_index=False).head(4)
        .sort_values(["g", "v", "id"], ascending=[True, False, True],
                     ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[["g", "id", "v"]],
                                  want[["g", "id", "v"]].astype(got[["g", "id", "v"]].dtypes.to_dict()))


def test_tfidf_top_terms_vs_pandas(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import tfidf_top_terms

    texts = ["a a b c", "b c d", "a d d e", "c c c", "e f", "a b"]
    t = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    got = (
        tfidf_top_terms(rd.from_arrow(t).repartition(3), k=2)
        .to_pandas().sort_values(["doc_id", "score_ppm", "token"],
                                 ascending=[True, False, True],
                                 ignore_index=True)
    )

    # independent oracle
    rows = []
    n = len(texts)
    df_counts = {}
    for x in texts:
        for tok in set(x.split(" ")):
            df_counts[tok] = df_counts.get(tok, 0) + 1
    for i, x in enumerate(texts):
        tf = {}
        for tok in x.split(" "):
            tf[tok] = tf.get(tok, 0) + 1
        scored = sorted(
            ((int(np.floor(c * np.log(n / df_counts[tok]) * 1_000_000.0)), tok)
             for tok, c in tf.items()),
            key=lambda p: (-p[0], p[1]),
        )[:2]
        for s, tok in scored:
            rows.append((i, tok, s))
    want = pd.DataFrame(rows, columns=["doc_id", "token", "score_ppm"]).sort_values(
        ["doc_id", "score_ppm", "token"], ascending=[True, False, True],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_bigram_lm_scores_vs_python(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import bigram_lm_scores

    texts = ["a b a b c", "b c d a", "a a a", "x", "c d c d"]
    t = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    got = (
        bigram_lm_scores(rd.from_arrow(t).repartition(3))
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )

    # independent oracle
    cb, c1, vocab = {}, {}, set()
    for x in texts:
        w = x.split(" ")
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = float(len(vocab))
    rows = []
    for i, x in enumerate(texts):
        w = x.split(" ")
        if len(w) < 2:
            continue
        s = sum(
            int(np.floor(np.log((cb[(a, b)] + 1.0) / (c1[a] + V)) * 1_000_000.0))
            for a, b in zip(w, w[1:])
        )
        rows.append((i, len(w) - 1, s))
    want = pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "lm_ppm"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert 3 not in got["doc_id"].tolist()  # single-token doc has no row


def test_new_text_ops_degenerate_inputs(ray_session):
    """Empty and single-doc corpora must not crash the round-4 text ops."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import (bigram_lm_scores, grouped_topk,
                                     keyword_search, tfidf_top_terms)

    one = pa.table({"doc_id": pa.array([7]), "text": pa.array(["solo"])})
    ds1 = rd.from_arrow(one)
    assert keyword_search(ds1, ["solo"]).to_pandas()["doc_id"].tolist() == [7]
    assert keyword_search(ds1, ["absent"]).count() == 0
    t1 = tfidf_top_terms(ds1).to_pandas()
    assert t1["token"].tolist() == ["solo"] and t1["score_ppm"].tolist() == [0]
    assert bigram_lm_scores(ds1).count() == 0  # no bigrams in a 1-token doc

    g1 = pa.table({"g": pa.array(["x"]), "id": pa.array([1]), "v": pa.array([5])})
    gt = grouped_topk(rd.from_arrow(g1), ["g"], "v", 3, "id").to_pandas()
    assert gt["id"].tolist() == [1]

    # fully empty corpus
    empty = rd.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]).empty_table()
    )
    assert tfidf_top_terms(empty).count() == 0
    assert bigram_lm_scores(empty).count() == 0


def test_keyword_search_empty_terms_is_vacuous_and(ray_session):
    """ADVICE r4: no terms → every document matches (and no unpruned
    corpus index is built); vocab=[] builds an empty index."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import build_inverted_index, keyword_search

    t = pa.table({"doc_id": pa.array([1, 2]), "text": pa.array(["a b", "c"])})
    ds = rd.from_arrow(t)
    assert sorted(keyword_search(ds, []).to_pandas()["doc_id"]) == [1, 2]
    assert build_inverted_index(ds, vocab=[]).count() == 0
    assert build_inverted_index(ds, vocab=None).count() == 3


def _const_codec(payload: bytes, width: int, height: int):
    """Injected 'real' codec for tests: constant image = first payload byte."""
    import numpy as np
    if not payload:
        raise ValueError("empty media payload")
    return np.full((height, width, 3), payload[0], dtype=np.uint8)


def test_multimodal_codec_injection(ray_session):
    """VERDICT r4 #8: a swapped-in codec changes decode output without
    touching pipeline plumbing; frame codec likewise."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.multimodal import (frame_sample, media_features,
                                           synth_media)

    media = rd.from_arrow(synth_media(8))
    default = media_features(media).to_pandas().set_index("media_id")
    injected = media_features(media, codec=_const_codec).to_pandas().set_index(
        "media_id"
    )
    assert injected["decoded"].all()
    # same plumbing, different decode → different features
    assert not np.allclose(
        np.stack(default["feature"].to_numpy()),
        np.stack(injected["feature"].to_numpy()),
    )

    def two_black_frames(payload, n_frames, hw):
        for _ in range(2):
            yield np.zeros((hw, hw, 3), np.uint8)

    fs = frame_sample(media, every_k=1, codec=two_black_frames).to_pandas()
    assert len(fs) == 2 * 8
    assert all(set(b) == {0} for b in fs["frame"])


def test_multimodal_large_payload_small_batches(ray_session):
    """~10 MB payloads through the decode stage at batch_size=2: the
    memory-aware sizing contract (payload x batch x concurrency bounded)
    — completes and every row decodes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.multimodal import MEDIA_SCHEMA, media_features

    n, mb = 6, 10 * 1024 * 1024
    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["image/png"] * n),
            "payload": pa.array([rng.bytes(mb) for _ in range(n)],
                                pa.large_binary()),
            "width": pa.array(np.full(n, 64, np.int32)),
            "height": pa.array(np.full(n, 64, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )
    out = media_features(
        rd.from_arrow(t), concurrency=2, batch_size=2
    ).to_pandas()
    assert len(out) == n and out["decoded"].all()


def test_jaccard_verify_join_path_matches_broadcast(ray_session, docs_pd):
    """The above-cap bucketed-join verify path (with the r5 batch-local
    shingle cache) is value-identical to the broadcast path."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.dedup import minhash_lsh_candidates, ngram_jaccard_verify

    base = docs_pd.head(150).copy()
    near = base.head(30).copy()
    near["doc_id"] = near["doc_id"] + 50_000
    near["text"] = near["text"].str.replace(r"^\w+", "qqq", n=1, regex=True)
    docs = rd.from_arrow(pa.Table.from_pandas(pd.concat([base, near]),
                                              preserve_index=False))
    cand = minhash_lsh_candidates(docs, num_perm=32, bands=8)
    bcast = (
        ngram_jaccard_verify(docs, cand, threshold=0.5)
        .to_pandas().sort_values(["a", "b"], ignore_index=True)
    )
    joined = (
        ngram_jaccard_verify(docs, cand, threshold=0.5, broadcast_pair_cap=0)
        .to_pandas().sort_values(["a", "b"], ignore_index=True)
    )
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, joined)


def test_duplicate_spans_planted(ray_session):
    """Substring-level dedup: planted shared 5-token spans are found with
    exact doc counts / first-doc ids; unique text yields nothing."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.dedup import duplicate_spans

    boiler = "all rights reserved contact us today"  # 6 tokens → 2 grams
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    f"alpha beta {boiler} gamma",
                    f"{boiler} delta epsilon zeta",
                    "totally unique words with no overlap at all here",
                    "short text",
                ]
            ),
        }
    )
    out = (
        duplicate_spans(rd.from_arrow(t), n=5, min_docs=2)
        .to_pandas().sort_values("gram", ignore_index=True)
    )
    assert out["gram"].tolist() == [
        "all rights reserved contact us",
        "rights reserved contact us today",
    ]
    assert out["n_docs"].tolist() == [2, 2]
    assert out["first_doc"].tolist() == [1, 1]

    none = duplicate_spans(
        rd.from_arrow(t.slice(2)), n=5, min_docs=2
    ).to_pandas()
    assert len(none) == 0


def test_contaminated_docs_planted(ray_session):
    """Decontamination: docs sharing a 5-gram with a probe are flagged
    with exact positional hit counts and the lexicographically smallest
    matching gram; clean docs are not flagged."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.dedup import contaminated_docs

    probe = "the quick brown fox jumps over the lazy dog"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    f"intro {probe} outro",          # many overlapping grams
                    "the quick brown fox jumps",      # exactly one 5-gram
                    "quick brown fox walks slowly home today",  # no 5-gram hit
                    "completely unrelated text with different words entirely",
                ]
            ),
        }
    )
    out = (
        contaminated_docs(rd.from_arrow(t), [probe], n=5)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    # doc 1 contains probe verbatim → all 5 of the probe's 5-grams
    assert out["n_hits"].tolist() == [5, 1]
    assert out["example_gram"].iloc[1] == "the quick brown fox jumps"
    # empty probe list flags nothing
    assert contaminated_docs(rd.from_arrow(t), [], n=5).count() == 0


def test_repetition_stats_known_values(ray_session):
    """Repetition ratio: hand-computed duplicated-3-gram fractions."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import repetition_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b c a b c a b",   # 6 grams: abc,bca,cab,abc,bca,cab → all dup
                    "one two three four five",  # 3 grams, all unique
                    "x y",               # < 3 tokens → no row
                ]
            ),
        }
    )
    out = (
        repetition_stats(rd.from_arrow(t), n=3)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_grams"].tolist() == [6, 3]
    assert out["rep_ppm"].tolist() == [1_000_000, 0]


def test_dedup_against_incremental(ray_session):
    """Planted scenario: the new batch repeats two corpus texts verbatim
    and brings two fresh ones — only the fresh ones survive; also checks
    batch-internal duplicates are NOT collapsed (that is dedup_exact's
    job, not the anti join's)."""
    import ray.data as rd

    from pregel_ray.ops.dedup import dedup_against

    corpus = rd.from_items(
        [
            {"doc_id": 1, "text": "the cat sat"},
            {"doc_id": 2, "text": "dogs bark loud"},
            {"doc_id": 3, "text": "the cat sat"},  # corpus-internal dup
        ]
    )
    batch = rd.from_items(
        [
            {"doc_id": 10, "text": "the cat sat"},      # known → dropped
            {"doc_id": 11, "text": "dogs bark loud"},   # known → dropped
            {"doc_id": 12, "text": "fresh text one"},   # new
            {"doc_id": 13, "text": "fresh text two"},   # new
            {"doc_id": 14, "text": "fresh text one"},   # batch-internal dup
        ]
    )
    out = dedup_against(batch, corpus).to_pandas()
    assert sorted(out["doc_id"]) == [12, 13, 14]
    assert (
        out.set_index("doc_id").loc[12, "fp"]
        == hashlib.md5(b"fresh text one").hexdigest()
    )


def test_kmeans_clusters_recovers_planted_clusters(ray_session):
    """3 well-separated spherical clusters → assignment is pure (every
    planted cluster maps to exactly one cluster_id) and cos to the
    assigned centroid is high. Also pins that the refactored
    _fit_centroids keeps ivf/knn behavior: schema + one row per vector."""
    import ray.data as rd

    from pregel_ray.ops.ann import kmeans_clusters

    rng = np.random.default_rng(5)
    centers = np.eye(3)  # orthogonal unit centers
    rows = []
    for ci in range(3):
        pts = centers[ci] + rng.normal(0, 0.05, size=(60, 3))
        for j, p in enumerate(pts):
            rows.append(
                {"vec_id": ci * 1000 + j,
                 "embedding": (p / np.linalg.norm(p)).astype(np.float32)}
            )
    ds = rd.from_pandas(pd.DataFrame(rows))

    out = kmeans_clusters(ds, n_clusters=3, sample_size=180, seed=7).to_pandas()
    assert len(out) == 180
    assert set(out.columns) == {"vec_id", "cluster_id", "cos"}

    out["true"] = out["vec_id"] // 1000
    purity = (
        out.groupby("true")["cluster_id"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
    )
    assert (purity >= 0.95).all(), purity
    assert out.groupby("true")["cluster_id"].nunique().le(2).all()
    assert (out["cos"] > 0.8).mean() > 0.95


def test_collocations_vs_python(ray_session):
    """Planted phrase 'ACME corp' co-occurs far above chance → top PMI;
    every (cxy, pmi_ppm) matches a straight-line numpy recompute."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import collocations

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(80):
        toks = list(rng.choice(vocab, 12))
        if i % 2 == 0:
            toks[3:3] = ["ACME", "corp"]  # planted collocation
        texts.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                  "text": pa.array(texts)})
    got = (collocations(rd.from_arrow(t).repartition(5), k=10, min_count=3)
           .to_pandas())

    # straight-line truth
    bgs = []
    for txt in texts:
        ws = txt.split(" ")
        bgs += list(zip(ws[:-1], ws[1:]))
    N = len(bgs)
    cb = pd.Series(bgs).value_counts()
    c1 = pd.Series([a for a, _ in bgs]).value_counts()
    c2 = pd.Series([b for _, b in bgs]).value_counts()
    rows = []
    for (a, b), cxy in cb.items():
        if cxy >= 3:
            pmi = math.floor(
                math.log(float(cxy) * float(N) / (float(c1[a]) * float(c2[b])))
                * 1_000_000.0)
            rows.append((a, b, int(cxy), pmi))
    want = (pd.DataFrame(rows, columns=["w1", "w2", "cxy", "pmi_ppm"])
            .sort_values(["pmi_ppm", "w1", "w2"],
                         ascending=[False, True, True], kind="mergesort")
            .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert tuple(got.iloc[0][["w1", "w2"]]) == ("ACME", "corp")


def test_collocations_empty_and_short(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import collocations

    one_tok = rd.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array(["solo", "alone"])}))
    assert collocations(one_tok).count() == 0


def test_chunk_documents_vs_python(ray_session):
    """Chunk spans, ids, and re-joined text match a straight-line
    Python chunker; trailing no-new-token windows are suppressed."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.text import chunk_documents

    rng = np.random.default_rng(23)
    texts = [
        " ".join(f"t{j}" for j in range(n))
        for n in [1, 3, 4, 5, 10, 11, 39, 40, 41, 100]
    ] + [" ".join(rng.choice([f"w{i}" for i in range(9)], 57))]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = (chunk_documents(rd.from_arrow(t).repartition(4), size=4, overlap=2)
           .to_pandas()
           .sort_values(["doc_id", "chunk_id"], ignore_index=True))

    rows = []
    for did, txt in enumerate(texts):
        ws = txt.split(" ")
        s, cid = 0, 0
        while True:
            chunk = ws[s:s + 4]
            rows.append((did, cid, len(chunk), " ".join(chunk)))
            if s + 4 >= len(ws):
                break
            s, cid = s + 2, cid + 1
    want = pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "n_tokens", "chunk_text"]
    ).astype({"doc_id": np.int64, "chunk_id": np.int64, "n_tokens": np.int64})
    pd.testing.assert_frame_equal(got, want)
    # overlap invariant: consecutive chunks share exactly `overlap`
    # tokens except the (possibly shorter) tail
    g = want[want["doc_id"] == 10]
    for a, b in zip(g["chunk_text"], g["chunk_text"][1:]):
        assert a.split(" ")[2:] == b.split(" ")[:2]


def test_chunk_documents_validates(ray_session):
    import pytest as _pytest

    from pregel_ray.ops.text import chunk_documents

    with _pytest.raises(ValueError):
        chunk_documents(None, size=4, overlap=4)


def test_build_graph_tables_from_pairs_and_textrank(ray_session, tmp_path):
    """The pairs-level graph-build entry: a hand graph round-trips with
    the partition invariants intact, and TextRank (values pinned by the
    x_doc_textrank_keywords SQL gate row) is cache-stable."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.config import EngineConfig
    from pregel_ray.edges import build_graph_tables_from_pairs, stable_hash
    from pregel_ray.io_util import read_parquet

    pairs = rd.from_arrow(pa.table({
        "src_name": ["a", "b", "c", "a"],
        "dst_name": ["b", "c", "a", "c"],
        "w": [1.0, 2.0, 1.0, 1.0],
    }))
    cfg = EngineConfig(num_parts=4, num_buckets=4)
    gd = str(tmp_path / "g")
    meta = build_graph_tables_from_pairs(pairs, gd, cfg)
    assert meta["n_vertices"] == 3 and meta["n_edges"] == 4
    v = read_parquet(f"{gd}/vertices").to_pandas()
    # invariant: vid = local_rank * P + part, part = stable_hash(name) % P
    for _, r in v.iterrows():
        # NB: int() first — np.uint64 % python-int promotes to float64
        assert r["part"] == int(stable_hash([r["name"]])[0]) % 4
        assert r["vid"] % 4 == r["part"]
    # _SUCCESS short-circuit returns identical meta without rebuilding
    assert build_graph_tables_from_pairs(pairs, gd, cfg) == meta

    from pregel_ray.pipelines import textrank_keywords

    a = textrank_keywords("/root/testdata/sf0.001", k=10).to_pandas()
    b = textrank_keywords("/root/testdata/sf0.001", k=10).to_pandas()
    assert len(a) == 10
    assert (a["rank"].values[:-1] >= a["rank"].values[1:]).all()
    pd.testing.assert_frame_equal(a, b)  # cached graph + deterministic run


def test_pivot_wider_and_unpivot(ray_session):
    """Sum mode, multi-column index, out-of-list pivot values dropped,
    zero fill, and the melt round-trip."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import pivot_wider, unpivot

    t = pa.table({
        "g": ["a", "a", "a", "b", "b", "b"],
        "h": [1, 1, 2, 2, 2, 2],
        "k": ["x", "y", "x", "x", "x", "zzz"],  # zzz not in values
        "v": [10, 20, 30, 1, 2, 99],
    })
    ds = rd.from_arrow(t).repartition(3)
    wide = pivot_wider(ds, ["g", "h"], "k", ["x", "y"], value="v")
    got = (wide.to_pandas().sort_values(["g", "h"], ignore_index=True))
    want = pd.DataFrame({
        "g": ["a", "a", "b"], "h": [1, 2, 2],
        "x": [10, 30, 3], "y": [20, 0, 0],
    }).astype({"h": np.int64, "x": np.int64, "y": np.int64})
    pd.testing.assert_frame_equal(got[["g", "h", "x", "y"]], want)

    # count mode + melt inverse (zeros included)
    cnt = pivot_wider(ds, ["g"], "k", ["x", "y"])
    back = (unpivot(cnt, ["g"], ["x", "y"]).to_pandas()
            .sort_values(["g", "name"], ignore_index=True))
    want2 = pd.DataFrame({
        "g": ["a", "a", "b", "b"], "name": ["x", "y", "x", "y"],
        "value": [2, 1, 2, 0],
    }).astype({"value": np.int64})
    pd.testing.assert_frame_equal(back, want2)


def test_global_ranks_vs_numpy(ray_session):
    """Rank = lexsort position + 1 regardless of block layout; pct_ppm
    is the integer formula; n=1 edge gives pct 0."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import global_ranks

    rng = np.random.default_rng(41)
    v = rng.integers(0, 50, 500).astype(np.float64)  # heavy ties
    ids = np.arange(500, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": ids, "v": v})).repartition(7)
    got = (global_ranks(ds, ["v", "id"], pct=True).to_pandas()
           .sort_values("id", ignore_index=True))
    order = np.lexsort((ids, v))
    want_rnk = np.empty(500, np.int64)
    want_rnk[order] = np.arange(1, 501)
    np.testing.assert_array_equal(got["rnk"].to_numpy(), want_rnk)
    np.testing.assert_array_equal(
        got["rnk_pct_ppm"].to_numpy(), (want_rnk - 1) * 1_000_000 // 499)

    one = rd.from_arrow(pa.table({"id": [1], "v": [2.0]}))
    g1 = global_ranks(one, ["v", "id"], pct=True).to_pandas()
    assert g1["rnk"].iloc[0] == 1 and g1["rnk_pct_ppm"].iloc[0] == 0


def test_histogram_and_group_moments(ray_session):
    """Histogram == numpy bincount with clipped edges; moments give the
    exact variance via (n*s2 - s1^2) / (n^2 * scale^2)."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import group_moments, histogram

    rng = np.random.default_rng(43)
    v = np.concatenate([rng.uniform(0, 100, 2000), [-5.0, 250.0]])  # clips
    ds = rd.from_arrow(pa.table({"v": v})).repartition(5)
    got = histogram(ds, "v", 0.0, 100.0, 10).to_pandas().set_index("bin")["cnt"]
    want = np.bincount(
        np.clip(np.floor(v / 10.0), 0, 9).astype(int), minlength=10)
    for b in range(10):
        assert got.get(b, 0) == want[b], b

    g = np.repeat(["a", "b"], 1000)
    x = np.round(rng.uniform(0, 50, 2000), 2)
    ds2 = rd.from_arrow(pa.table({"g": g, "x": x})).repartition(6)
    m = group_moments(ds2, ["g"], "x", scale=100).to_pandas().set_index("g")
    for key in ("a", "b"):
        xs = np.round(x[g == key] * 100).astype(np.int64)
        assert m.loc[key, "n"] == 1000
        assert m.loc[key, "s1"] == xs.sum()
        assert m.loc[key, "s2"] == (xs * xs).sum()
        n, s1, s2 = (int(m.loc[key, c]) for c in ("n", "s1", "s2"))
        var = (n * s2 - s1 * s1) / (n * n * 100 * 100)
        np.testing.assert_allclose(var, np.var(xs / 100.0), rtol=1e-12)


def test_grouped_ranks_vs_pandas(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import grouped_ranks

    rng = np.random.default_rng(47)
    n = 600
    t = pa.table({
        "g": rng.choice(["x", "y", "z"], n),
        "v": rng.integers(0, 20, n),
        "id": np.arange(n, dtype=np.int64),
    })
    got = (grouped_ranks(rd.from_arrow(t).repartition(5), ["g"],
                         ["v", "id"], pct=True)
           .to_pandas().sort_values("id", ignore_index=True))
    df = t.to_pandas().sort_values(["g", "v", "id"], kind="mergesort")
    df["rnk"] = df.groupby("g").cumcount() + 1
    ng = df.groupby("g")["rnk"].transform("size")
    df["rnk_pct_ppm"] = (df["rnk"] - 1) * 1_000_000 // (ng - 1)
    want = df.sort_values("id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["g", "v", "id", "rnk", "rnk_pct_ppm"]],
        want[["g", "v", "id", "rnk", "rnk_pct_ppm"]].astype(
            {"rnk": np.int64, "rnk_pct_ppm": np.int64}),
    )
    # max rank per group == group size; pct spans [0, 1e6]
    assert (got.groupby("g")["rnk"].max().to_numpy()
            == got.groupby("g").size().to_numpy()).all()
    assert got["rnk_pct_ppm"].max() == 1_000_000


def test_final_session_ops_empty_inputs(ray_session):
    """Every final-session op returns a typed empty result on empty
    input (the repo's classic bug probe: schema-less empty blocks)."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import (global_ranks, group_moments,
                                           grouped_ranks, histogram,
                                           pivot_wider)
    from pregel_ray.ops.sketch import cms_counters, heavy_hitters
    from pregel_ray.ops.text import chunk_documents, collocations

    ev = rd.from_arrow(pa.table(
        {"id": pa.array([], pa.int64()), "v": pa.array([], pa.float64())}))
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert global_ranks(ev, ["v", "id"], pct=True).count() == 0
    assert grouped_ranks(ev, ["id"], ["v"]).count() == 0
    assert pivot_wider(ev, ["id"], "v", ["1.0"]).count() == 0
    assert histogram(ev, "v", 0, 10, 5).count() == 0
    assert group_moments(ev, ["id"], "v").count() == 0
    assert heavy_hitters(ev, "v", k=3, capacity=8).count() == 0
    assert cms_counters(ev, "v", depth=2, width=16).count() == 0
    assert collocations(docs).count() == 0
    assert chunk_documents(docs, size=4, overlap=1).count() == 0


def test_moment_outliers_planted(ray_session):
    """Planted extreme values are flagged; normals aren't; the integer
    decision matches the float z-score; overflow guard raises."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import moment_outliers

    rng = np.random.default_rng(59)
    vals = np.concatenate([rng.normal(100, 5, 500), [400.0, -200.0]])
    ids = np.arange(len(vals), dtype=np.int64)
    g = np.array(["x"] * len(vals))
    ds = rd.from_arrow(pa.table({"id": ids, "g": g, "v": vals})).repartition(4)
    got = moment_outliers(ds, ["g"], "v", scale=100, z=2).to_pandas()
    flagged = set(got["id"])
    assert {500, 501} <= flagged  # the planted extremes
    # float cross-check: every flagged row really is > 2 sigma
    q = np.round(vals * 100)
    mu, sd = q.mean(), q.std()
    for i in flagged:
        assert abs(q[i] - mu) > 2 * sd, i
    for i in set(ids) - flagged:
        assert abs(q[i] - mu) <= 2 * sd, i

    big = rd.from_arrow(pa.table({
        "id": pa.array(range(4), pa.int64()), "g": ["a"] * 4,
        "v": [1e9, 2e9, 3e9, 4e9]}))
    with pytest.raises(Exception, match="lower `scale`"):
        moment_outliers(big, ["g"], "v", scale=100, z=2).count()


def test_count_distinct_lag_setops(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.relational import (group_count_distinct,
                                           table_except, table_intersect,
                                           with_lag)

    rng = np.random.default_rng(61)
    t = pa.table({
        "u": rng.integers(0, 20, 800),
        "ty": rng.choice(["a", "b", "c", "d"], 800),
        "ts": np.arange(800, dtype=np.int64),
        "v": rng.integers(0, 100, 800).astype(np.float64),
    })
    ds = rd.from_arrow(t).repartition(5)
    df = t.to_pandas()

    got = (group_count_distinct(ds, ["u"], "ty")
           .to_pandas().set_index("u")["n_distinct"])
    want = df.groupby("u")["ty"].nunique()
    for u in want.index:
        assert got[u] == want[u], u

    lag = (with_lag(ds, ["u"], ["ts"], "v")
           .to_pandas().sort_values("ts", ignore_index=True))
    want_lag = df.sort_values("ts")
    want_lag["lag_v"] = want_lag.groupby("u")["v"].shift(1)
    pd.testing.assert_series_equal(
        lag["lag_v"], want_lag.reset_index(drop=True)["v"].groupby(
            want_lag.reset_index(drop=True)["u"]).shift(1).rename("lag_v"))

    a = rd.from_arrow(pa.table({"x": ["p", "q", "r", "p"], "y": [1, 2, 3, 1]}))
    b = rd.from_arrow(pa.table({"x": ["q", "r", "s"], "y": [2, 99, 3]}))
    i = set(map(tuple, table_intersect(a, b, ["x", "y"]).to_pandas().values))
    e = set(map(tuple, table_except(a, b, ["x", "y"]).to_pandas().values))
    assert i == {("q", 2)}
    assert e == {("p", 1), ("r", 3)}


def test_clustering_coefficient_hand_graph(ray_session):
    """K4 + a pendant: known coefficients (K4 members cc=1 before the
    pendant; the attachment vertex has d=4, T=3 → 500000 ppm)."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.agg import bucketed_join
    from pregel_ray.algorithms.triangles import triangle_counts

    # K4 on vids 0-3 plus pendant 4 attached to 0
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in e], pa.int64()),
        "dst": pa.array([b for _, b in e], pa.int64()),
        "w": pa.array([1.0] * len(e)),
    }))
    pv, degrees = triangle_counts(edges, num_buckets=4, return_degrees=True)
    d = degrees.to_pandas().set_index("vid")["count()"]
    t = pv.to_pandas().set_index("vid")["triangles"]
    assert d.to_dict() == {0: 4, 1: 3, 2: 3, 3: 3, 4: 1}
    assert t.to_dict() == {0: 3, 1: 3, 2: 3, 3: 3}
    # cc: vertices 1-3 → 2*3/(3*2) = 1.0; vertex 0 → 2*3/(4*3) = 0.5
    for v in (1, 2, 3):
        assert (2 * t[v] * 1_000_000) // (d[v] * (d[v] - 1)) == 1_000_000
    assert (2 * t[0] * 1_000_000) // (d[0] * (d[0] - 1)) == 500_000


def test_assortativity_moments_star_vs_cycle(ray_session):
    """Known-signed graphs: a star is perfectly disassortative
    (r = -1 for the 2-point degree distribution), a cycle has zero
    degree variance; moments match direct numpy computation."""
    import math

    import pyarrow as pa
    import ray.data as rd

    # reuse the pipeline's internal shape through the fixture-free parts
    from pregel_ray.agg import bucketed_join, distinct, group_count
    from pregel_ray.algorithms.triangles import _canonical

    def moments(edge_list):
        # direct truth
        deg = {}
        und = set()
        for a, b in edge_list:
            if a == b:
                continue
            und.add((min(a, b), max(a, b)))
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs, ys = [], []
        for a, b in und:
            xs += [deg[a], deg[b]]
            ys += [deg[b], deg[a]]
        xs, ys = np.array(xs), np.array(ys)
        return (len(xs), xs.sum(), (xs * xs).sum(), (xs * ys).sum())

    star = [(0, i) for i in range(1, 6)]
    m, sx, sxx, sxy = moments(star)
    r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert math.isclose(r, -1.0)

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    cm, csx, csxx, _ = moments(cyc)
    assert cm * csxx - csx * csx == 0  # zero degree variance → r undefined

    # and the distributed moment path agrees on the star
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in star], pa.int64()),
        "dst": pa.array([b for _, b in star], pa.int64()),
        "w": pa.array([1.0] * len(star)),
    }))
    simple = distinct(edges.map_batches(_canonical, batch_format="pyarrow"),
                      ["a", "b"], num_buckets=4).materialize()

    def _endpoints(t):
        v = pa.concat_arrays([t["a"].combine_chunks().cast(pa.int64()),
                              t["b"].combine_chunks().cast(pa.int64())])
        return pa.table({"vid": v})

    degrees = group_count(simple.map_batches(_endpoints,
                                             batch_format="pyarrow"),
                          ["vid"], alias="d", num_buckets=4)

    def _orient(t):
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"x": pa.concat_arrays([a, b]),
                         "y": pa.concat_arrays([b, a])})

    arcs = simple.map_batches(_orient, batch_format="pyarrow")
    j1 = bucketed_join(arcs, degrees, left_on=["x"], right_on=["vid"],
                       num_buckets=4)
    j1 = j1.map_batches(lambda t: t.rename_columns(
        [{"d": "dx"}.get(c, c) for c in t.column_names]),
        batch_format="pyarrow")
    j2 = bucketed_join(j1, degrees, left_on=["y"], right_on=["vid"],
                       num_buckets=4).to_pandas()
    dx, dy = j2["dx"].to_numpy(), j2["d"].to_numpy()
    assert len(dx) == 10 and dx.sum() == sx
    assert (dx * dx).sum() == sxx and (dx * dy).sum() == sxy


def test_dedup_exact_keep_longest(ray_session):
    """Planted truncation pairs share a normalized fingerprint; the
    longest raw text survives (tie: min doc_id); default path unchanged."""
    import pyarrow as pa
    import ray.data as rd

    from pregel_ray.ops.dedup import dedup_exact

    texts = {
        0: "order 123 shipped to depot 9",
        1: "order 777 shipped to depot 5",     # same masked text as 0
        2: "order 123 shipped to depot 9 today extra words",  # longer variant? no: different masked
        3: "hello world",
        4: "hello world",                       # byte-identical with 3
    }
    # make 2 actually share 0/1's mask but longer: digits differ, suffix adds words -> different mask; craft explicitly
    texts[2] = "order 1234567 shipped to depot 88"  # masks to same as 0/1, longer raw
    t = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
    })

    def _norm(tb):
        import pyarrow.compute as _pcc

        return tb.append_column(
            "norm", _pcc.replace_substring_regex(tb["text"], "[0-9]+", "#"))

    ds = rd.from_arrow(t).repartition(3).map_batches(
        _norm, batch_format="pyarrow")
    got = dedup_exact(ds, keep="longest", key_col="norm").to_pandas()
    ids = set(got["doc_id"])
    # masked group {0,1,2}: 2 is longest (`1234567`,`88` raw) → survives
    assert 2 in ids and 0 not in ids and 1 not in ids
    # byte-identical group {3,4}: equal length → min doc_id
    assert 3 in ids and 4 not in ids

    # default path: first-of-group on raw text
    base = rd.from_arrow(t)
    d0 = dedup_exact(base).to_pandas()
    assert set(d0["doc_id"]) == {0, 1, 2, 3}

    with pytest.raises(ValueError):
        dedup_exact(base, keep="newest")
