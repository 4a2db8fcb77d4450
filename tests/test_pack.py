"""pack_sequences / shuffle_shards / knn_graph invariants.

Value-exactness vs DuckDB is pinned by the extras gate
(tests/gate_check.py: x_doc_pack_512, x_doc_shuffle_shards,
x_emb_knn_graph); these pytests pin the structural invariants and the
approximate-path recall on synthetic data the gate can't cover.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _docs_ds():
    from pregel_ray.io_util import read_parquet

    return read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_pack_sequences_invariants(ray_session):
    import pyarrow.compute as pc

    from pregel_ray.ops.pack import pack_sequences

    docs = _docs_ds()
    out = pack_sequences(docs, seq_len=128).to_pandas()

    # per-doc spans partition [0, ntok): contiguous, start at 0, sum = ntok
    toks = {
        r["doc_id"]: len(r["text"].split(" "))
        for _, r in docs.to_pandas().iterrows()
    }
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("seq_id")
        assert g["doc_start"].iloc[0] == 0
        ends = g["doc_start"] + g["n_tokens"]
        assert (g["doc_start"].iloc[1:].to_numpy() == ends.iloc[:-1].to_numpy()).all()
        assert int(ends.iloc[-1]) == toks[doc_id]

    # every sequence except the last is exactly full
    per_seq = out.groupby("seq_id")["n_tokens"].sum().sort_index()
    assert (per_seq.iloc[:-1] == 128).all()
    assert 0 < per_seq.iloc[-1] <= 128
    # sequence ids are dense from 0
    assert per_seq.index[0] == 0
    assert per_seq.index[-1] == len(per_seq) - 1
    # within a sequence, (seq_start, n_tokens) tile [0, 128)
    for seq_id, g in out.groupby("seq_id"):
        g = g.sort_values("seq_start")
        assert g["seq_start"].iloc[0] == 0
        ends = g["seq_start"] + g["n_tokens"]
        assert (g["seq_start"].iloc[1:].to_numpy() == ends.iloc[:-1].to_numpy()).all()


def test_pack_sequences_block_independence(ray_session):
    """The global prefix sum must not depend on block boundaries."""
    from pregel_ray.ops.pack import pack_sequences

    docs = _docs_ds()
    a = (
        pack_sequences(docs, seq_len=64)
        .to_pandas()
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
    )
    b = (
        pack_sequences(docs.repartition(7), seq_len=64)
        .to_pandas()
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_shuffle_shards_deterministic_and_dense(ray_session):
    from pregel_ray.ops.pack import shuffle_shards

    docs = _docs_ds()
    a = shuffle_shards(docs, num_shards=4).to_pandas()
    b = (
        shuffle_shards(docs.repartition(5), num_shards=4)
        .to_pandas()
    )
    key = ["doc_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # layout-independent

    # positions are a dense 0..n-1 per shard
    for shard, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    # every doc appears exactly once
    assert a["doc_id"].is_unique and len(a) == docs.count()


def test_knn_graph_ivf_recall_on_clusters(ray_session):
    """Synthetic tight clusters: IVF-bucketed k-NN must recover almost
    all true neighbors (they share the bucket by construction)."""
    import ray.data as rd

    from pregel_ray.ops.ann import knn_graph_exact, knn_graph_ivf

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 40, axis=0) + rng.normal(scale=0.02, size=(320, 32))
    emb = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(320, dtype=np.int64),
                "embedding": list(vecs.astype(np.float32)),
            }
        )
    )
    exact = knn_graph_exact(emb, k=5).to_pandas()
    approx = knn_graph_ivf(emb, k=5, n_centroids=8, sample_size=320).to_pandas()
    e = set(map(tuple, exact[["vec_id", "nbr_id"]].to_numpy()))
    a = set(map(tuple, approx[["vec_id", "nbr_id"]].to_numpy()))
    assert len(e & a) / len(e) >= 0.9

    # exact path invariants: k rows per vertex, no self loops, ranks dense
    assert (exact.groupby("vec_id").size() == 5).all()
    assert (exact["vec_id"] != exact["nbr_id"]).all()
    ranks = exact.sort_values(["vec_id", "rank"]).groupby("vec_id")["rank"].apply(list)
    assert all(r == [1, 2, 3, 4, 5] for r in ranks)


def test_knn_graph_gate_switches_paths(ray_session):
    """Below the gate → exact; above → IVF (structurally: both emit the
    same schema, exact equals knn_graph at small N)."""
    from pregel_ray.io_util import read_parquet
    from pregel_ray.ops.ann import knn_graph, knn_graph_exact

    emb = read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    via_gate = (
        knn_graph(emb, k=3)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    exact = (
        knn_graph_exact(emb, k=3)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_gate, exact)

    approx = knn_graph(emb, k=3, exact_max_vectors=1).to_pandas()
    assert set(approx.columns) == {"vec_id", "nbr_id", "cos", "rank"}
    assert (approx["vec_id"] != approx["nbr_id"]).all()


def test_random_walks_structure_and_layout_independence(ray_session):
    """Exact values are pinned by the x_graph_random_walks gate oracle;
    here: step-0 covers every vertex, every hop follows a real edge, and
    the walk corpus is block-layout-independent."""
    from pregel_ray.ops.walks import random_walks
    from pregel_ray.pipelines import edges_named

    edges = edges_named(SF).materialize()
    out = random_walks(edges, walk_len=2).to_pandas()

    epd = edges.to_pandas()
    eset = set(map(tuple, epd[["src_name", "dst_name"]].to_numpy()))
    verts = set(epd["src_name"]) | set(epd["dst_name"])

    s0 = out[out["step"] == 0]
    assert set(s0["name"]) == verts and len(s0) == len(verts)

    # every hop (step s → s+1 of the same walk) is an edge
    wide = out.pivot(index="start_name", columns="step", values="name")
    for s in (0, 1):
        if s + 1 not in wide.columns:
            continue
        hops = wide[[s, s + 1]].dropna()
        assert all(
            (a, b) in eset for a, b in hops.itertuples(index=False)
        )

    # block layout must not change the corpus
    again = (
        random_walks(edges.repartition(9), walk_len=2)
        .to_pandas()
        .sort_values(["start_name", "step", "name"])
        .reset_index(drop=True)
    )
    ref = out.sort_values(["start_name", "step", "name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(again, ref)


def test_sample_neighbors_matches_bruteforce(ray_session):
    """Exact values are pinned by the x_graph_sample_neighbors gate
    oracle; here: parity vs a driver-side brute-force replay, distinct
    neighbors, min(k, deg) rows per vertex, and layout independence."""
    import hashlib

    from pregel_ray.ops.walks import sample_neighbors
    from pregel_ray.pipelines import edges_named

    k = 3
    edges = edges_named(SF).materialize()
    out = (
        sample_neighbors(edges, k=k)
        .to_pandas()
        .sort_values(["src_name", "rank"])
        .reset_index(drop=True)
    )

    epd = edges.to_pandas()[["src_name", "dst_name"]]
    hv = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(f"{a}:{b}".encode()).digest()[8:], "little"
            )
            for a, b in epd.itertuples(index=False)
        ),
        dtype=np.uint64,
        count=len(epd),
    )
    brute = epd.assign(hv=hv).sort_values(
        ["src_name", "hv", "dst_name"], kind="mergesort"
    )
    brute = brute.assign(
        rank=brute.groupby("src_name", sort=False).cumcount()
    )
    brute = (
        brute[brute["rank"] < k]
        .drop(columns="hv")
        .astype({"rank": np.int64})
        .sort_values(["src_name", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, brute)

    # min(k, out_degree) distinct neighbors per vertex
    deg = epd.groupby("src_name").size()
    got = out.groupby("src_name").size()
    assert got.eq(deg.clip(upper=k).reindex(got.index)).all()
    assert not out.duplicated(["src_name", "dst_name"]).any()

    # block layout must not change the sample
    again = (
        sample_neighbors(edges.repartition(9), k=k)
        .to_pandas()
        .sort_values(["src_name", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, out)


def test_training_corpus_e2e(ray_session):
    """Composed pipeline smoke (values pinned by x_training_corpus_e2e):
    quality-filter → dedup → split → pack output keeps the packing
    invariants and covers only surviving train docs."""
    from pregel_ray.pipelines import training_corpus

    out = training_corpus(SF, seq_len=128).to_pandas()
    assert set(out.columns) == {
        "doc_id", "seq_id", "doc_start", "seq_start", "n_tokens"
    }
    assert len(out) > 0
    # per-doc spans are contiguous from 0 and positive
    g = out.sort_values(["doc_id", "doc_start"]).groupby("doc_id")
    assert (g["doc_start"].first() == 0).all()
    assert (out["n_tokens"] > 0).all()
    # sequence ids form a dense prefix 0..max
    seqs = np.sort(out["seq_id"].unique())
    assert seqs[0] == 0 and seqs[-1] == len(seqs) - 1
