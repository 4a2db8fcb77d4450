"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized `map_batches` transforms over the `documents`
table (doc_id, text, lang, source, n_chars). Regexes/stopword sets are
compiled once per actor (`__init__`) when the stage is stateful; purely
arithmetic stages are stateless tasks.

The reference engine has no scalar-function surface (SURVEY.md §2.9);
these are the training-data ops the north rule's 100 TB pipeline needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..agg import arrow_groups


def token_counts(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens): single-space tokenization — matches the DuckDB
    oracle `len(string_split(text, ' '))` exactly."""

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.list_value_length(toks).cast(pa.int64())})

    return docs.map_batches(_f, batch_format="pyarrow")


BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_counts(docs: rd.Dataset, pattern: str = BPE_ISH) -> rd.Dataset:
    """(doc_id, n_tokens_re): BPE-ish regex tokenization count — letter
    runs, digit runs, single punctuation (the pre-tokenizer split every
    BPE vocabulary starts from). Vectorized end-to-end:
    `pc.count_substring_regex` is RE2, the same engine as DuckDB's
    `regexp_extract_all`, so leftmost non-overlapping match counts agree
    byte-for-byte (ASCII-explicit classes dodge Unicode-table drift)."""

    def _f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pattern)
        return pa.table({"doc_id": t["doc_id"], "n_tokens_re": n.cast(pa.int64())})

    return docs.map_batches(_f, batch_format="pyarrow")


def token_counts_all(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, n_tokens_re): BOTH tokenizers in one scan —
    whitespace split + the BPE-ish regex count. One pass over the text
    column instead of two (the driver-gate consolidation, round 5);
    the single-tokenizer ops stay for à-la-carte use."""

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        nre = pc.count_substring_regex(t["text"], BPE_ISH)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
                "n_tokens_re": nre.cast(pa.int64()),
            }
        )

    return docs.map_batches(_f, batch_format="pyarrow")


def lexical_stats(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, n_distinct, ttr_ppm): type-token ratio quality
    signal. ttr is reported in integer parts-per-million (floor) so the
    DuckDB oracle matches exactly — float rounding-rule differences
    (banker's vs half-away) can't flip a digit."""

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
        # distinct-per-row without a Python set() per row: explode with
        # parent indices, C-level drop_duplicates + bincount
        tc = toks.combine_chunks()
        flat = pd.Series(pc.list_flatten(tc).to_pandas())
        parent = pc.list_parent_indices(tc).to_numpy(zero_copy_only=False)
        uniq = pd.DataFrame({"p": parent, "w": flat}).drop_duplicates()
        nd = np.bincount(uniq["p"].to_numpy(), minlength=t.num_rows).astype(np.int64)
        ppm = (nd * 1_000_000) // np.maximum(n, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n),
                "n_distinct": pa.array(nd),
                "ttr_ppm": pa.array(ppm.astype(np.int64)),
            }
        )

    return docs.map_batches(_f, batch_format="pyarrow")


def fingerprints(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, fp): md5 content fingerprint — the exact-dedup key.
    Matches DuckDB `md5(text)`."""

    class Md5:
        def __call__(self, t: pa.Table) -> pa.Table:
            fp = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
            return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fp)})

    return docs.map_batches(Md5(), batch_format="pyarrow")


class LangId:
    """Heuristic n-gram language ID (stateful actor stage: profiles held
    once per actor). A text's score for a language is the COUNT of that
    language's profile trigrams occurring in the text (substring
    containment ≡ membership in the text's character-trigram set);
    prediction = first language in profile order achieving the max count,
    'und' when no profile trigram occurs. Integer hits → the DuckDB
    oracle (`contains()` sums) matches exactly."""

    PROFILES = [
        ("en", ["the", "and", "ing", "ion", "ent"]),
        ("es", ["que", "los", "ent", "ión", "ado"]),
        ("de", ["der", "die", "und", "sch", "ein"]),
        ("fr", ["les", "que", "ent", "ion", "des"]),
    ]

    def __init__(self):
        self.profiles = [(lang, list(t)) for lang, t in self.PROFILES]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        hits = {}
        for lang, grams in self.profiles:
            h = np.zeros(len(batch), np.int64)
            for g in grams:  # vectorized literal containment per trigram
                h += text.str.contains(g, regex=False).to_numpy()
            hits[lang] = h
        mat = np.stack([hits[lang] for lang, _ in self.profiles])  # (L, B)
        best_hits = mat.max(axis=0)
        # first profile in order achieving the max (strict-> tie keeps earlier)
        best_idx = mat.argmax(axis=0)
        langs = np.array([lang for lang, _ in self.profiles])
        pred = np.where(best_hits > 0, langs[best_idx], "und")
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(np.int64)),
                "lang_pred": pa.array(pred),
                "lang_hits": pa.array(best_hits),
            }
        )


def langid(docs: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return docs.map_batches(
        LangId, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


STOPWORDS = "the a an and or of to in is are was were be been it this that".split()


class QualityScore:
    """Stopword/length heuristics (stateful: regexes compiled once per
    actor). All outputs are integers so the DuckDB oracle matches exactly:

        n_words  = # maximal [a-z]+ runs of the lowercased text
        n_stop   = # of those runs that equal a stopword
        sum_len  = total letters across runs
        quality_ppm, with n = max(n_words, 1):
            stop_x = min(n_stop*1e6 // n, 600_000)     # stop ratio, cap 0.6
            dev    = min(|sum_len - 5n|*1e6 // n, 5e6) # |mean len - 5|, cap 5
            quality_ppm = stop_x*5 // 6 + (5_000_000 - dev) // 10

    (the round-1 float formula, re-expressed in exact integer arithmetic —
    same signal: stop-ratio sweet spot + mean-word-length near 5)."""

    def __init__(self):
        import re

        self.word = re.compile(r"[a-z]+")
        # maximal-run token equality via lookarounds (tokens are maximal
        # letter runs, so non-letter boundaries delimit them)
        alts = "|".join(sorted(STOPWORDS, key=len, reverse=True))
        self.stop = re.compile(r"(?<![a-z])(?:%s)(?![a-z])" % alts)
        self.letter = re.compile(r"[a-z]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].str.lower()
        n_words = low.str.count(self.word).to_numpy(np.int64)
        n_stop = low.str.count(self.stop).to_numpy(np.int64)
        sum_len = low.str.count(self.letter).to_numpy(np.int64)
        n = np.maximum(n_words, 1)
        stop_x = np.minimum(n_stop * 1_000_000 // n, 600_000)
        dev = np.minimum(np.abs(sum_len - 5 * n) * 1_000_000 // n, 5_000_000)
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(np.int64)),
                "n_words": pa.array(n_words),
                "n_stop": pa.array(n_stop),
                "sum_len": pa.array(sum_len),
                "quality_ppm": pa.array(stop_x * 5 // 6 + (5_000_000 - dev) // 10),
            }
        )


def quality_scores(docs: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return docs.map_batches(
        QualityScore, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


def rolling_fingerprint(docs: rd.Dataset, window: int = 16,
                        base: int = 257) -> rd.Dataset:
    """(doc_id, rfp): Rabin-Karp rolling-hash document fingerprint — the
    min polynomial hash (mod 2^64, natural uint64 wraparound) over byte
    windows. Fully vectorized: H[j] = B^(j+w-1) · (C[j+w] − C[j]) with
    C the cumulative sum of b[i]·B⁻ⁱ — base 257 is odd, hence invertible
    mod 2^64, so no per-byte Python loop."""
    B = np.uint64(base)
    Binv = np.uint64(pow(base, -1, 1 << 64))

    def _rfp(b: np.ndarray) -> int:
        n = len(b)
        invpow = np.empty(n + 1, np.uint64)
        invpow[0] = np.uint64(1)
        np.cumprod(np.full(n, Binv, np.uint64), out=invpow[1:])
        bpow = np.empty(n, np.uint64)
        bpow[0] = np.uint64(1)
        np.cumprod(np.full(n - 1, B, np.uint64), out=bpow[1:])
        c = np.zeros(n + 1, np.uint64)
        np.cumsum(b.astype(np.uint64) * invpow[:n], out=c[1:])
        w = window
        h = bpow[w - 1 :] * (c[w:] - c[:-w])  # all windows, wraparound exact
        return int(h.min())

    def _f(t: pa.Table) -> pa.Table:
        out = np.zeros(t.num_rows, np.uint64)
        for i, s in enumerate(t["text"].to_pylist()):
            b = np.frombuffer(s.encode(), np.uint8)
            if len(b) < window:
                out[i] = int.from_bytes(
                    hashlib.blake2b(b.tobytes(), digest_size=8).digest(), "little"
                )
            else:
                out[i] = _rfp(b)
        return pa.table({"doc_id": t["doc_id"], "rfp": pa.array(out.astype(np.int64))})

    return docs.map_batches(_f, batch_format="pyarrow")


class PiiScrub:
    """(doc_id, text_scrubbed, n_redactions): regex redaction of
    PII-shaped spans — emails, then phone-shaped digit runs, then bare
    numbers — applied IN ORDER on the running text (so a redacted email's
    digits are not re-hit by the number rule). Stateful actor stage:
    patterns compile once per actor in ``__init__`` (the reference has no
    scalar-fn surface at all, SURVEY.md §2.9; this is the scrub stage a
    training-data pipeline runs before tokenization).

    Patterns are RE2-compatible so the DuckDB ``regexp_replace(..., 'g')``
    oracle reproduces the output byte-for-byte; n_redactions counts every
    span replaced (== the oracle's summed ``regexp_extract_all`` lengths,
    counted on the same intermediate texts)."""

    RULES = [
        (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
        (r"\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
        (r"[0-9]+", "<NUM>"),
    ]

    def __init__(self):
        import re

        self.rules = [(re.compile(p), rep) for p, rep in self.RULES]

    def __call__(self, t: pa.Table) -> pa.Table:
        out, nred = [], []
        for s in t["text"].to_pylist():
            n = 0
            for rx, rep in self.rules:
                s, k = rx.subn(rep, s)
                n += k
            out.append(s)
            nred.append(n)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_scrubbed": pa.array(out, pa.string()),
                "n_redactions": pa.array(nred, pa.int64()),
            }
        )


def pii_scrub(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(PiiScrub, batch_format="pyarrow", concurrency=(1, 8))


def build_inverted_index(
    docs: rd.Dataset, vocab: list[str] | None = None
) -> rd.Dataset:
    """Distinct (token, doc_id) posting pairs — the inverted-index build.
    `vocab` prunes tokens MAP-SIDE (a query over K terms moves only those
    terms' postings, never the corpus). Explode is zero-copy
    (list_flatten + list_parent_indices); batch-local distinct combines
    map-side before the bucketed global distinct."""
    from ..agg import distinct as _distinct

    # `is not None`: vocab=[] means "prune to nothing" (empty index), NOT
    # "build the full unpruned corpus index" — only vocab=None means that
    # pa.string() type: an empty vocab otherwise infers a null-typed
    # value_set, which is_in rejects against the string token column
    vocab_arr = (
        pa.array(sorted(set(vocab)), pa.string()) if vocab is not None else None
    )

    def _posts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        out = pa.table(
            {
                "token": pc.list_flatten(toks),
                "doc_id": pc.take(
                    t["doc_id"].combine_chunks(), pc.list_parent_indices(toks)
                ),
            }
        )
        if vocab_arr is not None:
            out = out.filter(pc.is_in(out["token"], value_set=vocab_arr))
        # batch-local distinct (map-side combine before the shuffle)
        return out.group_by(["token", "doc_id"]).aggregate([])

    return _distinct(
        docs.map_batches(_posts, batch_format="pyarrow"), ["token", "doc_id"]
    )


def keyword_search(docs: rd.Dataset, terms: list[str]) -> rd.Dataset:
    """(doc_id) of documents containing ALL `terms` (token-exact AND
    semantics) via posting-list intersection: only the K query terms'
    postings leave the scan, one bucketed count-distinct per doc_id
    selects docs matching all K."""
    from ..agg import grouped_apply

    terms = sorted(set(terms))
    if not terms:
        # vacuous AND: every document matches (and never build an
        # unpruned corpus index as a side effect)
        return docs.select_columns(["doc_id"])
    posts = build_inverted_index(docs, vocab=terms)

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("doc_id", sort=False)["token"].nunique()
        return pd.DataFrame({"doc_id": n.index[n == len(terms)].to_numpy()})

    return grouped_apply(posts, ["doc_id"], _match)


def grouped_topk(
    ds: rd.Dataset, by: list[str], order_col: str, k: int,
    tiebreak: str, ascending: bool = False,
) -> rd.Dataset:
    """Top-k rows PER GROUP, no global sort: each block keeps its own
    top-k per group present (a block can only contribute k winners per
    group), then one bucketed fold per group finishes — ≤ k·blocks rows
    shuffle per group. Deterministic: order by (order_col, tiebreak)."""
    from ..agg import grouped_apply

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, tiebreak], ascending=[ascending, True],
                          kind="mergesort")
        return g.groupby(by, sort=False, as_index=False).head(k)

    def _partial(t: pa.Table) -> pa.Table:
        # Arrow-native per-block top-k (VERDICT r4 #5 — no whole-block
        # pandas conversion in the partial): sort by (by..., order,
        # tiebreak), then keep rank<k within each group run
        keys = [(c, "ascending") for c in by] + [
            (order_col, "ascending" if ascending else "descending"),
            (tiebreak, "ascending"),
        ]
        ts = t.take(pc.sort_indices(t, sort_keys=keys))
        boundary = np.zeros(ts.num_rows, bool)
        if ts.num_rows:
            boundary[0] = True
            for c in by:
                v = ts[c].to_numpy(zero_copy_only=False)
                boundary[1:] |= v[1:] != v[:-1]
        starts = np.flatnonzero(boundary)
        grp = np.cumsum(boundary) - 1
        rank = np.arange(ts.num_rows) - starts[grp]
        return ts.filter(pa.array(rank < k))

    return grouped_apply(
        ds.map_batches(_partial, batch_format="pyarrow"), by, _topk
    )


def _bigram_explode(t: pa.Table) -> pa.Table:
    """(doc_id, w1, w2) rows for every consecutive whitespace-token pair
    — batch-safe via list_parent_indices (a doc is one row, so pairs
    never cross docs). Shared by bigram_lm_scores and collocations."""
    toks = pc.split_pattern(t["text"], " ").combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "w1": pa.array([], pa.string()),
         "w2": pa.array([], pa.string())}
    )
    n = len(flat)
    if n < 2:
        return empty
    same = parent[:-1] == parent[1:]
    if not same.any():
        return empty
    # zero-copy pairing: shifted Arrow slices + one filter — tokens never
    # round-trip through Python objects
    mask = pa.array(same)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[parent[:-1][same]]),
            "w1": pc.filter(flat.slice(0, n - 1), mask),
            "w2": pc.filter(flat.slice(1, n - 1), mask),
        }
    )


def bigram_lm_scores(docs: rd.Dataset, n_vocab: int | None = None) -> rd.Dataset:
    """(doc_id, n_bigrams, lm_ppm): per-document add-one-smoothed bigram
    language-model score — the LM-based quality-filtering shape of a
    training-data pipeline (score a corpus against its own bigram
    statistics; low scores flag unnatural token streams).

        lp(w1,w2)  = ln( (C(w1,w2)+1) / (C(w1,·)+V) )
        lm_ppm     = Σ over the doc's bigrams of floor(lp · 1e6)

    Per-bigram log-probs are floored to INTEGER ppm before the per-doc
    sum, so the total is an order-independent int64 — value-exact vs the
    SQL oracle with no float-summation-order caveat.

    Shape: one bigram explode (consecutive-token pairs via
    list_parent_indices — batch-safe because a doc is one row) →
    bucketed bigram/first-token counts → ONE corpus-level lp table
    (bucketed join on w1) → bucketed join of the doc's bigrams
    (multiplicity preserved) → per-doc integer sum. Docs with < 2 tokens
    have no bigrams and no row."""
    from ..agg import bucketed_join, distinct, group_count, grouped_apply

    _bigrams = _bigram_explode

    # materialize once: bg feeds THREE consumers (cb, c1, the score join)
    # and would otherwise re-run the explode per consumer; also lets the
    # no-bigram corpus (all docs < 2 tokens) return a typed empty result
    # instead of handing schema-less datasets to the join
    bg = docs.map_batches(_bigrams, batch_format="pyarrow").materialize()
    if bg.count() == 0:
        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                 ("lm_ppm", pa.int64())]
            ).empty_table()
        )
    cb = group_count(bg.select_columns(["w1", "w2"]), ["w1", "w2"], alias="cb")
    c1 = group_count(bg.select_columns(["w1"]), ["w1"], alias="c1")

    if n_vocab is None:
        def _toks(t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(t["text"], " ").combine_chunks()
            return pa.table({"token": pc.unique(pc.list_flatten(toks))})

        n_vocab = distinct(
            docs.map_batches(_toks, batch_format="pyarrow"), ["token"]
        ).count()
    V = float(n_vocab)

    lp_tbl = bucketed_join(cb, c1, ["w1"])

    def _lp(t: pa.Table) -> pa.Table:
        cbv = t["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1v = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.floor(np.log((cbv + 1.0) / (c1v + V)) * 1_000_000.0).astype(np.int64)
        return pa.table(
            {"w1": t["w1"], "w2": t["w2"], "lp_ppm": pa.array(lp)}
        )

    scored = bucketed_join(
        bg, lp_tbl.map_batches(_lp, batch_format="pyarrow"), ["w1", "w2"]
    )

    def _doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False, as_index=False).agg(
            n_bigrams=("lp_ppm", "size"), lm_ppm=("lp_ppm", "sum")
        )
        return out

    return grouped_apply(scored.select_columns(["doc_id", "lp_ppm"]),
                         ["doc_id"], _doc_sum)


def collocations(
    docs: rd.Dataset, k: int = 50, min_count: int = 5
) -> rd.Dataset:
    """(w1, w2, cxy, pmi_ppm): top-k collocation bigrams by pointwise
    mutual information (Church & Hanks 1990) — statistical phrase mining
    over a training corpus. Positional PMI over the bigram stream:

        pmi = ln( cxy · N / (c1(w1) · c2(w2)) )

    with N = total bigrams, c1/c2 = first-/second-position counts;
    `min_count` drops rare pairs (PMI's classic low-frequency blowup).
    pmi_ppm = floor(pmi · 1e6) as int64 — same double ops in the same
    order as the SQL oracle (the tfidf/bigram-LM exactness trick).
    Order: pmi_ppm desc, then (w1, w2) asc; rank <= k.

    Shape: ONE bigram explode feeds ONE map-side-combined bucketed
    count (the only corpus-wide shuffle); c1, c2 and N all derive FROM
    that pair-count table (c1(w1) = Σ_w2 cxy, N = Σ cxy — the tfidf
    df-from-tf trick, so the marginals shuffle vocab²-bounded rows,
    never the bigram stream). cb is filtered to min_count only on the
    join probe side → two bucketed joins attach the marginals →
    per-block top-k partials (<= k rows per block ship) → one tiny
    global sort. Nothing corpus-sized lands in one place."""
    from ..agg import bucketed_join, group_count, group_sum

    bg = docs.select_columns(["doc_id", "text"]).map_batches(
        _bigram_explode, batch_format="pyarrow"
    )
    out_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()),
         ("cxy", pa.int64()), ("pmi_ppm", pa.int64())]
    )
    # the single corpus-wide shuffle; materialized — it feeds c1/c2/N/cb
    cb_all = group_count(
        bg.select_columns(["w1", "w2"]), ["w1", "w2"], alias="cxy"
    ).materialize()
    n_total = int(cb_all.sum("cxy") or 0)
    if n_total == 0:
        return rd.from_arrow(out_schema.empty_table())

    # cb_all is materialized, so its size can size the marginal/join
    # bucket counts: 128 near-empty buckets cost ~3 s of sort floor
    # PER STAGE on a small pair table (measured sf0.001: joins 6.4 s at
    # the default, ~1 s sized); scales back up with the data (~1 bucket
    # per 50k pair rows, the per-bucket heap bound unchanged)
    nb = int(min(128, max(8, cb_all.count() // 50_000 + 8)))
    c1 = group_sum(cb_all.select_columns(["w1", "cxy"]), ["w1"], "cxy",
                   alias="c1", num_buckets=nb)
    c2 = group_sum(cb_all.select_columns(["w2", "cxy"]), ["w2"], "cxy",
                   alias="c2", num_buckets=nb)
    cb = cb_all.filter(expr=f"cxy >= {int(min_count)}")

    joined = bucketed_join(
        bucketed_join(cb, c1, ["w1"], num_buckets=nb), c2, ["w2"],
        num_buckets=nb,
    )
    N = float(n_total)

    def _score(t: pa.Table) -> pa.Table:
        cxy = t["cxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1v = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2v = t["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.floor(np.log(cxy * N / (c1v * c2v)) * 1_000_000.0)
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "cxy": t["cxy"],
                "pmi_ppm": pa.array(pmi.astype(np.int64)),
            }
        )

    scored = joined.map_batches(_score, batch_format="pyarrow")

    def _block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("pmi_ppm", "descending"), ("w1", "ascending"),
                ("w2", "ascending"),
            ],
        )
        return t.take(idx[:k])

    return (
        scored.map_batches(_block_topk, batch_format="pyarrow")
        .sort(["pmi_ppm", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def chunk_documents(
    docs: rd.Dataset, size: int = 100, overlap: int = 20
) -> rd.Dataset:
    """(doc_id, chunk_id, n_tokens, chunk_text): split each document
    into fixed-size whitespace-token windows with `overlap` shared
    tokens between neighbors — the embedding/RAG preprocessing staple.
    Chunk starts at stride = size - overlap offsets; a trailing window
    is emitted only if it contributes at least one new token (so no
    chunk is a strict suffix-copy of its predecessor).

    Shape: pure per-block flat-map — zero shuffle. Fully vectorized:
    one split per block, chunk spans materialized as a single gather
    index (repeat/cumsum arithmetic, no per-doc loop), tokens re-joined
    with pc.binary_join on a ListArray view. Output rows carry doc_id
    so downstream embed/dedup stages can bucket by document."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap

    def _chunks(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = pc.list_flatten(toks)
        doc_off = np.asarray(toks.offsets)  # len = ndocs+1
        doc_off = doc_off - doc_off[0]  # sliced arrays carry an offset
        lens = np.diff(doc_off)
        # chunks per doc: 1 + ceil(max(0, len - size) / stride)
        n_chunks = 1 + (np.maximum(lens - size, 0) + stride - 1) // stride
        if len(lens) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        doc_idx = np.repeat(np.arange(len(lens)), n_chunks)
        # 0-based chunk ordinal within its doc
        ordinal = np.arange(len(doc_idx)) - np.repeat(
            np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks
        )
        start = ordinal * stride  # token offset within the doc
        end = np.minimum(start + size, lens[doc_idx])  # exclusive
        span = end - start
        # one big gather: flat-token indices for every chunk
        idx = np.repeat(doc_off[:-1][doc_idx] + start, span) + (
            np.arange(int(span.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(span)[:-1]]), span
            )
        )
        chunk_offsets = np.concatenate([[0], np.cumsum(span)]).astype(np.int32)
        taken = pc.take(flat, pa.array(idx, pa.int64()))
        lists = pa.ListArray.from_arrays(pa.array(chunk_offsets), taken)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_idx]),
                "chunk_id": pa.array(ordinal.astype(np.int64)),
                "n_tokens": pa.array(span.astype(np.int64)),
                "chunk_text": pc.binary_join(lists, " "),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _chunks, batch_format="pyarrow"
    )


def tfidf_top_terms(docs: rd.Dataset, k: int = 3, n_docs: int | None = None) -> rd.Dataset:
    """(doc_id, token, score_ppm): each document's top-k tokens by
    tf·idf, idf = ln(N/df), score integer-scaled to ppm via floor so the
    DuckDB oracle is value-exact (same double ops in the same order;
    floor avoids half-rounding-rule mismatches). Ties → token asc.

    Shape: one explode → bucketed tf count on (doc_id, token) + bucketed
    df count on distinct (token, doc_id) → bucketed join on token (df is
    corpus-vocabulary-sized — never broadcast) → grouped top-k per doc.
    Every stage is the bounded-shuffle pattern; nothing is
    corpus-bounded in one place."""
    from ..agg import bucketed_join, group_count

    def _explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        return pa.table(
            {
                "doc_id": pc.take(
                    t["doc_id"].combine_chunks(), pc.list_parent_indices(toks)
                ),
                "token": pc.list_flatten(toks),
            }
        )

    exploded = docs.map_batches(_explode, batch_format="pyarrow")
    # materialize tf (feeds both the join and df) and give the empty
    # corpus a typed empty result instead of schema-less datasets
    # downstream. df derives FROM tf: tf's keys are already the distinct
    # (doc_id, token) pairs, so counting tf rows per token IS the
    # document frequency — one shuffle over the (much smaller) tf table
    # replaces a distinct + count over the full exploded token stream
    # (r5; at corpus scale the distinct was as large as tf itself).
    tf = group_count(exploded, ["doc_id", "token"], alias="tf").materialize()
    if tf.count() == 0:
        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("token", pa.string()),
                 ("score_ppm", pa.int64())]
            ).empty_table()
        )
    dft = group_count(tf, ["token"], alias="df")
    n = n_docs if n_docs is not None else docs.count()

    joined = bucketed_join(tf, dft, ["token"])

    def _score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log(n / dfv)
        score = np.floor(tfv * idf * 1_000_000.0).astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "token": t["token"],
             "score_ppm": pa.array(score)}
        )

    return grouped_topk(
        joined.map_batches(_score, batch_format="pyarrow"),
        by=["doc_id"], order_col="score_ppm", k=k, tiebreak="token",
    )


def vocab_topk(docs: rd.Dataset, k: int = 50) -> rd.Dataset:
    """Corpus-wide top-k token frequencies (token, n), ties broken by
    token asc. Shape: explode tokens (zero-copy list_flatten) → bucketed
    count by token (`agg.group_count`: token cardinality scales with the
    corpus — the high-cardinality regime) → per-bucket top-k partials
    (complete per token, since a token's rows land in exactly one bucket)
    → one tiny single-group fold over ≤ k·num_buckets rows."""
    from ..agg import group_count

    def _explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        return pa.table({"token": pc.list_flatten(toks)})

    counts = group_count(
        docs.map_batches(_explode, batch_format="pyarrow"), ["token"], alias="n"
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "token"], ascending=[False, True])
        return pa.Table.from_pandas(
            df.head(k), preserve_index=False
        ).replace_schema_metadata(None)

    def _final(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns="__g").sort_values(["n", "token"], ascending=[False, True])
        return pa.Table.from_pandas(
            g.head(k), preserve_index=False
        ).replace_schema_metadata(None)

    return (
        counts.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.append_column("__g", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        .groupby("__g")
        .map_groups(arrow_groups(_final), batch_format="pandas")
    )


def repetition_stats(docs: rd.Dataset, n: int = 3) -> rd.Dataset:
    """(doc_id, n_grams, rep_ppm): fraction of a document's n-gram
    positions whose gram occurs more than once WITHIN the document —
    the duplicated-n-gram repetition filter of the public
    Gopher/MassiveText quality heuristics (repetitive boilerplate and
    decoding loops score high). Integer ppm (floor) so the DuckDB
    oracle is value-exact. Pure map — no shuffle at any scale. Docs
    with fewer than n tokens have no grams and no row."""

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = pc.list_flatten(toks).to_pandas()
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_grams": pa.array([], pa.int64()),
             "rep_ppm": pa.array([], pa.int64())}
        )
        if len(flat) < n:
            return empty
        gram = flat[: len(flat) - n + 1].reset_index(drop=True)
        for k in range(1, n):
            gram = gram + " " + flat[k: len(flat) - n + 1 + k].reset_index(drop=True)
        valid = parent[: len(flat) - n + 1] == parent[n - 1:]
        if not valid.any():
            return empty
        gv = gram.to_numpy()[valid]
        pv = parent[: len(flat) - n + 1][valid]
        order = np.lexsort((gv, pv))
        gs, ps = gv[order], pv[order]
        # run lengths of equal (doc, gram); positions in runs >1 are dups
        new_run = np.concatenate(([True], (ps[1:] != ps[:-1]) | (gs[1:] != gs[:-1])))
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        dup_pos = run_len[run_id] > 1
        n_docs = t.num_rows
        total = np.bincount(ps, minlength=n_docs).astype(np.int64)
        dups = np.bincount(ps[dup_pos], minlength=n_docs).astype(np.int64)
        has = total > 0
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[has]
        tot_h, dup_h = total[has], dups[has]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "n_grams": pa.array(tot_h),
                "rep_ppm": pa.array((dup_h * 1_000_000) // tot_h),
            }
        )

    return docs.map_batches(_f, batch_format="pyarrow")
