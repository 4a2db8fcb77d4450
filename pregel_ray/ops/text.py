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


def token_counts(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens): single-space tokenization — matches the DuckDB
    oracle `len(string_split(text, ' '))` exactly."""

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.list_value_length(toks).cast(pa.int64())})

    return docs.map_batches(_f, batch_format="pyarrow")


def lexical_stats(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, n_distinct, ttr_ppm): type-token ratio quality
    signal. ttr is reported in integer parts-per-million (floor) so the
    DuckDB oracle matches exactly — float rounding-rule differences
    (banker's vs half-away) can't flip a digit."""

    def _f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = toks.to_pandas()
        nd = s.map(lambda xs: len(set(xs))).to_numpy(np.int64)
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
    """Heuristic n-gram language ID (stateful actor stage: profiles built
    once per actor). Tiny trigram profiles for the synthetic corpus's
    lang tags; returns argmax-overlap language + a confidence."""

    PROFILES = {
        "en": {"the", "and", "ing", "ion", "ent"},
        "es": {"que", "los", "ent", "ión", "ado"},
        "de": {"der", "die", "und", "sch", "ein"},
        "fr": {"les", "que", "ent", "ion", "des"},
    }

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def score(text: str) -> tuple[str, float]:
            grams = {text[i : i + 3] for i in range(max(0, len(text) - 2))}
            best, bs = "und", 0.0
            for lang, prof in self.profiles.items():
                s = len(grams & prof) / len(prof)
                if s > bs:
                    best, bs = lang, s
            return best, bs

        out = batch["text"].map(score)
        batch = batch[["doc_id"]].copy()
        batch["lang_pred"] = out.map(lambda t: t[0])
        batch["lang_conf"] = out.map(lambda t: t[1])
        return batch


def langid(docs: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return docs.map_batches(
        LangId, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


class QualityScore:
    """Stopword/length heuristics (stateful: stopword set + regex compiled
    once per actor)."""

    def __init__(self):
        import re

        self.word = re.compile(r"[A-Za-z]+")
        self.stop = frozenset(
            "the a an and or of to in is are was were be been it this that".split()
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(self.word)
        n = toks.map(len).clip(lower=1)
        stop_ratio = toks.map(lambda ws: sum(w in self.stop for w in ws)) / n
        mean_len = toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        out = batch[["doc_id"]].copy()
        out["stop_ratio"] = stop_ratio.astype(float)
        out["mean_word_len"] = mean_len
        out["quality"] = (
            (stop_ratio.clip(0, 0.6) / 0.6) * 0.5
            + (1.0 - (mean_len - 5.0).abs().clip(0, 5) / 5.0) * 0.5
        ).astype(float)
        return out


def quality_scores(docs: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return docs.map_batches(
        QualityScore, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


def rolling_fingerprint(docs: rd.Dataset, window: int = 16, base: int = 257,
                        mod: int = (1 << 61) - 1) -> rd.Dataset:
    """(doc_id, rfp): Rabin-Karp rolling-hash document fingerprint — the
    min rolling hash over byte windows (shingle-level signature)."""

    def _f(t: pa.Table) -> pa.Table:
        out = np.zeros(t.num_rows, np.uint64)
        for i, s in enumerate(t["text"].to_pylist()):
            b = s.encode()
            if len(b) < window:
                out[i] = int(hashlib.blake2b(b, digest_size=8).hexdigest(), 16)
                continue
            h = 0
            pw = pow(base, window - 1, mod)
            mn = None
            for j, c in enumerate(b):
                if j >= window:
                    h = (h - b[j - window] * pw) % mod
                h = (h * base + c) % mod
                if j >= window - 1:
                    mn = h if mn is None or h < mn else mn
            out[i] = mn
        return pa.table({"doc_id": t["doc_id"], "rfp": pa.array(out.astype(np.int64))})

    return docs.map_batches(_f, batch_format="pyarrow")
