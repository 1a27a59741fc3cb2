"""Text-analysis stages over a documents table: token counts, quality
metrics, fingerprints, language-ID (the "training-data pipeline" operator
set; each has a queries() entry and — where SQL-expressible — a DuckDB
oracle whose semantics these kernels match EXACTLY).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

# Pinned to the DuckDB oracle expressions in __ray_entry__.py:
#   n_tokens   = len(regexp_split_to_array(trim(text), '\s+'))
#   punct_cnt  = length(regexp_replace(text, '[a-zA-Z0-9_ \t\n]', '', 'g'))
#   fingerprint= md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
_WS_RE = re.compile(r"\s+")
_KEEP_RE = re.compile(r"[a-zA-Z0-9_ \t\n]")

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "for", "on")

_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "for", "that", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "de", "des", "une", "pour", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "de", "una", "por", "con"},
}
_CJK_RE = re.compile(r"[一-鿿]")


def doc_token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_chars, n_tokens, punct_cnt, stopword_cnt (vectorized where
    Arrow has the kernel; regex counts per row with compiled patterns)."""
    texts = batch.column("text")
    n_chars = pc.utf8_length(texts)
    py = texts.to_pylist()
    n_tokens = [len(_WS_RE.split(t.strip())) for t in py]
    punct = [len(_KEEP_RE.sub("", t)) for t in py]
    stop = [sum(1 for w in _WS_RE.split(t.lower().strip()) if w in STOPWORDS)
            for t in py]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "punct_cnt": pa.array(punct, pa.int64()),
            "stopword_cnt": pa.array(stop, pa.int64()),
        }
    )


def fingerprint(text: str) -> str:
    return hashlib.md5(
        _WS_RE.sub(" ", text).lower().encode("utf-8")
    ).hexdigest()


def doc_fingerprints(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp": pa.array([fingerprint(t)
                            for t in batch.column("text").to_pylist()],
                           pa.string()),
        }
    )


def detect_lang(text: str) -> str:
    """n-gram/stopword heuristic language ID: CJK charset first, then
    stopword votes, tie/none -> 'und'."""
    if _CJK_RE.search(text):
        return "zh"
    words = set(_WS_RE.split(text.lower().strip()))
    best, best_n = "und", 0
    for lang in sorted(_LANG_STOPWORDS):
        n = len(words & _LANG_STOPWORDS[lang])
        if n > best_n:
            best, best_n = lang, n
    return best


def doc_langid(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(
                [detect_lang(t) for t in batch.column("text").to_pylist()],
                pa.string()),
        }
    )


def doc_quality(batch: pa.Table) -> pa.Table:
    """Quality score in [0,1]: blended length / punctuation / stopword
    signals (Gopher-rules-style heuristics)."""
    stats = doc_token_stats(batch)
    out = []
    for nc, nt, pc_, sw in zip(stats.column("n_chars").to_pylist(),
                               stats.column("n_tokens").to_pylist(),
                               stats.column("punct_cnt").to_pylist(),
                               stats.column("stopword_cnt").to_pylist()):
        len_ok = 1.0 if 10 <= nt <= 100000 else 0.0
        punct_ratio = pc_ / max(1, nc)
        stop_ratio = sw / max(1, nt)
        score = 0.4 * len_ok + 0.3 * min(1.0, 4 * stop_ratio) \
            + 0.3 * (1.0 - min(1.0, 5 * punct_ratio))
        out.append(round(score, 6))
    return pa.table({"doc_id": stats.column("doc_id"),
                     "quality": pa.array(out, pa.float64())})


_ALPHA_RE = re.compile(r"[A-Za-z]")


def doc_gopher_rules(batch: pa.Table) -> pa.Table:
    """Gopher-style quality rules (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", table A1 subset) with INTEGER-exact thresholds so
    a SQL oracle can verify every boolean:

    * r_words:    50 <= word count <= 100_000
    * r_mean_len: mean word length in [3, 10]  (as 3*n <= chars <= 10*n)
    * r_alpha:    >= 80% of words contain an alphabetic char
    * r_symbol:   '#' chars <= 10% of word count
    * keep = all of the above.
    """
    rows_id = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    n_words, total_chars, alpha_words, hash_count = [], [], [], []
    for t in texts:
        toks = _WS_RE.split(t.strip())
        n_words.append(len(toks))
        total_chars.append(sum(len(w) for w in toks))
        alpha_words.append(sum(1 for w in toks if _ALPHA_RE.search(w)))
        hash_count.append(t.count("#"))
    import numpy as np

    nw = np.array(n_words, dtype=np.int64)
    tc = np.array(total_chars, dtype=np.int64)
    aw = np.array(alpha_words, dtype=np.int64)
    hc = np.array(hash_count, dtype=np.int64)
    r_words = ((nw >= 50) & (nw <= 100_000)).astype(np.int64)
    r_mean_len = ((3 * nw <= tc) & (tc <= 10 * nw)).astype(np.int64)
    r_alpha = (10 * aw >= 8 * nw).astype(np.int64)
    r_symbol = (10 * hc <= nw).astype(np.int64)
    keep = (r_words & r_mean_len & r_alpha & r_symbol).astype(np.int64)
    return pa.table({
        "doc_id": rows_id,
        "n_words": pa.array(nw, pa.int64()),
        "total_word_chars": pa.array(tc, pa.int64()),
        "alpha_words": pa.array(aw, pa.int64()),
        "hash_count": pa.array(hc, pa.int64()),
        "r_words": pa.array(r_words, pa.int64()),
        "r_mean_len": pa.array(r_mean_len, pa.int64()),
        "r_alpha": pa.array(r_alpha, pa.int64()),
        "r_symbol": pa.array(r_symbol, pa.int64()),
        "keep": pa.array(keep, pa.int64()),
    })


def unigram_ppl(docs_ds, n_buckets: int | None = None):
    """Corpus-trained unigram negative-log-likelihood per document — the
    CCNet-style LM-quality signal (Wenzek et al. 2020 bucket corpora by
    LM perplexity; a unigram model is the dependency-free stand-in, with
    the same two-pass dataflow a KenLM deployment would use).

    Pass 1 (train): token counts via per-batch ``pyarrow.group_by``
    partials + ONE bucketed shuffle; the resulting vocabulary (zipfian,
    bounded — the same driver-side bound the canonicalization combine
    relies on) is collected and broadcast once with MLE log-probs.
    Pass 2 (score): per-batch vectorized token->logprob map (pandas
    hash join) + segment sums.  Scoring the training corpus itself
    means OOV cannot occur.

    Returns Dataset(doc_id, n_tokens, nll_bp) with nll_bp =
    floor(avg(-ln p) * 1e4 + 0.5) — integer-rounded so the SQL oracle
    hash-matches.
    """
    import numpy as np
    import ray

    from .partitioning import bucket_array, default_buckets

    nb = n_buckets or default_buckets()

    def count_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for text in t.column("text").to_pylist():
            toks.extend(_WS_RE.split(text.strip()))
        out = (pa.table({"tok": pa.array(toks, pa.string())})
               .group_by("tok").aggregate([("tok", "count")]))
        return out.append_column(
            "__b", pa.array(bucket_array(out["tok"], nb), pa.int32()))

    def count_final(g) -> "object":
        out = g.groupby("tok", as_index=False)["tok_count"].sum()
        return out.rename(columns={"tok_count": "c"})

    counts = (docs_ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("__b")
              .map_groups(count_final, batch_format="pandas")
              .to_pandas())
    total = float(counts["c"].sum())
    logp = dict(zip(counts["tok"],
                    -np.log(counts["c"].to_numpy(np.float64) / total)))
    ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        import pandas as pd

        lp = ray.get(ref)
        toks: list[str] = []
        lens: list[int] = []
        for text in t.column("text").to_pylist():
            ws = _WS_RE.split(text.strip())
            toks.extend(ws)
            lens.append(len(ws))
        vals = pd.Series(toks, dtype=object).map(lp).to_numpy(np.float64)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        sums = np.add.reduceat(vals, offs) if len(vals) else np.array([])
        n = np.asarray(lens, np.int64)
        avg = sums / n
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n, pa.int64()),
            "nll_bp": pa.array(np.floor(avg * 10_000 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")
