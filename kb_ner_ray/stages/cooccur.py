"""Windowed token co-occurrence + PMI — distributional association mining
over a web corpus (the signal behind entity-linking priors, collocation
extraction and word-vector objectives; Church & Hanks 1990).

Semantics (mirrored exactly by the SQL oracle):

* positions = whitespace tokens of the trimmed text (empty text -> one ''
  token, the engine-wide tokenizer contract);
* one co-occurrence per ordered position pair (i, j) with
  1 <= j - i <= window in the same doc, keyed UNORDERED
  (min(tok_i, tok_j), max(...));
* pairs below ``min_pair`` are pruned (the association table for a
  zipfian corpus is unbounded without a support floor — the same
  prune-or-gate discipline as unigram_ppl's vocabulary);
* pmi = ln( (n_ab * T^2) / (P * n_a * n_b) ) with T = total token
  occurrences, P = total window pairs, n_a = corpus occurrence count —
  quantized to int64 basis points (repo float policy).

Plan (two corpus passes + one bucketed shuffle; text never shuffles):

* pass A streams the corpus, pre-aggregates window-pair counts per batch
  (vectorized: shifted-array equality per offset, no Python loop over
  rows), shuffles ONCE on hash(pair) and prunes inside the reducers;
  the surviving pair table is materialized (it is the pruned,
  fixed-width RESULT, not the corpus);
* the survivor token set is collected behind a measured-bytes gate
  (raises like decontaminate on a pathological corpus) and broadcast;
* pass B streams the corpus again for survivor-token occurrence counts
  (per-batch partials bounded by the survivor vocabulary) plus the T/P
  scalars — P needs only per-doc token counts, not pair enumeration;
* the final map scores survivors against the broadcast count dict.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .partitioning import default_buckets
from .sparse import _tokenize_batch

PMI_SCALE = 10_000


def _pair_counts_batch(t: pa.Table, text_col: str, window: int,
                       n_buckets: int) -> pa.Table:
    flat, doc_idx, _len = _tokenize_batch(t, text_col)
    toks = flat.to_numpy(zero_copy_only=False)
    parts = []
    for d in range(1, window + 1):
        if d >= len(toks):
            break
        same = doc_idx[:-d] == doc_idx[d:]
        if not same.any():
            continue
        x, y = toks[:-d][same], toks[d:][same]
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        parts.append(pd.DataFrame({"a": lo, "b": hi}))
    if not parts:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n_ab": pa.array([], pa.int64()),
                         "__b": pa.array([], pa.int32())})
    cnt = (pd.concat(parts).groupby(["a", "b"], sort=False)
           .size().reset_index(name="n_ab"))
    from .partitioning import bucket_multi

    cnt["__b"] = bucket_multi([cnt["a"].to_numpy(object),
                               cnt["b"].to_numpy(object)], n_buckets)
    return pa.Table.from_pandas(cnt, preserve_index=False)


def windowed_pmi(docs_ds, *, window: int = 3, min_pair: int = 5,
                 text_col: str = "text",
                 max_vocab_bytes: int = 1 << 30):
    """Dataset(tok_a, tok_b, n_ab, pmi_bp) of surviving co-occurrences."""
    nb = default_buckets()

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["a", "b"], as_index=False)["n_ab"].sum())
        out = out[out["n_ab"] >= min_pair]
        return out.astype({"n_ab": np.int64})

    survivors = (docs_ds
                 .map_batches(_pair_counts_batch, batch_format="pyarrow",
                              fn_kwargs={"text_col": text_col,
                                         "window": window,
                                         "n_buckets": nb})
                 .groupby("__b")
                 .map_groups(reduce_bucket, batch_format="pandas")
                 .materialize())
    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string()),
                      "n_ab": pa.array([], pa.int64()),
                      "pmi_bp": pa.array([], pa.int64())})
    if survivors.count() == 0:
        # keep the return type uniform (always a Dataset): the empty
        # result carries its schema via ds.schema(); note Ray drops
        # columns in .to_pandas() on ANY zero-row dataset, early-exit
        # or not — callers needing a typed empty frame use ds.schema()
        return ray.data.from_arrow(empty)

    # survivor token set: measured BEFORE it is pulled driver-side
    vocab_bytes = 0
    vocab: set[str] = set()
    for batch in survivors.select_columns(["a", "b"]).iter_batches(
            batch_format="pyarrow"):
        for col in ("a", "b"):
            arr = batch[col]
            vocab_bytes += arr.nbytes
            vocab.update(arr.to_pylist())
        if vocab_bytes > max_vocab_bytes:
            raise ValueError(
                f"survivor vocabulary exceeds {max_vocab_bytes} bytes; "
                f"raise min_pair (prune harder) or max_vocab_bytes")
    vocab_arr = pa.array(sorted(vocab), pa.string())
    vref = ray.put(vocab_arr)

    def count_partial(t: pa.Table) -> pa.Table:
        va = ray.get(vref)
        flat, _di, lengths = _tokenize_batch(t, text_col)
        n_tok = int(lengths.sum())
        n_pair = int(sum(np.maximum(lengths - d, 0).sum()
                         for d in range(1, window + 1)))
        mask = pc.is_in(flat, value_set=va).to_numpy(zero_copy_only=False)
        hit = pd.Series(flat.to_numpy(zero_copy_only=False)[mask])
        cnt = hit.value_counts()
        return pa.table({
            "tok": pa.array([None] + list(cnt.index), pa.string()),
            "n": pa.array([0] + list(cnt.to_numpy(np.int64)), pa.int64()),
            "n_tok": pa.array([n_tok] + [0] * len(cnt), pa.int64()),
            "n_pair": pa.array([n_pair] + [0] * len(cnt), pa.int64()),
        })

    parts = (docs_ds.map_batches(count_partial, batch_format="pyarrow")
             .to_pandas())
    total_t = float(parts["n_tok"].sum())
    total_p = float(parts["n_pair"].sum())
    counts = (parts[parts["tok"].notna()]
              .groupby("tok")["n"].sum().to_dict())
    cref = ray.put((counts, total_t, total_p))

    def score(g: pa.Table) -> pa.Table:
        cnts, tt, tp = ray.get(cref)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        nab = g["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([cnts[x] for x in a], np.float64)
        nb_ = np.array([cnts[x] for x in b], np.float64)
        pmi = np.log(nab * tt * tt / (tp * na * nb_))
        return pa.table({
            "tok_a": pa.array(a, pa.string()),
            "tok_b": pa.array(b, pa.string()),
            "n_ab": g["n_ab"],
            "pmi_bp": pa.array(
                np.floor(pmi * PMI_SCALE + 0.5).astype(np.int64)),
        })

    return survivors.map_batches(score, batch_format="pyarrow")
