"""Document-level context attach — the reference's FLERT-style
``add_document_embeddings_v2`` seat (flair/embeddings.py:3657-3766), the
one round-2 verdict item left from SURVEY §2: each sentence is
conditioned on its SURROUNDING DOCUMENT under a total subtoken budget,
not just on itself.

Budget semantics pinned to the reference (embeddings.py:3747-3760):

* ``sentence_length`` = the sentence's own subtoken cost;
* ``half_context = (budget - sentence_length) // 2``;
* the SHORTER side gets ``min(its_length, half_context)`` and the longer
  side absorbs the slack: ``min(its_length, budget - other - sentence)``
  — so a sentence at the document edge still uses the full budget on the
  side that has material.

Deviations (documented, both strictly safer):

* context is realized as WHOLE TOKENS cut at token boundaries (greedy
  outward from the sentence, never exceeding the side's subtoken
  budget); the reference slices raw subtoken ids mid-token, which has no
  text-level equivalent;
* budgets clamp at 0 when the sentence alone exceeds ``budget`` (the
  reference computes a negative half-context and slices nonsense).

Scale shape: one ``map_batches`` when the input is already grouped by
document (``pre_grouped=True`` — the kg explode stage emits each page's
sentences inside one batch), else one ``groupby(doc)`` shuffle.  All
costs come from ``functions.tokenizer.subtoken_count`` — swap in the
real HF backend via ``set_subtoken_backend`` and the budget arithmetic
is exact for the deployed model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.tokenizer import subtoken_count

DOC_CONTEXT_BUDGET = 510


def _attach_doc(texts: list[str], budget: int):
    """One document's ts-ordered sentences -> per-sentence (left_ctx,
    right_ctx, n_sub, left_sub, right_sub)."""
    # per-token costs, flat across the document
    sent_tokens = [t.split() for t in texts]
    flat_tokens: list[str] = []
    bounds = [0]
    for toks in sent_tokens:
        flat_tokens.extend(toks)
        bounds.append(len(flat_tokens))
    costs = np.array([subtoken_count(tok) for tok in flat_tokens],
                     dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(costs)])

    out = []
    for i in range(len(texts)):
        s, e = bounds[i], bounds[i + 1]
        sent_len = int(cum[e] - cum[s])
        left_len = int(cum[s])
        right_len = int(cum[-1] - cum[e])
        half = max(0, (budget - sent_len) // 2)
        if left_len < right_len:
            left_budget = min(left_len, half)
            right_budget = max(0, min(right_len,
                                      budget - left_budget - sent_len))
        else:
            right_budget = min(right_len, half)
            left_budget = max(0, min(left_len,
                                     budget - right_budget - sent_len))
        # greedy whole-token expansion outward, never exceeding the budget
        ls = s
        while ls > 0 and cum[s] - cum[ls - 1] <= left_budget:
            ls -= 1
        re_ = e
        while re_ < len(flat_tokens) and cum[re_ + 1] - cum[e] <= right_budget:
            re_ += 1
        out.append((
            " ".join(flat_tokens[ls:s]),
            " ".join(flat_tokens[e:re_]),
            sent_len,
            int(cum[s] - cum[ls]),
            int(cum[re_] - cum[e]),
        ))
    return out


def attach_document_context(sentences_ds, doc_col: str = "url",
                            order_col: str = "sent_id",
                            text_col: str = "text",
                            budget: int = DOC_CONTEXT_BUDGET,
                            pre_grouped: bool = False):
    """sentences(doc_col, order_col, text_col, ...) -> same rows +
    (left_context, right_context, n_subtokens, left_ctx_subtokens,
    right_ctx_subtokens).

    ``pre_grouped=True`` asserts each input BLOCK holds every sentence of
    the documents it touches and skips the shuffle (``batch_size=None``
    so Ray hands over whole blocks — the default 1024-row re-batching
    would split documents).  That contract holds for the kg explode
    stage's output as long as a map task's output block stays under
    ``DataContext.target_max_block_size`` (dynamic block splitting cuts
    at arbitrary row boundaries); when in doubt use the default, which
    runs one ``groupby(doc_col)`` shuffle and is always correct.
    """

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col).reset_index(drop=True)
        rows = _attach_doc(g[text_col].tolist(), budget)
        g = g.copy()
        g["left_context"] = [r[0] for r in rows]
        g["right_context"] = [r[1] for r in rows]
        g["n_subtokens"] = np.array([r[2] for r in rows], np.int64)
        g["left_ctx_subtokens"] = np.array([r[3] for r in rows], np.int64)
        g["right_ctx_subtokens"] = np.array([r[4] for r in rows], np.int64)
        return g

    if pre_grouped:
        def per_batch(df: pd.DataFrame) -> pd.DataFrame:
            return pd.concat(
                [per_doc(g) for _k, g in df.groupby(doc_col, sort=False)],
                ignore_index=True)

        return sentences_ds.map_batches(per_batch, batch_format="pandas",
                                        batch_size=None)
    return sentences_ds.groupby(doc_col).map_groups(per_doc,
                                                    batch_format="pandas")
