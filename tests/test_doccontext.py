"""Document-context attach (stages/doccontext.py) — budget semantics
pinned to flair's add_document_embeddings_v2 (embeddings.py:3747-3760)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from kb_ner_ray.functions.tokenizer import subtoken_count
from kb_ner_ray.stages.doccontext import attach_document_context


def _sent_ds(docs: dict[str, list[str]]):
    urls, sids, texts = [], [], []
    for url, sents in docs.items():
        for i, s in enumerate(sents):
            urls.append(url)
            sids.append(i)
            texts.append(s)
    return ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "sent_id": pa.array(sids, pa.int32()),
        "text": pa.array(texts, pa.string()),
    }))


DOCS = {
    "doc1": ["alpha beta gamma delta", "epsilon zeta", "eta theta iota",
             "kappa lambda mu nu xi", "omicron pi"],
    "doc2": ["one two three"],
    "doc3": ["a b", "c d e f g h i j k l m n o p q r s t"],
}


def _run(budget, pre_grouped=False):
    df = attach_document_context(_sent_ds(DOCS), budget=budget,
                                 pre_grouped=pre_grouped).to_pandas()
    return df.sort_values(["url", "sent_id"]).reset_index(drop=True)


def test_budget_invariant_and_contiguity(ray_session):
    budget = 12
    df = _run(budget)
    for _i, row in df.iterrows():
        total = (row["n_subtokens"] + row["left_ctx_subtokens"]
                 + row["right_ctx_subtokens"])
        if row["n_subtokens"] <= budget:
            assert total <= budget
        else:  # oversized sentence: contexts clamp to empty
            assert row["left_ctx_subtokens"] == 0
            assert row["right_ctx_subtokens"] == 0
        # left_context + text + right_context is a contiguous doc slice
        doc_flat = " ".join(DOCS[row["url"]]).split()
        window = (row["left_context"].split() + row["text"].split()
                  + row["right_context"].split())
        n = len(window)
        assert any(doc_flat[k:k + n] == window
                   for k in range(len(doc_flat) - n + 1))
        # reported subtoken counts match the cost model
        assert row["left_ctx_subtokens"] == subtoken_count(
            row["left_context"])
        assert row["right_ctx_subtokens"] == subtoken_count(
            row["right_context"])


def test_reference_budget_split_formula(ray_session):
    """The shorter side gets half the slack, the longer side absorbs the
    rest (flair embeddings.py:3752-3758): a first sentence (no left
    material) must spend the WHOLE remaining budget on the right."""
    budget = 10
    df = _run(budget)
    first = df[(df["url"] == "doc1") & (df["sent_id"] == 0)].iloc[0]
    assert first["left_ctx_subtokens"] == 0
    right_len = sum(subtoken_count(s) for s in DOCS["doc1"][1:])
    assert first["right_ctx_subtokens"] == min(
        right_len, budget - first["n_subtokens"],
        # greedy whole-token realization can undershoot by < one token,
        # but here every token costs 1 so it is exact
    )
    # middle sentence with enough material on both sides splits evenly
    mid = df[(df["url"] == "doc1") & (df["sent_id"] == 2)].iloc[0]
    half = (budget - mid["n_subtokens"]) // 2
    # left is shorter here (6 vs 7): left gets min(6, half)
    assert mid["left_ctx_subtokens"] == min(6, half)


def test_single_sentence_doc_has_no_context(ray_session):
    df = _run(50)
    row = df[df["url"] == "doc2"].iloc[0]
    assert row["left_context"] == "" and row["right_context"] == ""


def test_pre_grouped_equals_shuffled_plan(ray_session):
    a = _run(12, pre_grouped=False)
    b = _run(12, pre_grouped=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_large_budget_attaches_whole_doc(ray_session):
    df = _run(10_000)
    for url, sents in DOCS.items():
        sub = df[df["url"] == url]
        doc_flat = " ".join(sents).split()
        for _i, row in sub.iterrows():
            window = (row["left_context"].split() + row["text"].split()
                      + row["right_context"].split())
            assert window == doc_flat
