"""Span codec unit tests — modeled on reference tests/test_data.py:468+
(get_spans cases) and ensemble_prediction.py vote semantics."""

from kb_ner_ray.functions.spans import (
    bio_to_bioes,
    bioes_to_bio,
    decode_bioes,
    greedy_vote_assign,
    span_prf,
    spans_to_bio,
    spans_to_bioes,
)


def test_bio_bioes_roundtrip():
    bio = ["O", "B-PER", "I-PER", "O", "B-LOC", "B-CW", "I-CW", "I-CW", "O"]
    bioes = bio_to_bioes(bio)
    assert bioes == ["O", "B-PER", "E-PER", "O", "S-LOC", "B-CW", "I-CW",
                     "E-CW", "O"]
    assert bioes_to_bio(bioes) == bio


def test_bio_to_bioes_edges():
    assert bio_to_bioes(["B-PER"]) == ["S-PER"]
    assert bio_to_bioes(["B-PER", "I-PER"]) == ["B-PER", "E-PER"]
    # I- after a different label does not continue the span
    assert bio_to_bioes(["B-PER", "I-LOC"]) == ["S-PER", "E-LOC"]


def test_decode_simple():
    tags = ["O", "B-PER", "E-PER", "O", "S-LOC"]
    assert [s[:3] for s in decode_bioes(tags)] == [(1, 3, "PER"), (4, 5, "LOC")]


def test_decode_s_breaks_span():
    # flair/data.py:489-494 — an S- followed by a different label starts new
    tags = ["S-PER", "S-LOC"]
    assert [s[:3] for s in decode_bioes(tags)] == [(0, 1, "PER"), (1, 2, "LOC")]


def test_decode_bio_input():
    # BIO also decodes (B- starts, I- continues)
    tags = ["B-PER", "I-PER", "O", "B-LOC"]
    assert [s[:3] for s in decode_bioes(tags)] == [(0, 2, "PER"), (3, 4, "LOC")]


def test_decode_majority_label_with_begin_weight():
    # begin tag weight 1.1 wins a 1-1 tie (flair/data.py:511-513)
    tags = ["B-PER", "I-LOC"]
    assert [s[:3] for s in decode_bioes(tags)] == [(0, 2, "PER")]
    # 2 continuations outvote the 1.1 begin
    tags = ["B-PER", "I-LOC", "I-LOC"]
    assert [s[:3] for s in decode_bioes(tags)] == [(0, 3, "LOC")]


def test_decode_bare_tag_is_single():
    # non-BIOES tag => S- (flair/data.py:474-476)
    assert [s[:3] for s in decode_bioes(["PER", "O"])] == [(0, 1, "PER")]


def test_decode_literal_o_prefix_is_outside():
    # a raw 'O-…' tag is OUTSIDE (flair 'O-' prefix == bare 'O'); the
    # round-2 run-scan rewrite briefly absorbed it into a span (advice)
    assert [s[:3] for s in decode_bioes(["B-PER", "O-X", "S-LOC"])] == [
        (0, 1, "PER"), (2, 3, "LOC")]
    assert decode_bioes(["O-X", "O-X"]) == []
    # and it splits a span exactly like a bare 'O' would
    assert ([s[:3] for s in decode_bioes(["B-PER", "O-X", "I-PER"])]
            == [s[:3] for s in decode_bioes(["B-PER", "O", "I-PER"])])


def test_decode_scores_mean():
    spans = decode_bioes(["B-PER", "E-PER"], scores=[0.8, 0.6])
    assert abs(spans[0][3] - 0.7) < 1e-9
    assert decode_bioes(["B-PER", "E-PER"], scores=[0.1, 0.1], min_score=0.5) == []


def test_spans_to_tags_roundtrip():
    spans = [(1, 3, "PER"), (4, 5, "LOC")]
    bio = spans_to_bio(spans, 6)
    assert bio == ["O", "B-PER", "I-PER", "O", "B-LOC", "O"]
    assert [s[:3] for s in decode_bioes(spans_to_bioes(spans, 6))] == spans


def test_greedy_vote_assign_reference_example():
    # the worked example in ensemble_prediction.py:403 (comment):
    # vote={(7,10,'CORP'):6, (7,10,'ABC'):7, (7,11,'ABC'):7, (7,11,'CORP'):6,
    #       (7,11,'CW'):6, (7,15,'CORP'):5}. The reference sorts by span
    # length desc FIRST, then (stable) by votes desc — so votes are the
    # primary key and length only breaks vote ties: among the two 7-vote
    # spans, (7,11,'ABC') is longer and wins; everything else overlaps.
    votes = {(7, 10, "CORP"): 6, (7, 10, "ABC"): 7, (7, 11, "ABC"): 7,
             (7, 11, "CORP"): 6, (7, 11, "CW"): 6, (7, 15, "CORP"): 5}
    assert greedy_vote_assign(votes, 20, threshold=3.5) == [(7, 11, "ABC")]
    # threshold above every vote count -> nothing survives
    assert greedy_vote_assign(votes, 20, threshold=8) == []
    # non-overlapping spans are all kept, output sorted by position
    votes2 = {(0, 2, "PER"): 3, (5, 6, "LOC"): 2}
    assert greedy_vote_assign(votes2, 10, threshold=2) == [(0, 2, "PER"),
                                                          (5, 6, "LOC")]


def test_greedy_vote_threshold_is_strict_less():
    # reference: `if value < threshold: continue` — equality passes
    assert greedy_vote_assign({(0, 1, "PER"): 2}, 3, threshold=2) == [(0, 1, "PER")]
    assert greedy_vote_assign({(0, 1, "PER"): 1}, 3, threshold=2) == []


def test_span_prf():
    gold = [("u", 0, 1, "PER"), ("u", 2, 3, "LOC")]
    pred = [("u", 0, 1, "PER"), ("u", 2, 3, "CW")]
    p, r, f1, tp, fp, fn = span_prf(gold, pred)
    assert (tp, fp, fn) == (1, 1, 1)
    assert p == r == f1 == 0.5
    assert span_prf([], [])[:3] == (0.0, 0.0, 0.0)


def test_span_prf_multiset():
    gold = [("a",), ("a",)]
    assert span_prf(gold, [("a",)])[3:] == (1, 0, 1)


def test_label2mention():
    from kb_ner_ray.functions.spans import bioes_to_bio, label2mention

    tags = ["O", "B-PER", "I-PER", "B-LOC", "O"]
    assert label2mention(tags) == ["O", "B-ENT", "I-ENT", "B-ENT", "O"]
    # reference composition: bioes2bio then label2mention
    bioes = ["S-PER", "O", "B-CW", "E-CW"]
    assert label2mention(bioes_to_bio(bioes)) == [
        "B-ENT", "O", "B-ENT", "I-ENT"]
    # untouched inputs pass through
    assert label2mention(["O", "S-PER"]) == ["O", "S-PER"]


def test_mentions_fast_path_equals_codec_path():
    """The trie fast path == the full tags->decode codec round-trip on
    every synthetic-corpus sentence (the identity the production path
    relies on), including augmented sequences."""
    from kb_ner_ray.data.synth import generate_corpus
    from kb_ner_ray.functions.text import extract_text, split_sentences
    from kb_ner_ray.state.gazetteer import Gazetteer

    corpus = generate_corpus(40, seed=7)
    gaz = Gazetteer(corpus["gazetteer"].to_pylist())
    n_checked = n_spans = 0
    for page in corpus["pages"].to_pylist():
        for sent in split_sentences(extract_text(page["html"]),
                                    page["lang"]):
            toks = sent.split()
            fast = gaz.mentions_via_codec(toks)
            slow = gaz.mentions_via_codec(toks, via_codec=True)
            assert fast == slow, sent
            n_checked += 1
            n_spans += len(fast)
    assert n_checked > 100 and n_spans > 50
