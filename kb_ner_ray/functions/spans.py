"""Span codec: BIO/BIOES tag-sequence <-> span conversions + span P/R metric.

This is the single pinned span-decode semantics for the whole engine
(SURVEY.md §2.2 M13/M15/M16).  The reference has two subtly different
decoders:

* ``flair/data.py:455-532`` (``Sentence.get_spans``) — BIOES decode where any
  non-BIOES tag is treated as ``S-``, spans break on ``O``/``B-``/``S-`` and
  after an ``S-``, span label = majority vote over member tags with a 1.1
  weight on the span-opening tag, span score = mean token score.
* ``ensemble_prediction.py:45-117`` (``check_span``) — a BIO decoder (inputs
  are converted ``bioes2bio`` first) tolerant of mid-span label switches.

We pin the ``get_spans`` semantics (it is the one used for evaluation and for
prediction output in the reference) and verify in tests that on well-formed
BIOES sequences both reference decoders and ours agree.

All functions are pure Python over lists — they run inside ``map_batches``
bodies on per-row tag lists (a sentence's tag sequence is short; the batch
dimension provides the vectorization).
"""

from __future__ import annotations

from collections import defaultdict

Span = tuple[int, int, str]  # (start_tok, end_tok_exclusive, label)


def bio_to_bioes(tags: list[str]) -> list[str]:
    """BIO -> BIOES (reference: flair/data.py:630-645 ``convert_tag_scheme``)."""
    out = list(tags)
    n = len(tags)
    for i, tag in enumerate(tags):
        if "-" not in tag:
            continue
        prefix, label = tag.split("-", 1)
        nxt = tags[i + 1] if i + 1 < n else "O"
        nxt_is_cont = nxt.startswith("I-") and nxt[2:] == label
        if prefix == "B":
            out[i] = ("B-" if nxt_is_cont else "S-") + label
        elif prefix == "I":
            out[i] = ("I-" if nxt_is_cont else "E-") + label
    return out


def bioes_to_bio(tags: list[str]) -> list[str]:
    """BIOES -> BIO (reference: ensemble_prediction.py:330-336 ``bioes2bio``)."""
    out = []
    for tag in tags:
        if tag.startswith("S-"):
            out.append("B-" + tag[2:])
        elif tag.startswith("E-"):
            out.append("I-" + tag[2:])
        else:
            out.append(tag)
    return out


def decode_bioes(
    tags: list[str], scores: list[float] | None = None, min_score: float = -1.0
) -> list[tuple[int, int, str, float]]:
    """Decode a BIOES (or BIO — handled identically) tag sequence into spans.

    Pinned semantics = reference ``flair/data.py:455-532``:

    * empty / ``O`` tags are OUT; any tag whose first two chars are not one of
      ``B- I- O- E- S-`` is treated as ``S-<tag>``;
    * ``B-``/``S-`` start a new span; a span also breaks after an ``S-`` tag
      when the next label differs;
    * span label = argmax of per-member-tag label weights (1.1 for the
      span-opening tag, 1.0 otherwise), ties broken by insertion order;
    * span score = mean of member token scores; spans with score <=
      ``min_score`` are dropped.

    Returns ``(start, end_exclusive, label, score)`` tuples.
    """
    if scores is None:
        scores = [1.0] * len(tags)
    spans: list[tuple[int, int, str, float]] = []
    current: list[int] = []
    weights: dict[str, float] = defaultdict(float)

    def flush() -> None:
        if not current:
            return
        span_score = sum(scores[i] for i in current) / len(current)
        if span_score > min_score:
            if len(weights) == 1:  # the common single-label span
                label = next(iter(weights))
            else:
                label = sorted(weights.items(),
                               key=lambda kv: kv[1], reverse=True)[0][0]
            spans.append((current[0], current[-1] + 1, label, span_score))
        current.clear()
        weights.clear()

    # Hot-path structure: spans never cross an OUT token, so only the
    # non-O RUNS need the stateful walk — the cheap index scan skips the
    # (typically ~95%) O tokens wholesale.  Semantics identical to the
    # single full walk (pinned by tests incl. property round-trips).
    n = len(tags)
    i = 0
    while i < n:
        raw = tags[i]
        if raw in ("", "O"):
            i += 1
            continue
        # walk one contiguous non-O run
        prev = "O-"
        while i < n and tags[i] not in ("", "O"):
            tag = tags[i]
            if tag[0:2] == "O-":
                # a literal 'O-…' tag is OUTSIDE (flair/data.py:461 treats
                # the 'O-' prefix like bare 'O'); without this the run-scan
                # would absorb it into a span labelled '…'
                flush()
                prev = "O-"
                i += 1
                continue
            if tag[0:2] not in ("B-", "I-", "E-", "S-"):
                tag = "S-" + tag
            starts_new = tag[0:2] in ("B-", "S-")
            if prev[0:2] == "S-" and prev[2:] != tag[2:]:
                starts_new = True
            if starts_new and current:
                flush()
            current.append(i)
            weights[tag[2:]] += 1.1 if starts_new else 1.0
            prev = tag
            i += 1
        flush()
    return spans


def label2mention(tags: list[str]) -> list[str]:
    """Collapse BIO labels to the single class ENT — the M14 seat
    (reference ensemble_prediction.py:339-345 ``label2mention``): B-* ->
    B-ENT, I-* -> I-ENT, everything else unchanged.  Runs after
    ``bioes_to_bio`` in the reference's mention-level ensemble, turning
    typed spans into untyped mention spans for cross-model voting."""
    return ["B-ENT" if t.startswith("B-")
            else "I-ENT" if t.startswith("I-") else t
            for t in tags]


def spans_to_bio(spans: list[Span], n_tokens: int) -> list[str]:
    """Render non-overlapping spans as a BIO tag sequence (inverse of decode)."""
    tags = ["O"] * n_tokens
    for start, end, label in spans:
        tags[start] = "B-" + label
        for i in range(start + 1, end):
            tags[i] = "I-" + label
    return tags


def spans_to_bioes(spans: list[Span], n_tokens: int) -> list[str]:
    return bio_to_bioes(spans_to_bio(spans, n_tokens))


def greedy_vote_assign(
    votes: dict[Span, int], n_tokens: int, threshold: float
) -> list[Span]:
    """Majority-vote greedy non-overlapping span assignment.

    Pinned semantics = reference ``ensemble_prediction.py:399-416``
    (``pred_ensemble``): sort spans by length desc, then by votes desc
    (stable, so among equal-vote spans the longest wins), then greedily keep a
    span iff every covered position is still unassigned and its votes >=
    ``threshold`` (reference uses ``< threshold: continue`` with threshold =
    n_models * 0.5, ensemble_prediction.py:490,505).
    """
    taken = [False] * n_tokens
    by_len = sorted(votes.items(), key=lambda kv: kv[0][1] - kv[0][0], reverse=True)
    by_vote = sorted(by_len, key=lambda kv: kv[1], reverse=True)
    kept: list[Span] = []
    for (start, end, label), count in by_vote:
        if count < threshold:
            continue
        if any(taken[start:end]):
            continue
        for i in range(start, end):
            taken[i] = True
        kept.append((start, end, label))
    return sorted(kept)


def span_prf(
    gold: list[tuple], pred: list[tuple]
) -> tuple[float, float, float, int, int, int]:
    """Exact-tuple span precision/recall/F1.

    Semantics per reference ``conlleval_perl.py:207-353`` /
    ``flair/models/sequence_tagger_model.py:2674-2686``: a predicted span is a
    TP iff the identical (key..., start, end, label) tuple exists in gold;
    multiset-aware (duplicates matched one-for-one).

    Returns (precision, recall, f1, tp, fp, fn).
    """
    from collections import Counter

    gold_c = Counter(map(tuple, gold))
    pred_c = Counter(map(tuple, pred))
    tp = sum(min(gold_c[k], c) for k, c in pred_c.items())
    fp = sum(pred_c.values()) - tp
    fn = sum(gold_c.values()) - tp
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1, tp, fp, fn


FOUR_CLASS = {"PER": "PER", "LOC": "LOC", "GRP": "ORG", "CORP": "ORG",
              "PROD": "MISC", "CW": "MISC"}


def remap_to_four_class(tag: str) -> str:
    """Prediction post-map (reference M20,
    flair/models/sequence_tagger_model.py:662-691): collapse the 6
    MultiCoNER types to CoNLL-03's {PER, LOC, ORG, MISC}; non-entity tags
    pass through as O."""
    if tag == "O" or "-" not in tag:
        return "O" if tag == "O" else tag
    prefix, label = tag.split("-", 1)
    mapped = FOUR_CLASS.get(label)
    return f"{prefix}-{mapped}" if mapped else "O"
