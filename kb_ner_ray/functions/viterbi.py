"""Pure-numpy CRF Viterbi decode — the T3 seat's decode kernel.

Matches the reference's ``_viterbi_decode`` semantics
(``flair/models/sequence_tagger_model.py:1248-1327``):

* ``transitions[to, from]`` orientation: step score for moving INTO tag
  ``to`` FROM tag ``from`` (``next_tag_var = forward_var.expand(K, K) +
  transitions``; max over dim=1 = over the *from* axis).
* forward init: ``-1e12`` everywhere except ``START`` = 0; emission is
  added AFTER the max at each step.
* terminal: ``forward + transitions[STOP]``, then the START/STOP entries
  are forced to ``-1e12`` before the argmax.
* per-token confidence = max of the softmax over that step's forward
  scores (reference: ``softmax[argmax(backscore)]`` — identical value).
* ``all_scores`` mode returns the per-step softmax rows with the
  reference's swap rule applied (the best-path tag's score is swapped
  with the row argmax when they differ,
  ``sequence_tagger_model.py:1312-1326``).
* S-X context masking (``sequence_tagger_model.py:1198-1208``,
  ``remove_x``): positions outside the mask are excluded from the decode
  and emitted as ``S-X`` with confidence 1.

The sandbox has no GPU/torch, so emissions come from any scorer that
yields a (T, K) float matrix — the gazetteer-shaped emitter in
``stages/tagger.py`` or a real model's logits; the decode is scorer-
agnostic.  Runs per sentence inside ``map_batches`` bodies (T and K are
small; the batch dimension provides the parallelism).
"""

from __future__ import annotations

import numpy as np

START_TAG = "<START>"
STOP_TAG = "<STOP>"

_NEG = -1e12  # reference's init_vvars fill value
_FORBID = -10000.0  # flair's score for disallowed transitions


def bioes_tag_dictionary(labels: list[str]) -> list[str]:
    """Tag index space for a BIOES label set, START/STOP last (flair's
    tag_dictionary appends ``<START>``/``<STOP>`` after the corpus tags,
    ``flair/trainers/trainer.py`` make_tag_dictionary)."""
    tags = ["O"]
    for lab in labels:
        tags.extend([f"B-{lab}", f"I-{lab}", f"E-{lab}", f"S-{lab}"])
    tags.extend([START_TAG, STOP_TAG])
    return tags


def bioes_transitions(tags: list[str]) -> np.ndarray:
    """Constraint transition matrix ``[to, from]`` for a BIOES tag space:
    0 for grammatical transitions, -10000 for forbidden ones (what a
    trained flair CRF converges to, shape-wise; the decode only needs the
    allowed/forbidden structure to be right).

    BIOES grammar: a span is ``S-X`` or ``B-X I-X* E-X``; ``I-X``/``E-X``
    may only follow ``B-X``/``I-X`` of the SAME label; outside positions
    (``O``, span ends, START) may open a span or stay out."""
    k = len(tags)
    start_idx, stop_idx = tags.index(START_TAG), tags.index(STOP_TAG)
    trans = np.full((k, k), _FORBID, dtype=np.float64)

    def can_end(tag: str) -> bool:  # a position a span/sentence may END on
        return tag == "O" or tag[:2] in ("E-", "S-")

    def can_open(tag: str) -> bool:  # valid first tag after an outside pos
        return tag == "O" or tag[:2] in ("B-", "S-")

    for to_i, to in enumerate(tags):
        for fr_i, fr in enumerate(tags):
            if fr == STOP_TAG or to == START_TAG:
                continue
            if fr == START_TAG:
                ok = to != STOP_TAG and can_open(to)
            elif to == STOP_TAG:
                ok = can_end(fr)
            elif fr == "O" or fr[:2] in ("E-", "S-"):
                ok = can_open(to)
            else:  # fr is B-X or I-X: must continue the same span
                ok = to[:2] in ("I-", "E-") and to[2:] == fr[2:]
            if ok:
                trans[to_i, fr_i] = 0.0
    return trans


def viterbi_decode(
    emissions: np.ndarray,
    transitions: np.ndarray,
    start_idx: int,
    stop_idx: int,
    all_scores: bool = False,
) -> tuple[list[float], list[int], list[list[float]]]:
    """Best tag path through a (T, K) emission matrix under a (K, K)
    ``[to, from]`` transition matrix.  Returns ``(confidences, path,
    scores)`` exactly like the reference's ``_viterbi_decode``."""
    emissions = np.asarray(emissions, dtype=np.float64)
    T, K = emissions.shape
    forward = np.full(K, _NEG, dtype=np.float64)
    forward[start_idx] = 0.0
    backpointers = np.empty((T, K), dtype=np.int64)
    backscores = np.empty((T, K), dtype=np.float64)
    for t in range(T):
        next_tag_var = forward[None, :] + transitions  # [to, from]
        bptrs = np.argmax(next_tag_var, axis=1)
        forward = next_tag_var[np.arange(K), bptrs] + emissions[t]
        backscores[t] = forward
        backpointers[t] = bptrs
    terminal = forward + transitions[stop_idx]
    terminal[stop_idx] = _NEG
    terminal[start_idx] = _NEG
    best = int(np.argmax(terminal))
    path = [best]
    for t in range(T - 1, 0, -1):
        best = int(backpointers[t, best])
        path.append(best)
    assert int(backpointers[0, path[-1]]) == start_idx
    path.reverse()

    # softmax over each step's forward scores; confidence = its max
    m = backscores.max(axis=1, keepdims=True)
    e = np.exp(backscores - m)
    sm = e / e.sum(axis=1, keepdims=True)
    confidences = sm.max(axis=1).tolist()

    scores: list[list[float]] = []
    if all_scores:
        for t, tag_id in enumerate(path):
            row = sm[t].tolist()
            arg = int(np.argmax(sm[t]))
            if tag_id != arg:  # reference's swap rule
                row[tag_id], row[arg] = row[arg], row[tag_id]
            scores.append(row)
    return confidences, path, scores


def viterbi_decode_masked(
    emissions: np.ndarray,
    transitions: np.ndarray,
    start_idx: int,
    stop_idx: int,
    mask: np.ndarray,
    sx_idx: int,
) -> tuple[list[float], list[int]]:
    """``remove_x`` decode (reference ``:1198-1208``): run Viterbi over the
    masked-in positions only, then pad the masked-out prefix/suffix with
    ``S-X`` at confidence 1."""
    mask = np.asarray(mask, dtype=bool)
    length = len(mask)
    inside = emissions[mask]
    if len(inside) == 0:
        return [1.0] * length, [sx_idx] * length
    conf, path, _ = viterbi_decode(inside, transitions, start_idx, stop_idx)
    if len(path) < length:
        n_before = int(np.argmax(mask))  # first masked-in position
        conf = [1.0] * n_before + conf
        path = [sx_idx] * n_before + path
        n_after = length - len(path)
        conf = conf + [1.0] * n_after
        path = path + [sx_idx] * n_after
    return conf, path
