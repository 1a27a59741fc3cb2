"""Sliding-window handling for over-long inputs — the reference's
``allow_long_sentences`` seat (flair/embeddings.py:2960-2969: window =
model_max_length 512, stride = window//2; overlap merge at
:3295-3299: the earlier window keeps the FIRST half of each overlap, the
later window the second half).

The reference windows subtoken embeddings; this engine windows the token
sequence around any per-window tagger (gazetteer trie, Viterbi, or a real
model's forward) and merges the per-token TAG sequences with the same
midpoint rule, so sentences longer than the model window still yield
mentions instead of being dropped (round-1 verdict, missing #3).
"""

from __future__ import annotations

WINDOW = 510          # token window (the 512 budget minus specials)
STRIDE = WINDOW // 2  # reference default: half-window overlap


def split_windows(n_tokens: int, window: int = WINDOW,
                  stride: int = STRIDE) -> list[tuple[int, int]]:
    """[start, end) windows covering n_tokens with half-window overlap.
    The last window is pulled back so it ends exactly at n_tokens (full
    right context for the tail, like the tokenizer's overflow windows)."""
    if n_tokens <= window:
        return [(0, n_tokens)]
    starts = list(range(0, n_tokens - window, stride))
    starts.append(n_tokens - window)
    return [(s, s + window) for s in starts]


def merge_window_seqs(windows: list[tuple[int, list]],
                      n_tokens: int) -> list:
    """Merge per-window per-token sequences (tags, scores, ...) into one
    length-``n_tokens`` sequence.  Each overlap is split at its midpoint:
    positions before the midpoint come from the earlier window, at/after
    from the later one (flair/embeddings.py:3295-3299 applied to tokens).
    Windows must be sorted by start and cover [0, n_tokens)."""
    out: list = [None] * n_tokens
    for w, (start, seq) in enumerate(windows):
        end = start + len(seq)
        if w == 0:
            lo = start
        else:
            prev_end = windows[w - 1][0] + len(windows[w - 1][1])
            lo = max(start, (start + prev_end) // 2)  # overlap midpoint
        if w == len(windows) - 1:
            hi = end
        else:
            hi = min(end, (windows[w + 1][0] + end) // 2)
        for i in range(lo, hi):
            out[i] = seq[i - start]
    return out


def tag_tokens_windowed(tokens: list[str], tag_fn,
                        window: int = WINDOW,
                        stride: int = STRIDE) -> list[str]:
    """Tag an arbitrarily long token sequence with a window-limited
    ``tag_fn(tokens) -> tags`` by sliding + midpoint merge.  For a
    position-local tagger (gazetteer trie with mention length << stride/2)
    this equals direct tagging — pinned by tests; for a real transformer
    it is the reference's long-sentence path."""
    if len(tokens) <= window:
        return tag_fn(tokens)
    wins = [(s, tag_fn(tokens[s:e]))
            for s, e in split_windows(len(tokens), window, stride)]
    return merge_window_seqs(wins, len(tokens))
