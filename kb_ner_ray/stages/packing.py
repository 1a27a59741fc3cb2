"""Training-sequence packing: map a corpus onto fixed-length LM training
sequences (the GPT/T5 "concatenate and chunk" recipe — every sequence is
exactly ``seq_len`` tokens, documents flow across sequence boundaries, no
padding).  The op emits an INDEX, not payload: (shard, seq_id, doc_id,
doc_offset, seq_offset, n_tokens) rows say which token span of which doc
lands where, so the 100-TB text never moves — the training-data writer
streams docs and cuts spans by this map.

Determinism: shard = int(md5(str(doc_id))[:8], 16) % n_shards (the same
pure-function-of-id contract as partitioning.deterministic_shuffle), doc
order within a shard = doc_id ascending, token counts = the repo's
whitespace contract (len(text.split()); swap the T1 subtoken backend via
functions.tokenizer for BPE counts).  Rerunnable and resumable per shard.

100-TB shape: the corpus pass emits 3 fixed-width ints per doc (token
counts — text itself never shuffles); ONE shard-hash groupby; per-shard
packing is a cumsum + vectorized interval expansion (np.repeat, no
Python loop over docs).  Exactly SQL-expressible (window SUM +
generate_series over the sequence range each doc overlaps) — the
registered DuckDB oracle mirrors it.

Reference seat: generalizes the O1 length-packing seat
(functions/tokenizer.py pack_batches, ref flair/custom_data_loader.py
sentence batching) from inference micro-batches to corpus-scale training
sequences.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_training_sequences(docs_ds, *, seq_len: int = 2048,
                            n_shards: int | None = None,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            token_counter=None):
    """Dataset(shard, seq_id, doc_id, doc_offset, seq_offset, n_tokens).

    Within a shard, docs concatenate in doc_id order and cut every
    ``seq_len`` tokens; a doc overlapping k sequences emits k rows.
    seq_id is shard-local and 0-based; the final partial sequence of a
    shard is emitted as-is (a trainer drops or pads exactly one tail
    per shard).  Empty docs (0 tokens) emit nothing.

    ``token_counter``: optional ``fn(text) -> int`` for real subtoken
    budgets — pass ``functions.tokenizer.subtoken_count`` (whose T1
    backend seam accepts a HF tokenizer) to pack by BPE counts instead
    of whitespace tokens; the default stays on the whitespace contract
    the SQL oracle mirrors."""
    from .partitioning import default_buckets
    from .sparse import _tokenize_batch

    ns = n_shards or default_buckets()
    L = int(seq_len)

    def counts(t: pa.Table) -> pa.Table:
        # 3 fixed-width ints per doc; the '' empty-text synth token of
        # the shared tokenizer must NOT count, so measure true splits
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if token_counter is not None:
            n_tok = np.array([int(token_counter(x))
                              for x in t[text_col].to_pylist()], np.int64)
            hx = [hashlib.md5(str(int(i)).encode()).hexdigest()[:8]
                  for i in ids]
            shard = np.array([int(h, 16) % ns for h in hx], np.int64)
            return pa.table({
                id_col: pa.array(ids.astype(np.int64)),
                "shard": pa.array(shard),
                "n_tok": pa.array(n_tok),
            })
        _flat, di, lengths = _tokenize_batch(t, text_col)
        # lengths counts >=1 per doc ('' synth token for empty text);
        # re-zero genuinely empty docs
        txt = t[text_col]
        import pyarrow.compute as pc

        empty = pc.equal(pc.utf8_trim_whitespace(txt), "") \
            .to_numpy(zero_copy_only=False)
        n_tok = lengths.astype(np.int64)
        n_tok[empty] = 0
        hx = [hashlib.md5(str(int(i)).encode()).hexdigest()[:8]
              for i in ids]
        shard = np.array([int(h, 16) % ns for h in hx], np.int64)
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            "shard": pa.array(shard),
            "n_tok": pa.array(n_tok),
        })

    def pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col, kind="mergesort")
        n = g["n_tok"].to_numpy(np.int64)
        keep = n > 0
        ids = g[id_col].to_numpy(np.int64)[keep]
        n = n[keep]
        if not len(ids):  # a shard whose every doc is empty emits nothing
            z = pa.array([], pa.int64())
            return pa.table({"shard": z, "seq_id": z, id_col: z,
                             "doc_offset": z, "seq_offset": z,
                             "n_tokens": z})
        shard = int(g["shard"].iloc[0])
        start = np.concatenate([[0], np.cumsum(n)[:-1]])
        s_first = start // L
        s_last = (start + n - 1) // L
        k = (s_last - s_first + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), k)
        # per-row sequence id: s_first[doc] + offset within the doc's run
        off = np.arange(len(rep), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(k)[:-1]]), k)
        seq = s_first[rep] + off
        lo = np.maximum(seq * L, start[rep])
        hi = np.minimum((seq + 1) * L, start[rep] + n[rep])
        return pa.table({
            "shard": pa.array(np.full(len(rep), shard, np.int64)),
            "seq_id": pa.array(seq),
            id_col: pa.array(ids[rep]),
            "doc_offset": pa.array(lo - start[rep]),
            "seq_offset": pa.array(lo - seq * L),
            "n_tokens": pa.array(hi - lo),
        })

    return (docs_ds.map_batches(counts, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack, batch_format="pandas"))
