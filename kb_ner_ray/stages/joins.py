"""Generic bucketed hash join — the scale path behind every
"broadcast-small-side" join in this repo (SURVEY.md §2.4).

When neither side fits in a broadcast, co-partition BOTH sides on
``hash(key) % n_buckets`` (a fixed-width shuffle key, like the dedup
operators), union them with a side tag, and merge each bucket with pandas.
ONE all-to-all on the coarse bucket key; within-bucket merge is vectorized.

The broadcast joins stay the right choice when one side is
vocabulary-sized; this operator is the documented fallback and is
exact-oracled via the orders_lineitem_bucketed query.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .partitioning import bucket_array, default_buckets

# Probe-side chunk size for the in-bucket merge (see merge_bucket): bounds
# the pandas hash-merge intermediate when a bucket is oversized.
MERGE_CHUNK_ROWS = 1 << 18


def hash_join(left_ds, right_ds, on: str, n_buckets: int | None = None,
              how: str = "inner"):
    """Dataset x Dataset equi-join on ``on``.

    Non-key column names must be disjoint between the sides (no suffixing —
    keep the dataflow explicit).  Returns a Dataset with L ∪ R columns.
    """
    from .partitioning import ensure_arrow

    if n_buckets is None:
        n_buckets = default_buckets()
    left_ds, left_schema = ensure_arrow(left_ds)
    right_ds, right_schema = ensure_arrow(right_ds)
    l_cols = list(left_schema.names)
    r_cols = list(right_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    l_types = dict(zip(left_schema.names, left_schema.types))
    r_types = dict(zip(right_schema.names, right_schema.types))
    all_cols = l_cols + [c for c in r_cols if c != on]
    types = {**r_types, **l_types}

    def widen(side: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in t.column_names:
                    arrays.append(t[c])
                else:
                    arrays.append(pa.nulls(n, types[c]))
            names.append("__side")
            arrays.append(pa.array([side] * n, pa.string()))
            names.append("__bucket")
            arrays.append(pa.array(bucket_array(t[on], n_buckets),
                                   pa.int32()))
            return pa.Table.from_arrays(arrays, names=names)
        return f

    tagged = (left_ds.map_batches(widen("L"), batch_format="pyarrow")
              .union(right_ds.map_batches(widen("R"), batch_format="pyarrow")))

    l_out = l_cols
    r_out = [c for c in r_cols if c != on]
    int_cols = [c for c, t in types.items() if pa.types.is_integer(t)]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "L"][l_out]
        rg = g[g["__side"] == "R"][[on] + r_out]
        # Sub-batch the probe side: a bucket is ~corpus/fan-out rows, and
        # pandas' hash merge spikes to build-table + full-output at once.
        # Chunking the left (probe) frame bounds the per-merge working set
        # so an oversized bucket degrades gracefully instead of OOMing the
        # reducer.  Sound because each probe row joins independently;
        # 'outer' decomposes into the chunk-safe left join plus the
        # right rows whose key appears in NO left row (computed once per
        # bucket with a vectorized isin — co-partitioning guarantees a
        # key's rows are all in this bucket).
        if how not in ("inner", "left", "outer"):
            raise ValueError(
                f"unsupported how={how!r} (inner/left/outer only)")
        lhow = "left" if how == "outer" else how
        if len(lg) <= MERGE_CHUNK_ROWS:
            joined = lg.merge(rg, on=on, how=lhow)
        else:
            import numpy as np

            joined = pd.concat(
                [c.merge(rg, on=on, how=lhow) for c in np.array_split(
                    lg, -(-len(lg) // MERGE_CHUNK_ROWS))],
                ignore_index=True)
        if how == "outer":
            r_only = rg[~rg[on].isin(lg[on])]
            if len(r_only):
                joined = pd.concat([joined, r_only], ignore_index=True)
        # the null-widened union floats integer columns; restore dtypes
        for c in int_cols:
            if c in joined.columns and joined[c].notna().all():
                joined[c] = joined[c].astype("int64")
        return joined[all_cols]

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def _tag_and_bucket(ds, key: str, side: str, cols: list[str],
                    n_buckets: int):
    """Project to ``cols``, add __side/__bucket (bucket on ``key``)."""
    def f(t: pa.Table) -> pa.Table:
        arrays = [t[c] for c in cols]
        names = list(cols)
        names += ["__side", "__bucket"]
        arrays += [pa.array([side] * t.num_rows, pa.string()),
                   pa.array(bucket_array(t[key], n_buckets), pa.int32())]
        return pa.Table.from_arrays(arrays, names=names)
    return ds.map_batches(f, batch_format="pyarrow")


def asof_join(left_ds, right_ds, left_ts: str, right_ts: str,
              left_by: str, right_by: str,
              n_buckets: int | None = None, direction: str = "backward"):
    """Bucketed as-of join — the scale path for "latest right row at or
    before each left row's timestamp, matched on a by-key".

    Both sides are co-partitioned on ``hash(by_key) % n_buckets`` (every
    left row and all its candidate right rows land in the same bucket, so
    the per-bucket ``merge_asof`` is exact), unioned with a side tag, and
    each bucket runs ONE vectorized ``pd.merge_asof`` after an in-bucket
    sort.  One all-to-all on the coarse bucket key; no side is broadcast —
    this replaces the full-right-frame broadcast that round 1 flagged as
    un-broadcastable at 100 TB.

    Output: left columns + right's non-by columns (``right_ts`` included).
    Non-key column names must be disjoint.
    """
    from .partitioning import ensure_arrow

    if n_buckets is None:
        n_buckets = default_buckets()
    left_ds, l_schema = ensure_arrow(left_ds)
    right_ds, r_schema = ensure_arrow(right_ds)
    l_cols, r_cols = list(l_schema.names), list(r_schema.names)
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")
    types = {**dict(zip(r_schema.names, r_schema.types)),
             **dict(zip(l_schema.names, l_schema.types))}
    by_type = dict(zip(l_schema.names, l_schema.types))[left_by]
    all_cols = l_cols + [c for c in r_cols if c != right_by]

    def widen(side: str, key: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                arrays.append(t[c] if c in t.column_names
                              else pa.nulls(n, types[c]))
            names += ["__by", "__side", "__bucket"]
            arrays += [t[key].cast(by_type),
                       pa.array([side] * n, pa.string()),
                       pa.array(bucket_array(t[key], n_buckets), pa.int32())]
            return pa.Table.from_arrays(arrays, names=names)
        return f

    tagged = (left_ds.map_batches(widen("L", left_by), batch_format="pyarrow")
              .union(right_ds.map_batches(widen("R", right_by),
                                          batch_format="pyarrow")))
    r_out = [c for c in r_cols if c != right_by]
    int_cols = [c for c, tp in types.items() if pa.types.is_integer(tp)]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "L"][l_cols + ["__by"]].sort_values(left_ts)
        rg = g[g["__side"] == "R"][r_out + ["__by"]].copy()
        # the null-widened union floats the right ts; restore for merge_asof
        rg[right_ts] = rg[right_ts].astype(lg[left_ts].dtype)
        rg = rg.sort_values(right_ts)
        merged = pd.merge_asof(lg, rg, left_on=left_ts, right_on=right_ts,
                               by="__by", direction=direction)
        merged = merged[all_cols]
        for c in int_cols:  # un-float null-widened integer columns
            if c in merged.columns and merged[c].notna().all():
                merged[c] = merged[c].astype("int64")
        return merged

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def _build_bloom(keys_ds, col: str, n_bits: int):
    """Distributed Bloom build: per-batch partial filters, an in-stream
    OR-combine level (every worker batch of partial blobs collapses to
    ONE blob — the driver never holds the n_blocks x n_bits/8 partial
    stream), then a STREAMING driver OR over the combined rows
    (iter_batches: O(1) driver memory regardless of block count)."""
    import numpy as np

    from .partitioning import BloomFilter

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits)
        bf.add_many(t[col])
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    def or_combine(t: pa.Table) -> pa.Table:
        acc = None
        for b in t["bits"].to_pylist():
            arr = np.frombuffer(b, dtype=np.uint8)
            acc = arr.copy() if acc is None else acc | arr
        if acc is None:
            return pa.table({"bits": pa.array([], pa.binary())})
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    combined = (keys_ds.map_batches(partial, batch_format="pyarrow")
                .map_batches(or_combine, batch_format="pyarrow",
                             batch_size=64))
    bits = None
    for batch in combined.iter_batches(batch_format="pyarrow"):
        for b in batch["bits"].to_pylist():
            arr = np.frombuffer(b, dtype=np.uint8)
            bits = arr.copy() if bits is None else bits | arr
    return BloomFilter(n_bits, bits if bits is not None else None)


def semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
              n_buckets: int | None = None, anti: bool = False,
              bloom_prefilter: bool = False, bloom_bits: int = 1 << 20):
    """Bucketed SEMI (or ANTI) join: keep left rows whose key does (not)
    appear on the right.  Right side is projected to its key column, both
    sides co-partitioned on ``hash(key) % n_buckets``, per-bucket filter is
    a vectorized ``isin``.  The scale path for the broadcast key-set semi
    joins (key sets stop being broadcastable when the right side is a fact
    table)."""
    if n_buckets is None:
        n_buckets = default_buckets()
    right_on = right_on or on
    if bloom_prefilter:
        # Bloom has no false NEGATIVES, so dropping definitely-absent left
        # rows before the shuffle preserves semi-join exactness (false
        # positives fall through to the exact in-bucket isin).  An ANTI
        # join cannot use it: a false positive would wrongly DROP a row.
        if anti:
            raise ValueError("bloom_prefilter is unsound for anti joins")
        import ray

        from .partitioning import BloomFilter
        from .similarity import _cached_state

        bloom = _build_bloom(right_ds.select_columns([right_on]),
                             right_on, bloom_bits)
        bref = ray.put(bloom.bits)

        def prefilter(t: pa.Table) -> pa.Table:
            bf = BloomFilter(bloom_bits, _cached_state(bref, lambda b: b))
            return t.filter(pa.array(bf.contains_many(t[on])))

        left_ds = left_ds.map_batches(prefilter, batch_format="pyarrow")
    from .partitioning import ensure_arrow

    left_ds, l_schema = ensure_arrow(left_ds)
    l_cols = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))

    def widen_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t[right_on].cast(l_types[on]) if c == on
                  else pa.nulls(n, l_types[c]) for c in l_cols]
        names = list(l_cols) + ["__side", "__bucket"]
        arrays += [pa.array(["R"] * n, pa.string()),
                   pa.array(bucket_array(t[right_on], n_buckets), pa.int32())]
        return pa.Table.from_arrays(arrays, names=names)

    tagged = (_tag_and_bucket(left_ds, on, "L", l_cols, n_buckets)
              .union(right_ds.select_columns([right_on])
                     .map_batches(widen_right, batch_format="pyarrow")))

    int_cols = [c for c, tp in l_types.items() if pa.types.is_integer(tp)]

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "L"]
        keys = g.loc[g["__side"] == "R", on].unique()
        keep = lg[on].isin(keys)
        out = lg.loc[~keep if anti else keep, l_cols].copy()
        if not len(out):
            # typed empty Arrow block: an empty object-dtype pandas frame
            # trips Ray's block-size estimator ("cannot call `vectorize`
            # on size 0 inputs") on every string column
            return pa.Table.from_arrays(
                [pa.array([], l_types[c]) for c in l_cols], names=l_cols)
        for c in int_cols:  # un-float null-widened integer columns
            if out[c].notna().all():
                out[c] = out[c].astype("int64")
        return out

    return tagged.groupby("__bucket").map_groups(filter_bucket,
                                                 batch_format="pandas")
