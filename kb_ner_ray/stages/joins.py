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

import zlib

import pandas as pd
import pyarrow as pa


def _bucket_of(values, n_buckets: int) -> list[int]:
    out = []
    for v in values:
        if isinstance(v, (int,)):
            h = zlib.crc32(int(v).to_bytes(8, "little", signed=True))
        else:
            h = zlib.crc32(str(v).encode("utf-8"))
        out.append(h % n_buckets)
    return out


def hash_join(left_ds, right_ds, on: str, n_buckets: int = 32,
              how: str = "inner"):
    """Dataset x Dataset equi-join on ``on``.

    Non-key column names must be disjoint between the sides (no suffixing —
    keep the dataflow explicit).  Returns a Dataset with L ∪ R columns.
    """
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
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
            arrays.append(pa.array(
                _bucket_of(t[on].to_pylist(), n_buckets), pa.int32()))
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
        joined = lg.merge(rg, on=on, how=how)
        # the null-widened union floats integer columns; restore dtypes
        for c in int_cols:
            if c in joined.columns and joined[c].notna().all():
                joined[c] = joined[c].astype("int64")
        return joined[all_cols]

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")
