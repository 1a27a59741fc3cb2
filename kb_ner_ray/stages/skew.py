"""Salted two-phase grouped aggregation — explicit hot-key skew handling
(north rule: "skew from hot domains ... salted groupby keys for the
canonicalization shuffle").

A single hot key (one domain with 20% of all rows — the synthetic corpus
plants exactly this) lands on one reducer in a naive groupby.  Salting
splits every key into ``n_salts`` sub-keys for the first (wide) exchange,
then a second exchange over the per-(key, salt) partials — which is at most
``n_salts x |keys|`` rows — removes the salt.  The flagship pipeline's
canonicalization avoids the wide exchange entirely (per-batch combiner +
vocabulary-sized driver combine); this operator is the general fallback for
aggregates whose key cardinality is too large to combine on the driver but
whose key distribution is skewed.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def salted_grouped_sum(ds, key: str, value: str, n_salts: int = 16):
    """Dataset -> Dataset(key, sum, n_rows) via salt -> partial -> unsalt
    -> final.

    Both exchanges use coarse fixed-width keys: phase 1 groups on
    (salt) x hash-bucketed key inside per-batch combiners, so no reducer
    ever sees more than 1/n_salts of a hot key's rows.
    """
    def partial(t: pa.Table) -> pa.Table:
        # per-batch combiner + salt assignment (row index % n_salts)
        n = t.num_rows
        salt = pa.array([i % n_salts for i in range(n)], pa.int32())
        return (pa.table({key: t[key], "__salt": salt, value: t[value]})
                .group_by([key, "__salt"])
                .aggregate([(value, "sum"), (value, "count")]))

    from .partitioning import bucket_array, default_buckets

    n_kb = default_buckets()  # reducer fan-out follows the cluster

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__kb", pa.array(bucket_array(t[key], n_kb), pa.int32()))

    def unsalt(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, as_index=False).agg(
            **{"sum": (f"{value}_sum", "sum"),
               "n_rows": (f"{value}_count", "sum")})

    partials = (ds.map_batches(partial, batch_format="pyarrow")
                .map_batches(bucket, batch_format="pyarrow"))
    # ONE second exchange on the coarse key-hash bucket (keys of one
    # bucket co-locate; the salt dimension collapses vectorized inside)
    return (partials.groupby("__kb")
            .map_groups(unsalt, batch_format="pandas"))


def hot_key_fractions(ds, key: str, top: int = 5) -> pd.DataFrame:
    """Diagnostic: per-batch key counts -> driver combine -> top-N key
    share of total (used to decide broadcast vs salted strategies)."""
    def partial(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key]}).group_by(key).aggregate(
            [([key, "count"][0], "count")])

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = pdf.groupby(key, as_index=False)[f"{key}_count"].sum()
    total = agg[f"{key}_count"].sum()
    agg = agg.nlargest(top, f"{key}_count").reset_index(drop=True)
    agg["fraction"] = agg[f"{key}_count"] / total
    return agg.rename(columns={f"{key}_count": "n_rows"})
