"""KMV (k-minimum-values) distinct-count sketch — the approximate-aggregate
seat the reference lacks (SURVEY.md §2.5 "no sketches anywhere"), added for
the 100 TB regime where exact COUNT(DISTINCT) would shuffle every key.

A KMV sketch keeps the k smallest 64-bit hashes of the observed values; for
a full sketch the estimator is (k - 1) / max_kth_hash_fraction.  Sketches
merge by union+truncate, so the dataflow is the combiner pattern: per-batch
sketch -> tiny partial stream -> driver merge.  Deterministic (blake2b), no
RNG.  Standard error ~ 1/sqrt(k-2) (KMV estimator per Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"; see also Beyer et al. 2007).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_MAX64 = float(1 << 63)  # hashes are folded into [0, 2^63)


def _h64(value: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(),
        "big") >> 1


class KMVSketch:
    def __init__(self, k: int = 1024, hashes: list[int] | None = None):
        self.k = k
        # Dedupe here, not just in merge(): approx_distinct() re-enters this
        # constructor with concatenated cross-block partials, and a value seen
        # in several blocks must contribute ONE hash, not len(blocks) copies
        # (duplicates displace larger distinct hashes and inflate the
        # estimate).
        self.hashes: list[int] = sorted(set(hashes or []))[:k]

    def add_many(self, values) -> None:
        hs = {_h64(str(v)) for v in values}
        hs.update(self.hashes)
        self.hashes = sorted(hs)[: self.k]

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        return KMVSketch(self.k, sorted(set(self.hashes)
                                        | set(other.hashes))[: self.k])

    def estimate(self) -> float:
        n = len(self.hashes)
        if n < self.k:
            return float(n)  # saw fewer than k distinct: exact
        return (self.k - 1) / (self.hashes[-1] / _MAX64)

    def to_arrow(self) -> pa.Table:
        return pa.table({"h": pa.array(self.hashes, pa.int64())})


def kmv_partial(batch: pa.Table, column: str = "", group_by: str | None = None,
                k: int = 1024) -> pa.Table:
    """Per-batch KMV partial rows: (group, h) with at most k smallest hashes
    per group — the combiner; the downstream merge sees O(groups x k) rows
    per batch regardless of batch size."""
    if group_by is None:
        sk = KMVSketch(k)
        sk.add_many(batch.column(column).to_pylist())
        return pa.table({
            "group": pa.array([""] * len(sk.hashes), pa.string()),
            "h": pa.array(sk.hashes, pa.int64()),
        })
    groups: dict[str, KMVSketch] = {}
    for g, v in zip(batch.column(group_by).to_pylist(),
                    batch.column(column).to_pylist()):
        groups.setdefault(str(g), KMVSketch(k)).add_many([v])
    gs, hs = [], []
    for g, sk in groups.items():
        gs.extend([g] * len(sk.hashes))
        hs.extend(sk.hashes)
    return pa.table({"group": pa.array(gs, pa.string()),
                     "h": pa.array(hs, pa.int64())})


class MGSketch:
    """Misra-Gries heavy-hitters summary (capacity m counters).

    Guarantee: for every value v, ``count(v) - N/m <= est(v) <= count(v)``
    where N is the stream length.  Summaries MERGE (Agarwal et al. 2012,
    "Mergeable summaries"): sum matching counters, then subtract the
    (m+1)-th largest count and drop non-positive — so the dataflow is the
    same combiner pattern as KMV: per-batch summary -> tiny partial stream
    -> driver merge.  Deterministic."""

    def __init__(self, m: int = 64, counters: dict | None = None):
        self.m = m
        self.counters: dict = dict(counters or {})
        self.n = 0  # stream length seen (for the error bound)

    def add_many(self, values) -> None:
        c = self.counters
        m = self.m
        for v in values:
            self.n += 1
            if v in c:
                c[v] += 1
            elif len(c) < m:
                c[v] = 1
            else:
                dead = [k for k in c if c[k] == 1]
                for k in c:
                    c[k] -= 1
                for k in dead:
                    del c[k]

    def merge(self, other: "MGSketch") -> "MGSketch":
        c = dict(self.counters)
        for v, cnt in other.counters.items():
            c[v] = c.get(v, 0) + cnt
        if len(c) > self.m:
            cut = sorted(c.values(), reverse=True)[self.m]
            c = {v: cnt - cut for v, cnt in c.items() if cnt - cut > 0}
        out = MGSketch(self.m, c)
        out.n = self.n + other.n
        return out

    def top(self, k: int) -> list[tuple[str, int]]:
        return sorted(self.counters.items(),
                      key=lambda kv: (-kv[1], str(kv[0])))[:k]


def mg_partial(batch: pa.Table, column: str = "", m: int = 64) -> pa.Table:
    """Per-batch Misra-Gries partial rows: (value, cnt, batch_n).
    ``batch_n`` (the batch's stream length, needed for the global error
    bound) rides on a sentinel row so it survives even the degenerate
    all-counters-decayed case."""
    sk = MGSketch(m)
    sk.add_many(batch.column(column).to_pylist())
    vals = list(sk.counters)
    return pa.table({
        "value": pa.array([str(v) for v in vals] + [""], pa.string()),
        "cnt": pa.array([sk.counters[v] for v in vals] + [0], pa.int64()),
        "batch_n": pa.array([0] * len(vals) + [sk.n], pa.int64()),
    })


def heavy_hitters(ds, column: str, m: int = 64, k: int = 10):
    """Dataset -> pandas (value, est_count, err_bound) top-k heavy
    hitters.  Combiner partials merged on the driver via the
    mergeable-summary rule (sum matching counters, subtract the (m+1)-th
    largest, drop non-positive) — O(blocks x m) driver rows.  est_count
    underestimates the true count by at most ``err_bound`` =
    N_total/m + cut: the summed per-batch MG partials carry up to
    N_total/m of decay error, and the final merge cut subtracts exactly
    ``cut`` more (tracked, 0 when the merged counter set fits in m)."""
    import pandas as pd

    pdf = ds.map_batches(
        mg_partial, fn_kwargs={"column": column, "m": m},
        batch_format="pyarrow").to_pandas()
    total_n = int(pdf["batch_n"].sum())
    data = pdf[pdf["cnt"] > 0]
    agg = data.groupby("value")["cnt"].sum().to_dict()
    cut = 0
    if len(agg) > m:
        cut = sorted(agg.values(), reverse=True)[m]
        agg = {v: c - cut for v, c in agg.items() if c - cut > 0}
    sk = MGSketch(m, agg)
    rows = [(v, int(c), total_n // m + cut) for v, c in sk.top(k)]
    return pd.DataFrame(rows, columns=["value", "est_count", "err_bound"])


def quantile_partial(batch: pa.Table, column: str = "",
                     k: int = 256) -> pa.Table:
    """Per-batch mergeable ε-approximate quantile summary (equi-depth
    grid, the classic mergeable-histogram recipe): sort the batch, emit k
    evenly spaced order statistics each carrying weight n/k.  Within-batch
    rank error <= n/(2k); summaries concatenate and the merged weighted
    quantile keeps total rank error <= N/k.  Deterministic, no RNG —
    the scale path for holistic aggregates (the exact grouped median
    co-locates its group; this one never does)."""
    import numpy as np

    vals = np.sort(batch.column(column).to_numpy(zero_copy_only=False)
                   .astype(np.float64))
    n = len(vals)
    if n == 0:
        return pa.table({"value": pa.array([], pa.float64()),
                         "weight": pa.array([], pa.float64())})
    kk = min(k, n)
    idx = np.minimum(((np.arange(kk) + 0.5) * n / kk).astype(np.int64),
                     n - 1)
    return pa.table({
        "value": pa.array(vals[idx], pa.float64()),
        "weight": pa.array(np.full(kk, n / kk), pa.float64()),
    })


def approx_quantiles(ds, column: str, qs: list[float],
                     k: int = 256):
    """Dataset -> pandas (q, value): merged weighted quantiles over the
    per-batch summaries (driver sees O(blocks x k) rows, never the
    corpus)."""
    import numpy as np
    import pandas as pd

    pdf = (ds.map_batches(quantile_partial,
                          fn_kwargs={"column": column, "k": k},
                          batch_format="pyarrow")
           .to_pandas().sort_values("value"))
    w = pdf["weight"].to_numpy()
    v = pdf["value"].to_numpy()
    cum = np.cumsum(w)
    total = cum[-1] if len(cum) else 0.0
    rows = []
    for q in qs:
        if total == 0:
            rows.append((q, float("nan")))
            continue
        i = int(np.searchsorted(cum, q * total, side="left"))
        rows.append((q, float(v[min(i, len(v) - 1)])))
    return pd.DataFrame(rows, columns=["q", "value"])


def approx_distinct(ds, column: str, group_by: str | None = None,
                    k: int = 1024):
    """Dataset -> pandas (group, approx_distinct). Combiner partials merged
    on the driver (O(blocks x groups x k) rows, corpus-independent)."""
    import pandas as pd

    pdf = ds.map_batches(
        kmv_partial, fn_kwargs={"column": column, "group_by": group_by,
                                "k": k},
        batch_format="pyarrow").to_pandas()
    rows = []
    for g, sub in pdf.groupby("group"):
        sk = KMVSketch(k, sub["h"].tolist())
        rows.append((g, sk.estimate()))
    return pd.DataFrame(rows, columns=["group", "approx_distinct"])
