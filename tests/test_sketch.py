"""KMV sketch: determinism, merge semantics, accuracy bounds."""

import pyarrow as pa
import ray

from kb_ner_ray.stages.sketch import KMVSketch, approx_distinct


def test_exact_below_k():
    sk = KMVSketch(k=64)
    sk.add_many([f"v{i}" for i in range(40)])
    assert sk.estimate() == 40.0


def test_merge_equals_union():
    a, b = KMVSketch(k=128), KMVSketch(k=128)
    a.add_many([f"x{i}" for i in range(500)])
    b.add_many([f"x{i}" for i in range(250, 750)])  # overlap 250-499
    merged = a.merge(b)
    whole = KMVSketch(k=128)
    whole.add_many([f"x{i}" for i in range(750)])
    assert merged.hashes == whole.hashes  # merge == sketch of union


def test_accuracy_within_3_sigma():
    true_n = 20_000
    sk = KMVSketch(k=1024)
    sk.add_many([f"item-{i}" for i in range(true_n)])
    est = sk.estimate()
    sigma = true_n / (1024 - 2) ** 0.5
    assert abs(est - true_n) < 3 * sigma


def test_cross_block_duplicates_not_inflated():
    """A value seen in MANY blocks must count once: the constructor path
    (used by approx_distinct to merge concatenated cross-block partials)
    must dedupe hashes, else duplicates displace larger distinct hashes and
    inflate the estimate (observed 7.6x before the fix)."""
    k = 256
    true_n = 2000
    partials: list[int] = []
    for block in range(8):
        sk = KMVSketch(k)
        # every block sees the SAME 2000 values (worst-case duplication)
        sk.add_many([f"u{i}" for i in range(true_n)])
        partials.extend(sk.hashes)
    merged = KMVSketch(k, partials)
    est = merged.estimate()
    sigma = true_n / (k - 2) ** 0.5
    assert abs(est - true_n) < 3 * sigma, est
    # and the sketch equals the single-pass sketch exactly
    whole = KMVSketch(k)
    whole.add_many([f"u{i}" for i in range(true_n)])
    assert merged.hashes == whole.hashes


def test_distributed_repeated_users_across_blocks(ray_session):
    """approx_distinct over user_ids repeated in every block (the shipped
    approx_distinct_users shape) — regression for the constructor-dedupe
    bug."""
    rows = {"v": [f"user-{i % 400}" for i in range(20_000)]}
    ds = ray.data.from_arrow(pa.table(rows)).repartition(8)
    df = approx_distinct(ds, "v", k=128)
    est = float(df["approx_distinct"].iloc[0])
    sigma = 400 / (128 - 2) ** 0.5
    assert abs(est - 400) < 4 * sigma, est


def test_distributed_grouped_estimate(ray_session):
    rows = {"g": [], "v": []}
    for g, n in (("a", 3000), ("b", 300), ("c", 7)):
        for i in range(n):
            rows["g"].append(g)
            rows["v"].append(f"{g}:{i}")
    ds = ray.data.from_arrow(pa.table(rows))
    df = approx_distinct(ds, "v", group_by="g", k=512).set_index("group")
    assert df.loc["c", "approx_distinct"] == 7.0  # below k: exact
    for g, n in (("a", 3000), ("b", 300)):
        err = abs(df.loc[g, "approx_distinct"] - n) / n
        assert err < 0.2, (g, df.loc[g, "approx_distinct"])


def test_mg_error_bound_and_determinism():
    from kb_ner_ray.stages.sketch import MGSketch

    # zipf-ish stream: value i appears (200 // (i+1)) times
    stream = []
    for i in range(100):
        stream.extend([f"v{i}"] * (200 // (i + 1)))
    sk = MGSketch(m=16)
    sk.add_many(stream)
    n = len(stream)
    from collections import Counter

    true = Counter(stream)
    for v, est in sk.counters.items():
        assert true[v] - n / 16 <= est <= true[v]
    # the dominant value is always retained
    assert "v0" in sk.counters


def test_mg_merge_matches_single_pass_bounds():
    from collections import Counter

    from kb_ner_ray.stages.sketch import MGSketch

    rng = [f"u{i % 37}" for i in range(5000)] + ["hot"] * 800
    parts = [rng[i::4] for i in range(4)]
    sks = []
    for p in parts:
        sk = MGSketch(m=24)
        sk.add_many(p)
        sks.append(sk)
    merged = sks[0]
    for sk in sks[1:]:
        merged = merged.merge(sk)
    true = Counter(rng)
    n = len(rng)
    assert merged.n == n
    for v, est in merged.counters.items():
        assert est <= true[v]
        assert true[v] - est <= n / 24 * 2  # merged bound (k-way slack)
    assert merged.top(1)[0][0] == "hot"


def test_heavy_hitters_distributed(ray_session):
    from collections import Counter

    from kb_ner_ray.stages.sketch import heavy_hitters

    vals = [f"t{i % 50}" for i in range(20_000)] + ["whale"] * 3000
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    df = heavy_hitters(ds, "v", m=64, k=5)
    assert df.iloc[0]["value"] == "whale"
    true = Counter(vals)
    n = len(vals)
    for _i, row in df.iterrows():
        assert row["est_count"] <= true[row["value"]]
        # the emitted bound is now honest (N/m partial decay + tracked
        # merge cut), so the deficit must fit within ONE bound
        assert true[row["value"]] - row["est_count"] <= row["err_bound"]


def test_approx_quantiles_rank_error(ray_session):
    """Merged equi-depth summaries stay within the N/k rank bound on
    uniform and heavily skewed data."""
    import numpy as np

    from kb_ner_ray.stages.sketch import approx_quantiles

    rng = np.random.RandomState(13)
    for data in (rng.rand(50_000) * 1000,
                 np.exp(rng.randn(50_000) * 3)):  # lognormal skew
        ds = ray.data.from_arrow(pa.table({"v": data})).repartition(16)
        got = approx_quantiles(ds, "v", qs=[0.1, 0.5, 0.9, 0.99], k=256)
        s = np.sort(data)
        n = len(s)
        for _i, row in got.iterrows():
            # translate value error into rank error
            rank = np.searchsorted(s, row["value"]) / n
            assert abs(rank - row["q"]) < 2.5 * 16 / 256, (row["q"], rank)


def test_quantile_partial_is_weighted_grid():
    import numpy as np

    from kb_ner_ray.stages.sketch import quantile_partial

    t = pa.table({"v": np.arange(1000, dtype=np.float64)})
    out = quantile_partial(t, column="v", k=10)
    assert len(out) == 10
    assert abs(sum(out["weight"].to_pylist()) - 1000) < 1e-9
    vals = out["value"].to_pylist()
    assert vals == sorted(vals)
    assert vals[0] < 100 and vals[-1] > 900
