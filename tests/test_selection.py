"""Distributed exact order statistics (stages/selection.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from kb_ner_ray.stages.selection import exact_kth_smallest, quality_buckets


def _ds(values, n_blocks=4):
    t = pa.table({"doc_id": pa.array(list(range(len(values))), pa.int64()),
                  "nll_bp": pa.array([int(v) for v in values], pa.int64())})
    return ray.data.from_arrow(t).repartition(n_blocks)


def test_kth_planted(ray_session):
    vals = [50, 10, 40, 20, 30]
    got = exact_kth_smallest(_ds(vals), "nll_bp", [1, 3, 5])
    assert got == {1: 10, 3: 30, 5: 50}


def test_kth_randomized_vs_numpy(ray_session):
    rng = np.random.default_rng(7)
    # wide range forces multiple refinement passes (range >> 4096 bins);
    # duplicates exercise the tie path
    vals = np.concatenate([
        rng.integers(-(1 << 40), 1 << 40, size=400),
        rng.integers(0, 5, size=100),
    ])
    ks = [1, 17, 250, 333, len(vals)]
    got = exact_kth_smallest(_ds(vals, n_blocks=7), "nll_bp", ks)
    s = np.sort(vals)
    assert got == {k: int(s[k - 1]) for k in ks}


def test_kth_errors(ray_session):
    with pytest.raises(ValueError):
        exact_kth_smallest(_ds([1, 2, 3]), "nll_bp", [4])
    with pytest.raises(ValueError):
        exact_kth_smallest(_ds([1, 2, 3]), "nll_bp", [0])
    with pytest.raises(ValueError):
        exact_kth_smallest(_ds([], n_blocks=1), "nll_bp", [1])


def test_quality_buckets_planted(ray_session):
    # 9 docs, scores 1..9 -> cutoffs at ceil(9/3)=3rd (=3) and 6th (=6)
    out = (quality_buckets(_ds(range(1, 10)), "nll_bp").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["bucket"].tolist() == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
    assert list(out.columns) == ["doc_id", "nll_bp", "bucket"]


def test_quality_buckets_ties_go_to_better_bucket(ray_session):
    # all-equal scores: value-based assignment puts EVERY doc in head
    # (score <= c1), unlike a rank-based NTILE split
    out = quality_buckets(_ds([5] * 9), "nll_bp").to_pandas()
    assert (out["bucket"] == "head").all()


def _grp_ds(groups, values, n_blocks=4):
    t = pa.table({"g": pa.array(list(groups), pa.string()),
                  "v": pa.array([int(x) for x in values], pa.int64())})
    return ray.data.from_arrow(t).repartition(n_blocks)


def test_grouped_kth_planted(ray_session):
    from kb_ner_ray.stages.selection import grouped_exact_kth

    ds = _grp_ds("aaabb", [30, 10, 20, 5, 15])
    got = grouped_exact_kth(ds, "g", "v", {"a": [1, 2, 3], "b": [1, 2]})
    assert got == {("a", 1): 10, ("a", 2): 20, ("a", 3): 30,
                   ("b", 1): 5, ("b", 2): 15}


def test_grouped_kth_randomized_vs_numpy(ray_session):
    from kb_ner_ray.stages.selection import grouped_exact_kth

    rng = np.random.default_rng(13)
    groups = rng.choice(["x", "y", "z"], size=500)
    vals = rng.integers(-(1 << 35), 1 << 35, size=500)
    ranks = {}
    for g in "xyz":
        n = int((groups == g).sum())
        ranks[g] = [1, max(1, n // 2), n]
    got = grouped_exact_kth(_grp_ds(groups, vals, 7), "g", "v", ranks)
    for g, ks in ranks.items():
        s = np.sort(vals[groups == g])
        for k in set(ks):
            assert got[(g, k)] == int(s[k - 1]), (g, k)


def test_grouped_kth_errors(ray_session):
    import pytest

    from kb_ner_ray.stages.selection import grouped_exact_kth

    ds = _grp_ds("ab", [1, 2])
    with pytest.raises(ValueError, match="not present"):
        grouped_exact_kth(ds, "g", "v", {"zz": [1]})
    with pytest.raises(ValueError, match="out of"):
        grouped_exact_kth(ds, "g", "v", {"a": [2]})
