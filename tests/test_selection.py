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
