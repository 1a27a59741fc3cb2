"""Training-corpus shard export (pipelines/export.py): deterministic
order parity, manifest-tracked resume, fingerprint invalidation."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _docs(n=60):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i} body" for i in range(n)], pa.string()),
    })


def test_export_matches_deterministic_shuffle(ray_session, tmp_path):
    from kb_ner_ray.pipelines.export import (export_training_shards,
                                             read_training_order)
    from kb_ner_ray.stages.partitioning import deterministic_shuffle

    docs = _docs()
    ds = ray.data.from_arrow(docs).repartition(3)
    out = str(tmp_path / "shards")
    r = export_training_shards(ds, out, n_shards=4)
    assert r["computed"] == [0, 1, 2, 3] and not r["skipped"]
    back = read_training_order(out).to_pandas()
    idx = (deterministic_shuffle(ray.data.from_arrow(docs), n_shards=4)
           .to_pandas().sort_values(["shard", "pos"]))
    assert back["doc_id"].tolist() == idx["doc_id"].tolist()
    assert sorted(back["text"]) == sorted(docs["text"].to_pylist())
    assert (tmp_path / "shards" / "_DONE").exists()


def test_export_resume_and_invalidation(ray_session, tmp_path):
    from kb_ner_ray.pipelines.export import export_training_shards
    from kb_ner_ray.state.manifest import read_manifests

    d = tmp_path / "src"
    d.mkdir()
    f = str(d / "p.parquet")
    pq.write_table(_docs(), f)
    ds = ray.data.read_parquet(f)
    out = str(tmp_path / "shards")
    r1 = export_training_shards(ds, out, n_shards=3, input_files=[f])
    assert len(r1["computed"]) == 3
    # rerun: every shard skipped off its manifest fingerprint
    r2 = export_training_shards(ds, out, n_shards=3, input_files=[f])
    assert r2["skipped"] == [0, 1, 2] and not r2["computed"]
    # input change (size differs) invalidates every shard
    pq.write_table(_docs(61), f)
    ds2 = ray.data.read_parquet(f)
    r3 = export_training_shards(ds2, out, n_shards=3, input_files=[f])
    assert len(r3["computed"]) == 3 and not r3["skipped"]
    assert len(read_manifests(out)) == 3
