"""Resumable partitioned-Parquet sink with per-partition lineage manifests
(north-rule requirement; generalizes the reference's intermediate-files-as-
checkpoints virtue, SURVEY.md §4 checkpoint row).

Layout:

    out_dir/
      part=<NNNN>/data.parquet        one directory per input partition
      part=<NNNN>/_MANIFEST.json      {partition, input_fingerprint,
                                       n_rows, counters, schema_version}
      _DONE                           written when every partition landed

Resume = re-list input partitions, skip those whose manifest exists AND
matches the input fingerprint (anti-join of manifests vs inputs). Writes are
atomic: data + manifest land in ``part=NNNN.tmp`` then ``os.replace``.
Fingerprints are content-derived (no wall clock) so reruns are
deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow.parquet as pq

SCHEMA_VERSION = 1


def input_fingerprint(paths: list[str]) -> str:
    """Content fingerprint of an input partition: file names + sizes (cheap,
    deterministic; size change or rename invalidates the partition)."""
    h = hashlib.blake2b(digest_size=16)
    for p in sorted(paths):
        h.update(p.encode())
        h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()


def partition_done(out_dir: str, part_id: int, fingerprint: str) -> bool:
    mpath = os.path.join(out_dir, f"part={part_id:04d}", "_MANIFEST.json")
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return (m.get("input_fingerprint") == fingerprint
            and m.get("schema_version") == SCHEMA_VERSION)


def write_partition(out_dir: str, part_id: int, table, fingerprint: str,
                    counters: dict | None = None) -> None:
    """Atomic write: tmp dir -> parquet + manifest -> rename."""
    final = os.path.join(out_dir, f"part={part_id:04d}")
    tmp = final + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "data.parquet"))
    manifest = {
        "partition": part_id,
        "input_fingerprint": fingerprint,
        "n_rows": table.num_rows,
        "counters": counters or {},
        "schema_version": SCHEMA_VERSION,
    }
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    os.replace(tmp, final)


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for d in sorted(os.listdir(out_dir)):
        mpath = os.path.join(out_dir, d, "_MANIFEST.json")
        if d.startswith("part=") and os.path.exists(mpath):
            with open(mpath) as f:
                out.append(json.load(f))
    return out
