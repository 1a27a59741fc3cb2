"""Training-corpus EXPORT: materialize the deterministic training order
as resumable, manifest-tracked parquet shards — the step that turns the
round-5 index ops (partitioning.deterministic_shuffle order,
packing.pack_training_sequences layout) into bytes a trainer reads.

Layout (the repo's standard resumable sink, state/manifest.py):

    out_dir/
      part=0000/*.parquet + _MANIFEST.json     <- shard 0, rows sorted
      part=0001/...                               by the md5 training
      ...                                         order (pos)
      _DONE

100-TB shape: ONE bucketed shuffle routes each doc (text travels once)
to its md5-derived shard; every shard writes its own partition dir via
``Dataset.write_parquet`` (blocks land directly from the workers — no
driver concat), with the manifest fingerprint binding the shard to the
input so a rerun skips finished shards and a changed input invalidates
exactly the shards it touches (same contract as run.run_resumable).
Shards are written one Dataset-job at a time from a shared base pass;
each job filters its shard from the materialized hashed base (the
blocks live in the object store once).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..state.manifest import (
    input_fingerprint,
    partition_done,
    read_manifests,
    write_partition_ds,
)


def _hash_batch(t: pa.Table, id_col: str, ns: int) -> pa.Table:
    ids = t[id_col].to_numpy(zero_copy_only=False)
    hx = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
    shard = np.array([int(h[:8], 16) % ns for h in hx], np.int64)
    return (t.append_column("__shard", pa.array(shard))
            .append_column("__hx", pa.array(hx, pa.string())))


def export_training_shards(docs_ds, out_dir: str, *,
                           n_shards: int = 8,
                           id_col: str = "doc_id",
                           input_files: list[str] | None = None,
                           force: bool = False) -> dict:
    """Write ``docs_ds`` as ``n_shards`` manifest-tracked parquet shards
    in deterministic training order; returns {"computed": [...],
    "skipped": [...]} shard ids.

    ``input_files``: the source files backing docs_ds (their names +
    sizes fingerprint each shard for resume); defaults to a fingerprint
    of the out_dir identity only — pass the real files for
    content-bound resume."""
    fp_src = input_fingerprint(input_files) if input_files else "unbound"

    done = {m["partition"] for m in read_manifests(out_dir)} \
        if not force else set()
    skipped, computed = [], []

    hashed = (docs_ds.map_batches(
        _hash_batch, batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "ns": n_shards})
        .materialize())

    for shard in range(n_shards):
        fp = f"{fp_src}:{shard}:{n_shards}"
        if shard in done and partition_done(out_dir, shard, fp):
            skipped.append(shard)
            continue
        part = (hashed
                .filter(expr=f"__shard == {shard}")
                .sort("__hx")
                .drop_columns(["__shard"])
                .rename_columns({"__hx": "order_key"}))
        # order_key stays in the rows: parquet file order within a
        # partition is writer-dependent, so the training order must be
        # recoverable from the data itself
        write_partition_ds(out_dir, shard, part, fp)
        computed.append(shard)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write(f"{n_shards}\n")
    return {"computed": computed, "skipped": skipped}


def read_training_order(out_dir: str) -> pa.Table:
    """Concatenate the shards back in (shard, order_key) order — the
    exact sequence a single-reader trainer would consume."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    parts = []
    for d in sorted(glob.glob(os.path.join(out_dir, "part=*"))):
        if ".tmp" in d:
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            continue
        t = pa.concat_tables([pq.read_table(f) for f in files])
        parts.append(t.take(pc.sort_indices(t["order_key"])))
    return pa.concat_tables(parts) if parts else pa.table({})
