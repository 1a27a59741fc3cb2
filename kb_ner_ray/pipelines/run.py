"""Resumable end-to-end run: pages -> per-partition raw triples (checkpointed
with lineage manifests) -> global canonicalization -> final triples Parquet.

Split of labour (see state/manifest.py):

* the HEAVY, corpus-sized work (extract/explode/retrieve/tag/link) is
  checkpointed per input partition — a rerun anti-joins manifests vs input
  fingerprints and recomputes only missing/stale partitions;
* the LIGHT, vocabulary-sized canonicalization + final write is recomputed
  every run (it depends on corpus-wide link counts, and costs seconds).

Counters (mentions seen, sentences, contexts attached) are recorded in each
partition manifest — the lineage/metrics requirement of the north rule.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..stages.canonicalize import apply_canonical, compute_canonical_map
from ..stages.extract import extract_pages
from ..stages.sentences import explode_sentences
from ..stages.tagger import RetrieveTagTriples
from ..state.manifest import (
    input_fingerprint,
    partition_done,
    read_manifests,
    write_partition_streamed,
)
from .kg import load_corpus_refs


def _partition_files(corpus: str, n_partitions: int) -> list[list[str]]:
    files = sorted(glob.glob(corpus + "/pages/*.parquet"))
    n_partitions = min(n_partitions, len(files))
    groups: list[list[str]] = [[] for _ in range(n_partitions)]
    for i, f in enumerate(files):
        groups[i % n_partitions].append(f)
    return groups


def _raw_triples_ds(files: list[str], kb_ref, gaz_ref, concurrency):
    """Lazy partition pipeline — consumed ONLY by the streaming partition
    writer; a partition's triples never ride through the driver."""
    return (
        ray.data.read_parquet(files, columns=["url", "warc_ts", "html", "lang"])
        .map_batches(extract_pages, batch_format="pyarrow")
        .map_batches(explode_sentences, batch_format="pyarrow")
        .map_batches(RetrieveTagTriples,
                     fn_constructor_kwargs={"gaz_ref": gaz_ref,
                                            "kb_ref": kb_ref},
                     batch_format="pyarrow", batch_size=1024,
                     concurrency=concurrency)
    )


def run_resumable(corpus: str, out_dir: str, n_partitions: int = 8,
                  concurrency=(1, 4)) -> dict:
    """Returns {'computed': [...], 'skipped': [...], 'n_triples': int}."""
    kb_ref, gaz_ref, ent_title = load_corpus_refs(corpus)
    raw_dir = os.path.join(out_dir, "raw")
    os.makedirs(raw_dir, exist_ok=True)

    computed, skipped = [], []
    for part_id, files in enumerate(_partition_files(corpus, n_partitions)):
        fp = input_fingerprint(files)
        if partition_done(raw_dir, part_id, fp):
            skipped.append(part_id)
            continue
        ds = _raw_triples_ds(files, kb_ref, gaz_ref, concurrency)
        write_partition_streamed(raw_dir, part_id, ds, fp)
        computed.append(part_id)

    # global canonicalization over all checkpointed raw triples
    raw_ds = ray.data.read_parquet(
        sorted(glob.glob(raw_dir + "/part=*/*.parquet")))
    canon = compute_canonical_map(raw_ds, ent_title)
    final = raw_ds.map_batches(
        apply_canonical, fn_kwargs={"canon_ref": ray.put(canon)},
        batch_format="pyarrow")
    # final write is atomic-ish: build fresh, then swap (a rerun must not
    # append to last run's files)
    final_dir = os.path.join(out_dir, "triples")
    tmp_dir = final_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    final.write_parquet(tmp_dir)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp_dir, final_dir)
    n = sum(m["n_rows"] for m in read_manifests(raw_dir))
    return {"computed": computed, "skipped": skipped, "n_triples": n}


def load_final_triples(out_dir: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, "triples", "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])
