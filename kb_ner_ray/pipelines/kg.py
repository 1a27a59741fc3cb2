"""The flagship pages -> triples pipeline (SURVEY.md §3 E1-E3 re-expressed
Ray-Data-first; north-star stages 1-4).

Dataflow (one streaming pass, ZERO shuffles — the canonicalization combine
is vocabulary-sized and finishes on the driver):

    read_parquet(pages, columns pruned)
      -> map_batches(extract_pages)              stateless, drops html
      -> map_batches(explode_sentences)          stateless flat-map
      -> map_batches(RetrieveTagTriples, actors) FUSED retrieve+attach+tag+
                                                 link+triple-emit; KB and
                                                 gazetteer broadcast; memoized
                                                 over duplicate sentences
      -> [materialize raw triples — output-sized, consumed twice]
      -> canonicalize (per-batch partial counts -> driver combine -> map)
      -> map_batches(apply_canonical)            plain tasks, broadcast dict

The KB/gazetteer are ``ray.put`` ONCE and read per actor in ``__init__``
(broadcast join, never re-shipped per batch).  The unfused staged variant
(RetrieveAttach | TagLink*) backs the kg_contexts / kg_mentions queries.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import ray

from ..data.synth import corpus_dir, sf_dir_to_sf
from ..stages.canonicalize import apply_canonical, compute_canonical_map
from ..stages.extract import extract_pages
from ..stages.retriever import RetrieveAttach
from ..stages.sentences import explode_sentences
from ..stages.tagger import RetrieveTagTriples, TagLinkTriples


def _read_table_dir(path: str):
    import glob
    import pyarrow as pa

    files = sorted(glob.glob(path + "/*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def load_corpus_refs(corpus: str):
    """Read the small (broadcast) sides and ray.put them once."""
    kb_rows = _read_table_dir(corpus + "/kb").to_pylist()
    gaz_rows = _read_table_dir(corpus + "/gazetteer").to_pylist()
    ent_title = {r["ent_id"]: r["title"] for r in kb_rows}
    return ray.put(kb_rows), ray.put(gaz_rows), ent_title


def sentences_dataset(corpus: str, parallelism: int | None = None,
                      with_retrieval: bool = True,
                      kb_ref=None, concurrency=None):
    """pages -> (augmented) sentences Dataset."""
    pages = ray.data.read_parquet(
        corpus + "/pages", columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=parallelism,
    )
    sents = (
        pages
        .map_batches(extract_pages, batch_format="pyarrow")
        .map_batches(explode_sentences, batch_format="pyarrow")
    )
    if with_retrieval:
        assert kb_ref is not None
        # batch_size is in PAGES (the stage fuses with extract/explode):
        # 128 pages ~ 1.2k sentences per task, so a 32-CPU node sees ~4
        # waves of work per 12k-page shard instead of one long tail.
        sents = sents.map_batches(
            RetrieveAttach,
            fn_constructor_kwargs={"kb_ref": kb_ref},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=concurrency or (2, 16),
            num_cpus=1,
        )
    return sents


def kg_triples(corpus: str, parallelism: int | None = None,
               with_retrieval: bool = True, concurrency=None):
    """Full pipeline; returns the final triples Dataset.

    Retrieval + attach + tag + link + triple-emit run FUSED in one actor
    pool (stages/tagger.py RetrieveTagTriples) so the heavy aug_text
    intermediate never enters the object store; the unfused staged variant
    (sentences_dataset + TagLinkTriples) backs the kg_contexts/kg_mentions
    inspection queries and the conformance tests."""
    kb_ref, gaz_ref, ent_title = load_corpus_refs(corpus)
    if with_retrieval:
        sents = sentences_dataset(corpus, parallelism, with_retrieval=False)
        # batch_size counts PAGES (the operator fuses with read/extract/
        # explode): 128 pages ~ 1.2k sentences per task -> ~8 tasks per
        # actor at 16 actors on a 12k-page shard.
        raw = sents.map_batches(
            RetrieveTagTriples,
            fn_constructor_kwargs={"gaz_ref": gaz_ref, "kb_ref": kb_ref},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=concurrency or (2, 16),
            num_cpus=1,
        )
    else:
        sents = sentences_dataset(corpus, parallelism, with_retrieval=False)
        raw = sents.map_batches(
            TagLinkTriples,
            fn_constructor_kwargs={"gaz_ref": gaz_ref, "kb_ref": kb_ref},
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=concurrency or (2, 16),
            num_cpus=1,
        )
    # raw triples are output-sized (two consumers: counts + apply), so a
    # materialize here is bounded and avoids recomputing the whole pipeline
    raw = raw.materialize()
    canon = compute_canonical_map(raw, ent_title)
    canon_ref = ray.put(canon)
    return raw.map_batches(
        apply_canonical,
        fn_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
    )


def kg_triples_for_sf_dir(sf_dir: str, **kw):
    """Driver-facing wrapper: map an sf dir to the cached synthetic corpus."""
    return kg_triples(corpus_dir(sf_dir_to_sf(sf_dir)), **kw)
