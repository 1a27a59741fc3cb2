"""The flagship pages -> triples pipeline (SURVEY.md §3 E1-E3 re-expressed
Ray-Data-first; north-star stages 1-4).

Dataflow (one streaming pass, no shuffle until the vocabulary-sized
canonicalization groupby):

    read_parquet(pages, columns pruned)
      -> map_batches(extract_pages)            stateless, drops html
      -> map_batches(explode_sentences)        stateless flat-map
      -> map_batches(RetrieveAttach, actors)   KB broadcast, BM25 + budget
      -> map_batches(TagLinkTriples, actors)   gazetteer broadcast
      -> [materialize raw triples — output-sized]
      -> canonicalize (partial counts -> tiny groupby -> broadcast map)
      -> map_batches(ApplyCanonical)           final triples

The KB/gazetteer are ``ray.put`` ONCE and read per actor in ``__init__``
(broadcast join, never re-shipped per batch).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import ray

from ..data.synth import corpus_dir, sf_dir_to_sf
from ..stages.canonicalize import ApplyCanonical, compute_canonical_map
from ..stages.extract import extract_pages
from ..stages.retriever import RetrieveAttach
from ..stages.sentences import explode_sentences
from ..stages.tagger import TagLinkTriples


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
        sents = sents.map_batches(
            RetrieveAttach,
            fn_constructor_kwargs={"kb_ref": kb_ref},
            batch_format="pyarrow",
            batch_size=512,
            concurrency=concurrency or (1, 8),
            num_cpus=1,
        )
    return sents


def kg_triples(corpus: str, parallelism: int | None = None,
               with_retrieval: bool = True, concurrency=None):
    """Full pipeline; returns the final triples Dataset."""
    kb_ref, gaz_ref, ent_title = load_corpus_refs(corpus)
    sents = sentences_dataset(corpus, parallelism, with_retrieval, kb_ref,
                              concurrency)
    raw = sents.map_batches(
        TagLinkTriples,
        fn_constructor_kwargs={"gaz_ref": gaz_ref, "kb_ref": kb_ref},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency or (1, 8),
        num_cpus=1,
    )
    # raw triples are output-sized (two consumers: counts + apply), so a
    # materialize here is bounded and avoids recomputing the whole pipeline
    raw = raw.materialize()
    canon = compute_canonical_map(raw, ent_title)
    canon_ref = ray.put(canon)
    return raw.map_batches(
        ApplyCanonical,
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
    )


def kg_triples_for_sf_dir(sf_dir: str, **kw):
    """Driver-facing wrapper: map an sf dir to the cached synthetic corpus."""
    return kg_triples(corpus_dir(sf_dir_to_sf(sf_dir)), **kw)
