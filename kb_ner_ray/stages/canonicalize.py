"""Distributed entity canonicalization (north-star stage 4; SURVEY.md §7.9).

Three phases, shuffle-light by construction:

1. **Partial count** (map_batches, no shuffle): per batch, pre-aggregate
   (normalized_surface, ent_id) link counts from the raw-triple sides — the
   combiner pattern from the Ray guide, so the groupby only ever sees one row
   per (surface, ent) per batch, not one per mention.
2. **Global count** (the only shuffle): ``groupby([surface, ent]).sum`` over
   the tiny partials; result size is bounded by the entity vocabulary, NOT
   the corpus, so collecting it on the driver is safe at any corpus scale.
   Surface-key skew ("hot surfaces", north rule) is absorbed by phase 1:
   a hot surface contributes at most one row per batch.
3. **Apply** (map_batches, no shuffle): broadcast the surface->canonical dict
   (functions/canon.py kernel) via ``ray.put`` and map both triple sides.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.canon import build_canonical_map
from ..functions.text import normalize_surface


def partial_link_counts(batch: pa.Table) -> pa.Table:
    """Raw triples batch -> distinct (surface, ent, cnt) partial counts."""
    counts: dict[tuple[str, int], int] = {}
    for surf_col, ent_col in (("subj_surface", "subj_ent"),
                              ("obj_surface", "obj_ent")):
        for surf, ent in zip(batch.column(surf_col).to_pylist(),
                             batch.column(ent_col).to_pylist()):
            if ent >= 0:
                key = (normalize_surface(surf), ent)
                counts[key] = counts.get(key, 0) + 1
    return pa.table(
        {
            "surface": pa.array([k[0] for k in counts], pa.string()),
            "ent_id": pa.array([k[1] for k in counts], pa.int64()),
            "cnt": pa.array(list(counts.values()), pa.int64()),
        }
    )


def compute_canonical_map(raw_triples, ent_title: dict[int, str]) -> dict[str, str]:
    """Phases 1+2: Dataset of raw triples -> surface->canonical dict.

    The final combine runs on the driver: after the per-batch combiner the
    stream is at most (n_blocks x vocabulary) distinct rows — bounded by the
    entity vocabulary, NOT the corpus — so collecting partials and summing
    in pandas replaces a full Ray sort-shuffle whose fixed cost dwarfs the
    few thousand rows it would move."""
    # batch_size bundles the many small raw-triple blocks (one per upstream
    # task) into few large batches: fewer combiner outputs and a cheap
    # driver collect regardless of upstream task count
    partials = raw_triples.map_batches(partial_link_counts,
                                       batch_format="pyarrow",
                                       batch_size=65536)
    pdf = partials.to_pandas()  # vocabulary-sized partials
    agg = pdf.groupby(["surface", "ent_id"], as_index=False)["cnt"].sum()
    link_counts = {
        (r.surface, int(r.ent_id)): int(r.cnt) for r in agg.itertuples()
    }
    return build_canonical_map(link_counts, ent_title)


_CANON_CACHE: dict = {}  # worker-local: ObjectRef -> resolved dict


def _resolve_canon(canon_ref):
    if isinstance(canon_ref, ray.ObjectRef):
        hit = _CANON_CACHE.get(canon_ref)
        if hit is None:
            hit = ray.get(canon_ref)
            _CANON_CACHE.clear()  # at most one live canonical map per worker
            _CANON_CACHE[canon_ref] = hit
        return hit
    return canon_ref


def apply_canonical(batch: pa.Table, canon_ref=None) -> pa.Table:
    """Raw triples -> final (subj, pred, obj, url, sent_id, score).

    A plain task fn (not an actor pool): the broadcast canonical map is
    fetched from the local object store once per worker process and cached,
    so there is no per-execution actor-pool spin-up cost."""
    canon = _resolve_canon(canon_ref)

    def name(surface: str) -> str:
        norm = normalize_surface(surface)
        return canon.get(norm, norm)

    subj = [name(s) for s in batch.column("subj_surface").to_pylist()]
    obj = [name(s) for s in batch.column("obj_surface").to_pylist()]
    n = batch.num_rows
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": batch.column("pred"),
            "obj": pa.array(obj, pa.string()),
            "url": batch.column("url"),
            "sent_id": batch.column("sent_id"),
            "score": pa.array([1.0] * n, pa.float32()),
        }
    )


class ApplyCanonical:
    """Actor-pool wrapper kept for API parity; prefer ``apply_canonical``."""

    def __init__(self, canon_ref):
        self.canon = ray.get(canon_ref) if isinstance(canon_ref, ray.ObjectRef) \
            else canon_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_canonical(batch, canon_ref=self.canon)
