"""Entity canonicalization kernel (SURVEY.md §7 step 9; north-star stage 4).

Generalizes the reference's majority-vote span aggregation
(ensemble_prediction.py:348-416: count identical keys, resolve greedily) into
corpus-level alias resolution:

* input: corpus-wide link counts ``{(normalized_surface, ent_id): n}``
  (ent_id >= 0 only — NIL mentions canonicalize to their own normalized
  surface);
* per surface, the PRIMARY entity = argmax count, ties -> min ent_id
  (majority vote, deterministic);
* union-find over (surface <-> primary entity) edges clusters aliases of the
  same entity WITHOUT chaining through ambiguous minority links;
* each component's canonical name = KB title of the minimum ent_id in it.

Returns ``surface -> canonical_name``; surfaces absent from the map (never
linked) canonicalize to themselves.  Pure Python — the distributed stage
(stages/canonicalize.py) feeds it the *distinct pre-aggregated* pair counts
(bounded by the entity vocabulary, not the corpus), the oracle feeds it an
in-memory count dict; both must agree exactly.
"""

from __future__ import annotations

from ..state.unionfind import UnionFind


def build_canonical_map(
    link_counts: dict[tuple[str, int], int], ent_title: dict[int, str]
) -> dict[str, str]:
    primary: dict[str, tuple[int, int]] = {}  # surface -> (-count, ent)
    for (surf, ent), n in link_counts.items():
        key = (-n, ent)
        if surf not in primary or key < primary[surf]:
            primary[surf] = key
    uf = UnionFind()
    for surf, (_negn, ent) in primary.items():
        uf.union(("s", surf), ("e", ent))
    out: dict[str, str] = {}
    for _root, members in uf.clusters().items():
        ents = sorted(m[1] for m in members if m[0] == "e")
        canon = ent_title[ents[0]]
        for kind, val in members:
            if kind == "s":
                out[val] = canon
    return out
