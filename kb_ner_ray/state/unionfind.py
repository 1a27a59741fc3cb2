"""Union-find for entity canonicalization (SURVEY.md §7 step 9).

Used on the *distinct* (normalized_surface, ent_id) pair set, which is
bounded by the entity vocabulary (gazetteer size), NOT the corpus size — so
driver-side union-find is safe at any corpus scale.  The corpus-sized part of
canonicalization (mapping every mention to its cluster) stays distributed: a
broadcast dict lookup inside ``map_batches`` (stages/canonicalize.py).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict = {}
        self.rank: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        self.rank.setdefault(x, 0)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1

    def clusters(self) -> dict:
        """root -> sorted members."""
        out: dict = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), []).append(x)
        return {k: sorted(v) for k, v in out.items()}
