"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.
Nothing here calls ``ray.init``/``ray.shutdown`` — only bench.py and the
test fixture own a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (pages -> extract -> sentences -> BM25 retrieve +
    context attach -> tag/link -> canonicalize -> triples) on the
    deterministic synthetic corpus at sf=0.001."""
    from kb_ner_ray.pipelines.kg import kg_triples_for_sf_dir

    return kg_triples_for_sf_dir("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the large-scale training-data operator set (dedup, similarity search,
    text analysis)."""
    from kb_ner_ray.pipelines.queries import queries_registry

    return queries_registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query (same column names)."""
    from kb_ner_ray.pipelines.queries import oracle_registry

    return oracle_registry()
