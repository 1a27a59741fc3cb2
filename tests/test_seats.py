"""Tests for the remaining reference seats: T5 packer, S10/M19 length
filter, M20 four-class remap."""

import pyarrow as pa
import ray

from kb_ner_ray.functions.spans import remap_to_four_class
from kb_ner_ray.functions.tokenizer import pack_by_length, subtoken_count
from kb_ner_ray.stages.sentences import filter_by_length


def test_pack_by_length_budget_and_coverage():
    texts = ["word " * n for n in (1, 5, 50, 200, 400, 3, 7)]
    packs = pack_by_length(texts, budget=120, max_items=3)
    seen = sorted(i for p in packs for i in p)
    assert seen == list(range(len(texts)))  # every index exactly once
    for p in packs:
        assert len(p) <= 3
        total = sum(subtoken_count(texts[i]) for i in p)
        # single over-budget items get their own pack; multi-item packs obey
        if len(p) > 1:
            assert total <= 120


def test_pack_by_length_sorts_longest_first():
    texts = ["a", "b c d e f", "g h"]
    packs = pack_by_length(texts, budget=10_000, max_items=2)
    assert packs[0][0] == 1  # longest first


def test_filter_by_length(ray_session):
    t = pa.table({
        "url": ["u"] * 3,
        "sent_id": pa.array([0, 1, 2], pa.int32()),
        "text": ["short one", " ".join(["w"] * 600), " ".join(["w"] * 800)],
    })
    ds = ray.data.from_arrow(t)
    assert filter_by_length(ds, train=True).count() == 1    # cap 510
    assert filter_by_length(ds, train=False).count() == 3   # cap 999


def test_remap_to_four_class():
    assert remap_to_four_class("B-GRP") == "B-ORG"
    assert remap_to_four_class("S-CORP") == "S-ORG"
    assert remap_to_four_class("I-PROD") == "I-MISC"
    assert remap_to_four_class("E-CW") == "E-MISC"
    assert remap_to_four_class("B-PER") == "B-PER"
    assert remap_to_four_class("O") == "O"
    assert remap_to_four_class("B-X") == "O"  # unknown label dropped


def test_multilang_index_scoping():
    from kb_ner_ray.state.bm25 import KBIndex, MultiLangKBIndex

    rows = [
        {"lang": "en", "title": "Acme Corp", "sentence": "Acme Corp builds robots ."},
        {"lang": "en", "title": "North Haven", "sentence": "North Haven is a town ."},
        {"lang": "zh", "title": "Acme", "sentence": "Acme robots 公司"},
    ]
    m = MultiLangKBIndex(rows)
    en = m.search("Acme Corp robots", lang="en")
    assert en and all(rows[i]["lang"] == "en" for i, _ in en)
    zh = m.search("Acme robots", lang="zh")
    assert [i for i, _ in zh] == [2]  # global index into rows
    assert m.search("anything", lang="de") == []  # missing language index
    both = m.search("Acme robots", lang="all")
    assert {i for i, _ in both} >= {0, 2}
    # lang=None equals the single all-languages index
    assert m.search("Acme robots") == KBIndex(rows).search("Acme robots")
