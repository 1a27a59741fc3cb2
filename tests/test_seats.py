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


def test_split_windows_covers_everything():
    from kb_ner_ray.functions.windows import split_windows

    for n in (1, 509, 510, 511, 765, 1021, 2000):
        wins = split_windows(n, 510, 255)
        assert wins[0][0] == 0 and wins[-1][1] == n
        covered = set()
        for s, e in wins:
            assert e - s <= 510
            covered.update(range(s, e))
        assert covered == set(range(n))


def test_merge_window_seqs_midpoint_rule():
    from kb_ner_ray.functions.windows import merge_window_seqs

    # two windows of 6 over 9 tokens, overlap [3,6) -> midpoint 4:
    # positions 0-3 from window A, 4-8 from window B
    a = ["A"] * 6
    b = ["B"] * 6
    got = merge_window_seqs([(0, a), (3, b)], 9)
    assert got == ["A"] * 4 + ["B"] * 5


def test_windowed_tagging_matches_direct_on_long_sentence(tiny_corpus):
    """A >510-token sentence tags identically through the sliding-window
    path and the direct trie path (mention length << stride/2)."""
    from kb_ner_ray.functions.windows import tag_tokens_windowed
    from kb_ner_ray.state.gazetteer import Gazetteer

    gaz = Gazetteer(tiny_corpus["gazetteer"].to_pylist())
    surfaces = [e[0] for lst in gaz.by_first.values() for e in lst][:40]
    tokens = []
    for i in range(700):
        tokens.append(f"filler{i % 97}")
        if i % 17 == 0 and surfaces:
            tokens.extend(surfaces[(i // 17) % len(surfaces)])
    assert len(tokens) > 510
    direct = gaz.tag_tokens(tokens)
    windowed = tag_tokens_windowed(tokens, gaz.tag_tokens)
    assert windowed == direct


def test_filter_by_length_window_mode(ray_session):
    import ray as _ray

    long_text = " ".join(f"w{i}" for i in range(1200))
    t = pa.table({"url": ["u1", "u2"], "sent_id": [0, 1],
                  "text": ["short one", long_text],
                  "lang": ["en", "en"]})
    out = filter_by_length(_ray.data.from_arrow(t), max_tokens=510,
                           mode="window").to_pandas()
    assert (out[out["url"] == "u1"]["win_id"] == 0).all()
    u2 = out[out["url"] == "u2"].sort_values("win_id")
    assert len(u2) > 1
    # windows reassemble the original text via win_start offsets
    toks = [None] * 1200
    for _i, row in u2.iterrows():
        for j, w in enumerate(row["text"].split()):
            toks[row["win_start"] + j] = w
    assert " ".join(toks) == long_text
