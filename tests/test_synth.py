"""Generator invariants: determinism, extraction round-trip, gold consistency."""

from kb_ner_ray.data.synth import generate_corpus
from kb_ner_ray.functions.text import extract_text, split_sentences


def test_determinism():
    a = generate_corpus(30, seed=7)
    b = generate_corpus(30, seed=7)
    for name in a:
        assert a[name].equals(b[name]), name
    c = generate_corpus(30, seed=8)
    assert not a["pages"].equals(c["pages"])


def test_extract_roundtrip_byte_identical(tiny_corpus):
    # the per-url invariant from BASELINE.json input_hint
    for p in tiny_corpus["pages"].to_pylist():
        assert extract_text(p["html"]) == p["text"], p["url"]


def test_sentence_split_matches_gold(tiny_corpus):
    gold: dict[str, list[str]] = {}
    for r in tiny_corpus["sentences"].to_pylist():
        gold.setdefault(r["url"], []).append(r["text"])
    for p in tiny_corpus["pages"].to_pylist():
        assert split_sentences(p["text"], p["lang"]) == gold[p["url"]]


def test_gold_mentions_reference_real_tokens(tiny_corpus):
    sent = {(r["url"], r["sent_id"]): r["text"]
            for r in tiny_corpus["sentences"].to_pylist()}
    for m in tiny_corpus["mentions"].to_pylist():
        toks = sent[(m["url"], m["sent_id"])].split()
        assert " ".join(toks[m["start_tok"]:m["end_tok"]]) == m["surface"]


def test_skew_probes_present():
    t = generate_corpus(300, seed=42)
    pages = t["pages"].to_pylist()
    from urllib.parse import urlparse

    hot = sum(1 for p in pages if urlparse(p["url"]).netloc.endswith(
        ("news.example.com", "portal.example.org", "daily.example.net")))
    assert hot > 0.1 * len(pages)  # hot-domain skew probe exists
    n_sents: dict[str, int] = {}
    for r in t["sentences"].to_pylist():
        n_sents[r["url"]] = n_sents.get(r["url"], 0) + 1
    assert max(n_sents.values()) > 100  # giant-page probe exists
    assert any(p["lang"] == "zh" for p in pages)
