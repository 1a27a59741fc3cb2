"""CoNLL codec tests (S6/S9 golden-fixture I/O seats)."""

import pyarrow as pa

from kb_ner_ray.sources.conll import (
    parse_conll, read_conll_dataset, write_conll)

SAMPLE = """\
# id s-001
John B-PER B-PER B-PER
Smith I-PER I-PER E-PER
visited O O O
Paris B-LOC B-LOC S-LOC

-DOCSTART- O O O

# id s-002
ACME B-CORP B-CORP S-CORP
"""


def test_parse_blocks_and_ids():
    t = parse_conll(SAMPLE)
    assert t.num_rows == 2
    assert t.column("sent_key").to_pylist() == ["s-001", "s-002"]
    assert t.column("text").to_pylist()[0] == [
        "John", "Smith", "visited", "Paris"]
    assert t.column("ner").to_pylist()[0] == [
        "B-PER", "E-PER", "O", "S-LOC"]


def test_docstart_dropped():
    t = parse_conll("-DOCSTART- O\n\nfoo O\n")
    assert t.num_rows == 1
    assert t.column("text").to_pylist() == [["foo"]]


def test_missing_columns_default_O():
    t = parse_conll("word\n", column_format={0: "text", 1: "ner"})
    assert t.column("ner").to_pylist() == [["O"]]


def test_round_trip():
    t = parse_conll(SAMPLE, column_format={0: "text", 3: "ner"})
    out = write_conll(t, ["text", "ner"], with_ids=True)
    t2 = parse_conll(out, column_format={0: "text", 1: "ner"})
    assert t2.column("sent_key").to_pylist() == t.column(
        "sent_key").to_pylist()
    assert t2.column("text").to_pylist() == t.column("text").to_pylist()
    assert t2.column("ner").to_pylist() == t.column("ner").to_pylist()


def test_write_empty():
    t = pa.table({"sent_key": pa.array([], pa.string()),
                  "text": pa.array([], pa.list_(pa.string()))})
    assert write_conll(t, ["text"]) == ""


def test_read_conll_dataset(ray_session, tmp_path):
    p1 = tmp_path / "train.txt"
    p2 = tmp_path / "dev.txt"
    p1.write_text(SAMPLE, encoding="utf-8")
    p2.write_text("x O O O\ny O O O\n", encoding="utf-8")
    ds = read_conll_dataset([str(p1), str(p2)])
    rows = ds.take_all()
    assert len(rows) == 3
    sources = {r["source"] for r in rows}
    assert sources == {str(p1), str(p2)}
