"""CoNLL column-format codec — the reference's on-disk interchange format.

Fills seats S6 (CoNLL query reader, kb/generate_data.py:81-116) and S9
(ColumnCorpus/ColumnDataset reader, flair/datasets.py:852-956) for
golden-fixture I/O only: inside the engine sentences stay columnar Arrow
end-to-end (SURVEY.md §2.1 S9 note), and this codec exists so reference-
formatted fixtures can be read/written for conformance diffs.

Semantics pinned from the reference reader:
* sentences are blank-line-separated blocks of whitespace-split columns
  (flair/datasets.py:928-956);
* lines starting with ``#`` are comments and carry an optional sentence id
  (``# id foo`` — train.py:362-387 convention);
* ``-DOCSTART-`` rows are document separators and are dropped
  (flair/models/sequence_tagger_model.py:1487-1495, M19);
* ``column_format`` maps column index -> name, e.g. {0: "text", 3: "ner"}
  (config/test.yaml:46-145).
"""

from __future__ import annotations

import pyarrow as pa

DEFAULT_COLUMNS = {0: "text", 1: "pos", 2: "upos", 3: "ner"}


def parse_conll(content: str,
                column_format: dict[int, str] | None = None) -> pa.Table:
    """CoNLL text -> Arrow table, one row per sentence.

    Output schema: ``sent_key: string`` (the ``# id`` comment if present,
    else the running sentence index as a string) plus one
    ``list<string>`` column per named column.
    """
    column_format = column_format or DEFAULT_COLUMNS
    names = [column_format[k] for k in sorted(column_format)]
    idxs = sorted(column_format)

    keys: list[str] = []
    cols: dict[str, list[list[str]]] = {n: [] for n in names}
    cur: dict[str, list[str]] = {n: [] for n in names}
    cur_key: str | None = None
    n_sent = 0

    def flush():
        nonlocal cur, cur_key, n_sent
        if cur[names[0]]:
            keys.append(cur_key if cur_key is not None else str(n_sent))
            for n in names:
                cols[n].append(cur[n])
            n_sent += 1
        cur = {n: [] for n in names}
        cur_key = None

    for line in content.split("\n"):
        stripped = line.strip()
        if not stripped:
            flush()
            continue
        if stripped.startswith("#"):
            parts = stripped.split(None, 2)
            if len(parts) >= 3 and parts[1] == "id":
                cur_key = parts[2]
            continue
        fields = stripped.split()
        if fields[0] == "-DOCSTART-":
            flush()
            continue
        for n, i in zip(names, idxs):
            cur[n].append(fields[i] if i < len(fields) else "O")
    flush()

    return pa.table(
        {"sent_key": pa.array(keys, pa.string()),
         **{n: pa.array(cols[n], pa.list_(pa.string())) for n in names}}
    )


def write_conll(table: pa.Table, columns: list[str],
                with_ids: bool = False) -> str:
    """Arrow sentences table -> CoNLL text (inverse of ``parse_conll``).

    ``columns``: which list<string> columns to emit, in order.  Rows within
    a sentence are space-separated (reference prediction writer format,
    flair/models/sequence_tagger_model.py:2632-2643).
    """
    out: list[str] = []
    keys = (table.column("sent_key").to_pylist()
            if "sent_key" in table.column_names else [None] * table.num_rows)
    data = [table.column(c).to_pylist() for c in columns]
    for row_i in range(table.num_rows):
        if with_ids and keys[row_i] is not None:
            out.append(f"# id {keys[row_i]}")
        n_tok = len(data[0][row_i])
        for t in range(n_tok):
            out.append(" ".join(data[c][row_i][t] for c in range(len(columns))))
        out.append("")
    return "\n".join(out) + "\n" if out else ""


def read_conll_dataset(paths: str | list[str],
                       column_format: dict[int, str] | None = None):
    """CoNLL file(s) -> ray.data.Dataset (one block per file).

    Files are whole-file units (sentence blocks can't be split on byte
    boundaries), so parallelism is per file — matching the reference's
    one-process-per-file layout while staying a Dataset.
    """
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for path in batch.column("path").to_pylist():
            with open(path, encoding="utf-8") as f:
                t = parse_conll(f.read(), column_format)
            tables.append(t.append_column(
                "source", pa.array([path] * t.num_rows, pa.string())))
        return pa.concat_tables(tables)

    return rd.from_arrow(
        pa.table({"path": pa.array(paths, pa.string())})
    ).map_batches(load, batch_format="pyarrow", batch_size=1)
