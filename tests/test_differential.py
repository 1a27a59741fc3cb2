"""Randomized DIFFERENTIAL tests: run a queries()-registry entry and its
own oracle_sql() SQL side-by-side over freshly generated random tables —
the driver-corpus gate pins one input; these pin the space around it.
Each case uses the exact SQL string the driver uses, so a divergence here
is a real oracle break, not a test approximation."""

import tempfile

import duckdb
import numpy as np
import pandas as pd
import pytest


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run_pair(qname: str, sf_dir: str, tables: dict):
    from kb_ner_ray.pipelines.queries import oracle_registry, queries_registry

    res = queries_registry()[qname](sf_dir)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    con = duckdb.connect()
    for t, df in tables.items():
        con.register(f"__{t}", df)
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM __{t}")
    want = con.sql(oracle_registry()[qname]).df()
    got, want = _norm(pd.DataFrame(res)), _norm(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _random_documents(rng, n: int) -> pd.DataFrame:
    vocab = [f"w{i}" for i in range(30)] + ["the", "a", "##", "x.y"]
    texts = [" ".join(rng.choice(vocab,
                                 size=rng.integers(0, 40)).tolist())
             for _ in range(n)]
    # plant exact duplicates and shared heads for the dedup ops
    for i in range(0, n, 7):
        texts[i] = texts[(i * 3 + 1) % n]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(["en", "de", "xx"], size=n),
        "source": [f"s{int(x)}" for x in rng.integers(0, 5, size=n)],
        "n_chars": np.array([len(t) for t in texts], np.int64),
    })


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_document_ops(ray_session, seed):
    rng = np.random.default_rng(seed)
    docs = _random_documents(rng, 60)
    with tempfile.TemporaryDirectory(prefix="diff_docs_") as sf:
        docs.to_parquet(f"{sf}/documents.parquet", index=False)
        for q in ("doc_pii_redact", "quality_classifier", "dsir_weights",
                  "snapshot_delta", "doc_token_entropy",
                  # the random corpus PLANTS exact duplicates, so the
                  # overlap matrix is non-vacuous here (the driver corpus
                  # has no full-text dups and yields 0 rows)
                  "doc_source_overlap", "doc_length_hist",
                  "doc_top_bigrams"):
            _run_pair(q, sf, {"documents": docs})


@pytest.mark.parametrize("seed", [0, 1])
def test_differential_event_ops(ray_session, seed):
    rng = np.random.default_rng(100 + seed)
    n = 400
    ts = (pd.Timestamp("2026-01-01")
          + pd.to_timedelta(np.sort(rng.integers(0, 3_000_000, size=n)),
                            unit="s"))
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, 25, size=n).astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], size=n),
        "value": rng.random(size=n) * 100,
        "props": ['{"k": 1}'] * n,
    })
    with tempfile.TemporaryDirectory(prefix="diff_events_") as sf:
        events.to_parquet(f"{sf}/events.parquet", index=False)
        for q in ("events_funnel", "events_burst_dedup",
                  "events_transitions", "events_retention",
                  "events_decay_score", "events_user_mode",
                  "events_session_stats", "events_attribution",
                  "events_anomaly_p99"):
            _run_pair(q, sf, {"events": events})


@pytest.mark.parametrize("seed", [0, 1])
def test_differential_embedding_ops(ray_session, seed):
    rng = np.random.default_rng(200 + seed)
    n, dim = 80, 12
    m = rng.normal(size=(n, dim)).astype(np.float32)
    m[11] = m[3] + rng.normal(scale=1e-3, size=dim).astype(np.float32)
    emb = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.tolist() for row in m],
        "label": rng.integers(0, 4, size=n).astype(np.int32),
    })
    with tempfile.TemporaryDirectory(prefix="diff_emb_") as sf:
        emb.to_parquet(f"{sf}/embeddings.parquet", index=False)
        _run_pair("semdedup", sf, {"embeddings": emb})
