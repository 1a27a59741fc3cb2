"""Arrow schemas for every logical table (SURVEY.md §1.3 mapping).

The ``pages`` schema follows BASELINE.json's ``input_hint`` exactly:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# kb mirrors the reference KB sentence record kb/parse_text.py:81
# {title, p_id, s_id, sentence, paragraph, url} + decoded anchors.
KB = pa.schema(
    [
        ("kb_id", pa.int64()),
        ("ent_id", pa.int64()),
        ("lang", pa.string()),
        ("title", pa.string()),
        ("p_id", pa.int32()),
        ("s_id", pa.int32()),
        ("sentence", pa.string()),
        ("paragraph", pa.string()),
        (
            "anchors",
            pa.list_(
                pa.struct(
                    [
                        ("start", pa.int32()),
                        ("end", pa.int32()),
                        ("mention", pa.string()),
                        ("entity", pa.string()),
                    ]
                )
            ),
        ),
        ("url", pa.string()),
    ]
)

SENTENCES = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("tokens", pa.list_(pa.string())),
        ("starts", pa.list_(pa.int32())),
        ("ends", pa.list_(pa.int32())),
    ]
)

MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("start_tok", pa.int32()),
        ("end_tok", pa.int32()),
        ("surface", pa.string()),
        ("label", pa.string()),
        ("score", pa.float32()),
    ]
)

CONTEXTS = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("rank", pa.int32()),
        ("kb_id", pa.int64()),
        ("score", pa.float32()),
        ("kb_sentence", pa.string()),
        ("kb_title", pa.string()),
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("score", pa.float32()),
    ]
)
