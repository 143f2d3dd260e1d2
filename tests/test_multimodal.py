"""Real media header decode (stdlib container parse) over the
committed fixtures/media/*.{png,gif,bmp} — the round-2 stub shrunk to
feature extraction only — plus the sniffing unit contract."""

import os

import pytest

from ontology_matcher_spark.operators.multimodal import (
    extract_media_embeddings,
    extract_media_features,
    sniff_media_header,
)
from ontology_matcher_spark.schemas import DOCUMENTS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEDIA = os.path.join(REPO, "fixtures", "media")


@pytest.mark.parametrize(
    "fname,fmt,w,h",
    [("tiny.png", "png", 3, 2), ("tiny.gif", "gif", 5, 4), ("tiny.bmp", "bmp", 7, 5)],
)
def test_sniff_media_header(fname, fmt, w, h):
    with open(os.path.join(MEDIA, fname), "rb") as f:
        data = f.read()
    assert sniff_media_header(data) == (fmt, w, h)


def test_sniff_rejects_garbage():
    assert sniff_media_header(b"") == (None, None, None)
    assert sniff_media_header(b"not an image at all, sorry") == (None, None, None)
    assert sniff_media_header(b"\x89PNG\r\n\x1a\nshort") == (None, None, None)


def test_real_decode_over_file_refs(spark):
    """fake=False parses committed fixture headers through the full
    mapInPandas path; unresolvable media:// refs yield NULL dims."""
    spans = [
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.png", "offset": 0},
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.gif", "offset": 10},
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.bmp", "offset": 20},
        {"kind": "image", "text": "", "media_ref": "media://image/0/3", "offset": 30},
        {"kind": "text", "text": "no media here", "media_ref": "", "offset": 40},
    ]
    docs = spark.createDataFrame([("d0", spans)], DOCUMENTS)
    rows = {
        r["span_idx"]: r
        for r in extract_media_features(docs, fake=False).collect()
    }
    assert set(rows) == {0, 1, 2, 3}  # text span never decoded
    assert (rows[0]["width"], rows[0]["height"]) == (3, 2)
    assert (rows[1]["width"], rows[1]["height"]) == (5, 4)
    assert (rows[2]["width"], rows[2]["height"]) == (7, 5)
    assert rows[3]["width"] is None and rows[3]["height"] is None
    for r in rows.values():
        assert r["features"] is None  # extraction stays stubbed


def test_embeddings_stub_scope(spark):
    """NotImplementedError scope is feature extraction ONLY."""
    docs = spark.createDataFrame([], DOCUMENTS)
    with pytest.raises(NotImplementedError):
        extract_media_embeddings(docs)
