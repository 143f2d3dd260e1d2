"""Multimodal span handling (driver-mandated): image/audio/video as
opaque binary columns with typed metadata.

The Spark-side plumbing — schemas, partitioning, Arrow UDF signatures,
batch shapes — is real and tested, and the DECODE step is real for
container formats whose dimensions are a pure header parse
(PNG / GIF / BMP — `sniff_media_header`, stdlib only; committed
fixtures under fixtures/media/). What remains stubbed is FEATURE
EXTRACTION (pixel decode → embedding), which needs image/audio
libraries not present in this container: `extract_media_features`
with ``fake=True`` substitutes a deterministic hash-seeded featurizer
so the dataflow can be exercised end-to-end; with ``fake=False`` it
emits real header metadata and NULL features.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def sniff_media_header(
    data: bytes,
) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from raw container bytes — pure stdlib
    header parse, no image libraries:

    - PNG: 8-byte signature, IHDR width/height as big-endian uint32
      at offsets 16/20;
    - GIF (87a/89a): logical-screen width/height as little-endian
      uint16 at offsets 6/8;
    - BMP: 'BM' magic + DIB header — BITMAPINFOHEADER (size ≥ 40,
      int32 w/h at 18/22, height sign = row order) or the ancient
      BITMAPCOREHEADER (size 12, uint16 at 18/20).

    Unknown/short payloads → (None, None, None)."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if len(data) >= 26 and data[:2] == b"BM":
        (dib_size,) = struct.unpack("<I", data[14:18])
        if dib_size >= 40:
            w, h = struct.unpack("<ii", data[18:26])
            return "bmp", abs(w), abs(h)
        if dib_size == 12 and len(data) >= 22:
            w, h = struct.unpack("<HH", data[18:22])
            return "bmp", w, h
    return None, None, None


def _read_media_bytes(media_ref: str) -> bytes | None:
    """Resolve a media_ref to raw bytes. ``file://`` refs read the
    local/shared filesystem (the sandbox analog of an object-store
    GET inside the same executor iterator); other schemes (the
    synthetic ``media://`` fixtures) resolve to None."""
    if media_ref and media_ref.startswith("file://"):
        try:
            with open(media_ref[len("file://"):], "rb") as f:
                return f.read(1 << 20)  # headers only need the head
        except OSError:
            return None
    return None


def _fake_decode(media_ref: str, kind: str, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: metadata + feature
    vector derived from the sha256 of the media reference."""
    h = hashlib.sha256(media_ref.encode()).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feats = [round((b - 128) / 128.0, 6) for b in h[2 : 2 + dim]]
    return width, height, feats


def extract_media_embeddings(documents: DataFrame) -> DataFrame:
    """Pixel/waveform decode → embedding vectors: NOT implementable in
    this container (no image/audio libraries). The header-metadata
    path (`extract_media_features(fake=False)`) and the deterministic
    fake featurizer (`fake=True`) cover the Spark-side plumbing."""
    raise NotImplementedError(
        "real media feature extraction requires image/audio libraries "
        "not present in this container; header metadata decode IS "
        "implemented (extract_media_features(fake=False)) and the "
        "deterministic fake featurizer covers the dataflow (fake=True)"
    )


def extract_media_features(
    documents: DataFrame, fake: bool = True, dim: int = 8
) -> DataFrame:
    """documents(doc_id, spans[]) → one feature row per media span via
    `mapInPandas` (Arrow batches).

    ``fake=True``: deterministic hash-seeded width/height/features
    (plumbing tests). ``fake=False``: REAL decode of the container
    header — bytes are read behind ``file://`` media_refs inside the
    iterator (an object-store read on a real cluster) and
    width/height parsed by `sniff_media_header`; features are NULL
    (see `extract_media_embeddings` for the remaining stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                if spans is None:
                    continue
                for si, span in enumerate(spans):
                    if span["kind"] == "text":
                        continue
                    if fake:
                        w, h, feats = _fake_decode(span["media_ref"], span["kind"], dim)
                    else:
                        data = _read_media_bytes(span["media_ref"])
                        _, w, h = (
                            sniff_media_header(data) if data else (None, None, None)
                        )
                        feats = None
                    rows.append((doc_id, si, span["media_ref"], span["kind"], w, h, feats))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields]
            )

    return documents.select("doc_id", "spans").mapInPandas(
        run, MEDIA_FEATURES_SCHEMA
    )
