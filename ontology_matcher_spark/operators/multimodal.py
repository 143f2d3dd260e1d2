"""Multimodal span handling (driver-mandated): image/audio/video as
opaque binary columns with typed metadata.

The Spark-side plumbing — schemas, partitioning, Arrow UDF signatures,
batch shapes — is real and tested; the actual decode step is STUBBED
(image/audio libraries are not in this container): `decode_media`
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake featurizer (hash-seeded) stands in so the dataflow
can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def _fake_decode(media_ref: str, kind: str, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: metadata + feature
    vector derived from the sha256 of the media reference."""
    h = hashlib.sha256(media_ref.encode()).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feats = [round((b - 128) / 128.0, 6) for b in h[2 : 2 + dim]]
    return width, height, feats


def extract_media_features(
    documents: DataFrame, fake: bool = True, dim: int = 8
) -> DataFrame:
    """documents(doc_id, spans[]) → one feature row per media span via
    `mapInPandas` (Arrow batches). Real decode would read the binary
    behind media_ref (e.g. from an object store) inside the same
    iterator — the batch shape and schema don't change."""
    if not fake:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this container; run with fake=True for the deterministic "
            "plumbing test"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                if spans is None:
                    continue
                for si, span in enumerate(spans):
                    if span["kind"] == "text":
                        continue
                    w, h, feats = _fake_decode(span["media_ref"], span["kind"], dim)
                    rows.append((doc_id, si, span["media_ref"], span["kind"], w, h, feats))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields]
            )

    return documents.select("doc_id", "spans").mapInPandas(
        run, MEDIA_FEATURES_SCHEMA
    )
