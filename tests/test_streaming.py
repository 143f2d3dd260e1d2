"""Structured-Streaming ingest: the detection stage applied to a
document stream (file source, availableNow trigger) must produce the
same mention rows as the batch path."""

import os

from ontology_matcher_spark.operators.mention_detect import (
    build_dictionary,
    detect_mentions,
)
from ontology_matcher_spark.streaming.ingest import stream_mentions


def test_stream_matches_batch(spark, bundle, fixture_dir, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # stage the fixture documents as a "stream" drop
    docs = spark.read.parquet(os.path.join(fixture_dir, "documents.parquet"))
    docs.limit(300).repartition(3).write.parquet(in_dir)

    bc = spark.sparkContext.broadcast(build_dictionary(bundle.terms))
    q = stream_mentions(spark, in_dir, out_dir, ckpt, bc)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    batch = detect_mentions(spark.read.parquet(in_dir), bc)
    key = lambda r: (r["doc_id"], r["span_idx"], r["surface"], r["id"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, batch.collect()))
    assert got.count() > 0
