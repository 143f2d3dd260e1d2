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


def test_stream_with_artifact_path(spark, fixture_dir, tmp_path):
    """The distributed dictionary artifact composes with the streaming
    scan: per-executor lazy load inside a streaming mapInPandas."""
    from ontology_matcher_spark.operators.dictionary_build import (
        write_detection_artifact,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(os.path.join(fixture_dir, "documents.parquet"))
    docs.limit(200).repartition(2).write.parquet(in_dir)
    art = str(tmp_path / "artifact")
    write_detection_artifact(
        spark.read.parquet(os.path.join(fixture_dir, "ontology_terms.parquet")),
        art,
    )
    q = stream_mentions(spark, in_dir, out_dir, ckpt, art)
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    batch = detect_mentions(spark.read.parquet(in_dir), art)
    key = lambda r: (r["doc_id"], r["span_idx"], r["surface"], r["id"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, batch.collect()))
    assert got.count() > 0


def test_stateful_entity_counts(spark, bundle, fixture_dir, tmp_path):
    """applyInPandasWithState running counts: processed over several
    micro-batches (maxFilesPerTrigger=4 < file count), the LAST update
    per entity must equal the batch groupBy count."""
    from pyspark.sql import functions as F

    from ontology_matcher_spark.streaming.stateful import run_entity_counts

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(os.path.join(fixture_dir, "documents.parquet"))
    docs.limit(200).repartition(8).write.parquet(in_dir)  # > 1 micro-batch
    bc = spark.sparkContext.broadcast(build_dictionary(bundle.terms))
    q = run_entity_counts(spark, in_dir, ckpt, bc, query_name="ec_test")
    q.awaitTermination(180)

    updates = spark.sql("SELECT * FROM ec_test").collect()
    assert updates, "stateful stream emitted no updates"
    final = {}
    for r in updates:  # update mode appends one row per (batch, id);
        final[r["id"]] = max(final.get(r["id"], 0), r["n"])  # last = max (monotone)
    batch = {
        r["id"]: r["n"]
        for r in detect_mentions(spark.read.parquet(in_dir), bc)
        .groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == batch


def test_windowed_watermark_late_data(spark, tmp_path):
    """Watermarked windowed rollup: append mode emits each finalized
    (window, type) exactly once; a row arriving LATER than the
    watermark after its window closed is dropped, not double-counted.
    Finalized output equals the batch groupBy of the on-time rows."""
    from datetime import datetime

    from ontology_matcher_spark.streaming.windowed import (
        stream_windowed_event_counts,
        windowed_event_counts,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ev(eid, h, m, typ, val):
        return (eid, datetime(2026, 1, 1, h, m), 1, typ, float(val), "")

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    # drop 1: hours 10 and 11 (the 11:59 row pushes the watermark past
    # 11:00 + 10min, finalizing hour 10)
    batch1 = [
        ev(1, 10, 5, "click", 1.0),
        ev(2, 10, 30, "click", 2.0),
        ev(3, 10, 45, "view", 3.0),
        ev(4, 11, 59, "click", 4.0),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = stream_windowed_event_counts(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)
    got1 = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got1 == {(10, "click"): (2, 3.0), (10, "view"): (1, 3.0)}

    # drop 2: one LATE row for the already-finalized hour 10 (dropped)
    # + a 13:30 row that pushes the watermark past hour 11's close
    batch2 = [
        ev(5, 10, 50, "click", 100.0),  # late → must NOT appear
        ev(6, 13, 30, "view", 5.0),
    ]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = stream_windowed_event_counts(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)
    got2 = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # hour 10 unchanged (late row dropped), hour 11 finalized
    assert got2 == {
        (10, "click"): (2, 3.0),
        (10, "view"): (1, 3.0),
        (11, "click"): (1, 4.0),
    }

    # batch twin over the ON-TIME rows equals the finalized windows
    on_time = spark.createDataFrame(
        [batch1[i] for i in range(4)], schema
    )
    batch_rows = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(on_time).collect()
        if r["window_start"].hour <= 11
    }
    assert batch_rows == got2


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact-dedup: first copy of each fingerprint is
    emitted, in-horizon copies are suppressed — including across a
    checkpointed availableNow restart (state persists). Normalization
    matches the batch exact_dedup fingerprint (casing/punctuation
    changes dedupe; real text changes don't)."""
    from datetime import datetime

    from ontology_matcher_spark.streaming.dedup import stream_dedup_documents

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long, ts timestamp")

    def doc(i, text, minute):
        return (i, text, "en", "s", len(text), datetime(2026, 1, 1, 12, minute))

    batch1 = [
        doc(1, "alpha beta gamma", 0),
        doc(2, "Alpha, beta GAMMA!", 1),   # normalized dup of 1
        doc(3, "something else entirely", 2),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = stream_dedup_documents(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)
    got1 = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got1 == [1, 3]

    # restart with new files: an in-horizon dup (suppressed via
    # persisted state) and one genuinely new text (emitted)
    batch2 = [
        doc(4, "alpha beta gamma", 5),     # dup of 1, inside horizon
        doc(5, "fresh new content here", 6),
    ]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = stream_dedup_documents(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got2 == [1, 3, 5]
