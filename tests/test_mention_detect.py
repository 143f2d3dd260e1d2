"""Mention detection over interleaved documents: span pass-through
invariant (BASELINE.json input_hint) + detection correctness vs a
plain-Python scan."""

import os

from pyspark.sql import functions as F

from ontology_matcher_spark.operators.mention_detect import (
    best_candidate_per_mention,
    build_dictionary,
    detect_mentions,
    _scan_text,
)
from ontology_matcher_spark.operators.multimodal import extract_media_features


def _docs(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "documents.parquet"))


def test_span_sequence_invariant(spark, bundle, fixture_dir):
    """Round-trip through the engine's document scan must preserve
    (kind, text, media_ref, order) per row exactly."""
    docs = _docs(spark, fixture_dir)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"]) for s in r["spans"]
        ]
        for r in docs.collect()
    }
    exp = {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"]) for s in d["spans"]
        ]
        for d in bundle.documents
    }
    assert got == exp


def test_detection_matches_python_scan(spark, bundle, fixture_dir):
    d = build_dictionary(bundle.terms)
    bc = spark.sparkContext.broadcast(d)
    got = detect_mentions(_docs(spark, fixture_dir), bc)
    got_rows = {
        (r["doc_id"], r["span_idx"], r["surface"], r["id"], r["match_type"])
        for r in got.collect()
    }
    exp_rows = set()
    for doc in bundle.documents:
        for si, span in enumerate(doc["spans"]):
            if span["kind"] != "text" or not span["text"]:
                continue
            for surface, curie, mtype in _scan_text(span["text"], d):
                exp_rows.add((doc["doc_id"], si, surface, curie, mtype))
    assert got_rows == exp_rows
    assert len(got_rows) > 100  # corpus actually contains mentions


def test_media_spans_never_detected(spark, bundle, fixture_dir):
    d = build_dictionary(bundle.terms)
    bc = spark.sparkContext.broadcast(d)
    mentions = detect_mentions(_docs(spark, fixture_dir), bc).collect()
    spans_by_doc = {doc["doc_id"]: doc["spans"] for doc in bundle.documents}
    for r in mentions:
        span = spans_by_doc[r["doc_id"]][r["span_idx"]]
        assert span["kind"] == "text"


def test_best_candidate_deterministic(spark, bundle, fixture_dir):
    d = build_dictionary(bundle.terms)
    bc = spark.sparkContext.broadcast(d)
    m = detect_mentions(_docs(spark, fixture_dir), bc)
    b1 = sorted(map(tuple, best_candidate_per_mention(m).collect()))
    b2 = sorted(map(tuple, best_candidate_per_mention(m).collect()))
    assert b1 == b2
    # exactly one winner per (doc_id, span_idx, surface)
    keys = [(t[0], t[1], t[3]) for t in b1]
    assert len(keys) == len(set(keys))


def test_media_feature_plumbing(spark, bundle, fixture_dir):
    feats = extract_media_features(_docs(spark, fixture_dir), fake=True)
    rows = feats.collect()
    n_media = sum(
        1
        for doc in bundle.documents
        for s in doc["spans"]
        if s["kind"] != "text"
    )
    assert len(rows) == n_media
    for r in rows[:20]:
        assert r["kind"] in ("image", "audio", "table")
        assert len(r["features"]) == 8
        assert r["width"] >= 64 and r["height"] >= 64
