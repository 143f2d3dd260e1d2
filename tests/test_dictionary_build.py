"""Dictionary construction from raw API-shaped docs (A5/A6/A7 + P4)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ontology_matcher_spark.operators.dictionary_build import (
    build_term_table,
    edges_from_terms,
    format_xrefs,
    merge_api_docs,
    normalize_curie,
    update_dict,
)


# ------------------------------------------------- A5: deep dict merge
def test_update_dict_rules():
    """Transcribed rule-for-rule from apis.py:729-749."""
    x = {"a": [1, 2], "b": {"n": "x", "l": [1]}, "c": 1, "only_x": 9}
    y = {"a": [2, 3], "b": {"n": "y", "l": [2], "new": 5}, "c": 7, "only_y": 8}
    out = update_dict(x, y)
    assert out["a"] == [1, 2, 3]            # lists set-merge, order kept
    assert out["b"]["n"] == "y"             # scalar: y wins
    assert out["b"]["l"] == [1, 2]          # nested list merge
    assert out["b"]["new"] == 5
    assert out["c"] == 7
    assert out["only_x"] == 9 and out["only_y"] == 8


def test_update_dict_scalar_to_dict_promotion():
    assert update_dict({"k": "s"}, {"k": {"a": 1}})["k"] == {"a": 1}


# ------------------------------------------------- A6: multi-doc merge
def test_merge_api_docs(spark):
    rows = [
        ("q1", 0, json.dumps({"name": "alpha", "xrefs": {"mesh": ["D1"]}})),
        ("q1", 1, json.dumps({"name": "alpha2", "xrefs": {"mesh": ["D2"]}})),
        ("q2", 2, json.dumps({"name": "beta"})),
        ("q2", 3, None),
    ]
    df = spark.createDataFrame(rows, ["query", "idx", "doc"])
    out = {r["query"]: json.loads(r["doc"]) for r in merge_api_docs(df).collect()}
    assert out["q1"]["name"] == "alpha2"            # later doc wins scalars
    assert out["q1"]["xrefs"]["mesh"] == ["D1", "D2"]  # nested lists merge
    assert out["q2"] == {"name": "beta"}


# ------------------------------------- A7: xref namespace normalization
def test_format_xrefs_matches_reference_rules(spark):
    """Mirrors MyDisease.format_xrefs (apis.py:901-943): key→prefix
    attach incl. aliases and the HP idempotent guard."""
    raw = {
        "doid": ["DOID:1"],
        "mesh": ["D015673"],
        "ordo": ["94065"],
        "orphanet": ["94065", "94066"],
        "umls": ["C0007131"],
        "umls_cui": ["C0007131", "C9"],
        "icd9": ["349.89"],
        "icd10cm": ["C34.9"],
        "hp": ["HP:0030358", "0001250"],   # one already prefixed
        "omim": ["613406"],
    }
    schema = StructType(
        [StructField("xrefs", MapType(StringType(), ArrayType(StringType())))]
    )
    df = spark.createDataFrame([(raw,)], schema)
    got = set(df.select(format_xrefs(F.col("xrefs")).alias("x")).first()["x"])
    assert got == {
        "DOID:1", "MESH:D015673", "Orphanet:94065", "Orphanet:94066",
        "UMLS:C0007131", "UMLS:C9", "ICD-9:349.89", "ICD10CM:C34.9",
        "HP:0030358", "HP:0001250", "OMIM:613406",
    }


# -------------------------- P4: case-insensitive namespace + OLS4 form
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("MeSH:D015161", "MESH:D015161"),        # case-insensitive prefix
        ("mondo:0013256", "MONDO:0013256"),
        ("MONDO_0013256", "MONDO:0013256"),      # OLS4 short_form _ → :
        ("ICD-9:349.89", "ICD-9:349.89"),        # canonical passes through
        ("WEIRD:123", "WEIRD:123"),              # unknown prefix untouched
        ("noseparator", "noseparator"),
    ],
)
def test_normalize_curie(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["c"])
    assert df.select(normalize_curie(F.col("c")).alias("n")).first()["n"] == expected


# ----------------------------------- end-to-end: docs → terms → edges
def test_build_terms_and_edges(spark):
    schema = StructType(
        [
            StructField("curie", StringType()),
            StructField("name", StringType()),
            StructField("description", StringType()),
            StructField("synonyms", ArrayType(StringType())),
            StructField("xrefs", MapType(StringType(), ArrayType(StringType()))),
        ]
    )
    rows = [
        ("MONDO_0000001", "disease one", "d", ["syn a"],
         {"mesh": ["D1"], "umls": ["C1"]}),
        ("MeSH:D99", "disease two", "", [], {"doid": ["DOID:7"]}),
    ]
    terms = build_term_table(spark.createDataFrame(rows, schema), "Disease")
    t = {r["curie"]: r for r in terms.collect()}
    assert set(t) == {"MONDO:0000001", "MESH:D99"}
    assert set(t["MONDO:0000001"]["xrefs"]) == {"MESH:D1", "UMLS:C1"}
    assert t["MONDO:0000001"]["ns"] == "MONDO"
    edges = edges_from_terms(terms).collect()
    pairs = {(e["src_curie"], e["dst_curie"]) for e in edges}
    assert ("MONDO:0000001", "MESH:D1") in pairs
    assert ("MESH:D1", "MONDO:0000001") in pairs   # symmetric
    assert ("MESH:D99", "DOID:7") in pairs
    for e in edges:
        assert e["distance"] == 1
        assert e["src_ns"] == e["src_curie"].split(":")[0]


# ---------------------- artifact reuse keyed by input fingerprint
def test_artifact_fingerprint_forces_rebuild(spark, tmp_path):
    """A pre-existing artifact dir is reused ONLY when its stamped
    _FINGERPRINT matches the current dictionary input: changing the
    term table at the same path must rebuild, not serve stale terms
    (ADVICE r3: the bench corpus v2→v3 bump silently reused the old
    artifact)."""
    from ontology_matcher_spark.operators.dictionary_build import (
        detection_input_fingerprint,
    )
    from ontology_matcher_spark.plans.pipeline import detected_mentions_df

    def terms_df(names):
        return spark.createDataFrame(
            [(f"MESH:D{i}", n, "Disease", [], "", [n]) for i, n in enumerate(names)],
            "curie string, name string, label string, "
            "xrefs array<string>, parent_curie string, synonyms array<string>",
        )

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [("text", "patient shows oldterm and newterm today", "", 0)],
            )
        ],
        "doc_id string, spans array<struct<kind:string,"
        "text:string,media_ref:string,offset:int>>",
    )
    path = str(tmp_path / "artifact")
    t1, t2 = terms_df(["oldterm"]), terms_df(["newterm"])
    assert detection_input_fingerprint(t1) != detection_input_fingerprint(t2)

    out1 = detected_mentions_df(spark, docs, t1, artifact_dir=path)
    assert {r["name"] for r in out1.collect()} == {"oldterm"}
    # same path, same input → reused (fingerprint matches)
    fp_file = tmp_path / "artifact" / "_FINGERPRINT"
    assert fp_file.exists()
    mtime1 = fp_file.stat().st_mtime
    out1b = detected_mentions_df(spark, docs, t1, artifact_dir=path)
    assert {r["name"] for r in out1b.collect()} == {"oldterm"}
    assert fp_file.stat().st_mtime == mtime1  # no rebuild happened
    # same path, DIFFERENT input → rebuilt, new terms detected
    out2 = detected_mentions_df(spark, docs, t2, artifact_dir=path)
    assert {r["name"] for r in out2.collect()} == {"newterm"}
