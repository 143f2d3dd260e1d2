"""dedup-command semantics (ref cli.py:168-296 intended algorithm):
xref > synonym > name priority, exactly-one → merge, multi → drop,
none → keep; salted final aggregation."""

from pyspark.sql import functions as F

from ontology_matcher_spark.operators.dedup_entities import dedup_entities
from ontology_matcher_spark.ontology_types import ONTOLOGY_TYPES
from ontology_matcher_spark.schemas import FORMATTED_COLUMNS


def _row(id, name, xrefs="", synonyms="", raw_id=""):
    return {
        "id": id, "name": name, "label": "Gene", "resource": "CTD",
        "description": "", "synonyms": synonyms, "pmids": "",
        "taxid": "", "xrefs": xrefs, "raw_id": raw_id,
    }


def test_dedup_merge_drop_keep(spark):
    gene = ONTOLOGY_TYPES["Gene"]
    rows = [
        # official rows
        _row("ENTREZ:1", "alpha", xrefs="SYMBOL:9|HGNC:2", synonyms="a1|a2"),
        _row("ENTREZ:2", "beta", xrefs="", synonyms="beta syn"),
        _row("ENTREZ:3", "gamma", xrefs="", synonyms=""),
        # unofficial: xref rule — ENTREZ:1 lists SYMBOL:9 → merge
        _row("SYMBOL:9", "alpha-ish", synonyms="x", raw_id="SYMBOL:9"),
        # unofficial: name rule — matches gamma by name
        _row("UNIPROT:7", "gamma", raw_id="UNIPROT:7"),
        # unofficial: synonym rule — matches beta's synonym
        _row("MGI:5", "beta syn", raw_id="MGI:5"),
        # unofficial: multi-match by name (alpha named twice officially)
        _row("HGNC:8", "dup name"),
        _row("ENTREZ:4", "dup name"),
        _row("ENTREZ:5", "dup name"),
        # unofficial: no match at all → kept as-is
        _row("UNIPROT:6", "zeta", synonyms="zz"),
    ]
    df = spark.createDataFrame(rows).select(*FORMATTED_COLUMNS)
    out = {r["id"]: r.asDict() for r in dedup_entities(df, gene).collect()}

    # merged: SYMBOL:9 folded into ENTREZ:1 (xref rule)
    assert "SYMBOL:9" not in out
    assert "SYMBOL:9" in out["ENTREZ:1"]["xrefs"].split("|")
    assert "x" in out["ENTREZ:1"]["synonyms"].split("|")
    assert "SYMBOL:9" in out["ENTREZ:1"]["raw_id"].split("|")
    # merged: UNIPROT:7 folded into ENTREZ:3 (name rule)
    assert "UNIPROT:7" not in out
    assert "UNIPROT:7" in out["ENTREZ:3"]["xrefs"].split("|")
    # merged: MGI:5 folded into ENTREZ:2 (synonym rule)
    assert "MGI:5" not in out
    assert "MGI:5" in out["ENTREZ:2"]["xrefs"].split("|")
    # multi-match unofficial dropped; official namesakes stay
    assert "HGNC:8" not in out
    assert "ENTREZ:4" in out and "ENTREZ:5" in out
    # no-match unofficial kept untouched
    assert out["UNIPROT:6"]["synonyms"] == "zz"


def test_dedup_on_pipeline_output(spark, fixture_dir):
    import os

    from ontology_matcher_spark.plans.pipeline import link_mentions

    gene = ONTOLOGY_TYPES["Gene"]
    mentions = spark.read.parquet(os.path.join(fixture_dir, "mentions.parquet")).where(
        F.col("label") == "Gene"
    )
    edges = spark.read.parquet(os.path.join(fixture_dir, "xref_edges.parquet"))
    terms = spark.read.parquet(os.path.join(fixture_dir, "ontology_terms.parquet"))
    fmt, _ = link_mentions(mentions, edges, terms, gene)
    out = dedup_entities(fmt, gene)
    n_in, n_out = fmt.count(), out.count()
    assert 0 < n_out <= n_in
    # ids unique after final aggregation
    assert out.select("id").distinct().count() == n_out
    # official ids survive
    n_official_in = fmt.where(F.col("id").startswith("ENTREZ:")).select("id").distinct().count()
    n_official_out = out.where(F.col("id").startswith("ENTREZ:")).count()
    assert n_official_out == n_official_in
