"""Explicit StructTypes for every table in the pipeline (SURVEY.md §1.4).

Multi-valued fields are ``array<string>`` internally; they're
pipe-joined only at TSV-parity export (the reference keeps them as
pipe-joined strings throughout: ontology_formatter.py:544-553).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

S = StringType()
A = ArrayType(StringType())


def _st(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: interleaved text + media document corpus (north-rule input shape)
SPAN = StructType(
    [
        _f("kind", S),       # "text" | "image" | "audio" | "table"
        _f("text", S),       # non-empty iff kind == "text"
        _f("media_ref", S),  # non-empty iff kind != "text"
        _f("offset", IntegerType()),
    ]
)
DOCUMENTS = _st(_f("doc_id", S, False), _f("spans", ArrayType(SPAN)))

#: entity-mention table — reference input format
#: (ontology_formatter.py:398-436; required [id,name,label,resource],
#: optional [description,synonyms,pmids,taxid,xrefs])
MENTIONS = _st(
    _f("id", S),
    _f("name", S),
    _f("label", S),
    _f("resource", S),
    _f("description", S),
    _f("synonyms", S),  # pipe-joined on input, like the reference TSVs
    _f("pmids", S),
    _f("taxid", S),
    _f("xrefs", S),
)

#: ontology term dictionary — replaces MyGene/MyChem/MyDisease/OLS4
#: remote sources (SURVEY.md §2.1 S5-S8)
ONTOLOGY_TERMS = _st(
    _f("ns", S, False),
    _f("local_id", S, False),
    _f("curie", S, False),
    _f("label", S, False),       # entity type
    _f("name", S),
    _f("normalized_name", S),
    _f("synonyms", A),           # gene: alias + other_names (MyGene)
    _f("description", S),        # gene: summary (MyGene)
    _f("taxid", S),
    _f("symbol", S),             # gene SYMBOL ("" for other types)
    _f("xrefs", A),              # metadata xrefs (MyDisease-style)
    _f("pmids", A),              # metadata pmids (MyChem/HMDB-style)
    _f("parent_curie", S),  # same-namespace is-a parent ("" = root)
)

#: cross-namespace equivalence edges — replaces OxO (SURVEY.md §2.1 S4);
#: distance always 1 mirroring disease/__init__.py:203
XREF_EDGES = _st(
    _f("src_curie", S, False),
    _f("dst_curie", S, False),
    _f("src_ns", S, False),
    _f("dst_ns", S, False),
    _f("label", S, False),
    _f("distance", IntegerType(), False),
)

#: formatted output row (golden header:
#: /root/reference/examples/results/gene_formatted.tsv:1)
FORMATTED_COLUMNS = [
    "id",
    "name",
    "label",
    "resource",
    "description",
    "synonyms",
    "pmids",
    "taxid",
    "xrefs",
    "raw_id",
]
FAILED_COLUMNS = FORMATTED_COLUMNS[:-1] + ["reason"]

#: (subj, pred, obj) triples — north-rule materialization
TRIPLES = _st(
    _f("subj", S, False),
    _f("pred", S, False),  # skos:exactMatch | xref | is-a
    _f("obj", S, False),
    _f("label", S),        # entity type partition column
    _f("src", S),          # provenance (stage / resource)
)

#: embeddings table (driver testdata shape)
EMBEDDINGS = _st(
    _f("vec_id", LongType()),
    _f("embedding", ArrayType(FloatType())),
    _f("label", IntegerType()),
)

#: per-stage lineage/counter rows (SURVEY.md §4 item 4)
LINEAGE = _st(
    _f("run_id", S, False),
    _f("stage", S, False),
    _f("metric", S, False),
    _f("value", LongType(), False),
    _f("wall_ms", LongType()),
    _f("input_fingerprint", S),
)
