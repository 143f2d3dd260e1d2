"""Parity against the REFERENCE'S OWN golden outputs.

`/root/reference/examples/results/{type}_formatted.json` stores the
complete ConversionResult the reference produced from live API calls:
per-id namespace mappings AND the metadata dict each API returned
(conversion_result.converted_ids[*].{<NS>, metadata}). We reconstruct
the DICTIONARY those remote APIs served (xref edges + term metadata)
— NOT the decisions — run OUR pipeline on the reference's example
input TSVs (`/root/reference/examples/{type}.tsv`), and compare
row-for-row against the golden formatted TSVs
(`examples/results/{type}_formatted.tsv`, the files the reference's
Makefile regenerates — Makefile:89-95).

The routing decisions (converted / no-results / kept-raw / rescue) are
re-derived by our engine from the edge table alone; only the edges and
metadata come from the golden JSON, exactly the inputs the reference's
converters received over the wire.

Assertions:
- row count and mapping pairs (id, raw_id): precision AND recall
  ≥ 0.95 vs the golden mapping set (the north rule's bar; measured
  exact match on the committed goldens);
- xrefs per row: set equality (the reference pipe-joins a Python SET —
  order is not defined: ontology_formatter.py:544-553);
- disease/compound/metabolite: name, description, resource, label,
  pmids-set and synonyms-set equality per row;
- gene: name/description/taxid asserted against the CURRENT reference
  code's semantics computed from the same metadata
  (gene/__init__.py:332-354: SYMBOL→name, summary→description, taxid
  from metadata). The committed golden TSV predates that commit (its
  name column equals metadata.name even where metadata.SYMBOL is set),
  so byte-parity with the stale golden name column is impossible for
  any implementation of the current code; mapping/xref columns are
  still asserted against the golden TSV itself.

Namespace note: the goldens store the disease converter's wire-era
namespace key "ORDO"; the current reference config spells it
"Orphanet" (disease/__init__.py:24-38). Edges are rebuilt under the
current spelling; the alias-id STRINGS (ORDO:xxxx) are preserved, so
output xrefs match the golden bytes.
"""

from __future__ import annotations

import csv
import json
import os

import pytest

GOLD = "/root/reference/examples/results"
EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD), reason="reference goldens not available"
)

from ontology_matcher_spark.ontology_types import (  # noqa: E402
    ONTOLOGY_TYPES,
    Strategy,
)

#: golden-JSON namespace key → current reference/engine namespace
_NS_RENAME = {"ORDO": "Orphanet"}

TYPES = {
    "gene": "Gene",
    "disease": "Disease",
    "compound": "Compound",
    "metabolite": "Metabolite",
}


def _conversion_result(name: str) -> dict:
    with open(os.path.join(GOLD, f"{name}_formatted.json")) as f:
        return json.load(f)["conversion_result"]


def _canonical_of(conv: dict, default: str):
    dv = conv.get(default)
    if isinstance(dv, str):
        return dv
    if isinstance(dv, list) and len(dv) == 1:
        return dv[0]
    return None


def _as_list(v) -> list:
    if v is None:
        return []
    if isinstance(v, str):
        return [v] if v else []
    return [x for x in v if x]


def dictionary_from_golden(cr: dict, otype) -> tuple[list[dict], list[dict]]:
    """ConversionResult → (xref_edges rows, ontology_terms rows): the
    offline reconstruction of what MyGene/MyDisease/MyChem/OxO served."""
    edges: list[dict] = []
    terms: dict[str, dict] = {}
    golden_keys = [k for k in cr["databases"]]
    for conv in cr["converted_ids"]:
        raw = conv["raw_id"]
        for key in golden_keys:
            ns = _NS_RENAME.get(key, key)
            for dst in _as_list(conv.get(key)):
                edges.append(
                    {
                        "src_curie": raw,
                        "dst_curie": dst,
                        "src_ns": raw.split(":", 1)[0],
                        "dst_ns": ns,
                        "label": otype.type,
                        "distance": 1,
                    }
                )
        md = conv.get("metadata") or {}
        # metadata is keyed by the resolved canonical id when one
        # exists, else by the RAW id — the reference applies
        # query-keyed metadata even to rows with no default mapping
        # (format_by_metadata before the id-None branch)
        canonical = _canonical_of(conv, otype.default) or raw
        if md and canonical not in terms:
            if otype.metadata_mode == "gene":
                syn = sorted(
                    set(_as_list(md.get("alias")) + _as_list(md.get("other_names")))
                )
                terms[canonical] = {
                    "name": md.get("name") or "",
                    "description": md.get("summary") or "",
                    "synonyms": syn,
                    "taxid": str(md["taxid"]) if md.get("taxid") is not None else "",
                    "symbol": md.get("SYMBOL") or "",
                    "xrefs": [],
                    "pmids": [],
                }
            else:
                terms[canonical] = {
                    "name": md.get("name") or "",
                    "description": md.get("description") or "",
                    "synonyms": _as_list(md.get("synonyms")),
                    "taxid": "",
                    "symbol": "",
                    "xrefs": _as_list(md.get("xrefs")),
                    "pmids": [str(p) for p in _as_list(md.get("pmids"))],
                }
    # multi-match failures were dropped from converted_ids by the
    # converter (disease/__init__.py:151-158) — their candidate lists
    # are not in the JSON. Reproduce the DECISION with two synthetic
    # default-ns candidates (never surfaced: multi-match rows keep only
    # the raw record). The committed goldens contain none; guard anyway.
    for i, f in enumerate(cr["failed_ids"]):
        if "Multiple results found" in f["reason"]:
            for j in (1, 2):
                edges.append(
                    {
                        "src_curie": f["id"],
                        "dst_curie": f"{otype.default}:__synthetic{i}_{j}",
                        "src_ns": f["id"].split(":", 1)[0],
                        "dst_ns": otype.default,
                        "label": otype.type,
                        "distance": 1,
                    }
                )
    term_rows = [
        {
            "ns": curie.split(":", 1)[0],
            "local_id": curie.split(":", 1)[1],
            "curie": curie,
            "label": otype.type,
            "normalized_name": "",
            "parent_curie": "",
            **md,
        }
        for curie, md in terms.items()
    ]
    return edges, term_rows


def _golden_rows(name: str) -> list[dict]:
    with open(os.path.join(GOLD, f"{name}_formatted.tsv")) as f:
        return list(csv.DictReader(f, delimiter="\t"))


def _pipeset(s: str | None) -> frozenset:
    return frozenset(p for p in (s or "").split("|") if p)


@pytest.fixture(scope="module", params=sorted(TYPES))
def golden_case(request, spark):
    from ontology_matcher_spark.operators.link_multi import link_mentions_multi
    from ontology_matcher_spark.schemas import ONTOLOGY_TERMS, XREF_EDGES
    from ontology_matcher_spark.sources.io import read_mentions

    name = request.param
    tname = TYPES[name]
    otype = ONTOLOGY_TYPES[tname]
    cr = _conversion_result(name)
    assert cr["strategy"] == "Mixture"
    edge_rows, term_rows = dictionary_from_golden(cr, otype)
    edges = spark.createDataFrame(edge_rows, XREF_EDGES)
    terms = spark.createDataFrame(term_rows, ONTOLOGY_TERMS)
    mentions = read_mentions(spark, os.path.join(EXAMPLES, f"{name}.tsv"))
    formatted, failed = link_mentions_multi(
        mentions, edges, terms, {tname: otype}, Strategy.MIXTURE
    )
    got = [r.asDict() for r in formatted.collect()]
    got_failed = [r.asDict() for r in failed.collect()]
    return name, otype, cr, _golden_rows(name), got, got_failed


def test_row_count_and_no_failures(golden_case):
    name, otype, cr, gold, got, got_failed = golden_case
    # MIXTURE rescues every failure → the goldens ship no .failed side
    assert got_failed == []
    assert len(got) == len(gold)


def _golden_mapping(gold: list[dict]) -> set:
    """Golden (id, raw_id) pairs, normalizing one snapshotted reference
    bug: metabolite_formatted.tsv row HMDB:HMDB0000010 has id == the
    LITERAL STRING "[]" — the converter returned an empty own-namespace
    list and the era's format loop str()'d it before the
    empty-list→raw_id normalization existed (current code,
    ontology_formatter.py:725-731, emits the raw id — as we do)."""
    out = set()
    for r in gold:
        rid = r["id"]
        raw = r.get("raw_id") or ""
        if rid == "[]" and raw:
            rid = raw
        out.add((rid, raw))
    return out


def test_mapping_precision_recall(golden_case):
    """(id, raw_id) mapping pairs vs the golden TSV — P/R ≥ 0.95
    (north rule: triple-set P/R vs the reference's emitted mappings)."""
    name, otype, cr, gold, got, _ = golden_case
    want = _golden_mapping(gold)
    have = {(r["id"], r["raw_id"]) for r in got}
    tp = len(want & have)
    precision = tp / len(have)
    recall = tp / len(want)
    assert precision >= 0.95, (precision, sorted(have - want)[:5])
    assert recall >= 0.95, (recall, sorted(want - have)[:5])


def test_xrefs_match_golden(golden_case):
    name, otype, cr, gold, got, _ = golden_case
    want = {(r["id"], r.get("raw_id") or ""): _pipeset(r.get("xrefs")) for r in gold}
    mismatches = []
    for r in got:
        key = (r["id"], r["raw_id"])
        if key in want and _pipeset(r["xrefs"]) != want[key]:
            mismatches.append((key, _pipeset(r["xrefs"]) ^ want[key]))
    assert len(mismatches) <= max(1, int(0.05 * len(gold))), mismatches[:5]


def test_metadata_columns(golden_case):
    name, otype, cr, gold, got, _ = golden_case
    by_key = {(r["id"], r.get("raw_id") or ""): r for r in gold}
    md_by_canonical = {}
    for conv in cr["converted_ids"]:
        c = _canonical_of(conv, otype.default)
        if c and conv.get("metadata"):
            md_by_canonical.setdefault(c, conv["metadata"])
    bad = []
    for r in got:
        key = (r["id"], r["raw_id"])
        g = by_key.get(key)
        if g is None:
            continue
        if otype.metadata_mode == "gene":
            # current-code expectations derived from the same metadata
            md = md_by_canonical.get(r["id"])
            if md and r["raw_id"]:
                exp_name = md.get("SYMBOL") or md.get("name") or g["name"]
                exp_desc = md.get("summary") or ""
                exp_tax = str(md["taxid"]) if md.get("taxid") is not None else ""
                if (r["name"], r["description"], r["taxid"]) != (
                    exp_name, exp_desc, exp_tax,
                ):
                    bad.append((key, "gene-md", r["name"], exp_name))
        else:
            if r["name"] != (g.get("name") or ""):
                bad.append((key, "name", r["name"], g.get("name")))
            if r["description"] != (g.get("description") or ""):
                bad.append((key, "desc", r["description"][:40], (g.get("description") or "")[:40]))
            if _pipeset(r["synonyms"]) != _pipeset(g.get("synonyms")):
                bad.append((key, "syn", _pipeset(r["synonyms"]) ^ _pipeset(g.get("synonyms"))))
            if _pipeset(r["pmids"]) != _pipeset(g.get("pmids")):
                bad.append((key, "pmids", _pipeset(r["pmids"]) ^ _pipeset(g.get("pmids"))))
        # resource: current code KEEPS the raw record's resource
        # (ontology_formatter.py:733-734 and :754-758, with the old
        # set-to-default line commented out in place); the goldens
        # predate that — converted rows carry the default namespace and
        # rescued rows the id's own prefix. Only count a mismatch where
        # the golden kept something other than those stale forms.
        g_res = g.get("resource") or ""
        stale_forms = {otype.default, r["id"].split(":", 1)[0]}
        if g_res not in stale_forms and r["resource"] != g_res:
            bad.append((key, "resource", r["resource"], g_res))
        if r["label"] != (g.get("label") or ""):
            bad.append((key, "label", r["label"], g.get("label")))
    assert len(bad) <= max(1, int(0.05 * len(gold))), bad[:8]
