"""Deterministic fixture generator (FIXTURES.md).

Synthesises the four input tables of the pipeline — ontology terms,
xref edges, entity mentions, interleaved documents — from seeded
latent entity clusters. No external data; contents model the schemas
and edge cases of /root/reference/examples/*.tsv and the unit-test id
lists (/root/reference/tests/ontology/test_disease.py:14-25,
test_gene.py:14-23).

Dictionary semantics (uniform across entity types, OxO-style — see
SURVEY.md §2.1 S4): a mention id has candidates iff it appears as
``src_curie`` in ``xref_edges`` (distance-1 neighbours only); term
metadata is keyed by curie. The reference's MGI double-prefix and
CHEBI keep-prefix quirks (apis.py:322-326, :489-493) are API-wire
artifacts with no analog in a dictionary join; curies here are always
single-prefix ``NS:local``.

Everything is generated as plain-Python lists of dicts so the pure
Python oracle (`ontology_matcher_spark.oracle`) can run without Spark;
`write_parquet` persists via pyarrow for Spark/DuckDB consumption.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from ontology_matcher_spark.ontology_types import ONTOLOGY_TYPES, OntologyType

_SYLLABLES = ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
              "pa", "qi", "ro", "su", "ti", "vo", "wa", "xe", "yo", "zu"]

RESOURCES = ["CTD", "DrugBank", "HMDB", "MeSH", "BioPortal"]


def _word(rng: random.Random, n_syll: int = 3) -> str:
    return "".join(rng.choice(_SYLLABLES) for _ in range(n_syll))


@dataclass
class Cluster:
    """One latent entity: members across namespaces + surface forms."""

    key: str
    label: str
    name: str
    default_members: list[str]
    other_members: dict[str, list[str]]  # ns -> curies
    synonyms: list[str]
    chain: bool = False  # edges form a path, not a clique
    hub: bool = False    # hot entity (skew test)

    @property
    def members(self) -> list[str]:
        out = list(self.default_members)
        for curies in self.other_members.values():
            out.extend(curies)
        return out


@dataclass
class FixtureBundle:
    terms: list[dict] = field(default_factory=list)
    xref_edges: list[dict] = field(default_factory=list)
    mentions: list[dict] = field(default_factory=list)
    documents: list[dict] = field(default_factory=list)
    clusters: dict[str, list[Cluster]] = field(default_factory=dict)


def _normalize(name: str) -> str:
    """Lowercase + strip punctuation — the dictionary-match key."""
    return "".join(ch for ch in name.lower() if ch.isalnum() or ch == " ").strip()


#: per-type local-id offsets keep curies disjoint across entity types —
#: shared namespaces (MESH/UMLS/CHEBI) must not alias between types.
_TYPE_OFFSET = {"Disease": 0, "Gene": 1, "Compound": 2, "Metabolite": 3, "Symptom": 4}


def _make_clusters(otype: OntologyType, n: int, seed: int) -> list[Cluster]:
    rng = random.Random(f"{seed}:{otype.type}:clusters")
    clusters: list[Cluster] = []
    local_counter = 1000 + 1_000_000 * _TYPE_OFFSET[otype.type]
    for k in range(n):
        name = f"{_word(rng)} {_word(rng, 2)}"
        # deliberately ambiguous normalized names: pairs of disjoint
        # clusters sharing a name (must NOT merge in CC)
        if k % 31 == 14 and clusters:
            name = clusters[-1].name
        n_default = 1
        if k % 17 == 3:
            n_default = 0   # no default mapping → id=None path
        elif k % 23 == 5:
            n_default = 2   # default multi-match → failed
        default_members = []
        for _ in range(n_default):
            local_counter += rng.randint(1, 9)
            default_members.append(f"{otype.default}:{local_counter}")
        other: dict[str, list[str]] = {}
        n_other_ns = rng.randint(1, min(4, len(otype.non_default)))
        for ns in rng.sample(list(otype.non_default), n_other_ns):
            cnt = 2 if (k % 13 == 7 and not other) else 1
            ids = []
            for _ in range(cnt):
                local_counter += rng.randint(1, 9)
                ids.append(f"{ns}:{local_counter}")
            other[ns] = ids
        syns = sorted({f"{name} {_word(rng, 2)}" for _ in range(rng.randint(1, 4))})
        clusters.append(
            Cluster(
                key=f"{otype.type}-{k}",
                label=otype.type,
                name=name,
                default_members=default_members,
                other_members=other,
                synonyms=syns,
                chain=(k % 29 == 11),
                hub=(k == 0),
            )
        )
    # hub cluster: fan out ~30 extra members (hot key / skew test);
    # local ids carry the type offset so hubs never alias across types
    hub = clusters[0]
    off = 9_000_000 + 1_000_000 * _TYPE_OFFSET[otype.type]
    for i in range(30):
        ns = list(otype.non_default)[i % len(otype.non_default)]
        hub.other_members.setdefault(ns, []).append(f"{ns}:{off + i}")
    return clusters


def _emit_terms_edges(bundle: FixtureBundle, otype: OntologyType, seed: int) -> None:
    rng = random.Random(f"{seed}:{otype.type}:terms")
    clusters = bundle.clusters[otype.type]
    prev_default: str | None = None
    for ci, c in enumerate(clusters):
        members = c.members
        # gene-mode metadata (SURVEY.md §2.7 gene overrides): a SYMBOL
        # per cluster (empty every 7th → exercises the raw-name
        # fallback), summary-style description that is empty every 5th
        # (exercises the NO-raw-fallback rule), cluster-level taxid
        symbol = ""
        if otype.metadata_mode == "gene" and ci % 7 != 2:
            symbol = (c.name.split()[0][:4] + str(ci)).upper()
        desc = f"{c.label} entity {c.name} ({c.key})"
        if otype.metadata_mode == "gene" and ci % 5 == 1:
            desc = ""
        # MyDisease-style metadata xrefs on the default head: ids in
        # EXTERNAL namespaces (ORDO/EXT — outside every type's choices,
        # like the reference's ORDO:94065) that flow into output xrefs
        md_xrefs_head = (
            [f"ORDO:{9_990_000 + ci}", f"EXT:{otype.type[:3]}{ci}"]
            if otype.metadata_mode == "default" and ci % 4 == 0
            else []
        )
        # MyChem/HMDB-style metadata pmids (merged into output pmids)
        md_pmids_head = (
            [str(7_000_000 + ci), str(7_100_000 + ci)]
            if otype.metadata_mode == "default" and ci % 6 == 2
            else []
        )
        # term rows: one per member curie
        for m in members:
            ns, local = m.split(":", 1)
            is_default_head = bool(c.default_members) and m == c.default_members[0]
            parent = ""
            if is_default_head and prev_default and ci % 3 != 0:
                parent = prev_default  # shallow is-a forest inside default ns
            bundle.terms.append(
                {
                    "ns": ns,
                    "local_id": local,
                    "curie": m,
                    "label": c.label,
                    "name": c.name,
                    "normalized_name": _normalize(c.name),
                    "synonyms": c.synonyms,
                    "description": desc,
                    "taxid": ("9606" if ci % 2 == 0 else "10090") if otype.type == "Gene" else "",
                    "symbol": symbol,
                    "xrefs": md_xrefs_head if is_default_head else [],
                    "pmids": md_pmids_head if is_default_head else [],
                    "parent_curie": parent,
                }
            )
        if c.default_members:
            prev_default = c.default_members[0]
        # xref edges: clique (both directions) or chain
        if c.chain and len(members) >= 3:
            pairs = [(members[i], members[i + 1]) for i in range(len(members) - 1)]
            pairs += [(b, a) for a, b in pairs]
        else:
            pairs = [(a, b) for a in members for b in members if a != b]
        for a, b in pairs:
            bundle.xref_edges.append(
                {
                    "src_curie": a,
                    "dst_curie": b,
                    "src_ns": a.split(":", 1)[0],
                    "dst_ns": b.split(":", 1)[0],
                    "label": c.label,
                    "distance": 1,
                }
            )


def _emit_mentions(bundle: FixtureBundle, otype: OntologyType, n_rows: int, seed: int) -> None:
    rng = random.Random(f"{seed}:{otype.type}:mentions")
    clusters = bundle.clusters[otype.type]

    def row(curie: str, c: Cluster | None, name: str | None = None) -> dict:
        syns = rng.sample(c.synonyms, min(len(c.synonyms), rng.randint(0, 2))) if c else []
        return {
            "id": curie,
            "name": name or (c.name if c else _word(rng)),
            "label": otype.type,
            "resource": rng.choice(RESOURCES),
            "description": f"input description for {curie}" if rng.random() < 0.4 else "",
            "synonyms": "|".join(syns),
            "pmids": "|".join(str(rng.randint(10000, 99999)) for _ in range(rng.randint(0, 2))),
            "taxid": ("9606" if rng.random() < 0.7 else "10090") if otype.type == "Gene" else "",
            "xrefs": "|".join(rng.sample(c.members, 1)) if c and rng.random() < 0.3 else "",
        }

    rows: list[dict] = []
    for i in range(n_rows):
        c = clusters[rng.randrange(len(clusters))]
        members = c.members
        if not members:
            continue
        rows.append(row(rng.choice(members), c))
    # guaranteed edge cases (FIXTURES.md §2):
    anchor = next(c for c in clusters if len(c.default_members) == 1 and c.other_members)
    multi = next(c for c in clusters if len(c.default_members) == 2)
    nodefault = next(c for c in clusters if not c.default_members)
    some_other_ns = next(iter(anchor.other_members))
    rows.append(row(anchor.default_members[0], anchor))                 # plain default-ns id
    rows.append(row(anchor.other_members[some_other_ns][0], anchor))    # non-default, unique default
    rows.append(row(next(iter(multi.other_members.values()))[0], multi))  # multi default → failed
    rows.append(row(next(iter(nodefault.other_members.values()))[0], nodefault))  # id=None path
    rows.append(row(f"{otype.default}:notexist", None))                 # no mapping, default ns → rescued
    rows.append(row(f"{otype.non_default[0]}:notexist", None))          # no mapping, non-default
    rows.append(row("BOGUSNS:123", None))                               # invalid prefix
    rows.append(row(f"BAD ID {otype.type}", None))                      # invalid format
    dup = row(anchor.default_members[0], anchor, name=anchor.name + " dup")
    rows.append(dup)                                                    # duplicate raw id (first wins)
    bundle.mentions.extend(rows)


_TEMPLATES = [
    "Patients with {m} showed marked improvement in the trial.",
    "We observed that {m} was strongly associated with the phenotype.",
    "Expression of {m} is elevated in affected tissue samples.",
    "The study cohort excluded cases of {m} at baseline.",
    "Treatment targeting {m} reduced symptoms significantly.",
]


def _emit_documents(bundle: FixtureBundle, n_docs: int, seed: int) -> None:
    rng = random.Random(f"{seed}:documents")
    all_clusters = [c for cl in bundle.clusters.values() for c in cl]
    hubs = [c for c in all_clusters if c.hub]
    media_kinds = ["image", "audio", "table"]
    for d in range(n_docs):
        n_spans = rng.randint(2, 9)
        spans = []
        offset = 0
        for s in range(n_spans):
            if rng.random() < 0.7:
                # ~5% of mentions are hot-key entities (skew test)
                c = rng.choice(hubs) if rng.random() < 0.05 else rng.choice(all_clusters)
                surface_pool = [c.name] + c.synonyms + (c.members[:1] if c.members else [])
                n_ment = rng.randint(0, 3)
                text = rng.choice(_TEMPLATES).format(
                    m=" and ".join(rng.choice(surface_pool) for _ in range(max(1, n_ment)))
                ) if n_ment else "No relevant entities appear in this sentence."
                spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
            else:
                kind = rng.choice(media_kinds)
                spans.append(
                    {
                        "kind": kind,
                        "text": "",
                        "media_ref": f"media://{kind}/{d}/{s}",
                        "offset": offset,
                    }
                )
            offset += rng.randint(20, 200)
        bundle.documents.append({"doc_id": f"doc-{d:08d}", "spans": spans})


def _emit_fuzzy_probes(bundle: FixtureBundle, n_docs: int, seed: int) -> None:
    """ADDITIVE fuzzy-tier probes (round 5): the base corpus has only
    two-token cluster names, so the detector's fuzzy tier (SymSpell
    d=1 over SINGLE-token names ≥ 5 chars) could never fire — its
    DuckDB gate matched vacuously at 0 rows. This appends (a) a small
    set of single-token-name terms in a disjoint curie range and (b)
    text-only probe docs whose tokens are seeded edit-distance-1 typos
    (or exact occurrences) of those names. Everything uses a SEPARATE
    rng stream and only APPENDS to terms/documents, so every
    previously generated table row stays byte-identical — mention
    linking, CC, and the kg_e2e bench headline are untouched."""
    rng = random.Random(f"{seed}:fuzzy-probes")
    alphabet = "abcdefghiklmnopqrstuvwxyz"
    n_terms = max(6, n_docs // 250)
    names: list[str] = []
    seen: set[str] = set()
    local = 80_000_000  # disjoint from cluster (<14M) id ranges
    while len(names) < n_terms:
        name = _word(rng, 4)  # 8 chars, single token
        if name in seen:
            continue
        seen.add(name)
        names.append(name)
        local += rng.randint(1, 9)
        bundle.terms.append(
            {
                "ns": "MONDO",
                "local_id": str(local),
                "curie": f"MONDO:{local}",
                "label": "Disease",
                "name": name,
                "normalized_name": _normalize(name),
                "synonyms": [],
                "description": f"fuzzy probe entity {name}",
                "taxid": "",
                "symbol": "",
                "xrefs": [],
                "pmids": [],
                "parent_curie": "",
            }
        )

    def typo(tok: str) -> str:
        i = rng.randrange(len(tok))
        op = rng.randrange(3)
        if op == 0:  # delete
            return tok[:i] + tok[i + 1 :]
        if op == 1:  # substitute
            return tok[:i] + rng.choice(alphabet) + tok[i + 1 :]
        return tok[:i] + rng.choice(alphabet) + tok[i:]  # insert

    n_probe_docs = max(16, n_docs // 50)
    for d in range(n_probe_docs):
        spans = []
        offset = 0
        for _ in range(rng.randint(1, 3)):
            tok = rng.choice(names)
            m = typo(tok) if rng.random() < 0.7 else tok
            spans.append(
                {
                    "kind": "text",
                    "text": rng.choice(_TEMPLATES).format(m=m),
                    "media_ref": "",
                    "offset": offset,
                }
            )
            offset += rng.randint(20, 200)
        bundle.documents.append(
            {"doc_id": f"doc-fz-{d:06d}", "spans": spans}
        )


def generate(
    seed: int = 42,
    clusters_per_type: int = 120,
    mentions_per_type: int = 60,
    n_docs: int = 2000,
    types: list[str] | None = None,
) -> FixtureBundle:
    bundle = FixtureBundle()
    for tname in types or list(ONTOLOGY_TYPES):
        otype = ONTOLOGY_TYPES[tname]
        bundle.clusters[tname] = _make_clusters(otype, clusters_per_type, seed)
        _emit_terms_edges(bundle, otype, seed)
        _emit_mentions(bundle, otype, mentions_per_type, seed)
    _emit_documents(bundle, n_docs, seed)
    _emit_fuzzy_probes(bundle, n_docs, seed)
    return bundle


def write_parquet(bundle: FixtureBundle, outdir: str) -> None:
    """Persist fixtures via pyarrow (consumable by Spark AND DuckDB)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(outdir, exist_ok=True)
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    tables = {
        "ontology_terms": pa.Table.from_pylist(
            bundle.terms,
            schema=pa.schema(
                [("ns", pa.string()), ("local_id", pa.string()), ("curie", pa.string()),
                 ("label", pa.string()), ("name", pa.string()),
                 ("normalized_name", pa.string()), ("synonyms", pa.list_(pa.string())),
                 ("description", pa.string()), ("taxid", pa.string()),
                 ("symbol", pa.string()), ("xrefs", pa.list_(pa.string())),
                 ("pmids", pa.list_(pa.string())),
                 ("parent_curie", pa.string())]
            ),
        ),
        "xref_edges": pa.Table.from_pylist(
            bundle.xref_edges,
            schema=pa.schema(
                [("src_curie", pa.string()), ("dst_curie", pa.string()),
                 ("src_ns", pa.string()), ("dst_ns", pa.string()),
                 ("label", pa.string()), ("distance", pa.int32())]
            ),
        ),
        "mentions": pa.Table.from_pylist(
            [{**m, "idx": i} for i, m in enumerate(bundle.mentions)],
            schema=pa.schema(
                [("id", pa.string()), ("name", pa.string()), ("label", pa.string()),
                 ("resource", pa.string()), ("description", pa.string()),
                 ("synonyms", pa.string()), ("pmids", pa.string()),
                 ("taxid", pa.string()), ("xrefs", pa.string()),
                 ("idx", pa.int64())]  # explicit row index → order-independent
            ),
        ),
        "documents": pa.Table.from_pylist(
            bundle.documents,
            schema=pa.schema([("doc_id", pa.string()), ("spans", pa.list_(span_t))]),
        ),
    }
    for name, table in tables.items():
        pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
