"""Property-style routing fuzz: random namespace configs × random
candidate multiplicities, Spark `link_mentions` vs the pure-Python
oracle (oracle.py — the transcription of the reference's routing
rules). The curated pins (test_curated_routing) guard known edges;
this guards the LADDER'S INTERACTIONS — UNIQUE × multi-match ×
no-match × rescue × first-row-wins × metadata merge — over inputs
nobody curated. Seeded, fully deterministic."""

import random

import pytest

from ontology_matcher_spark import oracle
from ontology_matcher_spark.ontology_types import OntologyType, Strategy
from ontology_matcher_spark.plans.pipeline import link_mentions
from ontology_matcher_spark.schemas import (
    FAILED_COLUMNS,
    FORMATTED_COLUMNS,
    MENTIONS,
    ONTOLOGY_TERMS,
    XREF_EDGES,
)

NS_POOL = ["AAA", "BBB", "CCC", "DDD", "EEE", "FFF"]


def _gen_case(rng: random.Random, trial: int):
    """One random scenario: type config + terms + edges + mentions."""
    n_choices = rng.randint(2, 5)
    choices = tuple(rng.sample(NS_POOL, n_choices))
    default = rng.choice(choices)
    mode = rng.choice(["default", "gene"])
    otype = OntologyType(f"Fuzz{trial}", default, choices, mode)
    strategy = rng.choice([Strategy.MIXTURE, Strategy.UNIQUE])

    # default-namespace canonical terms, some with rich metadata
    terms = []
    for i in range(25):
        curie = f"{default}:{1000 + i}"
        has_md = rng.random() < 0.7
        terms.append(
            {
                "ns": default,
                "local_id": str(1000 + i),
                "curie": curie,
                "label": otype.type,
                "name": f"name {i}" if has_md else "",
                "normalized_name": f"name {i}",
                "synonyms": [f"syn{i}a", f"syn{i}b"][: rng.randint(0, 3)],
                "description": f"desc {i}" if rng.random() < 0.5 else "",
                "taxid": str(9606 + i % 3) if rng.random() < 0.5 else "",
                "symbol": f"SYM{i}" if rng.random() < 0.5 else "",
                "xrefs": [f"{c}:x{i}" for c in choices[: rng.randint(0, 2)]],
                "pmids": [str(100 + i)][: rng.randint(0, 2)],
                "parent_curie": "",
            }
        )

    # xref edges: per foreign id, a random number of default-ns
    # targets (0/1/many — the multiplicity axis) plus random edges
    # into OTHER choice namespaces and into namespaces outside the
    # config (must be ignored)
    edges = []
    foreign_ids = []
    non_default = [c for c in choices if c != default] or [default]
    for i in range(60):
        ns = rng.choice(non_default)
        fid = f"{ns}:{5000 + i}"
        foreign_ids.append(fid)
        for d in range(rng.choice([0, 0, 1, 1, 1, 2, 3])):
            dst = f"{default}:{1000 + rng.randrange(25)}"
            edges.append((fid, dst, ns, default, otype.type, 1))
        for _ in range(rng.choice([0, 0, 1, 2])):
            other = rng.choice(choices)
            dst = f"{other}:{7000 + rng.randrange(15)}"
            edges.append((fid, dst, ns, other, otype.type, 1))
        if rng.random() < 0.2:  # edge into an out-of-config namespace
            out_ns = rng.choice([n for n in NS_POOL if n not in choices] or ["ZZZ"])
            edges.append((fid, f"{out_ns}:1", ns, out_ns, otype.type, 1))
    # dedupe (multiplicity = DISTINCT targets in both implementations)
    edges = sorted(set(edges))

    mentions = []
    for i in range(90):
        kind = rng.random()
        if kind < 0.30:
            mid = rng.choice(foreign_ids)
        elif kind < 0.50:
            mid = f"{default}:{1000 + rng.randrange(30)}"  # some termless
        elif kind < 0.60:
            mid = f"ZZZ:{i}"  # unknown prefix
        elif kind < 0.70:
            mid = rng.choice(
                [f"{rng.choice(choices)}:bad id", f"{rng.choice(choices)}:",
                 "no-colon-id", f"{rng.choice(choices)}:sp/ace"]
            )
        elif kind < 0.80 and mentions:
            mid = rng.choice(mentions)["id"]  # duplicate → first-row-wins
        else:
            mid = rng.choice(foreign_ids)
        mentions.append(
            {
                "id": mid,
                "name": f"raw name {i}" if rng.random() < 0.8 else "",
                "label": otype.type,
                "resource": rng.choice(["resA", "resB", ""]),
                "description": f"raw desc {i}" if rng.random() < 0.4 else "",
                "synonyms": rng.choice(["", "rs1|rs2", "rs2", "rs1|rs1"]),
                "pmids": rng.choice(["", "11|22", "22"]),
                "taxid": rng.choice(["", "9606"]),
                "xrefs": rng.choice(["", f"{default}:9999", "QQQ:1|QQQ:2"]),
            }
        )
    return otype, strategy, terms, edges, mentions


@pytest.mark.parametrize("trial", range(6))
def test_routing_fuzz_vs_oracle(spark, trial):
    rng = random.Random(4000 + trial)
    otype, strategy, terms, edges, mentions = _gen_case(rng, trial)

    conv, failed = oracle.match(mentions, [
        {"src_curie": s, "dst_curie": d, "src_ns": sn, "dst_ns": dn}
        for (s, d, sn, dn, _l, _dist) in edges
    ], otype, strategy)
    exp_fmt, exp_failed = oracle.format_output(
        mentions, conv, failed, terms, otype, strategy
    )

    from pyspark.sql.types import LongType, StructField, StructType

    # StructType.add mutates in place — build a fresh schema copy
    mschema = StructType(list(MENTIONS.fields) + [StructField("idx", LongType())])
    mcols = [f.name for f in MENTIONS.fields]
    mdf = spark.createDataFrame(
        [tuple(m[c] for c in mcols) + (i,) for i, m in enumerate(mentions)],
        mschema,
    )
    edf = spark.createDataFrame(edges, XREF_EDGES)
    tdf = spark.createDataFrame(
        [tuple(t[f.name] for f in ONTOLOGY_TERMS.fields) for t in terms],
        ONTOLOGY_TERMS,
    )
    got_fmt, got_failed = link_mentions(mdf, edf, tdf, otype, strategy)

    def spark_rows(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    def oracle_rows(rows, cols):
        return sorted(tuple(r.get(c, "") or "" for r in [row] for c in cols)
                      for row in rows for r in [row])

    assert spark_rows(got_fmt, FORMATTED_COLUMNS) == oracle_rows(
        exp_fmt, FORMATTED_COLUMNS
    ), f"formatted mismatch: {otype} {strategy}"
    assert spark_rows(got_failed, FAILED_COLUMNS) == oracle_rows(
        exp_failed, FAILED_COLUMNS
    ), f"failed mismatch: {otype} {strategy}"
