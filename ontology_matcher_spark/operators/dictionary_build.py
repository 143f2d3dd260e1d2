"""Dictionary construction from RAW API-shaped documents
(SURVEY.md §2.4 A5-A7, §2.7).

The reference builds its lookup data per batch from remote JSON APIs:
multiple hit-docs per queried id are folded with a recursive deep
merge (`_update_dict`, /root/reference/ontology_matcher/apis.py:729-749;
multi-doc fold at apis.py:781-837), and raw xref payloads are
normalized into canonical CURIEs per source key
(`MyDisease.format_xrefs`, apis.py:901-943 — ordo/orphanet→Orphanet,
umls/umls_cui→UMLS, icd9/icd9cm→ICD-9, icd10/icd10cm→ICD10CM,
mesh→MESH, omim→OMIM, hp→HP with an idempotent already-prefixed
guard, doid passed through already-prefixed). Namespace prefixes are
matched case-insensitively (MeSH:D015161 ⇒ MESH:D015161 — the
converter's re.IGNORECASE at disease/__init__.py:136-144) and OLS4
short_forms use ``_`` where CURIEs use ``:``
(MONDO_0013256 ⇒ MONDO:0013256).

Spark-first layout:
- the deep merge is genuinely recursive over arbitrary nested JSON —
  the one shape DataFrame expressions can't express — so it runs as an
  Arrow-batched ``applyInPandas`` grouped by query id (groups are the
  per-id hit lists: tiny and uniform; the shuffle key is the query id);
- xref normalization and CURIE canonicalization are pure column
  expressions (codegen'd) applied at dictionary-build time, once per
  term — NOT in the per-mention hot path.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ontology_matcher_spark.ontology_types import ALL_NAMESPACES

# ---------------------------------------------------------------- A5/A6
def concat_lists(a: Iterable, b: Iterable) -> list:
    """Order-preserving set-union (ref concat, of.py:555-568)."""
    out, seen = [], set()
    for v in list(a or []) + list(b or []):
        k = json.dumps(v, sort_keys=True) if isinstance(v, (dict, list)) else v
        if k not in seen:
            seen.add(k)
            out.append(v)
    return out


def update_dict(x: dict, y: dict) -> dict:
    """Recursive deep merge — transcription of the reference's
    `_update_dict` rules (apis.py:729-749): lists set-merge, dicts
    recurse, scalars take the NEW value, missing keys copy over."""
    for key, value in y.items():
        if key in x:
            if isinstance(value, list):
                x_value = x.get(key, [])
                x[key] = concat_lists(
                    x_value if isinstance(x_value, list) else [x_value], value
                )
            elif isinstance(value, dict):
                x_value = x.get(key, {})
                if not isinstance(x_value, dict):
                    x_value = {}
                x[key] = update_dict(x_value, value)
            else:
                x[key] = value
        else:
            x[key] = value
    return x


_MERGED_SCHEMA = StructType(
    [StructField("query", StringType()), StructField("doc", StringType())]
)


def merge_api_docs(
    docs: DataFrame, key_col: str = "query", doc_col: str = "doc"
) -> DataFrame:
    """(query, doc-json) with several hit-docs per query → one merged
    doc-json per query, folded in ``idx``-order when present (the
    reference folds response docs in arrival order, apis.py:781-837).

    applyInPandas grouped by the query id: the merge is recursive over
    arbitrary nesting — Catalyst can't express it — and each group is
    the handful of API hits for one id, so the grouped shuffle is
    uniform by construction."""
    order_col = "idx" if "idx" in docs.columns else None

    def fold(pdf):
        import pandas as pd

        if order_col:
            pdf = pdf.sort_values(order_col)
        out = []
        for q, grp in pdf.groupby(key_col, sort=True):
            merged: dict = {}
            for raw in grp[doc_col]:
                if not raw:
                    continue
                try:
                    d = json.loads(raw)
                except (TypeError, ValueError):
                    continue
                if isinstance(d, dict):
                    merged = update_dict(merged, d)
            out.append((q, json.dumps(merged, sort_keys=True)))
        return pd.DataFrame(out, columns=["query", "doc"])

    return docs.groupBy(key_col).applyInPandas(fold, _MERGED_SCHEMA)


# ------------------------------------------------------------------- A7
#: raw xref source key → (canonical namespace, already_prefixed)
#: — MyDisease.format_xrefs' per-key rules (apis.py:901-943)
XREF_SOURCE_KEYS: dict[str, tuple[str, bool]] = {
    "doid": ("DOID", True),
    "mesh": ("MESH", False),
    "orphanet": ("Orphanet", False),
    "ordo": ("Orphanet", False),
    "umls": ("UMLS", False),
    "umls_cui": ("UMLS", False),
    "icd9": ("ICD-9", False),
    "icd9cm": ("ICD-9", False),
    "icd10": ("ICD10CM", False),
    "icd10cm": ("ICD10CM", False),
    "hp": ("HP", True),  # idempotent guard: prefix only when absent
    "omim": ("OMIM", False),
}


def format_xrefs(xrefs_map: Column) -> Column:
    """map<source-key, array<string>> of raw xref payloads → one
    deduped array of canonical CURIEs, per the reference's per-key
    attach rules. Pure column expressions (runs once per term at
    dictionary-build time)."""
    # closure factories, NOT default-arg lambdas: F.transform counts
    # lambda parameters, so `lambda x, ns=ns:` binds the element INDEX
    # to ns (a Column) and breaks at plan build
    def _guarded(ns: str):
        return lambda x: F.when(
            F.upper(x).startswith(ns.upper() + ":"), x
        ).otherwise(F.concat(F.lit(ns + ":"), x))

    def _prefixed(ns: str):
        return lambda x: F.concat(F.lit(ns + ":"), x)

    parts: list[Column] = []
    for key, (ns, already_prefixed) in XREF_SOURCE_KEYS.items():
        vals = F.coalesce(
            F.element_at(xrefs_map, F.lit(key)),
            F.array().cast("array<string>"),
        )
        attach = F.transform(
            vals, _guarded(ns) if already_prefixed else _prefixed(ns)
        )
        parts.append(attach)
    return F.array_distinct(F.array_remove(F.concat(*parts), ""))


def normalize_curie(
    c: Column, namespaces: tuple[str, ...] = ALL_NAMESPACES
) -> Column:
    """Canonicalize a raw identifier string:

    - OLS4 short_form separator: ``MONDO_0013256`` → ``MONDO:0013256``
      (first ``_`` becomes ``:`` when no ``:`` is present);
    - namespace prefix matched CASE-INSENSITIVELY against the accepted
      namespaces and rewritten to the canonical spelling
      (``MeSH:D015161`` → ``MESH:D015161`` — P4, the converter's
      re.IGNORECASE match at disease/__init__.py:136-144);
    - unknown prefixes pass through unchanged."""
    _MAXLEN = F.lit(2_147_483_647)
    us_prefix = F.substring_index(c, "_", 1)
    us_rest = F.substring(c, F.length(us_prefix) + 2, _MAXLEN)
    c = F.when(
        ~c.contains(":") & c.contains("_"),
        F.concat(us_prefix, F.lit(":"), us_rest),
    ).otherwise(c)
    prefix = F.substring_index(c, ":", 1)
    local = F.substring(c, F.length(prefix) + 2, _MAXLEN)
    canonical = None
    for ns in namespaces:
        cond = F.upper(prefix) == ns.upper()
        branch = F.when(cond, F.concat(F.lit(ns + ":"), local))
        canonical = branch if canonical is None else canonical.when(
            cond, F.concat(F.lit(ns + ":"), local)
        )
    return F.when(c.contains(":"), F.coalesce(canonical, c)).otherwise(c)


def build_term_table(
    parsed_docs: DataFrame,
    label: str,
) -> DataFrame:
    """Parsed merged docs → (ONTOLOGY_TERMS-shaped rows, XREF_EDGES
    rows derivable by exploding ``xrefs``).

    Input columns: curie, name, description, synonyms:array<string>,
    xrefs:map<string,array<string>> (raw API keys). The curie and all
    xref targets are namespace-normalized; the xref map is flattened
    through `format_xrefs`."""
    curie = normalize_curie(F.col("curie"))
    return parsed_docs.select(
        F.substring_index(curie, ":", 1).alias("ns"),
        F.substring_index(curie, ":", -1).alias("local_id"),
        curie.alias("curie"),
        F.lit(label).alias("label"),
        F.coalesce(F.col("name"), F.lit("")).alias("name"),
        F.lower(F.coalesce(F.col("name"), F.lit(""))).alias("normalized_name"),
        F.coalesce(F.col("synonyms"), F.array().cast("array<string>")).alias(
            "synonyms"
        ),
        F.coalesce(F.col("description"), F.lit("")).alias("description"),
        F.lit("").alias("taxid"),
        F.lit("").alias("symbol"),
        # single-param lambda: F.transform counts parameters, and
        # normalize_curie's namespaces default would bind the index
        F.transform(
            format_xrefs(F.col("xrefs")), lambda x: normalize_curie(x)
        ).alias("xrefs"),
        F.array().cast("array<string>").alias("pmids"),
        F.lit("").alias("parent_curie"),
    )


# ----------------------------------------- detection-dictionary artifact
def normalize_surface(c: Column) -> Column:
    """Spark twin of ``mention_detect.normalize_text`` (lowercase,
    non-alnum runs → single space, trim) — MUST stay in lockstep: the
    artifact build normalizes surfaces JVM-side, the detector
    normalizes document text Python-side, and the two must agree
    byte-for-byte for the token index to hit."""
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def detection_surfaces(terms: DataFrame) -> DataFrame:
    """(surface, curie, match_type) rows — the distributed form of the
    driver-side ``surface_map`` build: term names at rank 'name',
    synonyms (normalized ≠ the name's normalization) at 'synonym'."""
    name_n = normalize_surface(F.col("name")).alias("surface")
    names = terms.select(name_n, "curie").where(
        F.col("surface") != ""
    ).withColumn("match_type", F.lit("name"))
    syns = (
        terms.select(
            normalize_surface(F.col("name")).alias("__n"),
            "curie",
            F.explode(F.coalesce("synonyms", F.array().cast("array<string>"))).alias("__s"),
        )
        .select(normalize_surface(F.col("__s")).alias("surface"), "curie", "__n")
        .where((F.col("surface") != "") & (F.col("surface") != F.col("__n")))
        .select("surface", "curie", F.lit("synonym").alias("match_type"))
    )
    return names.unionByName(syns).distinct()


def detection_xref_map(terms: DataFrame, xref_edges: DataFrame) -> DataFrame:
    """(src_curie, dst_curie) rows for the detector's rank-1 tier: a
    literal CURIE that is NOT itself a term but is a known xref of one
    resolves through the edge; deterministic min-dst pick per src."""
    curies = terms.select("curie").distinct()
    e = xref_edges.select("src_curie", "dst_curie")
    e = e.join(
        curies.withColumnRenamed("curie", "src_curie"), "src_curie", "left_anti"
    )
    e = e.join(
        curies.withColumnRenamed("curie", "dst_curie"), "dst_curie", "left_semi"
    )
    return e.groupBy("src_curie").agg(F.min("dst_curie").alias("dst_curie"))


def detection_fuzzy_index(surfaces: DataFrame, min_len: int = 5) -> DataFrame:
    """(variant, surface) rows of the SymSpell deletion neighbourhood
    over single-token NAME surfaces — the ~|surface|×len index the
    round-2 verdict required moving off the driver. Built by one
    codegen'd explode; never collected."""
    base = (
        surfaces.where(
            (F.col("match_type") == "name")
            & (~F.col("surface").contains(" "))
            & (F.length("surface") >= min_len)
        )
        .select("surface")
        .distinct()
    )
    variants = F.expr(
        "array_union(transform(sequence(1, length(surface)), i -> "
        "concat(substring(surface, 1, i-1), substring(surface, i+1, 1000000))), "
        "array(surface))"
    )
    return base.select(
        F.explode(variants).alias("variant"), "surface"
    ).distinct()


def detection_input_fingerprint(
    terms: DataFrame,
    xref_edges: DataFrame | None = None,
    extra_term_rows: list[dict] | None = None,
) -> str:
    """Order-insensitive fingerprint of the artifact's DICTIONARY
    INPUT (term rows + xref edges + ad-hoc extras): row count plus a
    bit_xor of per-row xxhash64 — one cheap map-side-combinable agg
    per table, no collect. `write_detection_artifact` stamps this into
    ``<path>/_FINGERPRINT`` so reuse checks key the artifact by what
    it was built FROM, not merely by its output path: a pre-existing
    artifact built from different dictionary contents must be rebuilt,
    not silently served (the round-3 bench corpus v2→v3 bump exposed
    exactly that staleness)."""
    t = terms.select("curie", "name", "synonyms")
    tagg = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(
                F.xxhash64(
                    "curie", "name", F.concat_ws("\x1f", F.col("synonyms"))
                )
            ),
            F.lit(0),
        ).alias("h"),
    )
    if xref_edges is None:
        trow = tagg.first()
        parts = [f"t:{trow['n']}:{trow['h']}", "x:none"]
    else:
        # ONE action for both tables (crossJoin of two 1-row aggs):
        # this fingerprint is on the artifact REUSE-check path, so its
        # serial job latency is paid by every detection run
        xagg = xref_edges.agg(
            F.count(F.lit(1)).alias("xn"),
            F.coalesce(
                F.bit_xor(F.xxhash64("src_curie", "dst_curie")), F.lit(0)
            ).alias("xh"),
        )
        row = tagg.crossJoin(xagg).first()
        parts = [f"t:{row['n']}:{row['h']}", f"x:{row['xn']}:{row['xh']}"]
    if extra_term_rows:
        import hashlib

        blob = "\x1e".join(
            f"{r['curie']}\x1f{r.get('name') or ''}\x1f"
            + "\x1f".join(sorted(r.get("synonyms") or []))
            for r in sorted(extra_term_rows, key=lambda r: r["curie"])
        )
        parts.append(f"e:{hashlib.sha256(blob.encode()).hexdigest()[:16]}")
    else:
        parts.append("e:none")
    return ";".join(parts)


def write_detection_artifact(
    terms: DataFrame,
    path: str,
    xref_edges: DataFrame | None = None,
    extra_term_rows: list[dict] | None = None,
) -> str:
    """Distributed build of the detection-dictionary artifact: four
    parquet tables (surfaces / curies / xrefs / fuzzy) under ``path``,
    loaded lazily PER EXECUTOR by
    ``mention_detect.load_detection_artifact``. Nothing is ever
    collected to the driver — this replaces the round-2
    ``terms.collect()``/``edges.collect()`` bottleneck (the reference
    gene corpus alone is 589,823 terms, README.md:99; measured
    assembly bound documented in load_detection_artifact).

    On a cluster ``path`` must be shared storage (HDFS/S3) so every
    executor can read it — the same contract as Spark's own reliable
    checkpoint. ``extra_term_rows`` (curie/name/synonyms dicts) lets a
    caller add ad-hoc vocabulary without a second source table."""
    from concurrent.futures import ThreadPoolExecutor

    spark = terms.sparkSession
    t = terms.select("curie", "name", "synonyms")
    if extra_term_rows:
        extra = spark.createDataFrame(
            [
                (r["curie"], r.get("name") or "", list(r.get("synonyms") or []))
                for r in extra_term_rows
            ],
            "curie string, name string, synonyms array<string>",
        )
        t = t.unionByName(extra)
    surfaces = detection_surfaces(t)
    # the fuzzy index only consumes NAME surfaces, which derive from t
    # without the synonym explode — so it does NOT have to wait for the
    # surfaces write (round-5 chained fuzzy after surfaces; same rows)
    name_surfaces = (
        t.select(normalize_surface(F.col("name")).alias("surface"))
        .where(F.col("surface") != "")
        .withColumn("curie", F.lit(""))
        .withColumn("match_type", F.lit("name"))
    )
    xr = (
        detection_xref_map(t, xref_edges)
        if xref_edges is not None
        else spark.createDataFrame([], "src_curie string, dst_curie string")
    )

    # the four sub-table writes and the fingerprint aggregation are
    # independent jobs — submit them concurrently so the tail of one
    # back-fills the cores the others leave idle (guide-standard
    # overlap of independent actions; job descriptions are
    # thread-local, so each job stays labelled)
    jobs = {
        "surfaces": lambda: surfaces.write.mode("overwrite").parquet(
            f"{path}/surfaces"
        ),
        "curies": lambda: t.select("curie")
        .distinct()
        .write.mode("overwrite")
        .parquet(f"{path}/curies"),
        "xrefs": lambda: xr.write.mode("overwrite").parquet(f"{path}/xrefs"),
        "fuzzy": lambda: detection_fuzzy_index(name_surfaces)
        .write.mode("overwrite")
        .parquet(f"{path}/fuzzy"),
        "fingerprint": lambda: detection_input_fingerprint(
            terms, xref_edges, extra_term_rows
        ),
    }
    with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
        futures = {name: pool.submit(fn) for name, fn in jobs.items()}
        results = {name: f.result() for name, f in futures.items()}
    # stamp the input fingerprint LAST: its presence implies a complete
    # build from exactly these inputs (reuse checks compare it before
    # skipping a rebuild — see pipeline.detected_mentions_df)
    from ontology_matcher_spark.functions.fs import fs_write_text

    fs_write_text(spark, f"{path}/_FINGERPRINT", results["fingerprint"])
    return path


def edges_from_terms(terms: DataFrame) -> DataFrame:
    """Term table → XREF_EDGES rows (curie → each normalized xref,
    both directions, distance 1 — mirroring the OxO distance-1
    neighbourhood the linker consumes)."""
    fwd = terms.select(
        F.col("curie").alias("src_curie"),
        F.explode("xrefs").alias("dst_curie"),
        "label",
    )
    both = fwd.unionByName(
        fwd.select(
            F.col("dst_curie").alias("src_curie"),
            F.col("src_curie").alias("dst_curie"),
            "label",
        )
    )
    return both.where(F.col("src_curie") != F.col("dst_curie")).select(
        "src_curie",
        "dst_curie",
        F.substring_index("src_curie", ":", 1).alias("src_ns"),
        F.substring_index("dst_curie", ":", 1).alias("dst_ns"),
        "label",
        F.lit(1).alias("distance"),
    ).distinct()
