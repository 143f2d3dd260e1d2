"""Single-pass multi-type linking.

`link_mentions` (candidates.py + format_stage.py) runs one plan per
entity type — faithful to the reference's one-file-per-type CLI, but
five plans mean five scans of the mention table, five codegen
compiles, and five job submissions. At 10^12 documents the mention
table is the big input; it must be scanned ONCE.

This operator links a mixed-label mention table in one dataflow:
- one broadcast join against the xref dictionary (dst_ns limited to
  the union of all types' namespaces),
- one aggregation building per-namespace candidate arrays (union of
  namespaces across types; a namespace column is only consulted for
  labels whose type accepts it),
- label-conditional routing / canonical / alias expressions (when
  ladders over the handful of types — constant-folded per row).

Semantics are EXACTLY the per-type pipeline's: the parity test
asserts multi(union) == ∪_t per_type(t) row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ontology_matcher_spark.ontology_types import (
    CURIE_LOCAL_PATTERN,
    OntologyType,
    Strategy,
)
from ontology_matcher_spark.oracle import (
    R_BAD_FORMAT,
    R_BAD_PREFIX,
    R_MULTI,
    R_NO_RESULTS,
    R_UNIQUE_MULTI,
)
from ontology_matcher_spark.schemas import FAILED_COLUMNS, FORMATTED_COLUMNS

_RECORD_COLS = [
    "id", "name", "label", "resource", "description",
    "synonyms", "pmids", "taxid", "xrefs",
]


def _label_case(types: dict[str, OntologyType], fn) -> Column:
    """when(label == t, fn(otype)) ladder over the types."""
    out = None
    for tname, otype in types.items():
        branch = F.when(F.col("label") == tname, fn(otype))
        out = branch if out is None else out.when(
            F.col("label") == tname, fn(otype)
        )
    return out


def link_mentions_multi(
    mentions: DataFrame,
    xref_edges: DataFrame,
    terms: DataFrame,
    types: dict[str, OntologyType],
    strategy: Strategy = Strategy.MIXTURE,
) -> tuple[DataFrame, DataFrame]:
    """Mixed-label mention table → (formatted, failed_formatted) in one
    dataflow pass. Output equals the union of per-type link_mentions
    runs restricted to each label."""
    all_ns: list[str] = sorted({ns for t in types.values() for ns in t.choices})
    ns_idx = {ns: i for i, ns in enumerate(all_ns)}

    # ---- validate (label-conditional CURIE check) --------------------
    df = mentions
    if "idx" not in df.columns:
        df = df.withColumn("idx", F.monotonically_increasing_id())
    has_colon = F.col("id").contains(":")
    df = (
        df.withColumn(
            "ns",
            F.when(has_colon, F.substring_index("id", ":", 1)).otherwise(F.lit("")),
        )
        .withColumn(
            "local_id",
            F.when(
                has_colon, F.expr("substring(id, instr(id, ':') + 1)")
            ).otherwise(F.lit("")),
        )
        .withColumn(
            "format_reason",
            F.when(F.col("id").isNull() | ~has_colon, F.lit(R_BAD_FORMAT))
            .when(
                ~_label_case(
                    types, lambda o: F.col("ns").isin(list(o.choices))
                ),
                F.lit(R_BAD_PREFIX),
            )
            .when(
                ~F.col("local_id").rlike(f"^{CURIE_LOCAL_PATTERN}$"),
                F.lit(R_BAD_FORMAT),
            ),
        )
    )
    valid = df.where(F.col("format_reason").isNull())

    # ---- ONE broadcast candidate join + ONE NARROW aggregation -------
    # The round-1 shape collected 22 per-namespace ARRAYS per mention
    # (22 ArrayBuffer agg states × millions of groups → allocation/GC
    # storm: the agg stage measured 413 core-s runtime for 218 core-s
    # of CPU). The routing rules only need per-namespace COUNTS (long
    # buffers) plus exactly TWO arrays: the row's-type DEFAULT-ns
    # candidates and its non-default alias candidates. The dictionary
    # is pre-distinct'd so counts equal the reference's set sizes.
    edges = (
        xref_edges.where(F.col("dst_ns").isin(all_ns))
        .select("src_curie", "dst_ns", "dst_curie")
        .distinct()
    )
    m = valid.select("idx", F.col("id").alias("raw_id"), "ns", F.col("label").alias("mlabel"))
    joined = m.join(F.broadcast(edges), m.raw_id == edges.src_curie, "left")

    # per-row derived flags (flat columns BEFORE the agg; ladders over
    # flat attributes are linear in Catalyst, nested ones exploded its
    # constraint propagation at round 1)
    label_default = None
    in_choices = None
    for tname, otype in types.items():
        is_t = F.col("mlabel") == tname
        b = F.when(is_t & F.col("dst_ns").isin(list(otype.choices)), 1)
        in_choices = b if in_choices is None else in_choices.when(
            is_t & F.col("dst_ns").isin(list(otype.choices)), 1
        )
        d = F.when(is_t, F.lit(otype.default))
        label_default = d if label_default is None else label_default.when(
            is_t, F.lit(otype.default)
        )
    joined = joined.select(
        "idx", "raw_id", "ns", "mlabel", "dst_ns", "dst_curie",
        F.coalesce(in_choices, F.lit(0)).alias("in_choices"),
        label_default.alias("ldefault"),
    )

    def sz(ns: str) -> str:
        return f"sz_{ns_idx[ns]}"

    # n_hits counts distance-1 neighbours in the MENTION's type's
    # namespaces only (per-type "No results found" semantics)
    count_aggs = [
        F.sum(
            F.when(F.col("dst_ns") == ns, 1).otherwise(0)
        ).alias(sz(ns))
        for ns in all_ns
    ]
    wide = joined.groupBy("idx", "raw_id", "ns", "mlabel", "ldefault").agg(
        F.sum("in_choices").alias("n_hits"),
        F.sort_array(
            F.collect_set(
                F.when(F.col("dst_ns") == F.col("ldefault"), F.col("dst_curie"))
            )
        ).alias("cand_default_raw"),
        F.sort_array(
            F.collect_set(
                F.when(
                    (F.col("in_choices") == 1)
                    & (F.col("dst_ns") != F.col("ldefault"))
                    & (F.col("dst_ns") != F.col("ns")),
                    F.col("dst_curie"),
                )
            )
        ).alias("alias_collected"),
        *count_aggs,
    )

    # own-namespace override (the reference maps a mention's own
    # namespace to [raw_id] itself, replacing any same-ns xrefs):
    #  - default candidates: [raw_id] when the mention IS in the
    #    default namespace, else the collected default-ns set;
    #  - aliases: collected non-default/non-own candidates, plus
    #    raw_id when the mention's own namespace is non-default.
    own_is_default = F.col("ns") == F.col("ldefault")
    default_arr = F.when(own_is_default, F.array(F.col("raw_id"))).otherwise(
        F.col("cand_default_raw")
    )
    alias_arr = F.when(
        own_is_default, F.col("alias_collected")
    ).otherwise(F.array_union(F.col("alias_collected"), F.array(F.col("raw_id"))))

    # routing predicates from flat count columns: a candidate count in
    # any non-own namespace of the row's type > 1
    multi_default = ~own_is_default & (
        _label_case(types, lambda o: F.col(sz(o.default))) > 1
    )
    any_multi = _label_case(
        types,
        lambda o: F.greatest(
            *[
                F.when(F.col("ns") == ns, F.lit(0)).otherwise(F.col(sz(ns)))
                for ns in o.choices
            ]
        )
        > 1,
    )
    wide = wide.select(
        "idx",
        "raw_id",
        "ns",
        F.col("mlabel").alias("label"),
        F.when(F.col("n_hits") == 0, F.lit(R_NO_RESULTS))
        .when(multi_default, F.lit(R_MULTI))
        .when(
            F.lit(strategy == Strategy.UNIQUE) & any_multi,
            F.lit(R_UNIQUE_MULTI),
        )
        .alias("reason"),
        default_arr.alias("cand_default"),
        alias_arr.alias("aliases"),
    )

    # ---- records: first input row per (label, id) --------------------
    # min_by(struct, idx), not a row_number window: the agg combines
    # map-side (no per-partition sort, no full shuffle of losers) —
    # the first-row-wins lookup over 10^12 mentions is itself a big agg
    records = df.groupBy(F.col("label").alias("r_key_label"), "id").agg(
        F.min_by(
            F.struct(
                *[
                    F.coalesce(F.col(c), F.lit("")).alias(c)
                    for c in _RECORD_COLS
                ]
            ),
            F.col("idx"),
        ).alias("__r")
    ).select(
        "r_key_label",
        *[F.col(f"__r.{c}").alias(f"r_{c}") for c in _RECORD_COLS],
    )

    conv = wide.where(F.col("reason").isNull())
    conv = conv.join(
        records,
        (conv.raw_id == records.r_id) & (conv.label == records.r_key_label),
        "left",
    )
    conv = conv.withColumn(
        "canonical",
        F.when(F.size("cand_default") == 1, F.element_at("cand_default", 1)),
    )
    from ontology_matcher_spark.operators.format_stage import (
        metadata_exprs,
        metadata_table,
    )

    # metadata key = canonical when resolved, else the RAW id: the
    # reference fetches metadata per QUERY and applies it even to rows
    # with no default mapping (format_by_metadata runs before the
    # id-None branch, ontology_formatter.py:697-700 + :712-717)
    conv = conv.join(
        F.broadcast(metadata_table(terms)),
        F.coalesce(conv.canonical, conv.raw_id) == F.col("md_curie"),
        "left",
    )

    # per-label metadata semantics: one expression per output column,
    # switching by metadata_mode (flat label test — no nesting)
    gene_labels = [t for t, o in types.items() if o.metadata_mode == "gene"]
    dflt = metadata_exprs("default", F.col("aliases"))
    gene = metadata_exprs("gene", F.col("aliases"))

    def o(col: str) -> Column:
        if not gene_labels:
            return dflt[col]
        return F.when(F.col("label").isin(gene_labels), gene[col]).otherwise(
            dflt[col]
        )

    resolved = F.col("canonical").isNotNull()
    formatted_conv = (
        conv.withColumn("o_name", o("name"))
        .withColumn("o_description", o("description"))
        .withColumn("o_synonyms", o("synonyms"))
        .withColumn("o_taxid", o("taxid"))
        .withColumn("o_pmids", o("pmids"))
        .withColumn("o_xrefs", o("xrefs"))
        .select(
            F.when(resolved, F.col("canonical")).otherwise(F.col("raw_id")).alias("id"),
            F.col("o_name").alias("name"),
            F.when(resolved, F.col("label")).otherwise(F.col("r_label")).alias("label"),
            F.col("r_resource").alias("resource"),
            F.col("o_description").alias("description"),
            F.col("o_synonyms").alias("synonyms"),
            F.col("o_pmids").alias("pmids"),
            F.col("o_taxid").alias("taxid"),
            F.col("o_xrefs").alias("xrefs"),
            F.when(resolved, F.col("raw_id")).otherwise(F.lit("")).alias("raw_id"),
        )
    )

    # ---- failed side --------------------------------------------------
    failures = wide.where(F.col("reason").isNotNull()).select(
        F.col("raw_id").alias("fid"), F.col("label").alias("flabel"), "reason"
    )
    invalid = df.where(F.col("format_reason").isNotNull()).select(
        F.col("id").alias("fid"),
        F.col("label").alias("flabel"),
        F.col("format_reason").alias("reason"),
    )
    failed_all = failures.unionByName(invalid)
    f = failed_all.join(
        records,
        (failed_all.fid == records.r_id)
        & (failed_all.flabel == records.r_key_label),
        "left",
    )
    f = f.select(
        F.col("fid").alias("id"),
        F.col("r_name").alias("name"),
        F.col("flabel").alias("label"),
        F.col("r_resource").alias("resource"),
        F.col("r_description").alias("description"),
        F.col("r_synonyms").alias("synonyms"),
        F.col("r_pmids").alias("pmids"),
        F.col("r_taxid").alias("taxid"),
        F.col("r_xrefs").alias("xrefs"),
        "reason",
        F.substring_index("fid", ":", 1).alias("__prefix"),
    )
    default_of_label = _label_case(types, lambda o: F.lit(o.default))
    rescue = (F.col("__prefix") == default_of_label) | F.lit(
        strategy == Strategy.MIXTURE
    )
    rescued = f.where(rescue).withColumn("raw_id", F.lit("")).select(
        *FORMATTED_COLUMNS
    )
    failed_formatted = f.where(~rescue).select(*FAILED_COLUMNS)
    formatted = formatted_conv.unionByName(rescued)
    return formatted, failed_formatted
