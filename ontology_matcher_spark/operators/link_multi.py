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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ontology_matcher_spark.functions.arrays import (
    concat_unique,
    split_pipe,
    sql_join_lst,
)
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

    def cand(ns: str) -> str:
        return f"cand_{ns_idx[ns]}"

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

    # ---- ONE broadcast candidate join + ONE aggregation --------------
    edges = xref_edges.where(F.col("dst_ns").isin(all_ns)).select(
        "src_curie", "dst_ns", "dst_curie"
    )
    m = valid.select("idx", F.col("id").alias("raw_id"), "ns", F.col("label").alias("mlabel"))
    joined = m.join(F.broadcast(edges), m.raw_id == edges.src_curie, "left")

    # n_hits counts distance-1 neighbours in the MENTION's type's
    # namespaces only (per-type "No results found" semantics);
    # keyed on mlabel — the joined frame carries label as mlabel
    in_choices = None
    for tname, otype in types.items():
        b = F.when(
            (F.col("mlabel") == tname)
            & F.col("dst_ns").isin(list(otype.choices)),
            1,
        )
        in_choices = b if in_choices is None else in_choices.when(
            (F.col("mlabel") == tname)
            & F.col("dst_ns").isin(list(otype.choices)),
            1,
        )

    aggs = [
        F.array_sort(
            F.collect_set(F.when(F.col("dst_ns") == ns, F.col("dst_curie")))
        ).alias(cand(ns))
        for ns in all_ns
    ]
    wide = joined.groupBy("idx", "raw_id", "ns", "mlabel").agg(
        F.sum(F.coalesce(in_choices, F.lit(0))).alias("n_hits"), *aggs
    )

    # one select, not a withColumn-per-namespace loop: chained
    # withColumns nest projections and blow up Catalyst analysis
    # (the 22-column variant OOM'd the driver on plan alone)
    own = {
        ns: F.when(F.col("ns") == ns, F.array(F.col("raw_id"))).otherwise(
            F.col(cand(ns))
        ).alias(cand(ns))
        for ns in all_ns
    }
    wide = wide.select(
        "idx", "raw_id", "ns", F.col("mlabel").alias("label"), "n_hits",
        *own.values(),
    )

    # flatten sizes to plain int columns FIRST: routing ladders over
    # nested size(case-when(array)) trees sent Catalyst's constraint
    # propagation exponential (the optimizer hung; ladders over flat
    # attributes are linear)
    def sz(ns: str) -> str:
        return f"sz_{ns_idx[ns]}"

    wide = wide.select(
        "*", *[F.size(cand(ns)).alias(sz(ns)) for ns in all_ns]
    )

    # flatten the per-type "any non-own namespace has >1 candidates"
    # predicate into ONE plain boolean column per type, in its own
    # projection, BEFORE the routing when-ladder. Nesting the
    # greatest-over-whens trees directly inside the reason ladder sent
    # Catalyst constraint propagation exponential (UNIQUE plans hung
    # >9 min in the optimizer at round 1); ladders over flat boolean
    # attributes are linear.
    type_names = list(types)
    def am(tname: str) -> str:
        return f"am_{type_names.index(tname)}"

    am_cols = [
        (
            F.greatest(
                *[
                    F.when(F.col("ns") == ns, F.lit(0)).otherwise(F.col(sz(ns)))
                    for ns in otype.choices
                ]
            )
            > 1
        ).alias(am(tname))
        for tname, otype in types.items()
    ]
    wide = wide.select("*", *am_cols)

    default_arr = _label_case(types, lambda o: F.col(cand(o.default)))
    multi_default = _label_case(
        types,
        lambda o: (F.col("ns") != o.default) & (F.col(sz(o.default)) > 1),
    )
    any_multi = None
    for tname in type_names:
        branch = (F.col("label") == tname) & F.col(am(tname))
        any_multi = branch if any_multi is None else (any_multi | branch)
    alias_arr = _label_case(
        types,
        lambda o: F.array_distinct(
            F.array_remove(
                F.concat(*[F.col(cand(ns)) for ns in o.non_default]), ""
            )
        ),
    )
    # prune to a NARROW row here: every cand_*/sz_*/am_* column dies at
    # this projection, so the joins/unions downstream optimize over ~8
    # columns instead of ~70 nested case-when trees (the wide plan was
    # the other half of the round-1 optimizer blow-up)
    wide = wide.select(
        "idx",
        "raw_id",
        "ns",
        "label",
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
    w = Window.partitionBy("label", "id").orderBy("idx")
    records = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("label").alias("r_key_label"),
            *[
                F.coalesce(F.col(c), F.lit("")).alias(f"r_{c}")
                for c in _RECORD_COLS
            ],
        )
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
    md = terms.select(
        F.col("curie").alias("md_curie"),
        F.col("name").alias("md_name"),
        F.col("description").alias("md_description"),
        F.col("synonyms").alias("md_synonyms"),
    )
    conv = conv.join(F.broadcast(md), conv.canonical == md.md_curie, "left")

    nn = lambda c: F.when(F.col(c) != "", F.col(c))  # noqa: E731
    resolved = F.col("canonical").isNotNull()
    formatted_conv = (
        conv.withColumn("o_name", F.coalesce(nn("md_name"), F.col("r_name")))
        .withColumn(
            "o_description",
            F.coalesce(nn("md_description"), F.col("r_description")),
        )
        .withColumn(
            "o_synonyms",
            sql_join_lst(
                concat_unique(F.col("md_synonyms"), split_pipe("r_synonyms"))
            ),
        )
        .withColumn("o_pmids", sql_join_lst(split_pipe("r_pmids")))
        .withColumn(
            "o_xrefs",
            sql_join_lst(concat_unique(F.col("aliases"), split_pipe("r_xrefs"))),
        )
        .select(
            F.when(resolved, F.col("canonical")).otherwise(F.col("raw_id")).alias("id"),
            F.col("o_name").alias("name"),
            F.when(resolved, F.col("label")).otherwise(F.col("r_label")).alias("label"),
            F.col("r_resource").alias("resource"),
            F.col("o_description").alias("description"),
            F.col("o_synonyms").alias("synonyms"),
            F.col("o_pmids").alias("pmids"),
            F.col("r_taxid").alias("taxid"),
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
