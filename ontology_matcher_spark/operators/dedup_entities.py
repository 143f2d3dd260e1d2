"""The reference's `dedup` command, made real (SURVEY.md §3 entry 3).

/root/reference/ontology_matcher/cli.py:168-296 ships as a stub that
copies input to output, with the intended algorithm preserved in
comments: split formatted rows into official (id starts with the
default namespace) vs unofficial (:222-225); match each unofficial row
to official rows by xrefs-contains-id, then synonyms-contains-name,
then name-contains-name, in that priority (:227-245); exactly-one
match → merge xrefs into the official row and drop the unofficial
(:201-209,:236-241), multi-match → drop, no match → keep (:243-245);
finally `groupby(["id","label"]).agg(first / pipe-merge-unique)`
(:276-291).

Spark-first realization (SURVEY.md §2.3 J5 / §2.4 A8):
- the xref rule is `explode(xrefs)` + equi-join (NOT a contains()
  theta join — that is O(n²));
- name rules are lowercased equi-joins on the normalized string;
- priority is a ranked union + row_number;
- the final aggregation uses the salted two-phase collect pattern —
  hot canonical ids (TP53-class hubs) would otherwise funnel one
  reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ontology_matcher_spark.functions.arrays import split_pipe, sql_join_lst
from ontology_matcher_spark.functions.materialize import materialize
from ontology_matcher_spark.functions.salting import salted_collect_sets
from ontology_matcher_spark.ontology_types import OntologyType
from ontology_matcher_spark.schemas import FORMATTED_COLUMNS


def _norm(c):
    return F.lower(F.trim(c))


def match_unofficial(
    formatted: DataFrame, otype: OntologyType
) -> DataFrame:
    """Unofficial rows → (u_id, matched official id, match_rule,
    n_matches). Rules ranked: xref(0) > synonym(1) > name(2)."""
    is_official = F.col("id").startswith(otype.default + ":")
    official = formatted.where(is_official)
    unofficial = formatted.where(~is_official)

    off_xref = official.select(
        F.col("id").alias("o_id"), F.explode(split_pipe("xrefs")).alias("x")
    )
    off_syn = official.select(
        F.col("id").alias("o_id"),
        F.explode(split_pipe("synonyms")).alias("s"),
    ).withColumn("s", _norm(F.col("s")))
    off_name = official.select(
        F.col("id").alias("o_id"), _norm(F.col("name")).alias("n")
    )

    u = unofficial.select(
        F.col("id").alias("u_id"), _norm(F.col("name")).alias("u_name")
    ).distinct()

    m_xref = u.join(off_xref, u.u_id == off_xref.x).select(
        "u_id", "o_id", F.lit(0).alias("rule")
    )
    m_syn = u.join(off_syn, u.u_name == off_syn.s).select(
        "u_id", "o_id", F.lit(1).alias("rule")
    )
    m_name = u.join(off_name, u.u_name == off_name.n).select(
        "u_id", "o_id", F.lit(2).alias("rule")
    )
    all_m = m_xref.unionByName(m_syn).unionByName(m_name).distinct()

    # priority: best (lowest) rule per unofficial id, then count the
    # matches AT that rule — reference takes the rules in order and
    # acts on the first rule that yields any match (cli.py:231-241)
    best = all_m.groupBy("u_id").agg(F.min("rule").alias("rule"))
    at_best = all_m.join(best, ["u_id", "rule"])
    return at_best.groupBy("u_id", "rule").agg(
        F.sort_array(F.collect_set("o_id")).alias("o_ids"),
        F.count("o_id").alias("n_matches"),
    )


def dedup_entities(
    formatted: DataFrame, otype: OntologyType, num_salts: int = 16
) -> DataFrame:
    """Full dedup-command semantics → deduped formatted table.

    merge: unofficial with exactly one official match folds its id +
    xrefs into the official row; multi-match rows are dropped; no-match
    rows pass through. Final groupBy(id, label) uses the salted
    two-phase collect for the pipe-merged fields."""
    # the input plan is referenced ~6× (xref/syn/name indexes + two
    # joins back + final agg) — materialize once or an un-checkpointed
    # upstream (e.g. the whole linking pipeline) recomputes every time
    formatted = materialize(formatted, "dedup-fmt")
    matches = match_unofficial(formatted, otype)
    one = matches.where(F.col("n_matches") == 1).select(
        F.col("u_id").alias("one_id"), F.element_at("o_ids", 1).alias("target_id")
    )
    multi = matches.where(F.col("n_matches") > 1).select(
        F.col("u_id").alias("multi_id")
    )

    merged = (
        formatted.join(one, formatted.id == one.one_id, "left")
        .join(multi, formatted.id == multi.multi_id, "left_anti")
        .withColumn(
            "new_id", F.coalesce(F.col("target_id"), F.col("id"))
        )
        # a merged row contributes its old id as an xref of the target
        .withColumn(
            "xrefs",
            F.when(
                F.col("target_id").isNotNull(),
                F.concat_ws("|", F.col("xrefs"), F.col("id")),
            ).otherwise(F.col("xrefs")),
        )
        .drop("one_id", "target_id")
        .withColumn("id", F.col("new_id"))
        .drop("new_id")
    )

    # final A8 aggregation: min() for scalars (deterministic stand-in
    # for the reference's order-dependent first(), cli.py:276-291),
    # salted two-phase set-merge for the pipe-joined fields
    scalars = merged.groupBy("id", "label").agg(
        F.min("name").alias("name"),
        F.min("resource").alias("resource"),
        F.min("description").alias("description"),
        F.min("taxid").alias("taxid"),
    )
    sets = salted_collect_sets(
        merged,
        ["id", "label"],
        {"_syn": "synonyms", "_pm": "pmids", "_xr": "xrefs", "_raw": "raw_id"},
        num_salts=num_salts,
    )
    out = (
        scalars.join(sets, ["id", "label"])
        .withColumn("synonyms", sql_join_lst(F.col("_syn")))
        .withColumn("pmids", sql_join_lst(F.col("_pm")))
        .withColumn("xrefs", sql_join_lst(F.col("_xr")))
        .withColumn("raw_id", sql_join_lst(F.col("_raw")))
    )
    return out.select(*FORMATTED_COLUMNS)
