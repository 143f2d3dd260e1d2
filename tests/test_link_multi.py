"""Single-pass multi-type linking must equal the union of per-type
runs row-for-row (both strategies)."""

import os

import pytest
from pyspark.sql import functions as F

from ontology_matcher_spark.ontology_types import ONTOLOGY_TYPES, Strategy
from ontology_matcher_spark.operators.link_multi import link_mentions_multi
from ontology_matcher_spark.plans.pipeline import link_mentions
from ontology_matcher_spark.schemas import FAILED_COLUMNS, FORMATTED_COLUMNS


@pytest.mark.parametrize("strategy", [Strategy.MIXTURE, Strategy.UNIQUE])
def test_multi_equals_per_type_union(spark, fixture_dir, strategy):
    mentions = spark.read.parquet(os.path.join(fixture_dir, "mentions.parquet"))
    edges = spark.read.parquet(os.path.join(fixture_dir, "xref_edges.parquet"))
    terms = spark.read.parquet(os.path.join(fixture_dir, "ontology_terms.parquet"))

    got_fmt, got_failed = link_mentions_multi(
        mentions, edges, terms, ONTOLOGY_TYPES, strategy
    )

    exp_fmt_rows, exp_failed_rows = [], []
    for tname, otype in ONTOLOGY_TYPES.items():
        fmt, failed = link_mentions(
            mentions.where(F.col("label") == tname), edges, terms, otype, strategy
        )
        exp_fmt_rows += [tuple(r[c] for c in FORMATTED_COLUMNS) for r in fmt.collect()]
        exp_failed_rows += [
            tuple(r[c] for c in FAILED_COLUMNS) for r in failed.collect()
        ]

    got_fmt_rows = [tuple(r[c] for c in FORMATTED_COLUMNS) for r in got_fmt.collect()]
    got_failed_rows = [
        tuple(r[c] for c in FAILED_COLUMNS) for r in got_failed.collect()
    ]
    assert sorted(got_fmt_rows) == sorted(exp_fmt_rows)
    assert sorted(got_failed_rows) == sorted(exp_failed_rows)
