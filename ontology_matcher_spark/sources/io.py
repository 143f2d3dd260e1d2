"""Sources & sinks (SURVEY.md §2.1).

- mention TSV/CSV scan reproducing the reference's reader semantics
  (S1/S2: delimiter by extension, header, all-string, drop null ids,
  fill "" — /root/reference/ontology_matcher/ontology_formatter.py:528-542);
- schema pre-flight (S3: _check_format, of.py:570-587) as a driver-side
  assertion;
- formatted TSV sink (S9: formatted + .failed.tsv, of.py:792-815);
- table IO abstraction: Iceberg when the runtime catalog is
  configured, else a parquet directory with the SAME partition layout
  (SURVEY.md §7 risk 4) — checkpoint/resume manifests sit on top in
  plans/pipeline.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_matcher_spark.schemas import MENTIONS

REQUIRED_COLUMNS = ["id", "name", "label", "resource"]
OPTIONAL_COLUMNS = ["description", "synonyms", "pmids", "taxid", "xrefs"]


def check_format(df: DataFrame) -> None:
    """Raise if required columns are missing (ref _check_format)."""
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"Missing required columns {missing}; expected {REQUIRED_COLUMNS}"
        )


def read_mentions(spark: SparkSession, path: str) -> DataFrame:
    """Read a mention file (.tsv/.csv by extension) or parquet dir —
    all-string, null-id rows dropped, NaN→'' (ref of.py:537-540)."""
    if path.endswith((".tsv", ".csv")):
        sep = "\t" if path.endswith(".tsv") else ","
        df = (
            spark.read.option("sep", sep)
            .option("header", True)
            .schema(MENTIONS)
            .csv(path)
        )
    else:
        df = spark.read.parquet(path)
    check_format(df)
    for c in OPTIONAL_COLUMNS:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(""))
    return df.where(F.col("id").isNotNull()).na.fill(
        "", REQUIRED_COLUMNS + OPTIONAL_COLUMNS
    )


def write_formatted(
    formatted: DataFrame, failed: DataFrame, out_path: str
) -> None:
    """Formatted TSV + .failed.tsv sink (parity export; pipe-joined
    fields are already strings at this point)."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    formatted.toPandas().to_csv(out_path, sep="\t", index=False)
    failed.toPandas().to_csv(
        out_path.rsplit(".", 1)[0] + ".failed.tsv", sep="\t", index=False
    )


# ---------------------------------------------------------------- tables
def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    try:
        return bool(spark.conf.get("spark.sql.catalog.kg", None))
    except Exception:
        return False


def write_table(
    df: DataFrame,
    base_dir: str,
    name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write a stage table. Parquet directory layout with explicit
    partition columns — identical layout to the Iceberg variant
    (`partitionedBy(label, bucket(id))` on a real cluster)."""
    path = os.path.join(base_dir, name)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, name))
