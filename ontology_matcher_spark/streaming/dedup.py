"""Streaming exact-dedup over an incremental document corpus.

The batch twin is `operators.dedup.exact_dedup` (same fingerprint:
md5 of the token-normalized text). The streaming form is Spark's
`dropDuplicatesWithinWatermark`: state holds one entry per DISTINCT
fingerprint seen within the watermark horizon and is dropped once the
event-time watermark passes — bounded state, the only shape that
survives an unbounded 100 TB ingest stream. A plain
`dropDuplicates` on a stream would grow state forever.

Semantics: the FIRST arrival of each fingerprint inside any watermark
window is emitted; later copies within the horizon are suppressed. A
copy arriving after the state for its fingerprint expired is emitted
again — dedup is windowed by design (cross-horizon dedup belongs to a
periodic batch `exact_dedup` compaction over the sink, the standard
lambda split).

The reference is batch-only (SURVEY.md §2.9); this extends the
driver-mandated dedup family to the streaming ingest door opened by
`streaming/ingest.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ontology_matcher_spark.operators.text import word_tokens

#: driver testdata documents.parquet shape (the batch exact_dedup
#: input table)
FLAT_DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def fingerprinted(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the batch-identical exact-dedup fingerprint column."""
    normalized = F.array_join(word_tokens(F.col(text_col)), " ")
    return docs.withColumn("fp", F.md5(normalized))


def stream_dedup_documents(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    schema: StructType = FLAT_DOCUMENTS,
) -> StreamingQuery:
    """Document stream → first-copy-only append sink.

    ``ts_col``: event-time column for the watermark. The driver
    document tables carry no timestamp, so callers ingesting those
    attach one (tests derive it deterministically from doc_id; a
    production ingest uses the upstream arrival time).
    """
    if ts_col not in [f.name for f in schema.fields]:
        schema = schema.add(ts_col, "timestamp")
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    deduped = (
        fingerprinted(docs)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
