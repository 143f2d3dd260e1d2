"""Custom stateful streaming operator (driver brief §streams:
`applyInPandasWithState` for custom stateful operators).

`stream_entity_counts` maintains a RUNNING mention count per entity
across micro-batches — the streaming analog of the lineage counters
the batch pipeline writes per stage. State is one long per entity id,
partitioned by the grouping key (entity id), so state volume is
O(|distinct entities|) per executor and the shuffle key matches the
aggregation key — no hot-key amplification beyond what the entity
distribution itself carries (hub entities are single state rows, not
row explosions).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

COUNT_SCHEMA = StructType(
    [StructField("id", StringType()), StructField("n", LongType())]
)
_STATE_SCHEMA = StructType([StructField("n", LongType())])


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"id": [key[0]], "n": [n]})


def stream_entity_counts(mentions: DataFrame) -> DataFrame:
    """Streaming mention rows → (id, n) running totals, emitted in
    update mode every micro-batch. Pair with a memory/foreachBatch
    sink; at cluster scale the sink is an Iceberg merge keyed on id."""
    return mentions.groupBy("id").applyInPandasWithState(
        _update,
        COUNT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_entity_counts(
    spark: Any,
    input_dir: str,
    checkpoint_dir: str,
    dictionary,
    query_name: str = "entity_counts",
):
    """documents stream → detect → stateful running counts → in-memory
    update sink (availableNow). Returns the StreamingQuery."""
    from ontology_matcher_spark.operators.mention_detect import detect_mentions
    from ontology_matcher_spark.streaming.ingest import stream_documents

    docs = stream_documents(spark, input_dir)
    counts = stream_entity_counts(detect_mentions(docs, dictionary))
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
