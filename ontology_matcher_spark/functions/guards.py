"""Hot-bucket guards for LSH banding self-joins.

A (band, hash) bucket of width w contributes O(w²) candidate pairs.
Degenerate buckets — boilerplate shingle clusters, zero/constant
embeddings — only appear in production corpora, which is exactly why
the guard must default ON. Drops are never silent: every guarded call
logs the dropped bucket/row counts and records them in
LAST_DROP_STATS for tests and lineage.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default cap: 1024² ≈ 0.5M pairs is the most one degenerate bucket
#: may cost before the guard trips. Legitimate near-dup clusters are
#: orders of magnitude narrower (and signature-identical documents are
#: collapsed BEFORE banding in the MinHash path, so exact-duplicate
#: pileups never hit the cap).
DEFAULT_MAX_BUCKET = 1024

#: drop statistics of the last guarded call:
#: {"buckets_dropped": int, "rows_dropped": int}
LAST_DROP_STATS: dict[str, int] = {}

logger = logging.getLogger(__name__)


def apply_bucket_guard(
    bucketed: DataFrame, keys: list[str], max_bucket: int, what: str
) -> DataFrame:
    """Drop buckets wider than ``max_bucket`` rows, counting the drop.

    The sizes aggregation is one cheap scan of the (already
    materialized) bucket table; the keep-filter is a broadcast
    semi-join, so the guard adds no shuffle of the data table."""
    sizes = bucketed.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    dropped = sizes.where(F.col("__n") > max_bucket).agg(
        F.count(F.lit(1)).alias("b"),
        F.coalesce(F.sum("__n"), F.lit(0)).alias("r"),
    ).first()
    LAST_DROP_STATS.clear()
    LAST_DROP_STATS.update(
        {"buckets_dropped": int(dropped["b"]), "rows_dropped": int(dropped["r"])}
    )
    if dropped["b"]:
        logger.warning(
            "%s: hot-bucket guard dropped %d bucket(s) / %d row(s) wider "
            "than max_bucket=%d",
            what, dropped["b"], dropped["r"], max_bucket,
        )
        keep = sizes.where(F.col("__n") <= max_bucket).select(*keys)
        bucketed = bucketed.join(F.broadcast(keep), keys, "left_semi")
    return bucketed
