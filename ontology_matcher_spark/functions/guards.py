"""Hot-bucket guards for LSH banding self-joins.

A (band, hash) bucket of width w contributes O(w²) candidate pairs.
Degenerate buckets — boilerplate shingle clusters, zero/constant
embeddings — only appear in production corpora, which is exactly why
the guard must default ON. Drops are never silent: every guarded call
logs the dropped bucket/row counts, RETURNS them to its caller (the
public dedup/similarity ops take a ``drop_stats`` out-dict so the
counts travel with the call, not through a global), and mirrors them
into LAST_DROP_STATS for convenience.

CHANGELOG — round 3 turned the guard ON by default (max_bucket=1024)
in `minhash_lsh_pairs` and `embedding_near_dup_multiband`: clusters
wider than the cap no longer contribute candidate pairs. Callers that
need provably complete pair sets must pass ``max_bucket=None``.
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

#: convenience mirror of the most recent guarded call's drop counts
#: ({"buckets_dropped": int, "rows_dropped": int}). Process-local and
#: last-call-wins — concurrent guarded calls overwrite each other, so
#: anything that needs reliable attribution must use the returned
#: stats / the ``drop_stats`` out-dict instead.
LAST_DROP_STATS: dict[str, int] = {}

logger = logging.getLogger(__name__)


def apply_bucket_guard(
    bucketed: DataFrame, keys: list[str], max_bucket: int, what: str
) -> tuple[DataFrame, dict[str, int]]:
    """Drop buckets wider than ``max_bucket`` rows.

    Returns ``(guarded_df, stats)`` where stats =
    {"buckets_dropped": n, "rows_dropped": m} — computed eagerly (one
    cheap scan of the already-materialized bucket table; callers
    materialize/persist the bucket table FIRST so this scan and the
    downstream self-join don't each recompute the bucketing). The
    keep-filter is a broadcast semi-join, so the guard adds no shuffle
    of the data table."""
    sizes = bucketed.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    dropped = sizes.where(F.col("__n") > max_bucket).agg(
        F.count(F.lit(1)).alias("b"),
        F.coalesce(F.sum("__n"), F.lit(0)).alias("r"),
    ).first()
    stats = {
        "buckets_dropped": int(dropped["b"]),
        "rows_dropped": int(dropped["r"]),
    }
    LAST_DROP_STATS.clear()
    LAST_DROP_STATS.update(stats)
    if dropped["b"]:
        logger.warning(
            "%s: hot-bucket guard dropped %d bucket(s) / %d row(s) wider "
            "than max_bucket=%d",
            what, dropped["b"], dropped["r"], max_bucket,
        )
        keep = sizes.where(F.col("__n") <= max_bucket).select(*keys)
        bucketed = bucketed.join(F.broadcast(keep), keys, "left_semi")
    return bucketed, stats
