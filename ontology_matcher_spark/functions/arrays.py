"""Array/string kernels — Spark-SQL expressions of the reference's
list utilities (SURVEY.md §2.4 A2-A4, §2.7). All JVM-side
(whole-stage-codegen), no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_pipe(col: Column | str) -> Column:
    """Pipe-joined string → array<string> with empties removed.

    '' and NULL both become []. array_remove, not F.filter: lambda
    higher-order functions are CodegenFallback (interpreted per row,
    allocation-heavy) — this stays inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.coalesce(c, F.lit("")), r"\|"), "")


def sql_join_lst(arr: Column) -> Column:
    """The reference's join_lst (of.py:544-553): members may themselves
    be pipe-joined — split each on '|', flatten, dedup, SORT (replaces
    the reference's nondeterministic Python-set order), rejoin with '|'.

    HOF-free formulation (hot path — runs once per output row per
    multi-value field): members are pipe-joined strings, so joining
    them all with '|' and splitting ONCE flattens without the
    interpreted transform/flatten/filter chain."""
    joined = F.array_join(arr, "|")  # skips NULL members
    parts = F.array_remove(F.split(joined, r"\|"), "")
    return F.array_join(F.sort_array(F.array_distinct(parts)), "|")


def concat_unique(a: Column, b: Column) -> Column:
    """Set-union of two array operands, order-preserving
    (ref concat, of.py:555-568)."""
    na = F.coalesce(a, F.array().cast("array<string>"))
    nb = F.coalesce(b, F.array().cast("array<string>"))
    return F.array_distinct(F.concat(na, nb))
