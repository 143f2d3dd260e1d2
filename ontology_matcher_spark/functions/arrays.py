"""Array/string kernels — Spark-SQL expressions of the reference's
list utilities (SURVEY.md §2.4 A2-A4, §2.7). All JVM-side
(whole-stage-codegen), no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_pipe(col: Column | str) -> Column:
    """Pipe-joined string → array<string> with empties removed.

    '' and NULL both become []."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.coalesce(c, F.lit("")), r"\|"), lambda x: x != "")


def sql_join_lst(arr: Column) -> Column:
    """The reference's join_lst (of.py:544-553): members may themselves
    be pipe-joined — split each on '|', flatten, dedup, SORT (replaces
    the reference's nondeterministic Python-set order), rejoin with '|'.
    """
    exploded = F.flatten(F.transform(arr, lambda x: F.split(x, r"\|")))
    cleaned = F.filter(exploded, lambda x: (x != "") & x.isNotNull())
    return F.array_join(F.array_sort(F.array_distinct(cleaned)), "|")


def concat_unique(a: Column, b: Column) -> Column:
    """Set-union of two array operands, order-preserving
    (ref concat, of.py:555-568)."""
    na = F.coalesce(a, F.array().cast("array<string>"))
    nb = F.coalesce(b, F.array().cast("array<string>"))
    return F.array_distinct(F.concat(na, nb))
