"""Interval-overlap validation: half-open [start, end) intervals must be
pairwise disjoint within a group (``x-noOverlap``).

The two-column sibling of ``x-monotonic``: sessions per user, machine
reservations, billing periods, ad slots — "no two of this key's intervals
may run at the same time" is a relational invariant no per-row keyword can
express (each interval is individually fine; the failure is between rows).

Correctness subtlety handled here: comparing each interval only to its
PREDECESSOR by start (plain ``lag(end)``) misses overlaps with earlier,
longer intervals — [0,100) / [10,20) / [30,40): row 3 does not overlap row
2 but is swallowed by row 1. The check therefore compares each start to the
RUNNING MAX of all earlier ends (``max(end) OVER (... ROWS UNBOUNDED
PRECEDING TO 1 PRECEDING)``), which detects containment chains too.

Scale contract (10^12 rows): one window = one hash-partitioned Exchange on
the group key + per-partition sort — the same single-shuffle shape as
x-monotonic (operators/ordering.py), never a self-join (the naive pairwise
formulation is an O(n²)-per-group range self-join). ``by=None`` funnels the
table through one partition for the global sort — fixtures only, same
caveat as ordering.py.

NULL semantics: a row with a NULL start or NULL end never violates and its
end never enters the running max (`type`/`required` police nulls); it
simply drops out of the chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _overlap_flags(df, column, end_column, key, by, allow_touch):
    """Shared plan prefix: (by?, start, prev_max_end, bad) columns."""
    part = [by] if by is not None else [F.lit(1)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(column), F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col(column)
    end = F.col(end_column)
    # NULL-end rows must not poison the running max with a NULL; max()
    # skips NULLs natively, and a NULL start sorts first so contributes
    # nothing it shouldn't.
    prev_end = F.max(F.when(start.isNotNull(), end)).over(w)
    overlap = (start < prev_end) if allow_touch else (start <= prev_end)
    bad = start.isNotNull() & end.isNotNull() & prev_end.isNotNull() & overlap
    return start, prev_end, bad


def overlap_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    end_column: str,
    by: str | None = None,
    allow_touch: bool = True,
) -> DataFrame:
    """``x-noOverlap`` execution: intervals that overlap an earlier one as
    engine violation rows (doc_id, check_id, observed, expected).

    ``column`` is the interval start, ``end_column`` the end; ``by`` scopes
    independent timelines. ``allow_touch=True`` (default) treats intervals
    as half-open — ``start == prev_end`` is back-to-back, not overlap;
    ``False`` makes touching a violation (closed intervals). observed =
    ``start=<s>,prev_end=<e>`` (CAST AS STRING rendering — integer /
    decimal / timestamp columns give cross-engine-stable witnesses).
    """
    start, prev_end, bad = _overlap_flags(
        df, column, end_column, key, by, allow_touch)
    scope = f" per {by}" if by else ""
    cmp = "<" if allow_touch else "<="
    exp_msg = (f"[{column},{end_column}) disjoint{scope} "
               f"(violation when {column} {cmp} max prior {end_column})")
    return (
        df.select(
            F.col(key).alias("__key"),
            start.alias("start_v"),
            prev_end.alias("prev_end_v"),
            bad.alias("__bad"),
        )
        .where(F.col("__bad"))
        .select(
            F.col("__key").cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat_ws(
                ",",
                F.concat(F.lit("start="),
                         F.col("start_v").cast("string")),
                F.concat(F.lit("prev_end="),
                         F.col("prev_end_v").cast("string")),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )


def overlap_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    end_column: str,
    by: str,
    allow_touch: bool = True,
) -> DataFrame:
    """``x-noOverlap {"verdicts": "perGroup"}``: one verdict row per
    ``by``-group — (partition_id=group, check_id, passed, metric_value=
    #overlapping intervals, threshold=0), enumerating EVERY group
    including clean ones.

    Plan note: keep the ORIGINAL ``by`` attribute through window →
    groupBy so the aggregate consumes the window's hash-partitioning —
    verdicts cost ZERO extra Exchange (same invariant as
    ordering.monotonic_group_verdicts, plan-asserted in tests)."""
    _, _, bad = _overlap_flags(df, column, end_column, key, by, allow_touch)
    flagged = df.select(F.col(by), bad.cast("int").alias("__bad"))
    return (
        flagged.groupBy(by)
        .agg(F.sum("__bad").alias("nov"))
        .select(
            F.coalesce(F.col(by).cast("string"),
                       F.lit("<null>")).alias("partition_id"),
            F.lit(check_id).alias("check_id"),
            (F.col("nov") == 0).alias("passed"),
            F.col("nov").cast("double").alias("metric_value"),
            F.lit(0.0).cast("double").alias("threshold"),
        )
    )
