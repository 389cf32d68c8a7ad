"""Ordering validation: a column must be monotonic within a group when rows
are sequenced by an order column (``x-monotonic``).

The sequential integrity check none of the per-row keywords can express —
`minimum`/`maximum` (validators.rs numeric bounds) bound a value against a
LITERAL; here each row is bounded against its PREDECESSOR in a declared
ordering, so the check is inherently relational: append-only version
counters, event timestamps that must not run backwards per session,
cumulative totals, retry counters.

Scale contract (10^12 rows): one window = one hash-partitioned Exchange on
the group key + per-partition sort — identical shuffle shape to any
groupBy on the same key (AQE handles skewed groups). Row data shuffles
ONCE; no joins, no self-join (the naive pairs formulation is a row-grain
self-join — strictly worse). The order column + run key form the total
order, so lag() is deterministic even under order-column ties.

``by=None`` (whole-table ordering) funnels every row through ONE partition
for the global sort — correct, but fixtures/small-table only; declare a
group column at scale (same caveat as functions/packing.py's global
window, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DIRECTIONS = {
    "nonDecreasing": "<",   # violation when cur <  prev
    "increasing": "<=",     # violation when cur <= prev
    "nonIncreasing": ">",   # violation when cur >  prev
    "decreasing": ">=",     # violation when cur >= prev
}
_COLUMN_OPS = {
    "nonDecreasing": lambda c, p: c < p,
    "increasing": lambda c, p: c <= p,
    "nonIncreasing": lambda c, p: c > p,
    "decreasing": lambda c, p: c >= p,
}


def monotonic_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    order_by: str,
    by: str,
    direction: str = "nonDecreasing",
    max_step: float | None = None,
    min_step: float | None = None,
) -> DataFrame:
    """``x-monotonic {"verdicts": "perGroup"}``: one verdict row per
    ``by``-group — (partition_id=group, check_id, passed, metric_value=
    #violations, threshold=0). Groups with an unbroken run report
    passed=true, so the verdict set enumerates EVERY group, not just the
    failing ones (the per-partition pass/fail contract).

    Plan note: the groupBy(``by``) consumes the window's existing
    hash-partitioning on ``by`` — verdicts cost ZERO extra Exchange over
    the violations pass (plan-asserted in tests)."""
    if direction not in _DIRECTIONS:
        raise ValueError(
            f"direction must be one of {sorted(_DIRECTIONS)}, "
            f"got {direction!r}")
    w = Window.partitionBy(by).orderBy(F.col(order_by), F.col(key))
    prev = F.lag(column).over(w)
    cur = F.col(column)
    breaks = _COLUMN_OPS[direction](cur, prev)
    if max_step is not None:
        breaks = breaks | (cur.cast("double") - prev.cast("double")
                           > float(max_step))
    if min_step is not None:
        breaks = breaks | (cur.cast("double") - prev.cast("double")
                           < float(min_step))
    # keep the ORIGINAL `by` attribute through window -> groupBy: aliasing
    # it first would hide the window's hash-partitioning from the
    # aggregate and buy a second Exchange
    flagged = df.select(
        F.col(by),
        (cur.isNotNull() & prev.isNotNull() & breaks)
        .cast("int").alias("__bad"),
    )
    return (
        flagged.groupBy(by)
        .agg(F.sum("__bad").alias("nmo"))
        .select(
            F.coalesce(F.col(by).cast("string"),
                       F.lit("<null>")).alias("partition_id"),
            F.lit(check_id).alias("check_id"),
            (F.col("nmo") == 0).alias("passed"),
            F.col("nmo").cast("double").alias("metric_value"),
            F.lit(0.0).cast("double").alias("threshold"),
        )
    )


def monotonic_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    order_by: str,
    by: str | None = None,
    direction: str = "nonDecreasing",
    max_step: float | None = None,
    min_step: float | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """``x-monotonic`` execution: rows that break the declared monotonic
    run as engine violation rows (doc_id, check_id, observed, expected).

    ``order_by`` defines the sequence (tie-broken by ``key`` for a total
    order); ``by`` scopes independent runs (session, device, partition).
    A row violates when ``column`` compared to its predecessor's value
    fails ``direction``. Strict lag(1) semantics: each row is compared to
    its IMMEDIATE predecessor only, and pairs where either side is NULL
    never violate (`type`/`required`/x-nullRate police nulls — a NULL
    simply breaks the chain for one comparison). observed =
    ``prev=<v>,cur=<v>`` (CAST AS STRING rendering — use integer /
    decimal / timestamp columns for cross-engine-stable witnesses).

    ``max_step`` / ``min_step`` additionally bound the consecutive DELTA
    ``cur − prev`` (numeric columns; cast timestamps to epoch seconds at
    the call site): ``max_step`` catches GAPS — a heartbeat that skipped
    an hour is a silent outage x-freshness's end-of-feed check can't see
    — and ``min_step`` catches bursts/duplicate readings. Same window,
    same single shuffle; a row violates when EITHER the direction or a
    step bound breaks.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(
            f"direction must be one of {sorted(_DIRECTIONS)}, "
            f"got {direction!r}")
    if by is None and not allow_global:
        # the x-contiguous refusal convention (uniform across the window
        # family since r5): a whole-table ordering funnels every row
        # through ONE task — refuse with guidance instead of degrading
        raise ValueError(
            "x-monotonic with by=None sorts the whole table in ONE "
            "partition — declare 'by', or pass allowGlobal=true for a "
            "genuinely single-series table")
    part = [by] if by is not None else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(F.col(order_by), F.col(key))
    prev = F.lag(column).over(w)
    cur = F.col(column)
    op = _DIRECTIONS[direction]
    viol = F.expr(f"cur_v {op} prev_v")
    exp_extra = []
    if max_step is not None:
        viol = viol | (F.col("cur_v").cast("double")
                       - F.col("prev_v").cast("double")
                       > float(max_step))
        exp_extra.append(f"step <= {max_step}")
    if min_step is not None:
        viol = viol | (F.col("cur_v").cast("double")
                       - F.col("prev_v").cast("double")
                       < float(min_step))
        exp_extra.append(f"step >= {min_step}")
    scope = f" per {by}" if by else ""
    exp_msg = f"{column} {direction} over {order_by}{scope}" + (
        " and " + " and ".join(exp_extra) if exp_extra else "")
    return (
        df.select(
            F.col(key).alias("__key"),
            cur.alias("cur_v"),
            prev.alias("prev_v"),
        )
        .where(F.col("cur_v").isNotNull() & F.col("prev_v").isNotNull()
               & viol)
        .select(
            F.col("__key").cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat_ws(
                ",",
                F.concat(F.lit("prev="),
                         F.col("prev_v").cast("string")),
                F.concat(F.lit("cur="), F.col("cur_v").cast("string")),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )
