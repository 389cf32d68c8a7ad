"""Level-shift (changepoint) detection: the point in a per-group series
where the rolling mean JUMPS (``x-levelShift``).

The positional complement of ``x-drift``: drift statistics compare the
column's overall distribution against a baseline and cannot say WHERE a
change happened — a sensor that recalibrates mid-series, a price feed
that switches units, a metric that steps after a deploy all produce a
LEVEL SHIFT at a specific position that whole-distribution tests dilute
(half the data at each level looks like a wide distribution, not a
step).  x-monotonic's maxStep sees single-row jumps; this sees jumps of
the LOCAL MEAN, robust to row noise.

Method: two adjacent trailing windows of ``window`` rows each — prior
[i−2w+1, i−w] and recent [i−w+1, i] — per group in a declared order;
shift(i) = |mean_recent − mean_prior|, defined only where BOTH windows
are full (edges are silent, not false alarms).  The violation is the
group's MAXIMUM shift when it exceeds the declared bound, reported with
the order-value where it peaked — one row per offending group, found by
a rank-1 window, not a collect.

Scale contract: the two mean windows and the rank window share ONE
hash-partition Exchange on the group key (the rank re-sorts within
partitions).  ``by=None`` funnels through a single partition for the
global sort — fixtures only, same caveat as ordering.py/intervals.py.

Oracle: the full window chain + QUALIFY rank replay in DuckDB; witness
shift rendered as decimal(20,4).  Cross-engine caveat: two positions
whose shifts differ by float ulps could rank-swap between engines — the
tie-break is (shift, order) descending, and real series make exact
near-ties vanishingly rare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def level_shifts(
    df: DataFrame,
    column: str,
    order_by: str,
    key: str,
    by: str | None = None,
    window: int = 20,
    allow_global: bool = False,
) -> DataFrame:
    """Per-row level-shift series: input columns + ``__shift`` (NULL
    where either window is not yet full).  Building block for
    :func:`level_shift_violations`; exposed for exploratory use."""
    n = int(window)
    if n < 2:
        raise ValueError("window must be >= 2")
    if by is None and not allow_global:
        # the x-contiguous refusal convention (uniform since r5)
        raise ValueError(
            "x-levelShift with by=None sorts the whole table in ONE "
            "partition — declare 'by', or pass allowGlobal=true for a "
            "genuinely single-series table")
    part = [F.col(by)] if by is not None else [F.lit(1)]
    val = F.col(column).cast("double")
    order = [F.col(order_by).asc_nulls_first(), F.col(key)]
    rec = (Window.partitionBy(*part).orderBy(*order)
           .rowsBetween(-(n - 1), 0))
    pri = (Window.partitionBy(*part).orderBy(*order)
           .rowsBetween(-(2 * n - 1), -n))
    full = ((F.count(val).over(rec) == n)
            & (F.count(val).over(pri) == n))
    return df.withColumn(
        "__shift",
        F.when(full, F.abs(F.avg(val).over(rec) - F.avg(val).over(pri))))


def level_shift_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    order_by: str,
    by: str | None = None,
    window: int = 20,
    max_shift: float = 1.0,
    allow_global: bool = False,
) -> DataFrame:
    """``x-levelShift`` execution: one violation row per group whose
    peak rolling-mean shift exceeds ``max_shift`` — (doc_id=group,
    observed=``shift=<dec>,at=<order-value>``).  Pass a NUMERIC
    ``order_by`` (e.g. epoch micros) so the ``at=`` witness renders
    identically across engines."""
    s = level_shifts(df, column, order_by, key, by=by, window=window,
                     allow_global=allow_global)
    part = [F.col(by)] if by is not None else [F.lit(1)]
    rank = Window.partitionBy(*part).orderBy(
        F.col("__shift").desc_nulls_last(),
        F.col(order_by).desc(), F.col(key).desc())
    top = (s.withColumn("__rn", F.row_number().over(rank))
           .where((F.col("__rn") == 1)
                  & F.col("__shift").isNotNull()
                  & (F.col("__shift") > F.lit(float(max_shift)))))
    doc = (F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
           if by is not None else F.lit("<global>"))
    scope = f" per {by}" if by else ""
    exp_msg = (f"max |mean(last {int(window)}) - mean(prior "
               f"{int(window)})| of {column} <= {max_shift:g}{scope}")
    return top.select(
        doc.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("shift="),
            F.round(F.col("__shift"), 4).cast("decimal(20,4)")
            .cast("string"),
            F.lit(",at="),
            F.col(order_by).cast("string"),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )
