"""Per-group linear-trend slope bounds: the ``x-trend`` keyword.

The DIRECTIONAL member of the statistical family.  x-correlation bounds
how tightly two columns track (unitless r ∈ [-1, 1]) but a correlation
of 0.99 says nothing about RATE — a metric may track time perfectly
while climbing 0.001/hour or 900/hour.  x-levelShift sees a step at one
position; x-monotonic maxStep sees one row's jump; x-drift sees the
distribution move but not WHICH WAY PER UNIT of the ordering.  "This
queue's depth may not grow faster than 5/hour", "model-score drift must
stay within ±0.01/day", "sensor baseline creeps ≤ 0.1°C/week" are
bounds on the ORDINARY-LEAST-SQUARES SLOPE of value vs. an ordering
column, per group — none of the above can express them.

slope = covar_pop(x, y) / var_pop(x) over the pairwise-complete slice —
exactly SQL's ``regr_slope(y, x)`` (DuckDB replays it verbatim in the
oracle; the reference validator's ``minimum``/``maximum``
validators.rs:416-445 bound single values, this bounds the fitted
RATE).  Written as ``try_divide`` so a constant-x group yields NULL
instead of an ANSI DIVIDE_BY_ZERO, matching DuckDB's regr_slope NULL.

Scale contract: the slope is a moment statistic — covar_pop/var_pop are
streaming-mergeable, so this is ONE map-side-combined conditional
aggregate shuffling #groups rows, never a sort and never a window (the
OLS fit does not need ordered data, only the (x, y) pairs).  The same
shape as x-correlation/x-eventOrder: the fact scan is never
hash-partitioned by anything but the final #groups aggregate.

Cross-engine witness stability: slopes render as decimal(18,6); pick
``orderBy`` units (e.g. hours, not micros) so real slopes are O(1) and
the declared bounds sit far from rounding boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _slope(x: Column, y: Column) -> Column:
    """OLS slope of y on x over the pairwise-complete slice — SQL
    ``regr_slope(y, x)`` = covar_pop/var_pop, NULL on constant x."""
    both = x.isNotNull() & y.isNotNull()
    px = F.when(both, x)
    py = F.when(both, y)
    return F.try_divide(F.covar_pop(px, py), F.var_pop(px))


def trend_slopes(
    df: DataFrame,
    column: str,
    order_by: str,
    by: str | None = None,
) -> DataFrame:
    """Per-group OLS slope of ``column`` vs ``order_by`` as tidy rows
    ``(by?, slope, n)`` — one aggregate pass; NULL slope (constant
    ``order_by`` or no complete pairs) kept for the caller to judge.
    Building block for :func:`trend_violations`; exposed for
    profiling."""
    x = F.col(order_by).cast("double")
    y = F.col(column).cast("double")
    aggs = [
        _slope(x, y).alias("slope"),
        F.count(F.when(x.isNotNull() & y.isNotNull(), 1)).alias("n"),
    ]
    if by is not None:
        return df.groupBy(F.col(by)).agg(*aggs)
    return df.agg(*aggs)


def trend_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    order_by: str,
    by: str | None = None,
    min_slope: float | None = None,
    max_slope: float | None = None,
    min_count: int = 3,
) -> DataFrame:
    """``x-trend`` execution: groups whose OLS slope of ``column`` vs
    ``order_by`` falls outside [min_slope, max_slope], as engine
    violation rows.

    ``by=None`` checks ONE global trend (single-row aggregate).  Groups
    with fewer than ``min_count`` complete pairs or undefined slope
    (constant ``order_by``) never violate — too little signal to call,
    the x-correlation/x-outlier suppression contract.  observed renders
    the slope as decimal(18,6)."""
    if min_slope is None and max_slope is None:
        raise ValueError("x-trend needs min and/or max")
    x = F.col(order_by).cast("double")
    y = F.col(column).cast("double")
    aggs = [
        _slope(x, y).alias("__s"),
        F.count(F.when(x.isNotNull() & y.isNotNull(), 1)).alias("__n"),
    ]
    if by is not None:
        g = df.groupBy(F.col(by)).agg(*aggs)
        doc = F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
    else:
        g = df.agg(*aggs)
        doc = F.lit("<global>")
    from jsonschema_valid_spark.operators._bounds import out_of_bounds

    bad = (F.col("__s").isNotNull()
           & (F.col("__n") >= F.lit(int(min_count)))
           & out_of_bounds(F.col("__s"), min_slope, max_slope))
    lo = "-inf" if min_slope is None else f"{float(min_slope):g}"
    hi = "inf" if max_slope is None else f"{float(max_slope):g}"
    scope = f" per {by}" if by else ""
    exp_msg = (f"slope({column} vs {order_by}) in [{lo}, {hi}]{scope} "
               f"(min_count={min_count})")
    return (
        g.where(bad)
        .select(
            doc.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("slope="),
                F.round(F.col("__s"), 6).cast("decimal(18,6)")
                .cast("string"),
                F.lit(",n="),
                F.col("__n").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )


def trend_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    order_by: str,
    by: str,
    min_slope: float | None = None,
    max_slope: float | None = None,
    min_count: int = 3,
) -> DataFrame:
    """``x-trend {"by", "verdicts": "perGroup"}``: one verdict row per
    group — (partition_id=group, check_id, passed, metric_value=the
    group's OLS slope, threshold=min_slope or max_slope) — enumerating
    passing groups too, the per-partition pass/fail contract; the same
    single moment aggregate as the violations form.  Undefined slopes
    and groups under ``min_count`` pass (suppressed); their
    metric_value is NULL-as-0.0 only when undefined."""
    if min_slope is None and max_slope is None:
        raise ValueError("x-trend needs min and/or max")
    x = F.col(order_by).cast("double")
    y = F.col(column).cast("double")
    g = df.groupBy(F.col(by)).agg(
        _slope(x, y).alias("__s"),
        F.count(F.when(x.isNotNull() & y.isNotNull(), 1)).alias("__n"))
    from jsonschema_valid_spark.operators._bounds import (
        out_of_bounds,
        violated_threshold,
    )

    bad = (out_of_bounds(F.col("__s"), min_slope, max_slope)
           & F.col("__s").isNotNull()
           & (F.col("__n") >= F.lit(int(min_count))))
    thr = violated_threshold(F.col("__s"), min_slope, max_slope)
    return g.select(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
        .alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~bad).alias("passed"),
        F.coalesce(F.col("__s"), F.lit(0.0)).cast("double")
        .alias("metric_value"),
        thr.cast("double").alias("threshold"),
    )
