"""Temporal self-dependence: lag-k autocorrelation bounds per group —
the ``x-seasonality`` keyword.

The SELF-dependence member of the statistical family: ``x-correlation``
bounds dependence between two COLUMNS, ``x-trend`` the linear RATE vs
an ordering, ``x-levelShift`` one positional jump — none can ask "does
this series still track ITSELF k steps ago".  Two production contracts
live there, one per bound direction:

* ``min`` — rhythm retention: an hourly metric with a daily cycle must
  keep acf@24 high; a pipeline change that scrambles ordering or drops
  the periodic driver kills the autocorrelation long before any
  distribution or mean check moves (the histogram is identical under
  permutation — drift checks are blind to ORDER by construction).
* ``max`` — independence: residuals/inter-arrival noise must NOT be
  autocorrelated.  A stuck sensor repeating its last reading, a
  zero-order-hold backfill, or a copy-paste imputation drives acf@1
  toward 1 while every value stays individually in range.

acf@k here is the Pearson r between the series and itself lagged k
steps over the pairwise-complete slice (the regression form — the same
``try_divide(covar_samp, sx·sy)`` ANSI-safe formulation as
``x-correlation``, NULL instead of DIVIDE_BY_ZERO on constant
series, matching DuckDB's ``corr`` so oracles replay to float
precision).

Scale contract: one window (``lag(value, k)`` over the (order, key)
total order — deterministic under order-column ties, the x-monotonic
convention) = ONE hash-partitioned Exchange on the group key; the
correlation is a mergeable moment aggregate whose groupBy CONSUMES the
window's hash-partitioning, so the whole check costs the same single
shuffle as the violations-only monotonic pass (plan-asserted; aliasing
the group key before the aggregate would hide the partitioning and buy
a second Exchange).  Never a self-join — the naive formulation joins
the table to itself on ``row_number ± k``.

``by=None`` funnels every row through ONE partition for the global
sort — correct, fixtures/small-table only; declare a group column at
scale (same caveat as the monotonic/packing global windows).

Reference: dataset-scope lift with no analog in the reference's row
keywords (validators.rs) — per-instance validation cannot see order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from jsonschema_valid_spark.operators.correlation import (
    _safe_corr,
    order_window,
)


def _acf_cells(df: DataFrame, column: str, key: str, order_by: str,
               lag: int, by: str | None, allow_global: bool = False):
    """(grouped-or-global aggregate, group-render column): one window
    lag + one moment aggregate; __r = acf@lag, __n = complete pairs.
    Rows with a NULL order value have no position in the sequence and
    are excluded (matching the streaming twin)."""
    if int(lag) < 1:
        raise ValueError(f"x-seasonality lag must be >= 1, got {lag}")
    w = order_window(by, order_by, key, allow_global=allow_global)
    v = F.col(column).cast("double")
    # keep the ORIGINAL `by` attribute through window -> groupBy (the
    # x-monotonic plan note: aliasing first buys a second Exchange)
    cols = ([F.col(by)] if by is not None else []) + [
        v.alias("__v"), F.lag(v, int(lag)).over(w).alias("__p")]
    staged = df.where(F.col(order_by).isNotNull()).select(*cols)
    aggs = [
        _safe_corr(F.col("__v"), F.col("__p")).alias("__r"),
        F.count(F.when(F.col("__v").isNotNull()
                       & F.col("__p").isNotNull(), 1)).alias("__n"),
    ]
    if by is not None:
        g = staged.groupBy(F.col(by)).agg(*aggs)
        doc = F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
    else:
        g = staged.agg(*aggs)
        doc = F.lit("<global>")
    return g, doc


def seasonality_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    order_by: str,
    lag: int,
    by: str | None = None,
    min_acf: float | None = None,
    max_acf: float | None = None,
    min_count: int = 3,
    allow_global: bool = False,
) -> DataFrame:
    """``x-seasonality`` execution: groups whose lag-``lag``
    autocorrelation of ``column`` (ordered by ``(order_by, key)``)
    falls outside [min_acf, max_acf], as engine violation rows.
    Groups with fewer than ``min_count`` complete pairs or undefined
    acf (constant series) never violate — too little signal to call,
    the x-correlation suppression contract.  observed renders acf as
    decimal(10,4) for cross-engine witness stability."""
    if min_acf is None and max_acf is None:
        raise ValueError("x-seasonality needs min and/or max")
    from jsonschema_valid_spark.operators._bounds import out_of_bounds

    g, doc = _acf_cells(df, column, key, order_by, lag, by,
                        allow_global=allow_global)
    bad = (F.col("__r").isNotNull()
           & (F.col("__n") >= F.lit(int(min_count)))
           & out_of_bounds(F.col("__r"), min_acf, max_acf))
    lo = "-inf" if min_acf is None else f"{float(min_acf):g}"
    hi = "inf" if max_acf is None else f"{float(max_acf):g}"
    scope = f" per {by}" if by else ""
    exp_msg = (f"acf@{int(lag)}({column} over {order_by}) in "
               f"[{lo}, {hi}]{scope} (min_count={min_count})")
    return (
        g.where(bad)
        .select(
            doc.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit(f"acf@{int(lag)}="),
                F.round(F.col("__r"), 4).cast("decimal(10,4)")
                .cast("string"),
                F.lit(",n="),
                F.col("__n").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )


def seasonality_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    order_by: str,
    lag: int,
    by: str,
    min_acf: float | None = None,
    max_acf: float | None = None,
    min_count: int = 3,
) -> DataFrame:
    """``x-seasonality {"verdicts": "perGroup"}``: every group
    enumerated with its acf@lag as metric_value — passing groups
    included, partition_id = group value (the per-partition pass/fail
    shape).  Suppressed groups (undefined acf, < min_count pairs)
    report passed=true with their (possibly NULL→0.0) metric.  The
    threshold column reports the bound the group actually crossed
    (min by default, max when only the max bound failed)."""
    if min_acf is None and max_acf is None:
        raise ValueError("x-seasonality needs min and/or max")
    from jsonschema_valid_spark.operators._bounds import (
        out_of_bounds,
        violated_threshold,
    )

    g, doc = _acf_cells(df, column, key, order_by, lag, by)
    r = F.col("__r")
    oob = out_of_bounds(r, min_acf, max_acf)
    defined = r.isNotNull() & (F.col("__n") >= F.lit(int(min_count)))
    return g.select(
        doc.alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~(defined & oob)).alias("passed"),
        F.coalesce(r, F.lit(0.0)).cast("double").alias("metric_value"),
        violated_threshold(r, min_acf, max_acf).alias("threshold"),
    )


def seasonality_acf(
    df: DataFrame,
    column: str,
    key: str,
    order_by: str,
    lag: int,
    by: str | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Per-group lag-``lag`` autocorrelation as tidy rows
    ``(group, acf, n)`` — the profiling face of the keyword (feeds
    ``suggest_seasonality_floor``).  NULL acf (constant series) is
    kept as NULL — the caller decides whether undefined
    self-dependence is a finding."""
    g, doc = _acf_cells(df, column, key, order_by, lag, by,
                        allow_global=allow_global)
    return g.select(doc.alias("group"),
                    F.col("__r").alias("acf"),
                    F.col("__n").alias("n"))


def discover_period(
    df: DataFrame,
    column: str,
    key: str,
    order_by: str,
    max_lag: int,
    by: str | None = None,
    min_count: int = 10,
    best_only: bool = False,
    allow_global: bool = False,
) -> DataFrame:
    """Period discovery: the lag-k autocorrelation of ``column`` at
    EVERY lag 1..``max_lag`` per group, as tidy rows
    ``(group, lag, acf, n)`` — the bootstrap's missing half:
    :func:`suggest_seasonality_floor` needs a declared lag, and this
    finds it (the argmax acf over candidate lags IS the dominant
    period).  ``best_only=True`` keeps one row per group — the highest
    acf among lags clearing ``min_count`` pairs, ties broken toward
    the SHORTEST lag (the fundamental beats its harmonics).

    Scale shape: all ``max_lag`` lag columns ride ONE window over the
    ``(order_by, key)`` total order (one Exchange on the group key,
    shared with the moment aggregate exactly like the keyword); the
    per-lag correlations are one aggregate pass; the explode and the
    best-only ranking operate on #groups x max_lag rows — never data.
    ``max_lag`` is capped at 128: each lag adds a window expression
    and six aggregate moments, and a longer period search belongs in
    a spectral tool, not a constraint bootstrap."""
    L = int(max_lag)
    if not (1 <= L <= 128):
        raise ValueError(f"max_lag must be in [1, 128], got {max_lag}")
    w = order_window(by, order_by, key, allow_global=allow_global)
    v = F.col(column).cast("double")
    cols = ([F.col(by)] if by is not None else []) + [v.alias("__v")] + [
        F.lag(v, k).over(w).alias(f"__p{k}") for k in range(1, L + 1)]
    staged = df.where(F.col(order_by).isNotNull()).select(*cols)
    aggs = []
    for k in range(1, L + 1):
        pk = F.col(f"__p{k}")
        aggs.append(_safe_corr(F.col("__v"), pk).alias(f"__r{k}"))
        aggs.append(F.count(F.when(F.col("__v").isNotNull()
                                   & pk.isNotNull(), 1)).alias(f"__n{k}"))
    if by is not None:
        g = staged.groupBy(F.col(by)).agg(*aggs)
        doc = F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
    else:
        g = staged.agg(*aggs)
        doc = F.lit("<global>")
    rows = F.array(*[
        F.struct(F.lit(k).alias("lag"), F.col(f"__r{k}").alias("acf"),
                 F.col(f"__n{k}").alias("n")) for k in range(1, L + 1)])
    tidy = (g.select(doc.alias("group"), F.explode(rows).alias("p"))
            .select("group", "p.lag", "p.acf", "p.n"))
    if not best_only:
        return tidy
    rw = Window.partitionBy("group").orderBy(
        F.col("acf").desc(), F.col("lag").asc())
    return (tidy.where(F.col("acf").isNotNull()
                       & (F.col("n") >= F.lit(int(min_count))))
            .withColumn("__rk", F.row_number().over(rw))
            .where(F.col("__rk") == 1).drop("__rk"))
