"""Cross-column correlation: pairwise Pearson matrices for profiling
and the ``x-correlation`` keyword (per-group correlation bounds).

The cross-COLUMN statistical family: every other statistical check in
the engine treats one column at a time (x-stats aggregates it,
x-outlier envelopes it, x-drift compares its distribution) — but "these
two columns must track" (paired sensors, price vs. quantity) and its
inverse "this feature must NOT correlate with time" (leakage/drift
detection on training data) are relations BETWEEN columns that none of
them can see.

Scale contract: everything here is conditional aggregation — Pearson's
r is a streaming-mergeable moment statistic, so ``F.corr`` rides the
same map-side-combined groupBy as any count.  ``correlation_matrix``
computes all k·(k−1)/2 pairs in ONE aggregate pass (one shuffle of
#groups rows, never a per-pair scan); ``correlation_violations`` is one
conditional aggregate + residual filter, exactly the x-eventOrder
shape.  Spark's ``corr`` and DuckDB's ``corr`` are both sample Pearson,
so the driver oracle replays the math to float precision (witnesses are
rounded decimals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def order_window(by: str | None, order_by: str, key: str,
                 allow_global: bool = False):
    """The lag-window convention shared by every lead/lag operator
    (x-seasonality, x-correlation's lag form): partition by the group,
    order by the ``(order_by, key)`` TOTAL order so ``lag()`` is
    deterministic under order-column ties (the x-monotonic rule).
    Rows with a NULL order value have no position in the sequence and
    must be excluded by the caller BEFORE staging — otherwise they
    sort first and silently occupy lag slots.

    ``by=None`` is REFUSED unless ``allow_global=True`` (spec knob
    ``allowGlobal``): a global sequence window funnels every row through
    ONE task — the x-contiguous refusal convention, applied uniformly to
    the whole window family since r5. The escape hatch exists for
    genuinely single-series data (one global metric timeline), where the
    row count is the series length, not the table size."""
    from pyspark.sql import Window

    if by is None and not allow_global:
        raise ValueError(
            "global sequence window (by=None) funnels every row through "
            "ONE partition — declare a group column, or pass "
            "allowGlobal=true for a genuinely single-series table")
    # lit(1): same single partition, but explicit — the opt-in is the
    # allowGlobal refusal above, so the WindowExec warning stays
    # reserved for unintended hazards
    base = (Window.partitionBy(by) if by is not None
            else Window.partitionBy(F.lit(1)))
    return base.orderBy(F.col(order_by), F.col(key))


def _safe_corr(a: Column, b: Column) -> Column:
    """Pearson r as ``try_divide(covar_samp, sx·sy)`` — mathematically
    identical to ``F.corr`` (the (n−1) normalizations cancel) but NULL
    instead of ANSI DIVIDE_BY_ZERO on a zero-variance side, matching
    DuckDB's corr semantics.  Requires the pairwise-complete slice
    (rows where either side is NULL are excluded by the caller's
    conditional) so the moments line up."""
    both = a.isNotNull() & b.isNotNull()
    pa = F.when(both, a)
    pb = F.when(both, b)
    return F.try_divide(
        F.covar_samp(pa, pb),
        F.stddev_samp(pa) * F.stddev_samp(pb))


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    by: str | None = None,
) -> DataFrame:
    """All pairwise Pearson correlations of ``cols`` (numeric), per
    ``by``-group (or globally), as tidy rows ``(by?, col_a, col_b,
    corr, n)`` with ``col_a < col_b`` lexicographically.  One aggregate
    pass computes every pair; NULL corr (a zero-variance side or < 2
    complete pairs) is kept as NULL — the caller decides whether
    undefined correlation is a finding."""
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    pairs = [(a, b) for i, a in enumerate(sorted(cols))
             for b in sorted(cols)[i + 1:]]
    aggs = []
    for a, b in pairs:
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        aggs.append(_safe_corr(ca, cb).alias(f"__c_{a}_{b}"))
        aggs.append(
            F.count(F.when(ca.isNotNull() & cb.isNotNull(), 1))
            .alias(f"__n_{a}_{b}"))
    if by is not None:
        g = df.groupBy(F.col(by)).agg(*aggs)
        id_cols = [F.col(by)]
    else:
        g = df.agg(*aggs)
        id_cols = []
    rows = F.array(*[
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 F.col(f"__c_{a}_{b}").alias("corr"),
                 F.col(f"__n_{a}_{b}").alias("n"))
        for a, b in pairs])
    return (g.select(*id_cols, F.explode(rows).alias("p"))
            .select(*id_cols, "p.col_a", "p.col_b", "p.corr", "p.n"))


def correlation_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    with_col: str,
    by: str | None = None,
    min_corr: float | None = None,
    max_corr: float | None = None,
    min_count: int = 3,
    lag: int = 0,
    order_by: str | None = None,
    key: str | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """``x-correlation`` execution: groups whose Pearson r between
    ``column`` and ``with_col`` falls outside [min_corr, max_corr], as
    engine violation rows.

    ``lag > 0`` is the LEAD-LAG (cross-correlation) form:
    r(column_t, with_{t-lag}) over the ``(order_by, key)`` total order
    (the x-monotonic tie convention) — "this metric tracks that one k
    steps EARLIER" (cause precedes effect: clicks lead purchases by a
    step) and the leakage inverse "this feature must NOT track the
    future label at any declared lead".  Same plan shape as
    x-seasonality: one lag window whose hash-partitioning the moment
    aggregate consumes — a single Exchange, never a self-join.  The
    zero-lag default keeps the original shuffle-free-when-grouped
    conditional aggregate.

    ``by=None`` checks ONE global correlation (single-row aggregate —
    fine at any scale for the zero-lag form); with ``lag`` the global
    sort funnels through one partition, so it is REFUSED unless
    ``allow_global=True`` (spec knob ``allowGlobal`` — the x-contiguous
    refusal convention, uniform across the window family since r5).
    Groups with fewer than ``min_count`` complete pairs or undefined r
    (zero variance) never violate — too little signal to call, same
    suppression contract as x-outlier.  observed renders r as
    decimal(10,4) for cross-engine witness stability.
    """
    if min_corr is None and max_corr is None:
        raise ValueError("x-correlation needs min and/or max")
    if lag:
        if int(lag) < 1:
            raise ValueError(
                f"lag must be >= 1 (omit it for the zero-lag form), "
                f"got {lag}")
        if order_by is None or key is None:
            raise ValueError("x-correlation with lag needs orderBy "
                             "(and a run key) to define the sequence")
    ca = F.col(column).cast("double")
    cb = F.col(with_col).cast("double")
    if lag:
        w = order_window(by, order_by, key, allow_global=allow_global)
        # keep the ORIGINAL `by` attribute through window -> groupBy
        # so the aggregate consumes the window's hash-partitioning; a
        # NULL order value has no position in the sequence
        cols = ([F.col(by)] if by is not None else []) + [
            ca.alias("__a"), F.lag(cb, int(lag)).over(w).alias("__b")]
        df = df.where(F.col(order_by).isNotNull()).select(*cols)
        ca, cb = F.col("__a"), F.col("__b")
    aggs = [
        _safe_corr(ca, cb).alias("__r"),
        F.count(F.when(ca.isNotNull() & cb.isNotNull(), 1)).alias("__n"),
    ]
    if by is not None:
        g = df.groupBy(F.col(by)).agg(*aggs)
        doc = F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
    else:
        g = df.agg(*aggs)
        doc = F.lit("<global>")
    out_of_bounds = F.lit(False)
    if min_corr is not None:
        out_of_bounds = out_of_bounds | (F.col("__r") < F.lit(float(min_corr)))
    if max_corr is not None:
        out_of_bounds = out_of_bounds | (F.col("__r") > F.lit(float(max_corr)))
    bad = (F.col("__r").isNotNull()
           & (F.col("__n") >= F.lit(int(min_count)))
           & out_of_bounds)
    lo = "-inf" if min_corr is None else f"{float(min_corr):g}"
    hi = "inf" if max_corr is None else f"{float(max_corr):g}"
    scope = f" per {by}" if by else ""
    rhs = (f"{with_col}[t-{int(lag)} over {order_by}]" if lag
           else with_col)
    exp_msg = (f"corr({column}, {rhs}) in [{lo}, {hi}]{scope} "
               f"(min_count={min_count})")
    return (
        g.where(bad)
        .select(
            doc.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("r="),
                F.round(F.col("__r"), 4).cast("decimal(10,4)")
                .cast("string"),
                F.lit(",n="),
                F.col("__n").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )
