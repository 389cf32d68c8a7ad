"""Cohort metric parity: the ``x-cohortParity`` keyword — every
cohort's metric must stay within ``maxGap`` of a declared BASELINE
cohort's, per group or globally.

The A/B-sanity and split-balance gate the statistical family lacks:
``x-compliance`` bounds one group's rate against a CONSTANT,
``x-outlier`` learns an envelope from the group's own history — neither
can say "the treatment arm's conversion must sit within 2 points of
control", "the test split's mean token count must match train's", or
the fairness form "this quality metric may not differ across
demographic buckets by more than X".  The subject is a RELATIVE gap
between sibling populations of the same table, measured the same way
at the same time — immune to the global drift that breaks
constant-threshold checks (if the whole metric moves, both cohorts
move, the gap doesn't).

Metrics: ``mean`` of the checked column (pairwise-deleted NULLs), or
``rate`` of an arbitrary SQL boolean (NULL ⇒ non-compliant,
``x-compliance``'s convention — exact-integer p/n, bit-identical across
engines).

Scale contract: ONE map-side-combined conditional aggregate
``groupBy(by?, cohort)`` — #cohort-cells rows downstream; the baseline's
metric reaches its siblings through a single-frame window over those
cells (``max(case when cohort = baseline)``), never a join or second
scan.  Cohorts under ``minCount`` rows and groups whose baseline cohort
is ABSENT or thin are suppressed (a missing baseline is
``x-partitionComplete``'s job, not a parity violation).

Reference: dataset-scope lift with no analog in the reference's row
keywords (validators.rs); ≙ the two-sample location-gap gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _cohort_stats(df: DataFrame, column: str, cohort_col: str,
                  baseline: str, metric: str, expr: str | None,
                  by: str | None, min_count: int) -> DataFrame:
    """Per-(by?, cohort) metric + the group's baseline metric:
    ``(by?, __cohort, __m, __mb, __n)``.  ``__mb`` is NULL when the
    baseline cohort is absent or under ``min_count`` (suppressing the
    whole group)."""
    if metric == "mean":
        c = F.col(column).cast("double")
        aggs = [F.sum(c).alias("__s"),
                F.count(c).alias("__n")]
        mcol = F.try_divide(F.col("__s"), F.col("__n"))
    elif metric == "median":
        # exact interpolated percentile (the MAD-outlier pattern —
        # DuckDB quantile_cont replays it bit-for-bit); robust to the
        # outliers that drag a mean-gap check: the fairness form
        # usually wants the TYPICAL member's experience, not the tail's
        c = F.col(column).cast("double")
        aggs = [F.percentile(c, F.lit(0.5)).alias("__s"),
                F.count(c).alias("__n")]
        mcol = F.col("__s")
    elif metric == "rate":
        if not expr:
            raise ValueError("x-cohortParity metric 'rate' needs expr")
        ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
        aggs = [F.sum(ok.cast("long")).alias("__s"),
                F.count(F.lit(1)).alias("__n")]
        mcol = F.try_divide(F.col("__s"), F.col("__n"))
    else:
        raise ValueError(f"x-cohortParity metric must be 'mean', "
                         f"'median', or 'rate', got {metric!r}")
    gcols = [by] if by is not None else []
    ch = F.col(cohort_col).cast("string")
    g = (df.where(ch.isNotNull())
         .groupBy(*gcols, ch.alias("__cohort")).agg(*aggs))
    # explicit single partition for the global-cohort frame (#cohorts
    # rows, post-aggregation — bounded): keeps the WindowExec "No
    # Partition Defined" warning reserved for real hazards (VERDICT r5)
    w = (Window.partitionBy(*gcols) if gcols
         else Window.partitionBy(F.lit(0)))
    base_m = F.max(F.when(
        (F.col("__cohort") == F.lit(str(baseline)))
        & (F.col("__n") >= F.lit(int(min_count))), mcol)).over(w)
    return g.select(*gcols, F.col("__cohort"), mcol.alias("__m"),
                    base_m.alias("__mb"), F.col("__n"))


def cohort_parity_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    cohort_col: str,
    baseline: str,
    max_gap: float,
    metric: str = "mean",
    expr: str | None = None,
    by: str | None = None,
    min_count: int = 1,
) -> DataFrame:
    """``x-cohortParity`` execution: non-baseline cohorts whose metric
    sits more than ``max_gap`` from the baseline cohort's, as engine
    violation rows.  observed renders the metric, the baseline's, and
    the signed gap as decimal(14,6) (rate is exact-integer division;
    mean carries ~1e-12 float-sum noise — fixture margins are checked
    at registration, the x-correlation convention)."""
    if not (float(max_gap) > 0):
        raise ValueError(f"max_gap must be > 0, got {max_gap}")
    g = _cohort_stats(df, column, cohort_col, baseline, metric, expr,
                      by, min_count)
    gap = F.col("__m") - F.col("__mb")
    bad = (F.col("__mb").isNotNull() & F.col("__m").isNotNull()
           & (F.col("__cohort") != F.lit(str(baseline)))
           & (F.col("__n") >= F.lit(int(min_count)))
           & (F.abs(gap) > F.lit(float(max_gap))))
    gcols = [by] if by is not None else []
    doc = (F.concat(F.coalesce(F.col(by).cast("string"), F.lit("<null>")),
                    F.lit("|"), F.col("__cohort"))
           if by is not None else F.col("__cohort"))
    what = f"rate({expr})" if metric == "rate" else f"{metric}({column})"
    scope = f" per {by}" if by else ""
    exp_msg = (f"|{what} - {what}@{baseline}| <= {float(max_gap):g}"
               f"{scope} (min_count={int(min_count)})")

    def _d(c):
        return F.round(c, 6).cast("decimal(14,6)").cast("string")

    return g.where(bad).select(
        doc.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("m="), _d(F.col("__m")),
            F.lit(",base="), _d(F.col("__mb")),
            F.lit(",gap="), _d(gap),
            F.lit(",n="), F.col("__n").cast("string"),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )


def cohort_parity_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    cohort_col: str,
    baseline: str,
    max_gap: float,
    metric: str = "mean",
    expr: str | None = None,
    by: str | None = None,
    min_count: int = 1,
) -> DataFrame:
    """``x-cohortParity {"verdicts": "perGroup"}``: every cohort
    (including the baseline itself and passing ones) enumerated with
    its signed gap to the baseline as metric_value — partition_id =
    cohort (``by|cohort`` when grouped).  Suppressed cells (thin
    cohort, absent baseline) report passed=True with gap NULL→0."""
    if not (float(max_gap) > 0):
        raise ValueError(f"max_gap must be > 0, got {max_gap}")
    g = _cohort_stats(df, column, cohort_col, baseline, metric, expr,
                      by, min_count)
    gap = F.col("__m") - F.col("__mb")
    bad = (F.col("__mb").isNotNull() & F.col("__m").isNotNull()
           & (F.col("__cohort") != F.lit(str(baseline)))
           & (F.col("__n") >= F.lit(int(min_count)))
           & (F.abs(gap) > F.lit(float(max_gap))))
    doc = (F.concat(F.coalesce(F.col(by).cast("string"), F.lit("<null>")),
                    F.lit("|"), F.col("__cohort"))
           if by is not None else F.col("__cohort"))
    return g.select(
        doc.alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~bad).alias("passed"),
        F.coalesce(gap, F.lit(0.0)).cast("double").alias("metric_value"),
        F.lit(float(max_gap)).cast("double").alias("threshold"),
    )
