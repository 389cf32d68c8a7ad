"""Funnel and retention analytics over event streams — the classic
web-analytics pair, expressed as single-shuffle window chains.

``funnel``: how many keys (users) progressed through an ORDERED chain of
step predicates — each step strictly after the previous one in event
time.  The naive formulations are k self-joins (step i ⋈ step i-1 per
user — quadratic on hot users) or a per-user ``collect_list`` fold
(unbounded state on hot keys).  Here each step is a RUNNING
``min(CASE WHEN step_i-qualifies THEN ts END)`` window over the same
(key, ts) ordering: step i qualifies on a row iff the row matches the
predicate AND its timestamp is strictly after the running step-(i-1)
time.  k chained window expressions share ONE partitioning+sort (one
Exchange; Catalyst stacks the Window nodes over a single Sort), the
per-key roll-up reuses that partitioning (zero extra Exchange), and the
final step-count aggregate is k columns over #keys rows.  State per row
is k timestamps — independent of per-user event counts.

``retention_cohorts``: users bucketed by the period of their FIRST
event (cohort), counted per (cohort, periods-since) activity cell.
First-touch is a running ``min`` over the same per-key window (one
Exchange), the distinct-triple reduction and the cell count ride on
progressively smaller data.  Periods are exact integer arithmetic on
epoch-micros (floor-div), so cells replay identically in ANSI SQL.

Both are full-value-hash oracled in the driver mirror
(``events_funnel``, ``events_retention``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _micros(col):
    return F.unix_micros(col.cast("timestamp"))


def funnel(
    df: DataFrame,
    key: str,
    ts: str,
    steps: list[tuple[str, str]],
    within_seconds: float | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts.

    ``steps`` is an ordered list of ``(name, sql_condition)`` pairs
    (conditions are Spark SQL boolean expressions over the row, e.g.
    ``"event_type = 'signup'"``).  A key converts through step i when
    some row matches condition i STRICTLY AFTER its earliest step-(i-1)
    completion (first-touch semantics: the earliest valid chain is
    used, matching the standard product-analytics definition).
    ``within_seconds`` additionally requires every later step to land
    within the window after the step-1 time.

    Returns one row per step: ``(step_idx, step_name, n_converted)``
    with ``n_converted`` monotonically non-increasing.

    Rows with NULL timestamps never qualify for any step.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    m = _micros(F.col(ts))
    w = (Window.partitionBy(key).orderBy(m.asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df
    prev = None
    for i, (_, cond) in enumerate(steps):
        qual = F.expr(cond) & m.isNotNull()
        if i > 0:
            qual = qual & F.col(f"__r{i - 1}").isNotNull() \
                & (m > F.col(f"__r{i - 1}"))
            if within_seconds is not None:
                tol = int(round(float(within_seconds) * 1_000_000))
                qual = qual & (m <= F.col("__r0") + F.lit(tol))
        # running earliest completion time of step i (must be its own
        # projection so the next step's window references an attribute,
        # not a nested window expression)
        out = out.withColumn(
            f"__r{i}", F.min(F.when(qual, m)).over(w))
        prev = f"__r{i}"
    per_key = out.groupBy(key).agg(
        *[F.max(F.col(f"__r{i}").isNotNull()).alias(f"__s{i}")
          for i in range(len(steps))])
    counts = per_key.agg(
        *[F.sum(F.col(f"__s{i}").cast("long")).alias(f"__n{i}")
          for i in range(len(steps))])
    rows = F.array(*[
        F.struct(F.lit(i).alias("step_idx"),
                 F.lit(name).alias("step_name"),
                 F.col(f"__n{i}").alias("n_converted"))
        for i, (name, _) in enumerate(steps)])
    return (counts.select(F.explode(rows).alias("s"))
            .select("s.step_idx", "s.step_name", "s.n_converted"))


def retention_cohorts(
    df: DataFrame,
    key: str,
    ts: str,
    period_seconds: float = 604800.0,
) -> DataFrame:
    """Cohort retention matrix: ``(cohort_period, periods_since,
    n_users)`` — users whose FIRST event falls in ``cohort_period``
    (floor(first_ts / period) on epoch-micros) and who were active
    ``periods_since`` periods later.  ``periods_since = 0`` row is the
    cohort size.  NULL timestamps are excluded.
    """
    p_us = int(round(float(period_seconds) * 1_000_000))
    if p_us <= 0:
        raise ValueError("period_seconds must be positive")
    m = _micros(F.col(ts))
    w = Window.partitionBy(key)
    act = (df.where(F.col(ts).isNotNull())
           .select(F.col(key),
                   F.floor(m / F.lit(p_us)).cast("long").alias("__p"))
           .withColumn("__first", F.min("__p").over(w)))
    return (act
            .select(F.col(key), F.col("__first").alias("cohort_period"),
                    (F.col("__p") - F.col("__first"))
                    .alias("periods_since"))
            .distinct()
            .groupBy("cohort_period", "periods_since")
            .agg(F.count(F.lit(1)).alias("n_users")))


def funnel_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    ts: str,
    steps: list[tuple[str, str]],
    min_rates: list[float],
    within_seconds: float | None = None,
) -> DataFrame:
    """``x-funnel`` execution: step-to-step conversion-rate floors over
    the ordered funnel — "at least 30% of signups must view, at least
    5% of viewers must purchase" as a declarative VALIDATION check (the
    product-health contract a deploy can silently break: every row is
    individually valid, every session well-formed; the failure is the
    RATE between chain steps).  ``min_rates[i]`` floors
    n_converted(step i+1) / n_converted(step i).

    One violation row per failing transition: doc_id = the failing
    step's name, observed = ``rate=<dec>,n=<to>,prev=<from>``.  A
    transition whose upstream count is 0 has an undefined rate and is
    suppressed (try_divide NULL — no signal, no false alarm).

    Scale: the funnel itself is the k-chained-window single-Exchange
    plan; the rate gate is a lag over the K-ROW counts result (k = a
    handful — the single-partition window is over step rows, never
    data rows)."""
    if len(min_rates) != len(steps) - 1:
        raise ValueError(
            f"min_rates needs {len(steps) - 1} entries "
            f"(one per transition), got {len(min_rates)}")
    counts = funnel(df, key, ts, steps, within_seconds=within_seconds)
    # explicit single partition over the K step rows (K = a handful) —
    # keeps the WindowExec warning reserved for real data-scale hazards
    w = Window.partitionBy(F.lit(0)).orderBy("step_idx")
    rates = F.array(*[F.lit(float(r)) for r in min_rates])
    out = (counts
           .withColumn("__prev", F.lag("n_converted").over(w))
           .withColumn("__rate",
                       F.try_divide(F.col("n_converted"), F.col("__prev")))
           .withColumn("__floor",
                       F.when(F.col("step_idx") >= 1,
                              F.element_at(rates, F.col("step_idx")))))
    bad = (F.col("__rate").isNotNull() & F.col("__floor").isNotNull()
           & (F.col("__rate") < F.col("__floor")))
    exp = (f"step conversion rates >= {[float(r) for r in min_rates]} "
           f"over steps {[n for n, _ in steps]}")
    return out.where(bad).select(
        F.col("step_name").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("rate="),
            F.round(F.col("__rate"), 6).cast("decimal(10,6)")
            .cast("string"),
            F.lit(",n="), F.col("n_converted").cast("string"),
            F.lit(",prev="), F.col("__prev").cast("string"),
        ).alias("observed"),
        F.lit(exp).alias("expected"),
    )
