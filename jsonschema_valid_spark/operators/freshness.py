"""Timeliness validation: per-group max-timestamp recency against a declared
as-of instant (``x-freshness``).

The arrival-time sibling of ``x-partitionComplete``: completeness asks "did
every declared partition arrive", freshness asks "did the data KEEP arriving"
— a feed whose max(ts) stopped advancing is stale long before a partition
goes fully missing, and no row-scope check can see it (every individual row
is valid; it is the absence of recent rows that is the failure). ≙ the
reference's `maximum`/`minimum` (validators.rs numeric bounds) lifted from a
per-instance literal bound to a bound on a per-group AGGREGATE of a
timestamp column.

Determinism contract: the reference instant (``as_of``) is DECLARED, never
read from the wall clock — the same suite on the same table always produces
the same verdict (and the DuckDB oracle can replay it). Pipelines pass their
orchestrator's logical run date.

Scale contract (10^12 rows): one map-side-combined max() aggregate over the
facts; everything after operates on #groups rows. No joins, no row data
past the partial aggregate.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, functions as F

_FMT = "yyyy-MM-dd HH:mm:ss"


def freshness_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    as_of: str,
    max_age_hours: float,
    by: str,
    max_future_hours: float | None = None,
) -> DataFrame:
    """``x-freshness {"verdicts": "perGroup"}``: one verdict row per
    ``by``-group — (partition_id=group, check_id, passed, metric_value=
    age of max(ts) in hours at the declared as-of, threshold=
    max_age_hours). Enumerates EVERY group, fresh ones as passed=true
    (the per-partition pass/fail contract); same single max() aggregate
    as the violations form. Groups with only NULL timestamps fail with a
    NULL metric."""
    asof = datetime.fromisoformat(as_of)
    cutoff = asof - timedelta(hours=float(max_age_hours))
    agg = df.groupBy(by).agg(F.max(column).alias("max_ts"))
    bad = F.col("max_ts").isNull() | (F.col("max_ts") < F.lit(cutoff))
    if max_future_hours is not None:
        horizon = asof + timedelta(hours=float(max_future_hours))
        bad = bad | (F.col("max_ts") > F.lit(horizon))
    # NTZ columns refuse a direct double cast; the ts hop interprets both
    # sides in the session tz, which cancels in the difference
    age_h = (F.lit(asof).cast("timestamp").cast("double")
             - F.col("max_ts").cast("timestamp").cast("double")) \
        / F.lit(3600.0)
    return agg.select(
        F.coalesce(F.col(by).cast("string"),
                   F.lit("<null>")).alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~bad).alias("passed"),
        age_h.alias("metric_value"),
        F.lit(float(max_age_hours)).cast("double").alias("threshold"),
    )


def freshness_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    as_of: str,
    max_age_hours: float,
    by: str | None = None,
    max_future_hours: float | None = None,
) -> DataFrame:
    """``x-freshness`` execution: stale (or future-dated) groups as engine
    violation rows (doc_id, check_id, observed, expected).

    * stale — the group's max(``column``) is older than ``as_of -
      max_age_hours`` (or the group has only NULL timestamps);
    * future — only when ``max_future_hours`` is set: max(``column``)
      exceeds ``as_of + max_future_hours`` (upstream clock skew / replayed
      data from the future — silently accepting it would let the NEXT
      run's staleness check pass vacuously).

    ``by=None`` checks the whole table as one group (doc_id "<global>").
    observed = ``<status>:<max_ts>`` with the timestamp rendered at second
    precision (sub-second truncation matches strftime in the oracle).
    """
    asof = datetime.fromisoformat(as_of)
    cutoff = asof - timedelta(hours=float(max_age_hours))
    if by is not None:
        agg = df.groupBy(by).agg(F.max(column).alias("max_ts"))
        doc = F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
    else:
        agg = df.agg(F.max(column).alias("max_ts"))
        doc = F.lit("<global>")
    stale = F.col("max_ts").isNull() | (F.col("max_ts") < F.lit(cutoff))
    conds = [(stale, "stale")]
    exp_parts = [f"max({column}) >= {cutoff:%Y-%m-%d %H:%M:%S}"]
    if max_future_hours is not None:
        horizon = asof + timedelta(hours=float(max_future_hours))
        conds.append((F.col("max_ts") > F.lit(horizon), "future"))
        exp_parts.append(f"<= {horizon:%Y-%m-%d %H:%M:%S}")
    status = F.when(conds[0][0], F.lit(conds[0][1]))
    for c, name in conds[1:]:
        status = status.when(c, F.lit(name))
    exp_msg = " and ".join(exp_parts) + (f" per {by}" if by else "")
    return (
        agg.select(
            doc.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat_ws(":", status.alias("s"),
                        F.date_format("max_ts", _FMT)).alias("observed"),
            F.lit(exp_msg).alias("expected"),
            status.alias("__status"),
        )
        .where(F.col("__status").isNotNull())
        .drop("__status")
    )
