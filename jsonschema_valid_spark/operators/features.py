"""Trailing-window feature engineering: per-key rolling statistics and
lag features over event time — the feature-generation face of the
window machinery the validation side already uses (x-monotonic,
sessionize).

A training-data pipeline over events needs "state of the world at this
row" columns: the user's last k values, their hourly moving average,
the delta since the previous event.  These are TRAILING windows only
(rows/range PRECEDING to CURRENT) — a feature that looks forward leaks
the future into training, so no forward frame is offered by design
(the leakage inverse of ``x-correlation``'s time check).

Scale contract: every feature shares ONE hash-partition Exchange on the
key.  Row-frame features sort by (ts, tiebreak); range-frame features
sort by the numeric epoch-micros alone (Spark's ``rangeBetween``
requires a single numeric ordering) — same partitioning, so Catalyst
plans one Exchange with at most one extra in-partition Sort
(plan-asserted in tests).  Cost is independent of window length for the
moment statistics (avg/count/sum/min/max run incrementally in the
window buffer).

Determinism: row frames carry an explicit tiebreak; range frames
include ALL ties by construction.  Aggregate summation order inside a
frame can differ between engines by float ulps — the driver oracle
rounds to 6, same convention as the drift statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_STATS = {
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": F.count,
    "stddev": F.stddev_samp,
}


def _micros(col):
    return F.unix_micros(col.cast("timestamp"))


def rolling_features(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    rows_windows: list[int] | None = None,
    range_windows_seconds: list[float] | None = None,
    stats: tuple = ("avg", "min", "max", "count"),
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Adds trailing-window statistics of ``value`` per ``key``.

    ``rows_windows=[5]`` adds ``{value}_{stat}_5r`` over the previous 5
    rows INCLUDING the current one; ``range_windows_seconds=[3600]``
    adds ``{value}_{stat}_3600s`` over event time (current row minus
    the range, inclusive, to now).  NULL values are skipped by the
    aggregates (count counts non-NULL); NULL timestamps sort first in
    row frames and are excluded from range frames (no defined
    distance).
    """
    bad = [s for s in stats if s not in _STATS]
    if bad:
        raise ValueError(f"unknown stats {bad}; choose from "
                         f"{sorted(_STATS)}")
    val = F.col(value).cast("double")
    m = _micros(F.col(ts))
    out = df
    if rows_windows:
        tb = [F.col(order_tiebreak)] if order_tiebreak else []
        for n in rows_windows:
            n = int(n)
            if n < 1:
                raise ValueError("rows window must be >= 1")
            w = (Window.partitionBy(key)
                 .orderBy(m.asc_nulls_first(), *tb)
                 .rowsBetween(-(n - 1), 0))
            for s in stats:
                out = out.withColumn(
                    f"{value}_{s}_{n}r", _STATS[s](val).over(w))
    if range_windows_seconds:
        for secs in range_windows_seconds:
            us = int(round(float(secs) * 1_000_000))
            if us <= 0:
                raise ValueError("range window must be positive")
            w = (Window.partitionBy(key).orderBy(m)
                 .rangeBetween(-us, 0))
            for s in stats:
                out = out.withColumn(
                    f"{value}_{s}_{int(secs)}s",
                    F.when(m.isNotNull(), _STATS[s](val).over(w)))
    return out


def lag_features(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    lags: list[int] = (1,),
    with_delta: bool = True,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Adds ``{value}_lag_{k}`` (the key's k-th previous value in time
    order) and, with ``with_delta``, ``{value}_delta`` (current minus
    previous) plus ``{ts}_gap_micros`` (exact integer micros since the
    previous event — the heartbeat feature x-monotonic's maxStep
    polices).  Same single-Exchange window as rolling_features."""
    val = F.col(value).cast("double")
    m = _micros(F.col(ts))
    tb = [F.col(order_tiebreak)] if order_tiebreak else []
    w = Window.partitionBy(key).orderBy(m.asc_nulls_first(), *tb)
    out = df
    for k in lags:
        k = int(k)
        if k < 1:
            raise ValueError("lag must be >= 1")
        out = out.withColumn(f"{value}_lag_{k}", F.lag(val, k).over(w))
    if with_delta:
        out = (out.withColumn(f"{value}_delta",
                              val - F.lag(val, 1).over(w))
               .withColumn(f"{ts}_gap_micros", m - F.lag(m, 1).over(w)))
    return out
