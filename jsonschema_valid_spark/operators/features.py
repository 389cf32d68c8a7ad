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


def standardize(
    df: DataFrame,
    cols: list[str],
    by: str | None = None,
    method: str = "zscore",
    suffix: str = "_std",
) -> DataFrame:
    """Feature scaling: adds ``{col}{suffix}`` for every input column —
    ``zscore`` ((v − mean)/stddev) or ``minmax`` ((v − min)/(max − min)
    into [0, 1]) — per ``by``-group or globally.

    The train-prep twin of x-outlier's envelope: ONE stats aggregate
    (#groups rows, every column's moments in the same pass) broadcast
    back onto the unshuffled fact scan as a codegen projection — the
    fact side is never hash-partitioned.  Zero-variance / constant
    columns scale to NULL (``try_divide`` — no ANSI division error, no
    silent fake zero); the caller decides whether constants belong in
    the feature set."""
    if method not in ("zscore", "minmax"):
        raise ValueError("method must be 'zscore' or 'minmax'")
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        if method == "zscore":
            aggs += [F.avg(v).alias(f"__m_{c}"),
                     F.stddev_samp(v).alias(f"__s_{c}")]
        else:
            aggs += [F.min(v).alias(f"__m_{c}"),
                     F.max(v).alias(f"__s_{c}")]
    if by is not None:
        stats = df.groupBy(F.col(by).alias("__grp")).agg(*aggs)
        joined = df.join(F.broadcast(stats),
                         F.col(by).eqNullSafe(F.col("__grp")))
    else:
        stats = df.agg(*aggs)
        joined = df.crossJoin(F.broadcast(stats))
    out = joined
    for c in cols:
        v = F.col(c).cast("double")
        if method == "zscore":
            scaled = F.try_divide(v - F.col(f"__m_{c}"),
                                  F.col(f"__s_{c}"))
        else:
            scaled = F.try_divide(v - F.col(f"__m_{c}"),
                                  F.col(f"__s_{c}") - F.col(f"__m_{c}"))
        out = out.withColumn(f"{c}{suffix}", scaled)
    drop = ([f"__m_{c}" for c in cols] + [f"__s_{c}" for c in cols]
            + (["__grp"] if by is not None else []))
    return out.drop(*drop)
