"""Metric anomaly detection over validation-run history.

Threshold checks (x-nullRate, x-drift, …) catch ABSOLUTE breaches; the
failures that hurt in production are RELATIVE — "violations tripled since
yesterday", "partition p07's row count fell 4σ below its trailing mean" —
while every absolute threshold still passes. This module closes that gap
(the run-over-run lift of the reference's single-shot validation,
lib.rs:114-160; in the spirit of Deequ's anomaly detectors):

* :func:`anomaly_flags` — evaluate every point of a metric series against
  its TRAILING history per series key (window functions: one shuffle on
  the series key; history bounded by ``window`` rows). Methods:
  ``zscore`` (trailing mean ± k·stddev), ``relative`` (bounded change vs
  previous point), ``absolute`` (static bounds — the degenerate case,
  here so one API covers all three).
* :class:`MetricsHistory` — a tiny append-only parquet store of verdict
  metrics per run (``run_seq``), with :meth:`MetricsHistory.check`
  evaluating the CURRENT run's verdicts against the recorded history.
  The history table is (runs × partitions × checks) — driver-small
  relative to data, safe to window.

Everything is native expressions (SQL-replayable; the driver oracle
replays the zscore path verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.utils import AnalysisException

_METHODS = ("zscore", "relative", "absolute", "seasonal")


def anomaly_flags(
    metrics: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    method: str = "zscore",
    window: int = 10,
    min_history: int = 3,
    k: float = 3.0,
    max_change: float = 0.5,
    bounds: tuple[float, float] | None = None,
    period: int | None = None,
) -> DataFrame:
    """Per-point verdicts against trailing history within each series.

    Output: ``keys…, order_col, value, stat, status`` where ``status`` ∈
    ``ok | anomaly | insufficient_history`` and ``stat`` is the method's
    evidence (zscore / relative change / the value itself), rounded to 6.

    ``zscore``: trailing window of up to ``window`` PRIOR points; fewer
    than ``min_history`` ⇒ insufficient. A zero-variance history flags any
    departure from the constant. ``relative``: |value/prev − 1| >
    ``max_change`` (prev = lag 1; prev 0 with value ≠ 0 flags).
    ``absolute``: static ``bounds`` (lo, hi) — no history needed.
    ``seasonal``: zscore against PHASE-ALIGNED history only — each point
    compares to the prior points at the same position in a ``period``-long
    cycle (Monday vs previous Mondays, 03:00 vs previous 03:00s), so a
    legitimate weekly rhythm stops tripping the plain trailing window and
    a flat Monday that's 4σ off OTHER Mondays trips even though it's
    normal for a Wednesday. ``order_col`` must be integer-like (a run
    counter, an hour number); ``window`` counts CYCLES of history. Same
    single window pass — the phase is just one more partition key.
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*keys).orderBy(order_col)
    out_keys = [F.col(c) for c in keys] + [F.col(order_col)]

    if method == "absolute":
        if bounds is None:
            raise ValueError("method='absolute' requires bounds=(lo, hi)")
        lo, hi = bounds
        status = (F.when(v.isNull(), "insufficient_history")
                  .when((v < F.lit(float(lo))) | (v > F.lit(float(hi))), "anomaly")
                  .otherwise("ok"))
        return metrics.select(
            *out_keys, v.alias("value"), F.round(v, 6).alias("stat"),
            status.alias("status"))

    if method == "relative":
        prev = F.lag(v, 1).over(w)
        change = F.when(prev == 0, F.when(v == 0, F.lit(0.0)))\
                  .otherwise(F.abs(v / prev - 1))
        status = (F.when(prev.isNull(), "insufficient_history")
                  .when(change.isNull() | (change > F.lit(float(max_change))),
                        "anomaly")
                  .otherwise("ok"))
        return metrics.select(
            *out_keys, v.alias("value"), F.round(change, 6).alias("stat"),
            status.alias("status"))

    if method == "seasonal":
        if period is None or int(period) < 2:
            raise ValueError("method='seasonal' requires period >= 2")
        phase = F.pmod(F.col(order_col).cast("long"), F.lit(int(period)))
        trail = (Window.partitionBy(*keys, phase).orderBy(order_col)
                 .rowsBetween(-window, -1))
    else:
        trail = w.rowsBetween(-window, -1)
    n_hist = F.count(v).over(trail)
    mean = F.avg(v).over(trail)
    std = F.stddev_samp(v).over(trail)
    z = F.when(std > 0, (v - mean) / std)
    status = (
        F.when(n_hist < min_history, "insufficient_history")
        .when((std.isNull()) | (std == 0),
              F.when(v == mean, "ok").otherwise("anomaly"))
        .when(F.abs(z) > F.lit(float(k)), "anomaly")
        .otherwise("ok")
    )
    return metrics.select(
        *out_keys, v.alias("value"), F.round(z, 6).alias("stat"),
        status.alias("status"))


class MetricsHistory:
    """Append-only per-run verdict-metric store + current-run comparison.

    Layout: ``<path>/`` parquet of (run_seq long, partition_id string,
    check_id string, metric_value double). ``run_seq`` is the caller's
    monotonically increasing run counter (a scheduler run number, an
    Iceberg snapshot sequence — anything ordered)."""

    SCHEMA = ("run_seq long, partition_id string, check_id string, "
              "metric_value double")

    def __init__(self, path: str):
        self.path = path.rstrip("/")

    def record(self, verdicts: DataFrame, run_seq: int) -> None:
        (verdicts.select(
            F.lit(int(run_seq)).cast("long").alias("run_seq"),
            F.col("partition_id").cast("string"),
            "check_id",
            F.col("metric_value").cast("double"))
         .write.mode("append").parquet(self.path))

    def history(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.parquet(self.path)
        except AnalysisException:
            return spark.createDataFrame([], self.SCHEMA)

    def check(
        self,
        current_verdicts: DataFrame,
        run_seq: int,
        method: str = "zscore",
        **kwargs,
    ) -> DataFrame:
        """Flag the CURRENT run's metrics against the recorded history:
        one row per (partition_id, check_id) with the current value and
        its anomaly status. Prior runs' rows are evaluated too (the window
        is computed once) and filtered — the cost is the same single
        window pass over the driver-small history table."""
        spark = current_verdicts.sparkSession
        cur = current_verdicts.select(
            F.lit(int(run_seq)).cast("long").alias("run_seq"),
            F.col("partition_id").cast("string"), "check_id",
            F.col("metric_value").cast("double"))
        hist = self.history(spark).where(F.col("run_seq") < int(run_seq))
        flags = anomaly_flags(
            hist.unionByName(cur),
            keys=["partition_id", "check_id"],
            order_col="run_seq", value_col="metric_value",
            method=method, **kwargs)
        return flags.where(F.col("run_seq") == int(run_seq))
