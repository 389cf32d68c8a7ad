"""Incremental validation via persisted MERGEABLE aggregate states.

The checkpoint runner (checkpoint.py) makes ROW-scope validation resumable:
each partition's violations/verdicts commit independently and a resumed run
skips completed partitions. TABLE-scope aggregate checks (x-stats,
x-nullRate, x-distinctCount, x-drift baselines) had no such story — when a
10^12-row table gains one day's partitions, re-deriving "global mean n_tok"
or "table-wide approx distinct doc_id" from scratch re-scans a year of
history to validate a day of data. This module closes that gap (the
dataset-scope lift of the reference's single-shot walk, lib.rs:114-160; in
the spirit of Deequ's StateProvider / Analyzer state algebra):

* :func:`column_states` — ONE partial-aggregation scan emitting, per
  (partition, column), a MERGEABLE state: row count, non-null count, sum,
  sum of squares, min, max, and a DataSketches HLL sketch (binary). Every
  field lives in a commutative monoid (sums add, min/max lattice-meet/join,
  HLL register-max), so states composed in ANY grouping/order reproduce the
  whole-table aggregate EXACTLY — not approximately — for the moment
  family, and register-identically for HLL (union of partition sketches IS
  the sketch of the union).
* :func:`merge_states` — collapse states (all partitions, or any subset)
  back into the same state schema; composes with itself (tree merges).
* :func:`metrics_from_states` — finish merged states into the metric row a
  verdict consumes: n, null_rate, mean, sample stddev, min, max,
  approx_distinct.
* :class:`StateStore` — persist per-partition states through the SAME
  commit protocols the checkpoint runner proves (dynamic partition
  overwrite or atomic snapshot-manifest swap), so state visibility follows
  the table's own publication model.
* :func:`incremental_column_states` — compute states ONLY for partitions
  the store has not seen, commit them, return the full state set. With a
  physically partitioned source the "unseen" filter is a partition filter:
  the scan PRUNES every already-validated partition (plan/inputFiles
  asserted in tests) — validating the appended day touches the appended
  day.
* :func:`stats_verdicts_from_states` — bound checks over the finished
  metrics in the engine's verdict row shape, via the shared
  :mod:`_bounds` algebra so this path cannot diverge from x-stats.
* :func:`histogram_states` / :func:`merge_histogram_states` — the same
  treatment for fixed-bin histograms (bucket counts add), so an x-drift
  baseline or observed histogram can be maintained incrementally and fed
  to the existing drift statistics (operators/drift.py) unchanged.

Scale contract: the only pass over data is one map-side-combined
``groupBy(partition)`` per (incremental) run, over ONLY unseen partitions.
Everything downstream operates on #partitions × #columns state rows —
driver-small by the same contract as the checkpoint runner's partition
list (checkpoint.py:165-169): a table's partition count is bounded by
catalog design, not by row count. HLL keeps distinct-count memory at
2^lg_k registers per (partition, column) regardless of cardinality.

Exactness: n / n_nonnull / min / max merge EXACTLY. sum and sum_sq are
double adds — exact while inputs are integers and totals stay below 2^53
(the n_tok fixture regime), otherwise subject to the usual float
reassociation; mean/stddev consumers round to a documented grid (the
x-correlation convention). HLL merged estimate == single-shot estimate
over the union at equal lgConfigK (register-wise max is associative),
pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               NumericType, StringType)
from pyspark.sql.utils import AnalysisException

_NULL_PARTITION = "__null__"  # same sentinel as checkpoint.CheckpointRunner

#: metrics metrics_from_states emits (= the bound targets
#: stats_verdicts_from_states accepts).
STATE_METRICS = ("n", "n_nonnull", "null_rate", "mean", "stddev",
                 "min", "max", "approx_distinct")


def _norm_partition(partition_col: str | None) -> Column:
    if partition_col is None:
        return F.lit("<table>")
    return F.coalesce(F.col(partition_col).cast("string"),
                      F.lit(_NULL_PARTITION))


def _hll_input(c: Column, dtype) -> Column:
    """hll_sketch_agg accepts int/bigint/string/binary; everything else is
    canonicalized through a string cast (deterministic in Spark — the
    sketch then counts distinct RENDERINGS, documented)."""
    if isinstance(dtype, (IntegerType, LongType, StringType, BinaryType)):
        return c
    return c.cast("string")


def column_states(df: DataFrame, columns: list[str],
                  partition_col: str | None = None,
                  lg_k: int = 12) -> DataFrame:
    """Per-(partition, column) mergeable states in ONE aggregation pass:
    ``(partition, column, n, n_nonnull, sum, sum_sq, min, max, hll)``.

    ``partition_col=None`` emits a single ``<table>`` partition (the
    degenerate whole-table state). NULL partition values map to the
    checkpoint sentinel ``__null__``. Non-numeric columns carry NULL
    moment fields (their metrics are completeness + distinct)."""
    if not columns:
        raise ValueError("column_states needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    numeric: dict[str, bool] = {}
    for i, c in enumerate(columns):
        dtype = df.schema[c].dataType
        numeric[c] = isinstance(dtype, NumericType)
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{i}"))
        aggs.append(F.hll_sketch_agg(_hll_input(col, dtype), lg_k)
                    .alias(f"__hll_{i}"))
        if numeric[c]:
            d = col.cast("double")
            aggs.append(F.sum(d).alias(f"__sum_{i}"))
            aggs.append(F.sum(d * d).alias(f"__sq_{i}"))
            aggs.append(F.min(d).alias(f"__min_{i}"))
            aggs.append(F.max(d).alias(f"__max_{i}"))
    wide = (df.groupBy(_norm_partition(partition_col).alias("partition"))
            .agg(*aggs))
    null_d = F.lit(None).cast("double")
    structs = []
    for i, c in enumerate(columns):
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n"),
            F.col(f"__nn_{i}").alias("n_nonnull"),
            (F.col(f"__sum_{i}") if numeric[c] else null_d).alias("sum"),
            (F.col(f"__sq_{i}") if numeric[c] else null_d).alias("sum_sq"),
            (F.col(f"__min_{i}") if numeric[c] else null_d).alias("min"),
            (F.col(f"__max_{i}") if numeric[c] else null_d).alias("max"),
            F.col(f"__hll_{i}").alias("hll"),
        ))
    return wide.select("partition", F.inline(F.array(*structs)))


def merge_states(states: DataFrame) -> DataFrame:
    """Collapse states to one row per column — SAME schema (partition
    becomes the literal ``<merged>``), so merges compose (tree merge,
    store-then-merge-again). Sums add, min/max lattice, HLL unions."""
    return (states.groupBy("column").agg(
        F.sum("n").alias("n"),
        F.sum("n_nonnull").alias("n_nonnull"),
        F.sum("sum").alias("sum"),
        F.sum("sum_sq").alias("sum_sq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.hll_union_agg("hll").alias("hll"),
    ).select(F.lit("<merged>").alias("partition"), "*"))


def metrics_from_states(merged: DataFrame) -> DataFrame:
    """Finish (merged) states into verdict-ready metrics:
    ``(column, n, n_nonnull, null_rate, mean, stddev, min, max,
    approx_distinct)``. stddev is the SAMPLE stddev from moments
    (``sqrt((sum_sq − sum²/n)/(n−1))``, NULL when n_nonnull < 2, clamped
    at 0 against float noise — matches F.stddev up to reassociation
    noise; consumers round to a grid)."""
    nn = F.col("n_nonnull").cast("double")
    mean = F.when(F.col("n_nonnull") > 0, F.col("sum") / nn)
    # the sum_sq guard matters: greatest() IGNORES nulls, so without it a
    # non-numeric column's NULL moments would clamp to stddev 0.0
    var = F.when(
        (F.col("n_nonnull") >= 2) & F.col("sum_sq").isNotNull(),
        F.greatest((F.col("sum_sq") - F.col("sum") * F.col("sum") / nn)
                   / (nn - F.lit(1.0)), F.lit(0.0)))
    return merged.select(
        "column",
        F.col("n"),
        F.col("n_nonnull"),
        ((F.col("n") - F.col("n_nonnull")) / F.col("n").cast("double"))
        .alias("null_rate"),
        mean.alias("mean"),
        F.sqrt(var).alias("stddev"),
        F.col("min"),
        F.col("max"),
        F.hll_sketch_estimate("hll").alias("approx_distinct"),
    )


class StateStore:
    """Per-partition state persistence over the checkpoint commit
    protocols (ParquetDynamicOverwriteCommit by default; pass a
    SnapshotManifestCommit for atomic-swap visibility — both are the
    seams checkpoint.py's resume tests prove). Re-recording a partition
    OVERWRITES its states (idempotent under retries).

    ``record`` materializes the state rows on the driver before slicing
    per partition — #partitions × #columns rows, driver-small by the
    partition-list contract (checkpoint.py:165-169) — so committing P
    partitions costs zero extra input scans."""

    def __init__(self, base: str, protocol=None, kind: str = "states"):
        from jsonschema_valid_spark.checkpoint import (
            ParquetDynamicOverwriteCommit)
        self.protocol = protocol or ParquetDynamicOverwriteCommit(base)
        self.kind = kind

    def seen(self, spark: SparkSession) -> set[str]:
        """Partitions with committed states (empty store ⇒ empty set)."""
        try:
            rows = (self.protocol.read_all(spark, self.kind)
                    .select("partition").distinct().collect())
        except AnalysisException:
            return set()
        return {r["partition"] for r in rows}

    def record(self, states: DataFrame) -> list[str]:
        """Commit each partition's state rows; returns the partitions
        committed (sorted)."""
        spark = states.sparkSession
        rows = states.collect()
        parts = sorted({r["partition"] for r in rows})
        for p in parts:
            chunk = spark.createDataFrame(
                [r for r in rows if r["partition"] == p], states.schema)
            self.protocol.commit(chunk, self.kind, p)
        return parts

    def read_all(self, spark: SparkSession) -> DataFrame:
        return self.protocol.read_all(spark, self.kind)


def incremental_column_states(
    spark: SparkSession,
    df: DataFrame,
    columns: list[str],
    partition_col: str,
    store: StateStore,
    lg_k: int = 12,
) -> DataFrame:
    """Compute + commit states for partitions the store has NOT seen, then
    return the full state set (old partitions from the store, new from
    this scan). When ``partition_col`` is a physical partition column the
    NOT-IN filter prunes every seen partition at the source — the scan
    reads only appended data (inputFiles-asserted in tests); otherwise it
    is still a pushed data filter."""
    seen = store.seen(spark)
    part = _norm_partition(partition_col)
    new_df = df.where(~part.isin(sorted(seen))) if seen else df
    store.record(column_states(new_df, columns, partition_col, lg_k))
    return store.read_all(spark)


def stats_verdicts_from_states(
    metrics: DataFrame,
    checks: dict[str, dict[str, dict]],
    check_prefix: str = "x-stats",
) -> DataFrame:
    """Bound checks over finished metrics, in the engine verdict shape
    ``(partition_id, check_id, passed, metric_value, threshold)`` with
    ``partition_id = '<table>'`` (table-scope verdicts). ``checks`` maps
    column -> {metric -> {"min": lo?, "max": hi?}} with metric one of
    STATE_METRICS. NULL metric (undefined mean of an all-null column)
    passes — the engine's undefined-metric suppression contract. A
    column/metric with NO metrics row (column never profiled) FAILS
    loudly rather than vanishing: absence of evidence is not a pass."""
    from jsonschema_valid_spark.operators._bounds import (
        out_of_bounds, violated_threshold)

    spark = metrics.sparkSession
    outs: list[DataFrame] = []
    for column, specs in sorted(checks.items()):
        for metric, bounds in sorted(specs.items()):
            if metric not in STATE_METRICS:
                raise ValueError(
                    f"unknown state metric {metric!r} "
                    f"(supported: {', '.join(STATE_METRICS)})")
            lo, hi = bounds.get("min"), bounds.get("max")
            if lo is None and hi is None:
                raise ValueError(
                    f"{column}/{metric}: needs min and/or max")
            m = F.col(metric).cast("double")
            bad = F.coalesce(out_of_bounds(m, lo, hi), F.lit(False))
            thr = violated_threshold(m, lo, hi)
            row = metrics.where(F.col("column") == column).select(
                F.lit("<table>").alias("partition_id"),
                F.lit(f"{check_prefix}/{column}/{metric}").alias("check_id"),
                (~bad).alias("passed"),
                F.coalesce(m, F.lit(0.0)).alias("metric_value"),
                thr.cast("double").alias("threshold"),
            )
            missing = spark.createDataFrame(
                [("<table>", f"{check_prefix}/{column}/{metric}", False,
                  0.0, float(hi if hi is not None else lo))],
                "partition_id string, check_id string, passed boolean, "
                "metric_value double, threshold double")
            outs.append(row.unionByName(
                missing.join(row.select("check_id"), "check_id",
                             "left_anti")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def histogram_states(df: DataFrame, column: str, bucket_width: float,
                     partition_col: str | None = None) -> DataFrame:
    """Per-partition fixed-bin histogram states ``(partition, bucket,
    count)`` — the SAME binning expression as drift.histogram (so merged
    states feed psi/ks/chi2_value_df unchanged). Bucket counts add, so
    merge = groupBy(bucket).sum — an incremental x-drift baseline."""
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(
            _norm_partition(partition_col).alias("partition"),
            F.floor(F.col(column) / F.lit(bucket_width)).cast("long")
            .alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def merge_histogram_states(states: DataFrame) -> DataFrame:
    """Collapse histogram states to ``(bucket, count)`` — the shape
    drift.psi_value_df / ks_value_df / chi2_value_df consume."""
    return (states.groupBy("bucket")
            .agg(F.sum("count").alias("count")))
