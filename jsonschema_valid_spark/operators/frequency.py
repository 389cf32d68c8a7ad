"""Frequency-cap validation and heavy-hitter detection (``x-maxFrequency``).

The dataset lift of ``enum``/``x-unique`` along the OTHER axis: ``x-unique``
says "each value at most once"; ``x-maxFrequency`` says "no value may
DOMINATE" — count(value) must stay under an absolute cap (``maxCount``)
and/or a share of the table (``maxFraction``). The failures it catches are
invisible to every row check: a stuck upstream producer emitting one user_id
for half the feed, a default/placeholder value flooding a column, a template
document duplicated into dominance, mode collapse in generated data.

≙ reference semantics anchor: ``enum`` (validators.rs) bounds which values
may appear; this bounds how OFTEN one may appear — the same per-value
judgment lifted from membership to frequency.

Two execution modes with the same exact output:

* ``exact`` (default): one map-side-combined ``groupBy(value).count()``
  — the shuffle carries (partitions x distinct) partial states, then the
  tiny aggregated table gets the grand total via a single-frame window
  (sum of per-value counts == table total, so the base table is scanned
  ONCE). Right when the column's cardinality is modest (enums, sources,
  languages).
* ``sketch``: a mergeable Misra-Gries summary (Agarwal et al., "Mergeable
  Summaries", PODS'12) for HIGH-cardinality columns (doc_id, user_id,
  url), where exact's shuffle would carry partitions x billions of partial
  states. Phase 1 (``mapInPandas``, no shuffle, vectorized value_counts
  per Arrow batch) keeps k counters per Spark partition — the classic
  reduction: when the dict exceeds k, subtract the (k+1)-th largest count
  from every counter and drop the non-positive, giving per-partition
  undercount <= n_p/(k+1) and never an overcount. Phase 2 merges by
  summing per-value estimates (undercount stays <= n/(k+1) after any
  merge order — the mergeability theorem), so every value with true count
  > total/(k+1) SURVIVES with a positive estimate. Candidates within
  slack of the threshold are then re-counted EXACTLY with a filtered
  aggregate (the In-filter pushes to the scan; map-side combine shuffles
  only partitions x candidates states). Because the candidate set is a
  guaranteed superset of the true violators and the final filter uses
  exact counts, the sketch mode's OUTPUT IS EXACT and partitioning-
  invariant — which is why the driver oracle can replay it with a plain
  GROUP BY ... HAVING.

Fraction bounds compare in integer arithmetic (count * denom > num *
total, the fraction reduced at micro-resolution) so Spark and the DuckDB
oracle agree bit-for-bit with no float-division edge at the boundary.
Safe to 10^12 rows: n * denom < 2^63 for denom <= 10^6.
"""

from __future__ import annotations

import math
from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_NULL_SENTINEL = "\x00<null>"


def _ensure_worker_pickling() -> None:
    """Ship this module inside the UDF closure so bare sessions (no
    ``--py-files``) can run the sketch phase on workers."""
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


def _frac_ratio(max_fraction: float) -> tuple[int, int]:
    """Exact integer (num, denom) for the fraction bound at micro
    resolution — the comparison ``count * denom > num * total`` is then
    pure int64 arithmetic in both Spark and the SQL oracle."""
    fr = Fraction(round(float(max_fraction) * 1_000_000), 1_000_000)
    if fr.numerator == 0:
        # below the 1e-6 grid the bound would collapse to "count > 0"
        # (every value a violator); a finer grid would overflow int64 at
        # 10^12 rows (n * denom), so refuse instead of silently degrading
        raise ValueError(
            f"maxFraction={max_fraction!r} is below the 1e-6 integer-"
            "exact resolution — use maxCount for absolute caps this small")
    return fr.numerator, fr.denominator


def _value_str(column: str) -> F.Column:
    return F.coalesce(F.col(column).cast("string"), F.lit(_NULL_SENTINEL))


def exact_value_counts(df: DataFrame, column: str,
                       by: str | None = None) -> DataFrame:
    """(value, n, total) — or (grp, value, n, total) with ``by`` — per-
    value counts plus the (group) total, ONE scan.

    The global total is a broadcast scalar cross-joined onto the counts
    (NOT a single-frame window: that would move every distinct value of
    a high-cardinality column through ONE task — the WindowExec hazard).
    The scalar's sub-plan is the same groupBy, so Spark's ReuseExchange
    reads the one shuffle twice instead of re-scanning the base table.
    With ``by``, the per-group total is a window partitioned by the
    group (bounded by the group's distinct values). NULL values under
    the sentinel."""
    if by is None:
        counts = (df.groupBy(_value_str(column).alias("value"))
                  .agg(F.count(F.lit(1)).alias("n")))
        total = counts.agg(F.sum("n").alias("total"))
        return counts.crossJoin(F.broadcast(total))
    counts = (df.groupBy(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>")).alias("grp"),
        _value_str(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("n")))
    return counts.withColumn(
        "total", F.sum("n").over(Window.partitionBy("grp")))


def mg_partition_summaries(df: DataFrame, column: str, k: int) -> DataFrame:
    """Phase 1 of the Misra-Gries sketch: (value, est) rows per Spark
    partition, at most ``k`` per partition, plus one total row per
    partition (value NULL, est = rows processed) so the grand total rides
    the same single scan. Estimates never overcount; per-partition
    undercount <= n_p/(k+1). Vectorized: pandas ``value_counts`` per
    Arrow batch; the Python loop touches distinct values, not rows."""
    _ensure_worker_pickling()
    k = int(k)
    if k < 2:
        raise ValueError(f"sketch k must be >= 2, got {k}")
    src = df.select(_value_str(column).alias("val"))

    def build(batches):
        # Fully vectorized MG (guide §4.2): per-batch hash counting via
        # pandas value_counts, merged with index-aligned Series.add —
        # the Python interpreter never loops over distinct values. The
        # reduction is applied LAZILY (only when the buffer exceeds 8k
        # counters): each reduction still subtracts the (k+1)-th largest
        # count (np.partition selection, O(n)) from every counter and
        # drops the non-positive, so each reduction removes >= (k+1)*cut
        # mass and the classic bound (undercount <= n_p/(k+1), never an
        # overcount) holds unchanged — only the constant factor of
        # reductions per task drops.
        import numpy as np

        def reduce_to_k(acc: pd.Series) -> pd.Series:
            a = acc.to_numpy()
            cut = np.partition(a, len(a) - k - 1)[len(a) - k - 1]
            return (acc[a > cut] - cut).astype("int64")

        acc: pd.Series | None = None
        processed = 0
        for pdf in batches:
            processed += len(pdf)
            vc = pdf["val"].value_counts(sort=False)
            acc = vc if acc is None else \
                acc.add(vc, fill_value=0).astype("int64")
            if len(acc) > 8 * k:
                acc = reduce_to_k(acc)
        if acc is not None and len(acc) > k:
            acc = reduce_to_k(acc)
        out_vals = ([] if acc is None else list(acc.index)) + [None]
        out_est = ([] if acc is None else
                   [int(c) for c in acc.to_numpy()]) + [processed]
        yield pd.DataFrame({"value": out_vals, "est": out_est})

    return src.mapInPandas(build, "value string, est long")


def heavy_hitters(
    df: DataFrame,
    column: str,
    max_fraction: float | None = None,
    max_count: int | None = None,
    k: int | None = None,
    max_candidates: int = 100_000,
) -> DataFrame:
    """Values whose EXACT count violates the bound(s), found via the
    Misra-Gries two-phase sketch + exact re-count: (value, n, total) rows
    — exact and partitioning-invariant (see module docstring).

    ``k`` defaults to ``max(64, ceil(8/max_fraction))`` so the merged
    undercount slack total/(k+1) is at most an eighth of the fraction
    threshold (candidate set stays O(1/max_fraction)). With only
    ``max_count``, pass an explicit ``k`` sized so total/(k+1) is small
    against the cap — when the slack reaches the threshold the sketch
    can no longer CERTIFY the candidate superset (a violator may have
    been fully evicted), so the function refuses with instructions
    rather than returning silently incomplete results; the
    ``max_candidates`` guard separately refuses unbounded candidate
    lists."""
    if max_fraction is None and max_count is None:
        raise ValueError("heavy_hitters needs max_fraction and/or max_count")
    if k is None:
        if max_fraction is None:
            raise ValueError("with only max_count, an explicit sketch k "
                             "is required (slack = total/(k+1) must be "
                             "sized against the cap)")
        k = max(64, math.ceil(8.0 / float(max_fraction)))
    k = int(k)

    # Materialize the merged sketch ONCE: it is tiny (<= k x #partitions
    # value rows + #partitions total rows, pre-reduced by the groupBy),
    # but its lineage contains the expensive Arrow/Python MG phase over
    # the full table — without the checkpoint that phase re-ran for the
    # totals collect AND the candidate collect (measured 2x the component
    # cost at 2M rows). localCheckpoint, not cache(): eviction under
    # memory pressure would silently re-run the scan mid-collect (the
    # ADVICE-r4 extend() lesson).
    merged = (mg_partition_summaries(df, column, k)
              .groupBy("value").agg(F.sum("est").alias("est"))
              .localCheckpoint(eager=True))
    totals = (merged.where(F.col("value").isNull())
              .agg(F.sum("est").alias("total")))
    cand = (merged.where(F.col("value").isNotNull())
            .crossJoin(F.broadcast(totals)))

    # certify the superset: a value ABSENT from the merged sketch has
    # true count <= total/(k+1), so the filter below can only guarantee
    # completeness when every declared threshold exceeds that slack —
    # otherwise a genuine violator may have been evicted everywhere and
    # no est row exists to keep (review find: the old behavior returned
    # silently incomplete results in exactly that regime)
    total_v = (totals.collect()[0]["total"] or 0)
    slack_v = total_v / float(k + 1) + 2.0
    thr_vals = []
    if max_fraction is not None:
        fnum, fden = _frac_ratio(max_fraction)
        thr_vals.append(total_v * fnum / fden)
    if max_count is not None:
        thr_vals.append(float(int(max_count)))
    if total_v and min(thr_vals) <= slack_v:
        raise ValueError(
            f"sketch cannot certify: threshold {min(thr_vals):g} <= "
            f"merged slack total/(k+1)+2 = {slack_v:g} — raise k above "
            f"{int(total_v / max(min(thr_vals) - 2.0, 1.0))} or use the "
            "exact mode")

    # keep every value whose TRUE count could violate: est >= threshold -
    # slack - margin (slack = total/(k+1) merged undercount; margin 2
    # absorbs the double rounding in this pruning-only comparison)
    slack = (F.col("total").cast("double") / F.lit(float(k + 1))) + F.lit(2.0)
    conds = []
    if max_fraction is not None:
        num, den = _frac_ratio(max_fraction)
        thr = F.col("total").cast("double") * F.lit(num) / F.lit(den)
        conds.append(F.col("est").cast("double") >= thr - slack)
    if max_count is not None:
        conds.append(F.col("est").cast("double")
                     >= F.lit(float(int(max_count))) - slack)
    keep = conds[0]
    for c in conds[1:]:
        keep = keep | c
    cand_rows = cand.where(keep).select("value").limit(max_candidates + 1)
    values = [r["value"] for r in cand_rows.collect()]
    if len(values) > max_candidates:
        raise ValueError(
            f"candidate set exceeds max_candidates={max_candidates}: the "
            "sketch slack (total/(k+1)) is too large for the threshold — "
            "raise k, raise the bound, or use mode='exact'")

    spark = df.sparkSession
    if not values:
        return spark.createDataFrame([], "value string, n long, total long")

    # exact re-count of ONLY the candidate values: the In-filter pushes to
    # the scan; map-side combine shuffles partitions x |candidates| states
    col_str = _value_str(column)
    counts = (df.where(col_str.isin(values))
              .groupBy(col_str.alias("value"))
              .agg(F.count(F.lit(1)).alias("n"))
              .crossJoin(F.broadcast(totals)))
    return counts.where(_violation_cond(max_fraction, max_count)).select(
        "value", "n", F.col("total").cast("long").alias("total"))


def frequency_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    by: str,
    max_fraction: float | None = None,
    max_count: int | None = None,
) -> DataFrame:
    """``x-maxFrequency {"by", "verdicts": "perGroup"}``: one verdict row
    per group — (partition_id=group, check_id, passed, metric_value=the
    group's TOP value share, threshold=maxFraction) — enumerating passing
    groups too, the per-partition pass/fail contract. Same single scan as
    the violations form plus one more tiny aggregate over the
    already-counted (group, value) rows."""
    if max_fraction is None and max_count is None:
        raise ValueError("x-maxFrequency needs maxFraction and/or maxCount")
    counts = exact_value_counts(df, column, by=by)
    viol = _violation_cond(max_fraction, max_count)
    # metric/threshold stay COMPARABLE (review find): fraction mode
    # reports the top share vs maxFraction; count-only mode reports the
    # top COUNT vs maxCount (the old 0.0 threshold made every passing
    # group look over-threshold to consumers)
    if max_fraction is not None:
        metric = F.max(F.col("n") / F.col("total"))
        thr = float(max_fraction)
    else:
        metric = F.max(F.col("n")).cast("double")
        thr = float(int(max_count))
    return (counts.groupBy("grp")
            .agg(F.max(viol.cast("int")).alias("nv"),
                 metric.alias("top_metric"))
            .select(
                F.col("grp").alias("partition_id"),
                F.lit(check_id).alias("check_id"),
                (F.col("nv") == 0).alias("passed"),
                F.col("top_metric").cast("double").alias("metric_value"),
                F.lit(thr).cast("double").alias("threshold"),
            ))


def _violation_cond(max_fraction, max_count) -> F.Column:
    conds = []
    if max_fraction is not None:
        num, den = _frac_ratio(max_fraction)
        conds.append(F.col("n") * F.lit(den) > F.lit(num) * F.col("total"))
    if max_count is not None:
        conds.append(F.col("n") > int(max_count))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    return cond


def _expected_str(max_fraction, max_count) -> F.Column:
    parts = []
    if max_fraction is not None:
        parts.append(f"fraction <= {float(max_fraction):g}")
    if max_count is not None:
        parts.append(f"count <= {int(max_count)}")
    return F.concat(F.lit(" and ".join(parts) + " of total="),
                    F.col("total").cast("string"))


def frequency_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    max_fraction: float | None = None,
    max_count: int | None = None,
    mode: str = "exact",
    k: int | None = None,
    max_candidates: int = 100_000,
    by: str | None = None,
) -> DataFrame:
    """``x-maxFrequency`` execution: one violation row per dominating
    value — (doc_id=value, check_id, observed="count=N",
    expected="fraction <= f and count <= c of total=T"). Exact output in
    BOTH modes; ``mode`` only chooses the physical strategy (see module
    docstring).

    ``by`` scopes the dominance PER GROUP (no value may exceed the share
    of its group's rows — "no event type may be 80% of one user's
    stream"): doc_id becomes the group, observed names the value. Group
    mode is exact-only — the MG summary would need a per-group k, and
    the group totals already ride the same single-scan window."""
    if max_fraction is None and max_count is None:
        raise ValueError("x-maxFrequency needs maxFraction and/or maxCount")
    if max_fraction is not None and not (0.0 < float(max_fraction) <= 1.0):
        raise ValueError(f"maxFraction must be in (0, 1], got {max_fraction}")
    if mode not in ("exact", "sketch"):
        raise ValueError(f"mode must be 'exact' or 'sketch', got {mode!r}")
    if by is not None and mode == "sketch":
        raise ValueError("x-maxFrequency: sketch mode does not support "
                         "'by' (per-group dominance is exact-only)")

    if mode == "sketch":
        bad = heavy_hitters(df, column, max_fraction, max_count,
                            k=k, max_candidates=max_candidates)
    else:
        bad = exact_value_counts(df, column, by=by).where(
            _violation_cond(max_fraction, max_count))

    val = F.when(F.col("value") == _NULL_SENTINEL, F.lit("<null>")) \
        .otherwise(F.col("value"))
    if by is not None:
        return bad.select(
            F.col("grp").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(F.lit("value="), val, F.lit(" count="),
                     F.col("n").cast("string")).alias("observed"),
            F.concat(_expected_str(max_fraction, max_count),
                     F.lit(f" per {by}")).alias("expected"),
        )
    return bad.select(
        val.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit("count="), F.col("n").cast("string")).alias("observed"),
        _expected_str(max_fraction, max_count).alias("expected"),
    )
