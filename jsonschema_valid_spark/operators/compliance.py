"""Predicate pass-rate bounds: the ``x-compliance`` keyword.

The ERROR-BUDGET form of ``x-rowExpr``, completing the hard/soft pairs
the engine already has (``required``/``x-nullRate``,
``x-unique``/``x-distinctRatio``): ``x-rowExpr`` names every violating
row and a single bad row fails the run — the right contract for
invariants, the wrong one for quality gates where a known imperfect
feed is acceptable up to a rate ("≥ 99.5% of events carry a positive
value", "≤ 0.1% of documents may trip the spam predicate").  This
keyword bounds the FRACTION of rows satisfying an arbitrary SQL boolean
per group or globally (≙ Deequ's ``Check.satisfies``/compliance
constraint; the reference's row keywords, validators.rs, have no rate
form — this is the dataset-scope lift).

NULL predicate results count as NON-compliant (``coalesce(expr, false)``
— a row that cannot prove compliance is not compliant), matching
Deequ's semantics and keeping the rate = passing/n over ALL rows.

Scale contract: ONE map-side-combined conditional aggregate — the
x-correlation/x-trend shape: #groups rows shuffled, never a join,
window, or second scan.  The rate is a single IEEE division —
bit-identical across engines; witnesses are decimal(10,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rate_aggs(expr: str):
    ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
    return [F.sum(ok.cast("long")).alias("__p"),
            F.count(F.lit(1)).alias("__n")]


def compliance_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    expr: str,
    min_rate: float | None = None,
    max_rate: float | None = None,
    by: str | None = None,
    min_count: int = 1,
) -> DataFrame:
    """``x-compliance`` execution: groups whose pass-rate of ``expr``
    falls outside [min_rate, max_rate], as engine violation rows.
    ``by=None`` checks ONE global rate.  Groups under ``min_count`` rows
    are suppressed (the statistical-family contract).  observed =
    ``rate=<dec>,pass=<p>,n=<n>``."""
    if min_rate is None and max_rate is None:
        raise ValueError("x-compliance needs min and/or max")
    aggs = _rate_aggs(expr)
    if by is not None:
        g = df.groupBy(F.col(by)).agg(*aggs)
        doc = F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
    else:
        g = df.agg(*aggs)
        doc = F.lit("<global>")
    from jsonschema_valid_spark.operators._bounds import out_of_bounds

    rate = F.try_divide(F.col("__p"), F.col("__n"))
    bad = (out_of_bounds(rate, min_rate, max_rate)
           & (F.col("__n") >= F.lit(int(min_count))))
    lo = "0" if min_rate is None else f"{float(min_rate):g}"
    hi = "1" if max_rate is None else f"{float(max_rate):g}"
    scope = f" per {by}" if by else ""
    exp_msg = (f"rate({expr}) in [{lo}, {hi}]{scope} "
               f"(min_count={min_count})")
    return g.where(bad).select(
        doc.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("rate="),
            F.round(rate, 6).cast("decimal(10,6)").cast("string"),
            F.lit(",pass="), F.col("__p").cast("string"),
            F.lit(",n="), F.col("__n").cast("string"),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )


def compliance_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    expr: str,
    by: str,
    min_rate: float | None = None,
    max_rate: float | None = None,
    min_count: int = 1,
) -> DataFrame:
    """``x-compliance {"by", "verdicts": "perGroup"}``: every group
    enumerated with its pass-rate as metric_value (partition_id =
    group), passing ones included — the per-partition pass/fail shape;
    same single aggregate as the violations form."""
    if min_rate is None and max_rate is None:
        raise ValueError("x-compliance needs min and/or max")
    g = df.groupBy(F.col(by)).agg(*_rate_aggs(expr))
    from jsonschema_valid_spark.operators._bounds import (
        out_of_bounds,
        violated_threshold,
    )

    rate = F.try_divide(F.col("__p"), F.col("__n"))
    bad = (out_of_bounds(rate, min_rate, max_rate)
           & (F.col("__n") >= F.lit(int(min_count))))
    thr = violated_threshold(rate, min_rate, max_rate)
    return g.select(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
        .alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~bad).alias("passed"),
        F.coalesce(rate, F.lit(0.0)).cast("double").alias("metric_value"),
        thr.cast("double").alias("threshold"),
    )
