"""Distribution diversity: Shannon-entropy bounds — the ``x-entropy``
keyword (per-group entropy of a categorical column, in bits).

The MIX-COLLAPSE detector: ``x-maxFrequency`` caps one value's dominance,
``x-distinctRatio`` bounds how many distinct values appear — neither sees
a mix that silently skews while every individual share stays legal and
the distinct count stays constant ("the balanced 20-source crawl now
draws 80% from three sources").  Entropy H = −Σ p·log2(p) summarizes the
WHOLE shape in one comparable number: log2(k) for a perfectly uniform mix
over k values, → 0 as it collapses.  A ``min`` bound is the diversity
floor (training-mix balance, shard balance, routing fan-out); a ``max``
bound is the compactness ceiling (an id column that should be
near-constant per group starting to fragment).

Scale contract: the only pass over the data is ONE map-side-combined
``groupBy(by?, value).count()`` — #cells rows downstream (bounded by the
column's cardinality, tiny for genuine categoricals).  The identity used
everywhere (including the DuckDB oracle replay):

    H = log2(n) − (Σ c·log2(c)) / n

over the observed value counts c — p never materializes, empty categories
contribute nothing by construction.  ``greatest(·, 0)`` clamps the
float-noise negative a constant column can produce (H ≥ 0 holds in exact
arithmetic); NaN from a noise-negative would otherwise PASS ``>= min``
bounds (NaN sorts above every double in Spark).

``normalized: true`` reports H / log2(k) ∈ [0, 1] (comparable across
groups with different cardinalities); undefined for k < 2 → NULL →
suppressed (never violates), the engine's undefined-metric contract.
NULL values are excluded (the pairwise-complete convention); groups with
fewer than ``minCount`` non-null rows never violate.

Reference: dataset-scope lift with no analog in the reference's row
keywords (validators.rs); Shannon (1948) §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _entropy_stats(df: DataFrame, column: str, by: str | None,
                   normalized: bool) -> DataFrame:
    """Per-group (or single-row global) entropy statistics:
    ``(by?, __h, __k, __n)`` where ``__h`` is Shannon entropy in bits
    (normalized to [0,1] by log2(k) when requested; NULL when
    undefined).  One groupBy over the data; everything downstream
    operates on #cells value-count rows."""
    c = F.col(column)
    base = df.where(c.isNotNull())
    keys = ([F.col(by)] if by is not None else []) + [c]
    cnt = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
    gcols = [by] if by is not None else []
    cd = F.col("__c").cast("double")
    if by is not None:
        g = cnt.groupBy(*gcols).agg(
            F.sum("__c").alias("__n"),
            F.count(F.lit(1)).alias("__k"),
            F.sum(cd * F.log2(cd)).alias("__s"))
    else:
        g = cnt.agg(
            F.sum("__c").alias("__n"),
            F.count(F.lit(1)).alias("__k"),
            F.sum(cd * F.log2(cd)).alias("__s"))
    nd = F.col("__n").cast("double")
    h = F.greatest(F.log2(nd) - F.col("__s") / nd, F.lit(0.0))
    if normalized:
        h = F.when(F.col("__k") >= F.lit(2),
                   h / F.log2(F.col("__k").cast("double")))
    return g.select(*gcols, h.alias("__h"), F.col("__k"), F.col("__n"))


def _bad_and_bounds(min_h: float | None, max_h: float | None,
                    min_count: int) -> tuple[Column, str, str]:
    from jsonschema_valid_spark.operators._bounds import out_of_bounds

    bad = (F.col("__h").isNotNull()
           & (F.col("__n") >= F.lit(int(min_count)))
           & out_of_bounds(F.col("__h"), min_h, max_h))
    lo = "0" if min_h is None else f"{float(min_h):g}"
    hi = "inf" if max_h is None else f"{float(max_h):g}"
    return bad, lo, hi


def entropy_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    by: str | None = None,
    min_h: float | None = None,
    max_h: float | None = None,
    normalized: bool = False,
    min_count: int = 1,
) -> DataFrame:
    """``x-entropy`` execution: groups whose Shannon entropy of
    ``column`` falls outside [min_h, max_h] bits, as engine violation
    rows.  ``by=None`` checks ONE global mix.  observed renders H as
    decimal(10,4) (grid 1e-4; cross-engine float noise through the
    c·log2(c) sum is ~1e-14 — fixture margins are checked at
    registration, the x-correlation convention)."""
    if min_h is None and max_h is None:
        raise ValueError("x-entropy needs min and/or max")
    g = _entropy_stats(df, column, by, normalized)
    bad, lo, hi = _bad_and_bounds(min_h, max_h, min_count)
    doc = (F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
           if by is not None else F.lit("<global>"))
    scope = f" per {by}" if by else ""
    unit = "normalized" if normalized else "bits"
    exp_msg = (f"entropy({column}) in [{lo}, {hi}] {unit}{scope} "
               f"(min_count={min_count})")
    return g.where(bad).select(
        doc.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("h="),
            F.round(F.col("__h"), 4).cast("decimal(10,4)").cast("string"),
            F.lit(",k="), F.col("__k").cast("string"),
            F.lit(",n="), F.col("__n").cast("string"),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )


def entropy_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    by: str,
    min_h: float | None = None,
    max_h: float | None = None,
    normalized: bool = False,
    min_count: int = 1,
) -> DataFrame:
    """``x-entropy {"by", "verdicts": "perGroup"}``: every group
    enumerated with its entropy as metric_value (partition_id = group),
    passing ones included — the per-partition pass/fail shape.
    Undefined normalized H (k < 2) or thin groups report passed=True
    with metric NULL→0, the suppression contract."""
    if min_h is None and max_h is None:
        raise ValueError("x-entropy needs min and/or max")
    g = _entropy_stats(df, column, by, normalized)
    bad, _, _ = _bad_and_bounds(min_h, max_h, min_count)
    from jsonschema_valid_spark.operators._bounds import violated_threshold

    thr = violated_threshold(F.col("__h"), min_h, max_h)
    return g.select(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
        .alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~bad).alias("passed"),
        F.coalesce(F.col("__h"), F.lit(0.0)).cast("double")
        .alias("metric_value"),
        thr.cast("double").alias("threshold"),
    )
