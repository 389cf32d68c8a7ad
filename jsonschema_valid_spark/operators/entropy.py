"""Shannon-entropy bounds on a categorical column (``x-entropy``):
baseline-free detection of DISTRIBUTION COLLAPSE and unexpected
uniformity.

Why beside ``x-drift``: drift statistics compare against a TRUSTED
baseline histogram and alert when the shape moves.  Entropy bounds the
distribution's own concentration with no baseline at all — the checks a
training-data pipeline actually states in absolute terms:

* ``min`` (collapse guard): "each source's event mix must not collapse
  to one value" — a generator that mode-collapses, a stuck upstream
  enum, a template explosion in synthetic data all crater the entropy
  of the affected group long before any single frequency looks odd;
* ``max`` (uniformity guard): "this naturally-skewed column must not
  become uniform noise" — randomized/permuted ids and join
  misalignments produce near-``ln k`` entropy where real data is
  concentrated.

H = −Σ p·ln p is computed as ``ln(T) − (Σ c·ln c)/T`` over the value
counts c (algebraically identical, one fewer division per value and
exactly 0.0 for single-value groups).  ``normalized=True`` divides by
``ln(k)`` (k = observed distinct values), mapping every group onto
[0, 1] so one threshold serves groups with different alphabet sizes;
single-value groups define 0.

Scale contract: two stacked aggregates — ``groupBy(group, value)``
count (map-side combined; #(groups × values) rows shuffle, never row
data) then ``groupBy(group)`` folding counts into the entropy — both
pure Column math, no UDF, no window, no join.  NULLs are excluded
(x-nullRate territory); a group that is ALL NULL simply has no row.

The reference validates one instance at a time and has no
distributional checks (lib.rs:84-102); this extends the dataset-scope
family (SURVEY §2's engine obligations) like x-drift/x-stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def entropy_stats(df: DataFrame, column: str, by: str | None = None
                  ) -> DataFrame:
    """Per-group entropy profile: ``(by?, entropy, n_values, total)``.
    ``entropy`` is in nats over the non-NULL value frequencies of
    ``column``; ``n_values`` is the observed distinct-value count and
    ``total`` the non-NULL row count (both handy for normalization and
    for reporting)."""
    gcols = [by] if by else []
    counts = (df.where(F.col(column).isNotNull())
              .groupBy(*(gcols + [column]))
              .agg(F.count(F.lit(1)).alias("__c")))
    c = F.col("__c").cast("double")
    aggs = [F.sum("__c").alias("__t"),
            F.sum(c * F.log(c)).alias("__clc"),
            F.count(F.lit(1)).alias("n_values")]
    g = counts.groupBy(*gcols).agg(*aggs) if gcols else counts.agg(*aggs)
    t = F.col("__t").cast("double")
    ent = F.log(t) - F.col("__clc") / t
    return g.select(*(gcols + [ent.alias("entropy"),
                               F.col("n_values"),
                               F.col("__t").alias("total")]))


def entropy_violations(df: DataFrame, column: str, check_id: str,
                       by: str | None = None,
                       min_entropy: float | None = None,
                       max_entropy: float | None = None,
                       normalized: bool = False) -> DataFrame:
    """``x-entropy`` execution: groups whose (optionally normalized)
    Shannon entropy falls outside [min, max], as engine violation rows
    ``(doc_id, check_id, observed, expected)`` — one row per offending
    group (``<global>`` when ``by`` is None).  Witness entropies render
    as decimal(12,6) for cross-engine string stability."""
    if min_entropy is None and max_entropy is None:
        raise ValueError(f"{check_id}: at least one of min/max required")
    stats = entropy_stats(df, column, by)
    h = F.col("entropy")
    if normalized:
        h = F.when(F.col("n_values") > 1,
                   F.col("entropy")
                   / F.log(F.col("n_values").cast("double"))) \
            .otherwise(F.lit(0.0))
    bad = F.lit(False)
    if min_entropy is not None:
        bad = bad | (h < F.lit(float(min_entropy)))
    if max_entropy is not None:
        bad = bad | (h > F.lit(float(max_entropy)))
    label = "normalized entropy" if normalized else "entropy"
    lo = "0" if min_entropy is None else repr(float(min_entropy))
    hi = "inf" if max_entropy is None else repr(float(max_entropy))
    exp_msg = f"{label} of {column} in [{lo}, {hi}]" + (
        "" if normalized else " nats")
    group_col = (F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
                 if by else F.lit("<global>"))
    return (stats.where(bad)
            .select(
                group_col.alias("doc_id"),
                F.lit(check_id).alias("check_id"),
                F.concat(
                    F.lit("entropy="),
                    F.round(h, 6).cast("decimal(12,6)").cast("string"),
                    F.lit(",values="),
                    F.col("n_values").cast("string"),
                ).alias("observed"),
                F.lit(exp_msg).alias("expected"),
            ))
