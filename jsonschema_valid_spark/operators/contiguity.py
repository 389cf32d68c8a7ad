"""Sequence completeness: the ``x-contiguous`` keyword — an integer
sequence column must cover [min..max] with no holes, per group or
globally.

The "did every piece arrive" check for DENSE identifiers: line numbers
per order, chunk indices per document, epoch/batch sequence numbers,
Kafka offsets per partition.  ``x-rowCount`` bounds how MANY rows a
group has; ``x-monotonic`` orders them; ``x-unique`` deduplicates them
— none can say "number 7 is missing between 6 and 8", which is exactly
how partial loads, dropped retries, and compaction bugs manifest.

Two report shapes with different scale contracts:

* ``report="summary"`` (default): per group, ``missing =
  (max − min + 1) − count_distinct(value)`` — ONE map-side-combined
  aggregate (#groups rows shuffled, exact count_distinct via Expand),
  never a window or join.  A violation names the group with
  ``present=…,span=…,missing=…``.  Holes are counted, not located —
  the right default at 10^12 rows.
* ``report="gaps"``: every gap run located via one ``lag`` window per
  group (``prev+1 .. cur−1`` for each step > 1) — one Exchange on the
  group key, duplicates harmless (equal neighbors step 0).  Requires
  ``by``: a global gap enumeration would be a single-partition window,
  which this engine refuses by construction (use summary globally).

Missing TAILS are invisible by design: contiguity is defined over the
observed [min..max] — "the last lines of the order never arrived"
is ``x-rowCount``'s job (the two compose).  NULLs are excluded; values
are cast to long (the check is about integer sequence positions).

Reference: dataset-scope lift with no analog in the reference's row
keywords (validators.rs) — the subject is the SET of values of a
group, like x-unique (uniqueness.py) but for presence instead of
multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _summary_stats(df: DataFrame, column: str, by: str | None) -> DataFrame:
    c = F.col(column).cast("long")
    base = df.where(c.isNotNull())
    aggs = [
        F.min(c).alias("__lo"),
        F.max(c).alias("__hi"),
        F.count_distinct(c).alias("__d"),
    ]
    if by is not None:
        g = base.groupBy(F.col(by)).agg(*aggs)
    else:
        g = base.agg(*aggs)
    return g.withColumn(
        "__missing",
        (F.col("__hi") - F.col("__lo") + F.lit(1)) - F.col("__d"))


def contiguity_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    by: str | None = None,
    max_missing: int = 0,
    report: str = "summary",
) -> DataFrame:
    """``x-contiguous`` execution as engine violation rows.

    summary: one row per group with more than ``max_missing`` holes in
    its observed [min..max] span.  gaps: one row per gap RUN naming its
    exact extent (``gap=[lo,hi],len=k``); ``max_missing`` does not
    apply (every hole is located) and ``by`` is required."""
    if report not in ("summary", "gaps"):
        raise ValueError("x-contiguous report must be 'summary' or 'gaps'")
    if report == "gaps":
        if by is None:
            raise ValueError(
                "x-contiguous report='gaps' requires 'by': a global gap "
                "enumeration is a single-partition window — use "
                "report='summary' for global scope")
        c = F.col(column).cast("long")
        base = df.where(c.isNotNull())
        w = Window.partitionBy(F.col(by)).orderBy(c)
        prev = F.lag(c).over(w)
        stepped = (base.select(F.col(by), c.alias("__v"),
                               prev.alias("__prev"))
                   .where(F.col("__prev").isNotNull()
                          & (F.col("__v") - F.col("__prev") > F.lit(1))))
        exp_msg = f"contiguous {column} per {by}"
        return stepped.select(
            F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
            .alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("gap=["), (F.col("__prev") + 1).cast("string"),
                F.lit(","), (F.col("__v") - 1).cast("string"),
                F.lit("],len="),
                (F.col("__v") - F.col("__prev") - 1).cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )

    g = _summary_stats(df, column, by)
    doc = (F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
           if by is not None else F.lit("<global>"))
    scope = f" per {by}" if by else ""
    exp_msg = (f"contiguous {column}{scope} "
               f"(maxMissing={int(max_missing)})")
    return (g.where(F.col("__missing") > F.lit(int(max_missing)))
            .select(
                doc.alias("doc_id"),
                F.lit(check_id).alias("check_id"),
                F.concat(
                    F.lit("present="), F.col("__d").cast("string"),
                    F.lit(",span=["), F.col("__lo").cast("string"),
                    F.lit(","), F.col("__hi").cast("string"),
                    F.lit("],missing="),
                    F.col("__missing").cast("string"),
                ).alias("observed"),
                F.lit(exp_msg).alias("expected"),
            ))


def contiguity_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    by: str,
    max_missing: int = 0,
) -> DataFrame:
    """``x-contiguous {"by", "verdicts": "perGroup"}``: every group
    enumerated with its hole count as metric_value (partition_id =
    group), passing ones included — same single summary aggregate as
    the violations form."""
    g = _summary_stats(df, column, by)
    return g.select(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
        .alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (F.col("__missing") <= F.lit(int(max_missing))).alias("passed"),
        F.col("__missing").cast("double").alias("metric_value"),
        F.lit(float(int(max_missing))).cast("double").alias("threshold"),
    )
