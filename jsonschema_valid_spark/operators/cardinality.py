"""Cardinality validation: row-count bounds per group or for the whole
table (``x-rowCount``).

≙ the reference's ``minItems``/``maxItems`` (validators.rs array-length
bounds) lifted from the length of one row's array to the cardinality of a
TABLE or its groups — the dataset-scope question "did roughly the right
number of rows arrive for each key" that no row-scope check can ask (every
individual row of a half-loaded feed is valid; the failure is how many
there are). Complements its siblings: ``x-partitionComplete`` asks "is the
group present at all", ``x-freshness`` asks "did it keep arriving", this
asks "did the RIGHT AMOUNT arrive".

Caveat shared with x-partitionComplete: a group with ZERO rows is invisible
to a groupBy — a `min` bound only polices groups that have at least one
row. Declare x-partitionComplete alongside when absence itself must fail.

Scale contract (10^12 rows): one map-side-combined count() aggregate;
everything downstream operates on #groups rows. No joins, no row data past
the partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def row_count_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    min_count: int | None = None,
    max_count: int | None = None,
    scope: str = "group",
    where: str | None = None,
) -> DataFrame:
    """``x-rowCount`` execution: out-of-bounds groups as engine violation
    rows (doc_id, check_id, observed, expected).

    ``scope="group"`` counts rows per distinct value of ``column`` (NULL
    is its own group, doc_id "<null>"); ``scope="table"`` counts the whole
    table as one group (doc_id "<global>" — ``column`` merely anchors the
    check's schema path). observed = ``count=<n>``.
    """
    if scope not in ("group", "table"):
        raise ValueError(f"scope must be 'group' or 'table', got {scope!r}")
    if min_count is None and max_count is None:
        raise ValueError("x-rowCount needs at least one of min/max")
    return _row_count_agg(df, column, check_id, min_count, max_count,
                          scope, as_verdicts=False, where=where)


def row_count_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    min_count: int | None = None,
    max_count: int | None = None,
    where: str | None = None,
) -> DataFrame:
    """``x-rowCount {"verdicts": "perGroup"}``: one verdict row per group
    — (partition_id=group, check_id, passed, metric_value=count,
    threshold=0). Enumerates EVERY group, in-bounds ones as passed=true
    (the per-partition pass/fail contract); same single count aggregate
    as the violations form."""
    if min_count is None and max_count is None:
        raise ValueError("x-rowCount needs at least one of min/max")
    return _row_count_agg(df, column, check_id, min_count, max_count,
                          "group", as_verdicts=True, where=where)


def _row_count_agg(df, column, check_id, min_count, max_count, scope,
                   as_verdicts, where=None):
    # `where` scopes WHICH ROWS COUNT, not which groups exist: groups
    # come from the FULL frame and out-of-scope rows count 0, so a
    # group whose rows are ALL out of scope is flagged by a min bound
    # (count 0) instead of silently vanishing — the one dataset
    # keyword where filter-then-group would hide exactly the failures
    # a cardinality floor exists to catch
    cnt = (F.count(F.when(F.expr(where), 1)) if where
           else F.count(F.lit(1)))
    if scope == "group":
        agg = df.groupBy(column).agg(cnt.alias("n"))
        doc = F.coalesce(F.col(column).cast("string"), F.lit("<null>"))
    else:
        agg = df.agg(cnt.alias("n"))
        doc = F.lit("<global>")
    conds = []
    exp_parts = []
    if min_count is not None:
        conds.append(F.col("n") < int(min_count))
        exp_parts.append(f"count >= {int(min_count)}")
    if max_count is not None:
        conds.append(F.col("n") > int(max_count))
        exp_parts.append(f"count <= {int(max_count)}")
    viol = conds[0]
    for c in conds[1:]:
        viol = viol | c
    if as_verdicts:
        return agg.select(
            doc.alias("partition_id"),
            F.lit(check_id).alias("check_id"),
            (~viol).alias("passed"),
            F.col("n").cast("double").alias("metric_value"),
            F.lit(0.0).cast("double").alias("threshold"),
        )
    scope_msg = f" per {column}" if scope == "group" else " for table"
    return (
        agg.where(viol)
        .select(
            doc.alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(F.lit("count="),
                     F.col("n").cast("string")).alias("observed"),
            F.lit(" and ".join(exp_parts) + scope_msg).alias("expected"),
        )
    )


def distinct_ratio_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    min_ratio: float | None = None,
    max_ratio: float | None = None,
    by: str | None = None,
    approx: bool = False,
    min_count: int = 1,
) -> DataFrame:
    """``x-distinctRatio`` execution: distinct(``column``) / count(rows
    where ``column`` is non-NULL) outside [min_ratio, max_ratio], per
    ``by``-group or globally — the SOFT form of ``x-unique``, exactly as
    ``x-nullRate`` is the soft form of ``required``.  x-unique names
    every duplicate row (and fails on ONE dup); this bounds the RATE:
    "user_id may repeat, but a fan-out join that multiplies rows 40×
    must trip" (min), or "an id column that suddenly collapses to a
    handful of values must trip" (also min); max catches the inverse
    ("session_label should repeat — all-distinct means the sessionizer
    broke").

    ``approx=True`` swaps exact count(distinct) for
    approx_count_distinct (HLL, ~2% relative error) — the 10^12-row
    mode when the engine-standard exact-distinct Expand is too heavy
    and the declared bounds have headroom beyond the sketch error.
    Groups with fewer than ``min_count`` non-NULL rows are suppressed
    (the x-correlation contract).  observed renders the ratio as
    decimal(10,6) — exact mode is a single IEEE division, bit-identical
    across engines."""
    if min_ratio is None and max_ratio is None:
        raise ValueError("x-distinctRatio needs min and/or max")
    c = F.col(column)
    d = (F.approx_count_distinct(c) if approx
         else F.count_distinct(c))
    aggs = [d.alias("__d"), F.count(c).alias("__n")]
    if by is not None:
        g = df.groupBy(F.col(by)).agg(*aggs)
        doc = F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
    else:
        g = df.agg(*aggs)
        doc = F.lit("<global>")
    # try_divide: a group whose values are ALL NULL has __n == 0 —
    # ratio undefined (NULL, suppressed), not an ANSI DIVIDE_BY_ZERO
    from jsonschema_valid_spark.operators._bounds import out_of_bounds

    ratio = F.try_divide(F.col("__d"), F.col("__n"))
    bad = (out_of_bounds(ratio, min_ratio, max_ratio)
           & (F.col("__n") >= F.lit(int(min_count))))
    lo = "0" if min_ratio is None else f"{float(min_ratio):g}"
    hi = "1" if max_ratio is None else f"{float(max_ratio):g}"
    scope = f" per {by}" if by else ""
    kind = "approx " if approx else ""
    exp_msg = (f"{kind}distinct({column})/count in [{lo}, {hi}]{scope} "
               f"(min_count={min_count})")
    return g.where(bad).select(
        doc.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("ratio="),
            F.round(ratio, 6).cast("decimal(10,6)").cast("string"),
            F.lit(",distinct="), F.col("__d").cast("string"),
            F.lit(",n="), F.col("__n").cast("string"),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )


def distinct_ratio_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    by: str,
    min_ratio: float | None = None,
    max_ratio: float | None = None,
    approx: bool = False,
    min_count: int = 1,
) -> DataFrame:
    """``x-distinctRatio {"by", "verdicts": "perGroup"}``: one verdict
    row per group — (partition_id=group, check_id, passed,
    metric_value=the group's distinct/count ratio, threshold=min_ratio
    or max_ratio) — enumerating passing groups too, the per-partition
    pass/fail contract; same single aggregate as the violations form.
    Groups under ``min_count`` pass (suppressed, never a false alarm)."""
    if min_ratio is None and max_ratio is None:
        raise ValueError("x-distinctRatio needs min and/or max")
    c = F.col(column)
    d = (F.approx_count_distinct(c) if approx else F.count_distinct(c))
    g = df.groupBy(F.col(by)).agg(d.alias("__d"), F.count(c).alias("__n"))
    from jsonschema_valid_spark.operators._bounds import (
        out_of_bounds,
        violated_threshold,
    )

    # try_divide: a group whose values are ALL NULL has __n == 0 —
    # ratio undefined (NULL, suppressed), not an ANSI DIVIDE_BY_ZERO
    ratio = F.try_divide(F.col("__d"), F.col("__n"))
    bad = (out_of_bounds(ratio, min_ratio, max_ratio)
           & (F.col("__n") >= F.lit(int(min_count))))
    thr = violated_threshold(ratio, min_ratio, max_ratio)
    return g.select(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
        .alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~bad).alias("passed"),
        F.coalesce(ratio, F.lit(0.0)).cast("double").alias("metric_value"),
        thr.cast("double").alias("threshold"),
    )
