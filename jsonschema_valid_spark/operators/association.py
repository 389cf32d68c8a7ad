"""Categorical association: Cramér's V bounds — the ``x-association``
keyword (per-group association-strength bounds between two categorical
columns).

The categorical sibling of ``x-correlation``: Pearson's r is undefined
over unordered categories, yet "these two labels must track" (a routing
column must follow the shard column — redundancy/consistency) and the
leakage inverse "this label must NOT predict that one" (a feature that
encodes the target, a split column that encodes the source) are exactly
the contracts a training-data gate needs over string columns.  Cramér's
V = sqrt(chi²/(n·min(r−1, c−1))) rescales the chi-square contingency
statistic to [0, 1] (0 = independent, 1 = one column determines the
other), comparable across tables of any size and shape.

Scale contract: the only pass over the data is ONE map-side-combined
``groupBy(a, b).count()`` — the contingency table, #cells rows (bounded
by the product of the two cardinalities, tiny for genuine categoricals).
Marginals, chi², and V are window/aggregate algebra over those #cells
rows; the fact table is never joined or re-scanned.  The identity used
everywhere (including the DuckDB oracle replay): summing
(o−e)²/e over ALL r×c cells — empty ones included — collapses to

    chi² = n·(T − 1),   T = Σ_observed o²/(row_tot·col_tot)

so only OBSERVED cells are ever materialized, and n cancels in
V = sqrt((T−1)/min(r−1, c−1)).  max(T−1, 0) clamps float-noise
negatives (T ≥ 1 holds in exact arithmetic).

Rows where either side is NULL are excluded (pairwise-complete, the
x-correlation contract).  Groups with min(r, c) < 2 (a constant column
— V undefined) or fewer than ``min_count`` complete rows never violate.

Reference: the engine's dataset-scope lift has no analog in the
reference's row keywords (validators.rs); Cramér (1946) §21.9.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _assoc_stats(df: DataFrame, column: str, with_col: str,
                 by: str | None) -> DataFrame:
    """Per-group (or single-row global) association statistics:
    ``(by?, __v, __n, __r, __c)`` where ``__v`` is Cramér's V (NULL when
    undefined).  One groupBy over the data; everything downstream
    operates on contingency cells."""
    ca, cb = F.col(column), F.col(with_col)
    base = df.where(ca.isNotNull() & cb.isNotNull())
    keys = ([F.col(by)] if by is not None else []) + [ca, cb]
    cont = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("__o"))
    gcols = [by] if by is not None else []
    w_row = Window.partitionBy(*gcols, column)
    w_col = Window.partitionBy(*gcols, with_col)
    cells = cont.select(
        *gcols,
        F.col(column).alias("__a"), F.col(with_col).alias("__b"),
        F.col("__o"),
        F.sum("__o").over(w_row).alias("__rt"),
        F.sum("__o").over(w_col).alias("__ct"),
    )
    term = (F.col("__o").cast("double") * F.col("__o").cast("double")
            / (F.col("__rt").cast("double") * F.col("__ct").cast("double")))
    g = (cells.groupBy(*gcols)
         .agg(F.sum(term).alias("__t"),
              F.count_distinct(F.col("__a")).alias("__r"),
              F.count_distinct(F.col("__b")).alias("__c"),
              F.sum("__o").alias("__n")))
    dof = F.least(F.col("__r"), F.col("__c")) - F.lit(1)
    v = F.when(
        dof >= F.lit(1),
        F.sqrt(F.greatest(F.col("__t") - F.lit(1.0), F.lit(0.0))
               / dof.cast("double")))
    return g.select(*gcols, v.alias("__v"),
                    F.col("__n"), F.col("__r"), F.col("__c"))


def association_matrix(
    df: DataFrame,
    cols: list[str],
    by: str | None = None,
) -> DataFrame:
    """All pairwise Cramér's V of ``cols`` (categorical), per
    ``by``-group (or globally), as tidy rows ``(by?, col_a, col_b,
    cramers_v, n)`` with ``col_a < col_b``.  Each pair is one
    contingency aggregate (pairs have different groupings, so unlike
    ``correlation_matrix`` they cannot share a single pass); NULL V
    (constant side) is kept — the caller decides whether undefined
    association is a finding."""
    if len(cols) < 2:
        raise ValueError("association_matrix needs >= 2 columns")
    ordered = sorted(cols)
    gcols = [by] if by is not None else []
    out = None
    for i, a in enumerate(ordered):
        for b in ordered[i + 1:]:
            s = _assoc_stats(df, a, b, by).select(
                *gcols,
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                F.col("__v").alias("cramers_v"), F.col("__n").alias("n"))
            out = s if out is None else out.unionByName(s)
    return out


def _bad_and_bounds(min_v: float | None, max_v: float | None,
                    min_count: int) -> tuple[Column, str, str]:
    from jsonschema_valid_spark.operators._bounds import out_of_bounds

    bad = (F.col("__v").isNotNull()
           & (F.col("__n") >= F.lit(int(min_count)))
           & out_of_bounds(F.col("__v"), min_v, max_v))
    lo = "0" if min_v is None else f"{float(min_v):g}"
    hi = "1" if max_v is None else f"{float(max_v):g}"
    return bad, lo, hi


def association_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    with_col: str,
    by: str | None = None,
    min_v: float | None = None,
    max_v: float | None = None,
    min_count: int = 3,
) -> DataFrame:
    """``x-association`` execution: groups whose Cramér's V between
    ``column`` and ``with_col`` falls outside [min_v, max_v], as engine
    violation rows.  ``by=None`` checks ONE global association.
    observed renders V as decimal(10,4) (grid 1e-4; cross-engine float
    noise through the T-sum and sqrt is ~1e-14 — fixture margins are
    checked at registration, the x-correlation convention)."""
    if min_v is None and max_v is None:
        raise ValueError("x-association needs min and/or max")
    g = _assoc_stats(df, column, with_col, by)
    bad, lo, hi = _bad_and_bounds(min_v, max_v, min_count)
    doc = (F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
           if by is not None else F.lit("<global>"))
    scope = f" per {by}" if by else ""
    exp_msg = (f"cramers_v({column}, {with_col}) in [{lo}, {hi}]{scope} "
               f"(min_count={min_count})")
    return g.where(bad).select(
        doc.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("v="),
            F.round(F.col("__v"), 4).cast("decimal(10,4)").cast("string"),
            F.lit(",n="), F.col("__n").cast("string"),
            F.lit(",r="), F.col("__r").cast("string"),
            F.lit(",c="), F.col("__c").cast("string"),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )


def association_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    with_col: str,
    by: str,
    min_v: float | None = None,
    max_v: float | None = None,
    min_count: int = 3,
) -> DataFrame:
    """``x-association {"by", "verdicts": "perGroup"}``: every group
    enumerated with its V as metric_value (partition_id = group),
    passing ones included — the per-partition pass/fail shape.
    Undefined V (constant side) or thin groups report passed=True with
    metric NULL→0, the suppression contract."""
    if min_v is None and max_v is None:
        raise ValueError("x-association needs min and/or max")
    g = _assoc_stats(df, column, with_col, by)
    bad, _, _ = _bad_and_bounds(min_v, max_v, min_count)
    from jsonschema_valid_spark.operators._bounds import violated_threshold

    thr = violated_threshold(F.col("__v"), min_v, max_v)
    return g.select(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
        .alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        (~bad).alias("passed"),
        F.coalesce(F.col("__v"), F.lit(0.0)).cast("double")
        .alias("metric_value"),
        thr.cast("double").alias("threshold"),
    )
