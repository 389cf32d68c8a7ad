"""Relational symmetry: reciprocal pair completeness — the
``x-reciprocal`` keyword (every observed (a, b) pair must also occur
reversed as (b, a)).

The SYMMETRY contract of pair-structured data: undirected graphs stored
as two directed rows (friendship/link tables), double-entry transfers
(every A→B posting has its B→A mirror), bidirectional mappings
(alias↔canonical, route out↔back).  No existing family can express it:
``x-referential`` checks membership in ANOTHER table's domain,
``x-unique`` checks multiplicity of ONE key, ``x-functionalDependency``
checks determination — the invariant here is between a row and a
DIFFERENT row of the same table with the key columns swapped.

Scale contract: never a self-join.  Both directions of a pair share one
CANONICAL cell ``(least(a,b), greatest(a,b))``, so the whole check is
ONE map-side-combined ``groupBy(by?, lo, hi)`` carrying two conditional
counts (forward = rows with a < b, reverse = rows with a > b) —
#distinct-pairs rows shuffled, every downstream predicate on cells.
The naive formulation (distinct pairs anti-joined against their swap)
shuffles both sides of a join on the same keys; the canonical-cell
aggregate is strictly cheaper and AQE-friendly.  Self-pairs (a = b) are
their own reverse — never violations, counted separately so they can't
masquerade as a direction.

``matchCounts: true`` is the strict ledger form: the two directions
must occur EQUALLY OFTEN (every posting individually mirrored), not
just both be present.

NULL on either side exits the pair domain (``required``/``x-nullRate``
own presence).  Columns must share a type — ``least``/``greatest``
canonicalization is only meaningful within one ordering (checked
eagerly with a clear error, not left to Catalyst's coercion).

Reference: dataset-scope lift with no analog in the reference's row
keywords (validators.rs) — the reference validates one instance at a
time and cannot see cross-row structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check_same_type(df: DataFrame, column: str, with_col: str) -> None:
    types = dict(df.dtypes)
    ta, tb = types.get(column), types.get(with_col)
    if ta is not None and tb is not None and ta != tb:
        raise ValueError(
            f"x-reciprocal columns must share a type for canonical "
            f"ordering: {column} is {ta}, {with_col} is {tb} — cast one "
            f"side explicitly (implicit coercion would silently change "
            f"which pairs collide)")


def _pair_cells(df: DataFrame, column: str, with_col: str,
                by: str | None) -> DataFrame:
    """Canonical pair cells ``(by?, __lo, __hi, __fwd, __rev, __self)``:
    one map-side-combined aggregate over the data; everything downstream
    runs on #distinct-pairs rows."""
    _check_same_type(df, column, with_col)
    a, b = F.col(column), F.col(with_col)
    base = df.where(a.isNotNull() & b.isNotNull())
    gcols = [by] if by is not None else []
    keys = ([F.col(by)] if by is not None else []) + [
        F.least(a, b).alias("__lo"), F.greatest(a, b).alias("__hi")]
    return base.groupBy(*keys).agg(
        F.sum(F.when(a < b, 1).otherwise(0)).alias("__fwd"),
        F.sum(F.when(a > b, 1).otherwise(0)).alias("__rev"),
        F.sum(F.when(a == b, 1).otherwise(0)).alias("__self"),
    ).select(*gcols, "__lo", "__hi", "__fwd", "__rev", "__self")


def _bad_cell(match_counts: bool) -> F.Column:
    fwd, rev = F.col("__fwd"), F.col("__rev")
    if match_counts:
        return fwd != rev
    return (fwd > 0) != (rev > 0)


def reciprocity_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    with_col: str,
    by: str | None = None,
    match_counts: bool = False,
) -> DataFrame:
    """``x-reciprocal`` execution: canonical pairs whose reverse
    direction is absent (or, with ``match_counts``, unequally frequent),
    as engine violation rows.  doc_id names the canonical pair
    ``lo|hi`` (``by|lo|hi`` when grouped); observed carries both
    direction counts so the missing side is self-evident."""
    g = _pair_cells(df, column, with_col, by)
    bad = _bad_cell(match_counts)
    parts = ([F.coalesce(F.col(by).cast("string"), F.lit("<null>")),
              F.lit("|")] if by is not None else [])
    doc = F.concat(*parts, F.col("__lo").cast("string"),
                   F.lit("|"), F.col("__hi").cast("string"))
    form = ("count(a,b) == count(b,a)" if match_counts
            else "(a,b) present => (b,a) present")
    scope = f" per {by}" if by else ""
    exp_msg = f"{form} for ({column}, {with_col}){scope}"
    return g.where(bad).select(
        doc.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(
            F.lit("fwd="), F.col("__fwd").cast("string"),
            F.lit(",rev="), F.col("__rev").cast("string"),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )


def reciprocity_group_verdicts(
    df: DataFrame,
    column: str,
    check_id: str,
    with_col: str,
    by: str,
    min_share: float = 1.0,
    match_counts: bool = False,
) -> DataFrame:
    """``x-reciprocal {"by", "verdicts": "perGroup"}``: every group
    enumerated with its reciprocated-pair share as metric_value
    (reciprocated cells / non-self cells; self-pairs are trivially
    symmetric and excluded from the denominator so they can't pad the
    share).  A group with no non-self pairs has an undefined share →
    metric NULL→reported 1.0, passed (the suppression contract)."""
    if not (0.0 < float(min_share) <= 1.0):
        raise ValueError(f"minShare must be in (0, 1], got {min_share}")
    g = _pair_cells(df, column, with_col, by)
    bad = _bad_cell(match_counts)
    nonself = F.col("__fwd") + F.col("__rev") > 0
    per = g.groupBy(by).agg(
        F.sum(F.when(nonself, 1).otherwise(0)).alias("__pairs"),
        F.sum(F.when(nonself & ~bad, 1).otherwise(0)).alias("__ok"),
    )
    share = F.try_divide(F.col("__ok").cast("double"),
                         F.col("__pairs").cast("double"))
    return per.select(
        F.coalesce(F.col(by).cast("string"), F.lit("<null>"))
        .alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        F.coalesce(share >= F.lit(float(min_share)), F.lit(True))
        .alias("passed"),
        F.coalesce(share, F.lit(1.0)).cast("double").alias("metric_value"),
        F.lit(float(min_share)).cast("double").alias("threshold"),
    )
