"""Cross-table aggregate consistency and partition completeness.

Two table-level integrity checks a validation engine needs beyond the
reference's row-scope keywords (≙ the dataset lift of `required`/`enum` —
validators.rs dispatches per instance; these dispatch per TABLE):

* :func:`aggregate_consistency` — does a parent column equal an aggregate
  of its child table per key (orders.o_totalprice vs SUM over lineitem)?
  The rewrite-validation sibling of ``operators/reconcile.py``: reconcile
  proves two copies of the SAME rows agree; this proves a DERIVED column
  agrees with its source-of-truth aggregation.
* :func:`partition_completeness` — is every expected partition present and
  populated (≥ min_rows)? The arrival-time check for partitioned ingest:
  a missing `(source, day)` partition is invisible to every row-scope
  check because there are no rows to violate anything.

Scale contract (10^12-row child, 10^9 keys): the child NEVER joins at row
grain — it collapses to one row per key via a partial-aggregated groupBy
first, so the join is #keys × #keys on the join key; `summary` mode then
collapses to ≤4 status rows. Completeness scans the fact table once with
map-side combine; the expected-domain join touches #partitions rows only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def aggregate_consistency(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    parent_expr: str,
    child_agg_expr: str,
    tol: float = 0.0,
    mode: str = "rows",
) -> DataFrame:
    """Compare a per-key parent expression against a child-table aggregate.

    ``parent`` must be unique per ``parent_key`` (one row per key — the
    usual PK side); ``parent_expr`` is a per-row SQL expression over it.
    ``child_agg_expr`` is a SQL *aggregate* expression evaluated per
    ``child_key`` group (e.g. ``sum(l_extendedprice * (1 - l_discount))``).
    Pass decimal-cast expressions when the column is floating point and the
    result must be partitioning-invariant — double addition is
    order-dependent; decimal addition is exact.

    mode="rows": one row per key — key, parent_value, child_value,
    abs_diff, status ∈ {match, mismatch, parent_only, child_only}.
    mode="summary": one row per status — status, n_keys, max_abs_diff.
    """
    if mode not in ("rows", "summary"):
        raise ValueError(f"mode must be 'rows' or 'summary', got {mode!r}")
    p = parent.select(
        F.col(parent_key).alias("key"),
        F.expr(parent_expr).alias("parent_value"),
    )
    c = child.groupBy(F.col(child_key).alias("key")).agg(
        F.expr(child_agg_expr).alias("child_value")
    )
    j = p.join(c, "key", "full_outer")
    diff = F.abs(F.col("parent_value") - F.col("child_value"))
    status = (
        F.when(F.col("parent_value").isNull(), F.lit("child_only"))
        .when(F.col("child_value").isNull(), F.lit("parent_only"))
        .when(diff <= F.lit(tol), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    rows = j.select(
        "key",
        "parent_value",
        "child_value",
        diff.alias("abs_diff"),
        status.alias("status"),
    )
    if mode == "rows":
        return rows
    return rows.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("abs_diff").alias("max_abs_diff"),
    )


def partition_completeness(
    df: DataFrame,
    cols: Sequence[str],
    expected: Sequence,
    min_rows: int = 1,
) -> DataFrame:
    """Per-partition presence/population check against an expected domain.

    ``expected`` is the declared partition domain: a sequence of values
    (single column) or tuples (multi-column), or a DataFrame carrying
    exactly ``cols``. Output: one row per partition seen in either side —
    cols…, n_rows, status ∈ {missing, under, ok, unexpected}.

    * missing — declared but zero rows arrived (the failure row-scope
      checks can't see);
    * under — present but n_rows < min_rows (partial/truncated load);
    * unexpected — data arrived for an undeclared partition value.

    One count aggregate over the facts (map-side partial combine), then a
    full-outer join of two #partitions-sized frames — the expected side is
    driver-declared and tiny by construction.
    """
    cols = list(cols)
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    if isinstance(expected, DataFrame):
        exp = expected.select(*cols).distinct()
    else:
        rows = [(v,) if not isinstance(v, (tuple, list)) else tuple(v)
                for v in expected]
        exp = df.sparkSession.createDataFrame(
            rows, df.select(*cols).schema
        ).distinct()
    exp = exp.withColumn("__declared", F.lit(True))
    j = exp.join(counts, on=cols, how="full_outer")
    status = (
        F.when(F.col("n_rows").isNull(), F.lit("missing"))
        .when(F.col("__declared").isNull(), F.lit("unexpected"))
        .when(F.col("n_rows") < F.lit(min_rows), F.lit("under"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        *cols,
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        status.alias("status"),
    )


def aggregate_violations(
    parent: DataFrame,
    child: DataFrame,
    column: str,
    check_id: str,
    parent_key: str,
    child_key: str,
    child_agg_expr: str,
    parent_expr: str | None = None,
    tol: float = 0.0,
    allow_parent_only: bool = False,
    allow_child_only: bool = False,
) -> DataFrame:
    """``x-aggConsistency`` execution: inconsistent keys as engine violation
    rows (doc_id, check_id, observed, expected).

    The violating "document" is the parent KEY — the unit a derived column
    disagrees with its source-of-truth aggregation over (≙ the reference's
    `const` lifted from a literal to a per-key child aggregate —
    validators.rs `const` compares instance == expected; here expected is
    computed per key from the child table). observed =
    ``<status>:<parent>!=<child>`` (values rendered via CAST AS STRING —
    pass decimal-cast expressions for cross-engine-stable witnesses and
    partitioning-invariant sums; double addition is order-dependent).
    ``allow_parent_only`` tolerates parent keys with no child rows (e.g. a
    header table that legitimately leads its detail feed);
    ``allow_child_only`` tolerates orphaned child keys (x-referential
    already polices membership when that is what's wanted).
    """
    out = aggregate_consistency(
        parent, child, parent_key, child_key,
        parent_expr=parent_expr or column,
        child_agg_expr=child_agg_expr, tol=tol, mode="rows",
    )
    bad = ["mismatch"]
    if not allow_parent_only:
        bad.append("parent_only")
    if not allow_child_only:
        bad.append("child_only")
    exp_msg = (f"{parent_expr or column} == {child_agg_expr} "
               f"per {child_key} (tol={tol})")
    return out.where(F.col("status").isin(*bad)).select(
        F.col("key").cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat_ws(
            ":", "status",
            F.concat_ws("!=", F.col("parent_value").cast("string"),
                        F.col("child_value").cast("string")),
        ).alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )


def completeness_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    expected: Sequence,
    min_rows: int = 1,
    allow_unexpected: bool = False,
) -> DataFrame:
    """``x-partitionComplete`` execution: failing partitions as engine
    violation rows (doc_id, check_id, observed, expected).

    The violating "document" is the partition value itself — a missing
    partition has no rows to point at, which is exactly why this check is
    dataset-scope (≙ the reference's `required` lifted from object keys to
    table partitions — validators.rs `required` reports the absent name).
    observed = "<status>:<n_rows>"; ``allow_unexpected=True`` downgrades
    undeclared-partition rows to non-violations (enum already polices the
    value domain at row scope when that is what's wanted).
    """
    out = partition_completeness(df, [column], expected, min_rows=min_rows)
    bad = ("missing", "under") if allow_unexpected else (
        "missing", "under", "unexpected")
    exp_msg = (f"declared {column} partition with >= {min_rows} row(s)"
               + ("" if allow_unexpected else "; no undeclared partitions"))
    return out.where(F.col("status").isin(*bad)).select(
        F.col(column).cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat_ws(":", "status", F.col("n_rows").cast("string"))
        .alias("observed"),
        F.lit(exp_msg).alias("expected"),
    )
