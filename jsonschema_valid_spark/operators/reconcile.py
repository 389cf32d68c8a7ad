"""Table reconciliation — validating that two table versions agree.

The scenario: a 100 TB table was rewritten (compaction, migration, engine
swap, backfill) and you must prove the copy equals the original. Collecting
either side is impossible; a naive full-outer-join row-diff is the
*drill-down* tool, not the first move. The scale path is hierarchical:

1. :func:`reconcile_summary` — aggregate each side independently to one
   row per reconciliation group: ``(group, n_rows, sum of per-row
   hashes)``. Per-row hashing is embarrassingly parallel; the per-group
   aggregate gets map-side partial combine; the final join touches only
   #groups rows. The hash sum is order-independent, and is accumulated as
   DECIMAL(38,0) then reduced mod 2^60 — int64 would overflow after ~8
   rows (ANSI mode raises), while 10^12 rows × 2^60 ≈ 1.2e30 stays well
   inside decimal38 (DuckDB's BIGINT sum widens to INT128 the same way).
   A group difference goes undetected only on a mod-2^60 collision.
2. :func:`table_diff` — the drill-down: full outer join ON the key for
   ONLY the groups the summary flagged (pass ``groups=``) — emits
   (key, diff_kind ∈ missing_left/missing_right/value_mismatch).

Hashing: ``portable_hash60`` (md5-based, replayable in DuckDB) over a
canonical string encoding of the compared columns — fields joined with an
ASCII unit separator, NULLs mapped to a distinct marker. Caller contract:
free-text columns must not contain ``\\x1f``/the NULL marker (encode such
columns first, e.g. base64) — documented rather than escaped so the hash
stays a cheap native expression on both engines.

Cited reference seam: the reference validates ONE table against a schema
(lib.rs:114-160); reconciliation is the dataset-scope check suite a
rewrite pipeline needs on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from jsonschema_valid_spark.functions.dedup import portable_hash60

# the marker must survive as a plain byte inside a SQL string literal on
# both engines (NUL would terminate DuckDB's parser), and be impossible in
# data honoring the no-\x1f contract: a doubled separator can never appear
# inside a real field and differs from an empty field ('' between two
# separators).
_NULL_MARK = "\x1f\x1f"
_SEP = "\x1f"


def row_fingerprint(cols: list[str]) -> Column:
    """60-bit portable per-row hash over ``cols`` (order-sensitive,
    NULL-safe). Replayable in DuckDB — see :func:`oracle_row_fingerprint`."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL_MARK)) for c in cols]
    return portable_hash60(F.concat_ws(_SEP, *parts))


def oracle_row_fingerprint(cols: list[str], table_alias: str = "") -> str:
    """The DuckDB expression computing exactly :func:`row_fingerprint`."""
    pre = f"{table_alias}." if table_alias else ""
    joined = f" || '{_SEP}' || ".join(
        f"coalesce(CAST({pre}{c} AS VARCHAR), '{_NULL_MARK}')" for c in cols
    )
    return f"CAST(('0x' || substr(md5({joined}), 1, 15)) AS BIGINT)"


def reconcile_summary(
    left: DataFrame,
    right: DataFrame,
    group_by: str,
    compare_cols: list[str],
) -> DataFrame:
    """Group-level reconciliation WITHOUT joining row-level data.

    Each side: one scan → per-row fingerprint → groupBy(``group_by``)
    agg(count, sum(fingerprint)) — partial-combined, shuffle carries only
    #groups rows. The two tiny summaries full-outer-join on the group.

    Output: (group, left_rows, right_rows, left_hash, right_hash,
    status ∈ 'ok' | 'count_mismatch' | 'hash_mismatch' | 'missing_left' |
    'missing_right'). Rows with status='ok' are kept so the result is a
    complete per-group verdict table (filter on status != 'ok' for the
    work list feeding :func:`table_diff`)."""
    mod = F.lit(2 ** 60).cast("decimal(38,0)")

    def summarize(df: DataFrame, side: str) -> DataFrame:
        return (
            df.withColumn("__fp", row_fingerprint(compare_cols))
            .groupBy(F.col(group_by).cast("string").alias("grp"))
            .agg(
                F.count(F.lit(1)).alias(f"{side}_rows"),
                F.pmod(F.sum(F.col("__fp").cast("decimal(38,0)")), mod)
                 .cast("long").alias(f"{side}_hash"),
            )
        )

    ls = summarize(left, "left")
    rs = summarize(right, "right")
    j = ls.join(rs, "grp", "full_outer")
    status = (
        F.when(F.col("left_rows").isNull(), "missing_left")
        .when(F.col("right_rows").isNull(), "missing_right")
        .when(F.col("left_rows") != F.col("right_rows"), "count_mismatch")
        .when(F.col("left_hash") != F.col("right_hash"), "hash_mismatch")
        .otherwise("ok")
    )
    return j.select(
        "grp",
        F.coalesce("left_rows", F.lit(0)).alias("left_rows"),
        F.coalesce("right_rows", F.lit(0)).alias("right_rows"),
        "left_hash",
        "right_hash",
        status.alias("status"),
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key: str,
    compare_cols: list[str],
    groups: tuple[str, list[str]] | None = None,
) -> DataFrame:
    """Row-level drill-down: which keys differ and how.

    ``groups=(group_col, [values])`` restricts BOTH sides before the join —
    the intended pattern is summary-first (the flagged group list is tiny),
    so the expensive key-shuffle join runs over a sliver of the table; the
    filter is pushed to the parquet scan. Without ``groups`` it is a full
    key-join (documented cost: both sides shuffle on the key once).

    Output: (key, diff_kind ∈ missing_left/missing_right/value_mismatch,
    left_fp, right_fp). Assumes ``key`` is unique per side (validate with
    the uniqueness operator first — that is the engine's own job)."""
    if groups is not None:
        gcol, vals = groups
        # raw-typed isin (no cast) so the In-filter pushes to the scan
        left = left.where(F.col(gcol).isin(list(vals)))
        right = right.where(F.col(gcol).isin(list(vals)))
    lf = left.select(F.col(key).cast("string").alias("k"),
                     row_fingerprint(compare_cols).alias("left_fp"))
    rf = right.select(F.col(key).cast("string").alias("k"),
                      row_fingerprint(compare_cols).alias("right_fp"))
    j = lf.join(rf, "k", "full_outer")
    kind = (
        F.when(F.col("left_fp").isNull(), "missing_left")
        .when(F.col("right_fp").isNull(), "missing_right")
        .when(F.col("left_fp") != F.col("right_fp"), "value_mismatch")
    )
    return (
        j.select(F.col("k").alias(key), kind.alias("diff_kind"),
                 "left_fp", "right_fp")
        .where(F.col("diff_kind").isNotNull())
    )
