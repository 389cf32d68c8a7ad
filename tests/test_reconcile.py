"""Table reconciliation (operators/reconcile.py): summary-first, then
row-level drill-down restricted to flagged groups."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.reconcile import (
    reconcile_summary,
    row_fingerprint,
    table_diff,
)
from tests.conftest import SF_DIR

COMPARE = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def corrupted(docs):
    """Deterministic rewrite defects: drop rows from src3, mutate values in
    src5, leave everything else byte-identical."""
    return (
        docs.where(~((F.col("source") == "src3") & (F.col("doc_id") % 7 == 0)))
        .withColumn(
            "n_chars",
            F.when((F.col("source") == "src5") & (F.col("doc_id") % 11 == 0),
                   F.col("n_chars") + 1).otherwise(F.col("n_chars")),
        )
    )


def test_identical_tables_all_ok(spark, docs):
    s = reconcile_summary(docs, docs, "source", COMPARE)
    assert s.where("status != 'ok'").isEmpty()
    assert s.count() == docs.select("source").distinct().count()


def test_summary_flags_exact_groups(spark, docs, corrupted):
    s = {r["grp"]: r["status"]
         for r in reconcile_summary(docs, corrupted, "source", COMPARE).collect()}
    assert s["src3"] == "count_mismatch"
    assert s["src5"] == "hash_mismatch"
    assert all(v == "ok" for g, v in s.items() if g not in ("src3", "src5"))


def test_summary_missing_sides(spark, docs):
    left_only = docs.where("source = 'src2'")
    right_only = docs.where("source IN ('src2','src4')")
    s = {r["grp"]: r["status"]
         for r in reconcile_summary(left_only, right_only, "source", COMPARE).collect()}
    assert s == {"src2": "ok", "src4": "missing_left"}
    s2 = {r["grp"]: r["status"]
          for r in reconcile_summary(right_only, left_only, "source", COMPARE).collect()}
    assert s2["src4"] == "missing_right"


def test_diff_drilldown_matches_summary(spark, docs, corrupted):
    flagged = [r["grp"] for r in
               reconcile_summary(docs, corrupted, "source", COMPARE)
               .where("status != 'ok'").collect()]
    d = table_diff(docs, corrupted, "doc_id", COMPARE,
                   groups=("source", flagged))
    kinds = {r["doc_id"]: r["diff_kind"] for r in d.collect()}
    expected_missing = {
        str(r["doc_id"]) for r in
        docs.where("source = 'src3' AND doc_id % 7 = 0").collect()}
    expected_mismatch = {
        str(r["doc_id"]) for r in
        docs.where("source = 'src5' AND doc_id % 11 = 0").collect()}
    assert {k for k, v in kinds.items() if v == "missing_right"} == expected_missing
    assert {k for k, v in kinds.items() if v == "value_mismatch"} == expected_mismatch
    assert not any(v == "missing_left" for v in kinds.values())


def test_diff_group_filter_pushed_down(spark):
    # the module fixture's cache() would substitute an InMemoryRelation for
    # this same parquet plan, hiding the FileScan we assert on
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = table_diff(docs, docs, "doc_id", COMPARE,
                   groups=("source", ["src1", "src2"]))
    plan = d._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan_lines and all("In(source" in ln or "In(source" in plan
                              for ln in scan_lines), plan[:2000]
    assert "In(source, [src1,src2])" in plan


def test_summary_no_rowlevel_join(spark):
    """The summary join carries only per-group aggregates: both scans feed
    an aggregate BEFORE the join (never a row-level shuffle join)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (reconcile_summary(docs, docs, "source", COMPARE)
            ._jdf.queryExecution().optimizedPlan().toString())
    join_pos = plan.find("Join")
    agg_positions = [i for i in range(len(plan))
                     if plan.startswith("Aggregate", i)]
    # both branch aggregates appear BELOW (after, in tree print) the join
    assert join_pos >= 0 and len(agg_positions) >= 2
    assert all(p > join_pos for p in agg_positions)


def test_fingerprint_null_sensitivity(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", ""), (None, "a"), ("", "a")],
        "x string, y string")
    fps = [r[0] for r in df.select(row_fingerprint(["x", "y"])).collect()]
    assert len(set(fps)) == 4  # NULL vs '' and position all distinguish
