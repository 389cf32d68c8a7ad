"""x-maxFrequency: per-value dominance caps (operators/frequency.py) —
exact groupBy mode and the Misra-Gries sketch + exact-recount mode, which
must produce IDENTICAL (exact) output under any partitioning."""

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.frequency import (
    exact_value_counts,
    frequency_violations,
    heavy_hitters,
    mg_partition_summaries,
)
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _skewed(spark, n=10_000):
    """id-derived: value 'hot' on ~30% of rows, 'warm' ~10%, the rest a
    long unique tail — deterministic."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit("hot"))
         .when(F.col("id") % 10 == 3, F.lit("warm"))
         .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("v"))


def test_exact_counts_one_scan_total(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "doc_id: long, v: string")
    rows = {r["value"]: (r["n"], r["total"])
            for r in exact_value_counts(df, "v").collect()}
    assert rows["a"] == (2, 4) and rows["b"] == (1, 4)
    assert rows["\x00<null>"] == (1, 4)


def test_exact_violations_fraction_and_count(spark):
    df = _skewed(spark)
    out = frequency_violations(df, "v", "c", max_fraction=0.25)
    got = {(r["doc_id"], r["observed"], r["expected"])
           for r in out.collect()}
    assert got == {("hot", "count=3000",
                    "fraction <= 0.25 of total=10000")}
    out2 = frequency_violations(df, "v", "c", max_count=999)
    got2 = {r["doc_id"] for r in out2.collect()}
    assert got2 == {"hot", "warm"}
    # both bounds OR together; expected names both
    out3 = frequency_violations(df, "v", "c", max_fraction=0.25,
                                max_count=999)
    rows3 = {r["doc_id"]: r["expected"] for r in out3.collect()}
    assert set(rows3) == {"hot", "warm"}
    assert rows3["warm"] == ("fraction <= 0.25 and count <= 999 "
                             "of total=10000")


def test_boundary_is_strict_integer_compare(spark):
    # 75 of 500 at maxFraction 0.15: 75*denom == num*total exactly -> NOT
    # a violation (strict >) with no float-division edge in either engine
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 75, F.lit("x"))
         .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("v"))
    assert frequency_violations(df, "v", "c", max_fraction=0.15).count() == 0
    df2 = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 76, F.lit("x"))
         .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("v"))
    assert [r["doc_id"] for r in frequency_violations(
        df2, "v", "c", max_fraction=0.15).collect()] == ["x"]


def test_sketch_equals_exact_any_partitioning(spark):
    df = _skewed(spark)
    exact = sorted(map(tuple, frequency_violations(
        df, "v", "c", max_fraction=0.08).collect()))
    for parts in (1, 7, 32):
        sk = sorted(map(tuple, frequency_violations(
            df.repartition(parts), "v", "c", max_fraction=0.08,
            mode="sketch").collect()))
        assert sk == exact, f"sketch != exact at {parts} partitions"


def test_sketch_high_cardinality_adversarial(spark):
    """60k distinct tail values per partition stress the MG reduction;
    the true heavy (12%) must survive and be exactly counted."""
    n = 60_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 25 < 3, F.lit("dom"))
         .otherwise(F.concat(F.lit("t"), F.col("id"))).alias("v"))
    hh = heavy_hitters(df.repartition(11), "v", max_fraction=0.1)
    rows = [(r["value"], r["n"], r["total"]) for r in hh.collect()]
    assert rows == [("dom", 7200, 60000)]


def test_mg_summaries_never_overcount(spark):
    df = _skewed(spark, 5000).repartition(5)
    summ = (mg_partition_summaries(df, "v", k=16)
            .where(F.col("value").isNotNull())
            .groupBy("value").agg(F.sum("est").alias("est")))
    truth = {r["value"]: r["n"]
             for r in exact_value_counts(df, "v").collect()}
    for r in summ.collect():
        assert r["est"] <= truth[r["value"]], "MG estimate overcounts"
    # total rows carry the table size exactly
    tot = (mg_partition_summaries(df, "v", k=16)
           .where(F.col("value").isNull()).agg(F.sum("est")).first()[0])
    assert tot == 5000


def test_null_dominance_flagged(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 60, F.lit(None).cast("string"))
         .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("v"))
    out = frequency_violations(df, "v", "c", max_fraction=0.5)
    assert [r["doc_id"] for r in out.collect()] == ["<null>"]


def test_exact_mode_no_join_one_base_scan(spark):
    out = frequency_violations(_skewed(spark), "v", "c", max_fraction=0.25)
    out.collect()  # AQE: exchange reuse materializes in the FINAL plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r5: the global total is a broadcast SCALAR cross-join (never a
    # single-partition window over all distinct values); the only join
    # allowed is that 1-row nested-loop — no data-grain shuffle join
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" not in plan
    # the scalar branch READS THE SAME counts shuffle (stage reuse) —
    # the base table is physically scanned once
    assert "ReusedExchange" in plan


def test_keyword_both_paths_and_verdict(spark):
    spec = {"properties": {"v": {"x-maxFrequency": {"maxFraction": 0.25}}}}
    df = _skewed(spark)
    res = CheckSuite(spec).run(df, key="doc_id")
    assert [r["doc_id"] for r in res.violations.collect()] == ["hot"]
    cid = "properties/v/x-maxFrequency"
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1 and not verd[0]["passed"]
    assert verd[0]["metric_value"] == 1.0

    summ = run_suite_summarized(CheckSuite(spec), df, key="doc_id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, res.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))
    sverd = [r for r in summ.verdicts.collect() if r["check_id"] == cid]
    assert len(sverd) == 1 and not sverd[0]["passed"]


def test_keyword_sketch_mode(spark):
    spec = {"properties": {"v": {"x-maxFrequency": {
        "maxFraction": 0.25, "mode": "sketch"}}}}
    res = CheckSuite(spec).run(_skewed(spark), key="doc_id")
    assert [r["doc_id"] for r in res.violations.collect()] == ["hot"]


def test_operator_rejects_bad_args(spark):
    df = _skewed(spark, 100)
    with pytest.raises(ValueError):
        frequency_violations(df, "v", "c")
    with pytest.raises(ValueError):
        frequency_violations(df, "v", "c", max_fraction=1.5)
    with pytest.raises(ValueError):
        frequency_violations(df, "v", "c", max_fraction=0.1, mode="approx")
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", max_count=5)  # sketch needs explicit k
    with pytest.raises(ValueError):
        # slack swamps the threshold -> candidate guard refuses (many
        # partitions x k survivors >> max_candidates)
        heavy_hitters(df.repartition(40), "v", max_count=1, k=2,
                      max_candidates=3)


@pytest.mark.parametrize("bad", [
    {},                                    # no bound
    {"mode": "sketch"},                    # no bound
    {"maxFraction": 0.0},                  # out of range
    {"maxFraction": 1.5},                  # out of range
    {"maxFraction": True},                 # bool
    {"maxCount": 0},                       # below 1
    {"maxCount": 10, "mode": "sketch"},    # sketch without fraction or k
    {"maxFraction": 0.1, "mode": "hll"},   # bad mode
    {"maxFraction": 0.1, "k": 1},          # k too small
    {"maxFraction": 0.1, "share": 2},      # unknown key
    0.5,                                   # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-maxFrequency": bad}}})


def test_spec_and_metaschema_accept(spark):
    spec = {"properties": {"v": {"x-maxFrequency": {
        "maxFraction": 0.2, "maxCount": 100, "mode": "sketch", "k": 64}}}}
    validate_suite_spec(spec)
    assert validate_suite_with_engine(spark, spec).ok()


def test_per_group_dominance(spark):
    """by= scopes the cap per group: a value may own 30% of the table
    but not 80% of one group."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("g"),
        # group g0 collapses to one value; others stay diverse
        F.when(F.col("id") % 4 == 0, F.lit("stuck"))
         .otherwise(F.concat(F.lit("v"), (F.col("id") % 10).cast("string")))
        .alias("v"))
    out = frequency_violations(df, "v", "c", max_fraction=0.5, by="g")
    rows = [(r["doc_id"], r["observed"], r["expected"])
            for r in out.collect()]
    assert rows == [("g0", "value=stuck count=250",
                     "fraction <= 0.5 of total=250 per g")]

    spec = {"properties": {"v": {"x-maxFrequency": {
        "maxFraction": 0.5, "by": "g"}}}}
    from jsonschema_valid_spark import CheckSuite
    res = CheckSuite(spec).run(df, key="doc_id")
    assert [r["doc_id"] for r in res.violations.collect()] == ["g0"]

    import pytest as _pt
    with _pt.raises(ValueError):
        frequency_violations(df, "v", "c", max_fraction=0.5, by="g",
                             mode="sketch")
    from jsonschema_valid_spark.suite.spec import SuiteError, \
        validate_suite_spec
    with _pt.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-maxFrequency": {
            "maxFraction": 0.5, "by": "g", "mode": "sketch"}}}})


def test_per_group_verdicts_both_paths(spark):
    """{'verdicts': 'perGroup'}: every group enumerated with its top
    value share — passing groups included, no <global> roll-up."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("g"),
        F.when(F.col("id") % 4 == 0, F.lit("stuck"))
         .otherwise(F.concat(F.lit("v"), (F.col("id") % 10).cast("string")))
        .alias("v"))
    spec = {"properties": {"v": {"x-maxFrequency": {
        "maxFraction": 0.5, "by": "g", "verdicts": "perGroup"}}}}
    cid = "properties/v/x-maxFrequency"
    res = CheckSuite(spec).run(df, key="doc_id")
    verd = {r["partition_id"]: (r["passed"], round(r["metric_value"], 4),
                                r["threshold"])
            for r in res.verdicts.collect() if r["check_id"] == cid}
    # g0 collapsed to one value (share 1.0); g1-g3 diverse (~0.12 top)
    assert verd["g0"] == (False, 1.0, 0.5)
    assert set(verd) == {"g0", "g1", "g2", "g3"}
    assert all(p for g, (p, _, _) in verd.items() if g != "g0")
    # violations unchanged
    assert [r["doc_id"] for r in res.violations.collect()] == ["g0"]

    summ = run_suite_summarized(CheckSuite(spec), df, key="doc_id")
    sv = {r["partition_id"]: (r["passed"], round(r["metric_value"], 4),
                              r["threshold"])
          for r in summ.verdicts.collect() if r["check_id"] == cid}
    assert sv == verd

    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-maxFrequency": {
            "maxFraction": 0.5, "verdicts": "perGroup"}}}})  # needs by
