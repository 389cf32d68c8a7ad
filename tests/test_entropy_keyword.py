"""x-entropy: Shannon-entropy bounds of a categorical mix (wave 29) —
the mix-collapse detector completing the distribution-health family
(x-maxFrequency caps dominance, x-distinctRatio bounds cardinality,
this bounds the SHAPE)."""

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.entropy import (
    entropy_group_verdicts,
    entropy_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    i = 0
    # "uniform4": 4 equal categories -> H = 2 bits exactly
    for v in "abcd":
        for _ in range(25):
            rows.append((i, "uniform4", v)); i += 1
    # "skew": 97/1/1/1 -> H ~ 0.32 bits (collapsed mix, same k=4)
    for v, n in (("a", 97), ("b", 1), ("c", 1), ("d", 1)):
        for _ in range(n):
            rows.append((i, "skew", v)); i += 1
    # "const": one category -> H = 0 exactly (and normalized undefined)
    for _ in range(40):
        rows.append((i, "const", "a")); i += 1
    # "tiny": below min_count
    rows.append((i, "tiny", "a")); i += 1
    rows.append((i, "tiny", "b")); i += 1
    # NULL values are excluded
    rows.append((i, "uniform4", None)); i += 1
    return spark.createDataFrame(rows, "id: long, grp: string, v: string")


def test_exact_entropy_uniform_and_skewed(spark):
    df = _df(spark)
    # min bound: the diversity floor -> skew + const trip, uniform4 holds
    v = entropy_violations(df, "v", "c", by="grp", min_h=1.5, min_count=5)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert set(got) == {"skew", "const"}
    assert got["const"] == "h=0.0000,k=1,n=40"
    h_skew = (math.log2(100)
              - (97 * math.log2(97) + 3 * (1 * math.log2(1))) / 100)
    assert got["skew"] == f"h={h_skew:.4f},k=4,n=100"

    # max bound: the compactness ceiling -> uniform4 trips at exactly 2
    vmax = entropy_violations(df, "v", "c", by="grp", max_h=1.9,
                              min_count=5)
    got = {r.doc_id: r.observed for r in vmax.collect()}
    assert set(got) == {"uniform4"}
    assert got["uniform4"] == "h=2.0000,k=4,n=100"


def test_normalized_and_suppression(spark):
    df = _df(spark)
    # normalized: uniform4 -> exactly 1.0; const k=1 -> undefined ->
    # suppressed even under a min bound; tiny suppressed by min_count
    v = entropy_violations(df, "v", "c", by="grp", min_h=0.9,
                           normalized=True, min_count=5)
    got = {r.doc_id for r in v.collect()}
    assert got == {"skew"}

    g = entropy_group_verdicts(df, "v", "c", by="grp", min_h=0.9,
                               normalized=True, min_count=5)
    rows = {r.partition_id: r for r in g.collect()}
    assert set(rows) == {"uniform4", "skew", "const", "tiny"}
    assert rows["uniform4"].passed
    assert abs(rows["uniform4"].metric_value - 1.0) < 1e-12
    assert not rows["skew"].passed
    assert rows["const"].passed          # undefined -> suppressed
    assert rows["const"].metric_value == 0.0
    assert rows["tiny"].passed           # min_count -> suppressed


def test_global_scope_and_null_exclusion(spark):
    df = _df(spark)
    # global: one verdict over the whole table; the NULL row must not
    # count toward n (201 non-null across all groups)
    g = entropy_violations(df, "v", "c", min_h=20.0)
    rows = g.collect()
    assert len(rows) == 1 and rows[0].doc_id == "<global>"
    assert ",n=242" in rows[0].observed


def test_engine_both_paths_and_verdicts(spark):
    df = _df(spark)
    suite = CheckSuite({"properties": {"v": {"x-entropy": {
        "min": 1.5, "by": "grp", "minCount": 5}}}})
    res = suite.run(df, key="id")
    assert {r.doc_id for r in res.violations.collect()} == {"skew", "const"}
    vd = {r.partition_id: r for r in res.verdicts.collect()}
    assert vd["<global>"].passed is False

    res2 = run_suite_summarized(suite, df, key="id")
    assert {r.doc_id
            for r in res2.violations.collect()} == {"skew", "const"}

    # perGroup verdicts enumerate every group incl. passing ones
    suite3 = CheckSuite({"properties": {"v": {"x-entropy": {
        "min": 1.5, "by": "grp", "minCount": 5,
        "verdicts": "perGroup"}}}})
    res3 = suite3.run(df, key="id")
    vd3 = {r.partition_id: r for r in res3.verdicts.collect()}
    assert set(vd3) == {"uniform4", "skew", "const", "tiny"}
    assert vd3["uniform4"].passed and not vd3["skew"].passed
    assert vd3["skew"].threshold == 1.5


def test_plan_single_exchange(spark):
    df = _df(spark)
    v = entropy_violations(df, "v", "c", by="grp", min_h=1.5)
    plan = v._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # two-level agg over one partitioning: cells then group stats —
    # Spark needs one Exchange per distinct grouping (grp,v) then (grp),
    # but the second is partial-agg-only data (#cells rows)
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_spec_validation():
    validate_suite_spec({"properties": {"v": {"x-entropy": {
        "min": 1.0, "max": 3.0, "by": "g", "minCount": 5}}}})
    validate_suite_spec({"properties": {"v": {"x-entropy": {
        "min": 0.5, "normalized": True}}}})
    for bad in (
        {"x-entropy": {}},                            # no bound
        {"x-entropy": {"min": -0.1}},                 # negative bits
        {"x-entropy": {"min": 1.2, "normalized": True}},  # >1 normalized
        {"x-entropy": {"min": True}},                 # bool is not number
        {"x-entropy": {"min": 1, "minCount": 0}},     # minCount < 1
        {"x-entropy": {"min": 1, "verdicts": "perGroup"}},  # needs by
        {"x-entropy": 1.5},                           # not an object
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"v": bad}})


def test_streaming_matches_batch(spark, tmp_path):
    """stream_entropy_verdicts == the batch operator on the collapsed
    declared-category column, per closed window; cross-batch merge."""
    from jsonschema_valid_spark.streaming.checks import (
        stream_entropy_verdicts,
    )

    rows = []
    # window 0 (00:00): balanced over a,b,c,d -> 2 bits
    for i, v in enumerate("abcd" * 5):
        rows.append((f"2024-01-01 00:00:{i:02d}", v))
    # window 1 (00:01): collapsed to mostly 'a' + one undeclared 'z'
    for i, v in enumerate("a" * 18 + "bz"):
        rows.append((f"2024-01-01 00:01:{i:02d}", v))
    src = tmp_path / "src"
    src.mkdir()
    import json

    # two micro-batches splitting window 0 across them
    (src / "b0.json").write_text("\n".join(
        json.dumps({"ts": t, "v": v}) for t, v in rows[:10]))
    batch2 = rows[10:]

    sdf = (spark.readStream.schema("ts string, v string")
           .option("maxFilesPerTrigger", 1).json(str(src))
           .withColumn("ts", F.col("ts").cast("timestamp")))
    out = stream_entropy_verdicts(
        sdf, "v", "ts", categories=["a", "b", "c", "d"],
        min_h=1.5, window_duration="1 minute")
    q = (out.writeStream.format("memory").queryName("ent_verdicts")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        (src / "b1.json").write_text("\n".join(
            json.dumps({"ts": t, "v": v}) for t, v in batch2))
        q.processAllAvailable()
        # close both windows
        (src / "b2.json").write_text(json.dumps(
            {"ts": "2024-01-01 00:10:00", "v": "a"}))
        q.processAllAvailable()
        got = {str(r.window_start): r
               for r in spark.sql("select * from ent_verdicts").collect()}
    finally:
        q.stop()
    w0 = got["2024-01-01 00:00:00"]
    w1 = got["2024-01-01 00:01:00"]
    assert w0.passed and abs(w0.entropy_bits - 2.0) < 1e-12 and w0.n == 20
    # batch replay of window 1 with the same other-collapse
    h1 = (math.log2(20) - (18 * math.log2(18)) / 20)
    assert not w1.passed and abs(w1.entropy_bits - h1) < 1e-12
    assert w1.n == 20
