"""Resume tests (SURVEY.md §5): kill after k partitions, re-run, assert
completed partitions are skipped and final results equal a clean run."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.checkpoint import CheckpointRunner
from jsonschema_valid_spark.sources.sequences import load_sequences
from tests.conftest import SF_DIR

SUITE = {
    "version": 7,
    "properties": {
        "tokens": {"items": {"minimum": 0, "exclusiveMaximum": 50257}},
        "n_tok": {"minimum": 1, "x-stats": {"avg": {"min": 1, "max": 8192}}},
    },
    "x-rowExpr": "n_tok = size(tokens)",
}


@pytest.fixture()
def seq(spark):
    return load_sequences(spark, SF_DIR).cache()


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_interrupt_and_resume(spark, seq, tmp_path):
    base = str(tmp_path / "ckpt")
    suite = CheckSuite(SUITE)
    runner = CheckpointRunner(suite, base)

    with pytest.raises(InterruptedError):
        runner.run(seq, partition_by="source", key="doc_id", fail_after=3)

    lin1 = runner.lineage(spark)
    assert lin1.count() == 3
    done_first = set(r["partition_id"] for r in lin1.collect())

    # resume: completed partitions must NOT be revalidated
    summary = runner.run(seq, partition_by="source", key="doc_id")
    assert set(summary.skipped) == done_first
    assert not (set(summary.processed) & done_first)

    # final outputs equal a clean, non-checkpointed run
    clean = suite.run(seq, key="doc_id", partition_by="source")
    assert _sorted_rows(runner.violations(spark)) == _sorted_rows(clean.violations)

    # verdict parity modulo partition-id labels for the NULL group
    ck = runner.verdicts(spark).where(F.col("partition_id").isNotNull())
    cl = clean.verdicts.where(F.col("partition_id").isNotNull())
    assert _sorted_rows(ck) == _sorted_rows(cl)


def test_rerun_is_idempotent(spark, seq, tmp_path):
    base = str(tmp_path / "ckpt2")
    suite = CheckSuite(SUITE)
    runner = CheckpointRunner(suite, base)
    s1 = runner.run(seq, partition_by="source", key="doc_id")
    v1 = _sorted_rows(runner.violations(spark))
    # second run: everything skipped, outputs unchanged
    s2 = runner.run(seq, partition_by="source", key="doc_id")
    assert s2.processed == []
    assert sorted(s2.skipped) == sorted(s1.processed)
    assert _sorted_rows(runner.violations(spark)) == v1


def test_concurrent_partitions_match_serial(spark, seq, tmp_path):
    """max_concurrency > 1 overlaps per-partition Spark jobs; results must
    equal the serial run exactly (per-partition dirs keep commits disjoint)."""
    suite = CheckSuite(SUITE)
    r_ser = CheckpointRunner(suite, str(tmp_path / "ser"))
    r_par = CheckpointRunner(suite, str(tmp_path / "par"))
    s1 = r_ser.run(seq, partition_by="source", key="doc_id")
    s2 = r_par.run(seq, partition_by="source", key="doc_id", max_concurrency=4)
    assert sorted(s1.processed) == sorted(s2.processed)
    assert s1.total_violations == s2.total_violations
    assert _sorted_rows(r_ser.violations(spark)) == _sorted_rows(r_par.violations(spark))


def test_suite_change_invalidates_lineage(spark, seq, tmp_path):
    base = str(tmp_path / "ckpt3")
    runner1 = CheckpointRunner(CheckSuite(SUITE), base)
    runner1.run(seq, partition_by="source", key="doc_id")

    changed = dict(SUITE)
    changed["properties"] = {**SUITE["properties"],
                             "n_tok": {"minimum": 2}}
    runner2 = CheckpointRunner(CheckSuite(changed), base)
    s = runner2.run(seq, partition_by="source", key="doc_id")
    assert s.skipped == []  # different suite_hash ⇒ nothing skippable
    assert len(s.processed) > 0


def test_exemplars_k_caps_sink_keeps_true_counts(spark, tmp_path):
    # dense failures: every row violates, 60 in p1 + 40 in p2 — the cap
    # must bite (2 per partition-check) while lineage keeps true counts
    rows = [(f"d{i:03d}", "p1" if i < 60 else "p2", -1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id: string, part: string, v: int")
    suite = CheckSuite({"properties": {"v": {"minimum": 0}}})
    base = str(tmp_path / "ckpt_ex")
    runner = CheckpointRunner(suite, base)
    summary = runner.run(df, partition_by="part", key="doc_id",
                         exemplars_k=2)

    viol = runner.violations(spark)
    assert "exemplar_rank" in viol.columns
    assert viol.count() == 4  # 2 exemplars x 2 partitions
    for p in ("p1", "p2"):
        got = (runner.protocol.read_partition(spark, "violations", p)
               .groupBy("check_id").count().collect())
        assert all(r["count"] <= 2 for r in got), p

    # lineage + summary carry the TRUE counts, not the capped sink
    assert summary.total_violations == 100
    lin = {r["partition_id"]: r["n_violations"]
           for r in runner.lineage(spark).collect()}
    assert lin == {"p1": 60, "p2": 40}


def test_verify_content_invalidates_changed_partition(spark, tmp_path):
    """verify_content: a 'done' partition whose data changed since
    validation is revalidated; unchanged partitions stay skipped; the
    plain resume (default) keeps the stale skip."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.checkpoint import CheckpointRunner

    suite = CheckSuite({"properties": {"v": {"minimum": 0}}})
    in_path = str(tmp_path / "in")
    base = str(tmp_path / "ckpt")
    df0 = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 6), (3, "b", 7)],
        "doc_id: long, src: string, v: long")
    df0.write.parquet(in_path)

    r = CheckpointRunner(suite, base)
    s1 = r.run(spark.read.parquet(in_path), "src", key="doc_id",
               verify_content=True)
    assert sorted(s1.processed) == ["a", "b"] and s1.invalidated == []

    # append a VIOLATING row to partition a
    spark.createDataFrame([(9, "a", -1)], df0.schema) \
        .write.mode("append").parquet(in_path)

    # default resume: stale skip (documented behavior)
    s2 = r.run(spark.read.parquet(in_path), "src", key="doc_id")
    assert sorted(s2.skipped) == ["a", "b"] and s2.processed == []

    # verify_content resume: partition a invalidated and revalidated
    s3 = r.run(spark.read.parquet(in_path), "src", key="doc_id",
               verify_content=True)
    assert s3.invalidated == ["a"]
    assert s3.processed == ["a"] and s3.skipped == ["b"]
    viol = r.violations(spark).collect()
    assert [v["doc_id"] for v in viol] == ["9"]

    # steady state: fingerprints recorded at revalidation now match
    s4 = r.run(spark.read.parquet(in_path), "src", key="doc_id",
               verify_content=True)
    assert s4.invalidated == [] and s4.processed == []
    assert sorted(s4.skipped) == ["a", "b"]


def test_verify_content_backward_compatible(spark, tmp_path):
    """Partitions validated BEFORE verify_content existed (no recorded
    fingerprint) keep the plain lineage skip."""
    import shutil

    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.checkpoint import CheckpointRunner

    suite = CheckSuite({"properties": {"v": {"minimum": 0}}})
    base = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 6)], "doc_id: long, src: string, v: long")
    r = CheckpointRunner(suite, base)
    r.run(df, "src", key="doc_id", verify_content=True)
    shutil.rmtree(f"{base}/fingerprints")  # simulate a pre-knob lineage
    s = r.run(df, "src", key="doc_id", verify_content=True)
    assert s.invalidated == [] and sorted(s.skipped) == ["a", "b"]


def test_verify_content_nonstring_partition_rendering(spark, tmp_path):
    """Regression (review find): the fingerprint dict must be keyed by
    the same Python str() rendering run() uses for its partition list —
    boolean partitions ('True' vs Spark's 'true') previously never
    recorded fingerprints, silently disabling verify_content."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.checkpoint import CheckpointRunner

    suite = CheckSuite({"properties": {"v": {"minimum": 0}}})
    in_path = str(tmp_path / "in")
    base = str(tmp_path / "ckpt")
    df0 = spark.createDataFrame(
        [(1, True, 5), (2, False, 6)], "doc_id: long, flag: boolean, v: long")
    df0.write.parquet(in_path)
    r = CheckpointRunner(suite, base)
    r.run(spark.read.parquet(in_path), "flag", key="doc_id",
          verify_content=True)
    # fingerprints were actually recorded under the runner's keys
    rec = r._recorded_fingerprints(spark)
    assert set(rec) == {"True", "False"}
    # a change to the True partition is detected
    spark.createDataFrame([(9, True, -1)], df0.schema) \
        .write.mode("append").parquet(in_path)
    s2 = r.run(spark.read.parquet(in_path), "flag", key="doc_id",
               verify_content=True)
    assert s2.invalidated == ["True"] and s2.processed == ["True"]
