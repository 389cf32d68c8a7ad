"""Round-2 fix coverage: instance paths with array indices, multiprobe LSH
recall, jaccard document-frequency cap + no per-doc broadcast, checkpoint
metrics without a third scan, and CI exit codes for resumed runs."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.checkpoint import CheckpointRunner
from jsonschema_valid_spark.sources.sequences import load_sequences
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# instance paths (≙ error.rs:29-35: paths include array indices)
# ---------------------------------------------------------------------------

def test_items_instance_path_has_index(spark):
    df = spark.createDataFrame(
        [("d1", [1, 2, 3, -9, 5]), ("d2", [-1, 2]), ("d3", [1, 2])],
        "id string, tokens array<long>")
    res = CheckSuite({"properties": {"tokens": {"items": {"minimum": 0}}}}).run(
        df, key="id")
    got = {(r["doc_id"], r["instance_path"]) for r in res.violations.collect()}
    assert got == {("d1", "properties/tokens/items[3]"),
                   ("d2", "properties/tokens/items[0]")}


def test_scalar_checks_instance_path_equals_check_id(spark):
    df = spark.createDataFrame([("d1", -3)], "id string, x long")
    res = CheckSuite({"properties": {"x": {"minimum": 0}}}).run(df, key="id")
    r = res.violations.first()
    assert r["instance_path"] == r["check_id"] == "properties/x/minimum"


def test_render_uses_instance_path_and_description(spark):
    df = spark.createDataFrame([("d1", [5, -1])], "id string, a array<long>")
    res = CheckSuite({"properties": {"a": {
        "description": "token ids must be non-negative",
        "items": {"minimum": 0},
    }}}).run(df, key="id")
    out = res.render()
    assert "[at properties/a/items[1]]" in out
    assert "token ids must be non-negative" in out
    # schema context (≙ error.rs:47-58) rendered from the compiled plan
    assert 'schema: {"items": {"minimum": 0}}' in out


# ---------------------------------------------------------------------------
# multiprobe LSH recall
# ---------------------------------------------------------------------------

def test_multiprobe_lsh_recall_improves(spark):
    import random

    from jsonschema_valid_spark.functions.similarity import cosine_neardup_pairs

    rnd = random.Random(3)
    rows = []
    for i in range(60):
        v = [rnd.gauss(0.0, 1.0) for _ in range(32)]
        rows.append((i, v))
        # a near-duplicate of each of the first 20 vectors
        if i < 20:
            rows.append((1000 + i, [x + rnd.gauss(0.0, 0.02) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    # ground truth: brute-force pairs >= 0.95
    x, y = emb.alias("x"), emb.alias("y")
    from jsonschema_valid_spark.functions.similarity import cosine
    truth = (x.join(y, F.col("x.vec_id") < F.col("y.vec_id"))
             .where(cosine(F.col("x.v"), F.col("y.v")) >= 0.95)
             .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b")))
    t = {(r["a"], r["b"]) for r in truth.collect()}
    assert len(t) >= 20

    def recall(tables):
        got = {(r["a"], r["b"]) for r in cosine_neardup_pairs(
            emb, "vec_id", "v", dim=32, threshold=0.95, bits=16,
            tables=tables).collect()}
        assert got <= t  # exact verify ⇒ no false positives
        return len(got) / len(t)

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 >= 0.8  # T=8 at 16 bits: 1-(1-0.18)^8 ≈ 0.80 expected recall


# ---------------------------------------------------------------------------
# jaccard: doc-frequency cap + no per-document broadcast
# ---------------------------------------------------------------------------

def test_jaccard_cap_drops_hot_shingles(spark):
    from jsonschema_valid_spark.functions.dedup import jaccard_pairs

    # two docs similar ONLY through a boilerplate phrase shared by everyone
    boiler = "subscribe to our newsletter now"
    rows = [(i, f"{boiler} unique{i} text{i} words{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.3)
    capped = jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.3,
                           max_doc_freq=3)
    assert uncapped.count() > 0       # boilerplate makes everything "similar"
    assert capped.count() == 0        # cap removes the boilerplate signal


def test_jaccard_plan_has_no_per_doc_broadcast(spark):
    """The round-1 shape joined the pair counts back against a broadcast
    one-row-per-document sizes table — twice (OOM at 10^9 docs). Sizes must
    now ride the exploded posting rows, so the whole computation has exactly
    ONE join: the posting-list self-join on the shingle key. (Spark may
    still choose broadcast for THAT join at toy scale — size-based and
    fine; what must be gone are the two hinted sizes joins.)"""
    from jsonschema_valid_spark.functions.dedup import jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = str(jaccard_pairs(docs, "doc_id", "text", n=2,
                             threshold=0.5)._jdf.queryExecution()
               .optimizedPlan())
    n_joins = plan.count("Join ")
    assert n_joins == 1, plan


# ---------------------------------------------------------------------------
# checkpoint runner metrics + exit codes
# ---------------------------------------------------------------------------

SUITE = {
    "version": 7,
    "properties": {"tokens": {"items": {"minimum": 0,
                                        "exclusiveMaximum": 50257}}},
    "x-rowExpr": "n_tok = size(tokens)",
}


def test_runner_rows_metric_without_rescan(spark, tmp_path):
    seq = load_sequences(spark, SF_DIR).cache()
    runner = CheckpointRunner(CheckSuite(SUITE), str(tmp_path / "ck"))
    summary = runner.run(seq, partition_by="source", key="doc_id")
    assert summary.total_rows == seq.count()
    # per-partition lineage rows match the actual slice sizes
    lin = {r["partition_id"]: r["rows"] for r in runner.lineage(spark).collect()}
    actual = {str(r["source"]): r["n"] for r in
              seq.where(F.col("source").isNotNull())
              .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for p, n in actual.items():
        assert lin[p] == n, (p, lin[p], n)
    # "<rows>" bookkeeping rows never leak into the public verdicts
    assert runner.verdicts(spark).where(F.col("check_id") == "<rows>").isEmpty()
    # this dataset has violations ⇒ failed() is True even on a fresh reader
    assert CheckpointRunner(CheckSuite(SUITE), str(tmp_path / "ck")).failed(spark)


def test_runner_staged_partitioned_matches_unstaged(spark, tmp_path):
    seq = load_sequences(spark, SF_DIR).cache()
    r1 = CheckpointRunner(CheckSuite(SUITE), str(tmp_path / "a"))
    r2 = CheckpointRunner(CheckSuite(SUITE), str(tmp_path / "b"))
    s1 = r1.run(seq, partition_by="source", key="doc_id")
    s2 = r2.run(seq, partition_by="source", key="doc_id",
                stage_partitioned=True)
    assert s1.total_rows == s2.total_rows
    assert s1.total_violations == s2.total_violations
    v1 = sorted(tuple(r) for r in r1.violations(spark).collect())
    v2 = sorted(tuple(r) for r in r2.violations(spark).collect())
    assert v1 == v2


def test_resumed_run_exit_reflects_prior_partitions(spark, tmp_path):
    """ADVICE fix: a resumed run over failing data must exit 1 even when all
    failing partitions were committed by a PREVIOUS invocation."""
    seq = load_sequences(spark, SF_DIR).cache()
    runner = CheckpointRunner(CheckSuite(SUITE), str(tmp_path / "ck"))
    runner.run(seq, partition_by="source", key="doc_id")
    # second run skips everything — but failed() still reports the history
    s2 = runner.run(seq, partition_by="source", key="doc_id")
    assert s2.processed == []
    assert s2.total_violations == 0      # the old (buggy) exit-code source
    assert runner.failed(spark) is True  # the fixed one


# ---------------------------------------------------------------------------
# x-unique approx (HLL sketch) mode + x-drift baseline-from-table
# ---------------------------------------------------------------------------

def test_approx_unique_sketch_mode(spark):
    heavy = spark.createDataFrame(
        [("k", i) for i in range(1000)] + [(f"u{i}", i) for i in range(100)],
        "doc_id string, x long")
    suite = CheckSuite({"properties": {"doc_id": {
        "x-unique": {"approx": True, "rsd": 0.01}}}})
    res = suite.run(heavy, key="doc_id")
    v = res.verdicts.where(
        F.col("check_id") == "properties/doc_id/x-unique").first()
    assert v["passed"] is False          # 999 dups >> 1% of 1100
    assert v["metric_value"] > 900       # estimated duplicate count
    # sketch mode emits NO violation rows (verdict-only fast gate)
    assert res.violations.where(
        F.col("check_id") == "properties/doc_id/x-unique").isEmpty()

    uniq = spark.createDataFrame(
        [(f"u{i}", i) for i in range(1000)], "doc_id string, x long")
    res2 = suite.run(uniq, key="doc_id")
    assert res2.verdicts.where(
        F.col("check_id") == "properties/doc_id/x-unique").first()["passed"]


def test_approx_unique_summarized_path(spark):
    from jsonschema_valid_spark.engine import run_suite_summarized

    heavy = spark.createDataFrame(
        [("k", i) for i in range(1000)], "doc_id string, x long")
    suite = CheckSuite({"properties": {"doc_id": {
        "x-unique": {"approx": True}}}})
    res = run_suite_summarized(suite, heavy, key="doc_id")
    v = res.verdicts.where(
        F.col("check_id") == "properties/doc_id/x-unique").first()
    res.unpersist()
    assert v["passed"] is False


def test_drift_baseline_from_context_table(spark):
    # i % 15 skews bucket 0 (10/15 of rows) vs the 50/50 baseline → PSI > 0
    df = spark.createDataFrame([(i, float(i % 15)) for i in range(300)],
                               "id long, x double")
    lit_baseline = {0: 100, 1: 100}
    base_df = spark.createDataFrame(list(lit_baseline.items()),
                                    "bucket long, count long")
    spec = lambda b: {"properties": {"x": {
        "x-drift": {"baseline": b, "bucketWidth": 10.0, "psiMax": 0.5}}}}
    via_table = CheckSuite(spec("@base")).run(
        df, key="id", context={"base": base_df})
    via_dict = CheckSuite(spec(lit_baseline)).run(df, key="id")
    mt = via_table.verdicts.where(
        F.col("check_id").contains("x-drift")).first()["metric_value"]
    md = via_dict.verdicts.where(
        F.col("check_id").contains("x-drift")).first()["metric_value"]
    assert abs(mt - md) < 1e-12 and mt > 0


def test_bad_rowexpr_fails_at_suite_validation(spark):
    """Malformed x-rowExpr SQL fails suite validation on the driver (the
    analog of the compile-time regex check) — no job ever launches."""
    from jsonschema_valid_spark.suite.spec import SuiteError

    with pytest.raises(SuiteError, match="invalid SQL expression"):
        CheckSuite({"x-rowExpr": "n_tok = ("})


def test_inline_referential_rides_the_row_pass(spark):
    """x-referential {"inline": true}: small domains compile into the fused
    row projection — same violations as the broadcast anti-join, but ZERO
    extra scans (and no join at all in the violations plan)."""
    from jsonschema_valid_spark.sources.sequences import source_domain

    seq = load_sequences(spark, SF_DIR)
    dom = source_domain(spark, SF_DIR)

    def run(inline):
        spec = {"domain": "@d"}
        if inline:
            spec["inline"] = True
        return CheckSuite({"properties": {"source": {
            "x-referential": spec}}}).run(seq, key="doc_id",
                                          context={"d": dom})

    va = sorted((r["doc_id"], r["check_id"])
                for r in run(False).violations.collect())
    res_inline = run(True)
    vi = sorted((r["doc_id"], r["check_id"])
                for r in res_inline.violations.collect())
    assert va == vi and len(vi) > 0
    plan = res_inline.violations._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_split_valid_quarantine(spark):
    """CheckSuite.split: (clean, quarantined) by row checks — exhaustive and
    disjoint, matching the violations DF's doc set; single-scan predicates."""
    seq = load_sequences(spark, SF_DIR)
    suite = CheckSuite(SUITE)
    clean, bad = suite.split(seq, key="doc_id")
    n, nc, nb = seq.count(), clean.count(), bad.count()
    assert nc + nb == n and nb > 0
    bad_ids = {r["doc_id"] for r in bad.select("doc_id").collect()}
    viol_ids = {r["doc_id"] for r in
                suite.run(seq, key="doc_id").violations
                .select("doc_id").distinct().collect()}
    assert bad_ids == viol_ids
    # quarantine branch: one scan, no shuffle, no join
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_property_names_combinators_bind(spark):
    from jsonschema_valid_spark import SuiteBindError

    df = spark.createDataFrame([("a", 1)], "id string, x long")
    # anyOf over name patterns: both columns match one branch
    CheckSuite({"propertyNames": {"anyOf": [
        {"pattern": "^id$"}, {"pattern": "^x$"}]}}).run(df, key="id")
    # allOf with a failing arm ("id" is longer than 1 char)
    with pytest.raises(SuiteBindError):
        CheckSuite({"propertyNames": {"allOf": [
            {"pattern": "^[a-z]+$"}, {"maxLength": 1}]}}).run(df, key="id")


def test_depth2_struct_properties(spark):
    df = spark.createDataFrame(
        [("d1", {"inner": {"v": 5}}), ("d2", {"inner": {"v": 50}}),
         ("d3", {"inner": None})],
        "id string, s struct<inner:struct<v:long>>")
    res = CheckSuite({"properties": {"s": {"properties": {"inner": {
        "properties": {"v": {"maximum": 10}}}}}}}).run(df, key="id")
    got = {(r["doc_id"], r["check_id"]) for r in res.violations.collect()}
    assert got == {("d2", "properties/s/properties")}
