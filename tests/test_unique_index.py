"""Historical uniqueness index (operators/unique_index.py): probe
correctness, extend idempotence, inline == join, plan shape, keyword
wiring through both run paths, spec/metaschema acceptance."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.unique_index import UniqueIndex
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def idx(spark, tmp_path):
    """Index over history = ids 0..199; dropped after the test."""
    u = UniqueIndex("uidx_test", "did", buckets=4)
    hist = spark.range(0, 200).select(F.col("id").alias("did"))
    u.build(hist, path=str(tmp_path / "uidx"))
    yield u
    spark.sql("DROP TABLE IF EXISTS uidx_test")


def _batch(spark):
    # 150..249: 150..199 collide with history, 200..249 are new;
    # plus value 170 repeated (multiplicity 3 in the batch)
    return (spark.range(150, 250).select(F.col("id").alias("did"))
            .unionAll(spark.createDataFrame([(170,), (170,)],
                                            "did long")))


def test_probe_finds_collisions(spark, idx):
    hits = {r["did"] for r in idx.hits(_batch(spark)).collect()}
    assert hits == set(range(150, 200))


def test_inline_equals_join(spark, idx):
    b = _batch(spark)
    a = {r["did"] for r in idx.hits(b, inline=False).collect()}
    c = {r["did"] for r in idx.hits(b, inline=True).collect()}
    assert a == c


def test_inline_refuses_above_threshold(spark, idx):
    idx.inline_threshold = 10
    try:
        with pytest.raises(ValueError, match="inline probe refused"):
            idx.hits(_batch(spark), inline=True)
    finally:
        idx.inline_threshold = 100_000


def test_collision_violations_shape(spark, idx):
    v = idx.collision_violations(_batch(spark), "properties/did/x-unique")
    rows = {r["doc_id"]: r for r in v.collect()}
    assert set(rows) == {str(i) for i in range(150, 200)}
    assert rows["170"]["observed"] == "count=3; exists in index"
    assert rows["151"]["observed"] == "count=1; exists in index"
    assert rows["151"]["expected"] == "unique incl. index"


def test_extend_idempotent(spark, idx):
    b = _batch(spark)
    n1 = idx.extend(b)
    assert n1 == 50  # only 200..249 are new
    n2 = idx.extend(b)
    assert n2 == 0  # retry inserts nothing
    # after extend, everything in the batch collides
    assert idx.hits(b).count() == 100
    # and the index holds exactly the union of history + new values
    assert idx.index_df(spark).count() == 250


def test_probe_join_index_side_exchange_free(spark, idx):
    """The index side of the probe must read its clustering from the
    bucket layout: no Exchange under the index scan. The batch side pays
    its one day-sized Exchange — so exactly ONE Exchange total."""
    plan = _plan(idx.hits(_batch(spark)))
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") <= 1, final
    # sanity: the index scan is the bucketed table
    assert "uidx_test" in final


def test_collision_violations_one_data_shuffle(spark, idx):
    """The multiplicity groupBy IS the distinct set, so the whole
    violations derivation pays ONE data shuffle on the batch (the index
    side rides its layout or a broadcast) — the old shape recomputed a
    separate distinct pass and shuffled twice."""
    plan = _plan(idx.collision_violations(_batch(spark), "c"))
    final = plan.split("== Initial Plan ==")[0]
    data_exchanges = final.count("Exchange") - final.count(
        "BroadcastExchange")
    assert data_exchanges <= 1, final


def test_inline_probe_no_join(spark, idx):
    plan = _plan(idx.hits(_batch(spark), inline=True))
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final and "Exchange" not in final, final
    # the IN filter reaches the parquet scan
    assert "PushedFilters: [In(did" in final, final


def test_inline_probe_bucket_prunes(spark, idx):
    """A small probe reads only the buckets its values hash into. With
    autoBucketedScan on, Spark hides the pruning from the plan string
    (bucketed scan 'disabled by query planner' — createReadRDD still
    prunes via optionalBucketSet); disable it to make the pruning
    visible and assert a strict bucket subset."""
    import re
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        b = spark.createDataFrame([(160,)], "did long")
        final = _plan(idx.hits(b, inline=True)).split(
            "== Initial Plan ==")[0]
        m = re.search(r"SelectedBucketsCount: (\d+) out of 4", final)
        assert m, final
        assert int(m.group(1)) == 1
    finally:
        spark.conf.set(key, old)


def test_type_mismatch_refused(spark, idx):
    b = spark.createDataFrame([("150",)], "did string")
    with pytest.raises(ValueError, match="type"):
        idx.hits(b)


def test_null_values_ignored(spark, idx):
    b = spark.createDataFrame([(None,), (199,)], "did long")
    assert {r["did"] for r in idx.hits(b).collect()} == {199}
    assert idx.extend(spark.createDataFrame([(None,)], "did long")) == 0


def test_keyword_both_paths(spark, idx):
    """x-unique {"index": "@hist"}: batch dups AND index collisions, in
    both run paths; verdict counts both."""
    batch = (spark.createDataFrame(
        [(1, 150), (2, 300), (3, 300), (4, 400)],
        "rid long, did long"))
    suite = CheckSuite({"properties": {"did": {"x-unique": {
        "index": "@hist"}}}})
    from jsonschema_valid_spark.engine import run_suite_summarized
    for summarized in (False, True):
        res = (run_suite_summarized(suite, batch, key="rid",
                                    context={"hist": idx})
               if summarized else
               suite.run(batch, key="rid", context={"hist": idx}))
        rows = {(r["doc_id"], r["observed"])
                for r in res.violations.collect()}
        assert ("300", "count=2") in rows          # batch-internal dup
        assert ("150", "count=1; exists in index") in rows
        assert len(rows) == 2
        verd = {r["check_id"]: r for r in res.verdicts.collect()}
        v = verd["properties/did/x-unique"]
        assert not v["passed"] and v["metric_value"] == 2.0


def test_keyword_where_scopes_probe(spark, idx):
    """The where scope narrows which batch rows get probed: the exempt
    row's collision is not a violation."""
    batch = spark.createDataFrame(
        [(1, 150, "a"), (2, 160, "b")], "rid long, did long, seg string")
    suite = CheckSuite({"properties": {"did": {"x-unique": {
        "index": "@hist", "where": "seg = 'a'"}}}})
    res = suite.run(batch, key="rid", context={"hist": idx})
    docs = {r["doc_id"] for r in res.violations.collect()}
    assert docs == {"150"}


def test_keyword_context_validation(spark, idx):
    batch = spark.createDataFrame([(1, 150)], "rid long, did long")
    suite = CheckSuite({"properties": {"did": {"x-unique": {
        "index": "@hist"}}}})
    with pytest.raises(ValueError, match="not in run context"):
        suite.run(batch, key="rid").violations.collect()
    with pytest.raises(ValueError, match="must be a UniqueIndex"):
        suite.run(batch, key="rid",
                  context={"hist": 42}).violations.collect()
    wrong = UniqueIndex("uidx_test", "other_col")
    with pytest.raises(ValueError, match="over column"):
        suite.run(batch, key="rid",
                  context={"hist": wrong}).violations.collect()


def test_spec_forms():
    validate_suite_spec(
        {"properties": {"d": {"x-unique": {"index": "@h"}}}}, "draft7")
    validate_suite_spec(
        {"properties": {"d": {"x-unique": {
            "index": "@h", "where": "x > 0", "inline": True}}}}, "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec(  # bare table names are not context refs
            {"properties": {"d": {"x-unique": {"index": "tbl"}}}}, "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec(  # index + approx is contradictory
            {"properties": {"d": {"x-unique": {
                "index": "@h", "approx": True}}}}, "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec(  # withinSeconds would silently drop index
            {"properties": {"d": {"x-unique": {
                "withinSeconds": 60, "ts": "t", "index": "@h"}}}},
            "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec(  # inline is meaningless without index
            {"properties": {"d": {"x-unique": {
                "approx": True, "inline": True}}}}, "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec(
            {"properties": {"d": {"x-unique": {
                "withinSeconds": 60, "ts": "t", "inline": True}}}},
            "draft7")


def test_metaschema_accepts_index_form(spark):
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )
    res = validate_suite_with_engine(
        spark, {"properties": {"d": {"x-unique": {"index": "@h"}}}})
    assert res.ok()


# ---- CheckpointRunner integration (wave 49) -------------------------------

def test_runner_maintains_index_across_interrupt(spark, tmp_path):
    """unique_index=: each completed partition's values fold into the
    history as part of its completion — extend BEFORE lineage (a crash
    between them re-validates and the re-extend inserts nothing), skip
    on resume, full-rerun inserts zero."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.checkpoint import CheckpointRunner

    df = spark.createDataFrame(
        [(i, f"p{i % 3}", 100 + i) for i in range(30)],
        "rid long, part string, did long")
    uidx = UniqueIndex("uidx_runner_test", "did", buckets=4)
    uidx.build(spark.range(0, 10).select(F.col("id").alias("did")),
               path=str(tmp_path / "uix"))
    suite = CheckSuite({"properties": {"did": {"minimum": 0}}})
    runner = CheckpointRunner(suite, str(tmp_path / "ckpt"))
    try:
        with pytest.raises(InterruptedError):
            runner.run(df, partition_by="part", key="rid", fail_after=1,
                       unique_index=uidx)
        n_after_crash = uidx.index_df(spark).count()
        assert n_after_crash == 20  # 10 historical + one partition's 10

        s2 = runner.run(df, partition_by="part", key="rid",
                        unique_index=uidx)
        assert len(s2.skipped) == 1 and s2.indexed_values == 20
        assert uidx.index_df(spark).count() == 40

        # a full re-run (fresh lineage dir, same index) inserts nothing
        r3 = CheckpointRunner(suite, str(tmp_path / "ckpt3"))
        s3 = r3.run(df, partition_by="part", key="rid",
                    unique_index=uidx)
        assert s3.indexed_values == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS uidx_runner_test")


def test_cli_unique_index_resume(spark, tmp_path):
    """--unique-index TABLE:COLUMN threads index maintenance through the
    resume CLI; a second invocation skips everything and indexes 0."""
    import json
    import subprocess
    import sys as _sys

    from jsonschema_valid_spark.operators.unique_index import UniqueIndex

    df = spark.createDataFrame(
        [(i, f"p{i % 2}", 500 + i) for i in range(20)],
        "rid long, part string, did long")
    inp = str(tmp_path / "in")
    df.write.partitionBy("part").parquet(inp)
    u = UniqueIndex("uidx_cli_test", "did", buckets=4)
    u.build(spark.range(0, 5).select(F.col("id").alias("did")),
            path=str(tmp_path / "ix"))
    suite_path = str(tmp_path / "suite.json")
    with open(suite_path, "w") as f:
        json.dump({"properties": {"did": {"minimum": 0}}}, f)

    import os
    env = dict(os.environ)
    # the CLI must see the SAME warehouse so the catalog table resolves
    wh = spark.conf.get("spark.sql.warehouse.dir")
    env["SPARK_GRAFT_TEST_WAREHOUSE"] = wh

    def invoke():
        code = (
            "import sys, json; sys.path.insert(0, '/root/repo')\n"
            "from pyspark.sql import SparkSession\n"
            "import os\n"
            "spark = (SparkSession.builder.master('local[4]')\n"
            "  .config('spark.sql.shuffle.partitions','4')\n"
            "  .config('spark.sql.warehouse.dir',"
            " os.environ['SPARK_GRAFT_TEST_WAREHOUSE'])\n"
            "  .config('spark.ui.enabled','false').getOrCreate())\n"
            "from jsonschema_valid_spark.cli import main\n"
            f"rc = main(['--suite', {suite_path!r}, '--input', {inp!r},\n"
            f"  '--key', 'rid', '--partition-by', 'part',\n"
            f"  '--output', {str(tmp_path / 'out')!r}, '--resume',\n"
            f"  '--unique-index', 'uidx_cli_test:did:'\n"
            f"      + {str(tmp_path / 'ix')!r},\n"
            "  '--unique-index-buckets', '4'])\n"
            "sys.exit(rc)\n")
        return subprocess.run([_sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=300)

    try:
        r1 = invoke()
        assert r1.returncode == 0, r1.stderr[-2000:]
        o1 = json.loads(r1.stdout.strip().splitlines()[-1])
        assert o1["indexed_values"] == 20
        r2 = invoke()
        assert r2.returncode == 0, r2.stderr[-2000:]
        o2 = json.loads(r2.stdout.strip().splitlines()[-1])
        assert o2["indexed_values"] == 0 and len(o2["skipped"]) == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS uidx_cli_test")
