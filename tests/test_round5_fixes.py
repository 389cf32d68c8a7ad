"""Round-5 ADVICE fixes: unique-index bucket-count sidecar, bind-time
`determines` validation, run-start domainColumn validation."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.unique_index import UniqueIndex
from jsonschema_valid_spark.suite.spec import SuiteBindError


def _fresh_catalog(spark, table):
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_attach_adopts_sidecar_bucket_count(spark, tmp_path):
    """attach() with NO explicit count reads the width from the
    _index_meta.json sidecar build() wrote — the CLI-default-64 hazard
    (ADVICE r4 #1) is gone because nobody has to remember the number."""
    path = str(tmp_path / "ix")
    u = UniqueIndex("uidx_meta_adopt", "did", buckets=8)
    try:
        u.build(spark.range(0, 50).select(F.col("id").alias("did")),
                path=path)
        spark.sql("DROP TABLE uidx_meta_adopt")
        # fresh object, count NOT supplied: adopted from the sidecar
        u2 = UniqueIndex("uidx_meta_adopt", "did")
        u2.attach(spark, path)
        assert u2.buckets == 8
        ddl = spark.sql("SHOW CREATE TABLE uidx_meta_adopt").first()[0]
        assert "8 BUCKETS" in ddl
        # and the probe still works end-to-end off the adopted DDL
        batch = spark.createDataFrame([(10,), (999,)], "did long")
        hits = {r[0] for r in u2.hits(batch).collect()}
        assert hits == {10}
    finally:
        _fresh_catalog(spark, "uidx_meta_adopt")


def test_attach_refuses_contradicting_bucket_count(spark, tmp_path):
    """An EXPLICIT count that contradicts the sidecar is refused —
    attaching with the wrong width would silently mis-cluster every
    bucket-aware probe (false-negative collisions)."""
    path = str(tmp_path / "ix2")
    u = UniqueIndex("uidx_meta_refuse", "did", buckets=8)
    try:
        u.build(spark.range(0, 10).select(F.col("id").alias("did")),
                path=path)
        spark.sql("DROP TABLE uidx_meta_refuse")
        bad = UniqueIndex("uidx_meta_refuse", "did", buckets=64)
        with pytest.raises(ValueError, match="8 buckets"):
            bad.attach(spark, path)
        assert not bad.exists(spark)
    finally:
        _fresh_catalog(spark, "uidx_meta_refuse")


def test_attach_refuses_wrong_column(spark, tmp_path):
    path = str(tmp_path / "ix3")
    u = UniqueIndex("uidx_meta_col", "did", buckets=4)
    try:
        u.build(spark.range(0, 10).select(F.col("id").alias("did")),
                path=path)
        spark.sql("DROP TABLE uidx_meta_col")
        wrong = UniqueIndex("uidx_meta_col", "other")
        with pytest.raises(ValueError, match="column"):
            wrong.attach(spark, path)
    finally:
        _fresh_catalog(spark, "uidx_meta_col")


def test_existing_table_syncs_buckets_from_catalog(spark, tmp_path):
    """When the table is already attached/built, probes adopt the
    CATALOG's bucket count; an explicit contradiction is refused."""
    u = UniqueIndex("uidx_catalog_sync", "did", buckets=4)
    try:
        u.build(spark.range(0, 10).select(F.col("id").alias("did")))
        # default-width object against the existing 4-bucket table:
        # probe adopts 4 (repartition width matches the layout)
        u2 = UniqueIndex("uidx_catalog_sync", "did")
        batch = spark.createDataFrame([(3,), (77,)], "did long")
        assert {r[0] for r in u2.hits(batch).collect()} == {3}
        assert u2.buckets == 4
        # explicit contradiction: refused before any probe runs
        u3 = UniqueIndex("uidx_catalog_sync", "did", buckets=16)
        with pytest.raises(ValueError, match="4 buckets"):
            u3.hits(batch).collect()
    finally:
        _fresh_catalog(spark, "uidx_catalog_sync")


def test_fd_determines_validated_at_bind(spark):
    """Composite AND property-level x-functionalDependency refuse unknown
    `determines` columns at bind time (SuiteBindError), not as a runtime
    AnalysisException (ADVICE r4 #4)."""
    df = spark.createDataFrame([(1, "a", 2.0)], "k long, s string, v double")
    with pytest.raises(SuiteBindError, match="determines"):
        CheckSuite({"x-functionalDependency": {
            "columns": ["k", "s"], "determines": ["nope"]}}).run(df, key="k")
    with pytest.raises(SuiteBindError, match="determines"):
        CheckSuite({"properties": {"k": {"x-functionalDependency": {
            "determines": ["nope"]}}}}).run(df, key="k")


def test_referential_domain_column_validated_at_run_start(spark):
    """x-referential with a domainColumn absent from the RESOLVED domain
    refuses at run start (ADVICE r4 #4), single and composite forms."""
    df = spark.createDataFrame([(1, "a", "b")], "k long, c1 string, c2 string")
    dom = spark.createDataFrame([("a", "b")], "d1 string, d2 string")
    with pytest.raises(SuiteBindError, match="domain column"):
        CheckSuite({"properties": {"c1": {"x-referential": {
            "domain": "@d", "domainColumn": "nope"}}}}).run(
                df, key="k", context={"d": dom}).violations.collect()
    with pytest.raises(SuiteBindError, match="domain column"):
        CheckSuite({"x-referential": {
            "columns": ["c1", "c2"], "domain": "@d",
            "domainColumns": ["d1", "nope"]}}).run(
                df, key="k", context={"d": dom}).violations.collect()
