"""Bloom-filter referential membership (operators/bloom.py + the
x-referential {"mode": "bloom"} keyword)."""

import re

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.bloom import (
    bloom_build,
    bloom_non_members,
    with_bloom_membership,
)
from jsonschema_valid_spark.suite.spec import CheckSuite
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def dom(spark):
    return spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")).cache()


def test_members_never_miss(spark, dom):
    bloom = bloom_build(dom, "key", m_bits=1 << 16, k=5)
    out = with_bloom_membership(
        dom.select(F.col("key"), F.lit(1).alias("tag")), "key", bloom)
    assert out.where("NOT __in_bloom").isEmpty()


def test_fpr_band_and_no_false_violations(spark, dom):
    probe = spark.range(0, 7000).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("k"), F.col("id")).alias("key"))
    nm = bloom_non_members(probe, "key", dom, m_bits=1 << 16, k=5).cache()
    detected = nm.count()
    # 2000 true non-members; ~13 bits/key, k=5 → FPR well under 2%
    assert 1960 <= detected <= 2000
    assert nm.where("pid < 5000").isEmpty()   # a member is never reported


def test_null_probes_not_reported(spark, dom):
    probe = spark.createDataFrame([("k1",), (None,), ("nope",)], "key string")
    got = {r["key"] for r in bloom_non_members(
        probe, "key", dom, m_bits=1 << 16, k=5).collect()}
    assert got == {"nope"}


def test_param_validation(spark, dom):
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(dom, "key", m_bits=32)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(dom, "key", m_bits=(1 << 27) + 64)
    with pytest.raises(ValueError, match="k must"):
        bloom_build(dom, "key", k=0)


def test_probe_side_shuffle_free(spark, dom):
    """All Exchanges sit under the (tiny) build side: the fact branch is
    scan → project → broadcast-join, never hash-partitioned."""
    probe = spark.range(0, 100).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"))
    bloom = bloom_build(dom, "key", m_bits=1 << 16, k=5)
    plan = (with_bloom_membership(probe, "key", bloom)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan
    parts = set(re.findall(r"hashpartitioning\((\w+)#", plan))
    assert parts <= {"word", "__key"}, parts


def test_x_referential_bloom_keyword(spark):
    from jsonschema_valid_spark.sources.sequences import (
        load_sequences, source_domain)

    seq = load_sequences(spark, SF_DIR)
    suite = CheckSuite({"properties": {"source": {
        "x-referential": {"domain": "@dom", "mode": "bloom",
                          "mBits": 1 << 14, "k": 4}}}})
    res = suite.run(seq, key="doc_id",
                    context={"dom": source_domain(spark, SF_DIR)})
    viol = res.violations.where("check_id like '%x-referential%'").cache()
    # every BOGUS row flagged (deterministic corruption did%89), NULLs not
    expected = seq.where("source = 'BOGUS'").count()
    assert viol.count() == expected > 0
    assert set(r["observed"] for r in viol.collect()) == {"BOGUS"}
    assert viol.first()["expected"].endswith("(bloom)")


def test_x_referential_bad_mode(spark):
    from jsonschema_valid_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, SF_DIR)
    suite = CheckSuite({"properties": {"source": {
        "x-referential": {"domain": ["src1"], "mode": "hyperloglog"}}}})
    with pytest.raises(ValueError, match="mode"):
        suite.run(seq, key="doc_id").violations.count()
