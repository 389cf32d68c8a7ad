"""Violation exemplar capping (operators/exemplars.py): k deterministic
hash-ranked exemplars per check — partitioning-invariant, skew-proof
(salted two-phase), equal to the naive single-window selection."""

import pytest
from pyspark.sql import Window, functions as F

from jsonschema_valid_spark.functions.dedup import portable_hash60
from jsonschema_valid_spark.operators.exemplars import exemplar_violations


def _viol(spark, n=200, checks=("c/a", "c/b")):
    rows = [(f"doc-{i:04d}", checks[i % len(checks)], f"v={i}", "exp")
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id string, check_id string, observed string, "
              "expected string")


def test_k_per_check_and_determinism_across_partitionings(spark):
    df = _viol(spark)
    a = exemplar_violations(df.repartition(1), k=5).collect()
    b = exemplar_violations(df.repartition(16), k=5).collect()
    key = lambda r: (r["check_id"], r["exemplar_rank"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["check_id"], []).append(r)
    assert set(per) == {"c/a", "c/b"}
    for rs in per.values():
        assert sorted(x["exemplar_rank"] for x in rs) == [1, 2, 3, 4, 5]


def test_matches_naive_single_window(spark):
    df = _viol(spark, n=137)
    got = {(r["check_id"], r["exemplar_rank"], r["doc_id"])
           for r in exemplar_violations(df, k=7, seed=3).collect()}
    h = portable_hash60(F.concat(F.lit("3:"), F.col("doc_id")))
    w = Window.partitionBy("check_id").orderBy(
        h, F.col("doc_id"), F.col("observed"))
    naive = {(r["check_id"], r["r"], r["doc_id"])
             for r in df.withColumn("r", F.row_number().over(w))
                        .where(F.col("r") <= 7).collect()}
    assert got == naive


def test_fewer_rows_than_k_passes_all_through(spark):
    df = _viol(spark, n=3, checks=("only",))
    out = exemplar_violations(df, k=10).collect()
    assert len(out) == 3
    assert {r["doc_id"] for r in out} == {f"doc-{i:04d}" for i in range(3)}


def test_duplicate_rows_rank_stably(spark):
    rows = [("d1", "c", "o", "e")] * 4 + [("d2", "c", "o", "e")]
    df = spark.createDataFrame(
        rows, "doc_id string, check_id string, observed string, "
              "expected string")
    out = exemplar_violations(df.repartition(8), k=3)
    assert out.count() == 3
    out2 = exemplar_violations(df.repartition(2), k=3)
    assert (sorted((r["doc_id"], r["exemplar_rank"]) for r in out.collect())
            == sorted((r["doc_id"], r["exemplar_rank"])
                      for r in out2.collect()))


def test_rejects_bad_args(spark):
    df = _viol(spark, n=5)
    with pytest.raises(ValueError):
        exemplar_violations(df, k=0)
    with pytest.raises(ValueError):
        exemplar_violations(df, salt=0)


def test_result_exemplars_method(spark):
    from jsonschema_valid_spark import CheckSuite

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(60)], "doc_id: long, v: long")
    res = CheckSuite({"properties": {"v": {"maximum": 3}}}).run(
        df, key="doc_id")
    out = res.exemplars(k=4).collect()
    assert len(out) == 4
    assert sorted(r["exemplar_rank"] for r in out) == [1, 2, 3, 4]
    assert all(r["check_id"] == "properties/v/maximum" for r in out)
