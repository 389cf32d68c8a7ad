"""Round-6 second-pass optimizations: plan-construction memoization and
the any-fail pre-filter — the parts whose CONTRACT (not just speed) the
round depends on: plans are cached but data never is, results are
bit-identical, and the memo cannot leak onto serialized suites."""

import gc
import pickle

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import _RESULT_MEMO, run_suite_summarized
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def seq(spark):
    from jsonschema_valid_spark.sources.sequences import load_sequences

    return load_sequences(spark, SF_DIR)


def _suite():
    return CheckSuite({
        "required": ["doc_id"],
        "properties": {
            "n_tok": {"minimum": 1,
                      "x-stats": {"avg": {"min": 1, "max": 10000}}},
            "doc_id": {"x-unique": True},
        },
        "x-rowExpr": "n_tok = size(tokens)",
    })


def test_memo_hits_on_identical_arguments(spark, seq):
    suite = _suite()
    r1 = suite.run(seq, key="doc_id", partition_by="source")
    r2 = suite.run(seq, key="doc_id", partition_by="source")
    assert r1 is r2, "same (suite, df, args) must reuse the built plan"
    r3 = suite.run(seq, key="doc_id")  # different partition granularity
    assert r3 is not r1
    other = _suite()  # same spec, different instance: no cross-talk
    assert other.run(seq, key="doc_id", partition_by="source") is not r1


def test_memo_caches_plans_not_data(spark, seq):
    """Counts must be identical across memo hits AND each action must
    recompute: the summarized persist marker is re-armed after
    unpersist(), so a hit behaves like a fresh build."""
    suite = _suite()
    s1 = run_suite_summarized(suite, seq, key="doc_id",
                              partition_by="source")
    n1 = s1.violations.count()
    v1 = len(s1.verdicts.collect())
    s1.unpersist()
    assert s1._persisted.storageLevel.useMemory is False
    s2 = run_suite_summarized(suite, seq, key="doc_id",
                              partition_by="source")
    assert s2 is s1
    assert s2._persisted.storageLevel.useMemory is True  # re-armed
    assert s2.violations.count() == n1
    assert len(s2.verdicts.collect()) == v1
    s2.unpersist()


def test_memo_never_contaminates_the_suite(spark, seq):
    """The cache lives OFF the suite (WeakKeyDictionary): the suite
    stays picklable after runs, and its entries die with it."""
    suite = _suite()
    suite.run(seq, key="doc_id", partition_by="source")
    pickle.dumps(suite)  # would raise if DataFrames rode the instance
    assert suite in _RESULT_MEMO
    del suite
    gc.collect()
    # no lingering strong refs: the dict sheds the dead suite's entry
    assert all(k is not None for k in list(_RESULT_MEMO))


def test_memo_error_paths_still_raise(spark, seq):
    from jsonschema_valid_spark.suite.spec import SuiteBindError

    suite = _suite()
    with pytest.raises(SuiteBindError):
        suite.run(seq, key="not_a_column")
    with pytest.raises(SuiteBindError):  # raises again, not cached
        suite.run(seq, key="not_a_column")


def test_prefilter_emits_identical_violation_rows(spark, seq):
    """The any-fail pre-filter must not change the violations multiset —
    compare against a hand-built unfiltered projection."""
    suite = _suite()
    res = suite.run(seq, key="doc_id", partition_by="source")
    got = sorted(
        (r.doc_id, r.check_id, r.observed)
        for r in res.violations.where(
            ~F.col("check_id").contains("x-unique")).collect())
    from jsonschema_valid_spark.engine import (
        _inline_referential, _row_check_exprs, bind,
    )

    plan = bind(suite, seq)
    _inline_referential(plan, {})
    structs, _ = _row_check_exprs(plan)
    arr = F.array_compact(F.array(*structs))
    want = sorted(
        (r.doc_id, r.v.check_id, r.v.observed)
        for r in seq.select(F.col("doc_id").cast("string").alias("doc_id"),
                            F.explode(arr).alias("v")).collect())
    assert got == want
