"""Property-based tests (SURVEY.md §5): random tables + random bounds ⇒
engine verdicts equal a trivial pure-Python reimplementation.

Each example launches a small Spark job, so examples are capped and the
deadline disabled (Spark latency ≫ hypothesis defaults)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from jsonschema_valid_spark import CheckSuite

SETTINGS = settings(max_examples=12, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture,
                                           HealthCheck.too_slow])

values = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))
rows_strategy = st.lists(values, min_size=1, max_size=12)
bound = st.integers(min_value=-30, max_value=30)


def _python_oracle_bounds(xs, lo, hi):
    """Reference semantics: null skips; violation when outside [lo, hi]."""
    bad = set()
    for i, x in enumerate(xs):
        if x is None:
            continue
        if not (lo <= x <= hi):
            bad.add(f"r{i}")
    return bad


@SETTINGS
@given(xs=rows_strategy, lo=bound, hi=bound)
def test_bounds_match_python_oracle(spark, xs, lo, hi):
    df = spark.createDataFrame(
        [(f"r{i}", x) for i, x in enumerate(xs)], "id string, x long")
    suite = CheckSuite({"properties": {"x": {"minimum": lo, "maximum": hi}}})
    res = suite.run(df, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == _python_oracle_bounds(xs, lo, hi)
    assert res.ok() == (not got)


arrays = st.lists(
    st.lists(st.integers(min_value=-20, max_value=120), min_size=0, max_size=8),
    min_size=1, max_size=8)


@SETTINGS
@given(arrs=arrays, lo=st.integers(0, 40), hi=st.integers(60, 110))
def test_items_rewrite_matches_forall_semantics(spark, arrs, lo, hi):
    """The array_min/array_max bounds rewrite must be indistinguishable from
    per-element forall semantics (including empty arrays)."""
    df = spark.createDataFrame(
        [(f"r{i}", a) for i, a in enumerate(arrs)], "id string, a array<long>")
    suite = CheckSuite({"properties": {"a": {"items": {"minimum": lo, "maximum": hi}}}})
    res = suite.run(df, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    expect = {f"r{i}" for i, a in enumerate(arrs)
              if any(not (lo <= x <= hi) for x in a)}
    assert got == expect


@SETTINGS
@given(xs=st.lists(st.one_of(st.none(), st.sampled_from(["a", "b", "c", "zz"])),
                   min_size=1, max_size=15),
       tau=st.floats(min_value=0.0, max_value=1.0))
def test_nullrate_and_enum_match_python(spark, xs, tau):
    # single partition so the per-partition null rate IS the global rate
    df = spark.createDataFrame(
        [(f"r{i}", x) for i, x in enumerate(xs)], "id string, s string").coalesce(1)
    suite = CheckSuite({"properties": {"s": {"enum": ["a", "b", "c"],
                                             "x-nullRate": {"max": tau}}}})
    res = suite.run(df, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    expect = {f"r{i}" for i, x in enumerate(xs) if x is not None and x == "zz"}
    assert got == expect
    null_rate = sum(1 for x in xs if x is None) / len(xs)
    verdict = res.verdicts.where("check_id like '%x-nullRate%'").first()
    assert verdict["passed"] == (null_rate <= tau + 1e-12)
    assert verdict["metric_value"] == pytest.approx(null_rate)
