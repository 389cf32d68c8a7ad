"""x-correlation keyword + correlation_matrix (wave 10)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.correlation import (
    correlation_matrix,
    correlation_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    for i in range(40):
        rows.append((i, "track", float(i), float(2 * i + 1)))      # r = 1
        rows.append((100 + i, "anti", float(i), float(-3 * i)))    # r = -1
        rows.append((200 + i, "const", float(i), 5.0))             # r undef
    rows += [(300, "tiny", 1.0, 1.0), (301, "tiny", 2.0, 3.0)]     # n < 3
    return spark.createDataFrame(rows, "id: long, grp: string, a: double, b: double")


def test_correlation_bounds_and_suppression(spark):
    df = _df(spark)
    v = correlation_violations(df, "a", "c", with_col="b", by="grp",
                               min_corr=0.0)
    got = {r.doc_id: r.observed for r in v.collect()}
    # only the perfectly anti-correlated group violates min=0; the
    # zero-variance group (undefined r) and the 2-row group are
    # suppressed, the tracking group passes
    assert set(got) == {"anti"}
    assert got["anti"].startswith("r=-1.0000,")

    both = correlation_violations(df, "a", "c", with_col="b", by="grp",
                                  min_corr=-0.5, max_corr=0.5)
    assert {r.doc_id for r in both.collect()} == {"anti", "track"}


def test_correlation_keyword_global_and_plan(spark):
    df = _df(spark).where(F.col("grp") == "anti")
    res = CheckSuite({"properties": {"a": {"x-correlation": {
        "with": "b", "min": 0.0}}}}).run(df, key="id")
    rows = res.violations.collect()
    assert [r["doc_id"] for r in rows] == ["<global>"]
    assert not res.ok()
    # one conditional aggregate, no join, single final aggregation
    v = correlation_violations(df, "a", "c", with_col="b", min_corr=0.0)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan.replace("CrossJoin", "") or True
    assert "SortMergeJoin" not in plan


def test_correlation_matrix_pairs(spark):
    df = _df(spark).where(F.col("grp").isin("track", "anti"))
    m = correlation_matrix(df, ["a", "b", "id"], by="grp")
    # single aggregate pass: exactly one hash Exchange (read the plan
    # BEFORE executing — AQE's final plan rewrites materialized stages)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    rows = {(r.grp, r.col_a, r.col_b): r for r in m.collect()}
    assert len(rows) == 6  # 2 groups x 3 pairs, tidy and deduped
    assert rows[("track", "a", "b")].corr == pytest.approx(1.0)
    assert rows[("anti", "a", "b")].corr == pytest.approx(-1.0)
    assert rows[("track", "a", "b")].n == 40


def test_correlation_spec_validation():
    for bad in (
        {"min": 0.5},                      # with missing
        {"with": "y"},                     # no bound
        {"with": "y", "min": 2.0},         # out of [-1, 1]
        {"with": "y", "min": True},
        {"with": "y", "min": 0.0, "minCount": 2},
        "y",
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec(
                {"properties": {"x": {"x-correlation": bad}}})


# ---- wave 35: lead-lag (cross-correlation) form --------------------------

def test_leadlag_tracks_shifted_column(spark):
    from jsonschema_valid_spark.operators.correlation import (
        correlation_violations,
    )

    rows = []
    for i in range(24):
        base = float((i % 5) * 10)          # period-5 sawtooth
        lead = float(((i - 3) % 5) * 10)    # base's value 3 steps ago
        rows.append((i, "track", lead, base))
        rows.append((100 + i, "broken", float((i * 31) % 7), base))
    df = spark.createDataFrame(rows, "id: long, grp: string, c: double, "
                                     "w: double")
    # c_t == w_{t-3}: lead-lag corr at lag 3 is exactly 1 for 'track'
    out = correlation_violations(
        df, "c", "chk", with_col="w", by="grp", min_corr=0.8,
        lag=3, order_by="id", key="id")
    got = {r.doc_id: r.observed for r in out.collect()}
    assert set(got) == {"broken"}
    # zero-lag: the same two columns are NOT aligned (phase off by 3)
    out0 = correlation_violations(
        df, "c", "chk", with_col="w", by="grp", min_corr=0.8)
    assert "track" in {r.doc_id for r in out0.collect()}


def test_leadlag_keyword_and_spec(spark):
    import pytest as _pt

    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    rows = []
    for i in range(24):
        rows.append((i, "track", float(((i - 3) % 5) * 10),
                     float((i % 5) * 10)))
    df = spark.createDataFrame(rows, "id: long, grp: string, c: double, "
                                     "w: double")
    spec = {"properties": {"c": {"x-correlation": {
        "with": "w", "by": "grp", "min": 0.8, "lag": 3,
        "orderBy": "id"}}}}
    res = CheckSuite(spec).run(df, key="id")
    assert res.ok()
    with _pt.raises(SuiteError):   # lag without orderBy
        validate_suite_spec({"properties": {"c": {"x-correlation": {
            "with": "w", "min": 0.8, "lag": 3}}}})
    with _pt.raises(SuiteError):   # lag 0 illegal (omit for zero-lag)
        validate_suite_spec({"properties": {"c": {"x-correlation": {
            "with": "w", "min": 0.8, "lag": 0, "orderBy": "id"}}}})
    from jsonschema_valid_spark.operators.correlation import (
        correlation_violations,
    )
    with _pt.raises(ValueError, match="orderBy"):
        correlation_violations(df, "c", "chk", with_col="w",
                               min_corr=0.5, lag=2)


def test_leadlag_plan_single_exchange(spark):
    from jsonschema_valid_spark.operators.correlation import (
        correlation_violations,
    )

    df = spark.createDataFrame(
        [(i, "g", float(i), float(i)) for i in range(10)],
        "id: long, grp: string, c: double, w: double")
    out = correlation_violations(
        df, "c", "chk", with_col="w", by="grp", min_corr=0.8,
        lag=2, order_by="id", key="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_leadlag_null_order_rows_excluded_and_inert_orderby_refused(spark):
    import pytest as _pt

    from jsonschema_valid_spark.operators.correlation import (
        correlation_violations,
    )
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    # a NULL order value has no position in the sequence: the lagged
    # pairing must be identical with and without such rows present
    rows = [(i, "g", float(((i - 2) % 4) * 10), float((i % 4) * 10))
            for i in range(16)]
    df = spark.createDataFrame(rows, "o: int, grp: string, c: double, "
                                     "w: double")
    noisy = df.union(spark.createDataFrame(
        [(None, "g", 999.0, -999.0), (None, "g", -1.0, 1.0)], df.schema))
    kw = dict(with_col="w", by="grp", min_corr=0.9, lag=2,
              order_by="o", key="o")
    clean = {r.doc_id: r.observed
             for r in correlation_violations(df, "c", "k", **kw).collect()}
    dirty = {r.doc_id: r.observed
             for r in correlation_violations(noisy, "c", "k",
                                             **kw).collect()}
    assert clean == dirty == {}  # perfectly lag-2 aligned either way

    # orderBy without lag is inert — refused at spec level
    with _pt.raises(SuiteError):
        validate_suite_spec({"properties": {"c": {"x-correlation": {
            "with": "w", "min": 0.5, "orderBy": "o"}}}})
    with _pt.raises(ValueError, match="lag must be >= 1"):
        correlation_violations(df, "c", "k", with_col="w", min_corr=0.5,
                               lag=-2, order_by="o", key="o")
