"""Funnel, retention cohorts, and the x-session keyword (wave 7)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.funnel import (
    funnel,
    retention_cohorts,
)
from jsonschema_valid_spark.operators.temporal import session_violations
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def journey(spark):
    rows = [
        # u1: full ordered journey
        ("u1", "signup", _ts(0)), ("u1", "view", _ts(10)),
        ("u1", "purchase", _ts(20)),
        # u2: purchase BEFORE view — must stop at view? no: u2 views at
        # 10 after signup, purchase at 5 is before the view -> stops at
        # step 2 (order matters, not mere presence)
        ("u2", "signup", _ts(0)), ("u2", "purchase", _ts(5)),
        ("u2", "view", _ts(10)),
        # u3: no signup at all -> converts nothing
        ("u3", "view", _ts(0)), ("u3", "purchase", _ts(1)),
        # u4: signup only
        ("u4", "signup", _ts(0)),
    ]
    return spark.createDataFrame(rows, "uid string, et string, ts timestamp")


def _counts(df):
    return {r.step_name: r.n_converted for r in df.collect()}


def test_funnel_order_matters(journey):
    out = funnel(journey, key="uid", ts="ts",
                 steps=[("signup", "et = 'signup'"),
                        ("view", "et = 'view'"),
                        ("purchase", "et = 'purchase'")])
    assert _counts(out) == {"signup": 3, "view": 2, "purchase": 1}


def test_funnel_equal_ts_not_after(spark):
    # step 2 at the SAME timestamp as step 1 does not count (strictly
    # after), and first-touch uses the EARLIEST step-1 time.
    rows = [("u", "a", _ts(0)), ("u", "b", _ts(0)), ("u", "b", _ts(1))]
    df = spark.createDataFrame(rows, "uid string, et string, ts timestamp")
    out = funnel(df, key="uid", ts="ts",
                 steps=[("a", "et = 'a'"), ("b", "et = 'b'")])
    assert _counts(out) == {"a": 1, "b": 1}
    only_tie = funnel(df.where(F.col("ts") == _ts(0)), key="uid",
                      ts="ts", steps=[("a", "et = 'a'"),
                                      ("b", "et = 'b'")])
    assert _counts(only_tie) == {"a": 1, "b": 0}


def test_funnel_within_window(journey):
    out = funnel(journey, key="uid", ts="ts",
                 steps=[("signup", "et = 'signup'"),
                        ("view", "et = 'view'"),
                        ("purchase", "et = 'purchase'")],
                 within_seconds=15 * 60)
    # u1's purchase at minute 20 falls outside the 15-min window
    assert _counts(out) == {"signup": 3, "view": 2, "purchase": 0}


def test_funnel_single_exchange(journey):
    out = funnel(journey, key="uid", ts="ts",
                 steps=[("signup", "et = 'signup'"),
                        ("view", "et = 'view'"),
                        ("purchase", "et = 'purchase'")])
    plan = _plan(out)
    # one key shuffle for the whole window chain + per-key roll-up;
    # the only other Exchange is the final SinglePartition count.
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_retention_cells(spark):
    wk = 7 * 24 * 3600
    rows = [
        ("a", _ts(0)),                # epoch week 2817
        ("a", _ts(10 * 24 * 60)),     # +10 d lands in epoch week 2819
        ("b", _ts(8 * 24 * 60)),      # first event in week 2818
        ("b", _ts(8 * 24 * 60 + 30)),  # same period, dedup'd
    ]
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = retention_cohorts(df, key="uid", ts="ts", period_seconds=wk)
    cells = {(r.cohort_period, r.periods_since): r.n_users
             for r in out.collect()}
    w0 = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp()
             // wk)
    assert cells[(w0, 0)] == 1          # cohort a, week 0
    assert cells[(w0, 2)] == 1          # a active two epoch-weeks on
    assert cells[(w0 + 1, 0)] == 1      # cohort b (duplicate collapsed)
    assert len(cells) == 3


def test_session_violations_bounds(spark):
    rows = [
        # g1: one 5-event session (0..40 min) -> maxEvents=3 violation
        *[("g1", _ts(i * 10), i) for i in range(5)],
        # g2: two singleton sessions -> minEvents=2 violations
        ("g2", _ts(0), 10), ("g2", _ts(600), 11),
    ]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, eid long")
    v = session_violations(df, column="ts", check_id="c", key="eid",
                           by="grp", gap_seconds=3600.0, max_events=3,
                           min_events=2)
    got = {(r.doc_id, r.observed) for r in v.collect()}
    assert got == {
        ("g1/0", "n=5,dur_us=2400000000"),
        ("g2/0", "n=1,dur_us=0"),
        ("g2/1", "n=1,dur_us=0"),
    }


def test_session_keyword_engine_and_spec(spark):
    rows = [*[("g1", _ts(i), i) for i in range(4)]]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, eid long")
    suite = CheckSuite({"properties": {"ts": {"x-session": {
        "by": "grp", "gapSeconds": 3600, "maxEvents": 3}}}})
    res = suite.run(df, key="eid")
    assert res.violations.count() == 1
    assert not res.ok()
    # spec validation rejects malformed forms
    for bad in (
        {"by": "grp", "maxEvents": 3},                # no gap
        {"by": "grp", "gapSeconds": 3600},            # no bound
        {"gapSeconds": 3600, "maxEvents": 3},         # no by
        {"by": "grp", "gapSeconds": 0, "maxEvents": 3},
        {"by": "grp", "gapSeconds": 3600, "maxEvents": True},
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec(
                {"properties": {"ts": {"x-session": bad}}})


# ------------------------------------------------------------- x-eventOrder

def test_event_order_violations(spark):
    rows = [
        # u1: signup(0) then purchase(5) — fine
        ("u1", "signup", _ts(0)), ("u1", "purchase", _ts(5)),
        # u2: purchase(0) before signup(5) — violation
        ("u2", "purchase", _ts(0)), ("u2", "signup", _ts(5)),
        # u3: purchase with NO signup — violation (requireFirst)
        ("u3", "purchase", _ts(0)),
        # u4: signup only — vacuous pass
        ("u4", "signup", _ts(0)),
    ]
    df = spark.createDataFrame(rows, "uid string, et string, ts timestamp")
    suite = CheckSuite({"properties": {"ts": {"x-eventOrder": {
        "by": "uid", "first": "et = 'signup'",
        "then": "et = 'purchase'"}}}})
    res = suite.run(df, key="uid")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert set(got) == {"u2", "u3"}
    assert got["u3"].startswith("first=none,")
    # requireFirst=False lets the missing-first user pass
    lax = CheckSuite({"properties": {"ts": {"x-eventOrder": {
        "by": "uid", "first": "et = 'signup'",
        "then": "et = 'purchase'", "requireFirst": False}}}})
    assert ({r["doc_id"] for r in lax.run(df, key="uid")
             .violations.collect()} == {"u2"})


def test_event_order_equal_ts_passes(spark):
    # simultaneous first/then (same micro) is at-or-before: pass
    df = spark.createDataFrame(
        [("u", "signup", _ts(0)), ("u", "purchase", _ts(0))],
        "uid string, et string, ts timestamp")
    res = CheckSuite({"properties": {"ts": {"x-eventOrder": {
        "by": "uid", "first": "et = 'signup'",
        "then": "et = 'purchase'"}}}}).run(df, key="uid")
    assert res.violations.count() == 0


def test_event_order_single_aggregate_no_join(spark):
    from jsonschema_valid_spark.operators.temporal import (
        event_order_violations,
    )

    df = spark.range(100).select(
        (F.col("id") % 5).alias("uid"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        (F.col("id") % 3).alias("k"))
    v = event_order_violations(df, "ts", "c", by="uid",
                               first="k = 0", then="k = 1")
    plan = _plan(v)
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_event_order_spec_validation():
    for bad in (
        {"by": "g", "first": "a = 1"},             # then missing
        {"first": "a = 1", "then": "b = 1"},       # by missing
        {"by": "g", "first": "", "then": "b"},     # empty predicate
        {"by": "g", "first": "a", "then": "b", "requireFirst": "yes"},
        "a before b",
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec(
                {"properties": {"ts": {"x-eventOrder": bad}}})


def test_funnel_keyword_rate_floors(spark):
    """x-funnel: step-to-step conversion-rate floors as a declarative
    check — both run paths, suppression on zero upstream."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.engine import run_suite_summarized
    from jsonschema_valid_spark.operators.funnel import funnel_violations
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    rows = []
    t0 = "2024-01-01 00:0{}:00"
    for u in range(10):
        rows.append((f"u{u}", "view", t0.format(1)))
    for u in range(5):
        rows.append((f"u{u}", "click", t0.format(2)))
    rows.append(("u0", "buy", t0.format(3)))
    df = (spark.createDataFrame(rows, "u: string, et: string, s: string")
          .select("u", "et", F.to_timestamp("s").alias("ts")))

    steps = [{"name": "view", "when": "et = 'view'"},
             {"name": "click", "when": "et = 'click'"},
             {"name": "buy", "when": "et = 'buy'"}]
    # click rate 0.5 >= 0.4 passes; buy rate 0.2 < 0.5 trips
    spec = {"properties": {"et": {"x-funnel": {
        "key": "u", "ts": "ts", "steps": steps,
        "minRates": [0.4, 0.5]}}}}
    res = CheckSuite(spec).run(df, key="u")
    viol = res.violations.collect()
    assert [(r.doc_id, r.observed) for r in viol] == \
        [("buy", "rate=0.200000,n=1,prev=5")]
    assert not res.ok()
    summ = run_suite_summarized(CheckSuite(spec), df, key="u")
    assert [r.doc_id for r in summ.violations.collect()] == ["buy"]

    # zero upstream: undefined rate suppressed (no false alarm)
    nody = df.where("et = 'view'")
    v = funnel_violations(
        nody, "et", "c", key="u", ts="ts",
        steps=[("view", "et = 'view'"), ("click", "et = 'click'"),
               ("buy", "et = 'buy'")],
        min_rates=[0.4, 0.5])
    assert [r.doc_id for r in v.collect()] == ["click"]  # 0/10 trips;
    # buy's 0/0 upstream is suppressed

    with pytest.raises(ValueError, match="min_rates"):
        funnel_violations(df, "et", "c", key="u", ts="ts",
                          steps=[("a", "et='view'"), ("b", "et='click'")],
                          min_rates=[0.1, 0.2])
    for bad in (
        {"key": "u", "ts": "ts", "steps": steps},          # no minRates
        {"key": "u", "ts": "ts", "steps": steps,
         "minRates": [0.4]},                               # wrong arity
        {"key": "u", "ts": "ts", "steps": [steps[0]],
         "minRates": []},                                  # < 2 steps
        {"ts": "ts", "steps": steps, "minRates": [0.4, 0.5]},
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"et": {"x-funnel": bad}}})
