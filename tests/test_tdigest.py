"""Mergeable t-digest quantile sketch (operators/tdigest.py): exact
singleton regime, compressed-regime rank-error bound, mergeability across
partitionings, and the x-quantile {'backend': 'tdigest'} engine wiring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.tdigest import (
    _merge,
    tdigest_quantile_value,
    tdigest_quantiles,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


# ---------------------------------------------------------------------------
# numpy-level digest math (no Spark)
# ---------------------------------------------------------------------------

def _digest_of(values, delta):
    v = np.asarray(values, dtype=float)
    return _merge(v, np.ones(v.size), delta)


def test_singleton_regime_is_exact():
    rng = np.random.RandomState(7)
    vals = rng.lognormal(3.0, 1.0, size=80)
    m, w = _digest_of(vals, delta=400)
    assert np.all(w == 1.0) and m.size == vals.size
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        assert tdigest_quantile_value(m, w, q) == pytest.approx(
            np.quantile(vals, q, method="linear"), abs=0.0)


def test_compressed_regime_rank_error_bound():
    rng = np.random.RandomState(11)
    vals = rng.lognormal(3.0, 1.5, size=50_000)
    m, w = _digest_of(vals, delta=100)
    assert m.size < 2 * 100  # compression actually engaged
    srt = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = tdigest_quantile_value(m, w, q)
        rank = np.searchsorted(srt, est) / srt.size
        assert abs(rank - q) < 0.01, (q, rank)


def test_merge_of_partial_digests_matches_single_digest():
    """Digest-of-digests (the phase-2 path) stays within the same rank
    error as one digest over everything."""
    rng = np.random.RandomState(13)
    vals = rng.gamma(2.0, 10.0, size=40_000)
    parts = np.array_split(vals, 16)
    partials = [_digest_of(p, 100) for p in parts]
    m, w = _merge(np.concatenate([pm for pm, _ in partials]),
                  np.concatenate([pw for _, pw in partials]), 100)
    assert w.sum() == vals.size
    srt = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        est = tdigest_quantile_value(m, w, q)
        rank = np.searchsorted(srt, est) / srt.size
        assert abs(rank - q) < 0.015, (q, rank)


def test_tail_weights_smaller_than_center():
    vals = np.linspace(0.0, 1.0, 10_000)
    m, w = _digest_of(vals, delta=100)
    k = w.size
    assert max(w[0], w[-1]) < w[k // 2]


# ---------------------------------------------------------------------------
# Spark two-phase operator
# ---------------------------------------------------------------------------

def test_spark_exact_regime_matches_numpy(spark):
    rng = np.random.RandomState(5)
    rows = [(("g%d" % (i % 3)), float(v))
            for i, v in enumerate(rng.normal(100.0, 15.0, size=90))]
    df = spark.createDataFrame(rows, "g: string, x: double").repartition(7)
    out = {(r["grp"], r["q"]): r["value"]
           for r in tdigest_quantiles(df, "x", [0.5, 0.9], group_col="g",
                                      delta=400).collect()}
    for g in ("g0", "g1", "g2"):
        vals = np.array([v for gg, v in rows if gg == g])
        for q in (0.5, 0.9):
            assert out[(g, q)] == pytest.approx(
                np.quantile(vals, q, method="linear"), rel=1e-12)


def test_spark_partitioning_invariance_in_exact_regime(spark):
    rows = [(None, float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "g: string, x: double")
    a = {r["q"]: r["value"] for r in tdigest_quantiles(
        df.repartition(1), "x", [0.25, 0.75], group_col="g",
        delta=400).collect()}
    b = {r["q"]: r["value"] for r in tdigest_quantiles(
        df.repartition(13), "x", [0.25, 0.75], group_col="g",
        delta=400).collect()}
    assert a == b


def test_null_group_and_nan_values(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("a", float("nan")), ("a", 5.0)],
        "g: string, x: double")
    out = tdigest_quantiles(df, "x", [0.5], group_col="g").collect()
    by_g = {r["grp"]: r["value"] for r in out}
    assert by_g[None] == pytest.approx(2.0)
    assert by_g["a"] == pytest.approx(5.0)  # NaN dropped, not poisoning


def test_global_digest_without_group(spark):
    df = spark.range(101).select(F.col("id").cast("double").alias("x"))
    out = tdigest_quantiles(df, "x", [0.5]).collect()
    assert len(out) == 1 and out[0]["grp"] == "<global>"
    assert out[0]["value"] == pytest.approx(50.0)


# ---------------------------------------------------------------------------
# x-quantile backend wiring
# ---------------------------------------------------------------------------

def _seq_df(spark):
    rows = [("s1", i, float(10 + (i * 7) % 50)) for i in range(40)]
    rows += [("s2", 100 + i, float(200 + i)) for i in range(20)]
    return spark.createDataFrame(rows, "src: string, id: long, n: double")


def test_engine_tdigest_backend_verdicts(spark):
    suite = CheckSuite({"properties": {"n": {
        "x-quantile": {"q": 0.5, "max": 100.0, "backend": "tdigest",
                       "delta": 200}}}})
    res = suite.run(_seq_df(spark), key="id", partition_by="src")
    rows = {r["partition_id"]: r for r in res.verdicts.collect()
            if r["check_id"] == "properties/n/x-quantile"}
    assert set(rows) == {"s1", "s2"}
    assert rows["s1"]["passed"] and not rows["s2"]["passed"]
    # exact regime: metric is the true median
    vals = sorted(float(10 + (i * 7) % 50) for i in range(40))
    assert rows["s1"]["metric_value"] == pytest.approx(
        np.quantile(vals, 0.5, method="linear"))
    assert rows["s1"]["threshold"] == 100.0


def test_engine_tdigest_matches_fused_approx_verdict(spark):
    """Same bounds through both backends agree when the bound is far from
    the estimate's error band."""
    df = _seq_df(spark)
    td = CheckSuite({"properties": {"n": {
        "x-quantile": {"q": 0.5, "max": 100.0, "backend": "tdigest"}}}})
    pa = CheckSuite({"properties": {"n": {
        "x-quantile": {"q": 0.5, "max": 100.0}}}})
    v_td = {r["partition_id"]: r["passed"]
            for r in td.run(df, key="id", partition_by="src")
            .verdicts.collect()}
    v_pa = {r["partition_id"]: r["passed"]
            for r in pa.run(df, key="id", partition_by="src")
            .verdicts.collect()}
    assert v_td == v_pa


def test_spec_validation():
    validate_suite_spec({"properties": {"n": {
        "x-quantile": {"q": 0.5, "max": 10, "backend": "tdigest",
                       "delta": 100}}}})
    with pytest.raises(SuiteError, match="backend"):
        validate_suite_spec({"properties": {"n": {
            "x-quantile": {"q": 0.5, "backend": "gk"}}}})
    with pytest.raises(SuiteError, match="delta"):
        validate_suite_spec({"properties": {"n": {
            "x-quantile": {"q": 0.5, "backend": "tdigest", "delta": 2}}}})


# ---------------------------------------------------------------------------
# property-based invariants (hypothesis; pure numpy — no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_vals = st.lists(st.floats(min_value=-1e6, max_value=1e6,
                           allow_nan=False, allow_infinity=False),
                 min_size=1, max_size=300)


@settings(max_examples=60, deadline=None)
@given(_vals)
def test_prop_singleton_regime_equals_numpy(vals):
    m, w = _digest_of(vals, delta=2000)
    if not np.all(w == 1.0):
        return  # duplicates merged by value-sort ties: skip, regime left
    for q in (0.0, 0.3, 0.77, 1.0):
        assert tdigest_quantile_value(m, w, q) == pytest.approx(
            np.quantile(np.asarray(vals), q, method="linear"),
            rel=1e-9, abs=1e-9)


@settings(max_examples=40, deadline=None)
@given(_vals, st.integers(min_value=2, max_value=8))
def test_prop_merge_preserves_weight_and_bounds(vals, parts):
    arr = np.asarray(vals, dtype=float)
    chunks = np.array_split(arr, parts)
    partials = [_digest_of(c, 50) for c in chunks if c.size]
    m, w = _merge(np.concatenate([pm for pm, _ in partials]),
                  np.concatenate([pw for _, pw in partials]), 50)
    assert w.sum() == pytest.approx(arr.size)
    # quantiles stay inside the data range and monotone in q
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    est = [tdigest_quantile_value(m, w, q) for q in qs]
    assert est == sorted(est)
    assert arr.min() - 1e-9 <= est[0] and est[-1] <= arr.max() + 1e-9


def test_tree_merge_equals_flat_in_exact_regime(spark):
    rows = [("g", float(i)) for i in range(80)]
    df = spark.createDataFrame(rows, "g: string, x: double").repartition(11)
    flat = {r["q"]: r["value"] for r in tdigest_quantiles(
        df, "x", [0.1, 0.5, 0.9], group_col="g", delta=400).collect()}
    tree = {r["q"]: r["value"] for r in tdigest_quantiles(
        df, "x", [0.1, 0.5, 0.9], group_col="g", delta=400,
        tree_fanin=4).collect()}
    assert flat == tree


def test_tree_merge_preserves_weight_compressed(spark):
    df = (spark.range(30_000)
          .select((F.col("id") % 997).cast("double").alias("x"),
                  F.lit("g").alias("g"))
          .repartition(16))
    from jsonschema_valid_spark.operators.tdigest import (
        partition_digests,
        tree_merge_digests,
    )

    merged = tree_merge_digests(
        partition_digests(df, "x", "g", delta=100), delta=100, fanin=4)
    rows = merged.collect()
    assert 1 <= len(rows) <= 4
    total = sum(sum(r["weights"]) for r in rows)
    assert total == 30_000


def test_engine_tree_fanin_knob(spark):
    suite = CheckSuite({"properties": {"n": {
        "x-quantile": {"q": 0.5, "max": 100.0, "backend": "tdigest",
                       "treeFanin": 4}}}})
    res = suite.run(_seq_df(spark), key="id", partition_by="src")
    rows = {r["partition_id"]: r["passed"] for r in res.verdicts.collect()
            if r["check_id"] == "properties/n/x-quantile"}
    assert rows == {"s1": True, "s2": False}


def test_all_null_group_emits_passing_verdict(spark):
    """Regression (review find): a partition whose column is entirely
    NULL must still produce a verdict row (passed=True, NaN estimate
    contract) — it previously vanished from the output."""
    from jsonschema_valid_spark.operators.tdigest import (
        tdigest_quantile_verdicts,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 7.0), (3, "b", None), (4, "b", None)],
        "id: long, grp: string, v: double")
    out = tdigest_quantile_verdicts(
        df, "v", "c", {"q": 0.5, "min": 0.0}, partition_by="grp")
    got = {r.partition_id: r.passed for r in out.collect()}
    assert got == {"a": True, "b": True}
