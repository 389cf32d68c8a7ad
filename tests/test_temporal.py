"""Temporal operators: as-of join, binned range join, sessionization.

Semantics pinned against hand fixtures (tie/strict/tolerance/NULL
corners an oracle query can sail past) plus plan assertions for the
scale contracts in operators/temporal.py's module docstring.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.temporal import (
    asof_join,
    interval_point_join,
    session_stats,
    sessionize,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, price) — price includes NULL to prove the struct carry.
    rows = [
        ("a", _ts("2024-01-01T00:00:00"), 1.0, 10),
        ("a", _ts("2024-01-01T00:01:00"), None, 11),
        ("a", _ts("2024-01-01T00:02:00"), 3.0, 12),
        ("b", _ts("2024-01-01T00:01:30"), 7.0, 20),
    ]
    return spark.createDataFrame(
        rows, "sym string, ts timestamp, price double, qid long")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", _ts("2024-01-01T00:00:30"), 100),  # after q10
        ("a", _ts("2024-01-01T00:01:00"), 101),  # ties q11 exactly
        ("a", _ts("2024-01-01T00:05:00"), 102),  # after q12 (3 min)
        ("b", _ts("2024-01-01T00:00:00"), 103),  # before any b quote
        ("c", _ts("2024-01-01T00:00:00"), 104),  # key with no quotes
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, tid long")


def _asof_map(df):
    return {r.tid: (r.asof_qid, r.asof_price) for r in df.collect()}


def test_asof_backward_inclusive_and_null_payload(quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="ts",
                    right_cols=["price", "qid"], right_tiebreak="qid")
    m = _asof_map(out.withColumnRenamed("asof_qid", "asof_qid"))
    assert m[100] == (10, 1.0)
    # equal-ts quote IS visible (inclusive), and its genuinely-NULL
    # price must come through as the match's NULL — not fall back to
    # the older quote's 1.0 (struct carry, not per-column carry).
    assert m[101] == (11, None)
    assert m[102] == (12, 3.0)
    assert m[103] == (None, None)   # no quote at-or-before
    assert m[104] == (None, None)   # key absent from right
    assert out.count() == 5         # left join keeps everything


def test_asof_strict_excludes_equal_ts(quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="ts",
                    right_cols=["qid"], strict=True, right_tiebreak="qid")
    m = {r.tid: r.asof_qid for r in out.collect()}
    assert m[101] == 10  # the equal-ts q11 is now invisible


def test_asof_forward(quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="ts",
                    direction="forward", right_cols=["qid"],
                    right_tiebreak="qid")
    m = {r.tid: r.asof_qid for r in out.collect()}
    assert m[100] == 11  # next quote at-or-after 00:00:30
    assert m[101] == 11  # inclusive: the equal-ts quote
    assert m[102] is None  # nothing after 00:05
    assert m[103] == 20


def test_asof_tolerance_and_inner(quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="ts",
                    right_cols=["qid"], tolerance_seconds=60.0,
                    right_tiebreak="qid")
    m = {r.tid: r.asof_qid for r in out.collect()}
    # trade 102 is 3 min after q12 — voided by the 60 s tolerance.
    assert m[102] is None and m[100] == 10
    inner = asof_join(trades, quotes, on="sym", left_ts="ts",
                      right_cols=["qid"], tolerance_seconds=60.0,
                      right_tiebreak="qid", how="inner")
    assert sorted(r.tid for r in inner.collect()) == [100, 101]


def test_asof_tiebreak_largest_wins(spark):
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:00"), 1),
         ("a", _ts("2024-01-01T00:00:00"), 2)],
        "k string, ts timestamp, rid long")
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01T00:00:01"), 9)],
        "k string, ts timestamp, lid long")
    out = asof_join(left, right, on="k", left_ts="ts",
                    right_cols=["rid"], right_tiebreak="rid")
    assert out.collect()[0].asof_rid == 2


def test_asof_single_exchange(quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="ts",
                    right_cols=["qid"], right_tiebreak="qid")
    plan = _plan(out)
    # One hash-partition Exchange on the key (below the union-window);
    # no join operator at all — the merge is the window.
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------- range join

def test_interval_point_join_edges(spark):
    t0 = _ts("2024-01-01T00:00:00")
    iv = spark.createDataFrame(
        [("u", t0, _ts("2024-01-01T01:00:00"), 1)],
        "uid string, s timestamp, e timestamp, ivid long")
    pts = spark.createDataFrame(
        [("u", t0, 1),                                  # == start: in
         ("u", _ts("2024-01-01T00:59:59.999999"), 2),   # last micro: in
         ("u", _ts("2024-01-01T01:00:00"), 3),          # == end: out (left)
         ("u", _ts("2023-12-31T23:59:59.999999"), 4),   # before: out
         ("v", _ts("2024-01-01T00:30:00"), 5)],         # wrong key: out
        "uid string, ts timestamp, pid long")
    out = interval_point_join(pts, iv, point_col="ts", start_col="s",
                              end_col="e", by="uid",
                              bin_width_seconds=600.0,
                              interval_cols=["ivid"])
    assert sorted(r.pid for r in out.collect()) == [1, 2]
    both = interval_point_join(pts, iv, point_col="ts", start_col="s",
                               end_col="e", by="uid",
                               bin_width_seconds=600.0,
                               interval_cols=["ivid"], closed="both")
    assert sorted(r.pid for r in both.collect()) == [1, 2, 3]


def test_interval_point_join_no_dup_across_bins(spark):
    # Interval spans many bins; each inside point must appear exactly
    # once even though the interval exploded to 7 bin rows.
    iv = spark.createDataFrame(
        [(_ts("2024-01-01T00:00:00"), _ts("2024-01-01T06:00:00"), 1)],
        "s timestamp, e timestamp, ivid long")
    pts = spark.createDataFrame(
        [(_ts(f"2024-01-01T0{h}:30:00"), h) for h in range(6)],
        "ts timestamp, pid long")
    out = interval_point_join(pts, iv, point_col="ts", start_col="s",
                              end_col="e", bin_width_seconds=3600.0,
                              interval_cols=["ivid"])
    assert sorted(r.pid for r in out.collect()) == list(range(6))
    assert out.count() == 6


def test_interval_point_join_no_cartesian(spark):
    ev = spark.range(100).select(
        (F.col("id") % 5).alias("uid"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
        F.col("id").alias("pid"))
    iv = spark.range(10).select(
        (F.col("id") % 5).alias("uid"),
        F.timestamp_micros(F.col("id") * 600_000_000).alias("s"),
        F.timestamp_micros(F.col("id") * 600_000_000
                           + 1_200_000_000).alias("e"),
        F.col("id").alias("ivid"))
    out = interval_point_join(ev, iv, point_col="ts", start_col="s",
                              end_col="e", by="uid",
                              bin_width_seconds=1200.0,
                              interval_cols=["ivid"])
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # sanity: the equi-join really keys on (uid, bin)
    assert out.count() > 0


# -------------------------------------------------------------- sessionize

def test_sessionize_gap_semantics(spark):
    rows = [
        ("u", _ts("2024-01-01T00:00:00"), 1),
        ("u", _ts("2024-01-01T00:30:00"), 2),   # gap == 30 min: same
        ("u", _ts("2024-01-01T01:00:01"), 3),   # gap > 30 min: break
        ("u", None, 0),                          # NULL ts: first session
        ("w", _ts("2024-01-01T09:00:00"), 4),
    ]
    df = spark.createDataFrame(rows, "uid string, ts timestamp, eid long")
    out = sessionize(df, key="uid", ts="ts", gap_seconds=1800.0,
                     order_tiebreak="eid")
    m = {r.eid: r.session_idx for r in out.collect()}
    assert m[0] == 0 and m[1] == 0 and m[2] == 0
    assert m[3] == 1
    assert m[4] == 0


def test_session_stats_values_and_plan(spark):
    rows = [
        ("u", _ts("2024-01-01T00:00:00"), 1),
        ("u", _ts("2024-01-01T00:10:00"), 2),
        ("u", _ts("2024-01-01T02:00:00"), 3),
    ]
    df = spark.createDataFrame(rows, "uid string, ts timestamp, eid long")
    out = session_stats(df, key="uid", ts="ts", gap_seconds=1800.0,
                        order_tiebreak="eid")
    # Scale contract (read the plan BEFORE executing — AQE rewrites
    # materialized stages): both Window nodes (lag, then the running
    # sum it feeds) and the stats groupBy share ONE hash-partition
    # Exchange on the key; partial+final HashAggregate on top.
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    got = {(r.uid, r.session_idx): (r.n_events, r.duration_micros)
           for r in out.collect()}
    assert got[("u", 0)] == (2, 600_000_000)
    assert got[("u", 1)] == (1, 0)


def test_asof_matches_naive_join(spark):
    """Property-ish cross-check: union+window == naive join+argmax on a
    generated table (both computed in Spark, so any window/tie bug that
    slipped the hand fixtures surfaces on 500 rows of collisions)."""
    left = spark.range(500).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_micros((F.col("id") * 37) % 400 * 1_000_000)
        .alias("ts"),
        F.col("id").alias("lid"))
    right = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_micros((F.col("id") * 53) % 400 * 1_000_000)
        .alias("ts"),
        F.col("id").alias("rid"))
    out = asof_join(left, right, on="k", left_ts="ts",
                    right_cols=["rid"], right_tiebreak="rid")
    got = {r.lid: r.asof_rid for r in out.collect()}

    j = (left.alias("l").join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("r.ts") <= F.col("l.ts")), "left")
         .groupBy("l.lid")
         .agg(F.max(F.struct(F.col("r.ts"), F.col("r.rid"))).alias("m"))
         .select("lid", F.col("m.rid").alias("rid")))
    exp = {r.lid: r.rid for r in j.collect()}
    assert got == exp
