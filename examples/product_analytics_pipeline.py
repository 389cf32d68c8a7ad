"""Product-analytics pipeline — the EVENT-STREAM story composing the
wave-6/7/8 temporal operators with the validation engine:

1. gate: validate the raw event feed — schema basics plus the temporal
   invariants (``x-eventOrder`` causality, ``x-session`` bounds,
   ``x-outlier`` IQR envelopes, categorical ``x-drift`` of the
   event-type mix) — and quarantine nothing silently;
2. enrich: as-of join every event to the user's most recent purchase
   (``asof_join`` — one Exchange, fan-out-independent) and attribute
   clicks to purchase windows (``interval_point_join`` — binned
   equi-join, never a theta-join);
3. frame: gap sessionization + per-session roll-ups
   (``sessionize``/``session_stats`` — single shared partitioning);
4. measure: ordered funnel conversion and weekly cohort retention
   (``funnel``/``retention_cohorts``).

Every stage is the scale-safe variant and every number it prints is
DuckDB-oracled in the driver mirror (events_asof_purchase,
events_click_attribution, events_session_stats, events_funnel,
events_retention, engine_session_violations,
engine_eventorder_violations). Run:
``python examples/product_analytics_pipeline.py [sf_dir]``. Tested by
tests/test_example_product_analytics.py at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def run_pipeline(spark: SparkSession, sf_dir: str) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.funnel import (
        funnel,
        retention_cohorts,
    )
    from jsonschema_valid_spark.operators.temporal import (
        asof_join,
        interval_point_join,
        session_stats,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. gate — one suite carries the row basics AND the temporal
    #    invariants; violations are enumerable, verdicts auditable.
    suite = CheckSuite({
        "required": ["event_id", "ts", "user_id", "event_type"],
        "properties": {
            "event_type": {
                "enum": ["click", "view", "signup", "purchase", "error"],
            },
            "value": {"x-outlier": {
                "by": "event_type", "method": "iqr", "iqrK": 3.0}},
            "ts": {
                "x-eventOrder": {
                    "by": "user_id", "first": "event_type = 'signup'",
                    "then": "event_type = 'purchase'"},
                "x-session": {
                    "by": "user_id", "gapSeconds": 14400,
                    "maxEvents": 50, "maxDurationSeconds": 172800},
            },
        },
    })
    gate = suite.run(events, key="event_id")
    n_viol = gate.violations.count()

    # 2. enrich — point-in-time purchase state on every event, plus
    #    click -> purchase-window attribution.
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id"))
    enriched = asof_join(events, purchases, on="user_id", left_ts="ts",
                         right_cols=["event_id"],
                         right_tiebreak="event_id", prefix="p_")
    n_matched = enriched.where(F.col("p_event_id").isNotNull()).count()

    m = F.unix_micros(F.col("ts").cast("timestamp"))
    windows = purchases.withColumn(
        "w_end", F.timestamp_micros(m + 21600 * 1000000))
    attributed = interval_point_join(
        events.where(F.col("event_type") == "click"), windows,
        point_col="ts", start_col="ts", end_col="w_end", by="user_id",
        bin_width_seconds=3600.0, interval_cols=["event_id"],
        prefix="p_")
    n_attributed = attributed.count()

    # 3. frame — sessions and their roll-ups.
    sessions = session_stats(events, key="user_id", ts="ts",
                             gap_seconds=14400.0,
                             order_tiebreak="event_id")
    n_sessions = sessions.count()

    # 4. measure — conversion and retention.
    steps = [("signup", "event_type = 'signup'"),
             ("view", "event_type = 'view'"),
             ("purchase", "event_type = 'purchase'")]
    conv = {r.step_name: r.n_converted
            for r in funnel(events, key="user_id", ts="ts", steps=steps,
                            within_seconds=86400.0).collect()}
    cohorts = retention_cohorts(events, key="user_id", ts="ts")
    n_cells = cohorts.count()

    return {
        "violations": n_viol,
        "gate_ok": gate.ok(),
        "asof_matched": n_matched,
        "attributed_clicks": n_attributed,
        "sessions": n_sessions,
        "funnel": conv,
        "retention_cells": n_cells,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("product-analytics-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        out = run_pipeline(spark, sf_dir)
        for k, v in out.items():
            print(f"{k}: {v}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
