"""Temporal-statistics pipeline — the ORDER-STRUCTURE story composing
the wave-32..35 operators with the validation engine:

1. discover: scan the autocorrelation at every candidate lag
   (``discover_period``) and find each event type's dominant period —
   no declared rhythm needed, the data names its own;
2. bootstrap: pin an ``x-seasonality`` floor at the discovered lag from
   the trusted snapshot's own worst group (``suggest_seasonality_floor``)
   and prove the suite passes the snapshot it was learned from;
3. gate: one suite carrying the temporal family — the bootstrapped
   ``x-seasonality`` floor, an ``x-correlation {"lag"}`` lead-lag gate
   (the effect column must track its driver as it stood 3 steps
   earlier), and an ``x-trend`` rate envelope — and show a
   deterministically aperiodic arm ('error' keeps the raw noise) is the
   ONLY thing it trips;
4. symmetry: validate a derived transfer table with ``x-reciprocal`` —
   every (payer, payee) posting must have its (payee, payer) mirror;
   seeded defectors (every 17th user posts to the wrong counterparty)
   surface as one-way canonical cells.

Every gate number is DuckDB-oracled in the driver mirror
(engine_seasonality_violations, engine_leadlag_violations,
profile_discover_period, engine_reciprocal_violations,
engine_trend_violations). Run:
``python examples/temporal_statistics_pipeline.py [sf_dir]``. Tested by
tests/test_example_temporal_stats.py at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window, functions as F


def run_pipeline(spark: SparkSession, sf_dir: str) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.profile import (
        suggest_seasonality_floor,
    )
    from jsonschema_valid_spark.operators.seasonality import (
        discover_period,
    )

    out: dict = {}

    # the shared fixture derivation: a period-5 sawtooth (amplitude 80,
    # ~2x the value noise) per event type, EXCEPT 'error' which keeps
    # the raw aperiodic series; w is the driver, c reproduces w's
    # periodic part 3 steps later (the lead-lag pair)
    w = Window.partitionBy("event_type").orderBy("event_id")
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .where(F.col("event_type").isNotNull()
                 & F.col("value").isNotNull())
          .withColumn("rn", F.row_number().over(w))
          .withColumn("ts_h",
                      F.unix_micros(F.col("ts").cast("timestamp"))
                      / F.lit(3.6e9))
          .withColumn("pv", F.when(F.col("event_type") == "error",
                                   F.col("value"))
                      .otherwise(F.col("value")
                                 + 80 * (F.col("rn") % 5)
                                 .cast("double")))
          .withColumn("wv", F.col("value")
                      + 80 * (F.col("rn") % 5).cast("double"))
          .withColumn("cv", F.when(F.col("event_type") == "error",
                                   0.5 * F.col("value"))
                      .otherwise(0.5 * F.col("value")
                                 + 80 * ((F.col("rn") + 2) % 5)
                                 .cast("double"))))

    # 1. discover — the healthy types name their own period
    healthy = ev.where(F.col("event_type") != "error")
    best = discover_period(healthy, "pv", key="event_id",
                           order_by="event_id", max_lag=8,
                           by="event_type", best_only=True).collect()
    out["discovered"] = {r["group"]: r["lag"] for r in best}
    period = max(set(r["lag"] for r in best),
                 key=[r["lag"] for r in best].count)
    out["period"] = period

    # 2. bootstrap — floor learned from the trusted (healthy) snapshot
    node = suggest_seasonality_floor(healthy, "pv", key="event_id",
                                     order_by="event_id", lag=period,
                                     by="event_type")
    out["floor"] = node["min"]
    assert CheckSuite({"properties": {"pv": {"x-seasonality": node}}}) \
        .run(healthy, key="event_id").ok()

    # 3. gate — the temporal family in ONE suite over the FULL feed
    # (error arm included): rhythm + lead-lag + rate envelope
    gate = CheckSuite({"properties": {
        "pv": {"x-seasonality": node},
        "cv": {"x-correlation": {"with": "wv", "by": "event_type",
                                 "min": 0.5, "lag": 3,
                                 "orderBy": "event_id"}},
        "value": {"x-trend": {"orderBy": "ts_h", "by": "event_type",
                              "min": -0.004, "max": 0.004}},
    }})
    res = gate.run(ev, key="event_id")
    viols = res.violations.collect()
    out["gate_violations"] = len(viols)
    out["gate_tripped"] = sorted({(r["check_id"].split("/")[-1],
                                   r["doc_id"]) for r in viols})

    # 4. symmetry — a transfer table where postings must mirror:
    # payer u -> payee partner(u) with partner(partner(u)) == u, except
    # every 17th user defects to partner+2 (one-way cells)
    transfers = (ev.select(
        F.col("user_id").alias("payer"),
        F.expr("CASE WHEN user_id % 17 = 0 THEN "
               "  CASE WHEN user_id % 2 = 0 THEN user_id + 3 "
               "       ELSE user_id + 1 END "
               "WHEN user_id % 2 = 0 THEN user_id + 1 "
               "ELSE user_id - 1 END").alias("payee"),
        "event_id"))
    sym = CheckSuite({"properties": {"payer": {"x-reciprocal": {
        "with": "payee"}}}}).run(transfers, key="event_id")
    out["one_way_cells"] = sym.violations.count()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    for k, v in run_pipeline(spark, sf).items():
        print(f"{k}: {v}")
    spark.stop()
