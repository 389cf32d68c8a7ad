"""Metric-quality pipeline — the RATE-AND-IDENTITY story composing the
wave-17..25 operators with the validation engine:

1. gate: validate the metric feed with the statistical rate family —
   ``x-trend`` (per-type OLS slope of value vs time must stay within
   +/-0.004/hour), ``x-compliance`` (>= 61% of events per type must
   carry value > 25 — the error budget), ``x-distinctRatio`` (event ids
   must not fan out), ``x-funnel`` (signup -> view -> purchase
   conversion-rate floors), plus Benford first-digit goodness-of-fit on
   order totals (``x-distribution`` family=benford);
2. resolve: link re-registered customer twins (blocked candidates +
   weighted field scores + connected components) and MERGE each entity
   cluster to ONE golden record (latest-wins name, max balance,
   deterministic modal segment);
3. lay out: write the validated events z-ordered on (user_id, value) so
   BOTH columns prune files, and prove the 2-D box probe touches a
   fraction of the files;
4. operate: checkpointed per-partition validation with
   ``verify_content=True`` — append late rows to one partition and show
   the resume INVALIDATES and revalidates exactly that partition
   instead of keeping stale verdicts.

Every gate number is DuckDB-oracled in the driver mirror
(engine_trend_violations, engine_compliance_violations,
engine_distinct_ratio_violations, engine_funnel_violations,
dist_benford_totalprice, link_customer_golden). Run:
``python examples/metric_quality_pipeline.py [sf_dir]``. Tested by
tests/test_example_metric_quality.py at sf0.001.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def run_pipeline(spark: SparkSession, sf_dir: str,
                 work_dir: str | None = None) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.checkpoint import CheckpointRunner
    from jsonschema_valid_spark.operators.linkage import (
        link_clusters,
        link_records,
        merge_clusters,
    )
    from jsonschema_valid_spark.sources.bucketing import (
        files_matching_box,
        write_zorder_layout,
    )

    work = work_dir or tempfile.mkdtemp(prefix="metric_quality_")
    out: dict = {}

    # 1. gate — the statistical rate family in ONE suite: each check is
    # a single map-side-combined aggregate (trend/compliance/ratio), the
    # funnel is the k-chained-window plan, benford one digit histogram
    events = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .withColumn("ts_h",
                          F.unix_micros(F.col("ts").cast("timestamp"))
                          / F.lit(3.6e9)))
    gate = CheckSuite({"properties": {
        "value": {
            "x-trend": {"orderBy": "ts_h", "by": "event_type",
                        "min": -0.004, "max": 0.004},
            "x-compliance": {"expr": "value > 25.0", "min": 0.61,
                             "by": "event_type", "minCount": 5},
        },
        "event_id": {"x-distinctRatio": {"min": 0.999}},
        "event_type": {"x-funnel": {
            "key": "user_id", "ts": "ts",
            "steps": [
                {"name": "signup", "when": "event_type = 'signup'"},
                {"name": "view", "when": "event_type = 'view'"},
                {"name": "purchase", "when": "event_type = 'purchase'"},
            ],
            "minRates": [0.4, 0.5], "withinSeconds": 86400}},
    }})
    res = gate.run(events, key="event_id")
    viols = res.violations.collect()
    out["gate_violations"] = len(viols)
    out["gate_checks_tripped"] = sorted(
        {r["check_id"].split("/")[-1] for r in viols})

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    benford = CheckSuite({"properties": {"o_totalprice": {
        "x-distribution": {"family": "benford", "psiMax": 0.05,
                           "chi2Max": 0.05}}}}).run(
        orders, key="o_orderkey")
    out["benford_passed"] = benford.ok()  # range-capped prices fail

    # 2. resolve — linkage + golden-record survivorship
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    twins = cust.where(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.expr("substr(c_name, 1, length(c_name) - 1)").alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment")
    allr = cust.unionByName(twins)
    fields = [
        {"column": "c_name", "method": "levenshtein", "weight": 0.5},
        {"column": "c_acctbal", "method": "exact", "weight": 0.25},
        {"column": "c_mktsegment", "method": "exact", "weight": 0.25},
    ]
    pairs = link_records(allr, "c_custkey", fields,
                         block_on="c_nationkey", threshold=0.8)
    clusters = link_clusters(allr, "c_custkey", pairs)
    golden = merge_clusters(
        allr, "c_custkey", clusters,
        rules={"c_name": "latest", "c_acctbal": "max",
               "c_mktsegment": "most_frequent"},
        order_by="c_custkey")
    out["records_in"] = allr.count()
    out["golden_records"] = golden.count()
    out["merged_entities"] = golden.where(F.col("n_members") > 1).count()

    # 3. lay out — z-order the validated events on (user_id, value)
    z_path = f"{work}/events_zorder"
    write_zorder_layout(events.select("event_id", "user_id", "value"),
                        z_path, ["user_id", "value"], n_files=8)
    n_files = len([f for f in os.listdir(z_path)
                   if f.endswith(".parquet")])
    hit = files_matching_box(z_path, {"user_id": (3, 5),
                                      "value": (10.0, 30.0)})
    out["zorder_files"] = n_files
    out["zorder_box_files"] = len(hit)

    # 4. operate — verify_content resume catches the late append
    ckpt = f"{work}/ckpt"
    in_path = f"{work}/feed"
    feed = events.select("event_id", "event_type", "value")
    feed.write.mode("overwrite").parquet(in_path)
    runner = CheckpointRunner(
        CheckSuite({"properties": {"value": {"minimum": 0}}}), ckpt)
    s1 = runner.run(spark.read.parquet(in_path), "event_type",
                    key="event_id", verify_content=True)
    out["partitions_validated"] = len(s1.processed)
    spark.createDataFrame([(999_999_999, "click", -1.0)], feed.schema) \
        .write.mode("append").parquet(in_path)
    s2 = runner.run(spark.read.parquet(in_path), "event_type",
                    key="event_id", verify_content=True)
    out["partitions_invalidated"] = s2.invalidated
    out["late_violations"] = runner.violations(spark).count()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    for k, v in run_pipeline(spark, sf).items():
        print(f"{k}: {v}")
    spark.stop()
