"""Incremental-ingest pipeline — the RESUME story composed end-to-end:
a 10^12-row table gains a day of partitions, and validation touches only
the appended day while still answering whole-table questions.

* ``StateStore`` + ``incremental_column_states`` (operators/states.py) —
  per-partition mergeable aggregate states: day 2's scan is pruned to
  day 2 (the NOT-IN filter is a pushed partition filter), yet the merged
  states finish into the SAME whole-table metrics a full rescan would
  produce (the monoid law).
* ``UniqueIndex`` + ``x-unique {"index": "@hist"}``
  (operators/unique_index.py) — historical uniqueness: day 2's batch is
  probed against the persisted distinct-id index instead of re-shuffling
  day 1; replayed ingest rows surface as collision violations naming the
  replayed id. ``extend()`` then folds day 2's genuinely-new ids into
  the index — idempotently, so a retried job inserts nothing.
* Both stores are INCREMENTAL RETRY-SAFE: re-running the day-2 step is a
  no-op (states: partition already seen; index: anti-join finds nothing
  new) — the checkpoint-commit contract at the aggregate level.

Run: ``python examples/incremental_ingest_pipeline.py [sf_dir]``.
Tested by tests/test_example_incremental_ingest.py at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def run_pipeline(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.states import (
        StateStore, column_states, incremental_column_states,
        merge_states, metrics_from_states)
    from jsonschema_valid_spark.operators.unique_index import UniqueIndex

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    split_ts = "2024-01-16 00:00:00"

    # ---- the ingest table: dt-partitioned parquet ----------------------
    table = f"{work_dir}/ingest"
    day1 = ev.where(F.col("ts") < split_ts)
    (day1.withColumn("dt", F.lit("d1"))
     .write.partitionBy("dt").mode("overwrite").parquet(table))

    # ---- day 1: validate, snapshot states, build the id history --------
    suite = CheckSuite({"properties": {
        "event_id": {"type": "integer", "x-unique": True},
        "value": {"minimum": 0},
    }})
    res1 = suite.run(spark.read.parquet(table), key="event_id")
    day1_ok = res1.ok()

    store = StateStore(f"{work_dir}/states")
    store.record(column_states(
        spark.read.parquet(table), ["user_id", "value"],
        partition_col="dt"))

    uidx = UniqueIndex("uix_ingest_example", "event_id", buckets=8)
    uidx.build(day1.select("event_id"))

    # ---- day 2 arrives: genuinely new rows PLUS a replayed slice -------
    day2_new = ev.where(F.col("ts") >= split_ts)
    replayed = day1.where(F.col("event_id") % 97 == 0)  # double-fired rows
    day2 = day2_new.unionByName(replayed)
    (day2.withColumn("dt", F.lit("d2"))
     .write.partitionBy("dt").mode("append").parquet(table))

    # ---- incremental validation of the APPEND only ---------------------
    batch = spark.read.parquet(table).where(F.col("dt") == "d2").drop("dt")

    # historical uniqueness: batch-internal dups AND day-1 collisions
    hist_suite = CheckSuite({"properties": {"event_id": {
        "x-unique": {"index": "@hist"}}}})
    res2 = hist_suite.run(batch, key="event_id", context={"hist": uidx})
    collisions = (res2.violations
                  .where(F.col("expected") == "unique incl. index")
                  .collect())
    replay_ids = {r[0] for r in replayed.select("event_id").collect()}
    caught_ids = {int(r["doc_id"]) for r in collisions}

    # aggregate states: scan ONLY d2, merge with day 1's stored states
    all_states = incremental_column_states(
        spark, spark.read.parquet(table), ["user_id", "value"],
        partition_col="dt", store=store)
    merged = metrics_from_states(merge_states(all_states))
    full = (spark.read.parquet(table)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("value").alias("mean_value")).collect()[0])
    m_value = {r["column"]: r for r in merged.collect()}["value"]
    states_match = (m_value["n"] == full["n"]
                    and abs(m_value["mean"] - full["mean_value"]) < 1e-9)

    # ---- fold day 2 into the history; retries are no-ops ---------------
    inserted = uidx.extend(batch)
    retried = uidx.extend(batch)
    seen_after = store.seen(spark)

    # ---- historical NEAR-dup membership (the fuzzy sibling) -------------
    # Yesterday's corpus is indexed ONCE as a bucketed MinHash band/
    # signature catalog; today's docs probe it through the layout —
    # history text is never re-paired or re-read. A near-copy of an
    # ingested doc (one word changed) surfaces as an x-nearDup violation
    # naming the historical doc; extend() folds today in idempotently.
    from jsonschema_valid_spark.operators.neardup_index import NearDupIndex

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist_docs = docs.where("doc_id % 2 = 0").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    ndx = NearDupIndex("ndx_ingest_example", num_perm=64, bands=16, n=2,
                       seed=42, buckets=8)
    ndx.build(hist_docs, "doc_id", "text")
    near_copy = (hist_docs.where("doc_id = '0'")
                 .select(F.lit("today-0").alias("doc_id"),
                         F.concat(F.col("text"), F.lit(" appended"))
                         .alias("text")))
    novel = spark.createDataFrame(
        [("today-1", " ".join(f"novel{i}" for i in range(30)))],
        "doc_id string, text string")
    today = near_copy.unionByName(novel)
    nd_suite = CheckSuite({"properties": {"text": {"x-nearDup": {
        "method": "minhash", "threshold": 0.5, "index": "@hist"}}}})
    nd_res = nd_suite.run(today, key="doc_id", context={"hist": ndx})
    nd_hits = {r["doc_id"]: r["observed"] for r in
               nd_res.violations.collect()
               if r["observed"].startswith("neardup of ")}
    nd_inserted = ndx.extend(today, "doc_id", "text")
    nd_retried = ndx.extend(today, "doc_id", "text")

    spark.sql("DROP TABLE IF EXISTS uix_ingest_example")
    spark.sql("DROP TABLE IF EXISTS ndx_ingest_example_bands")
    spark.sql("DROP TABLE IF EXISTS ndx_ingest_example_sigs")
    return {
        "day1_ok": day1_ok,
        "replays_caught": caught_ids == replay_ids and len(caught_ids) > 0,
        "n_replays": len(caught_ids),
        "states_match_full_rescan": states_match,
        "partitions_tracked": sorted(seen_after),
        "index_inserted": inserted,
        "index_retry_inserted": retried,
        "neardup_caught": ("today-0" in nd_hits
                           and nd_hits["today-0"].startswith(
                               "neardup of 0,")
                           and "today-1" not in nd_hits),
        "neardup_index_inserted": nd_inserted,
        "neardup_index_retry_inserted": nd_retried,
    }


if __name__ == "__main__":
    import tempfile

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    with tempfile.TemporaryDirectory() as wd:
        out = run_pipeline(spark, sf, wd)
    for k, v in out.items():
        print(f"{k}: {v}")
    spark.stop()
