"""Sequence-integrity pipeline — the PIPELINE-INTEGRITY keyword family
composed into one declarative suite over an event/sequence feed:

* ``x-tokenShape``  — token arrays carry BOS/EOS where the trainer expects
  them, no forbidden ids, padding only as a trailing run (fused row pass);
* ``x-monotonic``   — a per-entity cumulative metric never runs backwards
  along its declared timeline (window lag, perGroup verdicts);
* ``x-rowCount``    — each entity contributed roughly the right number of
  rows (count aggregate, perGroup verdicts);
* ``x-freshness``   — every entity kept reporting up to the declared run
  instant (max-ts aggregate, perGroup verdicts);
* exemplar capping  — the violations sink holds k deterministic exemplars
  per check; FULL counts live in the per-group verdicts.

One suite, one ``run()``: the row checks fuse into a single projection;
each dataset check is one aggregate/window pass on its own key. The
verdict output is the per-partition pass/fail enumeration (every group,
passing ones included) that an orchestrator gates on.

Run: ``python examples/sequence_integrity_pipeline.py [sf_dir]``.
Tested by tests/test_example_sequence_integrity.py at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def run_pipeline(spark: SparkSession, sf_dir: str) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.sources.sequences import load_sequences

    # --- sequence-structure checks over the tokenized table -------------
    seq = load_sequences(spark, sf_dir).withColumn(
        "tokens",
        F.expr("array(50300) || tokens || array(50301)"))  # frame BOS/EOS
    shape_suite = CheckSuite({
        "properties": {"tokens": {"x-tokenShape": {
            "startsWith": [50300], "endsWith": [50301],
            "forbidden": [-5], "pad": 50301}}},
        "x-rowExpr": "n_tok + 2 = size(tokens)",
    })
    shape = shape_suite.run(seq, key="doc_id")
    shape_exemplars = shape.exemplars(k=5).collect()
    shape_verdicts = {r["check_id"]: r["passed"]
                      for r in shape.verdicts.collect()}

    # --- feed-integrity checks over the event stream ---------------------
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("value", F.col("value").cast("decimal(10,2)"))
    )
    feed_suite = CheckSuite({"properties": {
        "value": {"x-monotonic": {
            "orderBy": "ts", "by": "user_id", "verdicts": "perGroup"}},
        "user_id": {"x-rowCount": {
            "min": 40, "max": 100, "verdicts": "perGroup"}},
        "ts": {"x-freshness": {
            "asOf": "2024-01-31 00:00:00", "maxAgeHours": 1.0,
            "by": "event_type", "verdicts": "perGroup"}},
    }})
    feed = feed_suite.run(events, key="event_id")
    verdicts = feed.verdicts.collect()
    by_check: dict = {}
    for r in verdicts:
        ck = r["check_id"].split("/")[-1]
        d = by_check.setdefault(ck, {"groups": 0, "failed": 0})
        d["groups"] += 1
        d["failed"] += 0 if r["passed"] else 1
    feed_exemplars = feed.exemplars(k=5).collect()

    return {
        "shape_ok": all(shape_verdicts.values()),
        "shape_exemplars": len(shape_exemplars),
        "feed_checks": by_check,
        "feed_exemplars": len(feed_exemplars),
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .appName("sequence-integrity").getOrCreate())
    print(run_pipeline(s, sf))
    s.stop()
