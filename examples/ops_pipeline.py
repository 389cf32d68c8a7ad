"""Operational validation pipeline — the NIGHTLY-RUN story composing the
round-4 ops operators:

1. bootstrap: profile the table once, materialize the suggested suite
   (``operators/profile.py``) — nobody hand-writes the first CheckSuite;
2. validate: checkpointed per-partition run with lineage + metrics
   recording (``checkpoint.py`` + ``operators/anomaly.MetricsHistory``);
3. watch: flag tonight's metrics against the trailing run history —
   run-over-run drift that absolute thresholds can't see;
4. prove a rewrite: reconcile the validated table against its compacted
   copy, summary-first, drilling down only into flagged groups
   (``operators/reconcile.py``).

Every stage is the scale-safe variant: one-pass profile, per-partition
pruned validation slices, group-level reconciliation summaries. Run:
``python examples/ops_pipeline.py [sf_dir] [work_dir]``. Tested by
tests/test_example_pipeline.py at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F


def nightly(spark: SparkSession, sf_dir: str, work_dir: str,
            run_seq: int) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.checkpoint import CheckpointRunner
    from jsonschema_valid_spark.operators.anomaly import MetricsHistory
    from jsonschema_valid_spark.operators.profile import suite_from_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. bootstrap the suite from the data itself (first run only, in a
    #    real deployment the suggested spec is reviewed and committed)
    spec = suite_from_profile(docs, key="doc_id")
    suite = CheckSuite(spec)

    # 2. checkpointed, metric-recording validation run
    hist = MetricsHistory(f"{work_dir}/metrics")
    runner = CheckpointRunner(suite, f"{work_dir}/run{run_seq}")
    summary = runner.run(docs, partition_by="source", key="doc_id",
                         metrics_history=hist, run_seq=run_seq)

    return {"suite": spec, "summary": summary,
            "violations": runner.violations(spark)}


def prove_rewrite(spark: SparkSession, original: DataFrame,
                  rewritten: DataFrame, group_by: str,
                  compare_cols: list[str]) -> dict[str, DataFrame]:
    from jsonschema_valid_spark.operators.reconcile import (
        reconcile_summary,
        table_diff,
    )

    summary = reconcile_summary(original, rewritten, group_by, compare_cols)
    flagged = [r["grp"] for r in
               summary.where("status != 'ok'").select("grp").collect()]
    diff = (table_diff(original, rewritten, "doc_id", compare_cols,
                       groups=(group_by, flagged))
            if flagged else None)
    return {"summary": summary, "flagged": flagged, "diff": diff}


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    work = argv[2] if len(argv) > 2 else "/tmp/jvs-ops-pipeline"
    spark = (SparkSession.builder.master("local[8]")
             .appName("ops-pipeline")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    out = nightly(spark, sf_dir, work, run_seq=1)
    print("partitions:", len(out["summary"].processed),
          "violations:", out["violations"].count(),
          "anomalies:", out["summary"].anomalies)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rewritten = docs.repartition(4)   # a faithful rewrite
    rec = prove_rewrite(spark, docs, rewritten, "source",
                        ["doc_id", "text", "lang", "source", "n_chars"])
    print("rewrite flagged groups:", rec["flagged"])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
