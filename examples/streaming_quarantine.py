"""Validation-on-ingest: stream sequences, route violating rows to a
quarantine sink and clean rows to the main table, with windowed verdicts to
a metrics sink — the streaming deploy shape for a training-data pipeline.

Run: spark-submit --py-files jsonschema_valid_spark.zip examples/streaming_quarantine.py <in> <out>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.streaming.checks import (
    quarantine_router,
    stream_row_violations,
    stream_windowed_verdicts,
)

SUITE = CheckSuite({
    "version": 7,
    "required": ["doc_id", "tokens", "n_tok"],
    "properties": {
        "tokens": {"minItems": 1,
                   "items": {"minimum": 0, "exclusiveMaximum": 50257}},
        "n_tok": {"minimum": 1, "x-nullRate": {"max": 0.01}},
    },
    "x-rowExpr": "n_tok = size(tokens)",
})


# the router IS the batch splitter: quarantine_router wraps
# engine.split_valid per micro-batch (one shared code path — the streaming
# and batch quarantine semantics cannot drift apart)

if __name__ == "__main__":
    in_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("quarantine").getOrCreate()
    schema = ("doc_id string, tokens array<int>, n_tok int, source string, "
              "ts timestamp")
    sdf = spark.readStream.schema(schema).parquet(in_dir)

    q1 = (sdf.writeStream.foreachBatch(quarantine_router(SUITE, out_dir))
          .option("checkpointLocation", f"{out_dir}/_ckpt_router")
          .trigger(availableNow=True).start())

    # NB: append-mode windows only emit once the watermark passes their end;
    # for a bounded availableNow backfill use a tight watermark so every
    # window finalizes before the stream ends (a live 24/7 ingest would use
    # the real lateness bound, e.g. "5 minutes")
    verd = stream_windowed_verdicts(SUITE, sdf, "ts", "1 minute", "0 seconds")
    q2 = (verd.writeStream.format("parquet")
          .option("path", f"{out_dir}/verdicts")
          .option("checkpointLocation", f"{out_dir}/_ckpt_verdicts")
          .outputMode("append").trigger(availableNow=True).start())

    viol = stream_row_violations(SUITE, sdf, key="doc_id")
    q3 = (viol.writeStream.format("parquet")
          .option("path", f"{out_dir}/violations")
          .option("checkpointLocation", f"{out_dir}/_ckpt_violations")
          .outputMode("append").trigger(availableNow=True).start())

    for q in (q1, q2, q3):
        q.awaitTermination()
    spark.stop()
