"""Concurrent suite reuse — the analog of the reference's thread-sharing
example (/root/reference/examples/threaded.rs:5-23): one immutable compiled
CheckSuite validating several tables concurrently from driver threads.
Spark schedules the jobs in parallel across the same executor pool.

Run: spark-submit --py-files jsonschema_valid_spark.zip examples/concurrent_suites.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.sources.sequences import generate_sequences

SUITE = CheckSuite({
    "version": 7,
    "required": ["doc_id", "tokens", "n_tok"],
    "properties": {
        "tokens": {"minItems": 1,
                   "items": {"minimum": 0, "exclusiveMaximum": 50257}},
        "n_tok": {"minimum": 1},
    },
    "x-rowExpr": "n_tok = size(tokens)",
})


def validate_slice(df) -> int:
    # the compiled suite is immutable and shared — safe across driver threads
    return SUITE.run(df, key="doc_id").violations.count()


if __name__ == "__main__":
    spark = SparkSession.builder.appName("concurrent-suites").getOrCreate()
    tables = [generate_sequences(spark, 100_000).where(f"pmod(n_tok, 4) = {i}")
              for i in range(4)]
    with ThreadPoolExecutor(4) as pool:
        counts = list(pool.map(validate_slice, tables))
    print({"violations_per_slice": counts})
    spark.stop()
