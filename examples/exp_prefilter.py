"""A/B experiment: row-pass violation construction with and without a
boolean pre-filter gating the struct-array build (guide §2.2 — shuffle/
compute fewer bytes; here: compute fewer structs).

A = current shape:  select(explode(array_compact(array(when(...)))))
B = prefilter:      where(any_fail).select(explode(array_compact(...)))

Results must be identical (rows with no failure emit nothing either way).
Run: python examples/exp_prefilter.py
"""
from __future__ import annotations

import functools
import operator
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import make_spark, flagship_suite, materialize_input  # noqa: E402
from jsonschema_valid_spark import CheckSuite  # noqa: E402
from jsonschema_valid_spark.engine import bind, _inline_referential  # noqa: E402


def main():
    spark = make_spark()
    spark.sparkContext.setJobDescription("exp_prefilter")
    seq = spark.read.parquet(materialize_input(spark, 2_000_000))
    domain = [f"src{i}" for i in range(1, 21)]
    suite = CheckSuite(flagship_suite(domain))
    plan = bind(suite, seq)
    _inline_referential(plan, {})

    structs, fails = [], []
    for rc in plan.row_checks:
        failed = ~F.coalesce(rc.pred, F.lit(True))
        fails.append(failed)
        ipath = (rc.instance_path if rc.instance_path is not None
                 else F.lit(rc.check_id))
        structs.append(F.when(failed, F.struct(
            F.lit(rc.check_id).alias("check_id"),
            F.coalesce(rc.observed.cast("string"), F.lit("NULL")).alias("observed"),
            F.lit(rc.expected).alias("expected"),
            F.coalesce(ipath, F.lit(rc.check_id)).alias("instance_path"),
        )))
    arr = F.array_compact(F.array(*structs))
    any_fail = functools.reduce(operator.or_, fails)

    def run_a():
        return (seq.select(F.col("doc_id").cast("string").alias("doc_id"),
                           F.explode(arr).alias("v"))
                .select("doc_id", "v.*").count())

    def run_b():
        return (seq.where(any_fail)
                .select(F.col("doc_id").cast("string").alias("doc_id"),
                        F.explode(arr).alias("v"))
                .select("doc_id", "v.*").count())

    # warm both
    na, nb = run_a(), run_b()
    assert na == nb, (na, nb)
    print(f"violations: A={na} B={nb} (equal)")

    ta, tb = [], []
    for rep in range(7):
        t0 = time.perf_counter(); run_a(); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_b(); tb.append(time.perf_counter() - t0)
    print("A current  :", [round(x, 3) for x in ta], "min", round(min(ta), 3))
    print("B prefilter:", [round(x, 3) for x in tb], "min", round(min(tb), 3))
    spark.stop()


if __name__ == "__main__":
    main()
