"""Star-schema validation — the MULTI-TABLE story: one declarative suite
per fact table proves the whole schema's RELATIONSHIPS, not just each
table's own columns, using the ``@name`` context seam:

* ``orders`` — every ``o_custkey`` must exist in the customer dimension
  (``x-referential``, broadcast anti-join: the dimension is the small
  side by construction) and ``o_totalprice`` must equal the per-order
  lineitem rollup (``x-aggConsistency`` — the child collapses to one row
  per key BEFORE any join);
* ``lineitem`` — foreign keys to orders via the BLOOM referential mode
  (the parent table is too big to broadcast at scale: build an m-bit
  filter in Spark, probe as pure codegen — zero fact-side shuffle;
  Bloom-certain violations, ~FPR of true violations unreported) and to
  the part/supplier dimensions via the exact broadcast mode; composite
  row identity (l_orderkey, l_linenumber) via ``x-unique``;
* cardinality sanity — every order carries [1, 10] lineitems
  (``x-rowCount`` on the child keyed by l_orderkey).

Run: ``python examples/star_schema_pipeline.py [sf_dir]``. Tested by
tests/test_example_pipeline.py (known violation counts at sf0.001).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def run(spark: SparkSession, sf_dir: str) -> dict:
    from jsonschema_valid_spark import CheckSuite

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")

    out: dict = {}

    orders_suite = CheckSuite({"properties": {
        "o_custkey": {"x-referential": {
            "domain": "@customer", "domainColumn": "c_custkey"}},
        "o_totalprice": {
            "minimum": 0,
            "x-aggConsistency": {
                "child": "@lineitem", "key": "o_orderkey",
                "childKey": "l_orderkey",
                "childAgg": ("CAST(round(sum(l_extendedprice * "
                             "(1 - l_discount) * (1 + l_tax)), 2) "
                             "AS DECIMAL(18,2))"),
                "parentExpr": "CAST(o_totalprice AS DECIMAL(18,2))",
                "tol": 0.01}},
    }})
    ores = orders_suite.run(
        orders, key="o_orderkey",
        context={"customer": customer, "lineitem": lineitem})
    out["orders_fk_violations"] = ores.violations.where(
        F.col("check_id").contains("x-referential")).count()
    out["orders_rollup_mismatches"] = ores.violations.where(
        F.col("check_id").contains("x-aggConsistency")).count()

    li_key = lineitem.withColumn(
        "line_id", F.concat_ws(":", "l_orderkey", "l_linenumber"))
    lineitem_suite = CheckSuite({"properties": {
        "l_orderkey": {
            "x-referential": {
                "domain": "@orders", "domainColumn": "o_orderkey",
                "mode": "bloom", "mBits": 1 << 18, "k": 5},
            "x-rowCount": {"min": 1, "max": 16}},
        "l_partkey": {"x-referential": {
            "domain": "@part", "domainColumn": "p_partkey"}},
        "l_suppkey": {"x-referential": {
            "domain": "@supplier", "domainColumn": "s_suppkey"}},
        "line_id": {"x-unique": True},
        "l_discount": {"minimum": 0, "maximum": 1},
    }})
    lres = lineitem_suite.run(
        li_key, key="line_id",
        context={"orders": orders, "part": part, "supplier": supplier})
    out["lineitem_ok"] = lres.ok()
    out["lineitem_violations"] = lres.violations.count()
    out["lineitem_failed_checks"] = sorted(
        r["check_id"] for r in lres.verdicts
        .where("passed = false").select("check_id").distinct().collect())
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("star-schema-validation").getOrCreate())
    print(run(spark, sf_dir))
    spark.stop()
