"""Ingest-hygiene pipeline — the CORPUS-INTAKE story composing the
round-4 wave-15 operators end to end:

0. pre-flight (r5): ``schema_report`` audits the batch's schema against
   the intake contract (zero data-scale jobs), and ``x-referential
   {"coverageMin"}`` gates domain-side coverage — the silently-missing
   slice membership can't see;
1. identity: resolve re-registered records with blocked linkage and keep
   one row per entity (``operators/linkage.py`` — typo'd duplicates under
   fresh keys, the channel exact x-unique cannot see);
2. dominance: gate the deduped feed on value-share caps — global
   (language flood) and per-group (stuck client) — via ``x-maxFrequency``
   (``operators/frequency.py``);
3. contamination: drop documents whose EMBEDDING sits on top of a
   benchmark item (``semantic_decontamination`` — the paraphrase channel
   n-gram overlap misses), after the n-gram pass;
4. shape: law-check the sharding gate with ``x-distribution`` (a biased
   gate skews every downstream sample), then
5. layout: write range-sorted parquet so later n_tok-range scans skip
   files (``sources/bucketing.write_range_layout``), plus length-bucketed
   batch assignments for the padded-training loader
   (``functions/packing.length_bucketed_batches``).

Every stage is the scale-safe variant: equi-join blocking with the skew
guard, single-scan dominance counts, broadcast benchmark meeting, footer
min/max skip evidence. Run: ``python examples/ingest_hygiene_pipeline.py
[sf_dir] [work_dir]``. Tested by tests/test_example_pipeline.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def run(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.functions.decontamination import (
        semantic_decontaminate,
    )
    from jsonschema_valid_spark.functions.packing import (
        length_bucketed_batches,
        padding_stats,
    )
    from jsonschema_valid_spark.operators.linkage import (
        link_clusters,
        link_records,
    )
    from jsonschema_valid_spark.sources.bucketing import (
        file_range_stats,
        write_range_layout,
    )
    from jsonschema_valid_spark.sources.sequences import load_sequences

    out: dict = {}

    # --- 0. pre-flight (r5): audit the batch's SCHEMA against the intake
    # contract before any data-scale job — the whole gap list at once
    # (schema_report never throws; bind would refuse at the first), then
    # gate domain-side coverage: membership can't see a silently-missing
    # slice (an EMPTY feed passes it), coverageMin can ---
    from jsonschema_valid_spark.operators.schema_audit import (
        schema_ok,
        schema_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    contract = {
        "required": ["doc_id", "text"],
        "properties": {"doc_id": {"type": "integer"},
                       "text": {"type": "string"},
                       "lang": {"type": "string"},
                       "source": {"type": "string"},
                       "n_chars": {"type": "integer"}},
    }
    out["schema_ok"] = schema_ok(contract, docs)
    out["schema_findings"] = schema_report(contract, docs).count()
    # the intake contract DECLARES the expected slices; 'ja' is licensed
    # but not yet live, so the bar sits at 5/6 — if any live language
    # stops arriving the same gate trips
    res0 = CheckSuite({"properties": {"lang": {"x-referential": {
        "domain": ["en", "de", "es", "fr", "zh", "ja"],
        "coverageMin": 0.83,
    }}}}).run(docs, key="doc_id")
    cov_row = res0.verdicts.where(
        "check_id like '%/coverage'").first()
    out["coverage_ok"] = bool(cov_row["passed"])
    out["coverage"] = round(float(cov_row["metric_value"]), 4)

    # --- 1. identity: fold re-registered customers to one entity row ---
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    twins = cust.where(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.expr("substr(c_name, 1, length(c_name) - 1)").alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment")
    dirty = cust.unionByName(twins)
    pairs = link_records(
        dirty, "c_custkey",
        fields=[
            {"column": "c_name", "method": "levenshtein", "weight": 0.5},
            {"column": "c_acctbal", "method": "exact", "weight": 0.25},
            {"column": "c_mktsegment", "method": "exact", "weight": 0.25},
        ],
        block_on="c_nationkey", threshold=0.8)
    entities = link_clusters(dirty, "c_custkey", pairs)
    resolved = (dirty.join(entities, dirty["c_custkey"] == entities["id"])
                .where(F.col("id") == F.col("cluster_id"))
                .drop("id", "cluster_id"))
    out["records_in"] = dirty.count()
    out["entities"] = resolved.count()

    # --- 2 + 4. dominance and law gates as ONE declarative suite ---
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    gated = docs.withColumn(
        "shard_gate", ((F.col("doc_id") * 61) % 100).cast("double"))
    suite = CheckSuite({"properties": {
        "lang": {"x-maxFrequency": {"maxFraction": 0.9}},
        "source": {"x-maxFrequency": {"maxFraction": 0.9, "by": "lang"}},
        "shard_gate": {"x-distribution": {
            "family": "uniform", "min": 0, "max": 100,
            "bucketWidth": 10.0, "ksMax": 0.1}},
    }})
    res = suite.run(gated, key="doc_id")
    out["gates_ok"] = res.ok()

    # --- 3. semantic decontamination against a benchmark set ---
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.where(F.col("vec_id") % 41 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x, i: x * F.when(i % 8 == 0, F.lit(1.2))
                    .otherwise(F.lit(1.0))).alias("embedding"))
    clean = semantic_decontaminate(emb, bench, key="vec_id",
                                   vec_col="embedding", dim=64,
                                   threshold=0.9, n_assign=4)
    out["vectors_in"] = emb.count()
    out["vectors_clean"] = clean.count()

    # --- 5. layout + batches for the training loader ---
    seq = load_sequences(spark, sf_dir).select("doc_id", "n_tok", "source")
    layout_dir = f"{work_dir}/sequences_by_ntok"
    write_range_layout(seq, layout_dir, "n_tok", n_files=8)
    out["layout_files"] = len(file_range_stats(layout_dir, "n_tok"))
    batches = length_bucketed_batches(
        load_sequences(spark, sf_dir), "doc_id", "n_tok",
        batch_size=32, edges=[40.0, 72.0, 104.0], shards=2)
    out["padding_efficiency"] = float(
        padding_stats(batches, "n_tok").first()["efficiency"])
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ingest_hygiene"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("ingest-hygiene").getOrCreate())
    print(run(spark, sf_dir, work_dir))
    spark.stop()
