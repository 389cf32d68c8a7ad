"""Training-prep pipeline over the tokenized `sequences` table — the
composition story for the POST-curation ops: source mixing to a token
budget → deterministic train/holdout split → concatenate-and-chunk packing
→ final validation gate before the write.

Complements ``examples/curation_pipeline.py`` (which curates raw
documents); this stage consumes validated sequences and produces the
batch-ready layout. Every stage is a lazy DataFrame transform; scale notes
inline.

Run: python examples/training_prep_pipeline.py [sf_dir] [out_dir]
Tested by tests/test_example_pipeline.py at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, functions as F


def prepare(spark: SparkSession, sf_dir: str,
            budget_tokens_per_source: float = 20_000.0,
            holdout_rate: float = 0.1,
            capacity: int = 2048) -> dict[str, DataFrame]:
    from jsonschema_valid_spark import CheckSuite, split_valid
    from jsonschema_valid_spark.functions.dedup import dedup_exact
    from jsonschema_valid_spark.functions.packing import (
        pack_sequences,
        packing_stats,
    )
    from jsonschema_valid_spark.functions.sampling import (
        mix_to_budget,
        train_holdout_split,
    )
    from jsonschema_valid_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, sf_dir).where(F.col("source").isNotNull())

    # 0. row-invariant quarantine gate (one fused predicate, no shuffle),
    #    then exact dedup on doc_id — the deterministic min-key survivor
    #    clears the duplicated-row corruption arm before the unique check
    gate = CheckSuite({
        "required": ["doc_id", "tokens", "n_tok"],
        "properties": {
            "n_tok": {"type": "integer", "minimum": 1},
            "tokens": {"items": {"minimum": 0}},
        },
        "x-rowExpr": "n_tok = size(tokens)",
    })
    clean, _quarantined = split_valid(gate, seq, key="doc_id")
    clean = dedup_exact(clean, "doc_id", "doc_id")

    # 1. source mixing: per-source keep rates from ONE dimension-sized
    #    aggregate, applied as a zero-shuffle hash-gate filter
    mixed = mix_to_budget(clean, "doc_id", "source", "n_tok",
                          budget_per_stratum=budget_tokens_per_source)

    # 2. train/holdout on the same deterministic gate family (different
    #    seed): disjoint, exhaustive, stable across reruns/resumes
    train, holdout = train_holdout_split(mixed, "doc_id", holdout_rate,
                                         seed=101)

    # 3. concatenate-and-chunk packing per source: one window shuffle,
    #    bin_id/bin_offset give each sequence its block address
    packed = pack_sequences(train, "doc_id", "n_tok", capacity,
                            partition_col="source")

    return {"mixed": mixed, "train": train, "holdout": holdout,
            "packed": packed,
            "stats": packing_stats(packed, "n_tok", partition_col="source")}


def validate_and_write(spark: SparkSession, packed: DataFrame,
                       out_dir: str, capacity: int = 2048) -> bool:
    """Gate the packed layout through a check suite (the engine validating
    its OWN pipeline's output): addresses in range, token invariant intact
    after all the filtering, doc_ids still unique. Write partitioned by
    source — the layout training shards read."""
    from jsonschema_valid_spark import CheckSuite

    suite = CheckSuite({
        "required": ["doc_id", "tokens", "n_tok", "bin_id", "bin_offset"],
        "properties": {
            "doc_id": {"type": "string", "x-unique": True},
            "n_tok": {"type": "integer", "minimum": 1},
            "bin_id": {"type": "integer", "minimum": 0},
            "bin_offset": {"type": "integer", "minimum": 0,
                           "exclusiveMaximum": capacity},
        },
        "x-rowExpr": "n_tok = size(tokens)",
    })
    res = suite.run(packed, key="doc_id", partition_by="source")
    ok = res.ok()
    if ok:
        packed.write.mode("overwrite").partitionBy("source").parquet(out_dir)
    return ok


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_prep_out"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("training-prep-pipeline").getOrCreate())
    stages = prepare(spark, sf_dir)
    stages["stats"].show(30, truncate=False)
    ok = validate_and_write(spark, stages["packed"], out_dir)
    print(f"validated={ok} → {out_dir}")
    spark.stop()
