"""End-to-end training-data curation pipeline over the `documents` table —
the composition story for the beyond-reference ops: quality filter → exact
dedup → MinHash-LSH near-dup removal → embedding near-dup removal →
validated, checkpointed write.

Every stage is a lazy DataFrame transform; the whole pipeline is one
logical plan until the final writes. Scale notes per stage inline.

Run: python examples/curation_pipeline.py [sf_dir] [out_dir]
Tested by tests/test_example_pipeline.py at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, functions as F


def curate(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from jsonschema_valid_spark.functions.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        neardup_survivors,
    )
    from jsonschema_valid_spark.functions.similarity import cosine_neardup_pairs
    from jsonschema_valid_spark.functions.text import text_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. text analysis + quality gate — one fused projection, no shuffle
    profiled = text_profile(docs, "text")
    kept = profiled.where((F.col("quality") >= 0.5)
                          & (F.col("lang_pred") == "en"))

    # 2. exact dedup on the text fingerprint — one shuffle keyed by the
    #    (uniform) fingerprint, deterministic min-key survivor
    exact = dedup_exact(kept, "doc_id", "fp")

    # 3. MinHash-LSH near-dup pairs (banded buckets, never all-pairs),
    #    resolved to one survivor per connected component — a pairwise
    #    drop-the-higher-id rule over-drops on transitive chains (a~b, b~c,
    #    a!~c would drop both b AND c); large-star/small-star keeps exactly
    #    the component minimum
    near = minhash_lsh_pairs(exact, "doc_id", "text",
                             num_perm=64, bands=16, n=2, threshold=0.6)
    after_text = (neardup_survivors(exact, "doc_id", near)
                  .where("is_survivor")
                  .drop("cluster_id", "is_survivor"))

    # 4. embedding near-dup removal (multi-table hyperplane LSH + exact
    #    cosine verify); embeddings keyed by vec_id == doc_id here
    emb_pairs = cosine_neardup_pairs(emb, "vec_id", "embedding",
                                     threshold=0.97, bits=12, tables=4,
                                     dim=64)
    emb_losers = emb_pairs.select(F.col("b").alias("doc_id")).distinct()
    curated = after_text.join(emb_losers, on="doc_id", how="left_anti")

    return {"profiled": profiled, "kept": kept, "exact": exact,
            "curated": curated}


def validate_and_write(spark: SparkSession, curated: DataFrame,
                       out_dir: str) -> bool:
    """Gate the curated set through a check suite; quarantine row failures,
    write the clean set. Returns True when the clean side is violation-free
    (it is by construction — the split IS the row predicate)."""
    from jsonschema_valid_spark import CheckSuite

    suite = CheckSuite({
        "required": ["doc_id", "text"],
        "properties": {
            "doc_id": {"type": "integer", "minimum": 0},
            "n_words": {"minimum": 5},
            "quality": {"minimum": 0.5},
        },
    })
    clean, quarantined = suite.split(curated, key="doc_id")
    clean.write.mode("overwrite").parquet(f"{out_dir}/clean")
    quarantined.write.mode("overwrite").parquet(f"{out_dir}/quarantine")
    return suite.run(
        spark.read.parquet(f"{out_dir}/clean"), key="doc_id").ok()


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str = "/tmp/curation_out") -> dict:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("curation-pipeline").getOrCreate())
    stages = curate(spark, sf_dir)
    stats = {name: df.count() for name, df in stages.items()}
    stats["clean_ok"] = validate_and_write(spark, stages["curated"], out_dir)
    print(stats)
    return stats


if __name__ == "__main__":
    main(*sys.argv[1:])
