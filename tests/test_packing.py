"""Length-bucketed batching (functions/packing.py) — padding-waste
reduction for padded training batches."""

from pyspark.sql import functions as F




def test_length_bucketed_batches_shape_and_determinism(spark):
    from jsonschema_valid_spark.functions.packing import (
        length_bucketed_batches,
        padding_stats,
    )

    df = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        ((F.col("id") * 37) % 120 + 8).alias("n_tok"))
    out = length_bucketed_batches(df, "doc_id", "n_tok", batch_size=16,
                                  edges=[40.0, 72.0, 104.0], shards=2)
    rows = out.collect()
    assert len(rows) == 1000
    # bucket rule matches the equi-depth histogram: #edges <= n_tok
    for r in rows:
        expect = sum(1 for e in [40, 72, 104] if r["n_tok"] >= e)
        assert r["bucket"] == expect
    # batches never mix buckets; every full batch has batch_size members
    from collections import Counter
    sizes = Counter(r["batch_id"] for r in rows)
    for r in rows:
        assert r["batch_id"].startswith(f"{r['bucket']}-")
        assert 0 <= r["batch_seq"] < 16
    # at most one partial batch per (bucket, shard)
    partials = Counter()
    for bid, n in sizes.items():
        assert n <= 16
        if n < 16:
            partials[tuple(bid.split("-")[:2])] += 1
    assert all(v == 1 for v in partials.values())

    # partitioning-invariant
    out2 = length_bucketed_batches(df.repartition(13), "doc_id", "n_tok",
                                   batch_size=16,
                                   edges=[40.0, 72.0, 104.0], shards=2)
    a = sorted((r["doc_id"], r["batch_id"], r["batch_seq"])
               for r in rows)
    b = sorted((r["doc_id"], r["batch_id"], r["batch_seq"])
               for r in out2.collect())
    assert a == b

    # bucketing beats one global batch bag on padding efficiency
    eff_bucketed = padding_stats(out, "n_tok").first()["efficiency"]
    one_bag = length_bucketed_batches(df, "doc_id", "n_tok", batch_size=16,
                                      edges=[1e18], shards=1)
    eff_bag = padding_stats(one_bag, "n_tok").first()["efficiency"]
    assert eff_bucketed > eff_bag + 0.1

    import pytest as _pt
    with _pt.raises(ValueError):
        length_bucketed_batches(df, "doc_id", "n_tok", 0, [10.0])
    with _pt.raises(ValueError):
        length_bucketed_batches(df, "doc_id", "n_tok", 8, [])
    with _pt.raises(ValueError):
        length_bucketed_batches(df, "doc_id", "n_tok", 8, [5.0, 2.0])
