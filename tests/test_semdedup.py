"""SemDeDup (cluster-bucketed semantic dedup) — functions/similarity.py
semantic_neardup_pairs / semdedup / soft_cell_assign.

The reference has no embedding ops; this family is part of the brief's
training-data-pipeline surface. Correctness anchors:

* candidate generation is SOUND (every emitted pair really clears the
  cosine threshold — verify stage is exact, so semantic pairs ⊆ brute
  force always);
* with TRAINED centroids at n_assign=4 the capture is COMPLETE on the
  sf0.01 fixture (14/14 brute-force pairs) — i.e. trained-soft SemDeDup
  equals exact all-pairs dedup there;
* trained centroids capture ≥ seeded at the same parameters (the reason
  semdedup trains by default in production);
* survivor marking: min-key rule shared with the MinHash path, and the
  paper's far-from-centroid rule keeps the least prototypical member.
"""

import os

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.functions.similarity import (
    cosine,
    ivf_centroids,
    semantic_neardup_pairs,
    semdedup,
    soft_cell_assign,
    train_ivf_centroids,
    with_embedding_dim,
)

SF01 = "/root/testdata/sf0.01"
needs_sf01 = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.01 testdata not present")


def _brute_pairs(spark, threshold=0.45):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    x, y = emb.alias("x"), emb.alias("y")
    cs = cosine(F.col("x.v"), F.col("y.v"))
    return {
        (r["a"], r["b"])
        for r in x.join(y, F.col("x.vec_id") < F.col("y.vec_id"))
        .where(cs >= threshold)
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .collect()
    }


@needs_sf01
def test_semantic_pairs_subset_of_brute_force(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    got = {
        (r["a"], r["b"])
        for r in semantic_neardup_pairs(
            emb, "vec_id", "embedding", dim=64, threshold=0.45,
            n_cells=16, n_assign=4).collect()
    }
    assert got  # non-vacuous at the registered parameter point
    assert got <= _brute_pairs(spark)


@needs_sf01
def test_trained_centroids_capture_all_fixture_pairs(spark):
    """Trained + soft n_assign=4 == exact all-pairs on the fixture, and
    beats seeded capture at identical parameters."""
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    true = _brute_pairs(spark)
    cents = train_ivf_centroids(emb, "embedding", 64, n_cells=16, iters=5)

    def pairset(c):
        return {
            (r["a"], r["b"])
            for r in semantic_neardup_pairs(
                emb, "vec_id", "embedding", dim=64, threshold=0.45,
                n_cells=16, n_assign=4, centroids=c).collect()
        }

    trained = pairset(cents)
    seeded = pairset(None)
    assert trained == true
    assert len(trained) >= len(seeded)


@needs_sf01
def test_hard_assignment_subset_of_soft(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")

    def pairset(p):
        return {
            (r["a"], r["b"])
            for r in semantic_neardup_pairs(
                emb, "vec_id", "embedding", dim=64, threshold=0.45,
                n_cells=16, n_assign=p).collect()
        }

    assert pairset(1) <= pairset(4)


def test_soft_cell_assign_counts_and_ties(spark):
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    df = spark.createDataFrame(
        [([3.0, 1.0],), ([1.0, 1.0],)], "v: array<double>")
    rows = df.select(
        soft_cell_assign(F.col("v"), cents, 1).alias("c1"),
        soft_cell_assign(F.col("v"), cents, 2).alias("c2"),
    ).collect()
    assert rows[0]["c1"] == [1]
    assert rows[0]["c2"] == [1, 2]
    # [1,1] ties cells 1 and 2 at the top: BOTH kept even at n_assign=1
    assert rows[1]["c1"] == [1, 2]


def test_dim_from_schema_metadata(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [-1.0, 0.0])],
        "id: long, v: array<double>")
    with pytest.raises(ValueError, match="dim is required"):
        semantic_neardup_pairs(df, "id", "v", n_cells=2)
    stamped = with_embedding_dim(df, "v", 2)
    pairs = semantic_neardup_pairs(
        stamped, "id", "v", threshold=0.9, n_cells=2, n_assign=1,
        centroids=[[1.0, 0.0], [-1.0, 0.0]])
    assert {(r["a"], r["b"]) for r in pairs.collect()} == {(1, 2)}


def _toy(spark):
    # cluster A: ids 1,2,3 mutually near-dup; id 4 isolated.
    # id 2 sits farthest from centroid [1, 0].
    return spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.44]), (3, [1.0, 0.1]),
         (4, [-1.0, 0.0])],
        "id: long, v: array<double>")


def test_semdedup_min_key_survivors(spark):
    out = semdedup(_toy(spark), "id", "v", dim=2, threshold=0.8,
                   centroids=[[1.0, 0.0], [-1.0, 0.0]]).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["is_survivor"] and by_id[4]["is_survivor"]
    assert not by_id[2]["is_survivor"] and not by_id[3]["is_survivor"]
    assert by_id[2]["cluster_id"] == by_id[3]["cluster_id"] == 1


def test_semdedup_far_from_centroid_survivors(spark):
    out = semdedup(_toy(spark), "id", "v", dim=2, threshold=0.8,
                   centroids=[[1.0, 0.0], [-1.0, 0.0]],
                   keep="far_from_centroid").collect()
    by_id = {r["id"]: r for r in out}
    # id 2 has the lowest cosine to centroid 1 → it survives instead of 1
    assert by_id[2]["is_survivor"] and by_id[4]["is_survivor"]
    assert not by_id[1]["is_survivor"] and not by_id[3]["is_survivor"]
    # every cluster still has exactly one survivor
    survivors = [r for r in out if r["is_survivor"]]
    assert len({r["cluster_id"] for r in survivors}) == len(survivors)
    assert {r["cluster_id"] for r in out} == {
        r["cluster_id"] for r in survivors}


def test_semdedup_rejects_unknown_keep(spark):
    with pytest.raises(ValueError, match="keep must be"):
        semdedup(_toy(spark), "id", "v", dim=2, keep="random")


def test_candidate_join_is_equi_join_not_cartesian(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], "vec_id: long, v: array<double>")
    plan = semantic_neardup_pairs(
        emb, "vec_id", "v", dim=2, n_cells=4, n_assign=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_written_assignments_candidate_join_exchange_free(spark):
    """The bucketed assignment layout runs the candidate self-join with
    ZERO Exchange before the join (the write-time shuffle replaces it);
    pair results equal the inline operator at the same parameters."""
    from jsonschema_valid_spark.sources.ann_index import (
        semdedup_pairs_from_assignments,
        write_semdedup_assignments,
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    write_semdedup_assignments(emb, "semdedup_asgn_test", "vec_id",
                               "embedding", dim=64, n_cells=16,
                               n_assign=4, buckets=4)
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # the fixture is tiny enough that AQE would broadcast one side
        # (hiding the layout); disable broadcast so the plan shows the
        # at-scale SortMergeJoin shape the bucketing serves
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pairs = semdedup_pairs_from_assignments(
            spark, "semdedup_asgn_test", threshold=0.45)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[-1]
        # no Exchange below the join (the tail of the plan string holds
        # the join's children); the only Exchange allowed is the final
        # distinct over verified pairs, which sits ABOVE the join
        assert "Exchange" not in join_part, plan
        got = {(r["a"], r["b"]) for r in pairs.collect()}
        inline = {(r["a"], r["b"]) for r in semantic_neardup_pairs(
            emb, "vec_id", "embedding", dim=64, threshold=0.45,
            n_cells=16, n_assign=4).collect()}
        assert got == inline and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.sql("DROP TABLE IF EXISTS semdedup_asgn_test")
