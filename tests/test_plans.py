"""Physical-plan assertions: the engine must produce the plans the scale
story depends on — no shuffle in the row pass, column pruning down to the
checked columns, broadcast (not shuffle) joins for referential membership,
and partial aggregation for the fused agg pass."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_row_pass_has_no_shuffle(spark, lineitem):
    suite = CheckSuite({"properties": {
        "l_quantity": {"minimum": 0, "maximum": 60},
        "l_returnflag": {"enum": ["A", "N", "R"]},
    }})
    res = suite.run(lineitem, key="l_orderkey")
    plan = _plan(res.violations)
    assert "Exchange" not in plan, f"row pass must not shuffle:\n{plan}"
    assert "Scan parquet" in plan


def test_row_pass_prunes_columns(spark, lineitem):
    """The violations scan must read ONLY the key + checked columns
    (ReadSchema pruning) — an 11-column table with a 1-column check reads 2
    columns, not 11."""
    suite = CheckSuite({"properties": {"l_quantity": {"minimum": 0}}})
    res = suite.run(lineitem, key="l_orderkey")
    plan = _plan(res.violations)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_agg_pass_uses_partial_aggregation(spark, lineitem):
    """Fused verdicts = hash aggregate with partial (map-side) + final
    phases — the shuffle carries #partitions × #aggs values, not rows."""
    suite = CheckSuite({"properties": {
        "l_quantity": {"x-stats": {"min": {"min": 0}, "avg": {"max": 100}}}}})
    res = suite.run(lineitem, key="l_orderkey", partition_by="l_returnflag")
    plan = _plan(res.verdicts)
    assert "partial" in plan.lower(), plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_referential_uses_broadcast_anti_join(spark, lineitem):
    from jsonschema_valid_spark.operators.referential import non_members

    domain = spark.createDataFrame([("A",), ("N",), ("R",)], "f string")
    bad = non_members(lineitem, "l_returnflag", domain, domain_column="f")
    plan = _plan(bad)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the fact side must NOT be exchanged for the join (only the broadcast)
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark, lineitem):
    """Catalyst pushes suite-adjacent filters into the parquet scan."""
    df = lineitem.where(F.col("l_quantity") > 10)
    suite = CheckSuite({"properties": {"l_extendedprice": {"minimum": 0}}})
    res = suite.run(df, key="l_orderkey")
    plan = _plan(res.violations)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10" in plan.replace(".0", ""), plan


def test_bucketed_layout_makes_uniqueness_shuffle_free(spark):
    """A table bucketed on the uniqueness key runs BOTH phases of the salted
    duplicate-key aggregate with ZERO Exchange — the write-time shuffle
    replaces the 100 TB read-time one. HashPartitioning(key) satisfies the
    clustered distribution of the (key, salt) phase-1 grouping too."""
    from jsonschema_valid_spark.operators.uniqueness import duplicate_keys
    from jsonschema_valid_spark.sources.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    df = spark.createDataFrame(
        [(f"d{i % 40}", i) for i in range(200)], "doc_id string, x long")
    write_bucketed(df, "bucketed_seq_test", "doc_id", buckets=4)
    try:
        bucketed = read_bucketed(spark, "bucketed_seq_test")
        plan = _plan(duplicate_keys(bucketed, "doc_id"))
        assert "Exchange" not in plan, plan
        # and the result is still correct
        dups = duplicate_keys(bucketed, "doc_id").count()
        assert dups == 40  # every key appears 5 times
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_seq_test")


def test_unbucketed_uniqueness_does_shuffle(spark):
    """Control: the same aggregate over a plain DataFrame needs its shuffle —
    proving the bucketed assertion above is the layout's doing."""
    from jsonschema_valid_spark.operators.uniqueness import duplicate_keys

    df = spark.createDataFrame(
        [(f"d{i % 40}", i) for i in range(200)], "doc_id string, x long")
    assert "Exchange" in _plan(duplicate_keys(df, "doc_id"))


def test_summarized_agg_scan_drops_array_column(spark):
    """run_suite_summarized's slim agg pass must NOT read the token arrays
    (column pruning) — that's the point of deriving row counters from the
    persisted violations."""
    from jsonschema_valid_spark.engine import run_suite_summarized
    from jsonschema_valid_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, SF_DIR)
    suite = CheckSuite({
        "properties": {
            "tokens": {"items": {"minimum": 0}},
            "n_tok": {"x-stats": {"avg": {"min": 0, "max": 10000}}},
        },
    })
    res = run_suite_summarized(suite, seq, key="doc_id", partition_by="source")
    opt = _optimized(res.verdicts)
    # the agg branch over the base table must not reference `tokens`; the
    # only mention allowed is via the persisted violations subtree
    agg_branch = opt.split("Aggregate")[1] if "Aggregate" in opt else opt
    res.unpersist()
    assert "size(tokens" not in agg_branch


def test_decontamination_broadcasts_benchmark_side(spark):
    """contamination() must broadcast the (small) benchmark n-gram set and
    never shuffle the corpus posting table before the sparse per-doc
    rollup: expect a BroadcastHashJoin and exactly ONE non-broadcast
    Exchange (the groupBy on doc id)."""
    from jsonschema_valid_spark.functions.decontamination import contamination

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select("text")
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    plan = _plan(contamination(corpus, bench, "doc_id", "text", n=5))
    assert "BroadcastHashJoin" in plan
    # the CORPUS branch (between the join and the bench-side
    # BroadcastExchange) must have no Exchange: scan -> explode -> join
    corpus_branch = plan.split("BroadcastHashJoin", 1)[1].split(
        "BroadcastExchange", 1)[0]
    assert "Exchange" not in corpus_branch, plan
    # total shuffles: the per-doc rollup + the TINY bench-side distinct
    # (pre-broadcast dedup of the probe list) — nothing corpus-sized
    non_broadcast_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert len(non_broadcast_exchanges) == 2, plan


def test_stratified_sample_is_pure_filter(spark):
    """The hash-gate sample compiles to filter-over-scan: no Exchange, no
    Python, inside WholeStageCodegen."""
    from jsonschema_valid_spark.functions.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(stratified_sample(
        docs, "doc_id", "lang", rates={"en": 0.5}, default_rate=0.1))
    assert "Exchange" not in plan
    # `*(n)` prefixes in executedPlan toString = WholeStageCodegen stages
    assert plan.lstrip().startswith("*("), plan


def test_ivf_pq_index_partition_pruning(spark, tmp_path):
    """The written IVF-PQ index must serve queries through PARTITION
    PRUNING: the scan's PartitionFilters carry the __cell probe set and the
    planned file index contains only the probed cells' files."""
    from jsonschema_valid_spark.sources.ann_index import (
        ivf_pq_topk,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ann_index")
    write_ivf_pq_index(emb, path, "vec_id", "embedding", dim=64)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    res = ivf_pq_topk(spark, path, "vec_id", q, k=10, n_probe=4)
    plan = _plan(res)
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__cell" in m.group(1), plan
    # and the ADC projection must not read the vector column
    m2 = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m2 and "embedding" not in m2.group(1), plan


def test_ivf_pq_topk_matches_inline_composition(spark, tmp_path):
    """Index-served results == the inline composition (cell filter + ADC
    over freshly-computed codes) — the write-time layout changes WHERE the
    work happens, not the answer."""
    from jsonschema_valid_spark.functions.similarity import (
        _nearest_cell1,
        ivf_centroids,
        pq_codebooks,
        pq_encode,
    )
    from jsonschema_valid_spark.sources.ann_index import (
        ivf_pq_topk,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ann_index2")
    write_ivf_pq_index(emb, path, "vec_id", "embedding", dim=64)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    served = [tuple(r) for r in
              ivf_pq_topk(spark, path, "vec_id", q, k=10, n_probe=4).collect()]

    cents = ivf_centroids(64, 16, 11)
    probe1 = [i + 1 for i in
              sorted(range(16),
                     key=lambda i: -sum(a * b for a, b in zip(q, cents[i]))
                     )[:4]]
    books = pq_codebooks(64, 8, 16, 13)
    v = F.col("embedding").cast("array<double>")
    d = 8
    luts = [F.array(*[F.lit(sum(qq * c for qq, c in
                                zip(q[j * d:(j + 1) * d], cent)))
                      for cent in book])
            for j, book in enumerate(books)]
    codes = pq_encode(v, books)
    score = F.try_element_at(luts[0], F.try_element_at(codes, F.lit(1)))
    for j in range(1, 8):
        score = score + F.try_element_at(
            luts[j], F.try_element_at(codes, F.lit(j + 1)))
    inline = [tuple(r) for r in (
        emb.withColumn("__cell", _nearest_cell1(v, cents))
        .where(F.col("__cell").isin(probe1))
        .select("vec_id", F.round(score, 6).alias("adc"))
        .orderBy(F.desc("adc"), F.col("vec_id")).limit(10)).collect()]
    assert served == inline


def test_ivf_pq_rerank_reads_vectors_only_on_rerank_branch(spark, tmp_path):
    """The composed re-rank pipeline over a written index (VERDICT r3
    item 3): the ADC candidate branch's scan must read (key, __codes)
    WITHOUT the float vector column, and the vector column may appear only
    in the re-rank branch's scan — plus the result must equal brute force
    at covering rerank width."""
    import re

    from jsonschema_valid_spark.functions.similarity import brute_force_topk
    from jsonschema_valid_spark.sources.ann_index import (
        ivf_pq_rerank_from_index,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ann_index3")
    write_ivf_pq_index(emb, path, "vec_id", "embedding", dim=64)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    res = ivf_pq_rerank_from_index(
        spark, path, "vec_id", "embedding", q, k=10,
        n_probe=16, rerank=500)  # full coverage ⇒ must equal brute force
    plan = _plan(res)
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert len(schemas) >= 2, plan
    adc_scans = [s for s in schemas if "__codes" in s]
    vec_scans = [s for s in schemas if "embedding" in s]
    assert adc_scans and all("embedding" not in s for s in adc_scans), schemas
    assert len(vec_scans) == 1, schemas

    got = [tuple(r) for r in res.collect()]
    want = [tuple(r) for r in
            brute_force_topk(emb, "vec_id", "embedding", q, k=10)
            .select("vec_id", F.round("cos", 6).alias("cos")).collect()]
    assert got == want


def test_range_layout_enables_file_skipping(spark, tmp_path):
    """write_range_layout: per-file min/max footers become (near-)disjoint
    so a narrow range predicate prunes most files; an unsorted control
    cannot skip anything."""
    from jsonschema_valid_spark.sources.bucketing import (
        file_range_stats,
        files_matching_range,
        write_range_layout,
    )

    df = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919) % 1000).alias("n_tok"))  # shuffled values

    sorted_path = str(tmp_path / "sorted")
    control_path = str(tmp_path / "control")
    write_range_layout(df, sorted_path, "n_tok", n_files=16)
    df.repartition(16).write.mode("overwrite").parquet(control_path)

    ss = file_range_stats(sorted_path, "n_tok")
    cs = file_range_stats(control_path, "n_tok")
    assert sum(s["rows"] for s in ss) == 100_000

    # range files: pairwise-disjoint intervals (boundary duplicates of a
    # single value may touch); control files: all span ~the full domain
    ss_sorted = sorted(ss, key=lambda s: s["min"])
    for a, b in zip(ss_sorted, ss_sorted[1:]):
        assert a["max"] <= b["min"], "range layout intervals overlap"

    probe = files_matching_range(ss, 100, 160)
    assert len(probe) <= 3, f"narrow probe touches {len(probe)} files"
    assert sum(s["rows"] for s in probe) >= 6_000  # the matching rows exist
    assert len(files_matching_range(cs, 100, 160)) == len(cs), \
        "unsorted control should not be able to skip"

    # the predicate itself reaches the parquet scan
    q = (spark.read.parquet(sorted_path)
         .where((F.col("n_tok") >= 100) & (F.col("n_tok") <= 160)))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(n_tok,100)" in plan
    assert q.count() == df.where("n_tok between 100 and 160").count()


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """write_zorder_layout: Morton-interleaved sort gives BOTH columns
    narrow per-file footers, so a 2-D box probe prunes files on both at
    once; the 1-D sorted control prunes only its own column and a probe
    on the other touches every file."""
    from jsonschema_valid_spark.sources.bucketing import (
        file_range_stats,
        files_matching_box,
        files_matching_range,
        write_range_layout,
        write_zorder_layout,
    )

    df = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919) % 1000).alias("a"),
        (((F.col("id") * 7919) / 1000).cast("long") % 1000)
        .alias("b"))  # distinct digit ranges: jointly cover the 2-D grid

    z_path = str(tmp_path / "zorder")
    c_path = str(tmp_path / "asorted")
    edges = write_zorder_layout(df, z_path, ["a", "b"], n_files=16, bits=8)
    write_range_layout(df, c_path, "a", n_files=16)
    assert len(edges["a"]) == 255 and len(edges["b"]) == 255

    assert sum(s["rows"] for s in file_range_stats(z_path, "a")) == 100_000

    box = {"a": (100, 160), "b": (400, 460)}  # ~0.36% of the domain
    z_hit = files_matching_box(z_path, box)
    assert len(z_hit) <= 8, f"box probe touches {len(z_hit)}/16 files"
    # the asymmetry: a predicate on the NON-sorted column prunes nothing
    # in the 1-D layout (every file spans b's full domain) but prunes in
    # the z-order layout, where every column owns bits of the sort key
    b_box = {"b": (400, 460)}
    assert len(files_matching_box(c_path, b_box)) == 16, \
        "1-D control should not be able to skip on b"
    assert len(files_matching_box(z_path, b_box)) < 16

    # no rows lost, box answers agree, and __zorder does not leak
    out = spark.read.parquet(z_path)
    assert out.columns == ["doc_id", "a", "b"]
    got = out.where("a between 100 and 160 and b between 400 and 460").count()
    want = df.where("a between 100 and 160 and b between 400 and 460").count()
    assert got == want > 0

    # edge reuse: a second write with the returned grid is accepted
    write_zorder_layout(df.limit(1000), str(tmp_path / "incr"),
                        ["a", "b"], n_files=2, bits=8, edges=edges)

    import pytest as _pt
    from jsonschema_valid_spark.sources.bucketing import zorder_key
    with _pt.raises(ValueError):
        zorder_key(df, ["a"], bits=8)
    with _pt.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=40)


def test_zorder_key_wide_interleave_no_int_wrap(spark):
    """Regression (review find): bit positions >= 31 must not wrap —
    the bucket is cast to LONG before shifting, so 4-column x 8-bit and
    2-column x 16-bit keys stay non-negative and order-consistent."""
    from jsonschema_valid_spark.sources.bucketing import zorder_key

    df = spark.range(2_000).select(
        ((F.col("id") * 7919) % 100).alias("a"),
        (((F.col("id") * 7919) / 100).cast("long") % 100).alias("b"),
        ((F.col("id") * 104729) % 100).alias("c"),
        (((F.col("id") * 104729) / 100).cast("long") % 100).alias("d"))
    keyed, _ = zorder_key(df, ["a", "b", "c", "d"], bits=8)
    stats = keyed.agg(F.min("__zorder"), F.max("__zorder")).first()
    assert stats[0] >= 0, "sign-bit wrap: negative Morton key"
    assert stats[1] < (1 << 32)
    # a row with ALL max buckets must produce the maximal key, not a
    # wrapped/negative one
    keyed16, _ = zorder_key(df, ["a", "b"], bits=16)
    s16 = keyed16.agg(F.min("__zorder"), F.max("__zorder")).first()
    assert s16[0] >= 0 and s16[1] < (1 << 32)

    import pytest as _pt
    with _pt.raises(ValueError, match="63"):
        zorder_key(df, ["a", "b", "c", "d"], bits=16)


def test_anonymity_kl_single_scan(spark, lineitem):
    """r6: anonymity_violations with BOTH floors declared must be ONE
    aggregate subtree (explode of conditional structs) — the old
    union(k-rows, l-rows) re-planned the scan + groupBy per rule."""
    from jsonschema_valid_spark.operators.anonymity import (
        anonymity_violations,
    )

    v = anonymity_violations(lineitem, ["l_returnflag", "l_linestatus"],
                             "c", k=2, l=2, sensitive="l_quantity")
    plan = _plan(v)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
    assert "Union" not in final, final


def test_tcloseness_single_base_scan(spark, lineitem):
    """r6: t_closeness_violations checkpoints the (quasi, sensitive)
    aggregate, so the marginal/total/window branches must NOT each carry
    their own parquet scan (3 scans before; the one real scan lives in
    the checkpointed aggregate's materialization)."""
    from jsonschema_valid_spark.operators.anonymity import (
        t_closeness_violations,
    )

    v = t_closeness_violations(lineitem, ["l_returnflag"], "l_linestatus",
                               0.9, "c")
    final = _plan(v).split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 0, final
    assert "ExistingRDD" in final or "LogicalRDD" in final, final


def test_summarized_row_verdicts_join_is_broadcast(spark, lineitem):
    """r6: the (parts × catalog) ⋈ counters row-verdicts join is bounded
    by #partitions × #checks on both sides and must be a broadcast hash
    join, never a sort-merge join (which bought an Exchange + Sort on
    both sides)."""
    from jsonschema_valid_spark.engine import run_suite_summarized

    suite = CheckSuite({"properties": {
        "l_quantity": {"minimum": 0,
                       "x-stats": {"avg": {"max": 100}}}}})
    res = run_suite_summarized(suite, lineitem, key="l_orderkey",
                               partition_by="l_returnflag")
    final = _plan(res.verdicts).split("== Initial Plan ==")[0]
    res.unpersist()
    assert "SortMergeJoin" not in final, final
    assert "BroadcastHashJoin" in final, final


def test_row_pass_prefilters_failing_rows(spark, lineitem):
    """r6: the violations projection gates the per-row struct-array build
    behind a boolean any-check-failed Filter BELOW the Generate — clean
    rows (the vast majority) evaluate only the cheap predicates and never
    construct the observed/expected strings (measured 0.88 s -> 0.50 s on
    the 2M-row bench projection; rows emitted are identical because a
    clean row produced an empty array through array_compact anyway)."""
    suite = CheckSuite({"properties": {
        "l_quantity": {"minimum": 0, "maximum": 60},
        "l_returnflag": {"enum": ["A", "N", "R"]},
    }})
    res = suite.run(lineitem, key="l_orderkey")
    plan = _plan(res.violations)
    gen = plan.index("Generate")
    scan = plan.index("Scan parquet")
    assert gen < scan, plan
    assert "Filter" in plan[gen:scan], \
        f"no pre-Generate filter between Generate and Scan:\n{plan}"


def test_parity_multi_column_single_join(spark, lineitem):
    """r6: parity_mismatches native mode must plan ONE key join however
    many columns are compared — the old per-column union paid the join
    once per column."""
    from jsonschema_valid_spark.operators.parity import parity_mismatches

    ref = lineitem.select("l_orderkey", "l_linenumber", "l_quantity",
                          "l_extendedprice")
    v = parity_mismatches(
        lineitem, ref, key="l_orderkey",
        columns=["l_linenumber", "l_quantity", "l_extendedprice"])
    final = _plan(v).split("== Initial Plan ==")[0]
    joins = (final.count("SortMergeJoin") + final.count("ShuffledHashJoin")
             + final.count("BroadcastHashJoin"))
    assert joins == 1, final
