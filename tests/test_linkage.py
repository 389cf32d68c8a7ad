"""Record linkage (operators/linkage.py): blocked candidates, weighted
field-similarity scoring, transitive match clustering."""

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.linkage import (
    link_candidates,
    link_clusters,
    link_records,
)


def _people(spark):
    rows = [
        (1, "alice smith", "OR", 100.0),
        (2, "alice smyth", "OR", 100.0),   # typo twin of 1
        (3, "bob jones", "OR", 55.0),
        (4, "alice smith", "CA", 100.0),   # same person, other block key
        (5, "carol white", None, 70.0),    # NULL block: never pairs
        (6, "alice  smith", "CA", 100.0),  # whitespace variant of 4
    ]
    return spark.createDataFrame(
        rows, "id: long, name: string, state: string, bal: double")


def test_candidates_block_null_and_order(spark):
    cand = link_candidates(_people(spark), "id", "state", carry=["name"])
    pairs = {(r["a"], r["b"]) for r in cand.collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3), (4, 6)}
    # a < b always; NULL block key excluded entirely
    assert all(a < b for a, b in pairs)
    row = {(r["a"], r["b"]): (r["name_a"], r["name_b"])
           for r in cand.collect()}[(1, 2)]
    assert row == ("alice smith", "alice smyth")


def test_multi_key_blocking_dedups_before_scoring(spark):
    # blocking on state AND on first 5 name chars: pair (1,2) meets both
    # keys but must appear once
    cand = link_candidates(
        _people(spark), "id", ["state", "substr(name, 1, 5)"],
        carry=["name"])
    pairs = sorted((r["a"], r["b"]) for r in cand.collect())
    assert pairs.count((1, 2)) == 1
    # name-prefix blocking recovers the cross-state pair (1,4) that
    # state blocking misses
    assert (1, 4) in pairs


def test_oversize_block_error_and_skip(spark):
    df = _people(spark)
    with pytest.raises(ValueError, match="max_block"):
        link_candidates(df, "id", "state", carry=[], max_block=2)
    cand = link_candidates(df, "id", "state", carry=[], max_block=2,
                           on_oversize="skip")
    # OR block (3 rows) dropped; CA block (2 rows) survives
    assert {(r["a"], r["b"]) for r in cand.collect()} == {(4, 6)}


def test_field_scores_and_threshold(spark):
    fields = [
        {"column": "name", "method": "levenshtein", "weight": 0.5},
        {"column": "bal", "method": "exact", "weight": 0.5},
    ]
    out = link_records(_people(spark), "id", fields, "state",
                       threshold=0.9)
    got = {(r["a"], r["b"]): r["score"] for r in out.collect()}
    # (1,2): lev('alice smith','alice smyth')=1, len 11 -> sim 10/11;
    # bal exact -> 1.0; score = .5*(10/11) + .5 = 0.954545. (4,6): the
    # double-space variant, lev=1 over len 12 -> .5*(11/12)+.5 = 0.958333
    assert set(got) == {(1, 2), (4, 6)}
    assert got[(1, 2)] == pytest.approx(0.954545, abs=1e-6)
    assert got[(4, 6)] == pytest.approx(0.958333, abs=1e-6)


def test_jaccard_method(spark):
    fields = [{"column": "name", "method": "jaccard", "weight": 1.0}]
    out = link_records(_people(spark), "id", fields,
                       "substr(name, 1, 5)", threshold=0.99)
    got = {(r["a"], r["b"]): r["score"] for r in out.collect()}
    # token sets identical for 'alice smith' / 'alice  smith' (and the
    # CA pair 4-6); (1,2) misses at tokens {alice,smith} vs {alice,smyth}
    assert set(got) == {(1, 4), (1, 6), (4, 6)}
    assert all(v == 1.0 for v in got.values())


def test_clusters_transitive_and_singletons(spark):
    df = _people(spark)
    pairs = spark.createDataFrame([(1, 2), (2, 4)], "a: long, b: long")
    cl = {r["id"]: r["cluster_id"]
          for r in link_clusters(df, "id", pairs).collect()}
    # 1-2-4 collapse to min key 1; everyone else their own entity
    assert cl == {1: 1, 2: 1, 3: 3, 4: 1, 5: 5, 6: 6}


def test_partitioning_invariance(spark):
    fields = [
        {"column": "name", "method": "levenshtein", "weight": 0.5},
        {"column": "bal", "method": "exact", "weight": 0.5},
    ]
    base = sorted(map(tuple, link_records(
        _people(spark), "id", fields, "state", threshold=0.5).collect()))
    rep = sorted(map(tuple, link_records(
        _people(spark).repartition(7), "id", fields, "state",
        threshold=0.5).collect()))
    assert base == rep and base


def test_rejects_bad_args(spark):
    df = _people(spark)
    with pytest.raises(ValueError):
        link_records(df, "id", [], "state", 0.5)
    with pytest.raises(ValueError):
        link_records(df, "id", [{"column": "name"}], "state", 0.5)
    with pytest.raises(ValueError):
        link_records(df, "id", [{"column": "name", "method": "soundex"}],
                     "state", 0.5).collect()
    with pytest.raises(ValueError):
        link_candidates(df, "id", [], carry=[])
    with pytest.raises(ValueError):
        link_candidates(df, "id", "state", carry=[], on_oversize="warn")


def test_no_cartesian_in_plan(spark):
    fields = [{"column": "name", "method": "levenshtein", "weight": 1.0}]
    out = link_records(_people(spark), "id", fields, "state", 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


_KW_SPEC = {"properties": {"name": {"x-linkage": {
    "blockOn": "state",
    "fields": [
        {"column": "name", "method": "levenshtein", "weight": 0.5},
        {"column": "bal", "method": "exact", "weight": 0.5},
    ],
    "threshold": 0.9,
}}}}


def test_keyword_violations_and_verdict(spark):
    from jsonschema_valid_spark import CheckSuite

    res = CheckSuite(_KW_SPEC).run(_people(spark), key="id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    # matched pairs (1,2) and (4,6): non-survivors 2 and 6 name their
    # entity's min-key survivor
    assert got == {"2": "entity of 1", "6": "entity of 4"}
    cid = "properties/name/x-linkage"
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1 and not verd[0]["passed"]
    assert verd[0]["metric_value"] == 2.0


def test_keyword_both_paths_agree(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.engine import run_suite_summarized

    df = _people(spark)
    lazy = CheckSuite(_KW_SPEC).run(df, key="id")
    summ = run_suite_summarized(CheckSuite(_KW_SPEC), df, key="id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_keyword_spec_validation(spark):
    import pytest as _pt

    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    validate_suite_spec(_KW_SPEC)
    assert validate_suite_with_engine(spark, _KW_SPEC).ok()
    for bad in [
        {},                                              # nothing
        {"blockOn": "state", "threshold": 0.9},          # no fields
        {"blockOn": [], "threshold": 0.9,
         "fields": [{"column": "a", "method": "exact"}]},  # empty blocks
        {"blockOn": "state", "threshold": 1.5,
         "fields": [{"column": "a", "method": "exact"}]},  # bad threshold
        {"blockOn": "state", "threshold": 0.9,
         "fields": [{"column": "a", "method": "soundex"}]},  # bad method
        {"blockOn": "state", "threshold": 0.9, "onOversize": "warn",
         "fields": [{"column": "a", "method": "exact"}]},  # bad mode
        "state",                                         # not an object
    ]:
        with _pt.raises(SuiteError):
            validate_suite_spec({"properties": {"name": {
                "x-linkage": bad}}})


def _merge_fixture(spark):
    # two clusters: {1,2,3} and {10}; member 3 has a NULL email (a
    # newer NULL must not beat an older non-null under "latest")
    rows = [
        (1, 100, "a@x", "gold", 5.0),
        (2, 200, "b@x", "gold", 7.0),
        (3, 300, None, "silver", 2.0),
        (10, 150, "j@x", "bronze", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "id: long, seen: long, email: string, tier: string, "
              "spend: double")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10)], "id: long, cluster_id: long")
    return df, clusters


def test_merge_clusters_rules(spark):
    from jsonschema_valid_spark.operators.linkage import merge_clusters

    df, clusters = _merge_fixture(spark)
    g = merge_clusters(
        df, "id", clusters,
        rules={"email": "latest", "tier": "most_frequent",
               "spend": "sum", "seen": "max"},
        order_by="seen")
    got = {r.cluster_id: r for r in g.collect()}
    assert set(got) == {1, 10}
    m = got[1]
    assert m.n_members == 3
    # latest NON-NULL email: member 3 (seen=300) is NULL, so member 2 wins
    assert m.email == "b@x"
    assert m.tier == "gold"          # modal value (2 gold vs 1 silver)
    assert m.spend == pytest.approx(14.0)
    assert m.seen == 300
    s = got[10]
    assert (s.n_members, s.email, s.tier, s.spend) == (1, "j@x", "bronze", 9.0)


def test_merge_clusters_tie_and_earliest(spark):
    from jsonschema_valid_spark.operators.linkage import merge_clusters

    rows = [(1, 5, "b"), (2, 5, "a"), (3, 7, "a"), (4, 9, "b")]
    df = spark.createDataFrame(rows, "id: long, seen: long, v: string")
    clusters = spark.createDataFrame(
        [(i, 1) for i in (1, 2, 3, 4)], "id: long, cluster_id: long")
    g = merge_clusters(df, "id", clusters,
                       rules={"v": "most_frequent"}).collect()[0]
    # 2 a's vs 2 b's: deterministic tie-break by larger value
    assert g.v == "b"
    e = merge_clusters(df, "id", clusters, rules={"v": "earliest"},
                       order_by="seen").collect()[0]
    # seen=5 twice: key tie-break picks id=1's value
    assert e.v == "b"


def test_merge_clusters_validation_and_plan(spark):
    from jsonschema_valid_spark.operators.linkage import merge_clusters

    df, clusters = _merge_fixture(spark)
    with pytest.raises(ValueError, match="unknown merge rule"):
        merge_clusters(df, "id", clusters, rules={"email": "newest"})
    with pytest.raises(ValueError, match="needs order_by"):
        merge_clusters(df, "id", clusters, rules={"email": "latest"})
    # no most_frequent: single aggregate after the assignment join —
    # no window, no extra join
    g = merge_clusters(df, "id", clusters,
                       rules={"email": "latest", "spend": "sum"},
                       order_by="seen")
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Join") == 1, plan
