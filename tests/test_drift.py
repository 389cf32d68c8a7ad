"""Distribution-drift checks (FIXTURES.md F3 contract): an unshifted
regeneration must PASS vs its own baseline histogram; a shifted one must
FAIL KS/PSI."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite, validate
from jsonschema_valid_spark.operators.drift import histogram, ks, psi

BUCKET = 8.0


def _gen(spark, n, shift=0):
    """Deterministic n_tok distribution; `shift` displaces the mean."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 120 + 8 + shift).cast("int").alias("n_tok"),
    )


@pytest.fixture(scope="module")
def baseline(spark):
    hist = histogram(_gen(spark, 20000), "n_tok", BUCKET).collect()
    return {int(r["bucket"]): int(r["count"]) for r in hist}


def test_unshifted_passes(spark, baseline):
    df = _gen(spark, 20000)
    h = histogram(df, "n_tok", BUCKET)
    assert psi(h, baseline, spark) < 1e-9
    assert ks(h, baseline, spark) < 1e-9


def test_shifted_fails(spark, baseline):
    df = _gen(spark, 20000, shift=30)
    h = histogram(df, "n_tok", BUCKET)
    assert psi(h, baseline, spark) > 0.1
    assert ks(h, baseline, spark) > 0.05


def test_drift_through_suite(spark, baseline):
    suite_spec = {
        "properties": {
            "n_tok": {"x-drift": {"baseline": baseline, "bucketWidth": BUCKET,
                                  "psiMax": 0.1, "ksMax": 0.05}},
        },
    }
    ok_res = validate(_gen(spark, 20000), suite_spec, key="doc_id")
    verd = {r["check_id"]: r for r in ok_res.verdicts.collect()}
    assert verd["properties/n_tok/x-drift/psi"]["passed"]
    assert verd["properties/n_tok/x-drift/ks"]["passed"]

    bad_res = validate(_gen(spark, 20000, shift=30), suite_spec, key="doc_id")
    verd = {r["check_id"]: r for r in bad_res.verdicts.collect()}
    assert not verd["properties/n_tok/x-drift/psi"]["passed"]
    assert not verd["properties/n_tok/x-drift/ks"]["passed"]
    assert bad_res.ok() is False


def test_subsampled_same_distribution_passes(spark, baseline):
    """Histograms are normalized: half the rows, same shape ⇒ no drift."""
    df = _gen(spark, 10000)
    h = histogram(df, "n_tok", BUCKET)
    assert psi(h, baseline, spark) < 1e-6


def test_chi2_matches_python(spark):
    from jsonschema_valid_spark.operators.drift import chi2_value_df, histogram

    df = spark.createDataFrame([(float(i % 4),) for i in range(100)], "v: double")
    baseline = {0: 40, 1: 20, 2: 20, 3: 20}
    got = chi2_value_df(histogram(df, "v", 1.0), baseline, spark).first()["value"]
    eps = 1e-9
    expect = sum((0.25 - b / 100) ** 2 / (b / 100 + eps)
                 for b in (40, 20, 20, 20))
    assert abs(got - expect) < 1e-12


def test_x_drift_chi2_keyword(spark):
    from jsonschema_valid_spark import CheckSuite

    docs = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], "id: long, v: double")
    flat = {str(b): 10 for b in range(10)}
    ok = CheckSuite({"properties": {"v": {"x-drift": {
        "baseline": flat, "bucketWidth": 1.0, "chi2Max": 0.01}}}}).run(
        docs, key="id")
    assert ok.ok() is True
    skewed = {str(b): (100 if b == 0 else 1) for b in range(10)}
    bad = CheckSuite({"properties": {"v": {"x-drift": {
        "baseline": skewed, "bucketWidth": 1.0, "chi2Max": 0.01}}}}).run(
        docs, key="id")
    assert bad.ok() is False


def test_emd_exact_values(spark):
    """Binned Wasserstein-1: hand-computable cases including empty-bucket
    gaps (the gap factor integrates the persistent CDF difference)."""
    from jsonschema_valid_spark.operators.drift import emd_value_df

    def emd(obs_rows, base, width=1.0):
        h = spark.createDataFrame(obs_rows, "bucket long, count long")
        return float(emd_value_df(h, base, spark,
                                  bucket_width=width).first()["value"])

    # all mass moves from bucket 0 to bucket 3: distance 3
    assert emd([(3, 10)], {0: 10}) == pytest.approx(3.0)
    # same, with bucket_width scaling
    assert emd([(3, 10)], {0: 10}, width=16.0) == pytest.approx(48.0)
    # identical distributions: zero
    assert emd([(0, 5), (1, 5)], {0: 5, 1: 5}) == pytest.approx(0.0)
    # half the mass moves one bucket: 0.5
    assert emd([(0, 5), (1, 5)], {0: 10}) == pytest.approx(0.5)
    # shift by one bucket vs by three: KS is 1 for both, EMD separates
    assert emd([(1, 10)], {0: 10}) == pytest.approx(1.0)
    assert emd([(9, 10)], {0: 10}) == pytest.approx(9.0)


def test_x_drift_emd_keyword(spark, baseline):
    suite_pass = CheckSuite({"properties": {"n_tok": {
        "x-drift": {"baseline": baseline, "bucketWidth": BUCKET,
                    "emdMax": 1.0}}}})
    res = suite_pass.run(_gen(spark, 20000), key="doc_id")
    rows = {r["check_id"]: r for r in res.verdicts.collect()}
    cid = "properties/n_tok/x-drift/emd"
    assert rows[cid]["passed"] and rows[cid]["threshold"] == 1.0

    suite_fail = CheckSuite({"properties": {"n_tok": {
        "x-drift": {"baseline": baseline, "bucketWidth": BUCKET,
                    "emdMax": 1.0}}}})
    res2 = suite_fail.run(_gen(spark, 20000, shift=40), key="doc_id")
    rows2 = {r["check_id"]: r for r in res2.verdicts.collect()}
    assert not rows2[cid]["passed"]
    # a 40-unit mean shift ≈ 5 buckets of width 8 → EMD ≈ 5·8 = 40 units
    assert rows2[cid]["metric_value"] == pytest.approx(40.0, rel=0.15)


def test_embedding_cell_drift_through_suite(spark):
    """x-drift embedding mode: unshifted corpus passes vs its own cell
    baseline; a deterministic topic-shift (negated vectors) fails; KS/EMD
    rejected (cell ids unordered)."""
    from jsonschema_valid_spark.operators.drift import (
        embedding_cell_histogram,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = {int(r["bucket"]): int(r["count"])
            for r in embedding_cell_histogram(
                emb, "embedding", dim=64, n_cells=16).collect()}
    # the negation shift measures PSI/chi2 ≈ 0.022 on the fixture, the
    # unshifted corpus exactly 0.0 — 0.01 separates them with margin
    spec = {"properties": {"embedding": {"x-drift": {
        "baseline": base, "cells": {"dim": 64, "nCells": 16},
        "psiMax": 0.01, "chi2Max": 0.01}}}}
    res = CheckSuite(spec).run(emb, key="vec_id")
    rows = {r["check_id"]: r for r in res.verdicts.collect()}
    assert rows["properties/embedding/x-drift/psi"]["passed"]
    assert rows["properties/embedding/x-drift/chi2"]["passed"]

    v = F.col("embedding").cast("array<double>")
    shifted = emb.withColumn(
        "embedding", F.when(F.col("vec_id") % 3 == 0,
                            F.transform(v, lambda x: -x)).otherwise(v))
    res2 = CheckSuite(spec).run(shifted, key="vec_id")
    rows2 = {r["check_id"]: r for r in res2.verdicts.collect()}
    assert not rows2["properties/embedding/x-drift/psi"]["passed"]
    assert not rows2["properties/embedding/x-drift/chi2"]["passed"]

    bad = CheckSuite({"properties": {"embedding": {"x-drift": {
        "baseline": base, "cells": {"dim": 64}, "ksMax": 0.1}}}})
    with pytest.raises(Exception, match="unordered"):
        bad.run(emb, key="vec_id").verdicts.collect()


def test_embedding_drift_trained_centroids_via_context(spark):
    from jsonschema_valid_spark.functions.similarity import (
        train_ivf_centroids,
    )
    from jsonschema_valid_spark.operators.drift import (
        embedding_cell_histogram,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = train_ivf_centroids(emb, "embedding", 64, n_cells=8, iters=2)
    base = {int(r["bucket"]): int(r["count"])
            for r in embedding_cell_histogram(
                emb, "embedding", centroids=cents).collect()}
    spec = {"properties": {"embedding": {"x-drift": {
        "baseline": base, "cells": {"centroids": "@cents"},
        "psiMax": 0.01}}}}
    res = CheckSuite(spec).run(emb, key="vec_id",
                               context={"cents": cents})
    rows = {r["check_id"]: r for r in res.verdicts.collect()}
    assert rows["properties/embedding/x-drift/psi"]["passed"]
    assert rows["properties/embedding/x-drift/psi"]["metric_value"] == 0.0


def test_per_partition_drift_matches_global_per_slice(spark, baseline):
    """x-drift {"perPartition": true}: each partition group's statistics
    equal the global operators run on that slice alone — the same
    HOF-math-vs-operator parity contract as the streaming windows — and
    a drifted source is NAMED while clean sources still pass."""
    from jsonschema_valid_spark.operators.drift import (
        chi2_value_df,
        emd_value_df,
        histogram,
        jsd_value_df,
        kl_value_df,
        ks,
        psi,
    )

    clean = _gen(spark, 6000).withColumn("src", F.lit("clean"))
    drifted = (_gen(spark, 6000, shift=40)
               .withColumn("doc_id", F.col("doc_id") + 100000)
               .withColumn("src", F.lit("drifted")))
    df = clean.unionByName(drifted)
    taus = {"psi": 0.05, "ks": 0.05, "chi2": 0.05, "emd": 5.0,
            "kl": 0.05, "jsd": 0.02}
    spec = {"properties": {"n_tok": {"x-drift": {
        "baseline": baseline, "bucketWidth": BUCKET, "perPartition": True,
        "psiMax": taus["psi"], "ksMax": taus["ks"],
        "chi2Max": taus["chi2"], "emdMax": taus["emd"],
        "klMax": taus["kl"], "jsdMax": taus["jsd"]}}}}
    res = CheckSuite(spec).run(df, key="doc_id", partition_by="src")
    rows = {(r["partition_id"], r["check_id"].rsplit("/", 1)[-1]): r
            for r in res.verdicts.collect()
            if "/x-drift/" in r["check_id"]}
    assert {p for p, _ in rows} == {"clean", "drifted"}
    for stat in taus:
        assert rows[("clean", stat)]["passed"], stat
        assert not rows[("drifted", stat)]["passed"], stat

    fns = {"psi": lambda h: psi(h, baseline, spark),
           "ks": lambda h: ks(h, baseline, spark),
           "chi2": lambda h: float(chi2_value_df(
               h, baseline, spark).first()["value"]),
           "emd": lambda h: float(emd_value_df(
               h, baseline, spark, bucket_width=BUCKET).first()["value"]),
           "kl": lambda h: float(kl_value_df(
               h, baseline, spark).first()["value"]),
           "jsd": lambda h: float(jsd_value_df(
               h, baseline, spark).first()["value"])}
    for src, sl in (("clean", clean), ("drifted", drifted)):
        h = histogram(sl, "n_tok", BUCKET)
        for stat, fn in fns.items():
            # summation order differs between the HOF fold and the window
            # aggregate: equality to the last few ulps, not bit-exact
            assert rows[(src, stat)]["metric_value"] == pytest.approx(
                fn(h), rel=1e-12, abs=1e-9), (src, stat)


def test_categorical_drift_keyword(spark):
    from jsonschema_valid_spark.operators.drift import (
        categorical_histogram,
        psi_value_df,
    )
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    rows = ([("a", "click")] * 50 + [("b", "view")] * 30
            + [("c", "refund")] * 20 + [("d", None)] * 5)
    df = spark.createDataFrame(
        [(i, c) for i, (_, c) in enumerate(rows)], "id: long, et: string")
    baseline = {"click": 50, "view": 30, "signup": 20}
    res = CheckSuite({"properties": {"et": {"x-drift": {
        "categorical": True, "baseline": baseline,
        "psiMax": 0.01, "chi2Max": 0.01}}}}).run(df, key="id")
    rowsv = {r["check_id"].rsplit("/", 1)[-1]: r
             for r in res.verdicts.collect()
             if "/x-drift/" in r["check_id"]}
    # 'refund' is undeclared -> bucket -1 ("other"): 20% of observed
    # mass sits where the baseline has none, and declared 'signup' is
    # absent from the data -> both stats blow their tight thresholds.
    assert not rowsv["psi"]["passed"]
    assert not rowsv["chi2"]["passed"]

    # metric equals the operator-level computation (NULLs excluded)
    cats = sorted(baseline)
    hist = categorical_histogram(df, "et", cats)
    bl = {i: baseline[c] for i, c in enumerate(cats)}
    expect = float(psi_value_df(hist, bl, spark).first()["value"])
    assert rowsv["psi"]["metric_value"] == pytest.approx(expect,
                                                        rel=1e-12)

    # a distribution matching the baseline passes
    match = df.where(F.col("et").isin("click", "view")) \
        .unionByName(spark.createDataFrame(
            [(1000 + i, "signup") for i in range(20)],
            "id: long, et: string"))
    ok = CheckSuite({"properties": {"et": {"x-drift": {
        "categorical": True, "baseline": baseline,
        "psiMax": 0.01, "chi2Max": 0.01}}}}).run(match, key="id")
    assert all(r["passed"] for r in ok.verdicts.collect()
               if "/x-drift/" in r["check_id"])

    # unordered categories: ksMax/emdMax rejected at spec level
    for bad_stat in ("ksMax", "emdMax"):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"et": {"x-drift": {
                "categorical": True, "baseline": baseline,
                bad_stat: 0.1}}}})
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"et": {"x-drift": {
            "categorical": True, "cells": {}, "baseline": baseline,
            "psiMax": 1.0}}}})


def test_kl_jsd_exact_values(spark):
    """KL and JSD against hand-computed values (ε = 1e-9 smoothing), plus
    the analytic properties that distinguish them from PSI: KL is
    directional; JSD is symmetric and bounded by ln 2 even on disjoint
    supports (where KL/PSI blow up with the ε floor)."""
    import math

    from jsonschema_valid_spark.operators.drift import (
        jsd_value_df,
        kl_value_df,
    )

    eps = 1e-9

    def kl_py(po, pb):
        return sum(o * math.log((o + eps) / (b + eps))
                   for o, b in zip(po, pb))

    def jsd_py(po, pb):
        return sum(0.5 * o * math.log((o + eps) / ((o + b) / 2 + eps))
                   + 0.5 * b * math.log((b + eps) / ((o + b) / 2 + eps))
                   for o, b in zip(po, pb))

    def run(fn, obs_rows, base):
        h = spark.createDataFrame(obs_rows, "bucket long, count long")
        return float(fn(h, base, spark).first()["value"])

    obs = [(0, 40), (1, 30), (2, 30)]
    base = {0: 25, 1: 50, 2: 25}
    po, pb = [0.4, 0.3, 0.3], [0.25, 0.5, 0.25]
    assert run(kl_value_df, obs, base) == pytest.approx(
        kl_py(po, pb), rel=1e-12)
    assert run(jsd_value_df, obs, base) == pytest.approx(
        jsd_py(po, pb), rel=1e-12)

    # identical distributions: both zero
    assert run(kl_value_df, [(0, 5), (1, 5)], {0: 5, 1: 5}) \
        == pytest.approx(0.0, abs=1e-9)
    assert run(jsd_value_df, [(0, 5), (1, 5)], {0: 5, 1: 5}) \
        == pytest.approx(0.0, abs=1e-9)

    # asymmetry: D(obs‖base) ≠ D(base‖obs) on a skewed pair
    fwd = run(kl_value_df, obs, base)
    rev = run(kl_value_df, [(0, 25), (1, 50), (2, 25)], {0: 40, 1: 30, 2: 30})
    assert fwd != pytest.approx(rev, rel=1e-6)

    # disjoint supports: JSD ≤ ln 2 (bounded), KL explodes toward ln(1/ε)
    dj_jsd = run(jsd_value_df, [(0, 10)], {5: 10})
    dj_kl = run(kl_value_df, [(0, 10)], {5: 10})
    assert dj_jsd == pytest.approx(math.log(2), rel=1e-3)
    assert dj_kl > 10.0


def test_x_drift_kl_jsd_keyword(spark, baseline):
    """x-drift klMax/jsdMax: unshifted passes, shifted fails, and the
    categorical mode accepts both (per-bucket statistics are valid for
    unordered categories)."""
    spec = {"properties": {"n_tok": {"x-drift": {
        "baseline": baseline, "bucketWidth": BUCKET,
        "klMax": 0.05, "jsdMax": 0.02}}}}
    res = CheckSuite(spec).run(_gen(spark, 20000), key="doc_id")
    rows = {r["check_id"].rsplit("/", 1)[-1]: r
            for r in res.verdicts.collect() if "/x-drift/" in r["check_id"]}
    assert set(rows) == {"kl", "jsd"}
    assert rows["kl"]["passed"] and rows["jsd"]["passed"]

    res2 = CheckSuite(spec).run(_gen(spark, 20000, shift=40), key="doc_id")
    rows2 = {r["check_id"].rsplit("/", 1)[-1]: r
             for r in res2.verdicts.collect() if "/x-drift/" in r["check_id"]}
    assert not rows2["kl"]["passed"]
    assert not rows2["jsd"]["passed"]

    cat_rows = ([("click",)] * 50 + [("view",)] * 30 + [("refund",)] * 20)
    df = spark.createDataFrame(
        [(i, c) for i, (c,) in enumerate(cat_rows)], "id: long, et: string")
    cres = CheckSuite({"properties": {"et": {"x-drift": {
        "categorical": True, "baseline": {"click": 50, "view": 30,
                                          "signup": 20},
        "klMax": 0.01, "jsdMax": 0.01}}}}).run(df, key="id")
    crows = {r["check_id"].rsplit("/", 1)[-1]: r
             for r in cres.verdicts.collect() if "/x-drift/" in r["check_id"]}
    # 20% of mass sits in the undeclared 'refund' bucket: both fail
    assert not crows["kl"]["passed"]
    assert not crows["jsd"]["passed"]


def test_quantile_histogram_buckets(spark):
    from jsonschema_valid_spark.operators.drift import quantile_histogram

    df = spark.createDataFrame(
        [(v,) for v in [1.0, 2.0, 5.0, 5.0, 9.0, 100.0, None]], "v: double")
    # edges [2, 5, 10]: buckets (-inf,2)=0, [2,5)=1, [5,10)=2, [10,inf)=3
    got = {r["bucket"]: r["count"]
           for r in quantile_histogram(df, "v", [2.0, 5.0, 10.0]).collect()}
    assert got == {0: 1, 1: 1, 2: 3, 3: 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        quantile_histogram(df, "v", [])
    with _pt.raises(ValueError):
        quantile_histogram(df, "v", [2.0, 2.0, 5.0])
    with _pt.raises(ValueError):
        quantile_histogram(df, "v", [5.0, 2.0])


def test_edges_mode_verdicts_and_emd_refusal(spark):
    import pytest as _pt

    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.suite.spec import SuiteError, \
        validate_suite_spec

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("double").alias("v"))
    # baseline = the same distribution bucketed by its own quartile edges
    node = {"edges": [25.0, 50.0, 75.0],
            "baseline": {0: 250, 1: 250, 2: 250, 3: 250},
            "psiMax": 0.05, "ksMax": 0.05, "chi2Max": 0.05}
    res = CheckSuite({"properties": {"v": {"x-drift": node}}}).run(
        df, key="doc_id")
    assert res.ok() is True
    # shift the whole distribution up: every statistic trips
    shifted = df.withColumn("v", F.col("v") + 60.0)
    res2 = CheckSuite({"properties": {"v": {"x-drift": node}}}).run(
        shifted, key="doc_id")
    got = {r["check_id"].rsplit("/", 1)[1]: r["passed"]
           for r in res2.verdicts.collect()}
    assert got == {"psi": False, "ks": False, "chi2": False}

    bad = dict(node, emdMax=1.0)
    with _pt.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-drift": bad}}})
    with _pt.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-drift": {
            "edges": [3.0, 1.0], "baseline": {0: 1}, "psiMax": 0.1}}}})
    with _pt.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-drift": {
            "edges": [1.0], "bucketWidth": 2.0, "baseline": {0: 1},
            "psiMax": 0.1}}}})


def test_edges_mode_per_partition(spark):
    """x-drift {'edges', 'perPartition': true}: the drifted source is
    NAMED; the per-partition path buckets by the same quantile edges as
    the global path (the fixed-width expression would silently test a
    different histogram)."""
    from jsonschema_valid_spark import CheckSuite

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("healthy"))
         .otherwise(F.lit("drifted")).alias("src"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 100).cast("double"))
         .otherwise((F.col("id") % 100 + 60).cast("double")).alias("v"))
    node = {"edges": [25.0, 50.0, 75.0],
            "baseline": {0: 250, 1: 250, 2: 250, 3: 250},
            "psiMax": 0.1, "ksMax": 0.1, "perPartition": True}
    res = CheckSuite({"properties": {"v": {"x-drift": node}}}).run(
        df, key="doc_id", partition_by="src")
    verd = {(r["partition_id"], r["check_id"].rsplit("/", 1)[1]):
            r["passed"] for r in res.verdicts.collect()
            if "x-drift" in r["check_id"]}
    assert verd[("healthy", "psi")] is True
    assert verd[("healthy", "ks")] is True
    assert verd[("drifted", "psi")] is False
    assert verd[("drifted", "ks")] is False


def test_update_drift_baseline_tracks_slow_drift(spark):
    """Exponential-decay maintenance: repeated trusted updates let the
    baseline follow slow legitimate evolution; without updates the stale
    node trips on data the maintained node accepts."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.drift import (
        update_drift_baseline,
    )
    from jsonschema_valid_spark.operators.profile import (
        suggest_drift_baseline,
    )

    def gen(n, tilt):
        # fixed support, gradually tilting mix: `tilt`/10 of the rows are
        # confined to the lower half — the slow legitimate evolution a
        # pinned baseline must be allowed to follow (a SUPPORT shift is
        # different: new buckets against ~zero baseline mass explode PSI
        # by design, maintained or not)
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < tilt, (F.col("id") * 37) % 50)
             .otherwise((F.col("id") * 37) % 100)
            .cast("double").alias("v"))

    node = suggest_drift_baseline(gen(10000, 0), "v", bucket_width=10.0)
    stale = dict(node)
    # five epochs, each tilting 10% more mass into the lower half — each
    # step passes vs the MAINTAINED baseline and the node absorbs it
    cur = node
    for epoch in range(1, 6):
        snap = gen(10000, epoch)
        res = CheckSuite({"properties": {"v": {"x-drift": cur}}}).run(
            snap, key="doc_id")
        assert res.ok() is True, f"epoch {epoch} tripped maintained node"
        cur = update_drift_baseline(cur, snap, "v", decay=0.5)
    # the stale baseline trips on the final epoch's data (PSI ~0.275)
    final = gen(10000, 5)
    assert CheckSuite({"properties": {"v": {"x-drift": stale}}}).run(
        final, key="doc_id").ok() is False
    assert CheckSuite({"properties": {"v": {"x-drift": cur}}}).run(
        final, key="doc_id").ok() is True

    # decay=0 replaces outright; bounds validated; edges mode keeps edges
    import pytest as _pt
    rep = update_drift_baseline(node, gen(100, 0), "v", decay=0.0)
    assert sum(rep["baseline"].values()) == 100
    with _pt.raises(ValueError):
        update_drift_baseline(node, gen(10, 0), "v", decay=1.5)
    qn = {"edges": [30.0, 60.0], "baseline": {0: 10, 1: 10, 2: 10},
          "psiMax": 0.3}
    up = update_drift_baseline(qn, gen(300, 0), "v", decay=1.0)
    assert up["edges"] == [30.0, 60.0]
    assert sum(up["baseline"].values()) == 330


# ---- joint (multi-column) mode -------------------------------------------

def _joint_df(spark, swap=False):
    """(n_tok, source) rows: `swap` flips the length mix WITHIN each source
    while keeping both marginals identical — only a joint histogram can
    tell the two datasets apart."""
    rows = []
    for i in range(400):
        src = "news" if i % 2 == 0 else "web"
        short = (i % 2 == 0) != swap  # news↔short unless swapped
        rows.append((10 if short else 70, src, i))
    return spark.createDataFrame(rows, "n_tok int, source string, doc_id long")


def test_joint_histogram_cells_and_other(spark):
    from jsonschema_valid_spark.operators.drift import joint_histogram

    df = spark.createDataFrame(
        [(10, "news"), (70, "news"), (10, "web"), (200, "blog"),
         (None, "news"), (10, None)],
        "n_tok int, source string")
    dims = [{"column": "n_tok", "bucketWidth": 64.0}, {"column": "source"}]
    declared = ["0|news", "0|web", "1|news", "1|web"]
    got = {r["bucket"]: r["count"]
           for r in joint_histogram(df, dims, declared).collect()}
    # 10|news→0, 70|news→2, 10|web→1; 200|blog is an UNDECLARED cell → -1;
    # rows with a NULL in ANY dim are excluded (not aliased into '10' or
    # 'news' lower-arity cells)
    assert got == {0: 1, 2: 1, 1: 1, -1: 1}


def test_joint_drift_detects_mix_shift_marginals_blind(spark):
    """The defining property: swapping which source is long preserves BOTH
    marginal histograms (each per-column drift reads zero) but moves every
    row to a different joint cell — only x-drift joint fires."""
    from jsonschema_valid_spark.operators.drift import (
        categorical_histogram, histogram, joint_histogram, psi,
    )

    ref, cur = _joint_df(spark), _joint_df(spark, swap=True)
    dims = [{"column": "n_tok", "bucketWidth": 64.0}, {"column": "source"}]
    declared = ["0|news", "0|web", "1|news", "1|web"]
    base_joint = {r["bucket"]: r["count"] for r in
                  joint_histogram(ref, dims, declared).collect()}
    base_num = {r["bucket"]: r["count"] for r in
                histogram(ref, "n_tok", 64.0).collect()}
    base_cat = {r["bucket"]: r["count"] for r in
                categorical_histogram(ref, "source",
                                      ["news", "web"]).collect()}
    # marginals identical → PSI ≈ 0 on both per-column views
    assert psi(histogram(cur, "n_tok", 64.0), base_num, spark) < 1e-9
    assert psi(categorical_histogram(cur, "source", ["news", "web"]),
               base_cat, spark) < 1e-9
    # joint view: 100% of mass moved cells → large PSI
    assert psi(joint_histogram(cur, dims, declared),
               base_joint, spark) > 1.0


def test_x_drift_joint_keyword(spark):
    """Engine path: first dim inherits the attached property; verdicts per
    statistic; KS/EMD rejected at spec validation."""
    from jsonschema_valid_spark.suite.spec import SuiteError

    ref, cur = _joint_df(spark), _joint_df(spark, swap=True)
    base = {f"{r['b']}|{r['source']}": r["n"] for r in
            ref.groupBy(F.floor(F.col("n_tok") / 64.0).cast("long")
                        .alias("b"), "source")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    spec = {"properties": {"n_tok": {"x-drift": {
        "joint": [{"bucketWidth": 64.0}, {"column": "source"}],
        "baseline": base, "psiMax": 0.1, "chi2Max": 1.0,
        "klMax": 0.1, "jsdMax": 0.05}}}}
    ok = validate(ref, spec, key="doc_id")
    assert all(r["passed"] for r in ok.verdicts.collect())
    bad = validate(cur, spec, key="doc_id")
    verd = {r["check_id"]: r for r in bad.verdicts.collect()}
    assert not verd["properties/n_tok/x-drift/psi"]["passed"]
    assert not verd["properties/n_tok/x-drift/chi2"]["passed"]
    assert not verd["properties/n_tok/x-drift/kl"]["passed"]
    assert not verd["properties/n_tok/x-drift/jsd"]["passed"]

    with pytest.raises(SuiteError):
        CheckSuite({"properties": {"n_tok": {"x-drift": {
            "joint": [{"bucketWidth": 64.0}, {"column": "source"}],
            "baseline": base, "ksMax": 0.1}}}})
    with pytest.raises(SuiteError):  # only the first dim may omit column
        CheckSuite({"properties": {"n_tok": {"x-drift": {
            "joint": [{"bucketWidth": 64.0}, {}],
            "baseline": base, "psiMax": 0.1}}}})
    with pytest.raises(SuiteError):  # exclusive with bucketWidth
        CheckSuite({"properties": {"n_tok": {"x-drift": {
            "joint": [{"bucketWidth": 64.0}, {"column": "source"}],
            "bucketWidth": 8.0, "baseline": base, "psiMax": 0.1}}}})


def test_joint_drift_per_partition(spark):
    """perPartition joint: each partition's joint histogram vs the same
    baseline — a clean partition passes while the swapped one fails,
    inside ONE run."""
    ref = _joint_df(spark).withColumn("part", F.lit("clean"))
    cur = _joint_df(spark, swap=True).withColumn("part", F.lit("swapped"))
    both = ref.unionByName(cur)
    base = {f"{r['b']}|{r['source']}": r["n"] for r in
            _joint_df(spark)
            .groupBy(F.floor(F.col("n_tok") / 64.0).cast("long")
                     .alias("b"), "source")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    res = validate(both, {"properties": {"n_tok": {"x-drift": {
        "joint": [{"bucketWidth": 64.0}, {"column": "source"}],
        "baseline": base, "psiMax": 0.1, "perPartition": True}}}},
        key="doc_id", partition_by="part")
    verd = {(r["partition_id"], r["check_id"]): r["passed"]
            for r in res.verdicts.collect()}
    assert verd[("clean", "properties/n_tok/x-drift/psi")] is True
    assert verd[("swapped", "properties/n_tok/x-drift/psi")] is False
