#!/usr/bin/env python
"""Extra benchmarks for the r6 optimization round (guide §1.1/§1.4) —
bench.py is FROZEN for measurement, so component isolation, plan capture
and quick per-component timing live here.

Usage:
    python bench_extra.py plans  <tag>  [comp ...]   # plans/r06/<comp>_<tag>.txt
    python bench_extra.py time   [comp ...]          # warm + best-of-3 per comp
    python bench_extra.py all    <tag>  [comp ...]   # both

Components mirror bench.py's `timed(...)` bodies exactly (same inputs,
same actions) so numbers are comparable 1:1 with the frozen harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (frozen harness: reused, never edited)

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def build_components(spark):
    """name -> (action_fn, [plan dataframes]) mirroring bench.run_bench."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.engine import run_suite_summarized
    from jsonschema_valid_spark.operators.anonymity import (
        anonymity_violations, t_closeness_violations,
    )
    from jsonschema_valid_spark.operators.cardinality import (
        distinct_ratio_violations,
    )
    from jsonschema_valid_spark.operators.compliance import (
        compliance_violations,
    )
    from jsonschema_valid_spark.operators.drift import histogram, psi
    from jsonschema_valid_spark.operators.frequency import heavy_hitters
    from jsonschema_valid_spark.operators.hierarchy import acyclic_violations
    from jsonschema_valid_spark.operators.ordering import monotonic_violations
    from jsonschema_valid_spark.operators.outliers import outlier_violations
    from jsonschema_valid_spark.operators.reciprocity import (
        reciprocity_violations,
    )
    from jsonschema_valid_spark.operators.referential import (
        domain_coverage, non_members,
    )
    from jsonschema_valid_spark.operators.seasonality import (
        seasonality_violations,
    )
    from jsonschema_valid_spark.operators.temporal import asof_join
    from jsonschema_valid_spark.operators.trend import trend_violations
    from jsonschema_valid_spark.operators.uniqueness import duplicate_keys

    seq = spark.read.parquet(bench.materialize_input(spark, bench.BENCH_ROWS))
    domain = [f"src{i}" for i in range(1, 21)]
    suite = CheckSuite(bench.flagship_suite(domain))
    dom_df = spark.createDataFrame([(s,) for s in domain], "source string")
    did = F.substring(F.col("doc_id"), 5, 12).cast("long")

    comps: dict[str, tuple] = {}

    def full_validation():
        res = run_suite_summarized(suite, seq, key="doc_id",
                                   partition_by="source")
        nv = res.violations.count()
        verd = res.verdicts.collect()
        res.unpersist()
        return nv, len(verd)

    _fl_res = run_suite_summarized(suite, seq, key="doc_id",
                                   partition_by="source")
    comps["flagship_full"] = (full_validation,
                              {"flagship_violations": _fl_res.violations,
                               "flagship_verdicts": _fl_res.verdicts})

    def row_pass():
        r = suite.run(seq, key="doc_id", partition_by="source")
        n = (r.violations
             .where(F.col("check_id") != "properties/doc_id/x-unique")
             .count())
        r.unpersist()
        return n

    _rp = suite.run(seq, key="doc_id", partition_by="source")
    comps["row_pass_violations"] = (
        row_pass,
        {"row_pass_violations": _rp.violations.where(
            F.col("check_id") != "properties/doc_id/x-unique")})
    _rp.unpersist()

    comps["unique_salted"] = (
        lambda: duplicate_keys(seq, "doc_id").count(),
        {"unique_salted": duplicate_keys(seq, "doc_id")})
    comps["referential_anti"] = (
        lambda: non_members(seq, "source", dom_df).count(),
        {"referential_anti": non_members(seq, "source", dom_df)})
    comps["coverage_semi_distinct"] = (
        lambda: domain_coverage(seq, "source", dom_df).collect(),
        {"coverage_semi_distinct": domain_coverage(seq, "source", dom_df)})
    comps["hist_psi"] = (
        lambda: psi(histogram(seq, "n_tok", 16.0),
                    {b: 100 for b in range(0, 9)}, spark),
        {"hist_psi": histogram(seq, "n_tok", 16.0)})
    comps["monotonic_window"] = (
        lambda: monotonic_violations(
            seq, "n_tok", "bench", key="doc_id", order_by="doc_id",
            by="source").count(),
        {"monotonic_window": monotonic_violations(
            seq, "n_tok", "bench", key="doc_id", order_by="doc_id",
            by="source")})
    comps["outlier_broadcast"] = (
        lambda: outlier_violations(
            seq, "n_tok", "bench", key="doc_id", by="source",
            max_z=6.0).count(),
        {"outlier_broadcast": outlier_violations(
            seq, "n_tok", "bench", key="doc_id", by="source", max_z=6.0)})

    asof_left = seq.select(
        "source", F.timestamp_micros(did * 1000).alias("ts"), did.alias("n"))
    asof_right = (seq.where(did % 97 == 0)
                  .select("source",
                          F.timestamp_micros(did * 1000).alias("ts"),
                          did.alias("rid")))
    asof_df = (asof_join(asof_left, asof_right, on="source", left_ts="ts",
                         right_cols=["rid"], right_tiebreak="rid")
               .where(F.col("asof_rid").isNotNull()))
    comps["asof_union_window"] = (lambda: asof_df.count(),
                                  {"asof_union_window": asof_df})

    freq_src = seq.select(
        F.when(did % 5 == 0, F.lit("hot")).otherwise(F.col("doc_id"))
        .alias("v"))
    comps["frequency_sketch"] = (
        lambda: heavy_hitters(freq_src, "v", max_fraction=0.1).count(),
        {"frequency_sketch": None})  # plan is multi-job; captured via parts

    mom = seq.select("source", did.alias("did"), "n_tok")
    comps["moment_aggregates"] = (
        lambda: (trend_violations(mom, "n_tok", "b", order_by="did",
                                  by="source", min_slope=-1.0,
                                  max_slope=1.0).count()
                 + compliance_violations(mom, "n_tok", "b",
                                         expr="n_tok > 16", min_rate=0.99,
                                         by="source").count()
                 + distinct_ratio_violations(mom, "n_tok", "b", by="source",
                                             min_ratio=0.5).count()),
        {"moment_trend": trend_violations(
            mom, "n_tok", "b", order_by="did", by="source",
            min_slope=-1.0, max_slope=1.0),
         "moment_compliance": compliance_violations(
            mom, "n_tok", "b", expr="n_tok > 16", min_rate=0.99,
            by="source"),
         "moment_distinct_ratio": distinct_ratio_violations(
            mom, "n_tok", "b", by="source", min_ratio=0.5)})

    hier = seq.select(
        did.alias("nid"),
        F.when(did % 26 == 0, did + 1)
        .when((did > 1) & ((did - 1) % 26 == 0), did - 1)
        .when(did <= 1, F.lit(None).cast("long"))
        .otherwise((did / F.lit(2)).cast("long")).alias("pid"))
    comps["hierarchy_doubling"] = (
        lambda: acyclic_violations(hier, "nid", "b", parent_col="pid",
                                   max_depth=32).count(),
        {"hierarchy_doubling": None})  # iterative: plan from final DF only

    pair = seq.select(
        did.alias("a"),
        F.when(did % 17 == 0, did + 2)
        .when(did % 2 == 0, did + 1)
        .otherwise(did - 1).alias("b"))
    comps["pair_symmetry"] = (
        lambda: reciprocity_violations(pair, "a", "b1", with_col="b").count(),
        {"pair_symmetry": reciprocity_violations(pair, "a", "b1",
                                                 with_col="b")})
    comps["acf_window"] = (
        lambda: seasonality_violations(
            mom, "n_tok", "b2", key="did", order_by="did", lag=8,
            by="source", min_acf=-1.0, max_acf=1.0).count(),
        {"acf_window": seasonality_violations(
            mom, "n_tok", "b2", key="did", order_by="did", lag=8,
            by="source", min_acf=-1.0, max_acf=1.0)})

    anon = seq.select((did % 4096).alias("cell_key"), "source", "n_tok")
    comps["anonymity_cells"] = (
        lambda: (anonymity_violations(anon, ["cell_key", "source"], "b",
                                      k=8, l=2, sensitive="n_tok").count()
                 + t_closeness_violations(anon, ["cell_key"], "source", 0.9,
                                          "b").count()),
        {"anonymity_kl": anonymity_violations(
            anon, ["cell_key", "source"], "b", k=8, l=2,
            sensitive="n_tok"),
         "anonymity_tcloseness": t_closeness_violations(
            anon, ["cell_key"], "source", 0.9, "b")})
    return comps


def capture_plans(comps, tag: str, names):
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        _, plan_dfs = comps[name]
        for pname, df in plan_dfs.items():
            if df is None:
                continue
            path = os.path.join(PLANS_DIR, f"{pname}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {path}", file=sys.stderr)


def time_components(comps, names, repeats: int = 3):
    # global warm phase first (JIT + page cache + codegen settle): every
    # requested component runs twice untimed before ANY timing starts —
    # bench.py's components run after minutes of flagship warmup, so a
    # per-component single warm here under-warms and is not comparable
    for _ in range(2):
        for name in names:
            comps[name][0]()
    out = {}
    for name in names:
        fn, _ = comps[name]
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
        print(f"{name}: {min(runs)} {runs}", file=sys.stderr)
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode in ("plans", "all"):
        tag = sys.argv[2]
        names = sys.argv[3:]
    else:
        tag = None
        names = sys.argv[2:]
    spark = bench.make_spark()
    spark.sparkContext.setLogLevel("WARN")
    comps = build_components(spark)
    names = list(names) or list(comps)
    probe = bench.control_probe()
    if mode in ("plans", "all"):
        capture_plans(comps, tag, names)
    if mode in ("time", "all"):
        res = time_components(comps, names)
        print(json.dumps({"probe_mops": probe, "timings": res}))
    spark.stop()
