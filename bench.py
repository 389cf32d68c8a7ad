#!/usr/bin/env python
"""Benchmark harness: flagship validation throughput + component timings.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env knobs:
    SPARK_GRAFT_SF_DIR      parquet dir for table-backed queries (default sf0.1)
    SPARK_GRAFT_CPUS        local[N] parallelism (default 32)
    SPARK_GRAFT_BENCH_ROWS  generated sequence rows for the flagship job
                            (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))


def make_spark(cpus: int = CPUS) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jsonschema-valid-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        # the bench table is only a few GB — without this, default 128MB
        # split packing yields ~30 read tasks and the scan can't use 32
        # cores (at 100TB this knob is moot: file count ≫ cores)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        # shuffle/spill on tmpfs: the sandbox's virtio disk is bursty and
        # was the dominant run-to-run variance source (±70% → ±20%)
        .config("spark.local.dir", "/dev/shm/spark-local")
        .getOrCreate()
    )


def flagship_suite(domain: list[str]) -> dict:
    return {
        "$id": "flagship-sequence-validation",
        "version": 7,
        "required": ["doc_id", "tokens", "n_tok"],
        "properties": {
            "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$",
                       "x-unique": True},
            "tokens": {"type": "array", "minItems": 1, "maxItems": 8192,
                       "items": {"type": "integer", "minimum": 0,
                                 "exclusiveMaximum": 50257}},
            "n_tok": {"type": "integer", "minimum": 1, "maximum": 8192,
                      "x-stats": {"min": {"min": 1}, "avg": {"min": 8, "max": 256}}},
            "source": {"type": "string", "x-nullRate": {"max": 0.05},
                       "enum": domain + ["BOGUS_SENTINEL"]},
        },
        "x-rowExpr": "n_tok = size(tokens)",
    }


def materialize_input(spark: SparkSession, n_rows: int) -> str:
    """Write the generated sequences table to parquet ONCE (excluded from
    timings) — the benchmark then measures scan-based validation, matching
    the deploy shape (read an Iceberg/parquet table, validate it)."""
    from jsonschema_valid_spark.sources.sequences import generate_sequences

    path = os.environ.get(
        "SPARK_GRAFT_BENCH_DATA", f"/tmp/spark_graft_bench_{n_rows}.parquet")
    if not os.path.exists(path):
        cpus = spark.sparkContext.defaultParallelism
        generate_sequences(spark, n_rows, partitions=cpus * 4).write.mode(
            "overwrite").parquet(path)
    return path


def control_probe(n: int = 20_000_000) -> float:
    """Machine-state control probe: single-thread Python arithmetic
    throughput in Mops/s. The sandbox host has hour-scale performance
    phases (identical Spark plans swinging 3×+); the probe is Spark-free,
    so a low probe reading marks 'slow host phase', not a plan regression.
    Recorded in the bench JSON so a reader can judge confidence without
    re-running (VERDICT r2 item 4)."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc += i * i
    dt = time.perf_counter() - t0
    assert acc >= 0
    return round(n / dt / 1e6, 1)


def _spread(runs: list[float]) -> float:
    return round(max(runs) / min(runs) - 1.0, 3)


def run_bench(spark: SparkSession, n_rows: int = BENCH_ROWS) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.drift import histogram, psi
    from jsonschema_valid_spark.operators.referential import non_members
    from jsonschema_valid_spark.operators.uniqueness import duplicate_keys

    timings: dict[str, float] = {}
    component_runs: dict[str, list[float]] = {}
    cpus = spark.sparkContext.defaultParallelism
    seq = spark.read.parquet(materialize_input(spark, n_rows))
    domain = [f"src{i}" for i in range(1, 21)]

    def timed(name, fn):
        # the same confidence machinery as the flagship (VERDICT r3 item 4:
        # r3's committed row_pass_violations 19.4 s was host-phase noise a
        # re-run disproved at 4.76 s): warm once untimed, then best-of-3
        # with retry-on-spread — min approximates steady state
        fn()
        runs: list[float] = []
        out = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            runs.append(round(time.perf_counter() - t0, 3))
        extra = 0
        while _spread(runs) > 0.20 and extra < 3:
            t0 = time.perf_counter()
            out = fn()
            runs.append(round(time.perf_counter() - t0, 3))
            extra += 1
        timings[name] = min(runs)
        component_runs[name] = runs
        return out

    suite = CheckSuite(flagship_suite(domain))

    # headline: full validation via the summarized engine — ONE heavy scan
    # (all row checks + violations, persisted) + ONE slim agg scan (column
    # pruning drops the token arrays) + salted uniqueness + referential
    def full_validation():
        from jsonschema_valid_spark.engine import run_suite_summarized

        res = run_suite_summarized(suite, seq, key="doc_id",
                                   partition_by="source")
        # violations.count() materializes the persisted heavy pass once;
        # verdicts then read the cached violations + run only the slim scan
        nv = res.violations.count()
        verd = res.verdicts.collect()
        res.unpersist()
        return nv, len(verd)

    # warm run (untimed): JIT-compile the generated code, page-cache the
    # input, settle codegen — then best-of-3 timed runs (the sandbox host
    # has hour-scale performance phases with run-to-run swings up to 3×
    # on identical plans; min approximates steady state, which is what
    # extrapolates to a long 100TB job)
    full_validation()

    probe_before = control_probe()
    flagship_runs = []
    nv = nverd = 0
    for _ in range(3):
        t0 = time.perf_counter()
        nv, nverd = full_validation()
        flagship_runs.append(round(time.perf_counter() - t0, 3))
    # self-describing confidence: when the 3-run spread exceeds the
    # documented ±20% band, keep re-running (up to 5 extra) — the min
    # approximates steady state; if the spread never settles, flag the
    # JSON as noisy instead of publishing a silent outlier (the r2 file
    # published a 6× 'regression' that was pure host phase)
    extra = 0
    while _spread(flagship_runs) > 0.20 and extra < 5:
        t0 = time.perf_counter()
        nv, nverd = full_validation()
        flagship_runs.append(round(time.perf_counter() - t0, 3))
        extra += 1
    probe_after = control_probe()
    timings["flagship_full"] = min(flagship_runs)

    # components — each run rebuilds its ValidationResult and unpersists it:
    # suite.run PERSISTS the violations pass, so reusing one result across
    # timed repetitions would measure cache reads, not the compute (the
    # warm-up call would materialize the cache and every timed run would
    # read it back)
    def row_pass():
        r = suite.run(seq, key="doc_id", partition_by="source")
        n = (r.violations
             .where(F.col("check_id") != "properties/doc_id/x-unique").count())
        r.unpersist()
        return n

    timed("row_pass_violations", row_pass)

    # agg component: the SLIM second pass in isolation — violations are
    # materialized once untimed so the row-verdict counters read from cache
    # and the timing covers the pruned agg scan + verdict assembly
    res_shared = suite.run(seq, key="doc_id", partition_by="source")
    res_shared.violations.count()
    timed("agg_pass_verdicts", lambda: res_shared.verdicts
          .where(~F.col("check_id").contains("x-unique")).collect())
    res_shared.unpersist()
    timed("unique_salted", lambda: duplicate_keys(seq, "doc_id").count())
    dom_df = spark.createDataFrame([(s,) for s in domain], "source string")
    timed("referential_anti", lambda: non_members(seq, "source", dom_df).count())
    # r5: the REVERSE direction — domain-side coverage (x-referential
    # coverageMin): broadcast semi-join (fact never shuffles) + a
    # #domain-bounded count-distinct
    from jsonschema_valid_spark.operators.referential import domain_coverage

    timed("coverage_semi_distinct", lambda: domain_coverage(
        seq, "source", dom_df).collect())
    timed("hist_psi", lambda: psi(
        histogram(seq, "n_tok", 16.0),
        {b: 100 for b in range(0, 9)}, spark))
    # r4 continuation: the window-lag family (x-monotonic) — one Exchange
    # on the 20-value source key + per-partition sort, the worst-case
    # group-skew shape for the operator
    from jsonschema_valid_spark.operators.ordering import (
        monotonic_violations,
    )

    timed("monotonic_window", lambda: monotonic_violations(
        seq, "n_tok", "bench", key="doc_id", order_by="doc_id",
        by="source").count())
    # r4 wave 5: the broadcast-envelope family (x-outlier) — #groups-row
    # stats aggregate broadcast back onto the fact scan; the fact side is
    # never hash-partitioned, so this times two scans + one tiny shuffle
    from jsonschema_valid_spark.operators.outliers import (
        outlier_violations,
    )

    timed("outlier_broadcast", lambda: outlier_violations(
        seq, "n_tok", "bench", key="doc_id", by="source",
        max_z=6.0).count())
    # r4 wave 6: the union+window merge family (asof_join) — left = the
    # full generated table, right = a ~1% slice, both shuffled ONCE
    # together on the 20-value source key (worst-case key skew for the
    # per-partition sort; fan-out-independent by construction)
    from jsonschema_valid_spark.operators.temporal import asof_join

    did = F.substring(F.col("doc_id"), 5, 12).cast("long")
    asof_left = seq.select(
        "source", F.timestamp_micros(did * 1000).alias("ts"),
        did.alias("n"))
    asof_right = (seq.where(did % 97 == 0)
                  .select("source",
                          F.timestamp_micros(did * 1000).alias("ts"),
                          did.alias("rid")))
    timed("asof_union_window", lambda: asof_join(
        asof_left, asof_right, on="source", left_ts="ts",
        right_cols=["rid"], right_tiebreak="rid")
        .where(F.col("asof_rid").isNotNull()).count())

    # r4 wave 15: the mergeable-sketch family (x-maxFrequency sketch mode)
    # — phase 1 Arrow-batched Misra-Gries counters per partition (no
    # shuffle of raw values), tiny estimate merge, exact re-count of only
    # the candidate list (In-filter pushed to the scan). High-cardinality
    # input by construction: a 20% hot value over a unique tail.
    from jsonschema_valid_spark.operators.frequency import heavy_hitters

    freq_src = seq.select(
        F.when(did % 5 == 0, F.lit("hot"))
        .otherwise(F.col("doc_id")).alias("v"))
    timed("frequency_sketch", lambda: heavy_hitters(
        freq_src, "v", max_fraction=0.1).count())

    # r4 waves 17-23: the moment/conditional-aggregate family (x-trend
    # OLS slope, x-compliance pass-rate, x-distinctRatio exact distinct)
    # — each ONE map-side-combined aggregate shuffling #groups rows;
    # distinctRatio's exact mode pays the honest Expand cost
    from jsonschema_valid_spark.operators.cardinality import (
        distinct_ratio_violations,
    )
    from jsonschema_valid_spark.operators.compliance import (
        compliance_violations,
    )
    from jsonschema_valid_spark.operators.trend import trend_violations

    mom = seq.select("source", did.alias("did"), "n_tok")
    timed("moment_aggregates", lambda: (
        trend_violations(mom, "n_tok", "b", order_by="did", by="source",
                         min_slope=-1.0, max_slope=1.0).count()
        + compliance_violations(mom, "n_tok", "b", expr="n_tok > 16",
                                min_rate=0.99, by="source").count()
        + distinct_ratio_violations(mom, "n_tok", "b", by="source",
                                    min_ratio=0.5).count()))

    # r4 wave 30: the iterative pointer-doubling family (x-acyclic) — a
    # deterministic parent derivation over the row ids (halving forest +
    # seeded 2-cycles at (26k, 26k+1)); O(n log D) bounded equi-joins,
    # the jump table shrinking as chains resolve
    from jsonschema_valid_spark.operators.hierarchy import (
        acyclic_violations,
    )

    hier = seq.select(
        did.alias("nid"),
        F.when(did % 26 == 0, did + 1)
        .when((did > 1) & ((did - 1) % 26 == 0), did - 1)
        .when(did <= 1, F.lit(None).cast("long"))
        .otherwise((did / F.lit(2)).cast("long")).alias("pid"))
    timed("hierarchy_doubling", lambda: acyclic_violations(
        hier, "nid", "b", parent_col="pid", max_depth=32).count())

    # r4 waves 32-35: the canonical-cell + lag-window families —
    # x-reciprocal (one map-side-combined groupBy on (least, greatest),
    # never a self-join) and x-seasonality (one lag window whose
    # hash-partitioning the moment aggregate consumes); pair fixture =
    # mutual (2k, 2k+1) links with every 17th id defecting
    from jsonschema_valid_spark.operators.reciprocity import (
        reciprocity_violations,
    )
    from jsonschema_valid_spark.operators.seasonality import (
        seasonality_violations,
    )

    pair = seq.select(
        did.alias("a"),
        F.when(did % 17 == 0, did + 2)
        .when(did % 2 == 0, did + 1)
        .otherwise(did - 1).alias("b"))
    timed("pair_symmetry", lambda: reciprocity_violations(
        pair, "a", "b1", with_col="b").count())
    timed("acf_window", lambda: seasonality_violations(
        mom, "n_tok", "b2", key="did", order_by="did", lag=8,
        by="source", min_acf=-1.0, max_acf=1.0).count())

    # r4 waves 42-44: the privacy family — k/l cells are ONE
    # map-side-combined groupBy (+ count_distinct Expand for l);
    # t-closeness adds the per-value broadcast marginal + cell window
    # with integer-numerator distances
    from jsonschema_valid_spark.operators.anonymity import (
        anonymity_violations, t_closeness_violations,
    )

    anon = seq.select((did % 4096).alias("cell_key"), "source", "n_tok")
    timed("anonymity_cells", lambda: (
        anonymity_violations(anon, ["cell_key", "source"], "b",
                             k=8, l=2, sensitive="n_tok").count()
        + t_closeness_violations(anon, ["cell_key"], "source", 0.9,
                                 "b").count()))

    wall = timings["flagship_full"]
    totals = seq.agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.size("tokens")).alias("t")).first()
    n_rows, n_tokens = totals["n"], totals["t"]
    return {
        "metric": "validated sequences/sec (flagship suite, generated table)",
        "value": round(n_rows / wall, 1),
        # the headline value is a THROUGHPUT (the r1-r3 files said "sec" —
        # mislabeled, VERDICT r3 item 4); per-query timings below are secs
        "unit": "sequences/sec",
        "queries": timings,
        "query_runs": component_runs,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "rows": n_rows,
        "flagship_runs": flagship_runs,
        "tokens": int(n_tokens),
        "tokens_per_sec": round(n_tokens / wall, 1),
        "violations": nv,
        "verdict_rows": nverd,
        "cpus": cpus,
        # confidence block: single-thread control-probe Mops/s before/after
        # the timed runs + the flagship run spread; "noisy": true means the
        # spread never settled under ±20% even after retries — read the min
        # as steady state but trust cross-round comparisons accordingly
        "probe_mops": {"before": probe_before, "after": probe_after},
        "flagship_spread": _spread(flagship_runs),
        "noisy": _spread(flagship_runs) > 0.20,
    }


if __name__ == "__main__":
    spark = make_spark()
    out = run_bench(spark)
    print(json.dumps(out))
    spark.stop()
