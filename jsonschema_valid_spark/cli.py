"""spark-submit entry point (north_rule: "run via spark-submit --py-files").

    spark-submit --py-files jsonschema_valid_spark.zip \
        -m jsonschema_valid_spark.cli  \
        --suite suite.json --input /data/sequences --format parquet \
        --key doc_id --partition-by source --output /out/validation \
        [--resume] [--fail-fast]

Writes ``<output>/violations`` and ``<output>/verdicts`` (parquet); with
``--resume``, runs through :class:`CheckpointRunner` (per-partition lineage
under ``<output>/``, idempotent re-runs). Exit code 1 when validation fails
(any violation or failed verdict) — CI-friendly, mirroring the reference
CLI contract of ``validate() -> Err``.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="jsonschema-valid-spark")
    p.add_argument("--suite", help="path to the CheckSuite JSON")
    p.add_argument("--input", help="input table path")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "jsonl", "iceberg", "csv", "tsv", "orc"])
    p.add_argument("--key", default="doc_id")
    p.add_argument("--partition-by", default=None)
    p.add_argument("--output", help="output dir for results")
    p.add_argument("--resume", action="store_true",
                   help="checkpointed per-partition run with lineage")
    p.add_argument("--commit-protocol", default="overwrite",
                   choices=["overwrite", "snapshot"],
                   help="resume-mode output visibility: parquet dynamic "
                        "overwrite (default) or atomic snapshot-manifest "
                        "swap (Iceberg semantics)")
    p.add_argument("--fail-fast", action="store_true",
                   help="LIMIT-1 probe only; skip result materialization")
    p.add_argument("--check-suite", action="store_true",
                   help="validate ONLY the suite spec (walker + the "
                        "engine-hosted self-metaschema) and exit — the "
                        "analog of the reference's Config::validate_schema")
    p.add_argument("--package", metavar="ZIP", default=None,
                   help="build the reproducible --py-files archive of this "
                        "package at ZIP and exit (no Spark session)")
    p.add_argument("--exemplars", type=int, default=None, metavar="K",
                   help="cap the written violations at K deterministic "
                        "hash-ranked exemplars per check (full counts stay "
                        "in the verdicts) — the sink shape for runs whose "
                        "failing checks would emit violations at data scale")
    p.add_argument("--report", metavar="PATH", default=None,
                   help="write the bounded markdown run report "
                        "(ValidationResult.report) to PATH after a "
                        "non-resume run")
    p.add_argument("--verify-content", action="store_true",
                   help="on --resume, revalidate 'done' partitions whose "
                        "content fingerprint changed since validation "
                        "(late appends / backfill rewrites)")
    p.add_argument("--unique-index", metavar="TABLE:COLUMN[:PATH]",
                   default=None,
                   help="on --resume, maintain a historical UniqueIndex "
                        "(catalog bucketed TABLE over COLUMN): each "
                        "completed partition's values extend the index "
                        "as part of its completion (idempotent — a "
                        "resumed partition inserts nothing). With :PATH, "
                        "an existing index layout is ATTACHED to this "
                        "session's catalog first (fresh spark-submit "
                        "drivers: the files survive, the catalog does "
                        "not); otherwise the table must already exist")
    p.add_argument("--unique-index-buckets", type=int, default=None,
                   help="bucket count the index layout was written with "
                        "(attach-time DDL metadata). Normally OMIT this: "
                        "attach reads the count from the layout's "
                        "_index_meta.json sidecar, and an explicit value "
                        "that contradicts the sidecar is refused")
    p.add_argument("--vacuum-age", type=float, default=None,
                   metavar="SECONDS",
                   help="with --resume --commit-protocol snapshot: after "
                        "the run, expire crash-orphaned staging dirs older "
                        "than SECONDS (the remove_orphan_files analog; "
                        "never pass 0 while other writers run)")
    p.add_argument("--suggest-suite", metavar="PATH", default=None,
                   help="profile the input in one pass and write the "
                        "bootstrapped CheckSuite JSON to PATH, then exit "
                        "— the first suite nobody hand-writes "
                        "(operators/profile.py suite_from_profile); "
                        "review and commit the output, don't trust it "
                        "blindly")
    p.add_argument("--audit-schema", action="store_true",
                   help="pre-flight only: print the schema audit report "
                        "(missing required / undeclared / static type "
                        "mismatch ...) as JSON and exit — exit 1 if any "
                        "failing status; no data-scale job runs")
    p.add_argument("--explain", action="store_true",
                   help="print the formatted physical plans for the "
                        "violations and verdicts passes WITHOUT running "
                        "them — the pre-deploy shuffle/pushdown audit "
                        "(PLANS.md is this output, reviewed)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.package:
        from jsonschema_valid_spark.deploy import build_pyfiles_zip

        path = build_pyfiles_zip(args.package)
        print(json.dumps({"py_files": path,
                          "size": __import__("os").path.getsize(path)}))
        return 0

    if args.suggest_suite:
        if args.input is None:
            print("--suggest-suite requires --input", file=sys.stderr)
            return 2
        if args.format not in ("parquet", "iceberg", "orc"):
            # jsonl/csv need a spec to parse — circular for bootstrapping
            print("--suggest-suite needs a schema-ful source "
                  "(parquet/iceberg)", file=sys.stderr)
            return 2
        from pyspark.sql import SparkSession

        from jsonschema_valid_spark.operators.profile import (
            suite_from_profile,
        )

        spark = (SparkSession.builder
                 .appName("jsonschema-valid-spark").getOrCreate())
        df = (spark.table(args.input) if args.format == "iceberg"
              else spark.read.format(args.format).load(args.input))
        spec = suite_from_profile(df, key=args.key)
        with open(args.suggest_suite, "w") as f:
            json.dump(spec, f, indent=2, sort_keys=True)
        print(json.dumps({"suite": args.suggest_suite,
                          "columns": len(spec.get("properties", {}))}))
        return 0

    missing = [n for n in ("suite", "input", "output")
               if getattr(args, n) is None]
    if missing:
        print(f"missing required arguments: {', '.join('--' + m for m in missing)}",
              file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from jsonschema_valid_spark import CheckSuite

    spark = SparkSession.builder.appName("jsonschema-valid-spark").getOrCreate()
    with open(args.suite) as f:
        spec = json.load(f)

    if args.check_suite:
        from jsonschema_valid_spark.suite.metaschema import (
            validate_suite_with_engine,
        )
        from jsonschema_valid_spark.suite.spec import SuiteError

        try:
            CheckSuite(spec)  # walker (fast path) raises on first error
        except SuiteError as e:
            print(json.dumps({"suite_valid": False, "walker_error": str(e)}))
            return 1
        res = validate_suite_with_engine(spark, spec)
        bad = [{"at": r["doc_id"], "check": r["check_id"]}
               for r in res.violations.collect()]
        print(json.dumps({"suite_valid": not bad, "engine_violations": bad}))
        return 0 if not bad else 1

    suite = CheckSuite(spec)

    quarantine = None
    if args.format == "jsonl":
        from jsonschema_valid_spark.sources.jsonl import read_jsonl

        df = read_jsonl(spark, args.input, spec)
    elif args.format == "iceberg":
        df = spark.table(args.input)
    elif args.format in ("csv", "tsv"):
        # delimited text gets the PARSE GATE first: unparseable lines
        # become quarantine rows (written to <output>/quarantine and
        # counted in the exit code) instead of poisoning the suite input
        from jsonschema_valid_spark.sources.delimited import read_delimited

        df, quarantine = read_delimited(
            spark, args.input, spec,
            sep="\t" if args.format == "tsv" else ",")
    elif args.format == "orc":
        df = spark.read.orc(args.input)
    else:
        df = spark.read.parquet(args.input)

    if args.audit_schema:
        # pre-flight: the WHOLE structural gap list from the footer
        # schema, zero data-scale jobs (operators/schema_audit.py) —
        # run this before committing cluster hours to a 10^12-row pass
        from jsonschema_valid_spark.operators.schema_audit import (
            FAILING_STATUSES,
            schema_report,
        )

        rows = [r.asDict() for r in schema_report(suite, df).collect()]
        failing = [r for r in rows if r["status"] in FAILING_STATUSES]
        print(json.dumps({"schema_ok": not failing, "report": rows}))
        return 0 if not failing else 1

    def _quarantine_count() -> int:
        if quarantine is None:
            return 0
        quarantine.write.mode("overwrite").parquet(
            f"{args.output}/quarantine")
        return spark.read.parquet(f"{args.output}/quarantine").count()

    if args.resume:
        if not args.partition_by:
            print("--resume requires --partition-by", file=sys.stderr)
            return 2
        from jsonschema_valid_spark.checkpoint import (
            CheckpointRunner,
            SnapshotManifestCommit,
        )

        proto = (SnapshotManifestCommit(args.output.rstrip("/"))
                 if args.commit_protocol == "snapshot" else None)
        uidx = None
        if args.unique_index:
            from jsonschema_valid_spark.operators.unique_index import (
                UniqueIndex,
            )

            parts_ix = args.unique_index.split(":", 2)
            if len(parts_ix) < 2:
                print("--unique-index must be TABLE:COLUMN[:PATH]",
                      file=sys.stderr)
                return 2
            tbl, col = parts_ix[0], parts_ix[1]
            uidx = UniqueIndex(tbl, col,
                               buckets=args.unique_index_buckets)
            if len(parts_ix) == 3:
                uidx.attach(spark, parts_ix[2])
            if not uidx.exists(spark):
                print(f"--unique-index table {tbl!r} does not exist — "
                      "build it once with UniqueIndex.build, or pass "
                      "TABLE:COLUMN:PATH to attach the layout",
                      file=sys.stderr)
                return 2
        runner = CheckpointRunner(suite, args.output, commit_protocol=proto)
        summary = runner.run(df, partition_by=args.partition_by,
                             key=args.key, exemplars_k=args.exemplars,
                             verify_content=args.verify_content,
                             unique_index=uidx)
        # exit code covers ALL committed partitions — including ones
        # completed (and skipped) by previous interrupted runs — and failed
        # verdicts, not just this invocation's violation count
        failed = runner.failed(spark)
        n_quar = _quarantine_count()
        out = {
            "processed": summary.processed, "skipped": summary.skipped,
            "invalidated": summary.invalidated,
            "rows": summary.total_rows, "violations": summary.total_violations,
            "wall_ms": summary.wall_ms, "failed": failed,
        }
        if uidx is not None:
            out["indexed_values"] = summary.indexed_values
        if quarantine is not None:
            out["quarantined"] = n_quar
        if args.vacuum_age is not None and proto is not None:
            out["vacuumed"] = sum(
                len(proto.vacuum(kind, min_age_seconds=args.vacuum_age))
                for kind in ("violations", "verdicts"))
        print(json.dumps(out))
        return 1 if (failed or n_quar) else 0

    result = suite.run(df, key=args.key, partition_by=args.partition_by)
    if args.explain:
        print("== violations plan ==")
        result.violations.explain("formatted")
        print("== verdicts plan ==")
        result.verdicts.explain("formatted")
        return 0
    if args.fail_fast:
        ok = result.ok() and (quarantine is None or quarantine.isEmpty())
        print(json.dumps({"ok": ok}))
        return 0 if ok else 1

    viol_out = (result.exemplars(k=args.exemplars)
                if args.exemplars else result.violations)
    viol_out.write.mode("overwrite").parquet(f"{args.output}/violations")
    result.verdicts.write.mode("overwrite").parquet(f"{args.output}/verdicts")
    n_viol = spark.read.parquet(f"{args.output}/violations").count()
    n_fail = (spark.read.parquet(f"{args.output}/verdicts")
              .where("passed = false").count())
    n_quar = _quarantine_count()
    out = {"violations": n_viol, "failed_verdicts": n_fail}
    if args.exemplars:
        # written count is the CAP, not the total — that lives in verdicts
        out = {"violations_written": n_viol, "failed_verdicts": n_fail,
               "exemplars_k": args.exemplars}
    if quarantine is not None:
        out["quarantined"] = n_quar
    if args.report:
        with open(args.report, "w") as f:
            f.write(result.report())
        out["report"] = args.report
    print(json.dumps(out))
    return 0 if (n_viol == 0 and n_fail == 0 and n_quar == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
