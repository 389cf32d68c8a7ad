"""Privacy-release pipeline — the k/l/t trio composed end-to-end over a
release candidate:

* ``suggest_anonymity_floors``    — learn the k/l floors from the trusted
  snapshot's worst quasi cell (profile → suite loop);
* ``x-kAnonymity`` gate           — ONE suite node carries k + l + t:
  group-size floors, sensitive-diversity floors, and the t-closeness
  skew distance no size/diversity floor can see;
* ``suppress_thin_cells``         — the repair split: rows in failing
  cells route to quarantine, the released side is anonymous by
  construction (re-validated);
* post-release t re-check         — suppression changes the global
  distribution, so the skew gate runs AGAIN on the released table.

Run: ``python examples/privacy_release_pipeline.py [sf_dir]``.
Tested by tests/test_example_privacy_release.py at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def run_pipeline(spark: SparkSession, sf_dir: str) -> dict:
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.operators.anonymity import (
        suppress_thin_cells, t_closeness_violations)
    from jsonschema_valid_spark.operators.profile import (
        suggest_anonymity_floors)

    quasi = ["user_id", "event_type"]
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("sens", F.expr("CAST(floor(value / 25) AS INT)")))

    # 1. learn the floors from the (trusted) snapshot's worst cell
    node = suggest_anonymity_floors(ev, quasi, sensitive="sens")
    learned = dict(node) if node else None

    # 2. gate a RELEASE CANDIDATE that drifted below the floors: an
    #    upstream filter gutted one cell — user 3's views shrink to the
    #    first two by event_id (an EMPTIED cell would be invisible to a
    #    size floor: zero rows emit nothing — the x-rowCount caveat —
    #    so the fixture keeps a sliver, the detectable failure shape)
    gutted = F.col("user_id").eqNullSafe(F.lit(3)) & (
        F.col("event_type") == "view")
    survivors = (ev.where(gutted).orderBy("event_id").limit(2))
    candidate = ev.where(~F.coalesce(gutted, F.lit(False))).unionByName(
        survivors)
    gate_node = learned or {"quasi": quasi, "k": 2}
    res = CheckSuite({"x-kAnonymity": gate_node}).run(
        candidate, key="event_id")
    kl_violation_cells = {r["doc_id"]
                          for r in res.violations.collect()}

    # the SKEW gate runs beside it: per-user event-type mix within
    # TVD 0.12 of the global (the distance k/l are blind to)
    skew_users = {r["doc_id"] for r in t_closeness_violations(
        candidate, ["user_id"], "event_type", 0.12,
        "x-kAnonymity").collect()}

    # 3. repair: suppress the failing cells (k/l only — t-repair is
    #    generalization, a modeling decision)
    released, suppressed = suppress_thin_cells(
        candidate, quasi,
        k=gate_node.get("k"), l=gate_node.get("l"),
        sensitive="sens" if gate_node.get("l") else None)
    n_rel, n_sup, n_cand = (released.count(), suppressed.count(),
                            candidate.count())

    # 4. the released table passes its own k/l gate by construction…
    post = CheckSuite({"x-kAnonymity": gate_node}).run(
        released, key="event_id")
    post_kl_violations = post.violations.count()

    # …but t must be RE-CHECKED: suppression moved the global marginal
    post_skew_users = t_closeness_violations(
        released, ["user_id"], "event_type", 0.12,
        "x-kAnonymity").count()

    return {
        "learned_node": learned,
        "kl_violation_cells": sorted(kl_violation_cells),
        "skew_users": sorted(skew_users),
        "released_rows": n_rel,
        "suppressed_rows": n_sup,
        "split_exact": n_rel + n_sup == n_cand,
        "post_kl_violations": post_kl_violations,
        "post_skew_users": post_skew_users,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    for k, v in run_pipeline(spark, sf).items():
        print(f"{k}: {v}")
    spark.stop()
