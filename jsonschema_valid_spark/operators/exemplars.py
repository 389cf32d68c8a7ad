"""Violation exemplar capping — the scale-correct shape of a failing check's
output.

At 10^12 rows a single failing check can emit BILLIONS of violation rows;
writing them all is itself a job-killing cost, and no human reads past the
first handful. The verdicts already carry the full count per check
(metric_value) — what the violations sink needs is a bounded, DETERMINISTIC
sample: the same k exemplars for the same input, whatever the partitioning,
so reruns diff cleanly and the DuckDB oracle can replay the selection.

Selection = top-k by a seeded hash rank (portable_hash60 of the doc_id,
≙ the deterministic hash-gate sampling contract in functions/sampling.py)
— not head() (partition-order-dependent) and not a sort on doc_id alone
(returns the lexicographically-first doc_ids, which correlate with
ingestion order and hide late-data bugs; the hash rank is an unbiased
shuffle of the violations).

Scale contract: check_id has FEW distinct values (one per declared check),
so a single `Window.partitionBy(check_id)` funnels every violation row of a
hot check through one task — exactly the skew this engine's uniqueness
check salts against. Phase 1 ranks within (check_id, salt) — S× the
parallelism, ≤ S·k survivors per check — and only those ≤ S·k rows reach
the phase-2 global rank. Row data shuffles once (phase 2 moves ≤ S·k rows
per check, not the violation set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from jsonschema_valid_spark.functions.dedup import portable_hash60


def exemplar_violations(
    violations: DataFrame,
    k: int = 10,
    seed: int = 7,
    salt: int = 32,
    id_col: str = "doc_id",
    check_col: str = "check_id",
) -> DataFrame:
    """At most ``k`` deterministic exemplar rows per ``check_col`` value,
    selected by seeded-hash rank over ``id_col`` (ties broken by
    ``id_col`` then ``observed`` so exact-duplicate rows rank stably).
    All input columns pass through unchanged, plus ``exemplar_rank``
    (1..k within the check).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    h = portable_hash60(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    tie = [F.col(id_col), F.col("observed")] \
        if "observed" in violations.columns else [F.col(id_col)]
    staged = violations.withColumn("__h", h).withColumn(
        "__salt", F.pmod(F.col("__h"), F.lit(salt)))
    w1 = (Window.partitionBy(check_col, "__salt")
          .orderBy(F.col("__h"), *tie))
    survivors = (
        staged.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
    )
    w2 = Window.partitionBy(check_col).orderBy(F.col("__h"), *tie)
    return (
        survivors.withColumn("exemplar_rank", F.row_number().over(w2))
        .where(F.col("exemplar_rank") <= k)
        .drop("__h", "__salt", "__r1")
    )
