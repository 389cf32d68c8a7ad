"""Statistical outlier validation: values far from their group's mean in
stddev units (``x-outlier``).

The data-aware lift of ``minimum``/``maximum`` (validators.rs literal
numeric bounds): the bound is LEARNED from the data itself — "no reading
may sit more than k sigma from its sensor's mean" — so one global literal
bound (which must be loose enough for the widest group) is replaced by a
per-group envelope. Complements ``x-stats`` (which bounds the group
AGGREGATES; this flags the individual ROWS that stray).

Scale contract (10^12 rows): two passes, NEITHER shuffling row data —
pass 1 is a map-side-combined (mean, stddev, count) aggregate whose output
is #groups rows; pass 2 broadcasts those stats back onto the fact scan as
a BroadcastHashJoin + codegen filter. The fact side is never
hash-partitioned (plan-asserted: no Exchange below the join on the fact
branch) — strictly cheaper than the window formulation, which would
shuffle every row on the group key. Groups must therefore be broadcast-
sized (#groups ≤ ~10^7): that is the natural regime for "per sensor /
per source / per shard" envelopes. NULL group values join null-safely
(their own envelope).

Statistical honesty: stddev is the SAMPLE stddev of a group including the
candidate outlier itself (masking: one extreme value inflates its own
group's sigma). ``min_count`` suppresses verdicts on groups too small for
the envelope to mean anything (default 2 — a 1-row group has no sample
stddev at all); zero-variance groups never violate (any deviation from a
constant column is caught by `const`/`enum`, not z-scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def outlier_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    by: str | None = None,
    max_z: float = 3.0,
    min_count: int = 2,
) -> DataFrame:
    """``x-outlier`` execution: rows whose ``column`` value deviates from
    their ``by``-group mean by more than ``max_z`` sample standard
    deviations, as engine violation rows (doc_id, check_id, observed,
    expected).

    ``by=None`` computes ONE global envelope (single-row aggregate,
    broadcast cross join). observed = ``v=<decimal(20,4)>,z=<decimal(10,
    2)>`` — decimal renderings so the witness strings are cross-engine
    stable regardless of double formatting.
    """
    max_z = float(max_z)
    min_count = int(min_count)
    val = F.col(column).cast("double")
    if by is not None:
        stats = df.groupBy(F.col(by).alias("__grp")).agg(
            F.avg(val).alias("__mu"),
            F.stddev_samp(val).alias("__sigma"),
            F.count(val).alias("__n"),
        )
        joined = df.join(F.broadcast(stats),
                         F.col(by).eqNullSafe(F.col("__grp")))
    else:
        stats = df.agg(
            F.avg(val).alias("__mu"),
            F.stddev_samp(val).alias("__sigma"),
            F.count(val).alias("__n"),
        )
        joined = df.crossJoin(F.broadcast(stats))
    z = (val - F.col("__mu")) / F.col("__sigma")
    bad = (
        val.isNotNull()
        & F.col("__sigma").isNotNull()
        & (F.col("__sigma") > 0)
        & (F.col("__n") >= min_count)
        & (F.abs(z) > max_z)
    )
    scope = f" per {by}" if by else ""
    exp_msg = (f"abs(({column} - mean) / stddev) <= {max_z}{scope} "
               f"(min_count={min_count})")
    return (
        joined.where(bad)
        .select(
            F.col(key).cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("v="),
                val.cast("decimal(20,4)").cast("string"),
                F.lit(",z="),
                F.round(z, 2).cast("decimal(10,2)").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )
