"""Historical uniqueness index: incremental ``x-unique`` across appends.

``x-unique`` proves uniqueness WITHIN the validated table (salted
two-phase aggregate, operators/uniqueness.py — ≙ the reference's
uniqueItems set semantics, unique.rs, lifted cross-row). At 10^12 rows
with daily appends the contract a pipeline actually needs is stronger:
"today's doc_ids must not collide with ANY previously ingested doc_id" —
and re-running exact uniqueness over history+day re-shuffles a year of
data to validate a day. This module is the dataset-scope sibling of
:mod:`operators.states` (which made AGGREGATE checks incremental): it
makes MEMBERSHIP history incremental.

:class:`UniqueIndex` stores the distinct historical values ONCE as a
catalog bucketed table (`sources/bucketing.py::write_bucketed` —
hash-clustered by the value, the layout that makes key-clustered
operations exchange-free). Each increment is then:

* **probe** — the batch's distinct values (day-sized) joined against the
  index: the index side reads its clustering from the file layout and
  NEVER shuffles (plan-asserted: zero Exchange under the index scan);
  the batch side pays one day-sized Exchange. ``inline=True`` (explicit
  knob, hard-capped) pushes the batch values as an IN filter instead —
  Spark BUCKET-PRUNES the index scan to only the buckets containing
  probed values, zero join and zero shuffle, for the small-increment
  regime (the referential inline-mode pattern, engine.py:103-143).
  (The planner may report the scan as non-bucketed here — with no join
  to feed, DisableUnnecessaryBucketedScan kicks in — but file-level
  bucket pruning via optionalBucketSet still applies in createReadRDD;
  tests/test_unique_index.py proves the strict bucket subset.)
* **extend** — append the batch's genuinely-new values into the same
  bucket layout. Idempotent: values already indexed are never
  re-inserted, so a retried extend is a no-op (the checkpoint-commit
  retry contract).

Declarative form: ``x-unique {"index": "@hist"}`` — the engine runs the
standard batch-internal exact check PLUS the index collision probe, both
as violations; ``context={"hist": UniqueIndex(...)}`` supplies the index.
Composes with ``where`` (the scoped batch is what gets probed).

Violations are VALUE-level, mirroring ``uniqueness_violations``
(one row per offending value; validators.rs:589-592 reports the value
once) — the probe never joins back to fact rows, so its output is
bounded by the number of colliding values, not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


class UniqueIndex:
    """A persistent distinct-value index backed by a catalog bucketed
    table (``table``), clustered by ``column``.

    ``buckets`` fixes the hash-cluster width at build time;
    ``inline_threshold`` hard-caps how many batch values the inline
    probe may collect to the driver (the referential ≤100k refusal
    convention)."""

    def __init__(self, table: str, column: str, buckets: int = 64,
                 inline_threshold: int = 100_000):
        if not table or not column:
            raise ValueError("UniqueIndex needs a table name and a column")
        self.table = table
        self.column = column
        self.buckets = int(buckets)
        self.inline_threshold = int(inline_threshold)

    # -- lifecycle -------------------------------------------------------

    def exists(self, spark: SparkSession) -> bool:
        return spark.catalog.tableExists(self.table)

    def build(self, df: DataFrame, path: str | None = None) -> None:
        """One-time index build from the historical table: distinct
        non-NULL values, hash-bucketed + sorted by the value (sorted
        files additionally give per-file min/max footer skipping within
        a bucket). ``path`` makes the table external (data at ``path``,
        bucket metadata in the catalog).

        Idempotent across sessions: a rebuild first drops the catalog
        entry, and — for managed tables — clears a stale warehouse
        directory left by a PREVIOUS session's catalog (a fresh
        in-memory catalog no longer knows the table, but saveAsTable
        refuses to reuse its location: LOCATION_ALREADY_EXISTS)."""
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        if path is None and "." not in self.table:
            wh = spark.conf.get("spark.sql.warehouse.dir", "")
            if wh:
                jvm = spark._jvm
                loc = jvm.org.apache.hadoop.fs.Path(
                    wh.rstrip("/") + "/" + self.table.lower())
                fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
                if fs.exists(loc):
                    fs.delete(loc, True)
        vals = self._batch_values(df)
        w = (vals.write.mode("overwrite")
             .bucketBy(self.buckets, self.column).sortBy(self.column))
        if path is not None:
            w = w.option("path", path)
        w.format("parquet").saveAsTable(self.table)

    def attach(self, spark: SparkSession, path: str) -> None:
        """Register an EXISTING index layout in this session's catalog —
        the fresh-session step (spark-submit, new driver): the bucketed
        parquet files survive between sessions, the in-memory catalog
        does not, and reading them WITHOUT the bucket DDL would lose the
        clustering every probe relies on. No-op when the table already
        exists. The bucket count declared here must be the one the
        layout was written with (it is DDL metadata; a mismatch
        silently mis-clusters every downstream join). The layout must
        hold at least one file (the column type is read from the
        parquet footers — an index that never indexed anything has
        nothing to attach)."""
        if self.exists(spark):
            return
        dtype = (spark.read.parquet(path)
                 .schema[self.column].dataType.simpleString())
        spark.sql(
            f"CREATE TABLE {self.table} ({self.column} {dtype}) "
            f"USING parquet CLUSTERED BY ({self.column}) "
            f"SORTED BY ({self.column}) INTO {self.buckets} BUCKETS "
            f"LOCATION '{path}'")

    def index_df(self, spark: SparkSession) -> DataFrame:
        """The index relation — MUST come from the catalog
        (``spark.read.parquet`` on the same files would not know the
        clustering and would re-shuffle; bucketing.py:42-47)."""
        return spark.table(self.table)

    # -- probe -----------------------------------------------------------

    def _batch_values(self, df: DataFrame) -> DataFrame:
        """Batch distinct values, pre-clustered to the INDEX's bucket
        width: repartition(buckets, col) then dropDuplicates — the
        dedup aggregate and the bucket-aligned join/write all reuse that
        ONE Exchange (a bare .distinct() would shuffle at
        spark.sql.shuffle.partitions and pay a second Exchange to
        re-align to the bucket layout)."""
        if self.column not in df.columns:
            raise ValueError(
                f"column {self.column!r} not in batch (have {df.columns})")
        return (df.select(self.column)
                .where(F.col(self.column).isNotNull())
                .repartition(self.buckets, F.col(self.column))
                .dropDuplicates([self.column]))

    def _check_types(self, spark: SparkSession, df: DataFrame) -> None:
        # implicit coercion would silently change which values collide
        # (the x-reciprocal lesson) — refuse eagerly on type mismatch
        idx_t = self.index_df(spark).schema[self.column].dataType
        bat_t = df.schema[self.column].dataType
        if idx_t != bat_t:
            raise ValueError(
                f"index column type {idx_t.simpleString()} != batch column "
                f"type {bat_t.simpleString()} — cast the batch explicitly")

    def _inline_hits(self, spark: SparkSession, vals: DataFrame) -> DataFrame:
        """Collect the batch values (refusing above ``inline_threshold``)
        and push them as an IN filter on the index scan — the scan
        BUCKET-PRUNES to only the buckets containing probed values, no
        join at all (the small-increment regime)."""
        rows = vals.limit(self.inline_threshold + 1).collect()
        if len(rows) > self.inline_threshold:
            raise ValueError(
                f"inline probe refused: batch has more than "
                f"{self.inline_threshold} distinct values — use the "
                f"join probe (inline=False)")
        lits = [r[0] for r in rows]
        idx = self.index_df(spark).select(self.column)
        if not lits:
            return idx.where(F.lit(False))
        return idx.where(F.col(self.column).isin(lits))

    def hits(self, df: DataFrame, inline: bool = False) -> DataFrame:
        """Distinct batch values already present in the index (one
        column, named ``self.column``).

        join mode (default): index ⋉ batch-distinct — index side
        exchange-free off the bucket layout. inline mode: see
        :meth:`_inline_hits`."""
        spark = df.sparkSession
        self._check_types(spark, df)
        vals = self._batch_values(df)
        if inline:
            return self._inline_hits(spark, vals)
        return (self.index_df(spark).select(self.column)
                .join(vals, self.column, "leftsemi"))

    def collision_violations(self, df: DataFrame, check_id: str,
                             inline: bool = False) -> DataFrame:
        """Violations DF ``(doc_id, check_id, observed, expected)`` — one
        row per batch value that already exists in the index (value-level,
        mirroring uniqueness_violations): doc_id = the value, observed =
        its batch multiplicity.

        ONE batch scan + one bucket-width shuffle: the multiplicity
        groupBy IS the distinct set, so the probe joins it against the
        index directly (counts ⋉ index — both sides clustered on the
        value at the bucket width, no further Exchange) instead of
        recomputing a separate distinct pass. Inline mode collects the
        hit VALUES (small by the threshold contract) and filters the
        counts by an IN literal — the counts DAG executes once in the
        result plan plus once for the probe collect."""
        spark = df.sparkSession
        self._check_types(spark, df)
        counts = (df.select(self.column)
                  .where(F.col(self.column).isNotNull())
                  .repartition(self.buckets, F.col(self.column))
                  .groupBy(self.column)
                  .agg(F.count(F.lit(1)).alias("__bn")))
        if inline:
            hit_rows = self._inline_hits(
                spark, counts.select(self.column)).collect()
            hit_lits = [r[0] for r in hit_rows]
            hit = counts.where(
                F.col(self.column).isin(hit_lits) if hit_lits
                else F.lit(False))
        else:
            hit = counts.join(self.index_df(spark).select(self.column),
                              self.column, "leftsemi")
        return (hit.select(
            F.col(self.column).cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(F.lit("count="), F.col("__bn").cast("string"),
                     F.lit("; exists in index")).alias("observed"),
            F.lit("unique incl. index").alias("expected"),
        ))

    # -- extend ----------------------------------------------------------

    def extend(self, df: DataFrame) -> int:
        """Append the batch's values NOT already indexed; returns how
        many were inserted. Idempotent (re-extending the same batch
        inserts nothing). The anti-join's index side is exchange-free
        off the bucket layout; the append pays one batch-sized bucket
        shuffle — the write-time shuffle that keeps every future probe
        free."""
        spark = df.sparkSession
        self._check_types(spark, df)
        new_vals = self._batch_values(df).join(
            self.index_df(spark), self.column, "left_anti")
        new_vals = new_vals.cache()
        try:
            n = new_vals.count()
            if n:
                (new_vals.write.mode("append")
                 .bucketBy(self.buckets, self.column).sortBy(self.column)
                 .format("parquet").saveAsTable(self.table))
        finally:
            new_vals.unpersist()
        return n
