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

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

#: sidecar written next to the bucketed parquet files at build() time —
#: the bucket count is DDL metadata that does not live in the files
#: themselves, and an attach() with the wrong count silently assigns
#: values to the wrong buckets (false-negative collision probes).
_META_FILE = "_index_meta.json"


class UniqueIndex:
    """A persistent distinct-value index backed by a catalog bucketed
    table (``table``), clustered by ``column``.

    ``buckets`` fixes the hash-cluster width at build time;
    ``inline_threshold`` hard-caps how many batch values the inline
    probe may collect to the driver (the referential ≤100k refusal
    convention)."""

    def __init__(self, table: str, column: str, buckets: int | None = None,
                 inline_threshold: int = 100_000):
        if not table or not column:
            raise ValueError("UniqueIndex needs a table name and a column")
        self.table = table
        self.column = column
        # None = "not chosen by the caller": build() defaults to 64 and
        # RECORDS the choice in the layout's sidecar; attach() then adopts
        # the recorded count, so nobody has to remember the number. An
        # EXPLICIT count that contradicts the sidecar is refused (it would
        # silently mis-cluster every probe).
        self._buckets_explicit = buckets is not None
        self.buckets = int(buckets) if buckets is not None else 64
        self.inline_threshold = int(inline_threshold)

    # -- lifecycle -------------------------------------------------------

    def exists(self, spark: SparkSession) -> bool:
        return spark.catalog.tableExists(self.table)

    def _managed_location(self, spark: SparkSession) -> str | None:
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if not wh or "." in self.table:
            return None
        return wh.rstrip("/") + "/" + self.table.lower()

    @staticmethod
    def _fs_path(spark: SparkSession, p: str):
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(p)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, path

    def _write_meta(self, spark: SparkSession, dirpath: str) -> None:
        """Persist the layout facts next to the data (Hadoop FS — works on
        HDFS/S3 at deploy scale, not just the local warehouse)."""
        fs, path = self._fs_path(
            spark, dirpath.rstrip("/") + "/" + _META_FILE)
        out = fs.create(path, True)
        out.write(bytearray(json.dumps(
            {"column": self.column, "buckets": self.buckets}).encode()))
        out.close()

    @staticmethod
    def _read_meta(spark: SparkSession, dirpath: str) -> dict | None:
        fs, path = UniqueIndex._fs_path(
            spark, dirpath.rstrip("/") + "/" + _META_FILE)
        if not fs.exists(path):
            return None
        stream = fs.open(path)
        try:
            # py4j passes byte[] by value — read JVM-side (commons-io
            # ships with Spark) instead of a Python read-into-buffer loop
            text = spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
            return json.loads(text)
        finally:
            stream.close()

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
        managed_loc = self._managed_location(spark)
        if path is None and managed_loc is not None:
            fs, loc = self._fs_path(spark, managed_loc)
            if fs.exists(loc):
                fs.delete(loc, True)
        vals = self._batch_values(df)
        w = (vals.write.mode("overwrite")
             .bucketBy(self.buckets, self.column).sortBy(self.column))
        if path is not None:
            w = w.option("path", path)
        w.format("parquet").saveAsTable(self.table)
        # record the bucket count WITH the layout so a later attach() in a
        # fresh session cannot re-declare the DDL with a different width
        loc = path if path is not None else managed_loc
        if loc is not None:
            self._write_meta(spark, loc)

    def attach(self, spark: SparkSession, path: str) -> None:
        """Register an EXISTING index layout in this session's catalog —
        the fresh-session step (spark-submit, new driver): the bucketed
        parquet files survive between sessions, the in-memory catalog
        does not, and reading them WITHOUT the bucket DDL would lose the
        clustering every probe relies on. No-op when the table already
        exists. The bucket count is DDL metadata the files themselves do
        not carry, so it is read back from the ``_index_meta.json``
        sidecar ``build()`` wrote next to the data — a count the CALLER
        supplies that contradicts the sidecar is refused (it would
        silently assign values to the wrong buckets and turn the
        collision probe into a false-negative machine). Layouts written
        before the sidecar existed fall back to the constructor count,
        with the historical hazard documented. The layout must hold at
        least one file (the column type is read from the parquet
        footers — an index that never indexed anything has nothing to
        attach)."""
        if self.exists(spark):
            return
        meta = self._read_meta(spark, path)
        if meta is not None:
            if meta.get("column") != self.column:
                raise ValueError(
                    f"index layout at {path} was built on column "
                    f"{meta.get('column')!r}, not {self.column!r}")
            if (self._buckets_explicit
                    and int(meta["buckets"]) != self.buckets):
                raise ValueError(
                    f"index layout at {path} was written with "
                    f"{meta['buckets']} buckets; caller declared "
                    f"{self.buckets} — attaching with the wrong width "
                    "mis-clusters every probe. Omit the bucket count to "
                    "adopt the recorded one.")
            self.buckets = int(meta["buckets"])
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

    def _sync_buckets(self, spark: SparkSession) -> None:
        """Adopt the CATALOG's bucket count for an existing table — the
        authoritative width every probe/extend must cluster to. An
        explicit constructor count that contradicts it is refused (the
        attach() sidecar rule, applied to the already-attached case)."""
        if getattr(self, "_buckets_synced", False):
            return
        for r in spark.sql(f"DESCRIBE FORMATTED {self.table}").collect():
            if str(r[0]).strip() == "Num Buckets":
                n = int(str(r[1]).strip())
                if self._buckets_explicit and n != self.buckets:
                    raise ValueError(
                        f"catalog table {self.table} is bucketed into {n} "
                        f"buckets; caller declared {self.buckets} — omit "
                        "the bucket count to adopt the catalog's")
                self.buckets = n
                break
        self._buckets_synced = True

    def _check_types(self, spark: SparkSession, df: DataFrame) -> None:
        self._sync_buckets(spark)
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
        # MATERIALIZE, don't cache: the append writes into the same table
        # the anti-join reads. cache() is best-effort — evicted partitions
        # recompute during the write stage and re-read the index table
        # mid-append (self-referencing insert). localCheckpoint(eager)
        # truncates the lineage to durable-for-this-job blocks, so the
        # write stage can never re-run the anti-join.
        new_vals = new_vals.localCheckpoint(eager=True)
        n = new_vals.count()
        if n:
            (new_vals.write.mode("append")
             .bucketBy(self.buckets, self.column).sortBy(self.column)
             .format("parquet").saveAsTable(self.table))
        return n
