"""Historical NEAR-duplicate index: incremental ``x-nearDup`` across
appends — the fuzzy sibling of :class:`operators.unique_index.UniqueIndex`.

``x-nearDup`` proves near-dup freedom WITHIN the validated batch
(functions/dedup.py — banded equi-joins, never all-pairs). At 10^12 rows
with daily appends the contract a training-data ingest actually needs is
stronger: "is today's batch a near-duplicate of anything ALREADY
ingested" — and re-pairing history+day re-shuffles a year of text to
validate a day. This module makes near-dup MEMBERSHIP history
incremental, the way UniqueIndex did for exact membership:

* **catalog** — two bucketed tables written once and appended to:
  ``<name>_bands`` (``bkey``, ``id``) hash-clustered by the
  band-qualified MinHash band key, and ``<name>_sigs`` (``id``,
  ``sig array<long>``) clustered by the doc id. Band rows are the LSH
  candidate generator; signatures are the verifier — history text is
  NEVER stored or re-read.
* **probe** — the day's docs are shingled/signed/banded (day-sized) and
  equi-joined against the bands catalog on ``bkey``: the index side
  reads its clustering from the file layout and never shuffles
  (plan-asserted in tests); candidates are verified by SIGNATURE
  AGREEMENT (fraction of equal minhash positions — the standard
  unbiased Jaccard estimator, E[est] = J), so verification joins the
  id-clustered sigs catalog, again exchange-free on the index side.
* **extend** — append the batch's genuinely-new ids' band rows and
  signatures. Idempotent: ids already indexed are never re-inserted
  (anti-join on the sigs catalog), so a retried extend is a no-op —
  the checkpoint-commit retry contract. The anti-join result is
  localCheckpoint-ed before writing (the UniqueIndex self-referencing
  insert lesson).

The MinHash parameters (num_perm/bands/n/seed/portable) and the bucket
count are LAYOUT facts: probing with different parameters than the index
was built with silently never matches. They are persisted in an
``_index_meta.json`` sidecar at build() and re-adopted/verified at
attach() — the UniqueIndex sidecar rule.

Declarative form: ``x-nearDup {"method": "minhash", "index": "@hist"}``
— the engine probes the batch against the index and reports each
colliding batch doc as a violation naming its matched historical doc,
exactly how ``x-unique {"index"}`` reports exact collisions.

Reference: no analog in the reference (single-document walker); the
estimator and banding math follow Broder'97 / Leskovec-Rajaraman-Ullman
ch.3 (public), composed with the UniqueIndex catalog protocol.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from jsonschema_valid_spark.functions.dedup import (
    MERSENNE31,
    minhash_sig_from_hashes,
    portable_hash60,
    word_shingles,
)

_META_FILE = "_index_meta.json"


class NearDupIndex:
    """A persistent MinHash band-signature index backed by two catalog
    bucketed tables (``<table>_bands``, ``<table>_sigs``)."""

    def __init__(self, table: str, num_perm: int = 64, bands: int = 16,
                 n: int = 3, seed: int = 42, buckets: int = 64,
                 portable: bool = False):
        if not table:
            raise ValueError("NearDupIndex needs a table name")
        if num_perm % bands != 0:
            raise ValueError(f"num_perm ({num_perm}) must be divisible "
                             f"by bands ({bands})")
        self.table = table
        self.num_perm = int(num_perm)
        self.bands = int(bands)
        self.n = int(n)
        self.seed = int(seed)
        self.buckets = int(buckets)
        self.portable = bool(portable)

    @property
    def bands_table(self) -> str:
        return f"{self.table}_bands"

    @property
    def sigs_table(self) -> str:
        return f"{self.table}_sigs"

    def _params(self) -> dict:
        return {"num_perm": self.num_perm, "bands": self.bands,
                "n": self.n, "seed": self.seed, "buckets": self.buckets,
                "portable": self.portable}

    # -- staging -----------------------------------------------------------

    def _sig_frame(self, df: DataFrame, key: str, text_col: str) -> DataFrame:
        """(id, sig array<long>): shingle → hash → seeded minhash — the
        exact staging of functions/dedup.py::minhash_lsh_pairs, incl. the
        staged-hash-array rule (the shingle-hash array becomes a REAL
        column before the num_perm permutations reference it)."""
        hash_fn = ((lambda s: F.pmod(portable_hash60(s),
                                     F.lit(MERSENNE31)))
                   if self.portable
                   else (lambda s: F.pmod(F.xxhash64(s),
                                          F.lit(MERSENNE31))))
        return (df.select(
                    F.col(key).cast("string").alias("id"),
                    F.array_distinct(
                        word_shingles(F.col(text_col), self.n)).alias("sh"))
                .withColumn("__shh", F.transform(F.col("sh"), hash_fn))
                .select("id", minhash_sig_from_hashes(
                    F.col("__shh"), self.num_perm, self.seed).alias("sig")))

    def _band_frame(self, sigs: DataFrame) -> DataFrame:
        """(bkey, id): one row per (doc, band) with the band folded INTO
        the key (``"<band>:" || sig-slice``, xxhash64-compressed in
        production) — a single join column, so the bands catalog's
        hash-clustering on ``bkey`` alone makes the probe join
        exchange-free on the index side (two join keys over a
        one-key bucket layout would not satisfy the distribution)."""
        r = self.num_perm // self.bands

        def band_key(b: int):
            parts = [F.col("sig")[b * r + i].cast("string")
                     for i in range(r)]
            joined = F.concat_ws(",", F.lit(str(b)) , *parts)
            return joined if self.portable else F.xxhash64(joined)

        structs = [F.struct(band_key(b).alias("bkey"))
                   for b in range(self.bands)]
        return (sigs.select("id", F.explode(F.array(*structs)).alias("s"))
                .select(F.col("s.bkey").alias("bkey"), "id"))

    # -- lifecycle ----------------------------------------------------------

    def exists(self, spark: SparkSession) -> bool:
        return (spark.catalog.tableExists(self.bands_table)
                and spark.catalog.tableExists(self.sigs_table))

    @staticmethod
    def _fs_path(spark: SparkSession, p: str):
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(p)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, path

    def _write_meta(self, spark: SparkSession, dirpath: str) -> None:
        fs, path = self._fs_path(
            spark, dirpath.rstrip("/") + "/" + _META_FILE)
        out = fs.create(path, True)
        out.write(bytearray(json.dumps(self._params()).encode()))
        out.close()

    def _read_meta(self, spark: SparkSession, dirpath: str) -> dict | None:
        fs, path = self._fs_path(
            spark, dirpath.rstrip("/") + "/" + _META_FILE)
        if not fs.exists(path):
            return None
        stream = fs.open(path)
        try:
            text = spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
            return json.loads(text)
        finally:
            stream.close()

    def _drop_stale(self, spark: SparkSession, table: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if wh and "." not in table:
            fs, loc = self._fs_path(
                spark, wh.rstrip("/") + "/" + table.lower())
            if fs.exists(loc):
                fs.delete(loc, True)

    def build(self, df: DataFrame, key: str, text_col: str,
              bands_path: str | None = None,
              sigs_path: str | None = None) -> None:
        """One-time index build from the historical corpus: signatures
        clustered by id, band rows clustered (and sorted) by bkey.
        With paths, the tables are external and the MinHash parameters
        are recorded in each location's sidecar for attach()."""
        spark = df.sparkSession
        self._drop_stale(spark, self.bands_table)
        self._drop_stale(spark, self.sigs_table)
        sigs = self._sig_frame(df, key, text_col)
        w = (sigs.repartition(self.buckets, F.col("id"))
             .write.mode("overwrite").bucketBy(self.buckets, "id")
             .sortBy("id"))
        if sigs_path is not None:
            w = w.option("path", sigs_path)
        w.format("parquet").saveAsTable(self.sigs_table)
        bands = self._band_frame(
            spark.table(self.sigs_table))
        w = (bands.repartition(self.buckets, F.col("bkey"))
             .write.mode("overwrite").bucketBy(self.buckets, "bkey")
             .sortBy("bkey"))
        if bands_path is not None:
            w = w.option("path", bands_path)
        w.format("parquet").saveAsTable(self.bands_table)
        for p in (bands_path, sigs_path):
            if p is not None:
                self._write_meta(spark, p)

    def attach(self, spark: SparkSession, bands_path: str,
               sigs_path: str) -> None:
        """Register an EXISTING layout in a fresh session's catalog
        (the spark-submit reality: files survive drivers, the in-memory
        catalog does not). MinHash parameters and bucket count are
        ADOPTED from the sidecar — probing with different parameters
        than the layout was built with silently never matches, so a
        missing sidecar refuses."""
        if self.exists(spark):
            return
        meta = self._read_meta(spark, bands_path) or self._read_meta(
            spark, sigs_path)
        if meta is None:
            raise ValueError(
                f"no {_META_FILE} sidecar at {bands_path} or {sigs_path}"
                " — a NearDupIndex layout cannot be attached without its"
                " recorded MinHash parameters (rebuild with build())")
        for k in ("num_perm", "bands", "n", "seed", "buckets", "portable"):
            setattr(self, k, meta[k])
        spark.sql(
            f"CREATE TABLE {self.sigs_table} "
            f"(id string, sig array<bigint>) USING parquet "
            f"CLUSTERED BY (id) SORTED BY (id) "
            f"INTO {self.buckets} BUCKETS LOCATION '{sigs_path}'")
        btype = "string" if self.portable else "bigint"
        spark.sql(
            f"CREATE TABLE {self.bands_table} "
            f"(bkey {btype}, id string) USING parquet "
            f"CLUSTERED BY (bkey) SORTED BY (bkey) "
            f"INTO {self.buckets} BUCKETS LOCATION '{bands_path}'")

    # -- probe --------------------------------------------------------------

    def probe(self, df: DataFrame, key: str, text_col: str,
              est_threshold: float = 0.7) -> DataFrame:
        """(batch_id, hist_id, est): batch docs whose estimated Jaccard
        against SOME historical doc reaches ``est_threshold``.

        Candidate generation = band equi-join on ``bkey`` (index side
        exchange-free off the bucket layout; the batch side pays one
        day-sized Exchange); verification = signature agreement against
        the id-clustered sigs catalog. History is never re-shingled,
        re-hashed, or re-read at text grain."""
        spark = df.sparkSession
        batch_sigs = self._sig_frame(df, key, text_col).localCheckpoint(
            eager=False)
        batch_bands = self._band_frame(batch_sigs)
        cat_bands = spark.table(self.bands_table)
        cand = (batch_bands.alias("b")
                .join(cat_bands.alias("h"), "bkey")
                .where(F.col("b.id") != F.col("h.id"))
                .select(F.col("b.id").alias("batch_id"),
                        F.col("h.id").alias("hist_id"))
                .distinct())
        cat_sigs = spark.table(self.sigs_table)
        est = (F.aggregate(
                   F.zip_with(F.col("bsig"), F.col("hsig"),
                              lambda x, y: (x == y).cast("int")),
                   F.lit(0), lambda acc, v: acc + v)
               / F.lit(float(self.num_perm)))
        return (cand
                .join(batch_sigs.select(F.col("id").alias("batch_id"),
                                        F.col("sig").alias("bsig")),
                      "batch_id")
                .join(cat_sigs.select(F.col("id").alias("hist_id"),
                                      F.col("sig").alias("hsig")),
                      "hist_id")
                .select("batch_id", "hist_id", est.alias("est"))
                .where(F.col("est") >= F.lit(float(est_threshold))))

    def collision_violations(self, df: DataFrame, key: str, text_col: str,
                             check_id: str,
                             est_threshold: float = 0.7) -> DataFrame:
        """Violations DF (doc_id, check_id, observed, expected) — one row
        per batch doc near-duplicating ingested history, witnessing its
        lexicographically-smallest matched historical doc (deterministic;
        bounded by colliding docs, never candidate pairs)."""
        hits = self.probe(df, key, text_col, est_threshold=est_threshold)
        best = (hits.groupBy("batch_id")
                .agg(F.min(F.struct("hist_id", "est")).alias("m")))
        return best.select(
            F.col("batch_id").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(F.lit("neardup of "), F.col("m.hist_id"),
                     F.lit(", est="),
                     F.round(F.col("m.est"), 6).cast("string"))
            .alias("observed"),
            F.lit(f"no near-duplicate of ingested history "
                  f"(est jaccard >= {est_threshold:g})").alias("expected"),
        )

    # -- extend -------------------------------------------------------------

    def extend(self, df: DataFrame, key: str, text_col: str) -> int:
        """Append the batch's NOT-yet-indexed docs' signatures and band
        rows; returns how many docs were inserted. Idempotent — a
        re-extended batch inserts nothing (anti-join on the sigs
        catalog). The new frame is localCheckpoint-ed before either
        write so the append never re-reads the table it inserts into."""
        spark = df.sparkSession
        new_sigs = (self._sig_frame(df, key, text_col)
                    .join(spark.table(self.sigs_table).select("id"),
                          "id", "left_anti")
                    .localCheckpoint(eager=True))
        n = new_sigs.count()
        if n:
            (new_sigs.repartition(self.buckets, F.col("id"))
             .write.mode("append").bucketBy(self.buckets, "id")
             .sortBy("id").format("parquet").saveAsTable(self.sigs_table))
            (self._band_frame(new_sigs)
             .repartition(self.buckets, F.col("bkey"))
             .write.mode("append").bucketBy(self.buckets, "bkey")
             .sortBy("bkey").format("parquet")
             .saveAsTable(self.bands_table))
        return n
