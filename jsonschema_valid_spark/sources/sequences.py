"""Deterministic tokenized-sequence table (the canonical input shape).

BASELINE.json input_hint: ``(doc_id string, tokens array<int32>, n_tok int32,
source string)``. No such physical table exists in /root/testdata, and the
rules forbid external data — so we DERIVE it arithmetically from the
``documents`` table with a pure-integer PRNG that evaluates IDENTICALLY in
Spark SQL and DuckDB SQL. That makes every validation query over `sequences`
fully oracle-checkable (the driver runs our Spark query and our DuckDB SQL
side-by-side).

Injected corruptions (deterministic, FIXTURES.md F1 pattern):

=============  =======================  ==============================
did % 97 = 0   ``n_tok = len(tokens)+1``  per-row invariant violation
did % 101 = 0  ``tokens[0] = -5``         out-of-range token (items check)
did % 89 = 0   ``source = 'BOGUS'``       enum / referential violation
did % 113 = 0  ``source = NULL``          null-rate / required violation
did % 103 = 0  row emitted twice          doc_id uniqueness violation
did % 107 = 0  ``tokens[1] = tokens[0]``  intra-array dup (uniqueItems)
=============  =======================  ==============================

(The token PRNG is an arithmetic progression mod 50257, which cannot
repeat within ≤127 elements — without the did%107 arm a uniqueItems
check over `sequences` is vacuously green.)

Token PRNG: ``token_i = (did*131 + i*2654435761) % 50257`` (Knuth
multiplicative constant; stays well inside int64). Length:
``n = (did*37) % 120 + 8`` ∈ [8, 127].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

VOCAB = 50257

# dialect pieces: (cast-to-string type, array-builder template)
_SPARK_ARRAY = (
    "transform(sequence(0, true_n - 1), i -> cast("
    "CASE WHEN i = 0 AND did % 101 = 0 THEN -5 "
    "WHEN i = 1 AND did % 107 = 0 THEN (did * 131) % 50257 "
    "ELSE (did * 131 + i * 2654435761) % 50257 END AS INT))"
)
_DUCK_ARRAY = (
    "list_transform(range(0, cast(true_n AS BIGINT)), i -> cast("
    "CASE WHEN i = 0 AND did % 101 = 0 THEN -5 "
    "WHEN i = 1 AND did % 107 = 0 THEN (did * 131) % 50257 "
    "ELSE (did * 131 + i * 2654435761) % 50257 END AS INT))"
)


def _cte_body(array_expr: str, strtype: str) -> str:
    return f"""
__seq_gen AS (
  SELECT
    doc_id AS did,
    concat('doc-', lpad(cast(doc_id AS {strtype}), 12, '0')) AS sdoc_id,
    cast((doc_id * 37) % 120 + 8 AS INT) AS true_n,
    CASE WHEN doc_id % 89 = 0 THEN 'BOGUS'
         WHEN doc_id % 113 = 0 THEN NULL
         ELSE source END AS gsource
  FROM documents
),
__seq0 AS (
  SELECT
    did,
    sdoc_id AS doc_id,
    {array_expr} AS tokens,
    cast(CASE WHEN did % 97 = 0 THEN true_n + 1 ELSE true_n END AS INT) AS n_tok,
    gsource AS source
  FROM __seq_gen
),
sequences AS (
  SELECT doc_id, tokens, n_tok, source FROM __seq0
  UNION ALL
  SELECT doc_id, tokens, n_tok, source FROM __seq0 WHERE did % 103 = 0
)"""


SEQUENCES_CTE_SPARK = _cte_body(_SPARK_ARRAY, "STRING")
SEQUENCES_CTE_DUCKDB = _cte_body(_DUCK_ARRAY, "VARCHAR")


def oracle_with_sequences(select_sql: str) -> str:
    """Wrap a DuckDB SELECT that references `sequences` with the derivation
    CTE (the driver pre-registers `documents` as a view)."""
    return f"WITH {SEQUENCES_CTE_DUCKDB}\n{select_sql}"


def load_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side `sequences` DataFrame for an sf dir. The derivation is one
    narrow projection over the documents scan (transform/sequence are
    Catalyst HOF expressions — JVM-side, no Python)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    return spark.sql(f"WITH {SEQUENCES_CTE_SPARK}\nSELECT * FROM sequences")


def generate_sequences(spark: SparkSession, n_rows: int,
                       partitions: int | None = None) -> DataFrame:
    """Deterministic sequences table of arbitrary size from ``spark.range`` —
    same arithmetic and corruption scheme as the documents-derived form, but
    with zero input I/O and perfect parallelism (each executor generates its
    own id range). This is the bench/scaling input: identical rows for any
    (n_rows, partitions) so two cluster sizes validate the same data."""
    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)
    rng.createOrReplaceTempView("__bench_ids")
    return spark.sql(f"""
WITH documents AS (
  SELECT id AS doc_id,
         concat('src', cast(1 + id % 20 AS STRING)) AS source
  FROM __bench_ids
),
{SEQUENCES_CTE_SPARK}
SELECT * FROM sequences""")


def source_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid `source` domain = the distinct sources of the uncorrupted
    documents table (a dimension table at scale → broadcast side)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("source").distinct()
