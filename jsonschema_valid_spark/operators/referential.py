"""Referential membership — the table-scope lift of ``enum``
(``/root/reference/src/validators.rs:715-728``): a column's values must come
from a domain table.

At scale the domain is a dimension table (thousands of rows) and the fact
side is 10^12 rows — the ONLY sane plan is a **broadcast left-anti join**
(no shuffle of the fact table at all; the domain is shipped to every
executor). A shuffle-hash or sort-merge join here would shuffle 100 TB to
check membership against kilobytes.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, functions as F


def non_members(df: DataFrame, column: str, domain: DataFrame | Iterable,
                domain_column: str | None = None) -> DataFrame:
    """Rows of ``df`` whose ``column`` is non-NULL and not in the domain.

    ``domain`` may be a DataFrame (broadcast anti-join) or a literal iterable
    (compiles to an ``isin`` filter — zero joins, fully codegen'd).
    """
    fact = df.where(F.col(column).isNotNull())
    if isinstance(domain, DataFrame):
        dcol = domain_column or domain.columns[0]
        dom = domain.select(F.col(dcol).alias(column)).distinct()
        return fact.join(F.broadcast(dom), on=column, how="left_anti")
    values = list(domain)
    return fact.where(~F.col(column).isin(*values))


def referential_violations(df: DataFrame, column: str, domain,
                           check_id: str, key: str = "doc_id",
                           domain_column: str | None = None,
                           mode: str = "exact",
                           m_bits: int = 1 << 20, k: int = 5,
                           seed: int = 7) -> DataFrame:
    """``mode="exact"`` (default): broadcast anti-join / isin.
    ``mode="bloom"``: the shuffle-free approximate path for domains too
    big to broadcast (operators/bloom.py) — every reported violation is
    real; ~FPR of true violations goes unreported (documented there)."""
    if mode == "bloom":
        from jsonschema_valid_spark.operators.bloom import bloom_non_members

        dom = domain
        if not isinstance(dom, DataFrame):
            dom = df.sparkSession.createDataFrame(
                [(v,) for v in domain], f"{column} string")
        bad = bloom_non_members(df, column, dom,
                                domain_column=domain_column,
                                m_bits=m_bits, k=k, seed=seed)
    elif mode == "exact":
        bad = non_members(df, column, domain, domain_column)
    else:
        raise ValueError(f"x-referential mode must be 'exact' or 'bloom', "
                         f"got {mode!r}")
    expected = (f"{column} in domain"
                if mode == "exact" else f"{column} in domain (bloom)")
    return bad.select(
        F.col(key).cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.col(column).cast("string").alias("observed"),
        F.lit(expected).alias("expected"),
    )
