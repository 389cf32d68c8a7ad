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


def composite_non_members(df: DataFrame, columns: list[str],
                          domain: DataFrame,
                          domain_columns: list[str] | None = None,
                          ) -> DataFrame:
    """Composite-key membership: rows whose (columns...) TUPLE is absent
    from the domain's (domain_columns...) tuples — the FK shape a
    one-column check cannot express (each component may individually
    exist while the COMBINATION was never registered: a valid user and
    a valid event type that this user never signed up for).

    Same plan as the single-column check: the distinct domain tuples are
    dimension-sized and BROADCAST; the fact side never shuffles
    (left-anti on all key columns). Rows with ANY NULL component are
    exempt like the single-column NULL rule — a partial key cannot name
    a domain member; ``required`` polices presence."""
    if not columns or len(columns) < 2:
        raise ValueError(
            "composite_non_members needs >= 2 key columns "
            "(use non_members for a single column)")
    if not isinstance(domain, DataFrame):
        raise ValueError("composite membership needs a DataFrame domain "
                         "(a literal iterable cannot carry tuples "
                         "unambiguously)")
    dcols = list(domain_columns or domain.columns[:len(columns)])
    if len(dcols) != len(columns):
        raise ValueError(
            f"domainColumns arity {len(dcols)} != key arity {len(columns)}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"key columns missing from fact: {missing}")
    cond = F.lit(True)
    for c in columns:
        cond = cond & F.col(c).isNotNull()
    fact = df.where(cond)
    dom = domain.select(
        *[F.col(d).alias(c) for c, d in zip(columns, dcols)]).distinct()
    return fact.join(F.broadcast(dom), on=list(columns), how="left_anti")


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
    if isinstance(column, (list, tuple)):
        cols = list(column)
        if mode != "exact":
            raise ValueError(
                "composite x-referential supports mode='exact' only "
                "(bloom/inline carry single values; concatenate a "
                "surrogate key column to use them)")
        dcols = domain_column
        if isinstance(dcols, str):
            dcols = [dcols]
        bad = composite_non_members(df, cols, domain,
                                    domain_columns=dcols)
        return bad.select(
            F.col(key).cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat_ws("/", *[
                F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
                for c in cols]).alias("observed"),
            F.lit(f"({', '.join(cols)}) in domain").alias("expected"),
        )
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


def domain_coverage(df: DataFrame, column: str, domain: DataFrame | Iterable,
                    domain_column: str | None = None) -> DataFrame:
    """One-row ``(n_domain, n_seen, coverage)``: the fraction of DOMAIN
    values that appear at least once in ``df[column]`` — the REVERSE
    direction of the membership check (data ⊆ domain polices junk;
    domain-side coverage catches a feed that silently DROPPED a whole
    slice: a source that stopped arriving, a region missing from today's
    batch). ``x-referential {"coverageMin": τ}`` gates on it.

    Plan at 10^12 rows: the fact table is first BROADCAST-semi-joined to
    the dimension-sized domain (no fact shuffle), so the count-distinct's
    partial aggregation sees at most #domain distinct values per task —
    the only shuffle is #domain-bounded. A literal domain compiles to an
    ``isin`` filter (zero joins).

    Grouped form ("per day, every nation present"): use
    ``operators/consistency.py::partition_completeness`` over
    ``["day", "nation"]`` with the cross-product expected domain — the
    per-cell status matrix is that operator's exact job. Streaming form
    ("did every region report this hour"):
    ``streaming/checks.py::stream_coverage_verdicts``."""
    fact = df.where(F.col(column).isNotNull())
    if isinstance(domain, DataFrame):
        dcol = domain_column or domain.columns[0]
        dom = domain.select(F.col(dcol).alias(column)) \
            .where(F.col(column).isNotNull()).distinct()
        seen = fact.join(F.broadcast(dom), on=column, how="left_semi")
        n_seen = seen.agg(F.countDistinct(column).alias("n_seen"))
        n_dom = dom.agg(F.count(F.lit(1)).alias("n_domain"))
        joined = n_seen.crossJoin(F.broadcast(n_dom))
    else:
        values = list(dict.fromkeys(domain))
        if not values:
            raise ValueError("domain_coverage: empty literal domain")
        joined = (fact.where(F.col(column).isin(*values))
                  .agg(F.countDistinct(column).alias("n_seen"))
                  .select(F.col("n_seen"),
                          F.lit(len(values)).cast("long").alias("n_domain")))
    return joined.select(
        F.col("n_domain").cast("long").alias("n_domain"),
        F.col("n_seen").cast("long").alias("n_seen"),
        F.try_divide(F.col("n_seen").cast("double"),
                     F.col("n_domain").cast("double")).alias("coverage"),
    )


def unused_domain_values(df: DataFrame, column: str,
                         domain: DataFrame | Iterable,
                         domain_column: str | None = None) -> DataFrame:
    """The domain values with NO row in ``df[column]`` — the exemplar list
    behind a failed coverage gate (WHICH sources went missing, not just
    how many). One column, named after ``column``.

    Plan: the fact side is broadcast-semi-joined to the domain first, so
    the distinct() that follows shuffles at most #domain values; the
    final anti-join is dimension × dimension."""
    fact = df.where(F.col(column).isNotNull())
    if isinstance(domain, DataFrame):
        dcol = domain_column or domain.columns[0]
        dom = domain.select(F.col(dcol).alias(column)) \
            .where(F.col(column).isNotNull()).distinct()
    else:
        values = list(dict.fromkeys(domain))
        if not values:
            raise ValueError("unused_domain_values: empty literal domain")
        dom = (df.sparkSession.createDataFrame([(v,) for v in values])
               .toDF(column).distinct())
    seen = (fact.join(F.broadcast(dom), on=column, how="left_semi")
            .select(column).distinct())
    return dom.join(seen, on=column, how="left_anti")
