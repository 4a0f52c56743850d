"""Driver-contract queries: each entry exercises one engine operator from
SURVEY.md §2 over the /root/testdata tables, paired with an ANSI-SQL oracle
DuckDB runs on the same parquet. Column names and rounding are aligned on
both sides (the driver hashes values after sorting columns by name).

Registry shape: ``QUERIES[name] = (spark_fn, oracle_sql_or_None)`` where
``spark_fn(spark, sf_dir) -> DataFrame``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.drift import histogram_df, psi_df
from .operators.profiler import numeric_summary
from .operators.validator import SparkValidator
from .plans.schema import SchemaBuilder

__all__ = ["QUERIES", "entry_query"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# C7 not-null checks (one validator pass, three columns)
def q_check_nulls_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = (
        SchemaBuilder("lineitem")
        .column("l_orderkey", "int", nullable=False)
        .column("l_quantity", "float", nullable=False)
        .column("l_shipdate", "datetime", nullable=False)
        .build()
    )
    return SparkValidator(schema).check_counts(_t(spark, sf_dir, "lineitem"))


_SQL_NULLS_LINEITEM = """
SELECT 'l_orderkey__not_null' AS "check",
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       count(*) AS n_checked FROM lineitem
UNION ALL
SELECT 'l_quantity__not_null',
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM lineitem
UNION ALL
SELECT 'l_shipdate__not_null',
       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM lineitem
"""


# C1-C4 range checks (null-safe: NULL passes value checks)
def q_check_ranges_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = (
        SchemaBuilder("lineitem")
        .column("l_quantity", "float", ge=1.0, le=50.0)
        .column("l_discount", "float", ge=0.0, le=0.08)
        .column("l_extendedprice", "float", gt=0.0, lt=100000.0)
        .build()
    )
    return SparkValidator(schema).check_counts(_t(spark, sf_dir, "lineitem"))


_SQL_RANGES_LINEITEM = """
SELECT 'l_quantity__ge' AS "check",
       CAST(sum(CASE WHEN l_quantity IS NOT NULL AND NOT (l_quantity >= 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       count(*) AS n_checked FROM lineitem
UNION ALL SELECT 'l_quantity__le',
       CAST(sum(CASE WHEN l_quantity IS NOT NULL AND NOT (l_quantity <= 50.0) THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM lineitem
UNION ALL SELECT 'l_discount__ge',
       CAST(sum(CASE WHEN l_discount IS NOT NULL AND NOT (l_discount >= 0.0) THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM lineitem
UNION ALL SELECT 'l_discount__le',
       CAST(sum(CASE WHEN l_discount IS NOT NULL AND NOT (l_discount <= 0.08) THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM lineitem
UNION ALL SELECT 'l_extendedprice__gt',
       CAST(sum(CASE WHEN l_extendedprice IS NOT NULL AND NOT (l_extendedprice > 0.0) THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM lineitem
UNION ALL SELECT 'l_extendedprice__lt',
       CAST(sum(CASE WHEN l_extendedprice IS NOT NULL AND NOT (l_extendedprice < 100000.0) THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM lineitem
"""


# C8 uniqueness via hash-shuffled group-count + broadcast join back
def q_check_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_chk = SparkValidator(
        SchemaBuilder("o").column("o_orderkey", "int", unique=True).build()
    ).check_counts(_t(spark, sf_dir, "orders"))
    lineitem_chk = SparkValidator(
        SchemaBuilder("l").column("l_orderkey", "int", unique=True).build()
    ).check_counts(_t(spark, sf_dir, "lineitem"))
    return orders_chk.unionAll(lineitem_chk)


_SQL_UNIQUE = """
WITH d AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
           WHERE l_orderkey IS NOT NULL GROUP BY 1),
     o AS (SELECT o_orderkey AS k, count(*) AS c FROM orders
           WHERE o_orderkey IS NOT NULL GROUP BY 1)
SELECT 'o_orderkey__unique' AS "check",
       CAST(coalesce((SELECT sum(c) FROM o WHERE c > 1), 0) AS BIGINT) AS n_failed,
       (SELECT count(*) FROM orders) AS n_checked
UNION ALL
SELECT 'l_orderkey__unique',
       CAST(coalesce((SELECT sum(c) FROM d WHERE c > 1), 0) AS BIGINT),
       (SELECT count(*) FROM lineitem)
"""


# C6 isin membership
def q_check_isin_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = (
        SchemaBuilder("orders")
        .column("o_orderstatus", "str", isin=["O", "F"])
        .column("o_orderpriority", "str", isin=["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .build()
    )
    return SparkValidator(schema).check_counts(_t(spark, sf_dir, "orders"))


_SQL_ISIN_ORDERS = """
SELECT 'o_orderstatus__isin' AS "check",
       CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       count(*) AS n_checked FROM orders
UNION ALL
SELECT 'o_orderpriority__isin',
       CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                     AND o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM') THEN 1 ELSE 0 END) AS BIGINT),
       count(*) FROM orders
"""


# C6-at-scale: referential integrity against a dimension (broadcast anti-join)
def q_check_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    customer_chk = SparkValidator(
        SchemaBuilder("c").column("c_nationkey", "int").build(),
        ref_checks={"c_nationkey": (nation, "n_nationkey")},
    ).check_counts(_t(spark, sf_dir, "customer"))
    cust = _t(spark, sf_dir, "customer")
    events_chk = SparkValidator(
        SchemaBuilder("e").column("user_id", "int").build(),
        ref_checks={"user_id": (cust, "c_custkey")},
    ).check_counts(_t(spark, sf_dir, "events"))
    return customer_chk.unionAll(events_chk)


_SQL_REFERENTIAL = """
SELECT 'c_nationkey__referential' AS "check",
       CAST((SELECT count(*) FROM customer c
             WHERE c.c_nationkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT) AS n_failed,
       (SELECT count(*) FROM customer) AS n_checked
UNION ALL
SELECT 'user_id__referential',
       CAST((SELECT count(*) FROM events e
             WHERE e.user_id IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS BIGINT),
       (SELECT count(*) FROM events)
"""


# P5/P6 violation rows keyed by o_orderkey with sorted failed-check labels
def q_violation_rows_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = (
        SchemaBuilder("orders")
        .column("o_orderkey", "int", nullable=False)
        .column("o_orderstatus", "str", isin=["O", "F"])
        .column("o_totalprice", "float", le=300000.0)
        .build()
    )
    res = SparkValidator(schema, key_columns=("o_orderkey",)).validate(
        _t(spark, sf_dir, "orders")
    )
    return res.violations().select(
        "o_orderkey",
        F.concat_ws(",", F.array_sort("failed_checks")).alias("failed_checks"),
    )


_SQL_VIOLATION_ROWS_ORDERS = """
SELECT o_orderkey,
       concat_ws(',',
         CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F')
              THEN 'o_orderstatus__isin' END,
         CASE WHEN o_totalprice IS NOT NULL AND NOT (o_totalprice <= 300000.0)
              THEN 'o_totalprice__le' END
       ) AS failed_checks
FROM orders
WHERE o_orderkey IS NULL
   OR (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F'))
   OR (o_totalprice IS NOT NULL AND NOT (o_totalprice <= 300000.0))
"""


# C5 pattern checks (rlike, anchored-at-start semantics)
def q_check_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = SparkValidator(
        SchemaBuilder("c").column("c_name", "str", pattern="Customer#[0-9]+$").build()
    ).check_counts(_t(spark, sf_dir, "customer"))
    docs = SparkValidator(
        SchemaBuilder("d").column("lang", "str", pattern="^(en|es|fr)$").build()
    ).check_counts(_t(spark, sf_dir, "documents"))
    return cust.unionAll(docs)


_SQL_PATTERNS = """
SELECT 'c_name__pattern' AS "check",
       CAST(sum(CASE WHEN c_name IS NOT NULL
                     AND NOT regexp_matches(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       count(*) AS n_checked FROM customer
UNION ALL
SELECT 'lang__pattern',
       CAST(sum(CASE WHEN lang IS NOT NULL
                     AND NOT regexp_matches(lang, '^(en|es|fr)$') THEN 1 ELSE 0 END) AS BIGINT),
       count(*) FROM documents
"""


# A1-A6 single-pass numeric profile (exact percentiles at oracle scale)
def q_profile_lineitem_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return numeric_summary(_t(spark, sf_dir, "lineitem"), "l_quantity", exact=True)


_SQL_PROFILE_LINEITEM_QUANTITY = """
SELECT count(*) AS n,
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       round(avg(l_quantity), 4) AS mean,
       round(stddev_pop(l_quantity), 4) AS std_pop,
       round(min(l_quantity), 4) AS vmin,
       round(max(l_quantity), 4) AS vmax,
       round(quantile_cont(l_quantity, 0.25), 4) AS q1,
       round(quantile_cont(l_quantity, 0.5), 4) AS median,
       round(quantile_cont(l_quantity, 0.75), 4) AS q3
FROM lineitem
"""


# A7 equal-width histogram, all-in-plan (min/max subquery on both sides)
def q_histogram_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mm = ev.agg(
        F.min(F.col("value").cast("double")).alias("lo"),
        F.max(F.col("value").cast("double")).alias("hi"),
    ).collect()[0]
    return histogram_df(ev, "value", mm["lo"], mm["hi"], 10).orderBy("bucket")


_SQL_HISTOGRAM_EVENTS_VALUE = """
WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
     b AS (SELECT CAST(least(greatest(floor((e.value - mm.lo) / ((mm.hi - mm.lo) / 10)), 0), 9) AS INTEGER) AS bucket
           FROM events e, mm WHERE e.value IS NOT NULL)
SELECT bucket, count(*) AS n FROM b GROUP BY bucket ORDER BY bucket
"""


# A16 group + top-K with deterministic tiebreak
def q_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(5)
    )


_SQL_TOPK_EVENT_TYPES = """
SELECT event_type, count(*) AS n FROM events
GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 5
"""


# A11 duplicate full rows via 128-bit row digest (hash-first at scale)
def q_duplicate_rows_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    digest = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in d.columns]
        )
    )
    return d.agg(
        (F.count(F.lit(1)) - F.countDistinct(digest)).alias("duplicate_rows"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_SQL_DUPLICATE_ROWS_DOCUMENTS = """
SELECT CAST(count(*) - count(DISTINCT md5(concat_ws(chr(31),
         coalesce(CAST(doc_id AS VARCHAR), chr(0)),
         coalesce(text, chr(0)),
         coalesce(lang, chr(0)),
         coalesce(source, chr(0)),
         coalesce(CAST(n_chars AS VARCHAR), chr(0))))) AS BIGINT) AS duplicate_rows,
       count(*) AS n_rows
FROM documents
"""


# D1-north-star: PSI between two halves of documents on n_chars, in-plan
def q_psi_documents_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 2 == 0)
    cur = d.filter(F.col("doc_id") % 2 == 1)
    mm = base.agg(
        F.min(F.col("n_chars").cast("double")).alias("lo"),
        F.max(F.col("n_chars").cast("double")).alias("hi"),
    ).collect()[0]
    return psi_df(base, cur, "n_chars", mm["lo"], mm["hi"], 10)


_SQL_PSI_DOCUMENTS_NCHARS = """
WITH base AS (SELECT n_chars FROM documents WHERE doc_id % 2 = 0),
     cur  AS (SELECT n_chars FROM documents WHERE doc_id % 2 = 1),
     mm   AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo, CAST(max(n_chars) AS DOUBLE) AS hi FROM base),
     eb   AS (SELECT CAST(least(greatest(floor((n_chars - mm.lo) / ((mm.hi - mm.lo) / 10)), 0), 9) AS INTEGER) AS bucket,
                     count(*) AS ne
              FROM base, mm WHERE n_chars IS NOT NULL GROUP BY 1),
     ab   AS (SELECT CAST(least(greatest(floor((n_chars - mm.lo) / ((mm.hi - mm.lo) / 10)), 0), 9) AS INTEGER) AS bucket,
                     count(*) AS na
              FROM cur, mm WHERE n_chars IS NOT NULL GROUP BY 1),
     j    AS (SELECT coalesce(eb.ne, 0) AS ne, coalesce(ab.na, 0) AS na
              FROM eb FULL OUTER JOIN ab USING (bucket)),
     t    AS (SELECT sum(ne) AS te, sum(na) AS ta FROM j)
SELECT round(sum((greatest(na * 1.0 / ta, 1e-9) - greatest(ne * 1.0 / te, 1e-9))
               * ln(greatest(na * 1.0 / ta, 1e-9) / greatest(ne * 1.0 / te, 1e-9))), 4) AS psi
FROM j, t
"""


# U2/U3 cross-column + conditional checks over lineitem pricing arithmetic
def q_check_cross_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = (
        SchemaBuilder("lineitem")
        .column("l_quantity", "float")
        .column("l_extendedprice", "float")
        .column("l_discount", "float")
        .cross_column_check("price_per_unit_positive", sql="l_extendedprice / l_quantity > 0")
        .conditional_check(
            "big_order_discounted", "l_quantity >= 45", "l_discount >= 0.01"
        )
        .build()
    )
    return SparkValidator(schema).check_counts(_t(spark, sf_dir, "lineitem"))


_SQL_CROSS_LINEITEM = """
SELECT 'table__price_per_unit_positive' AS "check",
       CAST(sum(CASE WHEN coalesce(l_extendedprice / l_quantity > 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS n_failed,
       count(*) AS n_checked FROM lineitem
UNION ALL
SELECT 'table__big_order_discounted',
       CAST(sum(CASE WHEN coalesce(CASE WHEN l_quantity >= 45 THEN l_discount >= 0.01 END, TRUE) THEN 0 ELSE 1 END) AS BIGINT),
       count(*) FROM lineitem
"""


QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "check_nulls_lineitem": (q_check_nulls_lineitem, _SQL_NULLS_LINEITEM),
    "check_ranges_lineitem": (q_check_ranges_lineitem, _SQL_RANGES_LINEITEM),
    "check_unique": (q_check_unique, _SQL_UNIQUE),
    "check_isin_orders": (q_check_isin_orders, _SQL_ISIN_ORDERS),
    "check_referential": (q_check_referential, _SQL_REFERENTIAL),
    "violation_rows_orders": (q_violation_rows_orders, _SQL_VIOLATION_ROWS_ORDERS),
    "check_patterns": (q_check_patterns, _SQL_PATTERNS),
    "check_cross_lineitem": (q_check_cross_lineitem, _SQL_CROSS_LINEITEM),
    "profile_lineitem_quantity": (q_profile_lineitem_quantity, _SQL_PROFILE_LINEITEM_QUANTITY),
    "histogram_events_value": (q_histogram_events_value, _SQL_HISTOGRAM_EVENTS_VALUE),
    "topk_event_types": (q_topk_event_types, _SQL_TOPK_EVENT_TYPES),
    "duplicate_rows_documents": (q_duplicate_rows_documents, _SQL_DUPLICATE_ROWS_DOCUMENTS),
    "psi_documents_nchars": (q_psi_documents_nchars, _SQL_PSI_DOCUMENTS_NCHARS),
}


def entry_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: the full validation check suite over orders — every check
    kind (null, range, isin, unique, referential, pattern, cross, conditional)
    in one engine pass, returning per-check totals."""
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    schema = (
        SchemaBuilder("orders")
        .column("o_orderkey", "int", nullable=False, unique=True, ge=0)
        .column("o_custkey", "int", nullable=False)
        .column("o_orderstatus", "str", nullable=False, isin=["O", "F", "P"])
        .column("o_totalprice", "float", gt=0.0)
        .column("o_orderpriority", "str", pattern="^[1-5]-")
        .cross_column_check("priced_when_open", sql="o_totalprice > 0 OR o_orderstatus <> 'O'")
        .conditional_check("urgent_has_price", "o_orderpriority = '1-URGENT'", "o_totalprice > 0")
        .build()
    )
    validator = SparkValidator(schema, ref_checks={"o_custkey": (customer, "c_custkey")})
    return validator.check_counts(_t(spark, sf_dir, "orders"))
