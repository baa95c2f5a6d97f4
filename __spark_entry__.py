"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose one entry per implemented operator from
SURVEY.md §2, verified against a DuckDB oracle at sf0.01.

Implementation lives in ``siskin_spark``; this module only binds the
operators to the driver's synthetic tables. Numeric aggregates are
computed over exact decimals then cast to double so Spark and DuckDB
produce bit-identical values regardless of summation order.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from siskin_spark.operators import aggregates, dedup, joins
from siskin_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dsum(col: Column | str, alias: str) -> Column:
    """Exact decimal sum, rounded to scale 2, surfaced as double.

    Summation order independence comes from decimal arithmetic; the
    ROUND-before-cast matters because DuckDB's high-scale decimal ->
    double cast is not correctly rounded (int128/10^scale in float),
    while a scale-2 decimal converts exactly the same in both engines.
    Oracle-side equivalent: CAST(ROUND(SUM(CAST(x AS DECIMAL(18,6))),2) AS DOUBLE).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(18,6)")), 2).cast("double").alias(alias)


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def reg(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return reg


# ---------------------------------------------------------------------------
# A1/§2.6 aggregations


@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE)
               AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the reference's group-count
    family (A1, sources/crossref.py:296-330) on numeric measures.
    Single hash aggregate with map-side combine; no window, no UDF."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.round(
                F.sum(
                    dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,6)") - dec("l_discount"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_disc_price"),
            (
                F.round(F.sum(dec("l_quantity")), 2).cast("double") / F.count("*")
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "group_count_events",
    """
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def group_count_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 group-count (reference: collection -> #records)."""
    return aggregates.group_count(_t(spark, sf_dir, "events"), ["event_type"])


@_q(
    "collect_segments_per_nation",
    """
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def collect_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 collect-to-map (reference: ISSN->collection names,
    sources/jstor.py:586-612): key -> sorted distinct value list."""
    cust = _t(spark, sf_dir, "customer")
    out = aggregates.collect_to_map(cust, "c_nationkey", "c_mktsegment")
    return out.select(
        "c_nationkey", F.array_join("values", "|").alias("segments")
    ).orderBy("c_nationkey")


# ---------------------------------------------------------------------------
# D1/D2/D4/D6 dedup family


@_q(
    "snapshot_latest_order",
    """
    SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def snapshot_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 snapshot: latest record per key from an append-only feed
    (reference: span-crossref-snapshot, sources/crossref.py:136-214).
    max_by aggregate, not a window — partial combine pre-shuffle."""
    orders = _t(spark, sf_dir, "orders")
    snap = dedup.snapshot_latest(orders, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    return snap.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
    ).orderBy("o_custkey")


@_q(
    "argmax_latest_event",
    """
    SELECT user_id, event_type, event_id, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def argmax_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 argmax dedup (reference: DOAJ newest-date-per-title,
    sources/doaj.py:143-217)."""
    ev = _t(spark, sf_dir, "events")
    out = dedup.argmax_dedup(
        ev, ["user_id", "event_type"], ["ts", "event_id"],
        keep=["user_id", "event_type", "event_id", "value"],
    )
    return out.orderBy("user_id", "event_type")


@_q(
    "exact_dedup_documents",
    """
    SELECT min(doc_id) AS doc_id, text
    FROM documents GROUP BY text ORDER BY doc_id
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 exact duplicate drop with deterministic representative
    (reference: sort -u, sources/ios.py:118-137)."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.snapshot_earliest(docs, ["text"], ["doc_id"])
    return out.select("doc_id", "text").orderBy("doc_id")


@_q(
    "distinct_brands",
    "SELECT DISTINCT p_brand FROM part WHERE p_brand IS NOT NULL ORDER BY p_brand",
)
def distinct_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 distinct sorted list (reference: DOI lists,
    sources/crossref.py:419-505)."""
    return dedup.distinct_sorted(_t(spark, sf_dir, "part"), "p_brand")


@_q(
    "distinct_union_keys",
    """
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders
      UNION
      SELECT c_custkey AS k FROM customer
    ) WHERE k IS NOT NULL ORDER BY k
    """,
)
def distinct_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 distinct union (reference: citing+cited DOI union,
    sources/oci.py:176-196)."""
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return aggregates.distinct_union([orders, cust], "k")


# ---------------------------------------------------------------------------
# F1/F2 filter joins


@_q(
    "blacklist_anti_filter",
    """
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem
    WHERE NOT EXISTS (
      SELECT 1 FROM part
      WHERE p_partkey = l_partkey AND p_brand IN ('Brand#1','Brand#2','Brand#3')
    )
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def blacklist_anti_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 blacklist anti-filter (reference: grep -vf issn-blacklist,
    sources/doaj.py:128-137). Broadcast anti join on the small list."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bl = part.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    kept = joins.blacklist_filter(li, bl, on="l_partkey")
    return kept.groupBy("l_returnflag").agg(F.count("*").alias("n")).orderBy("l_returnflag")


@_q(
    "whitelist_semi_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM customer
      WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def whitelist_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 whitelist semi-filter (reference: grep -Ff id-whitelist,
    sources/doaj.py:190-217). Broadcast left-semi join."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    wl = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    kept = joins.whitelist_filter(orders, wl, on="o_custkey")
    return kept.groupBy("o_orderpriority").agg(F.count("*").alias("n")).orderBy(
        "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# driver contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: snapshot-dedup the order feed (D1), enrich through the
    dimension chain (J2-style broadcast joins), aggregate latest-order
    revenue per region/nation (A1) — one of each major operator family,
    mirroring SURVEY.md §7.2's minimum end-to-end slice."""
    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    latest = dedup.snapshot_latest(orders, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    enriched = joins.enrich_lookup(
        latest.withColumnRenamed("o_custkey", "c_custkey"), cust, on="c_custkey"
    )
    enriched = joins.enrich_lookup(
        enriched, nation.withColumnRenamed("n_nationkey", "c_nationkey"), on="c_nationkey"
    )
    enriched = joins.enrich_lookup(
        enriched, region.withColumnRenamed("r_regionkey", "n_regionkey"), on="n_regionkey"
    )
    return (
        enriched.groupBy("r_name", "n_name")
        .agg(
            _dsum("o_totalprice", "latest_order_revenue"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("r_name", "n_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
