"""Tests: skew-safe two-phase aggregation equivalence, bucketed
co-located joins (asserted shuffle-free via the physical plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from siskin_spark.operators.aggregates import two_phase_agg
from siskin_spark.sources.readers import write_bucketed


def test_two_phase_agg_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("q"),
            F.min("l_orderkey").alias("mn"),
            F.max("l_orderkey").alias("mx"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    salted = (
        two_phase_agg(
            li,
            ["l_returnflag"],
            {"n": "count", "q": "sum:l_quantity", "mn": "min:l_orderkey", "mx": "max:l_orderkey"},
            salt_buckets=8,
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [(r.l_returnflag, r.n, r.mn, r.mx) for r in direct] == [
        (r.l_returnflag, r.n, r.mn, r.mx) for r in salted
    ]
    for a, b in zip(direct, salted):
        assert abs(a.q - b.q) < 1e-6 * max(1.0, abs(a.q))


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    # managed tables land in ./spark-warehouse (warehouse.dir is a
    # static conf); DROP TABLE in the finally removes the files
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "b_orders", ["o_custkey"], buckets=8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "b_cust", ["o_custkey"], buckets=8
    )
    bo = spark.table("b_orders")
    bc = spark.table("b_cust")
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, on="o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # results still correct
        assert joined.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_hot_key_profile_detects_skew(spark):
    from siskin_spark.operators.aggregates import hot_key_profile

    rows = [("hot", i) for i in range(900)] + [
        (f"k{i}", i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    prof = hot_key_profile(df, ["k"], top=5)
    assert prof["rows"] == 1000
    assert prof["distinct_keys"] == 101
    assert prof["top"][0]["key"] == {"k": "hot"}
    assert abs(prof["top"][0]["share"] - 0.9) < 1e-9
    assert prof["skewed"]
    # hot key is ~91x the mean key weight -> salt to ~mean slices
    assert 64 <= prof["suggested_salt_buckets"] <= 128

    # the suggestion actually flattens the hot key: with that many
    # salt buckets, two_phase_agg phase 1 bounds any one reducer's
    # share of "hot" to <= ceil(900/buckets)
    agg = two_phase_agg(
        df, ["k"], {"n": "count"}, salt_buckets=prof["suggested_salt_buckets"]
    )
    got = {r["k"]: r["n"] for r in agg.collect()}
    assert got["hot"] == 900 and got["k3"] == 1


def test_hot_key_profile_uniform_not_skewed(spark):
    from siskin_spark.operators.aggregates import hot_key_profile

    df = spark.createDataFrame(
        [(f"k{i % 50}", i) for i in range(1000)], "k string, v long"
    )
    prof = hot_key_profile(df, ["k"])
    assert not prof["skewed"]
    assert prof["suggested_salt_buckets"] == 0
    assert prof["mean_rows_per_key"] == 20.0


def test_hot_key_profile_empty(spark):
    from siskin_spark.operators.aggregates import hot_key_profile

    df = spark.createDataFrame([], "k string, v long")
    prof = hot_key_profile(df, ["k"])
    assert prof == {
        "rows": 0,
        "distinct_keys": 0,
        "mean_rows_per_key": 0.0,
        "top": [],
        "max_share": 0.0,
        "skewed": False,
        "suggested_salt_buckets": 0,
    }
