"""S8 JDBC scan against an embedded Derby database.

Derby ships in Spark's jars (metastore dependency), so this exercises
the real JDBC code path — connection, partitioned range scan, filter
pushdown — with no external service. Mirrors the reference's sqlite3
streaming reads (`database.py:37-106`) on the only JDBC engine in the
container.
"""

from __future__ import annotations

import pytest

from siskin_spark.sources.jdbc import read_jdbc_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    dbdir = tmp_path_factory.mktemp("derby")
    jvm = spark._jvm
    jvm.java.lang.System.setProperty("derby.system.home", str(dbdir))
    url = f"jdbc:derby:{dbdir}/testdb"
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE records (id INT PRIMARY KEY, doi VARCHAR(64), n INT)"
    )
    ps = conn.prepareStatement("INSERT INTO records VALUES (?, ?, ?)")
    for i in range(1, 101):
        ps.setInt(1, i)
        ps.setString(2, f"10.1000/x{i % 7}")
        ps.setInt(3, i * 10)
        ps.addBatch()
    ps.executeBatch()
    st2 = conn.createStatement()
    st2.executeUpdate(
        "CREATE TABLE empty_records (id INT PRIMARY KEY, doi VARCHAR(64))"
    )
    st2.close()
    st.close()
    conn.close()
    yield url


def test_jdbc_single_connection_read(spark, derby_url):
    df = read_jdbc_table(spark, derby_url, "records", driver=DRIVER)
    assert df.count() == 100
    assert {c.lower() for c in df.columns} == {"id", "doi", "n"}


def test_jdbc_partitioned_scan_with_probed_bounds(spark, derby_url):
    df = read_jdbc_table(
        spark,
        derby_url,
        "records",
        driver=DRIVER,
        partition_column="id",
        num_partitions=4,
    )
    # range slicing on the key covers every row exactly once
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    total = df.selectExpr("sum(n) s").first()["s"]
    assert total == sum(i * 10 for i in range(1, 101))


def test_jdbc_partitioned_scan_empty_table_falls_back(spark, derby_url):
    # MIN/MAX probe returns NULLs on an empty table; the reader must
    # fall back to a single-connection scan instead of feeding "None"
    # into lowerBound (historical NumberFormatException).
    df = read_jdbc_table(
        spark,
        derby_url,
        "empty_records",
        driver=DRIVER,
        partition_column="id",
        num_partitions=4,
    )
    assert df.count() == 0
    assert {c.lower() for c in df.columns} == {"id", "doi"}


def test_jdbc_filter_pushdown(spark, derby_url):
    df = read_jdbc_table(spark, derby_url, "records", driver=DRIVER)
    filtered = df.filter(df["N"] > 500).select("ID")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # predicate reaches the JDBC scan node, not a Spark-side Filter
    assert "PushedFilters" in plan and "GreaterThan" in plan
    assert filtered.count() == 50
