"""JDBC source (SURVEY S8).

The reference streams rows out of sqlite3 / MySQL with server-side
cursors (`database.py:37-106` — `sqlitedb()` context manager and a
`SSCursor` MySQL reader) so one process can scan a table bigger than
RAM. The Spark-native equivalent is a *partitioned* `spark.read.jdbc`
scan: N executors each issue a range-bounded query, so the scan
parallelizes instead of streaming through one cursor, and Catalyst
pushes filters/projections into the remote SQL (`PushedFilters` /
ReadSchema on the JDBCRelation scan node).

At 100 TB the partition column must be an indexed, roughly-uniform key
(a surrogate id) — `numPartitions` range-slices on it; a skewed or
unindexed column turns the scan into N full-table scans server-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    bounds: tuple[int, int] | None = None,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan.

    Without ``partition_column`` the whole table arrives through one
    connection (the reference's cursor model — fine for config-sized
    dimensions). With it, bounds are probed via a min/max aggregate
    (cheap, index-only on a keyed column) unless supplied, and the
    scan fans out to ``num_partitions`` range queries.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column:
        if bounds is None:
            probe = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "dbtable",
                    f"(SELECT MIN({partition_column}) AS lo, "
                    f"MAX({partition_column}) AS hi FROM {table}) b",
                )
            )
            if driver:
                probe = probe.option("driver", driver)
            # unquoted identifiers arrive upper-cased from Derby/Oracle
            d = {k.lower(): v for k, v in probe.load().first().asDict().items()}
            if d["lo"] is None or d["hi"] is None:
                # Empty table: MIN/MAX are NULL and "None" would reach
                # the JVM as an unparseable lowerBound. One connection
                # reading zero rows is the right plan anyway.
                return reader.load()
            bounds = (d["lo"], d["hi"])
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
