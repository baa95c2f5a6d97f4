"""session.local_table: literal driver rows as a JVM LocalRelation.

The list form of ``createDataFrame`` routes through a Python RDD whose
every materialization occupies Python workers; ``local_table`` plans a
``LocalTableScan`` that executes JVM-only. These tests pin (a) exact
value fidelity against the classic path across the types the query
paths use — nullable ints/strings/doubles, dates with NULLs, float
arrays — and (b) the LocalTableScan plan shape that makes it a win.
"""

from __future__ import annotations

import datetime

from siskin_spark.session import local_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_local_table_matches_classic_createdataframe(spark):
    cases = [
        ([(1, None), (None, "x"), (2, "y")], "a long, b string"),
        ([(1, [1.5, 2.5]), (2, None)], "a long, v array<float>"),
        ([(1, 0.5), (2, None)], "a long, d double"),
        (
            [
                ("a", datetime.date(1996, 1, 1), None),
                ("b", None, datetime.date(1998, 12, 31)),
            ],
            "k string, d1 date, d2 date",
        ),
        ([("0003-443X",), ("0007-443X",)], "issn string"),
    ]
    for rows, schema in cases:
        ref = spark.createDataFrame(rows, schema).collect()
        got = local_table(spark, rows, schema)
        assert got.collect() == ref, schema
        assert "LocalTableScan" in _plan(got), _plan(got)


def test_local_table_empty_and_structtype_schema(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    st = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    assert local_table(spark, [], st).count() == 0
    got = local_table(spark, [(1, 2), (3, None)], st)
    assert got.collect() == spark.createDataFrame([(1, 2), (3, None)], st).collect()


def test_local_table_no_python_stage(spark):
    plan = _plan(local_table(spark, [(i, str(i)) for i in range(50)], "a long, b string"))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Scan ExistingRDD"):
        assert marker not in plan, plan
