"""DuckDB-oracle comparison harness mirroring the driver's check:
row count + schema + order-insensitive value comparison (columns sorted
by name, rows sorted by all columns)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize temporal/bytes-ish cells to comparable primitives
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    issues: list[str] = []
    got = _canon(spark_df.toPandas())
    con = duck_connection(sf_dir)
    want = _canon(con.execute(sql).df())
    con.close()

    if list(got.columns) != list(want.columns):
        return [f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"]
    if len(got) != len(want):
        return [f"row count differs: spark={len(got)} oracle={len(want)}"]

    # The external driver hashes raw pandas values, so a dtype skew that
    # changes the value's printed form (e.g. DuckDB HUGEINT -> float64
    # `2088.0` vs Spark int64 `2088`) fails there even when == succeeds
    # here. Width differences (int32 vs int64) hash identically and are
    # fine — compare the dtype KIND (int/float/bool/object/datetime).
    # Zero-row frames are skipped entirely: empty-frame dtype skew is
    # intentionally ignored (both engines synthesize dtypes for empty
    # results and the driver's value hash is over zero cells anyway).
    if len(got):
        for c in got.columns:
            ka, kb = got[c].dtype.kind, want[c].dtype.kind
            if ka != kb:
                issues.append(
                    f"col {c}: dtype kind skew spark={got[c].dtype} oracle={want[c].dtype}"
                )
    if issues:
        return issues

    for c in got.columns:
        a, b = got[c], want[c]
        for i in range(len(a)):
            va, vb = a.iloc[i], b.iloc[i]
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if va != vb:
                    issues.append(f"col {c} row {i}: {va!r} != {vb!r} (float)")
            elif va != vb:
                issues.append(f"col {c} row {i}: {va!r} != {vb!r}")
            if len(issues) > 5:
                return issues
    return issues
