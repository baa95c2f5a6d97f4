"""Memoized pipeline runner — the engine's Luigi-equivalent
(SURVEY.md §3: task graph -> stages materialized to Parquet keyed by
(stage name, params digest, snapped date), completeness = _SUCCESS
marker, topo-ordered, memoized; replaces `siskin run/cat/deps/status`,
reference cli.py:145-161,211-298,713-723).

Differences from the reference by design:

- A stage body is a ``(spark, inputs: dict[str, DataFrame], params)
  -> DataFrame`` function — the DAG *inside* a stage is Catalyst's
  job; the runner only sequences materialization boundaries.
- Outputs are partitioned Parquet with Spark's job-commit protocol
  giving the atomic tmp->rename the reference implements by hand
  (task.py:60-96).
- Date snapping (gluish weekly/monthly ClosestDateParameter,
  sources/crossref.py:84-88) is a first-class cache-key component so
  re-runs inside a window are cache hits.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def snap_date(d: datetime.date, every: str = "daily") -> datetime.date:
    """Snap a run date to its bucket start (gluish weekly/monthly)."""
    if every == "daily":
        return d
    if every == "weekly":
        return d - datetime.timedelta(days=d.weekday())
    if every == "monthly":
        return d.replace(day=1)
    raise ValueError(f"unknown snap interval: {every}")


def params_digest(params: dict[str, Any]) -> str:
    blob = json.dumps(params, sort_keys=True, default=str).encode()
    return hashlib.sha1(blob).hexdigest()[:12]


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, dict[str, DataFrame], dict[str, Any]], DataFrame]
    requires: tuple[str, ...] = ()
    snap: str = "daily"
    partition_by: tuple[str, ...] = ()
    # bucket_by + n_buckets: write the stage as a BUCKETED (and
    # bucket-sorted) table so every downstream equi-join/groupBy on the
    # bucket key is co-located — no Exchange, no Sort. This is how the
    # doi/id-keyed chain (snapshot -> licensing -> groupcover -> label
    # update) avoids re-shuffling the full corpus at every stage: the
    # 100 TB feed shuffles ONCE into buckets, then every later stage
    # reads bucket-aligned splits. (The reference gets this for free by
    # re-sorting files on disk between steps — sort IS its bucketing.)
    bucket_by: tuple[str, ...] = ()
    n_buckets: int = 0


@dataclass
class Pipeline:
    """A registry of stages + a base path; `run` materializes a target
    stage and its transitive requirements, skipping complete ones."""

    base: str
    stages: dict[str, Stage] = field(default_factory=dict)

    def stage(
        self,
        name: str,
        requires: tuple[str, ...] = (),
        snap: str = "daily",
        partition_by: tuple[str, ...] = (),
        bucket_by: tuple[str, ...] = (),
        n_buckets: int = 0,
    ):
        if bool(bucket_by) != bool(n_buckets):
            raise ValueError("bucket_by and n_buckets must be set together")
        if bucket_by and partition_by:
            raise ValueError("bucketing and partitioning are mutually exclusive here")

        def reg(fn):
            self.stages[name] = Stage(
                name, fn, requires, snap, partition_by, bucket_by, n_buckets
            )
            return fn

        return reg

    # -- paths / completeness (reference: content-addressed artifact
    # paths with param digests, task.py:60-96, common.py:146-149) -----
    def path(self, name: str, params: dict[str, Any], date: datetime.date) -> str:
        st = self.stages[name]
        snapped = snap_date(date, st.snap)
        return os.path.join(
            self.base, name, f"date-{snapped.isoformat()}-{params_digest(params)}"
        )

    def is_complete(self, name: str, params: dict[str, Any], date: datetime.date) -> bool:
        return os.path.exists(os.path.join(self.path(name, params, date), "_SUCCESS"))

    # -- graph introspection (`siskin deps`, cli.py:211-298) ----------
    def deps(self, name: str) -> list[str]:
        out: list[str] = []
        seen: set[str] = set()

        def walk(n: str) -> None:
            if n in seen:
                return
            seen.add(n)
            for r in self.stages[n].requires:
                walk(r)
            out.append(n)

        walk(name)
        return out

    def status(self, params: dict[str, Any], date: datetime.date) -> dict[str, bool]:
        return {n: self.is_complete(n, params, date) for n in self.stages}

    def to_dot(self) -> str:
        """Graphviz DOT of the stage DAG (reference `siskin deps-dot`,
        cli.py:211-298) — edges point from requirement to dependent."""
        lines = ["digraph pipeline {", "  rankdir=LR;"]
        for name in self.stages:
            lines.append(f'  "{name}";')
        for name, st in self.stages.items():
            for r in st.requires:
                lines.append(f'  "{r}" -> "{name}";')
        lines.append("}")
        return "\n".join(lines)

    # -- execution -----------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        target: str,
        params: dict[str, Any] | None = None,
        date: datetime.date | None = None,
        force: bool = False,
    ) -> DataFrame:
        params = params or {}
        date = date or datetime.date.today()
        for name in self.deps(target):
            if not force and self.is_complete(name, params, date):
                continue
            st = self.stages[name]
            inputs = {
                r: self.read(spark, r, params, date) for r in st.requires
            }
            out = st.fn(spark, inputs, params)
            if st.bucket_by:
                self._write_bucketed(spark, out, name, params, date)
            else:
                writer = out.write.mode("overwrite")
                if st.partition_by:
                    writer = writer.partitionBy(*st.partition_by)
                writer.parquet(self.path(name, params, date))
        return self.read(spark, target, params, date)

    # -- bucketed stages ----------------------------------------------
    def table_name(self, name: str, params: dict[str, Any], date: datetime.date) -> str:
        st = self.stages[name]
        snapped = snap_date(date, st.snap)
        return (
            f"{name}_{snapped.isoformat()}_{params_digest(params)}".replace("-", "_")
        )

    def _write_bucketed(
        self,
        spark: SparkSession,
        out: DataFrame,
        name: str,
        params: dict[str, Any],
        date: datetime.date,
    ) -> None:
        st = self.stages[name]
        table = self.table_name(name, params, date)
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        (
            out.write.mode("overwrite")
            .format("parquet")
            .option("path", self.path(name, params, date))
            .bucketBy(st.n_buckets, *st.bucket_by)
            .sortBy(*st.bucket_by)
            .saveAsTable(table)
        )

    def _register_bucketed(
        self,
        spark: SparkSession,
        table: str,
        path: str,
        st: Stage,
    ) -> None:
        """Re-attach a bucketed stage written by an earlier session:
        the parquet files + bucket layout survive on disk, but the
        in-memory catalog entry carrying the bucket spec does not, so
        recreate it as an external table over the same location."""
        schema = spark.read.parquet(path).schema
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
        keys = ", ".join(f"`{c}`" for c in st.bucket_by)
        spark.sql(
            f"CREATE TABLE `{table}` ({cols}) USING parquet "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
            f"INTO {st.n_buckets} BUCKETS LOCATION '{path}'"
        )

    def read(
        self,
        spark: SparkSession,
        name: str,
        params: dict[str, Any] | None = None,
        date: datetime.date | None = None,
    ) -> DataFrame:
        """`siskin cat` equivalent — read a materialized stage. Bucketed
        stages come back through the catalog so the bucket spec reaches
        the planner (a plain parquet read of the same files would
        silently drop co-location and re-shuffle downstream joins)."""
        st = self.stages[name]
        params = params or {}
        date = date or datetime.date.today()
        if st.bucket_by:
            table = self.table_name(name, params, date)
            if not spark.catalog.tableExists(table):
                self._register_bucketed(
                    spark, table, self.path(name, params, date), st
                )
            return spark.table(table)
        return spark.read.parquet(self.path(name, params, date))
