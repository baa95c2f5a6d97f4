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
    ):
        def reg(fn):
            self.stages[name] = Stage(name, fn, requires, snap, partition_by)
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
            writer = out.write.mode("overwrite")
            if st.partition_by:
                writer = writer.partitionBy(*st.partition_by)
            writer.parquet(self.path(name, params, date))
        return self.read(spark, target, params, date)

    def read(
        self,
        spark: SparkSession,
        name: str,
        params: dict[str, Any] | None = None,
        date: datetime.date | None = None,
    ) -> DataFrame:
        """`siskin cat` equivalent — read a materialized stage."""
        return spark.read.parquet(
            self.path(name, params or {}, date or datetime.date.today())
        )
