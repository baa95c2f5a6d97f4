"""The licensing engine: filter-config trees compiled to Spark Column
predicates + holdings interval joins (SURVEY.md §7.4 — the reference's
span-tag, J6/J7; config semantics sources/amsl.py:850-868,976-1358).

Config shape (per ISIL), as in the reference's filter-config JSON:

    {"or": [tree...]} | {"and": [tree...]} | {"not": tree}
    | {"source": ["55", ...]}                      # finc_source_id in
    | {"collection": ["name", ...]}                # mega_collection overlap
    | {"subject": ["s", ...]}                      # subjects overlap
    | {"issn": {"list": [...]}}                    # record ISSNs overlap
    | {"isbn": {"list": [...]}}                    # rft_isbn overlap
    | {"content": {"list": [ids...]}}              # record_id whitelist (J7)
    | {"holdings": {"files": [file_uri, ...]}}     # KBART coverage (join)

The reference fetches issn/content lists from URLs and freezes them
(span-freeze); here the snapshot step materializes them as plain lists
or DataFrames before compilation — fetching is an ingestion concern and
never happens inside executors.

Execution model: column-only predicates fold into ONE pass over the
records (broadcast literals — the reference's own observation that
in-memory collection lists are the main speedup, amsl.py:906-922).
Holdings leaves need a join; each distinct (files-tuple) gets one
exploded-ISSN equi-join against the broadcast KBART table, aggregated
back to a boolean flag column, and the tree then references the flag.
All ISILs are evaluated in a single job — no per-ISIL passes over the
corpus (span-tag iterates filters per record in one pass too).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from siskin_spark.schema import issns_all

HOLDINGS_FLAG_PREFIX = "_hold_"


def _overlap(col: Column, values: list[str]) -> Column:
    return F.arrays_overlap(
        F.coalesce(col, F.array().cast("array<string>")),
        F.array(*[F.lit(v) for v in values]),
    )


class LicensingCompiler:
    """Compiles a {ISIL: tree} config against a records DataFrame."""

    def __init__(
        self,
        holdings: DataFrame | None = None,
        date_col: str = "x_date",
        record_id_col: str = "finc_record_id",
    ):
        self.holdings = holdings
        self.date_col = date_col
        self.record_id_col = record_id_col
        self._holdings_leaves: dict[tuple[str, ...], str] = {}

    # -- pass 1: find holdings leaves so their joins can be planned ----
    def _collect_holdings(self, tree: dict[str, Any]) -> None:
        for op, arg in tree.items():
            if op in ("or", "and"):
                for sub in arg:
                    self._collect_holdings(sub)
            elif op == "not":
                self._collect_holdings(arg)
            elif op == "holdings":
                key = tuple(sorted(arg.get("files", arg.get("urls", []))))
                if key not in self._holdings_leaves:
                    self._holdings_leaves[key] = (
                        f"{HOLDINGS_FLAG_PREFIX}{len(self._holdings_leaves)}"
                    )

    # -- pass 2: tree -> Column --------------------------------------
    def _compile(self, tree: dict[str, Any]) -> Column:
        if len(tree) != 1:
            # implicit AND over sibling keys (reference treats each
            # filter dict entry as a conjunct, amsl.py:850-868)
            return self._compile({"and": [{k: v} for k, v in tree.items()]})
        ((op, arg),) = tree.items()
        if op == "or":
            out = F.lit(False)
            for sub in arg:
                out = out | self._compile(sub)
            return out
        if op == "and":
            out = F.lit(True)
            for sub in arg:
                out = out & self._compile(sub)
            return out
        if op == "not":
            return ~self._compile(arg)
        if op == "source":
            return F.col("finc_source_id").isin([str(s) for s in arg])
        if op == "collection":
            return _overlap(F.col("finc_mega_collection"), list(arg))
        if op == "subject":
            return _overlap(F.col("subjects"), list(arg))
        if op == "issn":
            return F.arrays_overlap(
                issns_all(), F.array(*[F.lit(v) for v in arg["list"]])
            )
        if op == "isbn":
            return _overlap(F.col("rft_isbn"), list(arg["list"]))
        if op == "content":
            return F.col(self.record_id_col).isin(list(arg["list"]))
        if op == "holdings":
            key = tuple(sorted(arg.get("files", arg.get("urls", []))))
            return F.col(self._holdings_leaves[key])
        raise ValueError(f"unknown filter node: {op}")

    def _attach_holdings_flags(self, records: DataFrame, id_col: str) -> DataFrame:
        if not self._holdings_leaves:
            return records
        if self.holdings is None:
            raise ValueError("config has holdings leaves but no holdings table given")
        for files, flag in self._holdings_leaves.items():
            h = self.holdings
            if files:
                h = h.filter(F.col("file_uri").isin(list(files)))
            h = h.select(
                F.explode(
                    F.array_distinct(
                        F.array_compact(
                            F.array(
                                F.col("print_identifier"), F.col("online_identifier")
                            )
                        )
                    )
                ).alias("_ident"),
                F.col("date_first_issue_online").alias("_from"),
                F.col("date_last_issue_online").alias("_to"),
            )
            # coverage is date-granular (KBART bounds are dates); record
            # timestamps truncate to the day for the comparison
            ids = records.select(
                F.col(id_col).alias("_rk"),
                F.col(self.date_col).cast("date").alias("_rdate"),
                F.explode(issns_all()).alias("_ident"),
            )
            cond = (
                F.col("_from").isNull() | (F.col("_rdate") >= F.col("_from"))
            ) & (F.col("_to").isNull() | (F.col("_rdate") <= F.col("_to")))
            matched = (
                ids.join(broadcast(h), on="_ident")
                .filter(cond)
                .select("_rk")
                .distinct()
                .withColumn(flag, F.lit(True))
                .withColumnRenamed("_rk", id_col)
            )
            records = records.join(matched, on=id_col, how="left").withColumn(
                flag, F.coalesce(F.col(flag), F.lit(False))
            )
        return records

    def attach_labels(
        self,
        records: DataFrame,
        config: dict[str, dict[str, Any]],
        id_col: str = "finc_id",
        labels_col: str = "x_labels",
        drop_unlabeled: bool = False,
    ) -> DataFrame:
        """J6 span-tag: evaluate every ISIL's tree, set ``labels_col``
        to the sorted list of matching ISILs; optionally drop records
        with no label (span-tag -D, workflows/ai.py:232-237)."""
        self._holdings_leaves = {}
        for tree in config.values():
            self._collect_holdings(tree)
        work = self._attach_holdings_flags(records, id_col)
        pairs = [
            F.when(self._compile(tree), F.lit(isil)) for isil, tree in config.items()
        ]
        out = work.withColumn(
            labels_col, F.array_sort(F.array_compact(F.array(*pairs)))
        )
        out = out.drop(
            *[c for c in out.columns if c.startswith(HOLDINGS_FLAG_PREFIX)]
        )
        if drop_unlabeled:
            out = out.filter(F.size(labels_col) > 0)
        return out


def attach_labels(
    records: DataFrame,
    config: dict[str, dict[str, Any]],
    holdings: DataFrame | None = None,
    **kw: Any,
) -> DataFrame:
    """Functional entry point for the licensing engine (J6)."""
    return LicensingCompiler(holdings=holdings).attach_labels(records, config, **kw)


def apply_oa_flag(
    records: DataFrame,
    oa_issns: DataFrame | None = None,
    free_collections: list[str] | None = None,
    oa_source_ids: list[str] | None = None,
    excluded_source_ids: list[str] | None = None,
    flag_col: str = "x_oa",
) -> DataFrame:
    """span-oa-filter semantics (reference: workflows/ai.py:758-798):
    x_oa = (ISSN in OA-KBART list) OR (collection in free-content list)
    OR (source in -oasid allowlist), unless source in -xsid excludes.

    The ISSN list is joined broadcast (it is KBART-derived config data);
    everything else is literal predicates — one pass, no extra shuffle.
    """
    if oa_issns is not None:
        hit = (
            records.select(F.col("finc_id").alias("_rk"), F.explode(issns_all()).alias("_i"))
            .join(broadcast(oa_issns.select(F.col("issn").alias("_i")).distinct()), on="_i")
            .select("_rk")
            .distinct()
            .withColumn("_oa_issn", F.lit(True))
            .withColumnRenamed("_rk", "finc_id")
        )
        records = records.join(hit, on="finc_id", how="left").withColumn(
            "_oa_issn", F.coalesce(F.col("_oa_issn"), F.lit(False))
        )
    else:
        records = records.withColumn("_oa_issn", F.lit(False))

    flag = F.col("_oa_issn")
    if free_collections:
        flag = flag | _overlap(F.col("finc_mega_collection"), free_collections)
    if oa_source_ids:
        flag = flag | F.col("finc_source_id").isin(oa_source_ids)
    if excluded_source_ids:
        flag = flag & ~F.col("finc_source_id").isin(excluded_source_ids)
    return records.withColumn(flag_col, flag).drop("_oa_issn")
