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

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from siskin_spark.schema import issns_all
from siskin_spark.session import local_table

HOLDINGS_FLAG_PREFIX = "_hold_"
CONTENT_FLAG_PREFIX = "_cont_"
ISSN_FLAG_PREFIX = "_issnf_"

# Above this many entries a content whitelist compiles to a broadcast
# semi-join flag instead of a literal isin() — reference content files
# run 10-50K ids (amsl.py:1174-1203) and a 50K-element isin builds a
# huge expression tree.
CONTENT_ISIN_MAX = 1000

# Above this many entries an ISSN list compiles to a broadcast-join
# flag riding the same exploded-ISSN frame and bit_or aggregate as the
# holdings leaves. `arrays_overlap(record_issns, lit_array)` rebuilds
# a hash set of the literal side PER RECORD — measured 38 s of a 49 s
# attach_labels at 30M records for seven 2,000-entry lists; as join
# flags the whole tree evaluation drops to ~12 s. Small lists stay
# inline literals (cheap, and what the sf-scale oracle configs use).
ISSN_JOIN_MAX = 100

_EMBARGO_RE = r"^\s*([RP])([0-9]+)([DMY])\s*$"


def kbart_embargo_ok(embargo: Column, rdate: Column, now: Column) -> Column:
    """NISO KBART ``embargo_info`` predicate (format ``{R|P}{n}{D|M|Y}``).

    R = the most recent n units are NOT available (the JSTOR-style
    moving wall, e.g. ``R1Y``); P = ONLY the most recent n units are
    available. Null/empty/unparseable embargo = no restriction.
    ``now`` is an explicit column/date — wall-clock-relative semantics
    must never capture the cluster clock inside the plan (SURVEY §7.4;
    reference consumes these via span-tag per sources/amsl.py:459-521).
    """
    etype = F.regexp_extract(embargo, _EMBARGO_RE, 1)
    # try_cast: a non-matching embargo string extracts '' which must
    # become null (= no restriction), not an ANSI cast abort
    n = F.regexp_extract(embargo, _EMBARGO_RE, 2).try_cast("int")
    unit = F.regexp_extract(embargo, _EMBARGO_RE, 3)
    cutoff = (
        F.when(unit == "D", F.date_sub(now, n))
        .when(unit == "M", F.add_months(now, -n))
        .when(unit == "Y", F.add_months(now, -12 * n))
    )
    return (
        F.when(etype == "R", rdate <= cutoff)
        .when(etype == "P", rdate > cutoff)
        .otherwise(F.lit(True))
    )


def kbart_volume_issue_ok(
    rvol: Column,
    rissue: Column,
    first_vol: Column,
    first_issue: Column,
    last_vol: Column,
    last_issue: Column,
) -> Column:
    """KBART volume/issue bounds (``num_first_vol_online`` etc.,
    jstor.py:546-580): lexicographic (volume, issue) containment with
    null-permissive sides — a record with no volume, or a holdings row
    with no bound, passes that comparison (matching the reference's
    behavior of only constraining on data both sides have)."""

    def _ge(v: Column, i: Column, bv: Column, bi: Column) -> Column:
        issue_ok = F.when(bi.isNull() | i.isNull(), F.lit(True)).otherwise(i >= bi)
        return F.when(bv.isNull() | v.isNull(), F.lit(True)).otherwise(
            (v > bv) | ((v == bv) & issue_ok)
        )

    def _le(v: Column, i: Column, bv: Column, bi: Column) -> Column:
        issue_ok = F.when(bi.isNull() | i.isNull(), F.lit(True)).otherwise(i <= bi)
        return F.when(bv.isNull() | v.isNull(), F.lit(True)).otherwise(
            (v < bv) | ((v == bv) & issue_ok)
        )

    return _ge(rvol, rissue, first_vol, first_issue) & _le(
        rvol, rissue, last_vol, last_issue
    )


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
        now: Any = None,
        volume_col: str = "rft_volume",
        issue_col: str = "rft_issue",
    ):
        self.holdings = holdings
        self.date_col = date_col
        self.record_id_col = record_id_col
        self.now = now
        self.volume_col = volume_col
        self.issue_col = issue_col
        self._holdings_leaves: dict[tuple[str, ...], str] = {}
        self._content_leaves: dict[tuple[str, ...], str] = {}
        self._issn_leaves: dict[tuple[str, ...], str] = {}

    # -- pass 1: find join-backed leaves so their one fused join can be
    # planned ---------------------------------------------------------
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
            elif op == "content" and len(arg["list"]) > CONTENT_ISIN_MAX:
                key = tuple(sorted(arg["list"]))
                if key not in self._content_leaves:
                    self._content_leaves[key] = (
                        f"{CONTENT_FLAG_PREFIX}{len(self._content_leaves)}"
                    )
            elif op == "issn" and len(arg["list"]) > ISSN_JOIN_MAX:
                key = tuple(sorted(arg["list"]))
                if key not in self._issn_leaves:
                    self._issn_leaves[key] = (
                        f"{ISSN_FLAG_PREFIX}{len(self._issn_leaves)}"
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
            lst = arg["list"]
            if len(lst) > ISSN_JOIN_MAX:
                # large list: broadcast-join flag (see ISSN_JOIN_MAX) —
                # arrays_overlap would rebuild the literal hash set per
                # record
                return F.col(self._issn_leaves[tuple(sorted(lst))])
            return F.arrays_overlap(
                issns_all(), F.array(*[F.lit(v) for v in lst])
            )
        if op == "isbn":
            return _overlap(F.col("rft_isbn"), list(arg["list"]))
        if op == "content":
            ids = arg["list"]
            if len(ids) > CONTENT_ISIN_MAX:
                return F.col(self._content_leaves[tuple(sorted(ids))])
            return F.col(self.record_id_col).isin(list(ids))
        if op == "holdings":
            key = tuple(sorted(arg.get("files", arg.get("urls", []))))
            return F.col(self._holdings_leaves[key])
        raise ValueError(f"unknown filter node: {op}")

    def _tagged_holdings(self) -> DataFrame:
        """Every holdings leaf's KBART rows, tagged with the leaf's flag
        name, in ONE small frame (the broadcast side). N leaves means N
        filters of the dimension table — never N passes over records."""
        h = self.holdings
        cols = set(h.columns)
        opt = lambda name: (  # noqa: E731
            F.col(name) if name in cols else F.lit(None).cast("string")
        )
        base = h.select(
            F.explode(
                F.array_distinct(
                    F.array_compact(
                        F.array(F.col("print_identifier"), F.col("online_identifier"))
                    )
                )
            ).alias("_ident"),
            # explicit try_cast (string-typed KBART files): malformed
            # coverage date -> null -> open bound, not an ANSI abort at
            # the comparison site
            F.col("date_first_issue_online").try_cast("date").alias("_from"),
            F.col("date_last_issue_online").try_cast("date").alias("_to"),
            opt("embargo_info").alias("_embargo"),
            # try_cast: real KBART files carry junk in num_* columns;
            # unparseable bound -> null -> open interval, never an abort
            opt("num_first_vol_online").try_cast("int").alias("_fvol"),
            opt("num_first_issue_online").try_cast("int").alias("_fiss"),
            opt("num_last_vol_online").try_cast("int").alias("_lvol"),
            opt("num_last_issue_online").try_cast("int").alias("_liss"),
            *([F.col("file_uri")] if "file_uri" in cols else []),
        )
        tagged = None
        for files, flag in self._holdings_leaves.items():
            t = base
            if files:
                t = t.filter(F.col("file_uri").isin(list(files)))
            t = t.withColumn("_flag", self._flag_lit(flag))
            tagged = t if tagged is None else tagged.unionByName(t)
        return tagged.drop("file_uri") if "file_uri" in cols else tagged

    # -- flag representation ------------------------------------------
    # With <= 63 join-backed leaves (the reference runs ~30 holdings
    # files) each leaf gets one BIT in a single long: the per-record
    # aggregate is bit_or of longs instead of collect_set of strings —
    # a fixed 8-byte shuffle/join payload and zero array allocations,
    # which is exactly the memory pressure the 30 M-row single-JVM leg
    # hit. Past 63 leaves the representation degrades gracefully to
    # the name-array path.
    def _all_flag_names(self) -> list[str]:
        return [
            *self._holdings_leaves.values(),
            *self._content_leaves.values(),
            *self._issn_leaves.values(),
        ]

    def _flag_bits(self) -> dict[str, int] | None:
        names = self._all_flag_names()
        if len(names) > 63:
            return None
        return {name: 1 << i for i, name in enumerate(names)}

    def _flag_lit(self, flag: str) -> Column:
        bits = self._flag_bits()
        if bits is None:
            return F.lit(flag)
        return F.lit(bits[flag]).cast("long")

    def _attach_flags(self, records: DataFrame, id_col: str) -> DataFrame:
        """Attach every holdings flag AND every large-content flag with
        ONE join against the records (union of per-leaf matches on the
        small side -> collect_set of flag names -> array_contains).
        The reference runs ~30 holdings files; sequentially that was
        ~30 full left joins of the corpus — this is one. Large ISSN
        lists ride the same machinery: their matches come from the
        exploded-ISSN frame joined to the broadcast list."""
        if not (
            self._holdings_leaves or self._content_leaves or self._issn_leaves
        ):
            return records
        spark = records.sparkSession
        rcols = set(records.columns)
        matches = None  # (_rk, _flag) pairs, small/broadcastable side logic

        if self._holdings_leaves:
            if self.holdings is None:
                raise ValueError(
                    "config has holdings leaves but no holdings table given"
                )
            if "embargo_info" in self.holdings.columns and self.now is None:
                # Real KBART files always carry the embargo_info COLUMN
                # (32-column standard) — only a parseable VALUE makes
                # `now` mandatory. Holdings are config-sized, so this
                # probe is one tiny scan of the broadcast side.
                has_embargo = (
                    self.holdings.filter(
                        F.regexp_extract(
                            F.col("embargo_info").cast("string"), _EMBARGO_RE, 1
                        )
                        != ""
                    )
                    .limit(1)
                    .count()
                    > 0
                )
                if has_embargo:
                    raise ValueError(
                        "holdings table has embargo_info values but no `now` "
                        "was given; embargo walls are wall-clock-relative and "
                        "need an explicit evaluation date (attach_labels(..., "
                        "now=date(...)))"
                    )
            th = self._tagged_holdings()
            # coverage is date-granular (KBART bounds are dates); record
            # timestamps truncate to the day for the comparison
            ids = records.select(
                F.col(id_col).alias("_rk"),
                # try_cast: malformed record date/volume/issue -> null
                # -> the record simply matches no holdings window
                # (reference skips such records), instead of aborting
                # the whole tagging job under ANSI mode
                F.col(self.date_col).try_cast("date").alias("_rdate"),
                (
                    F.col(self.volume_col).try_cast("int")
                    if self.volume_col in rcols
                    else F.lit(None).cast("int")
                ).alias("_rvol"),
                (
                    F.col(self.issue_col).try_cast("int")
                    if self.issue_col in rcols
                    else F.lit(None).cast("int")
                ).alias("_riss"),
                F.explode(issns_all()).alias("_ident"),
            )
            cond = (
                (F.col("_from").isNull() | (F.col("_rdate") >= F.col("_from")))
                & (F.col("_to").isNull() | (F.col("_rdate") <= F.col("_to")))
                & kbart_volume_issue_ok(
                    F.col("_rvol"),
                    F.col("_riss"),
                    F.col("_fvol"),
                    F.col("_fiss"),
                    F.col("_lvol"),
                    F.col("_liss"),
                )
            )
            if self.now is not None:
                cond = cond & kbart_embargo_ok(
                    F.col("_embargo"), F.col("_rdate"), F.lit(self.now)
                )
            matches = (
                ids.join(broadcast(th), on="_ident")
                .filter(cond)
                .select("_rk", "_flag")
            )

        if self._issn_leaves:
            if self._holdings_leaves:
                # reuse the frame the holdings join already built —
                # one explode of the corpus serves both leaf kinds
                issn_ids = ids.select("_rk", "_ident")
            else:
                issn_ids = records.select(
                    F.col(id_col).alias("_rk"),
                    F.explode(issns_all()).alias("_ident"),
                )
            spark_ = records.sparkSession
            for issn_list, flag in self._issn_leaves.items():
                lst = local_table(
                    spark_, [(v,) for v in issn_list], "_ident string"
                )
                m = (
                    issn_ids.join(broadcast(lst), on="_ident")
                    .select("_rk", self._flag_lit(flag).alias("_flag"))
                )
                matches = m if matches is None else matches.unionByName(m)

        id_type = records.schema[id_col].dataType.simpleString()
        for content_ids, flag in self._content_leaves.items():
            c = local_table(
                spark, [(str(i),) for i in content_ids], "_id string"
            ).select(
                F.col("_id").cast(id_type).alias("_rk"),
                self._flag_lit(flag).alias("_flag"),
            )
            # records ∩ whitelist resolved in the same single aggregate:
            # semi-join happens implicitly when flags join back below
            matches = c if matches is None else matches.unionByName(c)

        bits = self._flag_bits()
        if bits is not None:
            # one long bitmask per record (see _flag_bits); bit_or
            # partial-aggregates map-side like any sum
            flags_per_rec = matches.groupBy("_rk").agg(
                F.bit_or("_flag").alias("_flags")
            )
        else:
            flags_per_rec = matches.groupBy("_rk").agg(
                F.collect_set("_flag").alias("_flags")
            )
        # shuffle_hash on the NARROW flags side: a sort-merge join here
        # would sort the full wide corpus by id — at 30 M rows in one
        # JVM that sort was the measured heap-pressure cliff. A
        # shuffled hash join builds the table on the (id, long) side
        # and streams the wide records through it unsorted.
        records = records.join(
            flags_per_rec.withColumnRenamed("_rk", id_col).hint("shuffle_hash"),
            on=id_col,
            how="left",
        )
        for flag in self._all_flag_names():
            test = (
                F.col("_flags").bitwiseAND(bits[flag]) != 0
                if bits is not None
                else F.array_contains(F.col("_flags"), flag)
            )
            records = records.withColumn(flag, F.coalesce(test, F.lit(False)))
        return records.drop("_flags")

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
        self._content_leaves = {}
        self._issn_leaves = {}
        for tree in config.values():
            self._collect_holdings(tree)
        work = self._attach_flags(records, id_col)
        pairs = [
            F.when(self._compile(tree), F.lit(isil)) for isil, tree in config.items()
        ]
        out = work.withColumn(
            labels_col, F.array_sort(F.array_compact(F.array(*pairs)))
        )
        out = out.drop(
            *[
                c
                for c in out.columns
                if c.startswith(
                    (HOLDINGS_FLAG_PREFIX, CONTENT_FLAG_PREFIX, ISSN_FLAG_PREFIX)
                )
            ]
        )
        if drop_unlabeled:
            out = out.filter(F.size(labels_col) > 0)
        return out


def attach_labels(
    records: DataFrame,
    config: dict[str, dict[str, Any]],
    holdings: DataFrame | None = None,
    now: Any = None,
    **kw: Any,
) -> DataFrame:
    """Functional entry point for the licensing engine (J6)."""
    return LicensingCompiler(holdings=holdings, now=now).attach_labels(
        records, config, **kw
    )


def apply_oa_flag(
    records: DataFrame,
    oa_issns: "DataFrame | Sequence[str] | None" = None,
    free_collections: list[str] | None = None,
    oa_source_ids: list[str] | None = None,
    excluded_source_ids: list[str] | None = None,
    flag_col: str = "x_oa",
) -> DataFrame:
    """span-oa-filter semantics (reference: workflows/ai.py:758-798):
    x_oa = (ISSN in OA-KBART list) OR (collection in free-content list)
    OR (source in -oasid allowlist), unless source in -xsid excludes.

    ``oa_issns`` may be a DataFrame (KBART-scale lists: exploded
    broadcast join on the ISSN, distinct hit set joined back by id) or
    an in-memory sequence (the reference tool loads its ISSN file into
    a process-local set — the same bounded-config shape). A sequence of
    <= ISSN_JOIN_MAX entries compiles to a row-local ``arrays_overlap``
    literal, which keeps the whole operator a pure map: the input plan
    is evaluated ONCE and never re-keyed by id, where the join form
    re-executes the entire upstream plan for the hit set and shuffles
    the full record stream through a join-back (Spark does not reuse
    unexchanged subtrees). Larger sequences fall back to the join —
    ``arrays_overlap`` rebuilds the literal hash set per record (see
    ISSN_JOIN_MAX), so big lists belong on the build side of a hash
    join. Everything else is literal predicates.
    """
    inline_issn: Column | None = None
    if oa_issns is not None and not isinstance(oa_issns, DataFrame):
        lst = sorted({str(s) for s in oa_issns if s is not None})
        if not lst:
            inline_issn = F.lit(False)
        elif len(lst) <= ISSN_JOIN_MAX:
            inline_issn = F.coalesce(
                F.arrays_overlap(issns_all(), F.array(*[F.lit(v) for v in lst])),
                F.lit(False),
            )
        else:
            oa_issns = local_table(
                records.sparkSession, [(s,) for s in lst], "issn string"
            )
    if inline_issn is not None:
        records = records.withColumn("_oa_issn", inline_issn)
    elif oa_issns is not None:
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
