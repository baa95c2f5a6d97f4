"""Join / lookup operators (SURVEY.md §2.4, J1-J7) and filter joins
(§2.3 F1/F2).

The reference implements every join as either an in-memory dict lookup
(broadcast-hash by hand) or a sorted-file merge; here they are real
Spark joins so Catalyst picks broadcast vs shuffle-hash vs sort-merge
from statistics, with explicit ``broadcast()`` hints where the small
side is known-small (config/dimension tables — the reference's own
observation that "span-tag is fast because collection lists are in
memory", sources/amsl.py:900-922, is exactly the broadcast hint).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from siskin_spark.session import local_table


def blacklist_filter(
    df: DataFrame, blacklist: DataFrame, on: str, bl_col: str | None = None
) -> DataFrame:
    """F1: drop rows whose ``on`` value appears in the blacklist
    (reference: grep -vf blacklist, sources/doaj.py:128-137).
    Broadcast anti join — the blacklist is a small config table."""
    bl = blacklist.select(F.col(bl_col or on).alias(on)).distinct()
    return df.join(broadcast(bl), on=on, how="left_anti")


def whitelist_filter(
    df: DataFrame, whitelist: DataFrame, on: str, wl_col: str | None = None
) -> DataFrame:
    """F2: keep rows whose ``on`` value appears in the whitelist
    (reference: grep -Ff whitelist, sources/doaj.py:190-217).
    Broadcast left-semi join."""
    wl = whitelist.select(F.col(wl_col or on).alias(on)).distinct()
    return df.join(broadcast(wl), on=on, how="left_semi")


def enrich_lookup(
    df: DataFrame,
    dim: DataFrame,
    on: str,
    dim_key: str | None = None,
    how: str = "left",
) -> DataFrame:
    """J2-style broadcast enrichment join against a small dimension
    (reference: DOI-prefix -> publisher map, sources/crossref.py:578-653).
    Misses stay null; the reference's live-API fallback is hoisted to the
    driver (collect misses, resolve, re-join) — never HTTP in executors."""
    d = dim if dim_key is None else dim.withColumnRenamed(dim_key, on)
    return df.join(broadcast(d), on=on, how=how)


def update_labels(
    records: DataFrame,
    changes: DataFrame,
    id_col: str = "finc_id",
    labels_col: str = "x_labels",
    new_labels_col: str = "labels",
) -> DataFrame:
    """M10/J3: replace the label set by id from a narrow change table
    (reference: span-update-labels, workflows/ai.py:310-342). Left join +
    coalesce keeps unchanged records' labels."""
    ch = changes.select(
        F.col(id_col), F.col(new_labels_col).alias("_new_labels")
    )
    out = records.join(ch, on=id_col, how="left")
    return out.withColumn(
        labels_col, F.coalesce(F.col("_new_labels"), F.col(labels_col))
    ).drop("_new_labels")


def anti_report(left: DataFrame, right: DataFrame, on: str) -> DataFrame:
    """J4: rows of ``left`` with no match in ``right`` (diff report;
    reference: sources/crossref.py:333-416)."""
    return left.join(right.select(on).distinct(), on=on, how="left_anti")


def membership_matrix(
    probe: DataFrame,
    key: str,
    sources: dict[str, DataFrame],
    not_found: str = "NOT_FOUND",
) -> DataFrame:
    """J5: for each probe key, which of N sources contain it
    (reference: workflows/ai.py:571-645 — ISSN coverage report
    `crossref|doaj|...` or NOT_FOUND).

    One union of tagged distinct key lists + one aggregation — not N
    sequential joins; at N sources x large probe, this is a single
    shuffle instead of N.
    """
    tagged = None
    for name, src in sources.items():
        t = (
            src.select(F.col(key))
            .filter(F.col(key).isNotNull())
            .distinct()
            .withColumn("_tag", F.lit(name))
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    hits = tagged.groupBy(key).agg(
        F.array_sort(F.collect_set("_tag")).alias("_tags")
    )
    out = probe.select(key).distinct().join(hits, on=key, how="left")
    return out.select(
        key,
        F.coalesce(
            F.array_join(F.col("_tags"), "|"), F.lit(not_found)
        ).alias("found_in"),
    )


def coverage_interval_join(
    records: DataFrame,
    holdings: DataFrame,
    record_key: str,
    record_keys_col: str | Column,
    date_col: str,
    h_key: str = "issn",
    h_from: str = "date_first_issue_online",
    h_to: str = "date_last_issue_online",
    extra_cond: Column | None = None,
) -> DataFrame:
    """KBART-style coverage join (core of J6 holdings evaluation,
    reference: span-tag holdings predicate; KBART columns
    sources/jstor.py:546-580).

    A record matches if any of its identifiers (``record_keys_col``, an
    array column — e.g. union of rft_issn+rft_eissn) equals a holdings
    row's key AND the record date falls inside [h_from, h_to] (null
    bound = open). Returns ``records`` + boolean ``covered``.

    Plan: explode identifiers -> equi-join holdings on the identifier
    (hashable; the non-equi date bounds ride along as join residuals) ->
    aggregate back per record id. The equi-join keeps this a hash join,
    not a cartesian range join.
    """
    ids = records.select(
        F.col(record_key).alias("_rk"),
        F.col(date_col).alias("_rdate"),
        F.explode(
            record_keys_col if isinstance(record_keys_col, Column) else F.col(record_keys_col)
        ).alias("_ident"),
    )
    h = holdings.select(
        F.col(h_key).alias("_ident"),
        F.col(h_from).alias("_from"),
        F.col(h_to).alias("_to"),
        *([extra_cond.alias("_extra")] if extra_cond is not None else []),
    )
    cond = (F.col("_from").isNull() | (F.col("_rdate") >= F.col("_from"))) & (
        F.col("_to").isNull() | (F.col("_rdate") <= F.col("_to"))
    )
    matched = (
        ids.join(broadcast(h), on="_ident", how="inner")
        .filter(cond if extra_cond is None else (cond & F.col("_extra")))
        .select("_rk")
        .distinct()
        .withColumn("covered", F.lit(True))
    )
    return (
        records.join(
            matched.withColumnRenamed("_rk", record_key), on=record_key, how="left"
        )
        .withColumn("covered", F.coalesce(F.col("covered"), F.lit(False)))
    )


def pairwise_overlap(
    sets: dict[str, DataFrame], key: str
) -> DataFrame:
    """A2: |A|, |B|, |A∩B| for every source pair over distinct keys
    (reference: workflows/ai.py:432-486).

    Single plan: union tagged distinct lists, self-join on key with
    tag< tag, count per pair; sizes from one groupBy. Scales as one
    shuffle over the union instead of N^2 separate intersects.
    """
    tagged = None
    for name, src in sets.items():
        t = (
            src.select(F.col(key))
            .filter(F.col(key).isNotNull())
            .distinct()
            .withColumn("_tag", F.lit(name))
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    sizes = tagged.groupBy("_tag").agg(F.count("*").alias("_n"))
    a = tagged.select(F.col(key), F.col("_tag").alias("tag_a"))
    b = tagged.select(F.col(key), F.col("_tag").alias("tag_b"))
    inter = (
        a.join(b, on=key)
        .filter(F.col("tag_a") < F.col("tag_b"))
        .groupBy("tag_a", "tag_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(broadcast(sizes.withColumnRenamed("_tag", "tag_a")), on="tag_a")
        .withColumnRenamed("_n", "n_a")
        .join(broadcast(sizes.withColumnRenamed("_tag", "tag_b")), on="tag_b")
        .withColumnRenamed("_n", "n_b")
    )
    return out.select("tag_a", "tag_b", "n_a", "n_b", "n_common")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (no reference counterpart; standard time-series primitive the
    engine adds, cf. DuckDB/Pandas ASOF).

    Plan: union both sides tagged, one window per key ordered by
    (ts, side, right_ts) with ``last(..., ignorenulls)`` over preceding
    rows. ONE shuffle on the key, no range cross-product — unlike the
    naive theta-join, this survives 100 TB (cost is a sort within each
    key partition, which Spark spills). Right rows at equal timestamps
    resolve to the last by ``right_ts`` tuple order; right values
    travel as one struct so all attached columns come from the SAME
    right row. Left columns are preserved; attached columns are named
    ``prefix + right_col`` (NULL when no prior right row exists).
    """
    from pyspark.sql import Window

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rv"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_rv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col("_m").getField(c))
    return out.drop("_ts", "_side", "_rv", "_m")


def enrich_lookup_with_resolver(
    df: DataFrame,
    dim: DataFrame,
    on: str,
    resolver,
    max_misses: int = 100_000,
) -> DataFrame:
    """J2 memoized-enrichment pattern (reference sources/
    crossref.py:578-653: DOI-prefix -> publisher, cache misses resolved
    by a live API call): join misses are collected DRIVER-side, handed
    to ``resolver(keys) -> [(key, value...), ...]``, and the resolved
    rows are unioned into the dimension for one final broadcast join.
    HTTP never runs in executors — per-record calls from tasks is the
    one pattern the reference explicitly engineered around (URL caches,
    utils.py:262-371) and it gets catastrophically worse at 1000
    executors.

    ``max_misses`` guards the driver collect; at scale a miss list
    larger than that should be written out and resolved by a batch job
    instead.
    """
    misses = (
        df.select(on).distinct().join(broadcast(dim.select(on)), on=on, how="left_anti")
    )
    keys = [r[0] for r in misses.limit(max_misses + 1).collect()]
    if len(keys) > max_misses:
        raise RuntimeError(
            f"more than {max_misses} unresolved keys; resolve via a batch job"
        )
    if keys:
        resolved = local_table(df.sparkSession, resolver(keys), dim.schema)
        dim = dim.unionByName(resolved)
    return df.join(broadcast(dim), on=on, how="left")
