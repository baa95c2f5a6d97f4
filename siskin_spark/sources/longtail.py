"""Long-tail source conversions (SURVEY §2.1 S2 family): the thin
wrapper tasks the reference keeps per source — dblp, zdb — re-expressed
as DataFrame operators over already-ingested frames. The download halves
of these tasks are plain HTTP pickups (sources/harvest.py covers them);
what is worth porting is each task's transform.

All pure DataFrame ops — no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dblp_doi_list(records: DataFrame, ee_col: str = "ee") -> DataFrame:
    """DBLPDOIList (reference sources/dblp.py:92-117): from the dblp
    record dump's electronic-edition URLs, the sorted distinct DOI
    list. The reference's shell pipeline is
    ``grep doi.org | sed 's@<ee>https://doi.org/@@' | grep ^10 | sort``;
    here: filter -> strip prefix -> prefix guard -> distinct -> orderBy
    (one shuffle on the narrow DOI column).

    ``ee_col`` may be a scalar URL column or an array of URLs (dblp
    records carry multiple <ee> entries); arrays are exploded first.
    """
    if records.schema[ee_col].dataType.typeName() == "array":
        df = records.select(F.explode(F.col(ee_col)).alias("_ee"))
    else:
        df = records.select(F.col(ee_col).alias("_ee"))
    col = F.col("_ee")
    doi = F.replace(col, F.lit("https://doi.org/"), F.lit(""))
    return (
        df.filter(col.contains("doi.org"))
        .select(doi.alias("doi"))
        .filter(F.col("doi").startswith("10"))
        .distinct()
        .orderBy("doi")
    )


def zdb_short_title_map(descriptions: DataFrame) -> DataFrame:
    """ZDBShortTitleMap (reference sources/zdb.py:86-150, refs #10562):
    from ZDB title descriptions (``short_titles`` array, ``titles``
    array), the shortTitle -> title lookup table, with a lowercased
    alias key per entry (the reference emits both ``sm[s]`` and
    ``sm[strings.ToLower(s)]``).

    Documented divergence: the reference builds a Go map in record
    iteration order, so a short title appearing in several records
    keeps an arbitrary last-seen title; here the winner is the
    lexicographically smallest title (``min_by``) — deterministic
    across engines, partitionings, and runs.
    """
    pairs = (
        descriptions.filter(F.size("short_titles") > 0)
        .select(
            F.explode("short_titles").alias("short_title"),
            F.col("titles"),
        )
        .select("short_title", F.explode("titles").alias("title"))
    )
    keyed = pairs.unionByName(
        pairs.select(F.lower(F.col("short_title")).alias("short_title"), "title")
    )
    return (
        keyed.groupBy("short_title")
        .agg(F.min("title").alias("title"))
        .orderBy("short_title")
    )


def kalliope_append_collection(
    records: DataFrame,
    tcid: str = "sid-140-col-nachlaesseslub",
    col: str = "mega_collection",
) -> DataFrame:
    """KalliopeDirectDownload's transform half (reference
    sources/kalliope.py:84-110): append the technical collection id to
    every record's ``mega_collection`` array (the reference's
    ``jq '.mega_collection += [...]'`` over the untarred dump — AMSL
    routes the source by that tcid). The tar/gunzip plumbing is
    sources/archives.py; this is the per-record half, one codegen'd
    array concat. Null arrays become a one-element array, matching jq's
    ``null + ["x"] == ["x"]``.

    core (sources/core.py:76-110) and ia (sources/ia.py:24-44) have NO
    transform half — they are pure downloads (S2, sources/harvest.py)
    with no per-record logic to port.
    """
    appended = F.when(
        F.col(col).isNull(), F.array(F.lit(tcid))
    ).otherwise(F.concat(F.col(col), F.array(F.lit(tcid))))
    return records.withColumn(col, appended)
