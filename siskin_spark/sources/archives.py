"""Archive-member scans (SURVEY.md §2.1 S9/S10): zip member listing,
selective member extraction, modeled as DataFrames end to end.

Reference behavior re-expressed (siskin sources/jstor.py:119-374):
`unzip -l` over every mirrored archive -> member listing; pick the
newest archive per member (D3, a window argmax — see
operators/dedup.py); `unzippa -m memberfile` extracts only the
selected members; corrupt/empty archives (<= 22 bytes, the empty-zip
size) are dropped first (F5).

Spark design: archives are read with the ``binaryFile`` source so
listing and extraction distribute across executors — one task per
archive (files > 2 GB should be repartitioned by path first). The
member *selection* step between listing and extraction is ordinary
DataFrame logic, so predicates prune BEFORE any decompression — the
reference's "selective decompression" optimization falls out of the
plan shape.
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMPTY_ZIP_BYTES = 22  # size of a zip with zero members (F5 guard)

_LISTING_SCHEMA = (
    "archive string, member string, size_bytes bigint, "
    "compressed_bytes bigint, date_time string"
)
_EXTRACT_SCHEMA = "archive string, member string, content binary"


def read_archives(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan over archives, with the F5 empty/corrupt guard
    pushed into the scan as a length predicate (prunes before any
    bytes reach Python)."""
    return spark.read.format("binaryFile").load(path_glob).filter(
        F.col("length") > EMPTY_ZIP_BYTES
    )


def zip_member_listing(archives: DataFrame) -> DataFrame:
    """`unzip -l` as a DataFrame: one row per (archive, member).

    mapInPandas over (path, content) — zip central directories parse in
    executors; only listing metadata crosses back (Arrow batches), the
    member bytes are never materialized.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        out.append(
                            (
                                os.path.basename(path),
                                info.filename,
                                info.file_size,
                                info.compress_size,
                                "%04d-%02d-%02d %02d:%02d:%02d" % info.date_time,
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "archive",
                    "member",
                    "size_bytes",
                    "compressed_bytes",
                    "date_time",
                ],
            )

    return archives.select("path", "content").mapInPandas(run, _LISTING_SCHEMA)


def extract_members(archives: DataFrame, selection: DataFrame) -> DataFrame:
    """`unzippa -m memberfile`: extract ONLY the selected members.

    ``selection`` is (archive, member) — typically the D3 argmax of
    :func:`zip_member_listing`. It is joined broadcast to each archive
    task, so executors open an archive once and decompress just the
    members the plan asked for.
    """
    wanted = (
        selection.groupBy("archive").agg(F.collect_set("member").alias("members"))
    )
    joined = archives.select(
        "path", "content", F.element_at(F.split("path", "/"), -1).alias("archive")
    ).join(F.broadcast(wanted), on="archive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for archive, content, members in zip(
                pdf["archive"], pdf["content"], pdf["members"]
            ):
                want = set(members)
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for name in zf.namelist():
                        if name in want:
                            out.append((archive, name, zf.read(name)))
            yield pd.DataFrame(out, columns=["archive", "member", "content"])

    return joined.select("archive", "content", "members").mapInPandas(
        run, _EXTRACT_SCHEMA
    )


def latest_member_selection(listing: DataFrame) -> DataFrame:
    """D3: newest archive per member, by (date_time, archive) tuple
    order — the reference's `tac | sort -u -k2,2` over a
    shipment-date-sorted listing."""
    from siskin_spark.operators.dedup import snapshot_latest

    return snapshot_latest(listing, ["member"], ["date_time", "archive"]).select(
        "archive", "member"
    )
