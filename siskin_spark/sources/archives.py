"""Archive-member scans (SURVEY.md §2.1 S9/S10): zip AND tar(.gz)
member listing, selective member extraction, modeled as DataFrames end
to end.

Reference behavior re-expressed (siskin sources/jstor.py:119-374 for
zip; sources/elsevierjournals.py:66-161 and base.py:153-170 for the
``tar -xOf | zcat`` tarball stream): list members -> pick the newest
archive per member (D3, a window argmax — see operators/dedup.py) ->
extract only the selected members (`unzippa -m memberfile`); corrupt/
empty archives (<= 22 bytes, the empty-zip size) are dropped first
(F5). Format dispatch is by magic bytes (PK zip signature vs tar),
never by filename.

Spark design: archives are read with the ``binaryFile`` source so
listing and extraction distribute across executors — one task per
archive (files > 2 GB should be repartitioned by path first). The
member *selection* step between listing and extraction is ordinary
DataFrame logic, so predicates prune BEFORE any decompression — the
reference's "selective decompression" optimization falls out of the
plan shape.
"""

from __future__ import annotations

import datetime
import gzip
import io
import os
import tarfile
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


def _is_zip(content: bytes) -> bool:
    return bytes(content[:2]) == b"PK"


def _list_one(path: str, content: bytes) -> list[tuple]:
    name = os.path.basename(path)
    out = []
    if _is_zip(content):
        with zipfile.ZipFile(io.BytesIO(content)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                out.append(
                    (
                        name,
                        info.filename,
                        info.file_size,
                        info.compress_size,
                        "%04d-%02d-%02d %02d:%02d:%02d" % info.date_time,
                    )
                )
    else:
        # r:* sniffs gz/bz2/xz/plain — the reference's tarball path
        # (elsevierjournals.py:66-161) ships .tar and .tar.gz mixed
        with tarfile.open(fileobj=io.BytesIO(content), mode="r:*") as tf:
            for m in tf.getmembers():
                if not m.isfile():
                    continue
                ts = datetime.datetime.fromtimestamp(
                    m.mtime, tz=datetime.timezone.utc
                ).strftime("%Y-%m-%d %H:%M:%S")
                out.append((name, m.name, m.size, m.size, ts))
    return out


def archive_member_listing(archives: DataFrame) -> DataFrame:
    """`unzip -l` / `tar -tvf` as a DataFrame: one row per
    (archive, member), zip and tar(.gz) dispatched by magic bytes.

    mapInPandas over (path, content) — central directories / tar
    headers parse in executors; only listing metadata crosses back
    (Arrow batches), the member bytes are never materialized.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                out.extend(_list_one(path, bytes(content)))
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


# original zip-only entry point; the generalized listing subsumes it
zip_member_listing = archive_member_listing


def extract_members(
    archives: DataFrame, selection: DataFrame, decompress_members: bool = False
) -> DataFrame:
    """`unzippa -m memberfile`: extract ONLY the selected members, from
    zip or tar(.gz) archives (magic-byte dispatch).

    ``selection`` is (archive, member) — typically the D3 argmax of
    :func:`archive_member_listing`. It is joined broadcast to each
    archive task, so executors open an archive once and decompress just
    the members the plan asked for. ``decompress_members=True`` gunzips
    ``.gz`` members transparently — the reference's ``tar -xOf | zcat``
    (base.py:153-170)."""
    wanted = (
        selection.groupBy("archive").agg(F.collect_set("member").alias("members"))
    )
    joined = archives.select(
        "path", "content", F.element_at(F.split("path", "/"), -1).alias("archive")
    ).join(F.broadcast(wanted), on="archive")

    def _maybe_gunzip(name: str, blob: bytes) -> bytes:
        if decompress_members and name.endswith(".gz"):
            return gzip.decompress(blob)
        return blob

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for archive, content, members in zip(
                pdf["archive"], pdf["content"], pdf["members"]
            ):
                want = set(members)
                content = bytes(content)
                if _is_zip(content):
                    with zipfile.ZipFile(io.BytesIO(content)) as zf:
                        for name in zf.namelist():
                            if name in want:
                                out.append(
                                    (archive, name, _maybe_gunzip(name, zf.read(name)))
                                )
                else:
                    with tarfile.open(
                        fileobj=io.BytesIO(content), mode="r:*"
                    ) as tf:
                        for m in tf.getmembers():
                            if m.isfile() and m.name in want:
                                blob = tf.extractfile(m).read()
                                out.append(
                                    (archive, m.name, _maybe_gunzip(m.name, blob))
                                )
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
