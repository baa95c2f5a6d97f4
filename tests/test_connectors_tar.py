"""Tests: tar(.gz) archive-member scan chain (S10 — the reference's
elsevierjournals tarball path) with zip/tar mixed dispatch + member
gunzip, and the pushdown scan connectors (S5 Solr cursor, S6 ES,
S7 SRU) with mocked endpoints asserting the query lands server-side."""

from __future__ import annotations

import gzip
import io
import json
import tarfile
import time
import zipfile
from urllib.parse import parse_qs, urlparse

from siskin_spark.sources.archives import (
    archive_member_listing,
    extract_members,
    latest_member_selection,
    read_archives,
)
from siskin_spark.sources.connectors import es_search, solr_dump, sru_harvest


def _make_tar(path, members, mtime, gz=False):
    mode = "w:gz" if gz else "w"
    with tarfile.open(path, mode) as tf:
        for name, content in members.items():
            data = content if isinstance(content, bytes) else content.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = mtime
            tf.addfile(info, io.BytesIO(data))


def _make_zip(path, members, date_time):
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in members.items():
            zf.writestr(zipfile.ZipInfo(name, date_time=date_time), content)


def test_tar_member_scan_chain_mixed_formats(tmp_path, spark):
    d = tmp_path / "arch"
    d.mkdir()
    t1 = int(time.mktime((2024, 1, 1, 0, 0, 0, 0, 1, 0)))
    t2 = int(time.mktime((2024, 2, 1, 0, 0, 0, 0, 32, 0)))
    _make_tar(d / "ship1.tar", {"a.xml": "A1", "b.xml": "B1"}, t1)
    _make_tar(d / "ship2.tar.gz", {"b.xml": "B2", "c.xml.gz": gzip.compress(b"C1")}, t2, gz=True)
    _make_zip(d / "ship3.zip", {"d.xml": "D1"}, (2024, 3, 1, 0, 0, 0))

    archives = read_archives(spark, str(d / "*"))
    listing = archive_member_listing(archives)
    assert listing.count() == 5

    sel = latest_member_selection(listing)
    picked = {(r.member, r.archive) for r in sel.collect()}
    assert ("b.xml", "ship2.tar.gz") in picked  # newest shipment wins
    assert ("a.xml", "ship1.tar") in picked
    assert ("d.xml", "ship3.zip") in picked

    got = {
        (r.archive, r.member): bytes(r.content)
        for r in extract_members(archives, sel, decompress_members=True).collect()
    }
    assert got[("ship2.tar.gz", "b.xml")] == b"B2"
    # .gz member transparently decompressed (tar -xOf | zcat)
    assert got[("ship2.tar.gz", "c.xml.gz")] == b"C1"
    assert got[("ship3.zip", "d.xml")] == b"D1"
    assert got[("ship1.tar", "a.xml")] == b"A1"
    assert ("ship1.tar", "b.xml") not in got  # superseded member pruned


# -- pushdown connectors ----------------------------------------------


def test_solr_dump_cursor_pushdown():
    """The q filter must reach the server; cursorMark pages until the
    cursor stops moving (reference: solrdump -q, olc.py:76-99)."""
    seen = []

    def fetch(url):
        seen.append(url)
        qs = parse_qs(urlparse(url).query)
        assert qs["q"] == ["collection_details:(SSG-OLC-MAT OR SSG-OLC-PHY)"]
        cursor = qs["cursorMark"][0]
        if cursor == "*":
            return json.dumps(
                {"response": {"docs": [{"id": "1"}, {"id": "2"}]},
                 "nextCursorMark": "AoE1"}
            )
        return json.dumps({"response": {"docs": [{"id": "3"}]},
                           "nextCursorMark": cursor})

    docs = list(
        solr_dump(
            fetch,
            "http://solr.example/core",
            q="collection_details:(SSG-OLC-MAT OR SSG-OLC-PHY)",
            fl="id,title",
            rows=2,
        )
    )
    assert [d["id"] for d in docs] == ["1", "2", "3"]
    assert len(seen) == 2
    assert "fl=id%2Ctitle" in seen[0]


def test_es_search_one_shot():
    def fetch(url):
        qs = parse_qs(urlparse(url).query)
        assert qs["q"] == ['sources:"LIS Scholarship Archive"']
        assert qs["size"] == ["1000"]
        return json.dumps(
            {"hits": {"hits": [{"_source": {"id": "x"}}, {"id": "raw-hit"}]}}
        )

    docs = es_search(fetch, "http://es.example/api", 'sources:"LIS Scholarship Archive"')
    assert docs == [{"id": "x"}, {"id": "raw-hit"}]


def test_validate_magic(tmp_path, spark):
    """F6 (reference ai.py:144-158): magic-byte validation before any
    file joins a union."""
    import gzip as _gzip

    import pytest

    from siskin_spark.sources.readers import validate_magic

    d = tmp_path / "in"
    d.mkdir()
    (d / "a.gz").write_bytes(_gzip.compress(b"hello"))
    (d / "b.gz").write_bytes(_gzip.compress(b"world"))
    assert validate_magic(spark, str(d / "*.gz"), "gzip") == 2
    (d / "c.gz").write_bytes(b"not gzip at all")
    with pytest.raises(ValueError, match="c.gz"):
        validate_magic(spark, str(d / "*.gz"), "gzip")


def test_webdav_pickup_helpers():
    """S11: share URL shape, basic-auth header, PROPFIND listing."""
    from siskin_spark.sources.harvest import (
        webdav_basic_auth_header,
        webdav_list,
        webdav_share_url,
    )

    url = webdav_share_url("https://owncloud.example.org/", "prod_01.zip")
    assert url == "https://owncloud.example.org/public.php/webdav/prod_01.zip"
    hdr = webdav_basic_auth_header("ShArE", "pw")
    assert hdr["Authorization"].startswith("Basic ")

    multistatus = """<?xml version="1.0"?>
    <d:multistatus xmlns:d="DAV:">
      <d:response><d:href>/public.php/webdav/</d:href></d:response>
      <d:response><d:href>/public.php/webdav/a.zip</d:href></d:response>
      <d:response><d:href>/public.php/webdav/sub/</d:href></d:response>
      <d:response><d:href>/public.php/webdav/b.zip</d:href></d:response>
    </d:multistatus>"""
    got = webdav_list(lambda u: multistatus, "https://x/public.php/webdav/")
    assert got == ["/public.php/webdav/a.zip", "/public.php/webdav/b.zip"]


def test_sru_windowed_fetch():
    """startRecord advances by the window size until numberOfRecords is
    exhausted; the CQL query is pushed on every window."""
    calls = []

    def fetch(url):
        calls.append(parse_qs(urlparse(url).query))
        start = int(calls[-1]["startRecord"][0])
        recs = "".join(
            f"<srw:record><recordData><record>r{start + i}</record></recordData></srw:record>"
            for i in range(2 if start <= 3 else 1)
        )
        return (
            "<searchRetrieveResponse>"
            "<numberOfRecords>5</numberOfRecords>" + recs +
            "</searchRetrieveResponse>"
        )

    pages = list(
        sru_harvest(fetch, "http://sru.example", 'pica.bkl="05.15"', maximum_records=2)
    )
    assert len(pages) == 3
    assert [c["startRecord"] for c in calls] == [["1"], ["3"], ["5"]]
    assert all(c["query"] == ['pica.bkl="05.15"'] for c in calls)
