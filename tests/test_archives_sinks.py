"""Tests: zip member scan chain (S9: listing -> D3 selection ->
selective extraction), MARC binary roundtrip (K5), RDF/Turtle sink
(K4), Excel gate (K3), failure-budget converter (M5), miss-resolving
enrichment (J2)."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from siskin_spark.operators.joins import enrich_lookup_with_resolver
from siskin_spark.operators.sinks import (
    marc_record_bytes,
    marc_sink,
    parse_marc_bytes,
    triples_frame,
    turtle_lines,
)
from siskin_spark.operators.transforms import convert_with_budget
from siskin_spark.sources.archives import (
    extract_members,
    latest_member_selection,
    read_archives,
    zip_member_listing,
)


def _make_zip(path, members, date_time=(2024, 1, 15, 12, 0, 0)):
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in members.items():
            info = zipfile.ZipInfo(name, date_time=date_time)
            zf.writestr(info, content)


def test_zip_member_scan_chain(tmp_path, spark):
    d = tmp_path / "arch"
    d.mkdir()
    # shipment 1: a, b; shipment 2 (newer): b (updated), c
    _make_zip(d / "ship1.zip", {"a.xml": "A1", "b.xml": "B1"}, (2024, 1, 1, 0, 0, 0))
    _make_zip(d / "ship2.zip", {"b.xml": "B2", "c.xml": "C1"}, (2024, 2, 1, 0, 0, 0))
    (d / "empty.zip").write_bytes(b"PK\x05\x06" + b"\x00" * 18)  # 22-byte empty zip

    archives = read_archives(spark, str(d / "*.zip"))
    assert archives.count() == 2  # F5 guard drops the empty one

    listing = zip_member_listing(archives)
    assert listing.count() == 4

    sel = latest_member_selection(listing)
    picked = {(r.member, r.archive) for r in sel.collect()}
    assert picked == {
        ("a.xml", "ship1.zip"),
        ("b.xml", "ship2.zip"),  # newest shipment wins
        ("c.xml", "ship2.zip"),
    }

    extracted = extract_members(archives, sel)
    got = {(r.member, bytes(r.content).decode()) for r in extracted.collect()}
    assert got == {("a.xml", "A1"), ("b.xml", "B2"), ("c.xml", "C1")}


def test_marc_roundtrip_bytes():
    fields = [
        ("001", "", [("", "rec-42")]),
        ("245", "10", [("a", "Ein Titel"), ("b", "mit Umlauten äöü")]),
        ("084", "  ", [("a", "9,2"), ("2", "ssgn")]),
    ]
    raw = marc_record_bytes(fields)
    assert raw[:5].decode().isdigit() and raw.endswith(b"\x1d")
    assert int(raw[:5]) == len(raw)  # leader length matches
    assert parse_marc_bytes(raw) == fields


def test_marc_sink_distributed(spark):
    sub_t = "array<struct<code:string,val:string>>"
    field_t = f"struct<tag:string,indicators:string,subfields:{sub_t}>"
    df = spark.createDataFrame(
        [(1, [("245", "10", [("a", "T1")])]), (2, [("245", "10", [("a", "T2")])])],
        f"id int, marc_fields array<{field_t}>",
    )
    out = marc_sink(df).collect()
    titles = {parse_marc_bytes(bytes(r.marc))[0][2][0][1] for r in out}
    assert titles == {"T1", "T2"}


def test_turtle_sink(spark):
    df = spark.createDataFrame(
        [("urn:c:1", "Coll A", '19"99'), ("urn:c:2", None, "2000")],
        "id string, name string, issn string",
    )
    t = triples_frame(df, "id", {"name": "dc:title", "issn": "bibo:issn"})
    assert t.count() == 3  # null object dropped
    lines = {r.line for r in turtle_lines(t).collect()}
    assert '<urn:c:1> <dc:title> "Coll A" .' in lines
    assert '<urn:c:1> <bibo:issn> "19\\"99" .' in lines  # escaped quote


def test_excel_sink_gated(tmp_path, spark):
    from siskin_spark.operators.sinks import excel_sink

    df = spark.range(3).select(F.col("id"))
    try:
        excel_sink({"s1": df}, str(tmp_path / "r.xlsx"))
    except (ImportError, ModuleNotFoundError):
        pytest.skip("no xlsx engine in container (expected)")
    assert os.path.getsize(tmp_path / "r.xlsx") > 0


def test_convert_with_budget(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")

    def convert(row):
        if row["id"] % 4 == 0:
            raise ValueError("bad record")
        return {"id2": row["id"] * 2}

    schema = T.StructType([T.StructField("id2", T.IntegerType())])
    out, check = convert_with_budget(df, convert, schema, max_failures=5)
    assert out.count() == 7  # 0,4,8 fail
    assert check() == 3

    out2, check2 = convert_with_budget(df, convert, schema, max_failures=2)
    out2.count()
    with pytest.raises(RuntimeError, match="exceed budget"):
        check2()


def test_enrich_lookup_with_resolver(spark):
    df = spark.createDataFrame(
        [("10.1000", 1), ("10.1001", 2), ("10.9999", 3), ("10.9999", 4)],
        "prefix string, n int",
    )
    dim = spark.createDataFrame([("10.1000", "Alpha")], "prefix string, publisher string")
    calls = []

    def resolver(keys):
        calls.append(sorted(keys))
        return [(k, f"resolved-{k}") for k in keys]

    out = enrich_lookup_with_resolver(df, dim, "prefix", resolver)
    got = {(r.prefix, r.publisher) for r in out.collect()}
    assert got == {
        ("10.1000", "Alpha"),
        ("10.1001", "resolved-10.1001"),
        ("10.9999", "resolved-10.9999"),
    }
    assert calls == [["10.1001", "10.9999"]]  # one driver-side call, misses only


def test_is_ndjson_wire_roundtrip_zstd(tmp_path, spark):
    """K2 wire format: write_is_ndjson emits zstd ndjson by default
    (the reference pipes through `zstd -T0 -c`, ijoc.py:94-97) with
    dotted wire keys, and read_is_ndjson maps it back to canonical
    columns; gzip stays available for legacy consumers."""
    import glob

    from siskin_spark.schema import read_is_ndjson, write_is_ndjson

    df = spark.createDataFrame(
        [("ai-34-x", "34", "A Title"), ("ai-34-y", "34", "B Title")],
        "finc_id string, finc_source_id string, rft_atitle string",
    )
    dst = str(tmp_path / "wire")
    write_is_ndjson(df, dst)
    parts = glob.glob(os.path.join(dst, "part-*"))
    assert parts and all(p.endswith(".zst") for p in parts)
    back = read_is_ndjson(spark, dst)
    got = {r["finc_id"]: r for r in back.collect()}
    assert set(got) == {"ai-34-x", "ai-34-y"}
    assert got["ai-34-x"]["rft_atitle"] == "A Title"
    # wire keys on disk are the dotted reference names — inspect the
    # raw line through Spark's own zstd codec (no zstd CLI dependency)
    import json as _json

    raw = spark.read.text(parts).collect()
    assert raw
    rec = _json.loads(raw[0]["value"])
    assert "finc.id" in rec and "finc.source_id" in rec

    gz = str(tmp_path / "wire_gz")
    write_is_ndjson(df, gz, compression="gzip")
    gz_parts = glob.glob(os.path.join(gz, "part-*"))
    assert gz_parts and all(p.endswith(".gz") for p in gz_parts)
    assert read_is_ndjson(spark, gz).count() == 2


def test_is_ndjson_unicode_line_separators_roundtrip(tmp_path, spark):
    """A title containing raw U+2028/U+2029/U+0085 must survive the
    zstd wire roundtrip: Jackson emits them UNESCAPED inside JSON
    strings (it only escapes < 0x20), and str.splitlines() would cut
    the record in two — the reader must split on '\\n' only."""
    from siskin_spark.schema import read_is_ndjson, write_is_ndjson

    title = "line one\u2028line two\u2029line three\u0085end"
    df = spark.createDataFrame(
        [("ai-34-u", "34", title)],
        "finc_id string, finc_source_id string, rft_atitle string",
    )
    dst = str(tmp_path / "wire_u")
    write_is_ndjson(df, dst)
    back = read_is_ndjson(spark, dst).collect()
    assert len(back) == 1
    assert back[0]["rft_atitle"] == title


def test_is_ndjson_mixed_zst_and_legacy_parts(tmp_path, spark):
    """A wire directory holding BOTH zst parts and legacy gzip parts
    (e.g. appended by an older writer) reads the union — silently
    returning only the zst side would be data loss."""
    import glob
    import shutil

    from siskin_spark.schema import read_is_ndjson, write_is_ndjson

    zdir = str(tmp_path / "wire_z")
    gdir = str(tmp_path / "wire_g")
    write_is_ndjson(
        spark.createDataFrame(
            [("ai-34-z", "34", "Zst Row")],
            "finc_id string, finc_source_id string, rft_atitle string",
        ),
        zdir,
    )
    write_is_ndjson(
        spark.createDataFrame(
            [("ai-34-g", "34", "Legacy Row")],
            "finc_id string, finc_source_id string, rft_atitle string",
        ),
        gdir,
        compression="gzip",
    )
    for p in glob.glob(os.path.join(gdir, "part-*")):
        shutil.copy(p, zdir)
    got = {r["finc_id"] for r in read_is_ndjson(spark, zdir).collect()}
    assert got == {"ai-34-z", "ai-34-g"}


def test_is_ndjson_single_file_and_glob(tmp_path, spark):
    """A direct path to ONE zstd ndjson file — including the
    reference's single-file artifact naming, date-*.ndj.zst — and a
    glob over several must take the executor-side zst path; falling
    through to spark.read.json over raw zstd bytes yields corrupt/null
    rows. A directory mixing .ndj.zst alongside .json.zst parts must
    route BOTH to the zst reader, not misread one as legacy JSON."""
    import glob
    import shutil

    from siskin_spark.schema import read_is_ndjson, write_is_ndjson

    src = str(tmp_path / "wire_src")
    write_is_ndjson(
        spark.createDataFrame(
            [("ai-34-f1", "34", "File One"), ("ai-34-f2", "34", "File Two")],
            "finc_id string, finc_source_id string, rft_atitle string",
        ).coalesce(1),
        src,
    )
    (part,) = glob.glob(os.path.join(src, "part-*.json.zst"))
    single = str(tmp_path / "date-2026-08-14.ndj.zst")
    shutil.copy(part, single)
    back = read_is_ndjson(spark, single).collect()
    assert {r["finc_id"] for r in back} == {"ai-34-f1", "ai-34-f2"}
    assert all(r["rft_atitle"] is not None for r in back)
    # glob over files takes the same path
    shutil.copy(part, str(tmp_path / "date-2026-08-15.ndj.zst"))
    assert read_is_ndjson(spark, str(tmp_path / "date-*.ndj.zst")).count() == 4
    # mixed-suffix directory: the .ndj.zst part must be decompressed,
    # not unioned in as a legacy plain-JSON part
    shutil.copy(part, os.path.join(src, "extra-00000.ndj.zst"))
    assert read_is_ndjson(spark, src).count() == 4


def test_is_ndjson_orphan_tmp_files_invisible(tmp_path, spark):
    """A failed/killed task attempt's temp file must be invisible to
    the reader: the writer names tmps with a dot-prefixed basename and
    sweeps leftovers before _SUCCESS, and the reader additionally
    skips *._tmp-* names from the pre-dot-prefix writer — either kind
    misread as a legacy plain-JSON part would inject corrupt rows
    into a _SUCCESS-marked artifact."""
    import glob

    from siskin_spark.schema import read_is_ndjson, write_is_ndjson

    dst = str(tmp_path / "wire_orphan")
    write_is_ndjson(
        spark.createDataFrame(
            [("ai-34-ok", "34", "Good Row")],
            "finc_id string, finc_source_id string, rft_atitle string",
        ),
        dst,
    )
    # no tmp leftovers after a successful commit
    assert not [n for n in os.listdir(dst) if "._tmp-" in n]
    # plant both orphan generations: current dot-prefixed naming and
    # the legacy bare "part-...json.zst._tmp-N" naming
    part = sorted(glob.glob(os.path.join(dst, "part-*.json.zst")))[0]
    raw = open(part, "rb").read()  # partial zstd frame = corrupt bytes
    base = os.path.basename(part)
    open(os.path.join(dst, f".{base}._tmp-7"), "wb").write(raw[: len(raw) // 2])
    open(os.path.join(dst, f"{base}._tmp-9"), "wb").write(raw[: len(raw) // 2])
    back = read_is_ndjson(spark, dst).collect()
    assert len(back) == 1 and back[0]["finc_id"] == "ai-34-ok"

    # the orphan filter must also hold on the NO-zst-parts path: a
    # legacy (gzip-only) directory with a stray zst tmp orphan reads
    # only the committed parts, and a directory holding ONLY orphans
    # reads as empty — neither may fall back to json(<dir>)
    gz = str(tmp_path / "wire_gz_orphan")
    write_is_ndjson(
        spark.createDataFrame(
            [("ai-34-gz", "34", "Gz Row")],
            "finc_id string, finc_source_id string, rft_atitle string",
        ),
        gz,
        compression="gzip",
    )
    open(os.path.join(gz, f"{base}._tmp-3"), "wb").write(raw[: len(raw) // 2])
    back = read_is_ndjson(spark, gz).collect()
    assert len(back) == 1 and back[0]["finc_id"] == "ai-34-gz"
    only = str(tmp_path / "wire_only_orphans")
    os.makedirs(only)
    open(os.path.join(only, f"{base}._tmp-5"), "wb").write(raw[: len(raw) // 2])
    assert read_is_ndjson(spark, only).count() == 0
