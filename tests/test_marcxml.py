"""MARCXML / MABxml reader goldens (reference fixtures mab*.xml read
in place from /root/reference/fixtures — test INPUT only) + roundtrip
through the binary MARC model + the F3 predicate over parsed records."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from siskin_spark.operators.sinks import marc_record_bytes, parse_marc_bytes
from siskin_spark.sources.marcxml import (
    marc_contains,
    marc_values,
    marcxml_records,
    read_marcxml,
)

FIXDIR = "/root/reference/fixtures"

SLIM = """<?xml version="1.0" encoding="UTF-8"?>
<collection xmlns="http://www.loc.gov/MARC21/slim">
  <record>
    <leader>00000nam a2200000 a 4500</leader>
    <controlfield tag="001">finc-15-rec1</controlfield>
    <datafield tag="084" ind1=" " ind2=" ">
      <subfield code="a">9,2</subfield>
      <subfield code="2">ssgn</subfield>
    </datafield>
    <datafield tag="245" ind1="1" ind2="0">
      <subfield code="a">Vals for pianoforte</subfield>
    </datafield>
    <datafield tag="912" ind1=" " ind2=" ">
      <subfield code="a">digit</subfield>
    </datafield>
  </record>
  <record>
    <controlfield tag="001">finc-15-rec2</controlfield>
    <datafield tag="245" ind1="0" ind2="0">
      <subfield code="a">Other title</subfield>
    </datafield>
  </record>
</collection>
"""


def test_marcxml_slim_parse():
    recs = list(marcxml_records(SLIM))
    assert len(recs) == 2
    r1 = recs[0]
    assert ("001", "", [("", "finc-15-rec1")]) in r1
    f245 = [f for f in r1 if f[0] == "245"][0]
    assert f245[1] == "10"
    assert f245[2] == [("a", "Vals for pianoforte")]


@pytest.mark.skipif(not os.path.isdir(FIXDIR), reason="reference fixtures absent")
def test_mabxml_fixture_golden():
    with open(os.path.join(FIXDIR, "mab0.xml"), "rb") as fh:
        recs = list(marcxml_records(fh.read()))
    assert len(recs) == 1
    fields = recs[0]
    by_tag = {}
    for tag, ind, subs in fields:
        by_tag.setdefault(tag, []).append((ind, subs))
    assert by_tag["001"] == [(" ", [("", "10598985")])]
    assert by_tag["335"] == [(" ", [("", "FIAF 2007 Tokyo")])]
    # repeated field keeps both instances with their indicators
    assert len(by_tag["425"]) == 2
    assert {ind for ind, _ in by_tag["425"]} == {" ", "a"}


def test_marcxml_roundtrip_binary_marc():
    """MARCXML -> struct model -> ISO 2709 bytes -> parse: identical
    fields (the yaz-marcdump -i marc -o marcxml path, run in reverse)."""
    for fields in marcxml_records(SLIM):
        blob = marc_record_bytes(fields)
        assert parse_marc_bytes(blob) == fields


def test_read_marcxml_f3_predicate(spark, tmp_path):
    p = tmp_path / "recs.xml"
    p.write_text(SLIM, encoding="utf-8")
    df = read_marcxml(spark, str(p))
    assert df.count() == 2
    # F3 (reference b3kat.py:151-206): 084.2 == ssgn AND 084.a has
    # "9,2" AND 912.a has "digit"
    hit = df.filter(
        marc_contains("marc_fields", "084", "2", "ssgn")
        & marc_contains("marc_fields", "084", "a", "9,2")
        & marc_contains("marc_fields", "912", "a", "digit")
    )
    ids = [
        r[0]
        for r in hit.select(
            F.element_at(marc_values("marc_fields", "001"), 1)
        ).collect()
    ]
    assert ids == ["finc-15-rec1"]


def test_marcxml_writer_roundtrip():
    """struct model -> marcxml_bytes -> marcxml_records: identical
    fields (the yaz-marcdump -o marcxml direction)."""
    from siskin_spark.sources.marcxml import marcxml_bytes

    for fields in marcxml_records(SLIM):
        xml = marcxml_bytes(fields)
        back = list(marcxml_records(xml))
        assert back == [fields]


def test_marcxml_sink_roundtrip(spark, tmp_path):
    """read_marcxml -> marcxml_sink column -> re-parse: stable through
    the distributed path (Arrow batches), not just the scalar helper."""
    from siskin_spark.sources.marcxml import marcxml_sink

    p = tmp_path / "recs.xml"
    p.write_text(SLIM, encoding="utf-8")
    df = read_marcxml(spark, str(p))
    out = marcxml_sink(df).select("record_no", "marcxml").collect()
    assert len(out) == 2
    originals = list(marcxml_records(SLIM))
    for row in out:
        assert list(marcxml_records(row["marcxml"])) == [
            originals[row["record_no"]]
        ]
