"""MARCXML / MABxml readers (SURVEY.md S7/K5: the reference converts
marc<->marcxml with yaz-marcdump, sources/b3kat.py:210-228, and parses
record XML via pymarc/xmltodict, conversions.py:94-210; its MABxml
samples live in fixtures/mab*.xml).

Both dialects parse into the SAME struct model the binary MARC path
uses (operators/sinks.py: marc_record_bytes / parse_marc_bytes):

    [(tag, indicators, [(code, val), ...]), ...]

so MARCXML-sourced records flow through the F3 field predicates, the
MARC sink, and every downstream operator unchanged.

Scale shape: one task per XML file (``binaryFile`` scan), records
exploded inside ``mapInPandas`` — parsing stays in executors, the
driver never touches record content. Collections with millions of
records per file should be split upstream (the reference's dumps are
per-shipment files, which partitions naturally).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MARC_FIELDS_TYPE = (
    "array<struct<tag:string,indicators:string,"
    "subfields:array<struct<code:string,val:string>>>>"
)

Fields = list[tuple[str, str, list[tuple[str, str]]]]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _record_fields(rec: ET.Element) -> Fields:
    fields: Fields = []
    for el in rec:
        t = _local(el.tag)
        if t == "leader":
            continue
        if t == "controlfield":
            fields.append((el.get("tag", ""), "", [("", el.text or "")]))
        elif t == "datafield":
            subs = [
                (s.get("code", ""), s.text or "")
                for s in el
                if _local(s.tag) == "subfield"
            ]
            ind = (el.get("ind1") or " ") + (el.get("ind2") or " ")
            fields.append((el.get("tag", ""), ind, subs))
        elif t == "feld":
            # MABxml (www.ddb.de mabxml-1.xsd): <feld nr ind> with
            # either direct text or <uf code> subfields
            subs = [
                (s.get("code", ""), s.text or "") for s in el if _local(s.tag) == "uf"
            ]
            if not subs:
                subs = [("", el.text or "")]
            fields.append((el.get("nr", ""), el.get("ind") or " ", subs))
    return fields


def marcxml_records(text: str | bytes) -> Iterator[Fields]:
    """Parse a MARCXML collection / single record / MABxml ``datei``
    into field structs, namespace-agnostic across both dialects."""
    root = ET.fromstring(text)
    if _local(root.tag) in ("record", "datensatz"):
        yield _record_fields(root)
        return
    for el in root.iter():
        if _local(el.tag) in ("record", "datensatz"):
            yield _record_fields(el)


def read_marcxml(spark: SparkSession, path: str) -> DataFrame:
    """MARCXML files -> one row per record with a ``marc_fields``
    struct column (plus provenance path / record_no). Composes with
    ``marc_sink`` for the xml -> ISO 2709 conversion the reference
    drives through yaz-marcdump."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths: list[str] = []
            nos: list[int] = []
            recs: list[list[dict]] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, fields in enumerate(marcxml_records(bytes(content))):
                    paths.append(p)
                    nos.append(i)
                    recs.append(
                        [
                            {
                                "tag": t,
                                "indicators": ind,
                                "subfields": [{"code": c, "val": v} for c, v in subs],
                            }
                            for t, ind, subs in fields
                        ]
                    )
            yield pd.DataFrame({"path": paths, "record_no": nos, "marc_fields": recs})

    return raw.mapInPandas(run, f"path string, record_no int, marc_fields {MARC_FIELDS_TYPE}")


def marcxml_bytes(fields: Fields) -> bytes:
    """Inverse of :func:`marcxml_records` for ONE record: serialize the
    shared struct model to a MARCXML ``<record>`` (namespaced per the
    LoC slim schema). Completes the reference's two-way marc<->marcxml
    conversion (yaz-marcdump, sources/b3kat.py:210-228) — binary MARC
    via operators/sinks.py:marc_record_bytes, XML via this.

    MARC21-slim ONLY: MAB-sourced structs are not round-trippable here
    — single-char MAB indicators get padded to two chars (re-parse as
    ``'x '`` != ``'x'``) and control-tag fields (tag < '010') keep only
    the first subfield's value. Serialize MAB structs with the MABxml
    writer instead."""
    ns = "http://www.loc.gov/MARC21/slim"
    rec = ET.Element(f"{{{ns}}}record")
    for tag, ind, subs in fields:
        if tag < "010":
            cf = ET.SubElement(rec, f"{{{ns}}}controlfield", {"tag": tag})
            cf.text = subs[0][1] if subs else ""
        else:
            df = ET.SubElement(
                rec,
                f"{{{ns}}}datafield",
                {
                    "tag": tag,
                    "ind1": (ind + " ")[0],
                    "ind2": (ind + "  ")[1],
                },
            )
            for code, val in subs:
                sf = ET.SubElement(df, f"{{{ns}}}subfield", {"code": code})
                sf.text = val
    ET.register_namespace("", ns)
    return ET.tostring(rec, encoding="utf-8")


def marcxml_sink(df: DataFrame, fields_col: str = "marc_fields") -> DataFrame:
    """K5 XML side: attach a ``marcxml`` string column serialized in
    executors (Arrow-batched; same shape as marc_sink's binary
    column). Wrap in a ``<collection>`` element at write time."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = [f for f in df.schema.fields] + [
        T.StructField("marcxml", T.StringType())
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["marcxml"] = [
                marcxml_bytes(
                    [
                        (f["tag"], f["indicators"],
                         [(s["code"], s["val"]) for s in f["subfields"]])
                        for f in rec
                    ]
                ).decode("utf-8")
                for rec in pdf[fields_col]
            ]
            yield pdf

    return df.mapInPandas(run, T.StructType(out_fields))


def marc_values(fields_col: Column | str, tag: str, code: str | None = None) -> Column:
    """All values of ``tag`` (optionally restricted to subfield
    ``code``) as an array — the building block of F3 predicates.
    Pure higher-order-function expressions, no UDF."""
    c = F.col(fields_col) if isinstance(fields_col, str) else fields_col
    per_field = F.filter(c, lambda f: f.getField("tag") == tag)
    return F.flatten(
        F.transform(
            per_field,
            lambda f: F.transform(
                (
                    f.getField("subfields")
                    if code is None
                    else F.filter(
                        f.getField("subfields"), lambda s: s.getField("code") == code
                    )
                ),
                lambda s: s.getField("val"),
            ),
        )
    )


def marc_contains(
    fields_col: Column | str, tag: str, code: str, value: str
) -> Column:
    """F3 MARC field predicate (reference sources/b3kat.py:151-206,
    e.g. ``084.a contains "9,2"``) as a boolean Column."""
    return F.array_contains(marc_values(fields_col, tag, code), value)
