"""Export sinks beyond the Solr projection (SURVEY.md §2.1 K3/K4/K5):
MARC binary (ISO 2709), RDF/Turtle, Excel.

The reference shells out to pymarc/yaz-marcdump and openpyxl
(conversions.py:94-129, workflows/ai.py:516-568, adhoc.py:105-150);
here the record serializers are pure functions so they run in
executors via mapInPandas, and only genuinely driver-side formats
(one .xlsx workbook) collect.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- K5: MARC21 / ISO 2709 ------------------------------------------------

_FT = b"\x1e"  # field terminator
_RT = b"\x1d"  # record terminator
_SF = b"\x1f"  # subfield delimiter


def marc_record_bytes(fields: Sequence[tuple[str, str, Sequence[tuple[str, str]]]]) -> bytes:
    """Serialize one record to binary MARC (ISO 2709), dependency-free.

    ``fields`` is [(tag, indicators, [(code, value), ...])]; control
    fields (tag < '010') take their value as the single 'code' slot
    with empty indicators. Directory offsets/lengths are computed per
    the standard: 24-byte leader, 12-byte directory entries.
    (Reference writes via pymarc MARCWriter, conversions.py:94-129;
    format per the public MARC21 spec.)
    """
    dir_entries = b""
    data = b""
    for tag, indicators, subfields in fields:
        if tag < "010":
            field = subfields[0][1].encode("utf-8") + _FT
        else:
            field = indicators.encode("utf-8")
            for code, value in subfields:
                field += _SF + code.encode("utf-8") + value.encode("utf-8")
            field += _FT
        dir_entries += f"{tag}{len(field):04d}{len(data):05d}".encode()
        data += field
    base = 24 + len(dir_entries) + 1
    total = base + len(data) + 1
    leader = f"{total:05d}nam a22{base:05d} a 4500".encode()
    return leader + dir_entries + _FT + data + _RT


def marc_sink(df: DataFrame, fields_col: str = "marc_fields") -> DataFrame:
    """K5: attach a ``marc`` binary column serialized in executors.
    ``fields_col`` is array<struct<tag,indicators,subfields:
    array<struct<code,val>>>>. Write the result with
    ``df.write.parquet`` or stream the bytes to .mrc via
    foreachPartition."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("marc", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for fields in pdf[fields_col]:
                recs.append(
                    marc_record_bytes(
                        [
                            (
                                f["tag"],
                                f["indicators"],
                                [(s["code"], s["val"]) for s in f["subfields"]],
                            )
                            for f in fields
                        ]
                    )
                )
            pdf = pdf.copy()
            pdf["marc"] = recs
            yield pdf

    return df.mapInPandas(run, out_schema)


def parse_marc_bytes(raw: bytes) -> list[tuple[str, str, list[tuple[str, str]]]]:
    """Inverse of :func:`marc_record_bytes` (for tests / MARC scans)."""
    base = int(raw[12:17])
    directory = raw[24 : base - 1]
    fields = []
    for i in range(0, len(directory), 12):
        tag = directory[i : i + 3].decode()
        length = int(directory[i + 3 : i + 7])
        start = int(directory[i + 7 : i + 12])
        body = raw[base + start : base + start + length].rstrip(_FT)
        if tag < "010":
            fields.append((tag, "", [("", body.decode("utf-8"))]))
        else:
            parts = body.split(_SF)
            indicators = parts[0].decode("utf-8")
            subs = [(p[:1].decode("utf-8"), p[1:].decode("utf-8")) for p in parts[1:]]
            fields.append((tag, indicators, subs))
    return fields


# --- K4: RDF / Turtle ------------------------------------------------------


def triples_frame(
    df: DataFrame, subject: str, predicate_map: dict[str, str]
) -> DataFrame:
    """K4 first half (reference workflows/ai.py:516-568): project rows
    to an (s, p, o) triples DataFrame — one stack per mapped column,
    distributed; serialization to Turtle happens at the edge."""
    parts = [
        df.select(
            F.col(subject).alias("s"),
            F.lit(pred).alias("p"),
            F.col(col).cast("string").alias("o"),
        ).filter(F.col("o").isNotNull())
        for col, pred in predicate_map.items()
    ]
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def turtle_lines(triples: DataFrame) -> DataFrame:
    """K4 second half: one Turtle statement per row (string column
    'line'); write with df.write.text. Literals are quote-escaped."""
    esc = F.regexp_replace(F.regexp_replace(F.col("o"), r"\\", r"\\\\"), '"', '\\\\"')
    return triples.select(
        F.concat(
            F.lit("<"), F.col("s"), F.lit("> <"), F.col("p"), F.lit('> "'),
            esc, F.lit('" .'),
        ).alias("line")
    )


# --- K3: Excel -------------------------------------------------------------


def excel_sink(sheets: dict[str, DataFrame], path: str, max_rows: int = 1_000_000) -> None:
    """K3 multi-sheet xlsx report (reference workflows/adhoc.py:105-150).
    Driver-side by nature (one workbook file); guarded collect. Raises
    ImportError when no xlsx engine is installed — gate callers with
    try/except (engine container ships none)."""
    frames = {}
    for name, df in sheets.items():
        frames[name] = df.limit(max_rows).toPandas()
    with pd.ExcelWriter(path) as writer:  # needs openpyxl/xlsxwriter
        for name, pdf in frames.items():
            pdf.to_excel(writer, sheet_name=name[:31], index=False)
