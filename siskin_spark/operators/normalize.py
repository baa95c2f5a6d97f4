"""Declarative mapping-spec -> Column compiler (SURVEY.md §2.2 M6:
the Metafacture-morph equivalent) and normalizer builders (M1-M4).

The reference maps source formats with per-source Python converters
(conversions.py) or XML morph DSLs (assets/arxiv/121_morph.xml); both
reduce to the same primitive set, which this compiler exposes as a
data-driven spec so new sources are config, not code:

    spec = {
      "finc_format":  {"map": {"from": "fmt", "table": {...}, "default": "Article"}},
      "rft_atitle":   {"col": "title"},
      "finc_id":      {"finc_id": {"source_id": "49", "record_col": "rid"}},
      "rft_date":     {"regex": {"from": "pubdate", "pattern": "(\\d{4})", "group": 1}},
      "x_date":       {"date_synth": {"from": "year"}},   # YYYY -> YYYY-01-01T00:00:00Z
      "abstract":     {"truncate": {"from": "abstract", "len": 500}},
      "finc_mega_collection": {"const_array": ["X"]},
      "authors_split": {"split": {"from": "authors_csv", "sep": ","}},
      "first_issn":   {"first": {"from": "issns"}},       # de_listify (M14)
    }

Lookup tables compile to literal maps (broadcast to every task — the
reference's static TSV maps, assets/maps/*.tsv).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from siskin_spark.operators.transforms import finc_id as _finc_id


def _compile_rule(rule: dict[str, Any]) -> Column:
    ((kind, arg),) = rule.items()
    if kind == "col":
        return F.col(arg)
    if kind == "const":
        return F.lit(arg)
    if kind == "const_array":
        return F.array(*[F.lit(v) for v in arg])
    if kind == "map":
        table = arg["table"]
        m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
        out = m[F.col(arg["from"])]
        if "default" in arg:
            out = F.coalesce(out, F.lit(arg["default"]))
        return out
    if kind == "regex":
        hit = F.regexp_extract(F.col(arg["from"]), arg["pattern"], arg.get("group", 1))
        return F.when(hit != "", hit)
    if kind == "truncate":
        return F.substring(F.col(arg["from"]), 1, int(arg["len"]))
    if kind == "split":
        return F.transform(
            F.split(F.col(arg["from"]), arg.get("sep", ",")), lambda s: F.trim(s)
        )
    if kind == "first":
        return F.element_at(F.col(arg["from"]), 1)  # de_listify, conversions.py:338-360
    if kind == "concat":
        return F.concat_ws(arg.get("sep", ""), *[F.col(c) for c in arg["cols"]])
    if kind == "date_synth":
        # YYYY -> ISO instant (reference: olc date synthesis,
        # conversions.py:332-334)
        y = F.col(arg["from"])
        return F.to_timestamp(F.concat(y, F.lit("-01-01 00:00:00")))
    if kind == "finc_id":
        return _finc_id(F.lit(str(arg["source_id"])), F.col(arg["record_col"]))
    raise ValueError(f"unknown mapping rule: {kind}")


def compile_mapping(spec: dict[str, dict[str, Any]]) -> list[Column]:
    """Mapping spec -> aliased Column list (feed to ``df.select``)."""
    return [_compile_rule(rule).alias(target) for target, rule in spec.items()]


def apply_mapping(df: DataFrame, spec: dict[str, dict[str, Any]]) -> DataFrame:
    """M1/M6: normalize a raw source frame into target columns in one
    projection (whole-stage codegen; lookup tables are literals)."""
    return df.select(*compile_mapping(spec))
