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

import json
import os
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from siskin_spark.operators.transforms import finc_id as _finc_id
from siskin_spark.schema import AUTHOR_TYPE, INTERMEDIATE_SCHEMA

SPEC_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "specs")

# heuristic lang-id 2-letter -> ISO639-3 (the reference returns
# iso_code_639_3 from its detector, conversions.py:440-452)
_ISO3 = {
    "en": "eng",
    "de": "deu",
    "fr": "fra",
    "es": "spa",
    "it": "ita",
    "nl": "nld",
    "ru": "rus",
    "pt": "por",
    "pl": "pol",
    "cs": "ces",
    "sv": "swe",
    "da": "dan",
}


def _src(arg: dict[str, Any]) -> Column:
    """A rule's input: a raw column (``from``) or a nested rule
    (``from_rule``) — composition keeps the rule set small (e.g. olc's
    'synthesize x.date only from an exactly-4-digit year' is date_synth
    over a regex rule)."""
    if "from_rule" in arg:
        return _compile_rule(arg["from_rule"])
    return F.col(arg["from"])


def _template(template: str, inner: Column) -> Column:
    """'ai-68-{}'-style single-hole template. concat's null propagation
    gives presence-conditional output for free (null in -> null out)."""
    pre, _, suf = template.partition("{}")
    parts: list[Column] = []
    if pre:
        parts.append(F.lit(pre))
    parts.append(inner)
    if suf:
        parts.append(F.lit(suf))
    return F.concat(*parts)


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
        if table:
            m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
            out = m[_src(arg)]
        else:
            # empty table (genios: the DB->format preference hack ships
            # with no overrides yet) — everything falls to the default
            out = F.lit(None).cast("string")
        if "default_template" in arg:
            # miss -> synthesized value (reference: osf provider->tcid
            # fallback 'sid-179-col-<provider>', conversions.py:374-388)
            out = F.coalesce(out, _template(arg["default_template"], _src(arg)))
        if "default" in arg:
            out = F.coalesce(out, F.lit(arg["default"]))
        return out
    if kind == "map_array":
        # array -> filtered+mapped+templated distinct array (reference:
        # olc collection_details -> 'OLC SSG <name>' set, skipping
        # non-'SSG-' entries and unknown codes, conversions.py:302-311).
        # The reference iterates a Python set (unspecified order); we
        # sort for determinism.
        table = arg["table"]
        m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
        arr = F.coalesce(_src(arg), F.array().cast("array<string>"))
        mapped = F.transform(
            arr,
            lambda x: F.when(
                x.startswith(arg["require_prefix"]) if "require_prefix" in arg else F.lit(True),
                _template(arg.get("template", "{}"), m[x]),
            ),
        )
        return F.array_sort(F.array_distinct(F.array_compact(mapped)))
    if kind == "regex":
        hit = F.regexp_extract(_src(arg), arg["pattern"], arg.get("group", 1))
        return F.nullif(hit, F.lit(""))
    if kind == "truncate":
        out = F.substring(_src(arg), 1, int(arg["len"]))
        if "suffix" in arg:
            # reference eastview: content[:500] + '...' only when
            # content is present (conversions.py:560-561); concat's
            # null propagation implements the presence guard
            out = F.concat(out, F.lit(arg["suffix"]))
        return out
    if kind == "split":
        # trim=false mirrors a morph <split> WITHOUT the <trim/>
        # post-processor (the pqdt morph ships its trim commented out,
        # assets/34/morph.xml x.subjects rule)
        parts = F.split(_src(arg), arg.get("sep", ","))
        if arg.get("trim", True):
            return F.transform(parts, lambda s: F.trim(s))
        return parts
    if kind == "lower":
        # Metamorph <case to="lower"/> (assets/34/morph.xml language
        # choose chain lowercases before the sprachliste lookup)
        return F.lower(_src(arg))
    if kind == "first":
        # de_listify (conversions.py:338-360): first element; null or
        # empty-string resolves to the default when one is given.
        # try_: ANSI mode throws on empty arrays, de_listify([]) is None
        e = F.try_element_at(_src(arg), F.lit(1))
        if "default" in arg:
            return F.when(e.isNull() | (e == ""), F.lit(arg["default"])).otherwise(e)
        return e
    if kind == "concat":
        return F.concat_ws(arg.get("sep", ""), *[F.col(c) for c in arg["cols"]])
    if kind == "template":
        return _template(arg["template"], _src(arg))
    if kind == "strip_prefix":
        # reference uses str.replace (all occurrences), e.g. the osf
        # DOI 'https://doi.org/' strip (conversions.py:496)
        return F.replace(_src(arg), F.lit(arg["prefix"]), F.lit(""))
    if kind == "null_if":
        v = _src(arg)
        return F.when(v.isin(*arg["values"]), F.lit(None)).otherwise(v)
    if kind == "array_wrap":
        # scalar -> 1-element array, absent/empty stays null (the
        # reference only sets these keys when the value is truthy)
        v = _src(arg)
        return F.when(v.isNotNull() & (v != ""), F.array(v))
    if kind == "array_of":
        return F.array(*[_compile_rule(r) for r in arg["rules"]])
    if kind == "capitalize":
        # Python str.capitalize: first char upper, rest LOWER
        v = _src(arg)
        return F.concat(
            F.upper(F.substring(v, 1, 1)), F.lower(F.substring(v, 2, 2**31 - 1))
        )
    if kind == "lang_id":
        # heuristic stopword lang-id over the abstract (reference uses
        # a lingua detector, conversions.py:396-416; the container has
        # no lingua — the declared heuristic stand-in lives in
        # functions/text.py and maps to ISO639-3). Low confidence (no
        # stopword hit / empty input) yields NULL, never a silent
        # 'eng' mislabel — unless the spec explicitly asks for a
        # default.
        from siskin_spark.functions.text import lang_id, tokens

        v = _src(arg)
        default = arg.get("default")
        fallback = (
            F.lit(default) if default is not None else F.lit(None).cast("string")
        )
        code2 = lang_id(tokens(v))
        m = F.create_map(*[F.lit(x) for kv in _ISO3.items() for x in kv])
        return F.when(v.isNull() | (v == ""), fallback).otherwise(
            F.coalesce(m[code2], fallback)
        )
    if kind == "to_ts":
        # try_cast: one malformed source timestamp must degrade to
        # null, not abort the scan (ANSI mode). Year-0/negative
        # timestamps parse in Spark's proleptic calendar but cannot
        # round-trip to Python datetime (collect/foreach crash), so
        # they degrade to null too.
        v = _src(arg).try_cast("timestamp")
        return F.when(F.year(v) >= 1, v)
    if kind == "date_synth":
        # YYYY -> ISO instant (reference: olc date synthesis,
        # conversions.py:332-334); try_ variant + year>=1 guard for
        # junk years (see to_ts)
        y = _src(arg)
        t = F.try_to_timestamp(F.concat(y, F.lit("-01-01 00:00:00")))
        return F.when(F.year(t) >= 1, t)
    if kind == "authors_au":
        # names -> [{rft.au: name}, ...] (olc conversions.py:315,
        # eastview :543 with a no-trim comma split dropping empties)
        v = _src(arg)
        if "split" in arg:
            v = F.filter(F.split(v, arg["split"]), lambda s: s != "")
        return F.transform(
            F.coalesce(v, F.array().cast("array<string>")),
            lambda name: F.struct(
                *[
                    (name if f.name == "rft_au" else F.lit(None).cast("string")).alias(
                        f.name
                    )
                    for f in AUTHOR_TYPE.fields
                ]
            ),
        )
    if kind == "authors_struct":
        # pre-joined author dimension (the osf per-record HTTP fetch,
        # conversions.py:420-474, hoisted to ingestion per SURVEY M3)
        # cast up to the full author struct; optional "map" renames
        # source struct fields (e.g. crossref given/family)
        remap: dict[str, str] = arg.get(
            "map", {"rft_aufirst": "rft_aufirst", "rft_aulast": "rft_aulast"}
        )

        def _mk(a):
            cols = []
            for f in AUTHOR_TYPE.fields:
                if f.name in remap:
                    cols.append(a.getField(remap[f.name]).alias(f.name))
                else:
                    cols.append(F.lit(None).cast("string").alias(f.name))
            return F.struct(*cols)

        return F.transform(_src(arg), _mk)
    if kind == "first_match":
        # first array element matching a pattern (e.g. the DOI among
        # OAI-DC dc:identifier values); optional strip_prefix cleans it
        arr = F.coalesce(_src(arg), F.array().cast("array<string>"))
        hit = F.try_element_at(
            F.filter(arr, lambda x: x.rlike(arg["pattern"])), F.lit(1)
        )
        if "strip_prefix" in arg:
            hit = F.replace(hit, F.lit(arg["strip_prefix"]), F.lit(""))
        return hit
    if kind == "filter_match":
        # all array elements matching a pattern (e.g. ISSNs among
        # dc:identifier / dc:relation values); "unique" mirrors the
        # Metamorph <unique/> post-processor (assets/arxiv/121_morph.xml)
        arr = F.coalesce(_src(arg), F.array().cast("array<string>"))
        out = F.filter(arr, lambda x: x.rlike(arg["pattern"]))
        if arg.get("unique"):
            out = F.array_distinct(out)
        return out
    if kind == "join":
        # multi-valued field -> one string (Metamorph <concat
        # delimiter=..>, e.g. the arxiv morph's abstract rule); empty
        # array / all-null joins to null, not ""
        out = F.array_join(_src(arg), arg.get("sep", " "))
        return F.nullif(out, F.lit(""))
    if kind == "concat_rules":
        # join sub-rule outputs, skipping nulls (concat_ws semantics);
        # all-null collapses to null, not "" — e.g. crossref's
        # title+subtitle combination where either side may be absent
        out = F.concat_ws(arg.get("sep", ""), *[_compile_rule(r) for r in arg["rules"]])
        return F.nullif(out, F.lit(""))
    if kind == "unescape_trim":
        # span's UnescapeTrim (Quality.md #49): html-unescape + trim.
        # Spark has no builtin entity decoder; the five XML entities
        # cover the feed's observed escapes ('&' last — it is a prefix
        # of the others)
        v = F.trim(_src(arg))
        for ent, ch in (
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&#39;", "'"),
            ("&apos;", "'"),
            ("&amp;", "&"),
        ):
            v = F.replace(v, F.lit(ent), F.lit(ch))
        # empty trims to null (composes with coalesce). nullif, not
        # when(v != '', v): the CaseWhen form embeds the whole unescape
        # chain TWICE (condition + value) and e.g. crossref's
        # title:subtitle combination doubles it again — 4x of the same
        # subtree in every analyzed plan, paid in per-pass analysis and
        # plan serialization. NullIf holds the chain once (value-
        # identical: '' -> NULL, NULL -> NULL); r13 opt, guide §1/§5.
        return F.nullif(v, F.lit(""))
    if kind == "coalesce_rules":
        return F.coalesce(*[_compile_rule(r) for r in arg["rules"]])
    if kind == "date_parts":
        # crossref issued date-parts [y, m, d] with m/d optional ->
        # '2021' / '2021-07' / '2021-07-19' (concat_ws skips nulls)
        y = F.col(arg["y"]).try_cast("int")
        m = (
            F.col(arg["m"]).try_cast("int")
            if "m" in arg
            else F.lit(None).cast("int")
        )
        d = (
            F.col(arg["d"]).try_cast("int")
            if "d" in arg
            else F.lit(None).cast("int")
        )
        pad = lambda c, n: F.when(  # noqa: E731
            c.isNotNull(), F.lpad(c.cast("string"), n, "0")
        )
        out = F.concat_ws("-", pad(y, 4), pad(m, 2), pad(d, 2))
        return F.when(y.isNotNull(), out)
    if kind == "finc_id":
        # record_rule composes (genios: the record key is DB + '-' + ID,
        # Quality.md #48 -> span formats/genios/document.go:124-127);
        # "prefix" for the morph family's finc-<sid>- ids
        # (assets/datacite/morph.xml combine rule)
        rec = (
            _compile_rule(arg["record_rule"])
            if "record_rule" in arg
            else F.col(arg["record_col"])
        )
        return _finc_id(
            F.lit(str(arg["source_id"])), rec, prefix=arg.get("prefix", "ai-")
        )
    if kind == "replace_re":
        # generic regex rewrite: thieme newline-stripping in publisher
        # (Quality.md #60 -> span formats/thieme/record.go:269), HTML
        # tag sanitizing for abstracts (record.go:255, elsevier
        # dataset.go:514), genios multi-delimiter author canonicalize
        out = F.regexp_replace(_src(arg), arg["pattern"], arg.get("replacement", ""))
        if arg.get("trim"):
            out = F.trim(out)
        return F.nullif(out, F.lit(""))
    if kind == "array_filter":
        # drop offending array elements (NOT the record): ceeol's
        # too-short / blacklisted authors (Quality.md #53 -> span
        # formats/ceeol/article.go:97-107), genios 4..200-char author
        # bounds (Quality.md #48 -> genios/document.go:54-55,134-138)
        arr = F.coalesce(_src(arg), F.array().cast("array<string>"))

        def _keep(x: Column) -> Column:
            cond = F.trim(x) != ""
            if "min_len" in arg:
                cond = cond & (F.length(F.trim(x)) >= int(arg["min_len"]))
            if "max_len" in arg:
                cond = cond & (F.length(F.trim(x)) <= int(arg["max_len"]))
            if "not_in" in arg:
                cond = cond & ~F.trim(x).isin(*arg["not_in"])
            if "not_match" in arg:
                cond = cond & ~x.rlike(arg["not_match"])
            return cond

        return F.transform(F.filter(arr, _keep), lambda x: F.trim(x))
    if kind == "roman_to_int":
        # roman-numeral volume -> arabic (Quality.md #53 -> span
        # formats/ceeol/article.go:70-75). Digits pass through; a
        # non-roman non-digit value is kept as-is. Subtractive rule via
        # zip_with(vals, next_vals): any unmapped char nulls the sum,
        # which falls back to the original value.
        v = F.trim(_src(arg))
        up = F.upper(v)
        m = F.create_map(
            *[
                F.lit(x)
                for kv in [
                    ("I", 1), ("V", 5), ("X", 10), ("L", 50),
                    ("C", 100), ("D", 500), ("M", 1000),
                ]
                for x in kv
            ]
        )
        vals = F.transform(
            F.filter(F.split(up, ""), lambda c: c != ""), lambda c: m[c]
        )
        n = F.size(vals)
        nxt = F.concat(
            F.slice(vals, 2, F.greatest(n - 1, F.lit(0))), F.array(F.lit(0))
        )
        signed = F.zip_with(
            vals, nxt, lambda a, b: F.when(a < b, -a).otherwise(a)
        )
        total = F.aggregate(signed, F.lit(0), lambda acc, x: acc + x)
        return F.when(v == "", F.lit(None).cast("string")).otherwise(
            F.when(up.rlike("^[0-9]+$"), v).otherwise(
                F.when(
                    up.rlike("^[IVXLCDM]+$") & total.isNotNull(),
                    total.cast("string"),
                ).otherwise(v)
            )
        )
    if kind == "concat_distinct":
        # join DISTINCT non-null sub-rule outputs: ceeol multilingual
        # titles — append the English title only when it differs from
        # the original (Quality.md #53 -> span formats/ceeol/
        # article.go:60-67,76-82); identical or absent halves collapse
        cols = [_compile_rule(r) for r in arg["rules"]]
        arr = F.array_compact(F.array_distinct(F.array(*cols)))
        out = F.array_join(F.filter(arr, lambda x: x != ""), arg.get("sep", " : "))
        return F.nullif(out, F.lit(""))
    if kind == "issn_norm":
        # ISSN canonicalization (Quality.md #55 -> span formats/jstor/
        # article.go:146-150): strip separators, uppercase the check
        # digit, re-insert the dash; anything not 8 [0-9X] chars after
        # cleanup is dropped (null / removed from the array)
        def _norm(x: Column) -> Column:
            c = F.upper(F.regexp_replace(x, "[^0-9Xx]", ""))
            return F.when(
                c.rlike("^[0-9]{7}[0-9X]$"),
                F.concat(F.substring(c, 1, 4), F.lit("-"), F.substring(c, 5, 4)),
            )

        if arg.get("each"):
            arr = F.coalesce(_src(arg), F.array().cast("array<string>"))
            return F.array_compact(F.transform(arr, _norm))
        return _norm(_src(arg))
    raise ValueError(f"unknown mapping rule: {kind}")


def _compile_predicate(rule: dict[str, Any], now: Any = None) -> Column:
    """Boolean skip/keep rules (the reference's 'skip record entirely'
    guards, Quality.md #49): null-permissive where the reference is."""
    ((kind, arg),) = rule.items()
    if kind == "nonempty":
        v = _src(arg) if ("from" in arg or "from_rule" in arg) else _compile_rule(arg)
        return v.isNotNull() & (v != "")
    if kind == "max_len":
        v = _src(arg)
        return F.coalesce(F.length(v) <= int(arg["len"]), F.lit(True))
    if kind == "not_in":
        v = _src(arg)
        return F.coalesce(~v.isin(*arg["values"]), F.lit(True))
    if kind == "not_match":
        # regex skip-rule: jstor title blacklist (Quality.md #55 ->
        # span formats/jstor/article.go:51-55 — Front/Back Matter,
        # Volume Information), ieee bracket-titles (Quality.md #89 ->
        # ieee/publication.go:281-283). Null-permissive.
        v = _src(arg)
        return F.coalesce(~v.rlike(arg["pattern"]), F.lit(True))
    if kind == "not_future":
        # 'date too far in the future -> skip' (now + years_ahead);
        # wall-clock-relative, so `now` must be explicit — same
        # discipline as the KBART embargo walls
        if now is None:
            raise ValueError(
                "spec has a not_future rule; pass now=date(...) to "
                "normalize_source"
            )
        # try_cast: assembled date-parts can be malformed (e.g. Feb 29
        # of a non-leap year after the future-shift) — malformed dates
        # fall through to the null-permissive keep, they must not abort
        # the whole scan under ANSI mode
        v = _src(arg).try_cast("date")
        limit = F.add_months(F.lit(now), 12 * int(arg.get("years_ahead", 2)))
        return F.coalesce(v <= limit, F.lit(True))
    raise ValueError(f"unknown predicate rule: {kind}")


def compile_mapping(spec: dict[str, dict[str, Any]]) -> list[Column]:
    """Mapping spec -> aliased Column list (feed to ``df.select``).

    Memoized per (JVM gateway epoch, spec) via
    :mod:`siskin_spark.memo`: a spec compiles to hundreds of Column
    expressions, each a Py4J round-trip; repeated pipeline runs over
    the same spec (the normal case — one spec, many batches) reuse the
    immutable expression trees instead of rebuilding them. The key
    preserves the spec's KEY ORDER (no sort_keys): two specs with the
    same rules but different target order produce different column
    orders and must not share an entry.
    """
    from siskin_spark.memo import memo

    return list(
        memo(
            ("mapping", json.dumps(spec)),
            lambda: [
                _compile_rule(rule).alias(target) for target, rule in spec.items()
            ],
        )
    )


def apply_mapping(df: DataFrame, spec: dict[str, dict[str, Any]]) -> DataFrame:
    """M1/M6: normalize a raw source frame into target columns in one
    projection (whole-stage codegen; lookup tables are literals)."""
    return df.select(*compile_mapping(spec))


def load_spec(name: str) -> dict[str, Any]:
    """Load a shipped per-source spec (siskin_spark/specs/<name>.json).
    Specs are pure data — the reference's per-source converter code
    (conversions.py) re-expressed for collaborative editing, which its
    own TODO asks for (conversions.py:217)."""
    with open(os.path.join(SPEC_DIR, f"{name}.json"), encoding="utf-8") as fh:
        return json.load(fh)


def oai_dc_spec(source_id: str, mega_collection: list[str]) -> dict[str, Any]:
    """Parameterized OAI Dublin Core spec: the DC mapping shape
    (specs/doaj.json) with source identity swapped in. Covers every
    plain-DC OAI source the reference harvests through metha +
    span-import (doaj-oai sid 28, genderopen sid 162
    sources/genderopen.py:44,63, ijoc, pqdt, ...) — collection naming
    is AMSL-config-level data, so the caller supplies it."""
    spec = json.loads(json.dumps(load_spec("doaj")))  # deep copy
    m = spec["mapping"]
    m["finc_id"] = {
        "finc_id": {"source_id": source_id, "record_col": "oai_identifier"}
    }
    m["finc_source_id"] = {"const": source_id}
    m["finc_mega_collection"] = {"const_array": list(mega_collection)}
    return spec


def normalize_source(
    df: DataFrame, spec: str | dict[str, Any], now: Any = None
) -> DataFrame:
    """M1-M4: run a per-source spec end-to-end — skip-rule filters
    (``require``: null/empty drops the record, the reference's
    'if not dd.get("title") ... continue'; ``keep_if``: predicate
    rules like crossref's skip-entirely guards, evaluated on the RAW
    columns), the mapping projection, and conformance to the full
    intermediate schema (missing fields become typed nulls so
    heterogeneous sources union cleanly)."""
    if isinstance(spec, str):
        spec = load_spec(spec)
    for col in spec.get("require", []):
        df = df.filter(F.col(col).isNotNull() & (F.col(col) != ""))
    from siskin_spark.memo import memo

    for rule in spec.get("keep_if", []):
        pred = memo(
            ("pred", json.dumps(rule, sort_keys=True), repr(now)),
            lambda: _compile_predicate(rule, now=now),
        )
        df = df.filter(pred)
    out = apply_mapping(df, spec["mapping"])
    have = set(out.columns)
    # conform to the full intermediate schema; memoized like the mapping
    # itself — ~30 col/lit-cast expressions, each a Py4J round-trip
    # (set-keyed: output order is always INTERMEDIATE_SCHEMA order)
    full = memo(
        ("conform", ",".join(sorted(have))),
        lambda: [
            F.col(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in INTERMEDIATE_SCHEMA.fields
        ],
    )
    return out.select(*full)
