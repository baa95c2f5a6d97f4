"""Golden tests for the shipped per-source normalizer specs
(olc/osf/eastview — reference conversions.py:213-335, 363-511, 514-573),
table-driven in the reference's test_conversions.py style. These pin the
spec DATA, not just the compiler machinery."""

from __future__ import annotations

import datetime

from siskin_spark.operators.normalize import load_spec, normalize_source


def _row(out, key="finc_id"):
    return {r[key]: r.asDict() for r in out.collect()}


# -- olc --------------------------------------------------------------


def _olc_raw(spark):
    spec = load_spec("olc")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        # full record: SSG filter + unknown-code skip + dedup, list
        # fields de-listified, 4-digit year
        (
            "123", ["On Sorting"], ["A subtitle"], ["An abstract", "second"],
            ["Doe, J.", "Roe, R."], ["electronic Article"],
            ["SSG-OLC-MAT", "SSG-OPC-MAT", "SSG-OLC-UNKNOWN", "not-ssg"],
            ["ger"], ["1111-2222"], "4", "J Algo", "12", ["Pub A"],
            ["Leipzig"], ["https://example.org/123"], "1999",
        ),
        # empty format -> de_listify default 'Article'; 6-digit
        # publishDateSort -> no dates; duplicate mapped collections
        (
            "124", ["Title B"], None, None, None, [],
            ["SSG-OLC-ANG", "SSG-OPC-ANG"],
            [], [], "", "", "", [], [], ["https://example.org/124"], "199901",
        ),
        # unmapped format -> null finc_format
        (
            "125", ["Title C"], None, None, None, ["Mystery Object"],
            [], [], [], "", "", "", [], [], [], None,
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_olc_spec_golden(spark):
    out = normalize_source(_olc_raw(spark), "olc")
    got = _row(out)
    a = got["ai-68-123"]
    assert a["finc_source_id"] == "68"
    assert a["finc_format"] == "Article"  # electronic Article ->
    # SSG-OLC-MAT + SSG-OPC-MAT mapped, unknown code and non-SSG
    # entry skipped, sorted output
    assert a["finc_mega_collection"] == [
        "OLC SSG Mathematik",
        "OLC SSG Mathematik und Informatik",
    ]
    assert a["abstract"] == "An abstract"  # de_listify
    assert [au["rft_au"] for au in a["authors"]] == ["Doe, J.", "Roe, R."]
    assert a["rft_atitle"] == "On Sorting"
    assert a["x_subtitle"] == "A subtitle"
    assert a["rft_genre"] == "article"
    assert a["rft_date"] == "1999"
    assert a["x_date"] == datetime.datetime(1999, 1, 1)
    b = got["ai-68-124"]
    assert b["finc_format"] == "Article"  # empty list -> default
    # two codes mapping to the same name dedup to one entry
    assert b["finc_mega_collection"] == [
        "OLC SSG Anglistik",
        "OLC SSG Anglo-American Culture",
    ]
    assert b["rft_date"] is None and b["x_date"] is None  # not a 4-digit year
    c = got["ai-68-125"]
    assert c["finc_format"] is None  # unknown format maps to nothing
    assert c["finc_mega_collection"] == []


def test_olc_collection_map_completeness():
    # the shipped table covers the reference's full SSG code list
    # (conversions.py:220-291): 51 OLC + 11 OPC codes
    table = load_spec("olc")["mapping"]["finc_mega_collection"]["map_array"]["table"]
    assert len(table) == 62
    assert table["SSG-OLC-FTH"] == "Film / Theater"  # refs #16279 variant
    assert table["SSG-OPC-GEO"] == "Fachkatalog Geophysik"


# -- osf --------------------------------------------------------------


def _osf_raw(spark):
    spec = load_spec("osf")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        # the reference's own golden case (test_conversions.py:59-275),
        # authors pre-joined instead of HTTP-fetched
        (
            "egcsk", "Konsep Allah Dalam Teologi Proses", "",
            ["Gambar", "Respon", "Teologi Proses", "Tuhan"], "osf",
            "https://doi.org/10.31219/osf.io/egcsk", "2021-07-19T07:42:12.695116",
            [("Ceria", "Ceria")],
        ),
        # mapped provider + English abstract for the heuristic detector
        (
            "ab12x", "A Title", "the quick brown fox is a fox and the dog",
            [], "psyarxiv",
            "https://doi.org/10.31219/osf.io/ab12x", "2020-01-05T00:00:00",
            [],
        ),
        (None, "skipped: no id", None, [], "osf", None, None, []),
    ]
    return spark.createDataFrame(rows, schema)


def test_osf_spec_golden(spark):
    out = normalize_source(_osf_raw(spark), "osf")
    got = _row(out)
    assert set(got) == {"ai-179-egcsk", "ai-179-ab12x"}  # no-id row skipped
    e = got["ai-179-egcsk"]
    assert e["finc_source_id"] == "179"
    assert e["finc_format"] == "Preprint"
    # unmapped provider falls back to the template + capitalize
    assert e["finc_mega_collection"] == ["sid-179-col-osf", "Osf"]
    assert e["doi"] == "10.31219/osf.io/egcsk"
    assert e["rft_atitle"] == "Konsep Allah Dalam Teologi Proses"
    assert e["rft_jtitle"] == "osf"
    assert e["rft_pub"] == ["OSF Preprints"]
    assert e["rft_date"] == "2021-07-19"
    assert e["x_date"] == datetime.datetime(2021, 7, 19, 7, 42, 12, 695116)
    assert e["url"] == ["https://doi.org/10.31219/osf.io/egcsk"]
    assert e["subjects"] == ["Gambar", "Respon", "Teologi Proses", "Tuhan"]
    assert [(a["rft_aufirst"], a["rft_aulast"]) for a in e["authors"]] == [
        ("Ceria", "Ceria")
    ]
    assert e["languages"] is None  # empty abstract -> no silent 'eng'
    p = got["ai-179-ab12x"]
    assert p["finc_mega_collection"] == ["sid-179-col-psy", "Psyarxiv"]
    assert p["languages"] == ["eng"]  # heuristic detector: English hit


def test_lang_id_rule_widened_languages(spark):
    """The lang_id rule detects every STOPWORDS profile and yields
    NULL (not 'eng') on low confidence — a Spanish or Russian abstract
    must never be silently mislabeled English (r3 verdict item 3)."""
    from siskin_spark.operators.normalize import apply_mapping

    rows = [
        ("the cat and the dog is a pet in the house", "eng"),
        ("der hund und die katze ist ein gutes tier", "deu"),
        ("le chat et la souris est une histoire", "fra"),
        ("el valor de los datos y las tablas es una prueba del sistema", "spa"),
        ("il valore della tabella che di per se non cambia", "ita"),
        ("de waarde van het systeem is een test en niet meer", "nld"),
        ("и в не на что это", "rus"),
        ("o valor dos dados não são um problema e também não serão", "por"),
        ("to się nie zmienia oraz jest widoczne przez cały czas", "pol"),
        ("to je pro nás dobré že jsou data tak dostupná", "ces"),
        ("det är viktigt att systemet fungerar som det ska på alla sätt", "swe"),
        ("det er vigtigt og også godt til brug med data af god kvalitet", "dan"),
        ("xyzzy qwerty plugh", None),  # no stopword hit -> null
        ("", None),  # empty -> null
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(rows)], "i int, description string"
    )
    out = apply_mapping(
        df,
        {
            "i": {"col": "i"},
            "lang": {"lang_id": {"from": "description"}},
        },
    ).collect()
    got = {r["i"]: r["lang"] for r in out}
    for i, (_, want) in enumerate(rows):
        assert got[i] == want, (i, rows[i][0], got[i], want)


def test_lang_id_rule_explicit_default_preserved(spark):
    """A spec that explicitly asks for a default still gets it."""
    from siskin_spark.operators.normalize import apply_mapping

    df = spark.createDataFrame([(1, "xyzzy")], "i int, description string")
    (row,) = apply_mapping(
        df, {"lang": {"lang_id": {"from": "description", "default": "eng"}}}
    ).collect()
    assert row["lang"] == "eng"


# -- eastview ---------------------------------------------------------


def _eastview_raw(spark):
    spec = load_spec("eastview")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    long_content = "x" * 600
    rows = [
        (
            "ev1", "Статья один", "Иванов И., Petrov P.", "Журнал А", "2015",
            "3", "Москва", long_content, "7", "12-19", "rus",
            "https://example.org/ev1",
        ),
        # pages '-' dropped; no optional fields
        (
            "ev2", "Title two", "", "", None, None, None, None, None, "-",
            None, "https://example.org/ev2",
        ),
        # skip rules: no title / no url
        (None, None, None, None, None, None, None, "c", None, None, None, "https://x"),
        ("ev4", "Title four", None, None, None, None, None, None, None, None, None, ""),
    ]
    return spark.createDataFrame(rows, schema)


def test_eastview_spec_golden(spark):
    out = normalize_source(_eastview_raw(spark), "eastview")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"ev1", "ev2"}  # title+url skip rules
    a = got["ev1"]
    assert a["finc_source_id"] == "210"
    # ai-210-<b64 sans padding> ('ev1' -> ZXYx)
    assert a["finc_id"] == "ai-210-ZXYx"
    assert a["version"] == "0.9"
    assert a["finc_mega_collection"] == [
        "Universal Database of Social Sciences & Humanities (UDB-EDU)",
        "sid-210-col-udbedu",
    ]
    # comma split WITHOUT trim (reference conversions.py:543)
    assert [au["rft_au"] for au in a["authors"]] == ["Иванов И.", " Petrov P."]
    assert a["abstract"] == "x" * 500 + "..."
    assert a["rft_pages"] == "12-19"
    assert a["rft_volume"] == "7"
    assert a["rft_issue"] == "3"
    assert a["rft_place"] == ["Москва"]
    assert a["languages"] == ["rus"]
    assert a["rft_date"] == "2015"
    assert a["x_date"] == datetime.datetime(2015, 1, 1)
    b = got["ev2"]
    assert b["rft_pages"] is None  # '-' dropped
    assert b["abstract"] is None  # no content -> no '...' suffix
    assert b["authors"] == []  # empty author string -> no authors
    assert b["x_date"] is None


# -- crossref ---------------------------------------------------------


def _crossref_raw(spark):
    spec = load_spec("crossref")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        (
            "10.1000/j.1", "journal-article", "Sorting &amp; Searching ",
            "A Survey", "J. Algorithms", " ACM ", "320", "12", "3", "101-119",
            ["1111-2222"], [("Donald", "Knuth")], ["CS"],
            "https://doi.org/10.1000/j.1", "en", 1998, 7, None,
            "1998-07-02T10:00:00",
        ),
        # subtitle-only title survives; publisher empty -> X-U fallback
        (
            "10.1000/j.2", "journal-article", None, "Only Subtitle",
            "J. Algorithms", "", None, None, None, None, [], [], [],
            None, None, 2001, None, None, "2001-01-01T00:00:00",
        ),
        # skip: journal-issue type
        ("10.1000/j.3", "journal-issue", "An Issue", None, "J. Algorithms",
         "ACM", None, None, None, None, [], [], [], None, None, 2001, None,
         None, "2001-01-01T00:00:00"),
        # skip: no container title
        ("10.1000/j.4", "journal-article", "No Container", None, None,
         "ACM", None, None, None, None, [], [], [], None, None, 2001, None,
         None, "2001-01-01T00:00:00"),
        # skip: no title at all
        ("10.1000/j.5", "journal-article", None, None, "J. Algorithms",
         "ACM", None, None, None, None, [], [], [], None, None, 2001, None,
         None, "2001-01-01T00:00:00"),
        # skip: issued date too far in the future (now + 2y guard)
        ("10.1000/j.6", "journal-article", "From the Future", None,
         "J. Algorithms", "ACM", None, None, None, None, [], [], [], None,
         None, 2031, 1, 1, "2001-01-01T00:00:00"),
    ]
    return spark.createDataFrame(rows, schema)


def test_crossref_spec_golden(spark):
    out = normalize_source(
        _crossref_raw(spark), "crossref", now=datetime.date(2026, 8, 13)
    )
    got = _row(out, key="finc_record_id")
    # skip-entirely guards (Quality.md #49)
    assert set(got) == {"10.1000/j.1", "10.1000/j.2"}
    a = got["10.1000/j.1"]
    assert a["finc_source_id"] == "49"
    # urlsafe b64('10.1000/j.1') sans padding
    assert a["finc_id"] == "ai-49-MTAuMTAwMC9qLjE"
    assert a["finc_format"] == "ElectronicArticle"
    assert a["finc_mega_collection"] == ["Crossref (member 320)"]
    # unescape+trim on title; title ' : ' subtitle combination
    assert a["rft_atitle"] == "Sorting & Searching : A Survey"
    assert a["rft_pub"] == ["ACM"]  # trimmed
    assert a["rft_spage"] == "101" and a["rft_epage"] == "119"
    assert a["rft_date"] == "1998-07"  # year+month, no day
    assert a["x_date"] == datetime.datetime(1998, 7, 2, 10, 0, 0)
    assert [(x["rft_aufirst"], x["rft_aulast"]) for x in a["authors"]] == [
        ("Donald", "Knuth")
    ]
    b = got["10.1000/j.2"]
    assert b["rft_atitle"] == "Only Subtitle"  # subtitle-as-title
    assert b["rft_pub"] == ["X-U (Crossref)"]  # publisher fallback
    assert b["rft_date"] == "2001"
    assert b["rft_spage"] is None and b["rft_epage"] is None


def test_crossref_requires_now_for_future_guard(spark):
    import pytest

    with pytest.raises(ValueError, match="now"):
        normalize_source(_crossref_raw(spark), "crossref")


def test_crossref_malformed_dates_degrade_not_abort(spark):
    # ANSI-mode regression: one impossible assembled date (Feb 29 of a
    # non-leap year hitting the not_future guard) or junk timestamp
    # must degrade to null / null-permissive keep — never abort the
    # whole scan (bench caught exactly this at sf0.1)
    spec = load_spec("crossref")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        ("10.1000/j.7", "journal-article", "Leapless", None,
         "J. Algorithms", "ACM", None, None, None, None, [], [], [],
         None, None, 2027, 2, 29, "not-a-timestamp"),
    ]
    out = normalize_source(
        spark.createDataFrame(rows, schema), "crossref",
        now=datetime.date(2026, 8, 13),
    )
    got = out.collect()
    assert len(got) == 1
    assert got[0]["x_date"] is None  # junk created -> null, not abort
    assert got[0]["rft_date"] == "2027-02-29"  # rendered verbatim


# -- doaj (oai_dc) ----------------------------------------------------


def test_doaj_spec_golden(spark):
    spec = load_spec("doaj")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        (
            "oai:doaj.org/article:abc123", "Open Music Theory",
            ["Doe, Jane", "Roe, Rick"],
            ["https://doaj.org/article/abc123",
             "https://doi.org/10.2000/b1", "some-opaque-id"],
            ["5555-6666", "Journal of Things", "7777-888X"],
            "2015-03-01T00:00:00Z", ["eng"], ["Music", "Theory"],
            "Open Press", "J Open",
        ),
        ("oai:doaj.org/article:nodoi", "No DOI Here", [], ["x"], [], None,
         [], [], None, None),
        (None, "skipped", [], [], [], None, [], [], None, None),
    ]
    out = normalize_source(spark.createDataFrame(rows, schema), "doaj")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"oai:doaj.org/article:abc123", "oai:doaj.org/article:nodoi"}
    a = got["oai:doaj.org/article:abc123"]
    assert a["finc_source_id"] == "28"
    assert a["finc_mega_collection"] == [
        "DOAJ Directory of Open Access Journals", "sid-28-col-doaj",
    ]
    # DOI pulled out of the identifier multiplex, prefix stripped
    assert a["doi"] == "10.2000/b1"
    # ISSNs pulled from relations by pattern (title string excluded)
    assert a["rft_issn"] == ["5555-6666", "7777-888X"]
    # URLs are the http identifiers only
    assert a["url"] == [
        "https://doaj.org/article/abc123", "https://doi.org/10.2000/b1",
    ]
    assert [x["rft_au"] for x in a["authors"]] == ["Doe, Jane", "Roe, Rick"]
    assert a["rft_date"] == "2015-03-01"
    assert a["x_date"] == datetime.datetime(2015, 3, 1)
    b = got["oai:doaj.org/article:nodoi"]
    assert b["doi"] is None
    assert b["rft_issn"] == [] and b["url"] == []


# -- genios -----------------------------------------------------------


def _genios_raw(spark):
    spec = load_spec("genios")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        # full record: multi-delimiter authors with filler + n.n.,
        # journal newline, volume/issue hidden in 'number', full date
        (
            "WISO", "X123", "  Ein &amp; Aus  ", "f" * 3000, "",
            "Meier, Hans/Schulze, Petra; et al.; n.n.; Li",
            "2015-03-02", "2015", "7 / 12", None, "Zeitschrift\nfür Dinge",
            "1234-5679", "de", "(c) X",
        ),
        # no full date -> year fallback; explicit volume wins; abstract
        # present -> fulltext NOT used; ISSN lowercase x normalized
        (
            "RECH", "9", "T2", "body text", "An abstract", None,
            "bad-date", "1999", "12", "33", "J", "2234567x", "en", None,
        ),
        # skipped: no parseable date at all
        ("WISO", "nodate", "T3", None, None, None, None, "199", None,
         None, None, None, "de", None),
        # skipped: no title
        ("WISO", "notitle", "", None, None, None, None, "1999", None,
         None, None, None, "de", None),
        # skipped: id longer than 250 chars (document.go:300-309)
        ("WISO", "y" * 260, "T5", None, None, None, None, "1999", None,
         None, None, None, "de", None),
    ]
    return spark.createDataFrame(rows, schema)


def test_genios_spec_golden(spark):
    out = normalize_source(_genios_raw(spark), "genios")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"WISO-X123", "RECH-9"}
    a = got["WISO-X123"]
    assert a["finc_source_id"] == "48"
    # ai-48-<urlsafe b64('WISO-X123') sans padding>
    assert a["finc_id"] == "ai-48-V0lTTy1YMTIz"
    assert a["finc_format"] == "ElectronicArticle"  # empty map -> default
    assert a["finc_mega_collection"] == ["Genios", "sid-48-col-WISO"]
    assert a["rft_atitle"] == "Ein & Aus"  # unescape + trim
    assert a["rft_jtitle"] == "Zeitschrift für Dinge"  # newline removed
    # '/' and ';' both split; 'et al.' and 'n.n.' filler dropped; 'Li'
    # under the 4-char minimum dropped (document.go:54-55,134-138,172-177)
    assert [x["rft_au"] for x in a["authors"]] == ["Meier, Hans", "Schulze, Petra"]
    # abstract empty -> first 2000 chars of fulltext (document.go:245-247)
    assert a["abstract"] == "f" * 2000
    assert a["x_fulltext"] == "f" * 3000
    assert a["rft_volume"] == "7" and a["rft_issue"] == "12"  # from 'number'
    assert a["rft_issn"] == ["1234-5679"]
    assert a["languages"] == ["deu"]
    assert a["rft_date"] == "2015-03-02"
    assert a["x_date"] == datetime.datetime(2015, 3, 2)
    b = got["RECH-9"]
    assert b["rft_date"] == "1999"  # bad date -> year fallback
    assert b["x_date"] == datetime.datetime(1999, 1, 1)
    assert b["rft_volume"] == "33"  # explicit volume beats 'number'
    assert b["abstract"] == "An abstract"  # present -> fulltext unused
    assert b["rft_issn"] == ["2234-567X"]  # check digit uppercased
    assert b["languages"] == ["eng"]
    assert b["authors"] == []


def test_genios_title_cap():
    spec = load_spec("genios")
    rule = spec["mapping"]["rft_atitle"]["truncate"]
    assert int(rule["len"]) == 4096  # document.go:56


# -- ceeol ------------------------------------------------------------


def _ceeol_raw(spark):
    spec = load_spec("ceeol")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        # multilingual titles differ -> combined; roman volume; short +
        # blacklisted authors dropped
        (
            "c1", "Dzieje pewnego miasta", "History of a Town",
            "Kwartalnik", "Quarterly", ["Kowalska, Anna", "Li", "Anonymous"],
            "XIV", "2", "2018", "1234-5679", ["pol"], "Wydawnictwo X",
            "Streszczenie", "https://example.org/c1", ["History"],
        ),
        # identical original/English title collapses to one; digit
        # volume passes through; non-roman volume kept as-is
        (
            "c2", "Same Title", "Same Title", "J", "J", [], "17", None,
            "199", None, [], None, None, None, [],
        ),
        ("c3", "Weird Volume", None, None, None, [], "Suppl.", None,
         None, None, [], None, None, None, []),
        (None, "skipped", None, None, None, [], None, None, None, None,
         [], None, None, None, []),
    ]
    return spark.createDataFrame(rows, schema)


def test_ceeol_spec_golden(spark):
    out = normalize_source(_ceeol_raw(spark), "ceeol")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"c1", "c2", "c3"}
    a = got["c1"]
    assert a["finc_source_id"] == "53"
    assert a["finc_id"] == "ai-53-YzE"  # b64('c1') sans padding
    # differing original + English titles combine (article.go:60-67)
    assert a["rft_atitle"] == "Dzieje pewnego miasta : History of a Town"
    assert a["rft_jtitle"] == "Kwartalnik : Quarterly"
    assert a["rft_volume"] == "14"  # XIV -> arabic (article.go:70-75)
    # 'Li' under the 4-char floor and blacklisted 'Anonymous' dropped
    assert [x["rft_au"] for x in a["authors"]] == ["Kowalska, Anna"]
    assert a["rft_issn"] == ["1234-5679"]
    assert a["rft_pub"] == ["Wydawnictwo X"]
    assert a["rft_date"] == "2018"
    b = got["c2"]
    assert b["rft_atitle"] == "Same Title"  # identical halves collapse
    assert b["rft_volume"] == "17"  # digits pass through
    assert b["rft_date"] is None  # 3-digit year rejected
    assert got["c3"]["rft_volume"] == "Suppl."  # non-roman kept as-is


def test_roman_to_int_values(spark):
    from siskin_spark.operators.normalize import apply_mapping

    df = spark.createDataFrame(
        [("IV",), ("MCMXCIX",), ("iii",), ("XL",), ("IC",), ("",)], "v string"
    )
    out = apply_mapping(df, {"n": {"roman_to_int": {"from": "v"}}})
    # subtractive forms handled; lowercase accepted; '' -> null
    assert [r["n"] for r in out.collect()] == ["4", "1999", "3", "40", "99", None]


# -- jstor ------------------------------------------------------------


def _jstor_raw(spark):
    spec = load_spec("jstor")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        (
            "10.2307/41", "A Study", "Of Things", "J Hist", "research-article",
            ["0040-165x", "bogus", "15311234"], ["Doe, J."], "5", "2",
            "10", "25", "1988", ["eng"], "Univ Press",
            "https://www.jstor.org/stable/41",
        ),
        # title blacklist: skipped entirely (article.go:51-55)
        ("10.2307/42", "Front Matter", None, "J Hist", "misc", [], [],
         None, None, None, None, "1988", [], None, None),
        ("10.2307/43", "Volume Information", None, "J Hist", "misc", [], [],
         None, None, None, None, "1988", [], None, None),
        # id too long: ai-55-<b64> exceeds 250 (article.go:131-133)
        ("x" * 200, "Long Id", None, "J", "research-article", [], [],
         None, None, None, None, "1988", [], None, None),
        # book-review genre mapping survives
        ("10.2307/44", "Review: Some Book", None, "J Hist", "book-review",
         [], [], None, None, None, None, "1990", [], None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_jstor_spec_golden(spark):
    out = normalize_source(_jstor_raw(spark), "jstor")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"10.2307/41", "10.2307/44"}
    a = got["10.2307/41"]
    assert a["finc_source_id"] == "55"
    assert a["rft_atitle"] == "A Study: Of Things"
    # ISSN normalization (article.go:146-150): 0040-165x -> check digit
    # uppercased; 'bogus' dropped; bare 8-digit gets its dash
    assert a["rft_issn"] == ["0040-165X", "1531-1234"]
    assert a["rft_genre"] == "article"
    assert a["rft_spage"] == "10" and a["rft_epage"] == "25"
    assert got["10.2307/44"]["rft_genre"] == "bookitem"


# -- thieme -----------------------------------------------------------


def _thieme_raw(spark):
    spec = load_spec("thieme")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        (
            "t1", "Ein Artikel", "Semin Med", "Georg\nThieme Verlag",
            "<p>Ein <b>Abstract</b>.</p>", "2019-04-01", "2019",
            ["1438-8654"], ["Muster, Max"], ["deu"], "23", "4",
            "https://doi.org/10.1055/s-0039-12345",
        ),
        # invalid date -> year fallback; unmapped publisher passes through
        ("t2", "Zwei", "J", "Karger", None, "19.4.01", "2001", [], [],
         [], None, None, None),
        # skipped: completely empty publisher (record.go:276-278)
        ("t3", "Drei", "J", "", None, None, "2001", [], [], [], None,
         None, None),
        ("t4", "Vier", "J", None, None, None, "2001", [], [], [], None,
         None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_thieme_spec_golden(spark):
    out = normalize_source(_thieme_raw(spark), "thieme")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"t1", "t2"}  # empty/null publisher skipped
    a = got["t1"]
    assert a["finc_source_id"] == "60"
    # newline removed (record.go:269) then consolidated (:257-265)
    assert a["rft_pub"] == ["Georg Thieme Verlag KG"]
    assert a["abstract"] == "Ein Abstract."  # HTML sanitized (:255)
    assert a["doi"] == "10.1055/s-0039-12345"
    assert a["rft_date"] == "2019-04-01"
    assert a["x_date"] == datetime.datetime(2019, 4, 1)
    b = got["t2"]
    assert b["rft_pub"] == ["Karger"]  # unmapped name passes through
    assert b["rft_date"] == "2001"  # invalid date -> year (:235-238)
    assert b["x_date"] == datetime.datetime(2001, 1, 1)


# -- degruyter / ios / elsevier (thin JATS-ish shapes) ----------------


def test_degruyter_spec_golden(spark):
    spec = load_spec("degruyter")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        ("d1", "A Title", "Sub", "Z Soziologie", ["0340-1804"],
         [("Ada", "Lovelace")], "44", "1", "3", "19", "2015", ["deu"],
         "De Gruyter", "https://doi.org/10.1515/x-2015", "https://example.org/d1"),
        # skipped: id too long (article.go:76-78)
        ("x" * 200, "Long", None, "J", [], [], None, None, None, None,
         "2015", [], None, None, None),
    ]
    out = normalize_source(spark.createDataFrame(rows, schema), "degruyter")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"d1"}
    a = got["d1"]
    assert a["finc_source_id"] == "50"
    assert a["rft_atitle"] == "A Title: Sub"
    assert a["doi"] == "10.1515/x-2015"
    assert [(x["rft_aufirst"], x["rft_aulast"]) for x in a["authors"]] == [
        ("Ada", "Lovelace")
    ]
    assert a["rft_issn"] == ["0340-1804"]
    assert a["x_date"] == datetime.datetime(2015, 1, 1)


def test_ios_spec_golden(spark):
    spec = load_spec("ios")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        ("i1", "Fundamenta", "Fundam Inform", ["0169-2968"],
         [("Alan", "Turing")], "180", "4", "1", "20", "2021", ["eng"],
         "An abstract", "10.3233/FI-2021", "https://example.org/i1"),
        (None, "skipped", None, [], [], None, None, None, None, "2021",
         [], None, None, None),
    ]
    out = normalize_source(spark.createDataFrame(rows, schema), "ios")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"i1"}
    a = got["i1"]
    assert a["finc_source_id"] == "219"
    assert a["finc_mega_collection"] == ["IOS Press", "sid-219-col-ios"]
    assert a["doi"] == "10.3233/FI-2021"  # bare DOI untouched
    assert a["rft_date"] == "2021"


def test_elsevier_spec_golden(spark):
    spec = load_spec("elsevier")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        # full cover date
        ("e1", "An Article", "J Chem", ["0009-2509"], [("Rosalind", "Franklin")],
         "99", "2", "100", "120", "2014-06-15", "2014", ["eng"],
         "<p>HTML <i>abstract</i></p>", "10.1016/j.ces.2014", None),
        # year-only cover date; sanitizer no-op
        ("e2", "Another", "J Chem", [], [], None, None, None, None,
         "2014", None, [], "plain", None, None),
        # cover date garbage -> sort_year fallback
        ("e3", "Third", "J Chem", [], [], None, None, None, None,
         "15 giugno", "2013", [], None, None, None),
        # skipped: no usable date at all (dataset.go:503-507)
        ("e4", "No Date", "J Chem", [], [], None, None, None, None,
         None, "n/a", [], None, None, None),
    ]
    out = normalize_source(spark.createDataFrame(rows, schema), "elsevier")
    got = _row(out, key="finc_record_id")
    assert set(got) == {"e1", "e2", "e3"}
    a = got["e1"]
    assert a["finc_source_id"] == "85"
    assert a["abstract"] == "HTML abstract"  # sanitized (dataset.go:514)
    assert a["rft_date"] == "2014-06-15"
    assert a["x_date"] == datetime.datetime(2014, 6, 15)
    b = got["e2"]
    assert b["rft_date"] == "2014"
    assert b["x_date"] == datetime.datetime(2014, 1, 1)
    c = got["e3"]
    assert c["rft_date"] == "2013"  # sort_year fallback (:323-347)
    assert c["x_date"] == datetime.datetime(2013, 1, 1)


def test_oai_dc_spec_parameterized(spark):
    """genderopen (sid 162, sources/genderopen.py:44) and any other
    plain-DC OAI source ride the same spec with swapped identity."""
    from siskin_spark.operators.normalize import oai_dc_spec

    spec = oai_dc_spec("162", ["GenderOpen", "sid-162-col-go"])
    schema = ", ".join(
        f"{c} {t}" for c, t in load_spec("doaj")["raw_columns"].items()
    )
    rows = [("oai:go/1", "A Title", ["A, B"], [], [], "2020", [], [], None, None)]
    out = normalize_source(spark.createDataFrame(rows, schema), spec)
    r = out.collect()[0]
    assert r["finc_source_id"] == "162"
    assert r["finc_id"].startswith("ai-162-")
    assert list(r["finc_mega_collection"]) == ["GenderOpen", "sid-162-col-go"]


# -- arxiv (the Metafacture morph family) -----------------------------


def _arxiv_raw(spark):
    spec = load_spec("arxiv")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        (
            "oai:arXiv.org/1234.5678", "On Spark Morphs",
            ["Part one.", "Part two."], ["Doe, Jane", "Roe, Richard"],
            "de",
            ["http://arxiv.org/abs/1234.5678", "doi:10.1000/xyz.12"],
            ["International Journal of Communication; Vol 5 (2011); 29",
             "1932-8036", "1932-8036"],
            "math.CO, cs.DM , stats",
            "info:eu-repo/semantics/article", "2011-05-10",
        ),
        (
            "oai:arXiv.org/9999.0001", "Fallback Record",
            [], [], "Klingon", ["urn:isbn:123"], [], None,
            "Dataset", "2011",
        ),
        (
            "oai:arXiv.org/0000.0002", "Image Record",
            None, None, None, None, None, None, "Image", None,
        ),
        (None, "skipped: no id", None, None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_arxiv_morph_spec_golden(spark):
    """The 121_morph.xml semantics (reference assets/arxiv/121_morph.xml
    + assets/maps/*.tsv) through the shipped spec: sprachliste lookup
    with raw-value fallback, formatliste with default, genre miss ->
    null, <unique/> ISSN filter, volume regexp, doi: prefix extraction,
    subject split+trim, description concat."""
    out = normalize_source(_arxiv_raw(spark), "arxiv")
    got = _row(out)
    assert len(got) == 3  # id-less row skipped
    a = next(v for v in got.values() if v["finc_record_id"] == "oai:arXiv.org/1234.5678")
    assert a["finc_id"].startswith("ai-121-")
    assert a["finc_source_id"] == "121"
    assert a["finc_format"] == "ElectronicArticle"
    assert a["rft_genre"] == "article"
    assert a["finc_mega_collection"] == ["Arxiv"]
    assert a["abstract"] == "Part one. Part two."
    assert [au["rft_au"] for au in a["authors"]] == ["Doe, Jane", "Roe, Richard"]
    assert a["languages"] == ["ger"]  # sprachliste: de -> ger (639-2/B)
    assert a["url"] == ["http://arxiv.org/abs/1234.5678"]
    assert a["doi"] == "10.1000/xyz.12"
    assert a["rft_issn"] == ["1932-8036"]  # matched + deduped
    assert a["rft_volume"] == "Vol 5"
    assert a["subjects"] == ["math.CO", "cs.DM", "stats"]
    assert a["rft_jtitle"] == "Arxiv"
    assert a["rft_pub"] == ["Arxiv"]
    assert a["rft_date"] == "2011-05-10"
    assert a["x_date"] == datetime.datetime(2011, 5, 10, 0, 0)

    b = next(v for v in got.values() if v["finc_record_id"] == "oai:arXiv.org/9999.0001")
    assert b["languages"] == ["Klingon"]  # lookup miss -> raw value (morph choose)
    assert b["finc_format"] == "ElectronicArticle"  # format default
    assert b["rft_genre"] is None  # genre map has no default
    assert b["url"] == []
    assert b["doi"] is None
    assert b["rft_issn"] == []
    assert b["rft_volume"] is None
    assert b["abstract"] is None
    assert b["x_date"] is None  # '2011T00:00:00Z' unparseable
    assert b["subjects"] is None

    c = next(v for v in got.values() if v["finc_record_id"] == "oai:arXiv.org/0000.0002")
    # formatliste's duplicate 'Image' key resolves last-wins (see spec
    # description) — Metafacture FileMap is HashMap-backed
    assert c["finc_format"] == "ElectronicVisualMedia"
    assert c["languages"] is None


def _datacite_raw(spark):
    spec = load_spec("datacite")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        (
            "oai:oai.datacite.org/1234", "A Dataset Title",
            ["First abstract", "Second abstract"], ["Doe, Jane"],
            "en",
            ["http://doi.org/x", "doi:10.5061/dryad.1234; extra"],
            ["International Journal of Communication; Vol 5 (2011); 29",
             "1932-8036"],
            ["Dryad", "Mirror Host"],
            "ecology, data",
            "info:eu-repo/semantics/article", "2011-05-10",
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_datacite_morph_spec_golden(spark):
    """The datacite morph variant (assets/datacite/morph.xml): finc-
    prefixed ids, jtitle regex from dc:source, publisher passthrough,
    greedy doi regexp, first-description abstract."""
    out = normalize_source(_datacite_raw(spark), "datacite")
    (a,) = (r.asDict() for r in out.collect())
    assert a["finc_id"].startswith("finc-datacite-")
    assert a["finc_source_id"] == "datacite"
    assert a["finc_mega_collection"] == ["Datacite"]
    assert a["abstract"] == "First abstract"  # first, not concat
    assert a["rft_jtitle"] == "International Journal of Communication"
    assert a["rft_volume"] == "Vol 5"
    assert a["rft_pub"] == ["Dryad", "Mirror Host"]
    assert a["languages"] == ["eng"]  # sprachliste: en -> eng
    assert a["doi"] == "10.5061/dryad.1234; extra"  # greedy '^doi:(.*)'
    assert a["rft_issn"] == ["1932-8036"]
    assert a["subjects"] == ["ecology", "data"]
    assert a["rft_genre"] == "article"
    assert a["finc_format"] == "ElectronicArticle"


# -- pqdt -------------------------------------------------------------


def _pqdt_raw(spark):
    spec = load_spec("pqdt")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        # full record: article type, valid date, jtitle/volume regexes,
        # doi + http-url split out of dc:identifier, upper-case lang
        (
            "oai:pqdtoai.proquest.com:10287/1234", "Dissertation A",
            ["Abstract one", "more"], ["Doe, Jane"], "EN",
            ["doi:10.1000/xyz", "http://pqdtopen.proquest.com/pubnum/1234.html"],
            ["1111-222X", "Some Journal; Vol 7 (2014); 12"],
            ["ProQuest"], "subj one|subj two ", "info:eu-repo/semantics/article",
            "2014-05-02",
        ),
        # unmapped type -> flux default format; bare-year date dropped
        # by the dateformat shape guard; inline 'sp' language fallback
        (
            "oai:pqdtoai.proquest.com:10287/77", "Dissertation B",
            None, None, "SP", [], [], [], None, "Dissertation/Thesis", "2014",
        ),
        # language neither in sprachliste nor the inline map: verbatim
        (
            "oai:pqdtoai.proquest.com:10287/78", "Dissertation C",
            None, None, "Klingon", [], [], [], None, None, None,
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_pqdt_spec_golden(spark):
    import base64

    out = normalize_source(_pqdt_raw(spark), "pqdt")
    got = _row(out)

    def fid(oid):
        b64 = base64.urlsafe_b64encode(oid.encode()).decode().rstrip("=")
        return f"ai-34-{b64}"

    a = got[fid("oai:pqdtoai.proquest.com:10287/1234")]
    assert a["finc_source_id"] == "34"
    assert a["finc_record_id"] == "oai:pqdtoai.proquest.com:10287/1234"
    assert a["finc_format"] == "ElectronicArticle"  # formatliste hit
    assert a["finc_mega_collection"] == [
        "ProQuest Open Access Dissertations and Theses (PQDT Open)"
    ]
    assert a["abstract"] == "Abstract one more"
    assert [au["rft_au"] for au in a["authors"]] == ["Doe, Jane"]
    assert a["languages"] == ["eng"]  # <case to=lower> + sprachliste
    assert a["url"] == ["http://pqdtopen.proquest.com/pubnum/1234.html"]
    assert a["doi"] == "10.1000/xyz"
    assert a["rft_issn"] == ["1111-222X"]
    assert a["rft_jtitle"] == "Some Journal"
    assert a["rft_volume"] == "Vol 7"
    assert a["rft_pub"] == ["ProQuest"]
    # morph ships the subject <trim/> commented out: trailing space kept
    assert a["subjects"] == ["subj one", "subj two "]
    assert a["rft_genre"] == "article"
    assert a["rft_date"] == "2014-05-02"
    assert a["x_date"] == datetime.datetime(2014, 5, 2)

    b = got[fid("oai:pqdtoai.proquest.com:10287/77")]
    assert b["finc_format"] == "ElectronicThesis"  # flux $[format] default
    assert b["languages"] == ["spa"]  # inline sp/pr/ke/ge/fe fallback
    assert b["rft_date"] is None and b["x_date"] is None  # bare year
    assert b["rft_genre"] is None

    c = got[fid("oai:pqdtoai.proquest.com:10287/78")]
    assert c["languages"] == ["Klingon"]  # choose falls to source value


# -- ijoc -------------------------------------------------------------


def _ijoc_raw(spark):
    spec = load_spec("ijoc")
    schema = ", ".join(f"{c} {t}" for c, t in spec["raw_columns"].items())
    rows = [
        (
            "oai:ojs.ijoc.org/article/1523", "Net Neutrality Article",
            ["An abstract"], ["Roe, Richard"], "English",
            ["http://ijoc.org/index.php/ijoc/article/view/1523"],
            ["International Journal of Communication; Vol 5 (2011); 29",
             "1932-8036"],
            ["USC Annenberg Press"], "a, b , c",
            "info:eu-repo/semantics/article", "2011-03-01",
        ),
        # unmapped type falls back to the raw value; bare-year date:
        # rft_date keeps it verbatim (no dateformat in this morph) but
        # the typed x_date nulls it; unmapped language passes through
        (
            "oai:ojs.ijoc.org/article/88", "Another", None, None, "Volapuk",
            [], [], [], None, "Article", "2011",
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_ijoc_spec_golden(spark):
    out = normalize_source(_ijoc_raw(spark), "ijoc")
    got = _row(out)

    a = got["finc-87-1523"]  # PLAIN numeric tail, finc- prefix — no b64
    assert a["finc_source_id"] == "87"
    assert a["finc_record_id"] == "1523"
    assert a["finc_format"] == "ElectronicArticle"
    assert a["finc_mega_collection"] == ["sid-87-col-intjcomm"]
    assert a["languages"] == ["eng"]  # sprachliste 'English' row, no lower
    assert a["url"] == ["http://ijoc.org/index.php/ijoc/article/view/1523"]
    assert a["rft_issn"] == ["1932-8036"]
    assert a["rft_jtitle"] == "International Journal of Communication"
    assert a["rft_volume"] == "Vol 5"
    assert a["rft_pub"] == ["USC Annenberg Press"]
    assert a["subjects"] == ["a", "b", "c"]  # split ',' WITH trim
    assert a["rft_genre"] == "article"
    assert a["rft_date"] == "2011-03-01"
    assert a["x_date"] == datetime.datetime(2011, 3, 1)
    assert "doi" not in a or a["doi"] is None  # no doi rule in this morph

    b = got["finc-87-88"]
    assert b["finc_format"] == "Article"  # fallback to raw type value
    assert b["languages"] == ["Volapuk"]
    assert b["rft_date"] == "2011"  # verbatim — no dateformat guard
    assert b["x_date"] is None  # '2011T00:00:00Z' does not cast
