"""FIXTURES.md-shaped synthetic domain data for operator-level parity
tests (IS records, KBART holdings, filter configs, local-data rows)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F  # noqa: F401

from siskin_spark.schema import INTERMEDIATE_SCHEMA


def _rec(**kw):
    base = {f.name: None for f in INTERMEDIATE_SCHEMA.fields}
    base.update(version="0.9")
    base.update(kw)
    return tuple(base[f.name] for f in INTERMEDIATE_SCHEMA.fields)


def is_records(spark):
    rows = [
        _rec(
            finc_id="ai-49-a1", finc_record_id="a1", finc_source_id="49",
            finc_mega_collection=["Crossref General", "sid-49-col-gen"],
            rft_atitle="On Sorting Networks", rft_jtitle="J Algo",
            rft_date="1996-05-01", x_date=datetime.datetime(1996, 5, 1),
            rft_issn=["1111-2222"], rft_eissn=["3333-4444"],
            authors=[("Doe, J.", "J.", "Doe", None, None, None)],
            doi="10.1000/a1", subjects=["Computer Science"],
            languages=["eng"], x_labels=[], rft_genre="article",
            url=["https://example.org/a1"], x_fulltext="FULL TEXT HERE",
        ),
        _rec(
            finc_id="ai-49-a2", finc_record_id="a2", finc_source_id="49",
            finc_mega_collection=["Crossref General"],
            rft_atitle="Hash Joins Revisited", rft_jtitle="J Algo",
            rft_date="2001", x_date=datetime.datetime(2001, 1, 1),
            rft_issn=["1111-2222"], doi="10.1000/A1",  # same DOI, different case
            subjects=["Computer Science"], x_labels=[], rft_genre="article",
        ),
        _rec(
            finc_id="ai-28-b1", finc_record_id="b1", finc_source_id="28",
            finc_mega_collection=["DOAJ Directory of Open Access Journals"],
            rft_atitle="Open Music Theory", rft_date="2015-01-01",
            x_date=datetime.datetime(2015, 1, 1),
            rft_issn=["5555-6666"], doi="10.2000/b1",
            subjects=["Music", "Theory"], x_labels=[], rft_genre="article",
        ),
        _rec(
            finc_id="ai-55-c1", finc_record_id="c1", finc_source_id="55",
            finc_mega_collection=["JSTOR Music Archive", "sid-55-col-music"],
            rft_btitle="The Baroque Violin", rft_date="1980",
            x_date=datetime.datetime(1980, 6, 15),
            rft_issn=["7777-8888"], rft_isbn=["978-3-16-148410-0"],
            subjects=["Music"], x_labels=[], rft_genre="book",
            authors=[(None, "A.", "Smith", None, None, None)],
        ),
        _rec(
            finc_id="ai-55-c2", finc_record_id="c2", finc_source_id="55",
            finc_mega_collection=["JSTOR Music Archive"],
            rft_atitle="Late Quartets", rft_date="2024-01-01",
            x_date=datetime.datetime(2024, 1, 1),  # outside holdings window
            rft_issn=["7777-8888"], doi="10.3000/c2",
            subjects=["Music"], x_labels=[], rft_genre="article",
        ),
    ]
    return spark.createDataFrame(rows, INTERMEDIATE_SCHEMA)


_KBART_SCHEMA = (
    "file_uri string, publication_title string, print_identifier string,"
    "online_identifier string, date_first_issue_online date,"
    "date_last_issue_online date, embargo_info string,"
    "num_first_vol_online int, num_first_issue_online int,"
    "num_last_vol_online int, num_last_issue_online int"
)


def kbart_holdings(spark):
    # embargo_info column present-but-null everywhere, like a real
    # 32-column KBART export with no walls — attach_labels must work
    # WITHOUT `now` on this shape
    rows = [
        ("file:kbart_de15", "J Mus", "7777-8888", None,
         datetime.date(1950, 1, 1), datetime.date(2000, 12, 31),
         None, None, None, None, None),
        ("file:kbart_de15", "J Algo", "1111-2222", "3333-4444",
         datetime.date(1990, 1, 1), None, None, None, None, None, None),
        ("file:kbart_de14", "J Open", "5555-6666", None, None, None,
         None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, _KBART_SCHEMA)


def kbart_holdings_embargo(spark):
    """Walls + volume/issue bounds (reference KBART semantics,
    jstor.py:546-580): R1Y moving wall, P2Y only-recent, and a
    (vol 5 iss 2) .. (vol 10 iss 3) window."""
    rows = [
        # R1Y: the most recent year is NOT available
        ("file:kbart_emb", "J R", "1000-0001", None, None, None,
         "R1Y", None, None, None, None),
        # P2Y: ONLY the most recent two years are available
        ("file:kbart_emb", "J P", "1000-0002", None, None, None,
         "P2Y", None, None, None, None),
        # volume/issue bounds, no dates, no embargo
        ("file:kbart_emb", "J V", "1000-0003", None, None, None,
         None, 5, 2, 10, 3),
    ]
    return spark.createDataFrame(rows, _KBART_SCHEMA)


FILTER_CONFIG = {
    # FIXTURES.md §6 shapes: holdings-bearing AND branch + plain OR branch
    "DE-15": {
        "or": [
            {
                "and": [
                    {"source": ["55"]},
                    {"collection": ["JSTOR Music Archive", "sid-55-col-music"]},
                    {"holdings": {"files": ["file:kbart_de15"]}},
                ]
            },
            {"and": [{"source": ["28"]},
                     {"collection": ["DOAJ Directory of Open Access Journals"]}]},
        ]
    },
    "DE-14": {"and": [{"source": ["49"]}, {"issn": {"list": ["3333-4444"]}}]},
    "FID-BBI-DE-23": {"and": [{"source": ["28", "55"]},
                              {"subject": ["Music", "Music education"]}]},
}
