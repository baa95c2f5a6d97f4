"""Export projections (SURVEY.md §2.1 K-sinks, §2.2 M12): the
solr5vu3-shaped discovery projection and the OpenURL context-object
builder, as pure ``select`` expression bundles.

Field surface per reference sources/base.py:174-213 (solr) and
openurl.py:31-172 (OpenURL); cited there, re-derived for Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def solr_export(df: DataFrame, fullrecord: bool = False) -> DataFrame:
    """Project intermediate-schema records to the discovery (solr5vu3)
    document shape (reference: span-export -o solr5vu3; field surface
    sources/base.py:174-213). Pure projection — stays in codegen."""
    first_author = F.element_at(F.col("authors"), 1)
    author_name = F.coalesce(
        first_author.getField("rft_au"),
        F.concat_ws(
            ", ",
            first_author.getField("rft_aulast"),
            first_author.getField("rft_aufirst"),
        ),
    )
    cols = [
        F.col("finc_id").alias("id"),
        F.lit("is").alias("recordtype"),
        F.coalesce(F.col("rft_atitle"), F.col("rft_btitle"), F.col("rft_jtitle")).alias(
            "title"
        ),
        F.coalesce(F.col("rft_atitle"), F.col("rft_btitle"), F.col("rft_jtitle")).alias(
            "title_full"
        ),
        F.substring(
            F.coalesce(F.col("rft_atitle"), F.col("rft_btitle"), F.col("rft_jtitle")),
            1,
            255,
        ).alias("title_short"),
        F.lower(
            F.coalesce(F.col("rft_atitle"), F.col("rft_btitle"), F.col("rft_jtitle"))
        ).alias("title_sort"),
        F.transform(
            F.coalesce(F.col("authors"), F.array().cast(df.schema["authors"].dataType)),
            lambda a: F.coalesce(
                a.getField("rft_au"),
                F.concat_ws(", ", a.getField("rft_aulast"), a.getField("rft_aufirst")),
            ),
        ).alias("author"),
        author_name.alias("author_sort"),
        F.regexp_extract(F.col("rft_date"), r"(\d{4})", 1).alias("publishDate"),
        F.col("x_labels").alias("institution"),
        F.col("finc_mega_collection").alias("mega_collection"),
        F.col("finc_source_id").alias("source_id"),
        F.col("finc_format").alias("format"),
        F.col("languages").alias("language"),
        F.col("url"),
        F.col("doi"),
    ]
    if "x_oa" in df.columns:
        # availability facet (solr5vu3 field surface, reference
        # bin/12756.py:137): every exported record is Online; open
        # access adds Free — how span-export surfaces x.oa downstream
        cols.append(
            F.when(
                F.coalesce(F.col("x_oa"), F.lit(False)),
                F.array(F.lit("Online"), F.lit("Free")),
            )
            .otherwise(F.array(F.lit("Online")))
            .alias("facet_avail")
        )
    if fullrecord:
        cols.append(F.to_json(F.struct(*df.columns)).alias("fullrecord"))
    return df.select(*cols)


def percent_encode(v: Column) -> Column:
    """Percent-encode an OpenURL value (reference openurl.py:164-170 /
    workflows/ai.py:557-559 urlencode the context object before
    serializing; raw '&'/'=' in a title would otherwise corrupt the
    k=v wire format).

    Canonical form: ``url_encode`` (java.net.URLEncoder — every byte
    outside [A-Za-z0-9._*-] escaped as uppercase %XX, UTF-8 for
    non-ASCII) normalized to pure percent-escapes: the '+' URLEncoder
    emits for space -> %20 (any literal '+' was already %2B by then)
    and the '*' it leaves raw -> %2A. Three codegen'd expressions —
    no UDF."""
    return F.replace(
        F.replace(F.url_encode(v), F.lit("+"), F.lit("%20")),
        F.lit("*"),
        F.lit("%2A"),
    )


def openurl_params(genre_col: str = "rft_genre", encode: bool = True) -> Column:
    """M12: IS record -> Z39.88 OpenURL key/value context object as a
    map<string,string> (reference: openurl.py:31-172). Genre-dependent
    field sets: journal/article vs book; first author only; DOI as
    rft_id=info:doi/...; url_ver/url_ctx_fmt constants. Values are
    percent-encoded unless ``encode=False`` (the reference's raw
    params dict; encoding happens at its serialization boundary)."""
    genre = F.coalesce(F.col(genre_col), F.lit("article"))
    is_book = genre.isin("book", "bookitem", "conference", "proceeding", "report")
    first_author = F.element_at(F.col("authors"), 1)

    def entry(k: str, v: Column) -> Column:
        out = percent_encode(v) if encode else v
        return F.when(v.isNotNull() & (v != ""), F.struct(F.lit(k).alias("key"), out.alias("value")))

    pairs = [
        entry("url_ver", F.lit("Z39.88-2004")),
        entry("ctx_ver", F.lit("Z39.88-2004")),
        entry(
            "rft_val_fmt",
            F.when(is_book, F.lit("info:ofi/fmt:kev:mtx:book")).otherwise(
                F.lit("info:ofi/fmt:kev:mtx:journal")
            ),
        ),
        entry("rft.genre", genre),
        entry("rft.atitle", F.col("rft_atitle")),
        entry("rft.btitle", F.when(is_book, F.col("rft_btitle"))),
        entry("rft.jtitle", F.when(~is_book, F.col("rft_jtitle"))),
        entry("rft.date", F.col("rft_date")),
        entry("rft.volume", F.col("rft_volume")),
        entry("rft.issue", F.col("rft_issue")),
        entry("rft.spage", F.col("rft_spage")),
        entry("rft.epage", F.col("rft_epage")),
        entry("rft.pages", F.col("rft_pages")),
        entry("rft.issn", F.element_at(F.col("rft_issn"), 1)),
        entry("rft.isbn", F.element_at(F.col("rft_isbn"), 1)),
        entry("rft.aulast", first_author.getField("rft_aulast")),
        entry("rft.aufirst", first_author.getField("rft_aufirst")),
        entry("rft.au", first_author.getField("rft_au")),
        entry("rft_id", F.when(F.col("doi").isNotNull(), F.concat(F.lit("info:doi/"), F.col("doi")))),
    ]
    kvs = F.array_compact(F.array(*pairs))
    return F.map_from_entries(kvs)


def openurl_query_string(genre_col: str = "rft_genre", encode: bool = True) -> Column:
    """M12 serialized form: the context object as a canonical
    key-sorted query string, values percent-encoded (reference
    workflows/ai.py:557-559). Built directly as an array of 'k=v'
    strings -> sort_array -> concat_ws. All three are lambda-free
    codegen expressions: array_sort/array_compact/transform plan as
    HOFs with INTERPRETED lambda comparators (measured ~10x slower on
    150K rows); sort_array's null-first ordering plus concat_ws's
    null-skipping compose to the same compact-sort-join. Key order ==
    string order because no key is a prefix of another."""
    genre = F.coalesce(F.col(genre_col), F.lit("article"))
    is_book = genre.isin("book", "bookitem", "conference", "proceeding", "report")
    first_author = F.element_at(F.col("authors"), 1)

    def entry(k: str, v: Column) -> Column:
        out = percent_encode(v) if encode else v
        return F.when(v.isNotNull() & (v != ""), F.concat(F.lit(k + "="), out))

    pairs = [
        entry("url_ver", F.lit("Z39.88-2004")),
        entry("ctx_ver", F.lit("Z39.88-2004")),
        entry(
            "rft_val_fmt",
            F.when(is_book, F.lit("info:ofi/fmt:kev:mtx:book")).otherwise(
                F.lit("info:ofi/fmt:kev:mtx:journal")
            ),
        ),
        entry("rft.genre", genre),
        entry("rft.atitle", F.col("rft_atitle")),
        entry("rft.btitle", F.when(is_book, F.col("rft_btitle"))),
        entry("rft.jtitle", F.when(~is_book, F.col("rft_jtitle"))),
        entry("rft.date", F.col("rft_date")),
        entry("rft.volume", F.col("rft_volume")),
        entry("rft.issue", F.col("rft_issue")),
        entry("rft.spage", F.col("rft_spage")),
        entry("rft.epage", F.col("rft_epage")),
        entry("rft.pages", F.col("rft_pages")),
        entry("rft.issn", F.element_at(F.col("rft_issn"), 1)),
        entry("rft.isbn", F.element_at(F.col("rft_isbn"), 1)),
        entry("rft.aulast", first_author.getField("rft_aulast")),
        entry("rft.aufirst", first_author.getField("rft_aufirst")),
        entry("rft.au", first_author.getField("rft_au")),
        entry(
            "rft_id",
            F.when(
                F.col("doi").isNotNull(), F.concat(F.lit("info:doi/"), F.col("doi"))
            ),
        ),
    ]
    return F.concat_ws("&", F.sort_array(F.array(*pairs)))


def solr_bulk_sink(
    df: DataFrame,
    url: str,
    batch_size: int = 1000,
    transport=None,
    commit: bool = True,
) -> None:
    """K1 Solr bulk indexer (reference: `solrbulk -w 8 -commit
    20000000`, docs/ai-update/README.md:23): serialize each row to a
    JSON doc and POST in batches from every partition concurrently —
    writer parallelism IS the partition count (repartition upstream to
    choose the equivalent of `-w`).

    ``transport(url, payload: bytes) -> None`` is injectable for tests
    and alternative wire protocols; the default POSTs
    ``application/json`` arrays to ``<url>/update``. A final commit is
    issued once from the driver (the reference's deferred-commit mode).
    """
    if transport is None:

        def transport(u: str, payload: bytes) -> None:  # pragma: no cover
            import urllib.request

            req = urllib.request.Request(
                u, data=payload, headers={"Content-Type": "application/json"}
            )
            urllib.request.urlopen(req).read()

    docs = df.select(F.to_json(F.struct(*df.columns)).alias("doc"))

    def post_partition(rows) -> None:
        batch: list[str] = []
        for row in rows:
            batch.append(row.doc)
            if len(batch) >= batch_size:
                transport(url + "/update", ("[" + ",".join(batch) + "]").encode())
                batch = []
        if batch:
            transport(url + "/update", ("[" + ",".join(batch) + "]").encode())

    docs.foreachPartition(post_partition)
    if commit:
        transport(url + "/update?commit=true", b"[]")
