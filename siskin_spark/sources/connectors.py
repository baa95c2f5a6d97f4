"""Query-pushdown scan connectors (SURVEY.md §2.1 S5/S6/S7, F7):
Solr cursor export, one-shot Elasticsearch search, windowed SRU fetch.

The reference pushes its filters to the server at scan time — solrdump
``-q 'collection_details:(...)'`` (sources/olc.py:76-99), an ES
``_search?q=...&size=N`` GET (sources/lissa.py:60-87), and an SRU CQL
selector fetched in record windows (sources/kxp.py:53-98, srufetch).
That is F7: the predicate never sees the engine; only matching docs
cross the wire.

Like harvest.py, these run DRIVER-side with an injected
``fetch(url) -> str`` — polite, sequential, retry-friendly IO against
one endpoint; the harvested pages land as files/frames and Spark
parallelism applies from there. At 100 TB the pushed-down query IS the
partition pruning: a full unfiltered Solr/ES dump is the degenerate
case these connectors exist to avoid.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from urllib.parse import quote


def solr_dump(
    fetch: Callable[[str], str],
    server: str,
    q: str = "*:*",
    fl: str | None = None,
    rows: int = 1000,
    sort: str = "id asc",
    max_pages: int = 1_000_000,
) -> Iterator[dict]:
    """Solr deep-paging export with the query pushed to the server
    (reference: solrdump, olc.py:76-99). Uses cursorMark (the public
    Solr deep-paging protocol solrdump implements): stable sort +
    cursor token per page, terminating when the cursor stops moving.
    Yields individual docs."""
    cursor = "*"
    base = server.rstrip("/")
    for _ in range(max_pages):
        url = (
            f"{base}/select?q={quote(q)}&rows={rows}"
            f"&sort={quote(sort)}&cursorMark={quote(cursor)}&wt=json"
        )
        if fl:
            url += f"&fl={quote(fl)}"
        body = json.loads(fetch(url))
        yield from body.get("response", {}).get("docs", [])
        nxt = body.get("nextCursorMark")
        if not nxt or nxt == cursor:
            return
        cursor = nxt
    raise RuntimeError(f"exceeded max_pages={max_pages}")


def es_search(
    fetch: Callable[[str], str],
    server: str,
    q: str,
    size: int = 1000,
    from_: int = 0,
) -> list[dict]:
    """S6 one-shot Elasticsearch search (reference: lissa.py:60-87 —
    a single ``_search?from=0&size=1000&q=...`` window). Returns the
    hit documents (``_source`` where present)."""
    url = f"{server.rstrip('/')}/_search?from={from_}&size={size}&q={quote(q)}"
    body = json.loads(fetch(url))
    hits = body.get("hits", {}).get("hits", [])
    return [h.get("_source", h) for h in hits]


def sru_harvest(
    fetch: Callable[[str], str],
    base_url: str,
    query: str,
    maximum_records: int = 100,
    record_schema: str = "marcxml",
    max_windows: int = 100_000,
) -> Iterator[str]:
    """S7 windowed SRU fetch (reference: kxp.py:53-98 via srufetch):
    CQL query pushed server-side, responses fetched in
    ``maximumRecords`` windows by advancing ``startRecord``. Yields raw
    searchRetrieve response XML pages — feed to sources/marcxml for
    the MARCXML payloads, mirroring the reference's
    ``srufetch | yaz-marcdump`` pipe."""
    import re

    start = 1
    for _ in range(max_windows):
        url = (
            f"{base_url.rstrip('/')}?version=1.2&operation=searchRetrieve"
            f"&query={quote(query)}&maximumRecords={maximum_records}"
            f"&startRecord={start}&recordSchema={record_schema}"
        )
        page = fetch(url)
        yield page
        # the window loop is driven by the server-reported total, NOT
        # by counting <record> tags (the MARCXML payload nests its own)
        m = re.search(r"<(?:\w+:)?numberOfRecords>(\d+)<", page)
        total = int(m.group(1)) if m else 0
        start += maximum_records
        if start > total:
            return
    raise RuntimeError(f"exceeded max_windows={max_windows}")
