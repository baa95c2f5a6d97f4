"""Harvest connectors (SURVEY.md §2.1 S3/S4): OAI-PMH resumption-token
loop and paged REST harvesting with a retry budget.

These run DRIVER-side by design — exactly as the reference does
(metha-sync / the hand-rolled loop in siskin sources/oai.py:39-124,
OSF's paged loop with rate-limit sleeps osf.py:68-160). Harvesting is
sequential, politeness-limited IO against a single remote endpoint;
fanning it across executors gains nothing and loses the retry/backoff
bookkeeping. The harvested pages land as files, and Spark picks them
up from there (streaming/incremental.py availableNow, or read_ndjson)
— parallelism belongs to the processing, not the polite crawl.

``fetch`` is injected (url -> bytes/str) so tests run hermetically and
deployments can plug caching/authentication (the reference's URL cache,
utils.py:262-371, is a fetch decorator here).
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator

_TOKEN_RE = re.compile(
    r"<resumptionToken[^>]*>([^<]+)</resumptionToken>"
)


def oai_harvest(
    fetch: Callable[[str], str],
    base_url: str,
    metadata_prefix: str = "oai_dc",
    set_spec: str | None = None,
    from_date: str | None = None,
    until_date: str | None = None,
    max_pages: int = 100_000,
) -> Iterator[str]:
    """Yield raw OAI-PMH ListRecords response pages, following
    resumptionToken until exhausted (protocol per the public OAI-PMH
    2.0 spec; loop shape mirrors the reference's hand-rolled client).

    Dates slice the harvest (`from`/`until`) so reruns are incremental
    — pair with pipeline date snapping for memoized harvest stages.
    """
    params = [f"verb=ListRecords&metadataPrefix={metadata_prefix}"]
    if set_spec:
        params.append(f"set={set_spec}")
    if from_date:
        params.append(f"from={from_date}")
    if until_date:
        params.append(f"until={until_date}")
    url = f"{base_url}?{'&'.join(params)}"
    for _ in range(max_pages):
        page = fetch(url)
        yield page
        m = _TOKEN_RE.search(page)
        if not m or not m.group(1).strip():
            return
        url = f"{base_url}?verb=ListRecords&resumptionToken={m.group(1).strip()}"
    raise RuntimeError(f"exceeded max_pages={max_pages} without final page")


def webdav_share_url(server: str, filename: str) -> str:
    """S11 Owncloud/Nextcloud public-share pickup URL (reference:
    ios.py:63-80 — ``curl -u share_id:pw https://host/public.php/
    webdav/<file>``). The share id/password travel as HTTP basic auth
    in the injected fetch, never in the URL."""
    return f"{server.rstrip('/')}/public.php/webdav/{filename.lstrip('/')}"


def webdav_basic_auth_header(share_id: str, share_pw: str = "") -> dict[str, str]:
    """Authorization header for a public share (share id as username —
    the Owncloud public-share convention the reference relies on)."""
    import base64

    token = base64.b64encode(f"{share_id}:{share_pw}".encode()).decode()
    return {"Authorization": f"Basic {token}"}


_DAV_HREF_RE = re.compile(r"<(?:\w+:)?href>([^<]+)</(?:\w+:)?href>")


def webdav_list(fetch: Callable[[str], str], url: str) -> list[str]:
    """Parse a PROPFIND multistatus response into member hrefs (the
    directory-pickup variant of S11; ``fetch`` must issue PROPFIND with
    Depth: 1 — injected, like every other transport here)."""
    body = fetch(url)
    return [h for h in _DAV_HREF_RE.findall(body) if not h.rstrip().endswith("/")]


def paged_rest_harvest(
    fetch: Callable[[str], str],
    url_for_page: Callable[[int], str],
    is_last_page: Callable[[str], bool],
    max_retries: int = 3,
    backoff_s: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
    max_pages: int = 1_000_000,
) -> Iterator[str]:
    """Yield REST API pages with a per-page retry budget and
    exponential backoff (reference: OSF loop, osf.py:68-160 — retry
    budget, rate-limit sleeps, page counter).

    ``is_last_page(body)`` decides termination (empty result list /
    missing next link — API-specific, so injected).
    """
    page = 0
    while page < max_pages:
        body = None
        for attempt in range(max_retries + 1):
            try:
                body = fetch(url_for_page(page))
                break
            except Exception:
                if attempt == max_retries:
                    raise
                sleep(backoff_s * (2**attempt))
        assert body is not None
        yield body
        if is_last_page(body):
            return
        page += 1
    raise RuntimeError(f"exceeded max_pages={max_pages}")
