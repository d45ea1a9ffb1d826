"""Reference-faithful strategy simulator — the QUIRKY contract.

The clean engine (sources/strategies.py) implements the *intended*
semantics; the reference's observable behavior deviates in documented
ways (SURVEY.md §3.4 quirks ledger). This single-threaded simulator
reproduces the reference's behavior verbatim so tests can pin exactly
where the two contracts agree and where they deliberately differ:

- quirk 2: RSS dedupe probes the literal tag name, not the link
  (reference: src/crawlers/async_rss.py:40-42) — so RSS rows are never
  pre-fetch-deduped against the store; only the sink dedupes them.
- quirk 3: RSS field guards test the wrong attribute — title/link/
  description presence is guarded by hasattr(entry, location_tag)
  (src/crawlers/async_rss.py:36-48): a feed item WITHOUT the location
  field yields all-"NaN" title/link/description.
- quirk 4: the container strategy zip-truncates to the shortest element
  list (src/crawlers/async_bs4.py:240) while the main strategy hard-fails
  the page on missing title/link (:140-150). [Both reproduced by the
  clean engine too — same contract.]
- quirk 1: the bs4 page loop builds an indexed page URL but always
  fetches the bare template (src/crawler.py:310-312 closes over
  config.url) — so pages_to_crawl=N refetches the SAME body N times.
  The clean engine fetches the indexed page (intended semantics); the
  contracts agree only when pages_to_crawl == start_point.
"""

from __future__ import annotations

import re

P_JOB = r'<div class="job">(.*?)</div>'
P_TITLE = r'<h2 class="title">(.*?)</h2>'
P_LINK = r'<a class="lnk" href="(.*?)"'
P_LOC = r'<span class="loc">(.*?)</span>'
P_DESC = r'<p class="desc">(.*?)</p>'
P_ITEM = r"(?s)<item>(.*?)</item>"


def _first(pattern: str, text: str) -> str:
    m = re.search(pattern, text, re.S)
    return m.group(1) if m else ""


def simulate_bs4_main(cfg: dict, bodies: dict[str, str]) -> list[dict]:
    """Quirk 1: every page iteration fetches the BARE template URL."""
    rows: list[dict] = []
    for page in range(cfg["start_point"], cfg["pages_to_crawl"] + 1):
        body = bodies.get(cfg["url"])  # NOT cfg["url"] + str(page)
        if body is None:
            continue
        jobs = re.findall(P_JOB, body, re.S)
        page_rows = []
        ok = True
        for pos, job in enumerate(jobs):
            title, href = _first(P_TITLE, job), _first(P_LINK, job)
            if not title or not href:
                ok = False  # ValueError aborts the whole page
                break
            page_rows.append(
                {
                    "page": page,
                    "pos": pos,
                    "title": title,
                    "link": cfg["name"] + href,
                    "description": _first(P_DESC, job) or "NaN",
                    "location": _first(P_LOC, job) or "NaN",
                }
            )
        if ok:
            rows.extend(page_rows)
    return rows


def simulate_rss(cfg: dict, bodies: dict[str, str]) -> list[dict]:
    """Quirk 3: presence of EVERY field is guarded by the location tag."""
    body = bodies.get(cfg["url"], "")
    rows = []
    for pos, item in enumerate(re.findall(P_ITEM, body)):
        has_location = re.search(r"<location>(.*?)</location>", item) is not None
        def field(tag: str) -> str:
            if not has_location:  # wrong-attribute guard
                return "NaN"
            return _first(rf"<{tag}>(.*?)</{tag}>", item) or "NaN"
        rows.append(
            {
                "page": 1,
                "pos": pos,
                "title": field("title"),
                "link": field("link"),
                "description": field("description"),
                "location": _first(r"<location>(.*?)</location>", item) or "NaN",
            }
        )
    return rows


def simulate_rss_seen_probe(link_tag: str = "link") -> str:
    """Quirk 2: the value probed against the seen store is the literal
    tag NAME — returns what the reference actually checks."""
    return link_tag


def simulate_embed_prefix(text: str) -> str:
    """Quirk 8 (SURVEY §3.4): the reference embeds PASSAGES with the
    ``"query: "`` prefix — embed_latest_crawled_data.py:228 calls
    query_e5_format, while passage_e5_format (e5_base_v2_utils.py:85-89)
    is defined but NEVER called. The clean engine uses the intended
    ``"passage: "`` prefix (embeddings_pipeline.py), a documented
    [DIVERGE] pinned by test_strategy_quirks."""
    return f"query: {text}"


def simulate_container(cfg: dict, bodies: dict[str, str]) -> list[dict]:
    """Quirk 4: zip truncation to the shortest of the four element lists."""
    rows = []
    for page in range(cfg["start_point"], cfg["pages_to_crawl"] + 1):
        body = bodies.get(f"{cfg['url']}{page}") or bodies.get(cfg["url"])
        if body is None:
            continue
        titles = re.findall(P_TITLE, body, re.S)
        links = re.findall(P_LINK, body, re.S)
        descs = re.findall(P_DESC, body, re.S)
        locs = re.findall(P_LOC, body, re.S)
        if not titles or not links:
            continue  # all-or-nothing ValueError
        for pos, (t, h, d, lo) in enumerate(zip(titles, links, descs, locs)):
            rows.append(
                {
                    "page": page,
                    "pos": pos,
                    "title": t or "NaN",
                    "link": cfg["name"] + h,
                    "description": d or "NaN",
                    "location": lo or "NaN",
                }
            )
    return rows
