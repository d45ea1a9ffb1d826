"""Parse strategies over canned fetch bodies — all pure Catalyst.

The reference dispatches one of five extraction strategies per site
(bs4 "main"/"container": reference src/crawlers/async_bs4.py:96-272 +
301-310; api "dict"/"list": src/crawlers/async_api.py:69-152; rss:
src/crawlers/async_rss.py:19-72). Here each strategy is a DataFrame
transformation over (config x payload) rows:

- HTML extraction uses ``regexp_extract_all`` + ``posexplode`` (the
  fixtures' HTML is regular; no HTML parser lives in this container and
  none is needed for the declared selector shapes)
- the container strategy's zip-truncate-to-shortest (quirk 4, reference
  async_bs4.py:240) is reproduced by inner-joining the four posexploded
  element lists on ``pos``
- API payloads go through ``from_json`` + ``explode``; the falsy-location
  -> site-default rule (reference async_api.py:142-144) is a
  when(loc is null or loc='') expression
- missing optional fields become the literal "NaN" (F11)
- pagination is synthesized with ``explode(sequence(start, pages))``
  (W4) — the reference's page loop (async_bs4.py:349). NOTE quirk 1:
  the reference *builds* the page URL but always fetches the bare
  template; this engine fetches the indexed page URL (intended
  semantics), and equivalence fixtures use pages_to_crawl=1 where both
  agree.

Every row carries the deterministic ordering key (config_idx, page, pos)
— the reference's config-file-order contract (quirk 7, src/crawler.py:
322-349) made explicit as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOB_COLS = ["config_idx", "page", "pos", "title", "link", "description", "location", "source_kind"]

# DEFAULT selector patterns; each site may override them in the config dim
# (SITE_CONFIGS.sel_* / tag_* columns), mirroring the reference's per-site
# Bs4ElementPath (src/models.py:40-54) and API tag paths
# (src/crawlers/async_api.py:19-27). Selector resolution is per ROW
# (coalesce(config column, default)), so sites with different selectors
# parse in ONE pass — no per-site code. Rows arrive grouped by site, so
# Spark's regex cache (keyed on the last-seen pattern) stays warm.
P_JOB = r'<div class="job">(.*?)</div>'
P_TITLE = r'<h2 class="title">(.*?)</h2>'
P_LINK = r'<a class="lnk" href="(.*?)"'
P_LOC = r'<span class="loc">(.*?)</span>'
P_DESC = r'<p class="desc">(.*?)</p>'
P_ITEM = r"(?s)<item>(.*?)</item>"

SELECTOR_COLS = ["sel_job", "sel_title", "sel_link", "sel_loc", "sel_desc"]
TAG_COLS = ["tag_title", "tag_link", "tag_desc", "tag_loc"]


def _with_selector_cols(configs: DataFrame) -> DataFrame:
    """Ensure the per-site selector/tag columns exist (null = defaults) so
    callers with minimal configs keep working."""
    for c in SELECTOR_COLS + TAG_COLS:
        if c not in configs.columns:
            configs = configs.withColumn(c, F.lit(None).cast("string"))
    return configs


def _sel(name: str, default: str):
    return F.coalesce(F.col(name), F.lit(default))


def _rex1(col, pattern_col):
    """regexp_extract(col, pat, 1) for a COLUMN pattern (regexp_extract only
    takes literal patterns; regexp_extract_all takes columns). Matches
    regexp_extract's no-match contract: '' instead of null."""
    # F.get (not getItem): ANSI mode throws on out-of-bounds index
    return F.coalesce(
        F.get(F.regexp_extract_all(col, pattern_col, 1), 0), F.lit("")
    )


def _nan_if_empty(col):
    return F.when((col.isNull()) | (col == ""), F.lit("NaN")).otherwise(col)


def paginate(configs: DataFrame) -> DataFrame:
    """One row per (config, page) with the fetch URL — W4 pagination."""
    return configs.withColumn(
        "page", F.explode(F.sequence(F.col("start_point"), F.col("pages_to_crawl")))
    ).withColumn(
        "fetch_url",
        F.when(F.col("source_kind") == "bs4", F.concat(F.col("url"), F.col("page"))).otherwise(
            F.col("url")
        ),
    )


def _with_bodies(configs: DataFrame, payloads: DataFrame) -> DataFrame:
    pages = paginate(configs)
    return pages.join(
        payloads.withColumnRenamed("url", "fetch_url"), "fetch_url", "left"
    ).filter(F.col("status") == 200)  # P6: non-200 logged and skipped


def parse_bs4_main(configs: DataFrame, payloads: DataFrame) -> DataFrame:
    """P1: per-job-element projection. Missing title/link aborts the whole
    page (reference ValueError, async_bs4.py:140-150); missing
    description/location -> "NaN"."""
    src = _with_bodies(
        _with_selector_cols(configs).filter(
            (F.col("source_kind") == "bs4") & (F.col("strategy") == "main")
        ),
        payloads,
    )
    jobs = src.select(
        "config_idx",
        "page",
        "name",
        *SELECTOR_COLS,
        F.posexplode(
            F.regexp_extract_all(F.col("body"), _sel("sel_job", P_JOB), 1)
        ).alias("pos", "job"),
    )
    fields = jobs.select(
        "config_idx",
        "page",
        "pos",
        _rex1(F.col("job"), _sel("sel_title", P_TITLE)).alias("title"),
        _rex1(F.col("job"), _sel("sel_link", P_LINK)).alias("href"),
        _rex1(F.col("job"), _sel("sel_desc", P_DESC)).alias("description"),
        _rex1(F.col("job"), _sel("sel_loc", P_LOC)).alias("location"),
        "name",
    )
    # page-level abort: any job with missing title/link kills the page
    bad_pages = (
        fields.filter((F.col("title") == "") | (F.col("href") == ""))
        .select("config_idx", "page")
        .distinct()
    )
    good = fields.join(bad_pages, ["config_idx", "page"], "left_anti")
    return good.select(
        "config_idx",
        "page",
        "pos",
        "title",
        F.concat(F.col("name"), F.col("href")).alias("link"),  # F17 relative-link absolutization
        _nan_if_empty(F.col("description")).alias("description"),
        _nan_if_empty(F.col("location")).alias("location"),
        F.lit("bs4").alias("source_kind"),
    )


def parse_bs4_container(configs: DataFrame, payloads: DataFrame) -> DataFrame:
    """P2/J4: four parallel element lists zipped positionally, truncating to
    the shortest (inner join on pos reproduces the reference's zip)."""
    src = _with_bodies(
        _with_selector_cols(configs).filter(
            (F.col("source_kind") == "bs4") & (F.col("strategy") == "container")
        ),
        payloads,
    )
    base = src.select(
        "config_idx",
        "page",
        "name",
        F.regexp_extract_all("body", _sel("sel_title", P_TITLE), 1).alias("titles"),
        F.regexp_extract_all("body", _sel("sel_link", P_LINK), 1).alias("links"),
        F.regexp_extract_all("body", _sel("sel_desc", P_DESC), 1).alias("descs"),
        F.regexp_extract_all("body", _sel("sel_loc", P_LOC), 1).alias("locs"),
    )
    # all-or-nothing: any empty required list aborts the page (quirk 4)
    base = base.filter((F.size("titles") > 0) & (F.size("links") > 0))
    keys = ["config_idx", "page"]
    t = base.select(*keys, "name", F.posexplode("titles").alias("pos", "title"))
    l = base.select(*keys, F.posexplode("links").alias("pos", "href"))
    d = base.select(*keys, F.posexplode("descs").alias("pos", "description"))
    o = base.select(*keys, F.posexplode("locs").alias("pos", "location"))
    joined = t.join(l, keys + ["pos"]).join(d, keys + ["pos"]).join(o, keys + ["pos"])
    return joined.select(
        "config_idx",
        "page",
        "pos",
        _nan_if_empty(F.col("title")).alias("title"),
        F.concat(F.col("name"), F.col("href")).alias("link"),
        _nan_if_empty(F.col("description")).alias("description"),
        _nan_if_empty(F.col("location")).alias("location"),
        F.lit("bs4").alias("source_kind"),
    )


_API_LIST_SCHEMA = "array<map<string,string>>"
_API_DICT_SCHEMA = "struct<data:array<map<string,string>>>"


def parse_api(configs: DataFrame, payloads: DataFrame) -> DataFrame:
    """P3: JSON-tag projection; dict vs list dispatch on class_json
    (reference async_api.py:77-84). Falsy location -> site default."""
    src = _with_bodies(
        _with_selector_cols(configs).filter(F.col("source_kind") == "api"), payloads
    )
    arr = F.when(
        F.col("strategy") == "dict", F.from_json(F.col("body"), _API_DICT_SCHEMA)["data"]
    ).otherwise(F.from_json(F.col("body"), _API_LIST_SCHEMA))
    jobs = src.select(
        "config_idx", "page", *TAG_COLS, F.posexplode(arr).alias("pos", "job")
    )
    # JSON-tag paths are per-site config (reference async_api.py:19-27)
    job = F.col("job")
    loc = F.element_at(job, _sel("tag_loc", "locF"))
    return jobs.select(
        "config_idx",
        "page",
        "pos",
        F.coalesce(F.element_at(job, _sel("tag_title", "titleF")), F.lit("NaN")).alias("title"),
        F.coalesce(F.element_at(job, _sel("tag_link", "linkF")), F.lit("NaN")).alias("link"),
        F.coalesce(F.element_at(job, _sel("tag_desc", "descF")), F.lit("NaN")).alias("description"),
        F.when((loc.isNull()) | (loc == ""), F.lit("Worldwide")).otherwise(loc).alias("location"),
        F.lit("api").alias("source_kind"),
    )


def _rss_field(tag: str):
    """Feedparser-ish field extraction: case-insensitive tags, attributes
    inside the opening tag, optional CDATA wrapper, surrounding whitespace
    trimmed — covers the real-feed shapes the fixture regexes did not
    (SURVEY S6 was 'partial' for exactly this)."""
    pat = rf"(?is)<{tag}(?:\s[^>]*)?>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</{tag}\s*>"
    return F.regexp_extract("item", pat, 1)


def parse_rss(configs: DataFrame, payloads: DataFrame) -> DataFrame:
    """RSS items via regexp extraction per <item>/<entry> block —
    case-insensitive, attribute- and CDATA-tolerant, with the Atom
    ``<link href="..."/>`` form as a fallback for <link>. The reference's
    wrong-attribute guard (quirk 3: title/link/description presence tested
    via hasattr(location_tag), async_rss.py:36-48) is NOT reproduced here —
    the clean engine guards each field on itself; the oracle-simulator test
    pins the intended semantics."""
    src = _with_bodies(configs.filter(F.col("source_kind") == "rss"), payloads)
    item_pat = r"(?is)<(?:item|entry)(?:\s[^>]*)?>(.*?)</(?:item|entry)\s*>"
    items = src.select(
        "config_idx",
        "page",
        F.posexplode(F.regexp_extract_all("body", F.lit(item_pat), 1)).alias("pos", "item"),
    )
    link = F.when(_rss_field("link") != "", _rss_field("link")).otherwise(
        F.regexp_extract("item", r'(?is)<link\s[^>]*href\s*=\s*"(.*?)"', 1)
    )
    return items.select(
        "config_idx",
        "page",
        "pos",
        _nan_if_empty(_rss_field("title")).alias("title"),
        _nan_if_empty(link).alias("link"),
        _nan_if_empty(_rss_field("description")).alias("description"),
        _nan_if_empty(_rss_field("location")).alias("location"),
        F.lit("rss").alias("source_kind"),
    )


def parse_all(configs: DataFrame, payloads: DataFrame) -> DataFrame:
    """U1-U3: union of all strategies, ordered by the explicit
    (config_idx, page, pos) key — the reference's asyncio.gather
    config-order contract as data."""
    parts = [
        parse_bs4_main(configs, payloads),
        parse_bs4_container(configs, payloads),
        parse_api(configs, payloads),
        parse_rss(configs, payloads),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(JOB_COLS)


def follow_links(jobs: DataFrame, payloads: DataFrame, pattern: str = P_DESC,
                 default: str = "NaN") -> DataFrame:
    """S3/S4: depth-1 detail-page fetch — join each job's link against the
    payload bodies and extract the description; non-200/missing -> default
    (reference src/utils/FollowLink.py:8-39)."""
    detail = payloads.select(
        F.col("url").alias("link"),
        F.col("status").alias("_st"),
        F.col("body").alias("_body"),
    )
    joined = jobs.join(detail, "link", "left")
    extracted = F.regexp_extract("_body", pattern, 1)
    return joined.withColumn(
        "description",
        F.when(
            (F.col("_st") == 200) & (extracted != ""), extracted
        ).otherwise(F.lit(default)),
    ).drop("_st", "_body")


def parse_sitemap(bodies: DataFrame) -> DataFrame:
    """Sitemap XML -> (host, kind, loc, lastmod): 'url' rows from <urlset>
    docs, 'index' rows from <sitemapindex> docs (their loc is a CHILD
    sitemap to fetch next — same fetch dataflow pointed at it, like
    robots discovery). Regexp block extraction in the parse_rss style:
    case-insensitive, whitespace-sloppy, <lastmod> optional. Seed
    DISCOVERY for the frontier — the reference seeds from hand-written
    site configs (src/resources/*) and has no sitemap support. Map-side
    only (posexplode + regexp; one narrow explode per block kind)."""

    def blocks(tag: str, kind: str) -> DataFrame:
        pat = rf"(?is)<{tag}(?:\s[^>]*)?>(.*?)</{tag}\s*>"
        loc = F.trim(F.regexp_extract("block", r"(?is)<loc(?:\s[^>]*)?>\s*(.*?)\s*</loc\s*>", 1))
        lastmod = F.trim(
            F.regexp_extract("block", r"(?is)<lastmod(?:\s[^>]*)?>\s*(.*?)\s*</lastmod\s*>", 1)
        )
        return (
            bodies.select(
                "host",
                F.explode(F.regexp_extract_all("body", F.lit(pat), 1)).alias("block"),
            )
            .select(
                "host",
                F.lit(kind).alias("kind"),
                loc.alias("loc"),
                F.when(lastmod != "", lastmod).alias("lastmod"),
            )
            .filter(F.col("loc") != "")
        )

    # <sitemap> blocks only occur inside <sitemapindex>, <url> only inside
    # <urlset>, so block-level extraction needs no outer-document dispatch
    return blocks("url", "url").unionByName(blocks("sitemap", "index"))
