"""URL canonicalization + hashing.

The reference builds links by naive string concat (reference:
src/crawlers/async_bs4.py:152 ``link = config.name + href``) and dedupes on
exact string equality (``ON CONFLICT (link)``, src/crawler.py:204). At
10^10-URL scale the engine instead canonicalizes before hashing so that
trivially-different spellings of one URL collapse:

- lowercase scheme + host
- strip fragment
- strip default port (http:80, https:443); keep explicit non-default ports
- empty path -> "/"
- query params sorted lexicographically; empty params dropped
- percent-encoding normalized per RFC 3986 §6.2.2 (r6): escape hex
  uppercased (%2f -> %2F), unreserved escapes decoded (%7E -> ~) —
  byte-different spellings of one URL collapse onto one seen-set entry

Everything is pure Catalyst (parse_url / split / array_sort / concat), so
canonicalization + xxhash64 stays inside whole-stage codegen — no Python in
the hot path. ``canonicalize_py`` is the plain-Python reference used by the
property tests and the oracle simulator.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PORTS = {"http": "80", "https": "443"}


# ---------------------------------------------------------------------------
# Catalyst expression builders
# ---------------------------------------------------------------------------


def pct_normalize_col(c: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, pure Catalyst:
    escape hex digits UPPERCASE (%2f -> %2F) and UNRESERVED escapes
    decoded (%41 -> A, %7E -> ~; unreserved = ALPHA / DIGIT / - . _ ~).
    Reserved escapes (%2F, %26, ...) are never decoded, so structure
    characters cannot leak into the path/query. Split on '%': every part
    after the first begins with a candidate 2-hex escape; a malformed
    escape is kept verbatim. Idempotent (decoded chars carry no '%';
    surviving escapes are already uppercase)."""
    parts = F.split(c, "%", -1)
    head = F.element_at(parts, 1)

    def fix(x):
        hx = F.upper(F.substring(x, 1, 2))
        valid = x.rlike("^[0-9A-Fa-f]{2}")
        v = F.conv(hx, 16, 10).cast("int")
        unres = (
            ((v >= 48) & (v <= 57))
            | ((v >= 65) & (v <= 90))
            | ((v >= 97) & (v <= 122))
            | v.isin(45, 46, 95, 126)
        )
        rest = F.substring(x, 3, 2_000_000_000)
        return F.when(valid & unres, F.concat(F.char(v), rest)).otherwise(
            F.when(valid, F.concat(F.lit("%"), hx, rest)).otherwise(
                F.concat(F.lit("%"), x)
            )
        )

    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    return F.concat(head, F.array_join(F.transform(tail, fix), ""))


def canon_url_col(url: Column) -> Column:
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    auth = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    is_default = ((proto == "http") & (port == "80")) | ((proto == "https") & (port == "443"))
    port_part = F.when((port != "") & ~is_default, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    raw_path = F.parse_url(url, F.lit("PATH"))
    path = pct_normalize_col(
        F.when(raw_path.isNull() | (raw_path == ""), F.lit("/")).otherwise(raw_path)
    )
    query = F.parse_url(url, F.lit("QUERY"))
    sorted_q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(pct_normalize_col(F.coalesce(query, F.lit(""))), "&", -1),
                lambda x: x != "",
            )
        ),
        "&",
    )
    q_part = F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit(""))
    return F.concat(proto, F.lit("://"), host, port_part, path, q_part)


def host_col(canon: Column) -> Column:
    return F.parse_url(canon, F.lit("HOST"))


def url_hash_col(canon: Column) -> Column:
    return F.xxhash64(canon)


def shard_col(url_hash: Column, n_shards: int) -> Column:
    return F.pmod(url_hash, F.lit(n_shards)).cast("int")


def with_canonical(df: DataFrame, url_col: str = "url", n_shards: int = 16) -> DataFrame:
    """Add canonical url/host/url_hash/shard columns in one narrow projection."""
    canon = canon_url_col(F.col(url_col))
    return (
        df.withColumn(url_col, canon)
        .withColumn("host", host_col(F.col(url_col)))
        .withColumn("url_hash", url_hash_col(F.col(url_col)))
        .withColumn("shard", shard_col(F.col("url_hash"), n_shards))
    )


# ---------------------------------------------------------------------------
# Plain-Python reference (tests + oracle simulator only; never in a Spark job)
# ---------------------------------------------------------------------------


_HEX = set("0123456789ABCDEF")


def pct_normalize_py(s: str) -> str:
    """Exact Python port of pct_normalize_col (oracle simulator + tests)."""
    parts = s.split("%")
    out = [parts[0]]
    for p in parts[1:]:
        hx = p[:2].upper()
        if len(p) >= 2 and hx[0] in _HEX and hx[1] in _HEX:
            v = int(hx, 16)
            if 48 <= v <= 57 or 65 <= v <= 90 or 97 <= v <= 122 or v in (45, 46, 95, 126):
                out.append(chr(v) + p[2:])
            else:
                out.append("%" + hx + p[2:])
        else:
            out.append("%" + p)
    return "".join(out)


def canonicalize_py(url: str) -> str:
    parts = urlsplit(url)
    proto = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = ""
    if parts.port is not None and str(parts.port) != DEFAULT_PORTS.get(proto):
        port = f":{parts.port}"
    path = pct_normalize_py(parts.path or "/")
    params = sorted(p for p in pct_normalize_py(parts.query).split("&") if p)
    q = f"?{'&'.join(params)}" if params else ""
    return f"{proto}://{host}{port}{path}{q}"


def host_py(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()


# ---------------------------------------------------------------------------
# URL quality filtering (the CCNet/RefinedWeb first-stage URL gate)
# ---------------------------------------------------------------------------

SPAM_WORDS = ("casino", "viagra", "porn", "gambling", "payday-loan", "escort")
BLOCKLIST_HOSTS = ("malware.example.com", "spam-mill.example.net")
URL_SCORE_THRESHOLD = 4


def _uf_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))


def url_quality_score(
    url: Column, blocklist: tuple[str, ...] = BLOCKLIST_HOSTS
) -> tuple[Column, Column]:
    """(host, score) for a URL — the pre-fetch URL-quality gate every
    public web pipeline runs FIRST (CCNet, RefinedWeb, DataComp: URL
    filtering is cheaper than fetching, so it goes before the frontier).
    INTEGER penalty contract (each term deterministic string arithmetic,
    repeated verbatim by the DuckDB oracle — no regex feature outside the
    RE2-safe subset):

        +4  spam word substring in lower(url)      (SPAM_WORDS)
        +2  len(url) > 160
        +2  IP-literal host
        +2  digit-heavy host (10 * digits >= 3 * len(host))
        +1  deep path (>= 10 '/' in the url)
        +1  > 3 query params
        +1  > 3 hyphens in host
        +100 blocklisted host (broadcast-sized dimension in production;
             a plan literal here)

    keep iff score < URL_SCORE_THRESHOLD."""
    lurl = F.lower(url)
    host = _uf_host(url)
    spam = F.lit(False)
    for w in SPAM_WORDS:
        spam = spam | lurl.contains(w)
    digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    hyphens = F.length(host) - F.length(F.regexp_replace(host, r"-", ""))
    slashes = F.size(F.split(url, r"/")) - 1
    # F.get (0-based, NULL out-of-bounds) not element_at: ANSI-safe even
    # though the when() guard already keeps '?'-less rows out of the branch
    n_params = F.when(
        url.contains("?"), F.size(F.split(F.get(F.split(url, r"\?"), 1), r"&"))
    ).otherwise(F.lit(0))
    score = (
        F.when(spam, 4).otherwise(0)
        + F.when(F.length(url) > 160, 2).otherwise(0)
        + F.when(host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"), 2).otherwise(0)
        + F.when(digits * 10 >= F.length(host) * 3, 2).otherwise(0)
        + F.when(slashes >= 10, 1).otherwise(0)
        + F.when(n_params > 3, 1).otherwise(0)
        + F.when(hyphens > 3, 1).otherwise(0)
        + F.when(host.isin(*blocklist), 100).otherwise(0)
    )
    return host, score.cast("int")


def url_quality_filter(
    df: DataFrame,
    url_col: str = "url",
    blocklist: tuple[str, ...] = BLOCKLIST_HOSTS,
    threshold: int = URL_SCORE_THRESHOLD,
) -> DataFrame:
    """(host, url, score, keep) — pure Catalyst, zero shuffles; runs
    upstream of the frontier so junk never costs a fetch. The blocklist
    is a bounded dimension (broadcast in production; a literal IN-list
    here — same plan shape as the location dim join)."""
    host, score = url_quality_score(F.col(url_col), blocklist)
    return df.select(
        host.alias("host"),
        F.col(url_col).alias("url"),
        score.alias("score"),
        (score < threshold).alias("keep"),
    )


def url_quality_score_py(
    url: str, blocklist: tuple[str, ...] = BLOCKLIST_HOSTS
) -> tuple[str, int]:
    """Plain-Python reference of url_quality_score (property tests)."""
    import re

    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", url)
    host = (m.group(1) if m else "").lower()
    lurl = url.lower()
    digits = len(re.sub(r"[^0-9]", "", host))
    hyphens = host.count("-")
    slashes = url.count("/")
    n_params = len(url.split("?")[1].split("&")) if "?" in url else 0
    score = (
        (4 if any(w in lurl for w in SPAM_WORDS) else 0)
        + (2 if len(url) > 160 else 0)
        + (2 if re.match(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$", host) else 0)
        + (2 if digits * 10 >= 3 * len(host) else 0)
        + (1 if slashes >= 10 else 0)
        + (1 if n_params > 3 else 0)
        + (1 if hyphens > 3 else 0)
        + (100 if host in blocklist else 0)
    )
    return host, score


# ---------------------------------------------------------------------------
# Crawl-trap detection (r6): URL-template population analysis
# ---------------------------------------------------------------------------

TRAP_TEMPLATE_CAP = 32


def url_path_template(url: Column) -> Column:
    """The URL's path with digit runs collapsed to ``N`` — the template a
    crawler trap stamps out by the million (calendar pages, paginated
    listings, session-id paths all collapse to ONE template while organic
    slugs stay distinct). Query strings are excluded (the quality gate
    already penalizes param spray); an empty path is '/'. RE2-safe so the
    DuckDB oracle repeats the expression verbatim."""
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    t = F.regexp_replace(path, "[0-9]+", "N")
    return F.when(t == "", F.lit("/")).otherwise(t)


def detect_crawl_traps(
    urls: DataFrame,
    cap: int = TRAP_TEMPLATE_CAP,
    url_col: str = "url",
) -> DataFrame:
    """(host, template, n_urls, is_trap): per-host URL-template
    populations; a template whose DISTINCT-URL population exceeds
    ``cap`` is a crawl trap (calendar/pagination/session explosion) —
    the classic frontier defense: a trap host does not fill the fetch
    budget with one template's infinite page space.

    Scale shape (10^10 URLs): one groupBy on the (host, template)
    dimension — uniform keys (a trap is ONE counter, never a fan-out; the
    distinct is per (host, template, url), also uniform); the result is
    template-dimension-sized, broadcastable back onto the frontier."""
    host = _uf_host(F.col(url_col))
    return (
        urls.select(
            host.alias("host"),
            url_path_template(F.col(url_col)).alias("template"),
            F.col(url_col).alias("__u"),
        )
        .groupBy("host", "template")
        .agg(F.countDistinct("__u").alias("n_urls"))
        .withColumn("is_trap", F.col("n_urls") > F.lit(int(cap)))
    )


def trap_filter(
    urls: DataFrame,
    cap: int = TRAP_TEMPLATE_CAP,
    url_col: str = "url",
) -> DataFrame:
    """Cap every trap template's population at ~``cap`` URLs,
    deterministically: a URL on a trap template survives iff the md5 hex
    prefix of 'trap|<url>' falls below ``cap / n_urls`` rendered as an
    8-hex threshold (the weighted_mix decision rule — map-side, engine-
    and partitioning-reproducible, no rank window over the very bucket
    whose size is the problem). Non-trap templates pass untouched.
    Survivor count per template is cap +- hash-binomial deviation."""
    traps = detect_crawl_traps(urls, cap, url_col)
    thr = F.lpad(
        F.lower(
            F.hex(
                F.round(F.lit(float(cap)) / F.col("n_urls") * F.lit(2.0**32)).cast(
                    "bigint"
                )
            )
        ),
        8,
        "0",
    )
    dim = traps.filter("is_trap").select("host", "template", thr.alias("__thr"))
    host = _uf_host(F.col(url_col))
    prefix = F.substring(F.md5(F.concat(F.lit("trap|"), F.col(url_col))), 1, 8)
    return (
        urls.withColumn("__h", host)
        .withColumn("__t", url_path_template(F.col(url_col)))
        .join(
            F.broadcast(dim),
            (F.col("__h") == dim["host"]) & (F.col("__t") == dim["template"]),
            "left",
        )
        .filter(F.col("__thr").isNull() | (prefix < F.col("__thr")))
        .drop("__h", "__t", "host", "template", "__thr")
    )
