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


def canon_url_col(url: Column) -> Column:
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    auth = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    is_default = ((proto == "http") & (port == "80")) | ((proto == "https") & (port == "443"))
    port_part = F.when((port != "") & ~is_default, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    raw_path = F.parse_url(url, F.lit("PATH"))
    path = F.when(raw_path.isNull() | (raw_path == ""), F.lit("/")).otherwise(raw_path)
    query = F.parse_url(url, F.lit("QUERY"))
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(F.coalesce(query, F.lit("")), "&"), lambda x: x != "")),
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


def canonicalize_py(url: str) -> str:
    parts = urlsplit(url)
    proto = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = ""
    if parts.port is not None and str(parts.port) != DEFAULT_PORTS.get(proto):
        port = f":{parts.port}"
    path = parts.path or "/"
    params = sorted(p for p in parts.query.split("&") if p)
    q = f"?{'&'.join(params)}" if params else ""
    return f"{proto}://{host}{port}{path}{q}"


def host_py(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()
