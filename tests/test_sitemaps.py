"""Sitemap discovery (r5): robots Sitemap: records, sitemap XML parsing,
and sitemap-seeded crawl equivalence.

The reference has no sitemap support (its seeds are hand-written site
configs, reference src/resources/*); this is the crawl-tier seed-discovery
step the north rule's frontier needs. The gate (s_robots_parse, 'ref'/
'url'/'index' kinds) pins the parses vs DuckDB; these tests pin the spec
semantics and the end-to-end seeding path."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.engine import CrawlEngine
from jobscrawler_spark.functions.urls import canonicalize_py
from jobscrawler_spark.functions.xxhash import spark_xxhash64_str
from jobscrawler_spark.generators import (
    gen_politeness,
    gen_robots,
    gen_robots_bodies,
    gen_sitemap_bodies,
)
from jobscrawler_spark.operators.frontier import (
    parse_robots_sitemaps,
    parse_robots_txt,
    sitemap_seeds,
)
from jobscrawler_spark.oracle.simulator import OracleCrawler
from jobscrawler_spark.sources.strategies import parse_sitemap


@pytest.fixture(scope="module")
def fixture():
    return gen_sitemap_bodies(8, seed=5)


def test_sitemap_records_do_not_disturb_rule_groups(spark, fixture):
    """Per the robots spec a Sitemap record is standalone: injecting them
    (including MID-FILE between User-agent groups) must leave the rule
    parse byte-identical to the uninjected bodies."""
    rb, _ = fixture
    plain = spark.createDataFrame(
        gen_robots_bodies(8, seed=5), "host string, body string"
    )
    injected = spark.createDataFrame(rb, "host string, body string")
    a = sorted(map(tuple, parse_robots_txt(plain).collect()))
    b = sorted(map(tuple, parse_robots_txt(injected).collect()))
    assert a == b and a


def test_parse_robots_sitemaps_matches_re(spark, fixture):
    rb, _ = fixture
    got = sorted(
        (r["host"], r["sitemap_url"])
        for r in parse_robots_sitemaps(
            spark.createDataFrame(rb, "host string, body string")
        ).collect()
    )
    want = sorted(
        {
            (r.host, m)
            for r in rb.itertuples()
            for m in re.findall(
                r"(?im)^\s*sitemap\s*:\s*(\S+)", re.sub(r"#.*$", "", r.body, flags=re.M)
            )
        }
    )
    assert got == want
    assert len({h for h, _ in got}) == 6  # every fourth host has none


def test_parse_sitemap_urls_and_index(spark, fixture):
    _, sb = fixture
    out = parse_sitemap(
        spark.createDataFrame(sb, "host string, url string, body string")
    ).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
    # every <urlset> loc extracted, whitespace-trimmed
    want_urls = sorted(
        m.strip()
        for r in sb.itertuples()
        for m in re.findall(r"(?is)<url>.*?<loc>\s*(.*?)\s*</loc>", r.body)
    )
    assert sorted(r["loc"] for r in by_kind["url"]) == want_urls
    # lastmod present exactly where the fixture put one
    lm = {r["loc"]: r["lastmod"] for r in by_kind["url"]}
    assert any(v is not None for v in lm.values())
    assert any(v is None for v in lm.values())
    for loc, v in lm.items():
        if v is not None:
            assert re.fullmatch(r"2026-\d{2}-\d{2}", v)
    # sitemapindex children come back as 'index' rows (2 per index doc)
    n_index_docs = sum("sitemapindex" in r.body for r in sb.itertuples())
    assert len(by_kind["index"]) == 2 * n_index_docs


def test_crawl_seeded_from_sitemaps_matches_oracle(spark, tmp_path, fixture):
    """END-TO-END: robots bodies -> Sitemap refs -> sitemap XML -> seeds
    -> a 2-round crawl whose fetch log equals the oracle simulator
    bootstrapped from the same discovered URL list (the helper's hash
    priority is data-defined, so both engines order identically)."""
    rb, sb = fixture
    parsed = parse_sitemap(
        spark.createDataFrame(sb, "host string, url string, body string")
    )
    seeds = sitemap_seeds(parsed)
    pol = gen_politeness(8, seed=5)
    pol["crawl_delay_rounds"] = 0
    rob = gen_robots(8, seed=5)
    eng = CrawlEngine(
        spark, str(tmp_path / "sm"), n_shards=4, default_budget=2, max_depth=0,
        fetch_partitions=4,
    )
    eng.bootstrap(seeds, pol, rob)
    eng.run(2)
    log = [
        (r["round"], r["url"]) for r in eng.fetch_log().select("round", "url").collect()
    ]

    locs = sorted(r["loc"] for r in parsed.filter(F.col("kind") == "url").collect())
    oseeds = pd.DataFrame(
        {
            "url": locs,
            "priority": [
                (spark_xxhash64_str(canonicalize_py(u)) % 1_000_000) / 1_000_000.0
                for u in locs
            ],
            "depth": 0,
        }
    )
    orc = OracleCrawler(pol, rob, default_budget=2, max_depth=0, n_shards=4)
    orc.bootstrap(oseeds)
    orc.run(2)
    assert log == [(d["round"], d["url"]) for d in orc.landed]
    assert log, "sitemap-seeded crawl fetched nothing"
