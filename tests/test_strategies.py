"""Strategy-level unit tests: canned payloads through the vectorized
extractors, asserted against hand-computed frames (replacing the
reference's live-site smoke runs, reference tests/test_all_async.py)."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.generators import gen_payload_bodies, gen_site_configs
from jobscrawler_spark.schemas import PAYLOADS, SITE_CONFIGS
from jobscrawler_spark.sources import strategies as S


@pytest.fixture(scope="module")
def configs(spark):
    return spark.createDataFrame(gen_site_configs(), SITE_CONFIGS).cache()


@pytest.fixture(scope="module")
def payloads(spark, configs):
    return spark.createDataFrame(
        gen_payload_bodies(gen_site_configs()), PAYLOADS
    ).cache()


def test_bs4_main(configs, payloads):
    rows = S.parse_bs4_main(configs, payloads).orderBy("config_idx", "page", "pos").collect()
    # 2 default main sites x 2 pages x 5 jobs + custom-selector site x 2 x 4
    assert len(rows) == 28
    r0 = rows[0]
    assert r0["title"] == "Engineer 100 at Site"
    assert r0["link"] == "https://bs4-0.example.com/job/100"  # F17 concat
    assert r0["location"] == "City2 Country0"
    # every third job has no location -> "NaN" (F11)
    nans = [r for r in rows if r["location"] == "NaN"]
    assert len(nans) == 6 and all(r["pos"] == 2 for r in nans)
    # the custom-selector site parsed IN THE SAME PASS with its own paths
    custom = [r for r in rows if r["config_idx"] == 9]
    assert len(custom) == 8
    assert custom[0]["title"] == "Custom Engineer 100"
    assert custom[0]["link"] == "https://custom-9.example.com/cj/100"
    assert custom[0]["location"] == "City2 Country0"
    assert custom[0]["description"] == "Custom about 100 text"


def test_bs4_container_zip_truncation(configs, payloads):
    rows = S.parse_bs4_container(configs, payloads).orderBy("page", "pos").collect()
    # 6 titles/links/descs but only 4 locs -> truncate to 4 per page (quirk 4)
    assert len(rows) == 8
    assert all(r["pos"] <= 3 for r in rows)
    assert rows[0]["title"] == "CJob 100"
    assert rows[0]["link"] == "https://bs4-1.example.com/c/100"


def test_api_dict_and_list(configs, payloads):
    rows = S.parse_api(configs, payloads).orderBy("config_idx", "pos").collect()
    assert len(rows) == 20  # 3 default api sites x 5 jobs + custom-tag site x 5
    # falsy location -> site default (reference async_api.py:142-144)
    defaults = [r for r in rows if r["location"] == "Worldwide"]
    assert len(defaults) == 8 and all(r["pos"] in (1, 4) for r in defaults)  # i%3==1
    # missing desc tag -> "NaN"
    missing = [r for r in rows if r["description"] == "NaN"]
    assert len(missing) == 4 and all(r["pos"] == 3 for r in missing)
    # the custom-tag site resolves its own JSON tag paths in the same pass
    custom = [r for r in rows if r["config_idx"] == 10]
    assert len(custom) == 5 and custom[0]["title"] == "API Role 0"
    assert custom[0]["link"] == "https://capi-10.example.com/api-job/0"


def test_rss(configs, payloads):
    rows = S.parse_rss(configs, payloads).orderBy("config_idx", "pos").collect()
    assert len(rows) == 15
    assert rows[0]["title"] == "RSS Job 0"
    # odd items have no <location> -> "NaN"
    assert [r["location"] for r in rows[:4]] == ["RCity0", "NaN", "RCity2", "NaN"]


def test_union_preserves_config_order(configs, payloads):
    df = S.parse_all(configs, payloads)
    assert df.columns == S.JOB_COLS
    ordered = df.orderBy("config_idx", "page", "pos").select("source_kind").collect()
    kinds = [r[0] for r in ordered]
    # bs4 configs (0-2), api (3-5), rss (6-8), custom bs4 (9), custom api (10)
    assert kinds == ["bs4"] * 28 + ["api"] * 15 + ["rss"] * 15 + ["bs4"] * 8 + ["api"] * 5


def test_non200_page_skipped(spark, configs):
    bad = spark.createDataFrame(
        [("https://bs4-0.example.com/jobs?page=1", 403, "<html></html>", "html"),
         ("https://bs4-0.example.com/jobs?page=2", 200, "<html></html>", "html")],
        PAYLOADS,
    )
    assert S.parse_bs4_main(configs, bad).count() == 0  # P6


def test_main_strategy_page_abort(spark, configs):
    """A job missing its link kills the whole page (reference ValueError,
    async_bs4.py:140-150) but not other pages."""
    good = '<div class="job"><h2 class="title">T</h2><a class="lnk" href="/x">a</a></div>'
    bad = '<div class="job"><h2 class="title">T2</h2></div>'
    pl = spark.createDataFrame(
        [
            ("https://bs4-0.example.com/jobs?page=1", 200, good + bad, "html"),
            ("https://bs4-0.example.com/jobs?page=2", 200, good, "html"),
        ],
        PAYLOADS,
    )
    rows = S.parse_bs4_main(configs, pl).collect()
    assert len(rows) == 1 and rows[0]["page"] == 2


def test_follow_links(spark):
    jobs = spark.createDataFrame(
        [(0, 1, 0, "t", "https://d.example.com/j/1", "NaN", "loc", "bs4")],
        S.JOB_COLS,
    )
    detail = spark.createDataFrame(
        [
            ("https://d.example.com/j/1", 200, '<p class="desc">full text</p>', "html"),
        ],
        PAYLOADS,
    )
    out = S.follow_links(jobs, detail).collect()[0]
    assert out["description"] == "full text"
    # 403 detail page -> default (reference FollowLink.py:28-39)
    detail403 = spark.createDataFrame(
        [("https://d.example.com/j/1", 403, "x", "html")], PAYLOADS
    )
    out2 = S.follow_links(jobs, detail403, default="DEF").collect()[0]
    assert out2["description"] == "DEF"


def test_rss_messy_feed_shapes(spark, configs):
    """S6 generality: CDATA, uppercase/attributed tags, Atom <entry> +
    <link href="..."/>, whitespace — one pass, same projection."""
    messy = (
        '<?xml version="1.0"?><rss><channel>'
        "<ITEM><TITLE> <![CDATA[Dev & Ops]]> </TITLE>"
        '<link rel="alternate" href="https://rss-6.example.com/atom/1"/>'
        "<Description lang=\"en\">\n  cdata-free desc  \n</Description></ITEM>"
        '<entry><title type="text">Entry Role</title>'
        "<link>https://rss-6.example.com/e/2</link>"
        "<description><![CDATA[entry desc]]></description>"
        "<location>Berlin</location></entry>"
        "</channel></rss>"
    )
    pl = spark.createDataFrame(
        [("https://rss-6.example.com/feed.xml", 200, messy, "rss")], PAYLOADS
    )
    rows = S.parse_rss(configs, pl).orderBy("pos").collect()
    assert len(rows) == 2
    assert rows[0]["title"] == "Dev & Ops"
    assert rows[0]["link"] == "https://rss-6.example.com/atom/1"  # Atom href fallback
    assert rows[0]["description"] == "cdata-free desc"
    assert rows[0]["location"] == "NaN"
    assert rows[1]["title"] == "Entry Role"
    assert rows[1]["link"] == "https://rss-6.example.com/e/2"
    assert rows[1]["description"] == "entry desc"
    assert rows[1]["location"] == "Berlin"
