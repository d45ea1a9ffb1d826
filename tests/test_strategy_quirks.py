"""Pin where the clean engine and the reference's quirky behavior agree
and where they deliberately diverge (SURVEY.md §3.4 quirks ledger).

Each test states the contract: [AGREE] both produce identical rows;
[DIVERGE] the clean engine implements the intended semantics, the quirk
simulator reproduces the reference's observable bug."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from jobscrawler_spark.oracle import strategy_quirks as Q
from jobscrawler_spark.schemas import PAYLOADS, SITE_CONFIGS
from jobscrawler_spark.sources import strategies as S


def _cfg_df(spark, cfg):
    # minimal configs (no selector columns): the strategies fill defaults
    sub = StructType([f for f in SITE_CONFIGS.fields if f.name in cfg])
    return spark.createDataFrame(pd.DataFrame([cfg]), sub)


def _payloads_df(spark, bodies, kind="html"):
    return spark.createDataFrame(
        [(u, 200, b, kind) for u, b in bodies.items()], PAYLOADS
    )


BS4_CFG = {
    "name": "https://s.example.com",
    "source_kind": "bs4",
    "strategy": "main",
    "url": "https://s.example.com/jobs?page=",
    "pages_to_crawl": 1,
    "start_point": 1,
    "follow_link": "no",
    "inner_link_tag": "",
    "config_idx": 0,
}

JOB = (
    '<div class="job"><h2 class="title">T{i}</h2>'
    '<a class="lnk" href="/j/{i}">x</a><p class="desc">D{i}</p></div>'
)


def test_quirk1_pagination_agree_on_single_page(spark):
    """[AGREE iff pages_to_crawl == start_point] quirk 1: the reference
    fetches the bare template every page; with one page both contracts
    fetch one body and extract the same rows."""
    body = "".join(JOB.format(i=i) for i in range(3))
    # clean engine fetches the INDEXED page url; quirky fetches the template
    clean = S.parse_bs4_main(
        _cfg_df(spark, BS4_CFG),
        _payloads_df(spark, {"https://s.example.com/jobs?page=1": body}),
    ).collect()
    quirky = Q.simulate_bs4_main(BS4_CFG, {"https://s.example.com/jobs?page=": body})
    assert len(clean) == len(quirky) == 3
    assert [(r["title"], r["link"]) for r in sorted(clean, key=lambda r: r["pos"])] == [
        (q["title"], q["link"]) for q in quirky
    ]


def test_quirk1_pagination_diverges_multipage(spark):
    """[DIVERGE] with pages_to_crawl=3 the reference fetches the SAME
    template body 3 times (3x duplicate rows); the clean engine fetches
    three distinct page URLs."""
    cfg = dict(BS4_CFG, pages_to_crawl=3)
    body = JOB.format(i=0)
    quirky = Q.simulate_bs4_main(cfg, {"https://s.example.com/jobs?page=": body})
    assert len(quirky) == 3  # same row, three page iterations
    assert len({q["link"] for q in quirky}) == 1
    clean = S.parse_bs4_main(
        _cfg_df(spark, cfg),
        _payloads_df(
            spark,
            {f"https://s.example.com/jobs?page={p}": JOB.format(i=p) for p in (1, 2, 3)},
        ),
    ).collect()
    assert len(clean) == 3 and len({r["link"] for r in clean}) == 3  # distinct pages


RSS_CFG = dict(
    BS4_CFG,
    source_kind="rss",
    strategy="rss",
    url="https://r.example.com/feed.xml",
    name="https://r.example.com",
)


def test_quirk3_rss_wrong_guard(spark):
    """[DIVERGE] an item without <location>: the reference yields all-NaN
    title/link/description (guard checks the location tag); the clean
    engine extracts each field on its own."""
    body = (
        "<rss><channel>"
        "<item><title>A</title><link>https://r.example.com/1</link>"
        "<description>da</description><location>X</location></item>"
        "<item><title>B</title><link>https://r.example.com/2</link>"
        "<description>db</description></item>"
        "</channel></rss>"
    )
    quirky = Q.simulate_rss(RSS_CFG, {RSS_CFG["url"]: body})
    assert quirky[0]["title"] == "A"
    assert quirky[1]["title"] == "NaN" and quirky[1]["link"] == "NaN"  # the bug

    clean = (
        S.parse_rss(_cfg_df(spark, RSS_CFG), _payloads_df(spark, {RSS_CFG["url"]: body}, "rss"))
        .orderBy("pos")
        .collect()
    )
    assert clean[1]["title"] == "B" and clean[1]["link"] == "https://r.example.com/2"
    assert clean[1]["location"] == "NaN"  # only the actually-missing field


def test_quirk2_rss_seen_probe_is_tag_name():
    """[DIVERGE] the reference probes the store for the literal string
    'link' — RSS pre-fetch dedupe never matches a real URL. The engine
    probes the canonical URL (tests/test_equivalence.py)."""
    assert Q.simulate_rss_seen_probe("link") == "link"


def test_quirk4_container_truncation_agrees(spark):
    """[AGREE] zip-truncation to the shortest list is the same in both
    contracts (the clean engine reproduces it via the pos inner join)."""
    cfg = dict(BS4_CFG, strategy="container")
    titles = "".join(f'<h2 class="title">T{i}</h2>' for i in range(4))
    links = "".join(f'<a class="lnk" href="/c/{i}">x</a>' for i in range(4))
    descs = "".join(f'<p class="desc">D{i}</p>' for i in range(4))
    locs = "".join(f'<span class="loc">L{i}</span>' for i in range(2))  # shorter
    body = titles + links + descs + locs
    quirky = Q.simulate_container(cfg, {"https://s.example.com/jobs?page=1": body})
    clean = (
        S.parse_bs4_container(
            _cfg_df(spark, cfg),
            _payloads_df(spark, {"https://s.example.com/jobs?page=1": body}),
        )
        .orderBy("pos")
        .collect()
    )
    assert len(quirky) == len(clean) == 2
    assert [(r["title"], r["link"], r["location"]) for r in clean] == [
        (q["title"], q["link"], q["location"]) for q in quirky
    ]


def test_quirk8_embed_prefix_diverges(spark):
    """[DIVERGE] quirk 8: the reference embeds passages with the "query: "
    prefix (query_e5_format at embed_latest_crawled_data.py:228;
    passage_e5_format exists but is never called). The sim is
    reference-faithful; the engine's embed pipeline intentionally uses the
    e5-correct "passage: " prefix on the SAME wrapped text."""
    from pyspark.sql import functions as F

    from jobscrawler_spark.functions.cleaning import embed_prepare
    from jobscrawler_spark.oracle.strategy_quirks import simulate_embed_prefix

    df = spark.createDataFrame(
        [(1, "Engineer", "Build crawlers", "Berlin")],
        "id int, title string, description string, location string",
    )
    wrapped = df.select(
        embed_prepare(
            F.col("title"), F.col("description"), F.col("location"), max_tokens=100
        ).alias("w")
    ).collect()[0]["w"]
    engine_info = df.select(
        F.concat(
            F.lit("passage: "),
            embed_prepare(
                F.col("title"), F.col("description"), F.col("location"), max_tokens=100
            ),
        ).alias("job_info")
    ).collect()[0]["job_info"]
    sim_info = simulate_embed_prefix(wrapped)

    assert sim_info == f"query: {wrapped}"          # reference-faithful
    assert engine_info == f"passage: {wrapped}"     # intended semantics
    assert sim_info.split(" ", 1)[1] == engine_info.split(" ", 1)[1]  # same payload
    assert sim_info != engine_info                   # the divergence is real
