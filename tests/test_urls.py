"""URL canonicalization: Catalyst expression == Python reference;
xxhash64 Python port == Spark builtin; idempotence property."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jobscrawler_spark.functions.urls import canon_url_col, canonicalize_py, with_canonical
from jobscrawler_spark.functions.xxhash import spark_xxhash64_str

DIRTY = [
    "http://H00.Example.COM/p/1",
    "http://h00.example.com/p/1#frag",
    "http://h00.example.com/p/1?b=2&a=1",
    "http://h00.example.com:80/p/1",
    "https://h00.example.com:443/p/1",
    "https://h00.example.com:8443/p/1",
    "http://h00.example.com",
    "http://h00.example.com/",
    "http://h00.example.com/p/1?a=1&b=2",
    "http://h00.example.com/p/1?",
    "HTTP://h00.example.com/x",
    "http://h01.example.com/d1/00ff/0",
]


def test_canon_spark_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in DIRTY], ["url"])
    got = [r[0] for r in df.select(canon_url_col(F.col("url"))).collect()]
    want = [canonicalize_py(u) for u in DIRTY]
    assert got == want


def test_canon_collapses_variants():
    # mixed case / fragment / default port all collapse to the clean spelling
    base = {canonicalize_py(DIRTY[i]) for i in (0, 1, 3)}
    assert base == {"http://h00.example.com/p/1"}
    # unsorted query sorts to the same canonical as the pre-sorted one
    assert canonicalize_py(DIRTY[2]) == canonicalize_py(DIRTY[8])
    # https default port stripped, explicit non-default kept
    assert canonicalize_py(DIRTY[4]) == "https://h00.example.com/p/1"
    assert canonicalize_py(DIRTY[5]) == "https://h00.example.com:8443/p/1"


def test_canon_idempotent():
    for u in DIRTY:
        c = canonicalize_py(u)
        assert canonicalize_py(c) == c


def test_xxhash64_matches_spark(spark):
    strings = [canonicalize_py(u) for u in DIRTY] + ["", "a", "ab" * 40, "日本語テスト"]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in strings:
        assert got[s] == spark_xxhash64_str(s), s


def test_with_canonical_shards(spark):
    df = with_canonical(spark.createDataFrame([(u,) for u in DIRTY], ["url"]), n_shards=16)
    rows = df.collect()
    for r in rows:
        assert 0 <= r["shard"] < 16
        assert r["url_hash"] == spark_xxhash64_str(r["url"])
        assert r["host"] == r["url"].split("://")[1].split("/")[0].split(":")[0]


@settings(max_examples=30, deadline=None)
@given(
    st.sampled_from(["http", "https"]),
    st.integers(0, 63),
    st.lists(st.sampled_from(["a=1", "b=2", "c=", "z=9"]), max_size=3),
    st.booleans(),
)
def test_canon_idempotence_property(scheme, host_i, params, frag):
    url = f"{scheme}://H{host_i:02d}.Example.com/p/{host_i}"
    if params:
        url += "?" + "&".join(params)
    if frag:
        url += "#x"
    c = canonicalize_py(url)
    assert canonicalize_py(c) == c
    assert c.split("://")[1].split("/")[0].islower() or c.split("://")[1].split("/")[0].isdigit()


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=0, max_size=200))
def _build_xxhash_cases(s):
    # collected below into a single Spark-parity check (one session roundtrip)
    _build_xxhash_cases.cases.append(s)


_build_xxhash_cases.cases = []


def test_xxhash64_random_strings_match_spark(spark):
    """Property: the pure-Python XXH64 port matches F.xxhash64 on random
    unicode strings (single Spark roundtrip for all hypothesis samples)."""
    try:
        _build_xxhash_cases()
    except Exception:
        pass
    cases = list(dict.fromkeys(_build_xxhash_cases.cases)) or ["fallback"]
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in cases:
        assert got[s] == spark_xxhash64_str(s), repr(s)


def test_parse_robots_txt_roundtrip(spark):
    """Parsing the generated robots.txt bodies must reproduce exactly the
    rule rows they were rendered from (decoy agents, comments, and the
    empty Disallow must all be ignored)."""
    from jobscrawler_spark.generators import gen_robots, gen_robots_bodies
    from jobscrawler_spark.operators.frontier import parse_robots_txt

    bodies = spark.createDataFrame(gen_robots_bodies(12, seed=9), "host string, body string")
    got = {
        (r["host"], r["path_prefix"], r["allow"])
        for r in parse_robots_txt(bodies).collect()
    }
    want = {
        (r.host, r.path_prefix, bool(r.allow))
        for r in gen_robots(12, seed=9).itertuples()
    }
    assert got == want


def test_parse_robots_crawl_delay_roundtrip(spark):
    """Crawl-delay directives in the '*' group parse back to the politeness
    dim's crawl_delay_rounds; the decoy group's delay is ignored."""
    from jobscrawler_spark.generators import gen_politeness, gen_robots_bodies
    from jobscrawler_spark.operators.frontier import parse_robots_crawl_delay

    pol = gen_politeness(12, seed=9)
    bodies = spark.createDataFrame(
        gen_robots_bodies(12, seed=9, politeness=pol), "host string, body string"
    )
    got = {
        r["host"]: r["crawl_delay_rounds"]
        for r in parse_robots_crawl_delay(bodies).collect()
    }
    want = {
        r.host: int(r.crawl_delay_rounds)
        for r in pol.itertuples()
        if int(r.crawl_delay_rounds) > 0
    }
    assert got == want
    assert all(v != 99 for v in got.values())  # decoy never leaks


# --------------------------------------------------------------------------
# URL quality filter (r6)
# --------------------------------------------------------------------------


def test_url_filter_spark_matches_python(spark):
    from jobscrawler_spark.functions.urls import (
        url_quality_filter,
        url_quality_score_py,
    )
    from jobscrawler_spark.generators import gen_filter_urls

    pdf = gen_filter_urls(128)
    got = {
        r["url"]: (r["host"], r["score"])
        for r in url_quality_filter(
            spark.createDataFrame(pdf, "url string")
        ).collect()
    }
    for u in pdf["url"]:
        assert got[u] == url_quality_score_py(u), u


def test_url_filter_planted_classes(spark):
    from jobscrawler_spark.functions.urls import url_quality_filter
    from jobscrawler_spark.generators import gen_filter_urls

    pdf = gen_filter_urls(64)
    keep = {
        r["url"]: r["keep"]
        for r in url_quality_filter(
            spark.createDataFrame(pdf, "url string")
        ).collect()
    }
    for i, u in enumerate(pdf["url"]):
        cls = i % 8
        if cls in (0, 1):
            assert keep[u], (cls, u)          # clean traffic passes
        elif cls in (2, 3, 5, 6):
            assert not keep[u], (cls, u)      # spam/overlong/ip/blocklist drop


def test_url_filter_handcrafted_scores(spark):
    from jobscrawler_spark.functions.urls import url_quality_score_py

    assert url_quality_score_py("http://ok.example.com/a/b?x=1")[1] == 0
    assert url_quality_score_py("http://ok.example.com/best-casino/x")[1] == 4
    assert url_quality_score_py("http://malware.example.com/x")[1] >= 100
    h, s = url_quality_score_py("http://10.1.2.3/x")
    assert h == "10.1.2.3" and s == 4  # ip (+2) and digit-heavy (+2)
    # param spray alone is a +1 nudge, not a rejection
    assert url_quality_score_py("http://ok.example.com/p?a=1&b=2&c=3&d=4&e=5")[1] == 1


# ------------------------------------------------- crawl traps (r6)


def test_url_path_template_edges(spark):
    from jobscrawler_spark.functions.urls import url_path_template

    cases = {
        "http://h.com/cal/2024/01/05": "/cal/N/N/N",
        "http://h.com/a1b2/x": "/aNbN/x",
        "http://h.com/list?page=9": "/list",  # query excluded
        "http://h.com": "/",                  # no path
        "http://h.com/": "/",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["t"]
        for r in df.select("url", url_path_template(F.col("url")).alias("t")).collect()
    }
    assert got == cases


def test_detect_crawl_traps_planted_classes(spark):
    from jobscrawler_spark.functions.urls import detect_crawl_traps
    from jobscrawler_spark.generators import gen_trap_urls

    df = spark.createDataFrame(gen_trap_urls(), "url string")
    out = {
        (r["host"], r["template"]): (r["n_urls"], r["is_trap"])
        for r in detect_crawl_traps(df).collect()
    }
    assert out[("trap0.example.com", "/cal/N/N/N")] == (64, True)
    assert out[("trap1.example.com", "/list/page/N")] == (48, True)
    assert out[("ok1.example.com", "/p/N")] == (16, False)
    ok0 = {k: v for k, v in out.items() if k[0] == "ok0.example.com"}
    assert len(ok0) == 24 and all(v == (1, False) for v in ok0.values())


def test_trap_filter_caps_traps_keeps_benign(spark):
    from jobscrawler_spark.functions.urls import trap_filter
    from jobscrawler_spark.generators import gen_trap_urls

    df = spark.createDataFrame(gen_trap_urls(), "url string")
    kept = [r["url"] for r in trap_filter(df).collect()]
    by_host = {}
    for u in kept:
        h = u.split("/")[2]
        by_host[h] = by_host.get(h, 0) + 1
    # benign hosts untouched
    assert by_host["ok0.example.com"] == 24
    assert by_host["ok1.example.com"] == 16
    # trap hosts capped near 32 (hash-binomial deviation)
    assert 16 <= by_host["trap0.example.com"] <= 48
    assert 16 <= by_host["trap1.example.com"] <= 48
    # deterministic across partitionings
    kept2 = [r["url"] for r in trap_filter(df.repartition(7)).collect()]
    assert sorted(kept) == sorted(kept2)


def test_pct_normalization_classes(spark):
    """RFC 3986 §6.2.2: unreserved escapes decode, reserved escapes stay
    (uppercased), malformed escapes survive verbatim — Spark == port."""
    from jobscrawler_spark.functions.urls import canonicalize_py

    cases = {
        # unreserved: decoded
        "http://h.example.com/%7Euser/%41%62%30%2D%2E%5F": "http://h.example.com/~user/Ab0-._",
        # reserved: kept, hex uppercased (%2f stays — '/' must not leak)
        "http://h.example.com/a%2fb%3Fc": "http://h.example.com/a%2Fb%3Fc",
        # query params normalized BEFORE sorting (%62=2 -> b=2 sorts after a=1)
        "http://h.example.com/p?%62=2&a=1": "http://h.example.com/p?a=1&b=2",
    }
    for url, want in cases.items():
        assert canonicalize_py(url) == want, url
    # malformed escape: the port keeps the '%' verbatim; Spark never sees
    # such a URL — parse_url itself throws INVALID_URL upstream of the
    # canonicalizer, so the engine rejects it at the parse gate
    assert canonicalize_py("http://h.example.com/100%25%2") == "http://h.example.com/100%25%2"
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["canon"] for r in df.select(
        "url", canon_url_col(F.col("url")).alias("canon")).collect()}
    assert got == cases
    # idempotent
    for want in cases.values():
        assert canonicalize_py(want) == want


def test_pct_variants_collapse_in_crawl(spark, tmp_path):
    """Seed list with %-encoded spellings of the same URL: engine and
    oracle agree AND the variants collapse onto one seen-set entry."""
    import pandas as pd

    from jobscrawler_spark.engine import CrawlEngine
    from jobscrawler_spark.generators import gen_politeness, gen_robots
    from jobscrawler_spark.oracle.simulator import OracleCrawler

    seeds = pd.DataFrame(
        [
            {"url": "http://h00.example.com/p/%31", "host": "h00.example.com",
             "priority": 0.3, "depth": 0},     # /p/1 encoded
            {"url": "http://h00.example.com/p/1", "host": "h00.example.com",
             "priority": 0.5, "depth": 0},     # /p/1 plain — same URL
            {"url": "http://h00.example.com/p/%7Ex", "host": "h00.example.com",
             "priority": 0.4, "depth": 0},
            {"url": "http://h00.example.com/p/~x", "host": "h00.example.com",
             "priority": 0.6, "depth": 0},     # same as above
            {"url": "http://h02.example.com/a%2Fb", "host": "h02.example.com",
             "priority": 0.2, "depth": 0},     # reserved escape: distinct URL
        ]
    )
    pol = gen_politeness(4, seed=3)
    rob = gen_robots(4, seed=3)
    eng = CrawlEngine(spark, str(tmp_path / "e"), n_shards=2, default_budget=4, max_depth=0)
    eng.bootstrap(seeds, pol, rob)
    eng.run(1)
    sim = OracleCrawler(pol, rob, default_budget=4, max_depth=0, n_shards=2)
    sim.bootstrap(seeds)
    sim.run(1)
    got = [(r["round"], r["url"]) for r in eng.fetch_log().select("round", "url").collect()]
    assert got == [(d["round"], d["url"]) for d in sim.landed]
    seen = {r["url"] for r in eng.seen.all_urls(spark).collect()}
    assert seen == sim.seen
    assert "http://h00.example.com/p/1" in seen
    assert "http://h00.example.com/p/~x" in seen
    assert "http://h02.example.com/a%2Fb" in seen
    # the 5 seeds collapse to at most 3 distinct URLs (h02 may be robots-gated)
    assert len([u for u in seen if "/p/" in u]) == 2
