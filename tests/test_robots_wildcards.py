"""RFC 9309 wildcard robots rules: '*' matches any sequence, trailing
'$' anchors, longest MATCHING rule wins (allow on exact ties). The engine
(LIKE-pattern rules precompiled per dim row) and the oracle simulator
(regex port) must agree bit-for-bit, including on full crawls."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.engine import CrawlEngine
from jobscrawler_spark.generators import (
    gen_politeness,
    gen_robots,
    gen_robots_bodies,
    gen_seeds,
)
from jobscrawler_spark.operators.frontier import parse_robots_txt, robots_decisions
from jobscrawler_spark.oracle.simulator import OracleCrawler, robots_match_py

RULES = [
    # (host, path_prefix, allow)
    ("w.example.com", "/", True),
    ("w.example.com", "/d1/*/2$", False),      # anchored mid-star
    ("w.example.com", "/p/*7", False),         # unanchored mid-star
    ("w.example.com", "/q", False),            # plain disallow ...
    ("w.example.com", "/q/*", True),           # ... out-lengthed by wildcard allow
    ("w.example.com", "/r*", False),
    ("w.example.com", "/r*", True),            # exact tie: allow wins (true > false)
    ("w.example.com", "/s_*x$", False),        # literal _ inside a wildcard rule
    ("w.example.com", "/t%*", False),          # literal % (percent-encoded paths)
]

CASES = [
    ("http://w.example.com/d1/abc/2", False),       # anchored match
    ("http://w.example.com/d1/abc/22", True),       # anchor rejects longer path
    ("http://w.example.com/d1/abc/2?x=1", False),   # query excluded from path
    ("http://w.example.com/p/17", False),           # mid-star + implicit suffix
    ("http://w.example.com/p/170", False),          # suffix after the 7 still matches
    ("http://w.example.com/p/18", True),
    ("http://w.example.com/q", False),              # plain rule wins at /q itself
    ("http://w.example.com/q/x", True),             # longer wildcard allow wins
    ("http://w.example.com/r/any", True),           # tie between allow+disallow
    ("http://w.example.com/s_bx", False),           # literal _ matched literally
    ("http://w.example.com/sAbx", True),            # _ is NOT a single-char wildcard
    ("http://w.example.com/s_b", True),             # anchor rejects missing x
    ("http://w.example.com/t%25x", False),          # raw path /t%25x starts with /t%
    ("http://w.example.com/tx", True),              # % is NOT a wildcard
    ("http://w.example.com/other", True),           # only '/' matches
]


def test_wildcard_decisions_match_contract(spark):
    robots = spark.createDataFrame(RULES, "host string, path_prefix string, allow boolean")
    cand = spark.createDataFrame(
        [("w.example.com", u) for u, _ in CASES], "host string, url string"
    )
    got = {r["url"]: r["allow"] for r in robots_decisions(cand, robots).collect()}
    assert got == dict(CASES)


def test_python_port_mirrors_engine(spark):
    """robots_match_py x max() must reproduce every engine verdict."""
    from urllib.parse import urlsplit

    for url, want in CASES:
        path = urlsplit(url).path or "/"
        applicable = [
            (len(p), p, a) for _, p, a in RULES if robots_match_py(path, p)
        ]
        allow = max(applicable)[2] if applicable else True
        assert allow == want, (url, applicable)


def test_plain_rules_unchanged(spark):
    """wildcards=False output is byte-identical to the pre-r6 generator,
    and plain-rule gating semantics are untouched (startswith fast path)."""
    rob = gen_robots(16, seed=42)
    assert not rob["path_prefix"].str.contains(r"[*$]").any()
    robots = spark.createDataFrame(rob)
    cand = spark.createDataFrame(
        [("h02.example.com", "http://h02.example.com/private/x"),
         ("h02.example.com", "http://h02.example.com/private/ok/x")],
        "host string, url string",
    )
    got = {r["url"]: r["allow"] for r in robots_decisions(cand, robots).collect()}
    # host may or may not carry the /private pair depending on rng; derive
    rules = rob[rob.host == "h02.example.com"]
    has_private = (rules.path_prefix == "/private").any()
    assert got["http://h02.example.com/private/x"] == (not has_private)
    assert got["http://h02.example.com/private/ok/x"] is True


def test_bodies_roundtrip_with_wildcards(spark):
    bodies = gen_robots_bodies(12, seed=7, wildcards=True)
    parsed = parse_robots_txt(spark.createDataFrame(bodies)).collect()
    got = {(r["host"], r["path_prefix"], r["allow"]) for r in parsed}
    want = {
        (r.host, r.path_prefix, bool(r.allow))
        for r in gen_robots(12, seed=7, wildcards=True).itertuples()
    }
    assert got == want


@pytest.mark.parametrize("n_rounds", [3])
def test_crawl_equivalence_with_wildcard_robots(spark, tmp_path, n_rounds):
    """Full crawl with wildcard robots: engine == oracle on fetch order +
    seen set, and the wildcard rules actually suppress fetches."""
    seeds = gen_seeds(n=400, n_hosts=12, seed=9)
    pol = gen_politeness(n_hosts=12, seed=9)
    rob = gen_robots(n_hosts=12, seed=9, wildcards=True)

    eng = CrawlEngine(spark, str(tmp_path / "e"), n_shards=4, default_budget=6, max_depth=2)
    eng.bootstrap(seeds, pol, rob)
    eng.run(n_rounds)
    sim = OracleCrawler(pol, rob, default_budget=6, max_depth=2, n_shards=4)
    sim.bootstrap(seeds)
    sim.run(n_rounds)

    eng_order = [
        (r["round"], r["url"]) for r in eng.fetch_log().select("round", "url").collect()
    ]
    assert eng_order == [(d["round"], d["url"]) for d in sim.landed]
    eng_seen = {r["url"] for r in eng.seen.all_urls(spark).collect()}
    assert eng_seen == sim.seen

    # the wildcard rules must have BITTEN: the same crawl without them
    # fetches strictly more (host 0 carries the anchored /d1/*/2$ rule)
    sim_plain = OracleCrawler(
        pol, gen_robots(n_hosts=12, seed=9), default_budget=6, max_depth=2, n_shards=4
    )
    sim_plain.bootstrap(seeds)
    sim_plain.run(n_rounds)
    assert len(sim_plain.seen) > len(sim.seen)
    suppressed = sim_plain.seen - sim.seen
    assert any("/d1/" in u and u.endswith("/2") for u in suppressed)
