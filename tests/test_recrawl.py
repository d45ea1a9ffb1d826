"""Re-crawl-after-N-rounds policy (r5): seen-set expiry + re-enqueue.

Exercises the cuckoo prefilter's DELETION path in the engine (the
capability the bloom lacks — r4 verdict task 6) and pins exact
equivalence of the policy against the single-threaded oracle simulator
for BOTH prefilter backends.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.engine import CrawlEngine
from jobscrawler_spark.generators import gen_politeness, gen_robots, gen_seeds
from jobscrawler_spark.operators import cuckoo
from jobscrawler_spark.operators.seen_set import SeenSet
from jobscrawler_spark.oracle.simulator import OracleCrawler

N_ROUNDS = 6
RECRAWL = 2


def _no_delay_politeness(n_hosts: int, seed: int) -> pd.DataFrame:
    """Politeness with crawl delays zeroed: delay pushback + re-enqueue
    interact (delayed rows expire mid-delay is a policy question the
    engine answers 'delays still apply'); the DELAYED variant is covered
    separately below."""
    pol = gen_politeness(n_hosts, seed=seed)
    pol["crawl_delay_rounds"] = 0
    return pol


def _run_engine(spark, tmp_path, prefilter: str, pol) -> tuple[list, list]:
    eng = CrawlEngine(
        spark,
        str(tmp_path / prefilter),
        n_shards=4,
        default_budget=4,
        max_depth=1,
        fetch_partitions=4,
        prefilter=prefilter,
        recrawl_after=RECRAWL,
    )
    eng.bootstrap(gen_seeds(n=60, n_hosts=6, seed=13), pol, gen_robots(6, seed=13))
    eng.run(N_ROUNDS)
    log = [
        (r["round"], r["url"])
        for r in eng.fetch_log().select("round", "url").collect()
    ]
    cutoff = eng._recrawl_cutoff
    effective = sorted(
        r["url"]
        for r in eng.seen.all_urls(spark)
        .filter(F.col("round_added") > cutoff)
        .select("url")
        .collect()
    )
    return log, effective


def _run_oracle(pol) -> tuple[list, list]:
    orc = OracleCrawler(
        pol, gen_robots(6, seed=13), default_budget=4, max_depth=1,
        n_shards=4, recrawl_after=RECRAWL,
    )
    orc.bootstrap(gen_seeds(n=60, n_hosts=6, seed=13))
    orc.run(N_ROUNDS)
    olog = [(d["round"], d["url"]) for d in orc.landed]
    return olog, sorted(orc.seen)


@pytest.mark.parametrize("prefilter", ["cuckoo", "bloom"])
def test_recrawl_matches_oracle(spark, tmp_path, prefilter):
    """Engine fetch log + effective seen set == simulator, with URLs
    actually re-fetched (the policy fires, it is not vacuous). The cuckoo
    run deletes fingerprints eagerly; the bloom run leaves the filter
    stale-conservative — both must produce identical crawl results."""
    pol = _no_delay_politeness(6, 13)
    log, seen = _run_engine(spark, tmp_path, prefilter, pol)
    olog, oseen = _run_oracle(pol)
    assert log == olog
    assert seen == oseen
    by_url: dict[str, int] = {}
    for _r, u in log:
        by_url[u] = by_url.get(u, 0) + 1
    refetched = [u for u, n in by_url.items() if n > 1]
    assert refetched, "re-crawl policy never fired"
    # a URL fetched in rounds f and f' obeys f' >= f + RECRAWL + 1
    rounds_by_url: dict[str, list[int]] = {}
    for r, u in log:
        rounds_by_url.setdefault(u, []).append(r)
    for u, rs in rounds_by_url.items():
        for a, b in zip(rs, rs[1:]):
            assert b >= a + RECRAWL + 1, (u, rs)


def test_recrawl_with_delays_matches_oracle(spark, tmp_path):
    """Same equivalence with crawl delays active: a re-enqueued row is
    subject to its host's round-r pushback (it was 'present before the
    round'), exactly like the simulator's end-of-round pushback loop."""
    pol = gen_politeness(6, seed=13)  # has genuine delays
    log, seen = _run_engine(spark, tmp_path, "cuckoo", pol)
    olog, oseen = _run_oracle(pol)
    assert log == olog
    assert seen == oseen


def test_seen_set_expire_deletes_cuckoo_fingerprints(spark, tmp_path):
    """Unit: expire() removes the expired URLs' fingerprints from the
    cuckoo shard filters (verified on the stored bits directly) and the
    probe then lets those URLs through without the exact backstop."""
    from jobscrawler_spark.functions.urls import with_canonical

    ss = SeenSet(str(tmp_path / "seen"), n_shards=4, prefilter="cuckoo")
    urls = [f"http://h{i % 3:02d}.example.com/p/{i}" for i in range(40)]
    df = with_canonical(
        spark.createDataFrame([(u,) for u in urls], "url string"), n_shards=4
    )
    ss.add(spark, df.select("url", "url_hash", "shard"), round_no=0)
    df1 = with_canonical(
        spark.createDataFrame(
            [(f"http://h{i % 3:02d}.example.com/q/{i}",) for i in range(10)],
            "url string",
        ),
        n_shards=4,
    )
    ss.add(spark, df1.select("url", "url_hash", "shard"), round_no=1)

    expired = ss.expire(spark, round_added=0)
    assert expired is not None
    exp_rows = expired.collect()
    expired.unpersist()
    assert sorted(r["url"] for r in exp_rows) == sorted(
        r["url"] for r in df.select("url").distinct().collect()
    )

    # stored cuckoo bits no longer contain the expired fingerprints...
    blooms = {r["shard"]: r for r in ss.bloom.read(spark).collect()}
    for r in exp_rows:
        b = blooms[r["shard"]]
        table = cuckoo.load(bytes(b["bits"]), int(b["n_bits"]))
        h = np.array([r["url_hash"]], dtype=np.int64).view(np.uint64)
        assert not cuckoo.contains(table, h)[0], r["url"]
    # ...while round-1 URLs remain present
    for r in df1.select("url_hash", "shard").collect():
        b = blooms[r["shard"]]
        table = cuckoo.load(bytes(b["bits"]), int(b["n_bits"]))
        h = np.array([r["url_hash"]], dtype=np.int64).view(np.uint64)
        assert cuckoo.contains(table, h)[0]

    # probe: expired URLs pass as unseen again; round-1 URLs still blocked
    cand = df.select("url", "url_hash", "shard").unionByName(
        df1.select("url", "url_hash", "shard")
    )
    out = ss.filter_unseen(spark, cand, min_round_added=1)
    got = sorted(r["url"] for r in out.collect())
    assert got == sorted(r["url"] for r in df.select("url").collect())

    # compact with min_round_added physically drops the expired rows
    ss.compact(spark, min_round_added=1)
    assert ss.seen.read(spark).filter(F.col("round_added") < 1).count() == 0


def test_recrawl_resume_mid_policy_matches_oracle(spark, tmp_path):
    """The policy is derived purely from the round number ('resume needs
    no extra state'): stopping after 3 rounds and resuming for 3 more —
    with expiries firing on both sides of the restart — must reproduce
    the oracle's uninterrupted 6-round log, including re-fetches in the
    resumed half."""
    pol = _no_delay_politeness(6, 13)
    base = str(tmp_path / "resume")
    kwargs = dict(
        n_shards=4, default_budget=4, max_depth=1, fetch_partitions=4,
        prefilter="cuckoo", recrawl_after=RECRAWL,
    )
    eng = CrawlEngine(spark, base, **kwargs)
    eng.bootstrap(gen_seeds(n=60, n_hosts=6, seed=13), pol, gen_robots(6, seed=13))
    eng.run(3)
    eng2 = CrawlEngine.resume(spark, base, **kwargs)
    assert eng2.next_round == 3
    eng2.run(3)
    log = [
        (r["round"], r["url"])
        for r in eng2.fetch_log().select("round", "url").collect()
    ]
    olog, _ = _run_oracle(pol)
    assert log == olog
    late_refetch = {
        u for r, u in log if r >= 3
    } & {u for r, u in log if r < 3}
    assert late_refetch, "no re-fetch landed after the resume"
