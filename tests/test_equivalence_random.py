"""Randomized engine-vs-oracle equivalence: hypothesis generates small
crawl configurations (budgets incl. zero, delays, dirty URLs, depth
limits); the Spark engine must match the oracle simulator's fetch order
and seen set on every one. Few examples — each runs real Spark jobs."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jobscrawler_spark.engine import CrawlEngine
from jobscrawler_spark.generators import gen_robots, gen_seeds
from jobscrawler_spark.oracle.simulator import OracleCrawler


@st.composite
def crawl_config(draw):
    n_hosts = draw(st.sampled_from([4, 8]))
    budgets = [draw(st.sampled_from([0, 1, 3, 100])) for _ in range(n_hosts)]
    delays = [draw(st.sampled_from([0, 1, 2])) for _ in range(n_hosts)]
    return {
        "n_hosts": n_hosts,
        "budgets": budgets,
        "delays": delays,
        "seed": draw(st.integers(1, 10_000)),
        "default_budget": draw(st.sampled_from([2, 8])),
        "max_depth": draw(st.sampled_from([0, 1])),
        "rounds": draw(st.sampled_from([2, 3])),
        # results must be invariant to physical knobs: fetch parallelism
        # and delta-frontier compaction cadence
        "fetch_partitions": draw(st.sampled_from([3, 32])),
        "compact_every": draw(st.sampled_from([1, 2, 100])),
    }


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(cfg=crawl_config())
def test_random_configs_match_oracle(spark, tmp_path_factory, cfg):
    seeds = gen_seeds(n=150, n_hosts=cfg["n_hosts"], seed=cfg["seed"])
    pol = pd.DataFrame(
        {
            "host": [f"h{i:02d}.example.com" for i in range(cfg["n_hosts"])],
            "max_fetches_per_round": cfg["budgets"],
            "crawl_delay_rounds": cfg["delays"],
        }
    )
    rob = gen_robots(n_hosts=cfg["n_hosts"], seed=cfg["seed"])

    base = str(tmp_path_factory.mktemp("rand"))
    eng = CrawlEngine(
        spark,
        base,
        n_shards=4,
        default_budget=cfg["default_budget"],
        max_depth=cfg["max_depth"],
        fetch_partitions=cfg["fetch_partitions"],
        compact_every=cfg["compact_every"],
    )
    eng.bootstrap(seeds, pol, rob)
    eng.run(cfg["rounds"])

    oracle = OracleCrawler(
        pol, rob, default_budget=cfg["default_budget"], max_depth=cfg["max_depth"], n_shards=4
    )
    oracle.bootstrap(seeds)
    oracle.run(cfg["rounds"])

    eng_seen = {r["url"] for r in eng.seen.all_urls(spark).collect()}
    assert eng_seen == oracle.seen
    eng_order = [
        (r["round"], r["url"]) for r in eng.fetch_log().select("round", "url").collect()
    ]
    assert eng_order == [(d["round"], d["url"]) for d in oracle.landed]
