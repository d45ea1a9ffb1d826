"""Physical-plan quality gates: these lock in the performance properties
the engine is designed around (pushdown to scan, broadcast dims, two-phase
windows, salted fetch spreading). A regression that silently de-optimizes
a plan fails here even though results stay correct."""

import contextlib
import io

import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from jobscrawler_spark.functions.urls import with_canonical
from jobscrawler_spark.generators import gen_politeness, gen_robots
from jobscrawler_spark.operators.frontier import politeness_select, robots_gate, salted_repartition

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    p = _plan(E.q_a1_groupby_agg(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: untouched columns never reach the scan
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_dim_joins_broadcast(spark):
    p = _plan(E.q_j2_broadcast_dim_join(spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_anti_join_strategy(spark):
    p = _plan(E.q_p5_anti_join(spark, SF))
    assert "LeftAnti" in p


def test_politeness_two_phase_window(spark):
    seeds = spark.createDataFrame(
        [(f"http://h{i % 4:02d}.example.com/p/{i}", float(i % 97) / 97, 0) for i in range(500)],
        ["url", "priority", "depth"],
    )
    cand = with_canonical(seeds)
    pol = spark.createDataFrame(gen_politeness(4))
    p = _plan(politeness_select(cand, pol))
    # two row_number windows (salt-local cap, then exact per-host budget)
    assert p.count("row_number()") == 2
    assert "BroadcastHashJoin" in p  # politeness dim broadcast


def test_robots_gate_no_fact_shuffle(spark):
    seeds = spark.createDataFrame(
        [(f"http://h{i % 4:02d}.example.com/p/{i}", 0.5, 0) for i in range(100)],
        ["url", "priority", "depth"],
    )
    cand = with_canonical(seeds)
    rob = spark.createDataFrame(gen_robots(4))
    p = _plan(robots_gate(cand, rob))
    # the only non-broadcast exchange allowed is the tiny dim-side groupBy
    fact_exchanges = [
        l for l in p.splitlines() if "Exchange hashpartitioning" in l and "host" not in l
    ]
    assert not fact_exchanges, fact_exchanges


def test_salting_spreads_hot_host(spark):
    """A mega-host's selected URLs must land on >1 fetch partition."""
    n = 2000
    seeds = pd.DataFrame(
        {
            "url": [f"http://hot.example.com/p/{i}" for i in range(n)],
            "priority": [float(i) / n for i in range(n)],
            "depth": 0,
        }
    )
    cand = with_canonical(spark.createDataFrame(seeds))
    pol = spark.createDataFrame(
        pd.DataFrame(
            {"host": ["hot.example.com"], "max_fetches_per_round": [512], "crawl_delay_rounds": [0]}
        )
    )
    selected = politeness_select(cand, pol)
    parts = (
        salted_repartition(selected, 16)
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert parts > 4  # one host spread across many partitions
    assert selected.count() == 512  # budget exact despite salting
