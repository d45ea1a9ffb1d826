"""Per-query profiling harness for the optimization rounds (guide §1).

NOT part of the frozen driver contract (bench.py is the measured artifact;
this file only produces the evidence cited in OPTIMIZATION_r*.md):

- times each declared query exactly the way bench.run_queries does
  (build + .count()), labelled via job groups so the per-query Spark job
  count is recorded (fixed per-job latency dominates at sf0.1 — the job
  count IS the signal the wall time hides);
- optionally writes .explain("formatted") for each query's final frame to
  plans/<tag>/<query>_<suffix>.txt (the judge-checkable plan evidence).

Usage:
  python bench_extra.py [query ...]            # time + job-count all/some
  PLANS_DIR=plans/r07 PLANS_SUFFIX=before python bench_extra.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.environ.get("PLANS_DIR", "")
PLANS_SUFFIX = os.environ.get("PLANS_SUFFIX", "before")
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))

os.environ.setdefault("SPARK_DRIVER_MEM", "60g")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from bench import BENCH_QUERIES, _new_session

    import __spark_entry__ as E

    names = sys.argv[1:] or BENCH_QUERIES
    spark = _new_session(CPUS)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = E.queries()
    out: dict[str, dict] = {}
    for name in names:
        best = None
        for rep in range(REPEATS):
            group = f"{name}#{rep}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            t1 = time.monotonic()
            n = df.count()
            t2 = time.monotonic()
            sc.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(group))
            rec = {
                "build_s": round(t1 - t0, 3),
                "count_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "rows": n,
                "jobs": jobs,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
            log(f"  {name}[{rep}]: total {rec['total_s']:.2f}s "
                f"(build {rec['build_s']:.2f} + count {rec['count_s']:.2f}), "
                f"{jobs} jobs, {n} rows")
        out[name] = best
        if PLANS_DIR:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            path = os.path.join(PLANS_DIR, f"{name}_{PLANS_SUFFIX}.txt")
            with open(path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            log(f"  wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
