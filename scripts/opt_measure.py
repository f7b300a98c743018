"""Round-14 optimization measurement harness.

Times individual registered queries in isolation with the noop sink
(guide §1.4), interleaved min-of-N (the bench's estimator — config/plan
A/Bs must interleave passes, not run back-to-back, per the verify-skill
gotcha), and can dump .explain("formatted") to plans/r14/.

Usage:
  python scripts/opt_measure.py time  <reps> <query> [query ...]
  python scripts/opt_measure.py plan  <suffix> <query> [query ...]
  python scripts/opt_measure.py timeplan <reps> <suffix> <query> ...

Environment: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
(default 32) — identical session setup to bench.py so numbers compare.
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> None:
    mode = sys.argv[1]
    if mode in ("time", "timeplan"):
        reps = int(sys.argv[2])
        rest = sys.argv[3:]
    else:
        reps = 0
        rest = sys.argv[2:]
    if mode in ("plan", "timeplan"):
        suffix = rest[0]
        names = rest[1:]
    else:
        suffix = None
        names = rest

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from yamr_spark.registry import all_queries
    from yamr_spark.session import get_spark

    spark = get_spark("opt_measure", shuffle_partitions=int(cpus))
    queries = all_queries()
    for n in names:
        if n not in queries:
            raise SystemExit(f"unknown query: {n}")

    # same warmups as bench.py
    warm = spark.range(100_000).selectExpr("id % 7 AS k", "id AS v")
    warm.groupBy("k").count().write.format("noop").mode("overwrite").save()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    rnd = os.environ.get("YAMR_PLANS_ROUND", "r15")
    if suffix is not None:
        os.makedirs(os.path.join(repo, "plans", rnd), exist_ok=True)
        for n in names:
            df = queries[n](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(repo, "plans", rnd, f"{n}_{suffix}.txt")
            with open(out, "w") as fh:
                fh.write(p)
            print(f"wrote {out}", flush=True)

    if mode in ("time", "timeplan"):
        # store-backed queries: untimed first invocation builds the store
        store_backed = {
            "ivf_probe_partitioned",
            "split_store_train_counts",
            "ivf_pq_store_probe",
            "ivf_pq_store_incremental",
            "ivf_pq_store_frozen",
            "ivf_pq_store_frozen_m16",
        }
        for n in names:
            if n in store_backed:
                queries[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
        # mirror bench.py's r15 protocol so A/B numbers compare: shared
        # caches cleared per pass, per-query blocks freed after each sink
        try:
            from yamr_spark import materialize as _M
        except ImportError:  # pre-r15 tree
            _M = None
        if _M is not None and hasattr(_M, "free_blocks"):
            _M.free_blocks()
            _M.free_shared_caches()
        timings: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(reps):
            if _M is not None and hasattr(_M, "free_shared_caches"):
                _M.free_shared_caches()
            for n in names:
                spark.sparkContext.setJobDescription(f"opt:{n}")
                t0 = time.perf_counter()
                df = queries[n](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                timings[n].append(round(time.perf_counter() - t0, 3))
                if _M is not None and hasattr(_M, "free_blocks"):
                    _M.free_blocks()
                spark.sparkContext.setJobDescription(None)
        out = {
            n: {"min": min(v), "all": v} for n, v in timings.items()
        }
        print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
