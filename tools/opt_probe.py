"""Round-13 optimization probe: time individual headline/catalog
queries with the bench methodology (full plan -> execute -> count,
first rep discarded as warmup, min of remaining reps) and dump
`.explain("formatted")` plans for before/after evidence.

Usage:
  python tools/opt_probe.py [--tag before|after] [--reps 3]
      [--sf /root/testdata/sf0.1] [--plans-only] query [query ...]

Writes plans/r13/<query>_<tag>.txt when --tag is given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from github_etl_spark.plans import QUERIES  # noqa: E402
from github_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--final", action="store_true")
    ap.add_argument("--round", default="r14", help="plans/<round>/ output dir")
    args = ap.parse_args()

    spark = get_spark("opt_probe")
    spark.range(1000).count()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", args.round)
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.queries:
        fn = QUERIES[name].fn
        if args.tag:
            df = fn(spark, args.sf)
            if args.final:
                # Execute first so AQE finalizes: the captured plan then
                # shows runtime decisions (elided ENSURE_REQUIREMENTS
                # exchanges over cached partitioned frames, join
                # rewrites, coalesced reads) instead of the
                # pre-execution worst case.
                df.write.format("noop").mode("overwrite").save()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(plan_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"# plan -> {path}", file=sys.stderr)
        if args.plans_only:
            continue
        runs = []
        warm = None
        n = 0
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"probe:{name}:{i}")
            t0 = time.perf_counter()
            n = fn(spark, args.sf).count()
            dt = time.perf_counter() - t0
            if i == 0 and args.reps > 1:
                warm = dt
            else:
                runs.append(dt)
        body = f"min of {len(runs)} = {min(runs):.3f}s [{min(runs):.3f}..{max(runs):.3f}]" if runs else ""
        print(f"{name}: {n} rows, warm {warm if warm is None else round(warm,3)}s, {body}")


if __name__ == "__main__":
    main()
