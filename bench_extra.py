"""Round-6 measurement harness (bench.py is FROZEN for the driver;
this file exists so the optimization loop can time ONLY the headline
queries, per guide §1: isolate the computation, label jobs, repeat).

Usage:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--reps N]
      [--noop] [--explain OUTDIR] [--tag TAG]

- Same session config as bench.py (get_spark, cores=$SPARK_GRAFT_CPUS,
  shuffle_partitions=cores, tmpfs shuffle) so numbers are comparable.
- --noop times df.write.format("noop") instead of .count() (guide §1.4);
  default stays .count() because that is what the frozen bench times.
- --explain writes <query>.txt with explain("formatted") per query.
- Prints one JSON line: {"sf", "reps", "queries": {name: [sec,...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default="")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from sandcrawler_spark.session import get_spark

    spark = get_spark(f"bench-extra-{args.tag or 'x'}", cores=cpus, shuffle_partitions=cpus)

    import bench as bench_mod
    from sandcrawler_spark.queries import QUERIES

    names = [q for q in args.queries.split(",") if q] or bench_mod.HEADLINE

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({"explained": names, "dir": args.explain}))
        return

    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"{args.tag}:{name}:rep{rep}")
            fn = QUERIES[name]
            t0 = time.perf_counter()
            if args.noop:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            else:
                n = fn(spark, args.sf).count()
                assert n >= 0
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf": args.sf,
        "reps": args.reps,
        "mode": "noop" if args.noop else "count",
        "queries": times,
        "median": {
            n: sorted(v)[len(v) // 2] for n, v in times.items()
        },
        "min": {n: min(v) for n, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
