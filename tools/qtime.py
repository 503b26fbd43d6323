"""Round-13 optimization harness: time named queries in isolation and
capture their formatted plans.

Usage:
    python tools/qtime.py [--sf DIR] [--reps N] [--plan OUTDIR] [--suffix S]
                          name [name ...]

Per query: builds the DataFrame, runs one warm-up materialization, then
``reps`` timed materializations (same ``sum(xxhash64(*))`` action as
bench.py so numbers are comparable), prints min/median/max.  With
``--plan`` also writes ``OUTDIR/<name>_<suffix>.txt`` containing
``explain('formatted')``.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plan", default=None, help="dir to write formatted plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--final", action="store_true",
        help="also capture the post-execution (AQE-final) plan",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.session import get_spark
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark import queries as q
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators.graph import (
        release_components,
    )
    from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.sources.registry import (
        load_table,
    )
    from pyspark.sql import functions as F

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, args.sf, "lineitem").count()  # warm FS + JVM

    def materialize(df) -> int:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]
        return row["n"]

    for name in args.names:
        fn = q.QUERIES.get(name) or q.AUX_QUERIES[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        df = fn(spark, args.sf)
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plan, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        if args.reps == 0:  # plan-only mode
            release_components(df)
            print(f"{name}: plan captured", flush=True)
            continue
        t0 = time.time()
        n = materialize(df)
        cold = time.time() - t0
        release_components(df)
        runs = []
        for _ in range(args.reps):
            t0 = time.time()
            df = fn(spark, args.sf)
            n = materialize(df)
            runs.append(time.time() - t0)
            release_components(df)
        if args.plan and args.final:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plan, f"{name}_{args.suffix}_final.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.catalog.clearCache()
        runs.sort()
        print(
            f"{name}: median {statistics.median(runs):.3f}s "
            f"min {runs[0]:.3f} max {runs[-1]:.3f} "
            f"(cold {cold:.2f}s, {n} rows, reps {args.reps}, "
            f"load {os.getloadavg()[0]:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
