"""Round-14 measurement harness: time one or more registered queries
with the noop sink (guide §1.4) and dump their .explain("formatted")
plans.

    python scripts/measure_query.py [--sf-dir DIR] [--reps N]
        [--plans-out DIR/suffix e.g. plans/r14:before] name [name ...]

Per query: warms twice, then reps timed noop writes; prints min/median.
With --plans-out the formatted plan goes to <dir>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oraaud_kafka_spark import registry
from oraaud_kafka_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans-out", default=None,
                    help="dir:suffix — write <dir>/<name>_<suffix>.txt")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="measure-query")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    plans_dir = suffix = None
    if args.plans_out:
        plans_dir, suffix = args.plans_out.split(":", 1)
        os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        if name not in registry.QUERIES:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"measure:{name}")
        df = registry.QUERIES[name](spark, args.sf_dir)
        if plans_dir:
            # plan dumped from a dedicated build; the timed loop below
            # rebuilds per rep (round-15 fix: queries whose build
            # computes data — eager checkpoints, driver-side iteration
            # — are no longer memoized, and timing a pre-built frame
            # would exclude exactly that work)
            jvm = spark.sparkContext._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
            path = os.path.join(plans_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
        ts = []
        for i in range(2 + args.reps):
            t0 = time.perf_counter()
            df_i = registry.QUERIES[name](spark, args.sf_dir)
            df_i.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i >= 2:  # discard two warm runs
                ts.append(dt)
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s "
            f"all={[round(t, 3) for t in ts]}"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
