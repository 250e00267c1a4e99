"""Simulate the driver's sf0.01 correctness gate over the full registry.

The local pytest parity suite runs at sf0.001; the external driver runs at
sf0.01. Scale changes tie structure and float magnitudes, so before each
round freezes we re-run every (query, oracle) pair at the driver's scale:

    python scripts/gate_sim.py [sf_dir] [name ...]

Prints one line per query and a final summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from oraaud_kafka_spark import registry
from oraaud_kafka_spark.testing import compare_frames, run_oracle


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("gate-sim")
        .getOrCreate()
    )
    registry.load_all()
    names = [n for n in registry.all_queries() if not only or n in only]
    failures: list[str] = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            spark_pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
            oracle = registry.ORACLES.get(name)
            if oracle is None:
                status = f"rows-only ({len(spark_pdf)})"
            else:
                oracle_pdf = run_oracle(oracle, sf_dir)
                problems = compare_frames(spark_pdf, oracle_pdf)
                if problems:
                    failures.append(name)
                    status = "FAIL " + "; ".join(problems)[:400]
                else:
                    status = f"ok ({len(spark_pdf)} rows)"
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append(name)
            status = f"ERROR {type(e).__name__}: {e}"
            traceback.print_exc()
        print(f"[{i + 1}/{len(names)}] {name}: {status} [{time.time() - t0:.1f}s]")
        sys.stdout.flush()
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
