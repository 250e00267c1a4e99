"""Round-14 diagnosis: why do headline samples inflate inside the full
bench relative to isolated runs (q1: 2.92 in-bench vs 1.11 isolated at
identical code/machine)?

Replicates bench.py's exact phase order but prints EVERY sample with a
timestamp plus JVM memory/GC/code-cache counters between phases, so the
inflation can be attributed (GC debt, JIT code-cache pressure, Python
worker churn, AQE/codegen compile time).

    python scripts/diag_inflation.py [n_extras]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oraaud_kafka_spark import registry
from oraaud_kafka_spark.session import get_spark

from bench import EXTRAS, HEADLINE


def jvm_stats(spark) -> str:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out = [f"heap={heap.getUsed() // (1 << 20)}M/{heap.getCommitted() // (1 << 20)}M"]
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc = it.next()
        out.append(f"{gc.getName().replace(' ', '')}={gc.getCollectionCount()}x/{gc.getCollectionTime()}ms")
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        n = p.getName()
        if "CodeHeap" in n or "Metaspace" in n:
            out.append(f"{n.replace(' ', '')}={p.getUsage().getUsed() // (1 << 20)}M")
    return " ".join(out)


def main() -> None:
    n_extras = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="diag-inflation")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]
    extras = [n for n in EXTRAS if n in registry.QUERIES][:n_extras]

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def phase(tag: str, queries, reps=1) -> None:
        for name in queries:
            ts = [run_once(name) for _ in range(reps)]
            print(
                f"{tag} {name}: " + " ".join(f"{t:.3f}" for t in ts),
                flush=True,
            )
        print(f"## after {tag}: {jvm_stats(spark)}", flush=True)

    print(f"## start: {jvm_stats(spark)}", flush=True)
    phase("warm", names, reps=2)
    phase("pass1-headline", names, reps=2)
    phase("pass1-extras", extras, reps=1)
    phase("pass2-headline", names, reps=2)
    phase("pass2-extras", extras, reps=1)
    phase("pass3-headline", names, reps=2)
    spark.stop()


if __name__ == "__main__":
    main()
