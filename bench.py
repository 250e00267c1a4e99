"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oraaud_kafka_spark import registry
from oraaud_kafka_spark.session import get_spark

# Headline set: one (heavy) representative per operator family. Fixed
# since round 1 — the driver's round-over-round regression baseline;
# never add here, add to EXTRAS.
HEADLINE = [
    "q1_pricing_summary",      # scan + filter + groupBy agg
    "q_join_5way_revenue",     # star join (broadcast dims + 1 shuffle join)
    "q_join_asof",             # as-of via union + single window pass
    "q_agg_rollup",            # hierarchical agg
    "q_window_topk_per_group", # ranking window + filter
    "q_sort_top10_global",     # TakeOrderedAndProject
    "q_json_from_json",        # semistructured parse
    "q_time_session_window",   # event-time sessionization
    "q_dedup_minhash_lsh",     # shingle->minhash->band->bucket join
    "q_sim_cosine_topk_brute", # broadcast queries x corpus + window top-k
    "q_text_quality_score",    # text feature extraction
    "q_emb_centroids",         # posexplode + partial agg (corpus mgmt)
]

# Everything else in the registry, timed and reported under
# queries_extra and EXCLUDED from the headline total so "value" stays
# comparable to BENCH_r01. Derived (round-10): the full registry minus
# HEADLINE, so every registered query lands in bench_history.jsonl and
# the no-regression gate covers the whole surface — the hand-curated
# list below stopped at 117 of 250 names (the round-8/9 bench blind
# spot). Wall-time budget: extras take ONE timed run per pass with
# pass 1 doubling as the warm run (2 executions each; min of the two
# pass-separated samples reported), headline keeps min-of-2 inside
# each of 2 passes after a dedicated warm (5 executions each) — at
# sf0.1 on local[32] the whole bench stays in the low single-digit
# minutes.
registry.load_all()
EXTRAS = [n for n in registry.all_queries() if n not in HEADLINE]


def _is_code_file(path: str) -> bool:
    """False for the files whose churn says nothing about the measured
    code: the bench's own history file and the DRIVER'S per-round
    output artifacts. The driver runs bench with untracked
    BENCH_r*/CORRECTNESS_r* files and a rewritten VERDICT/ADVICE
    sitting in the tree (round-12 finding: that alone tagged every
    driver run '-dirty' and made the quietest-pass substitution inert
    in exactly the loaded-run scenario it exists for), and the commit
    that lands those artifacts must not orphan same-code history
    entries recorded moments earlier."""
    import re

    name = path.rsplit("/", 1)[-1]
    return not (
        name == "bench_history.jsonl"
        or name in ("VERDICT.md", "ADVICE.md")
        or re.fullmatch(r"(BENCH|CORRECTNESS)_r\d+\.json", name)
    )


def _git_tag() -> str:
    """Content hash of every committed CODE blob, suffixed '-dirty'
    when any code file has uncommitted changes — recorded into every
    history entry so the quietest-pass artifact selection can only
    ever substitute a run of IDENTICAL code. Content-based (not HEAD)
    and blind to non-code churn (_is_code_file) on purpose."""
    import hashlib
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        tree = subprocess.run(
            ["git", "-C", repo, "ls-tree", "-r", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout
        status = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain"],
            capture_output=True, text=True, timeout=10,
        ).stdout
    except (OSError, subprocess.SubprocessError):  # pragma: no cover
        return "unknown"
    if not tree:
        return "unknown"
    lines = sorted(
        ln
        for ln in tree.splitlines()
        if _is_code_file(ln.split("\t", 1)[-1])
    )
    tag = hashlib.md5("\n".join(lines).encode()).hexdigest()[:12]
    dirty = [
        ln
        for ln in status.splitlines()
        if ln.strip() and _is_code_file(ln[3:].strip().strip('"'))
    ]
    return f"{tag}-dirty" if dirty else tag


def _quietest_same_code(
    hist_path: str, git_tag: str, record: dict, extras: dict
) -> dict | None:
    """Quiet same-commit reference lookup: if THIS run started loaded
    and a prior history entry measured the SAME commit (clean tree),
    same sf, and identical query rosters under lower load1, return the
    quietest such entry. Since round 14 (advisor measurement-integrity
    finding) the result only annotates the emitted artifact as
    quiet_ref_* supplementary fields — the headline "value" is always
    the value this run measured — unless the evaluator explicitly opts
    into substitution with SPARK_GRAFT_BENCH_SUBSTITUTE=1."""
    if git_tag.endswith("-dirty") or git_tag == "unknown":
        return None
    best = None
    try:
        with open(hist_path) as f:
            lines = f.readlines()
    except OSError:
        return None
    for ln in lines:
        try:
            h = json.loads(ln)
        except ValueError:
            continue
        if (
            h.get("git") == git_tag
            and h.get("sf") == record["sf"]
            and set(h.get("queries", ())) == set(record["queries"])
            and set(h.get("queries_extra", ())) == set(extras)
            and isinstance(h.get("load1"), (int, float))
            and h["load1"] < record["load1"]
            # the candidate must itself be contention-free: a low load1
            # with competing JVMs present is exactly the round-10
            # failure mode jvms_other was added to expose
            and h.get("jvms_other", 1) == 0
            and (best is None or h["load1"] < best["load1"])
        ):
            best = h
    return best


def _finalize_record(record: dict, quiet: dict | None, opt_in: bool) -> dict:
    """Shape the stdout artifact. The headline `value`/`queries` are
    ALWAYS this run's measurement; a quiet same-commit reference (when
    one exists) rides along as quiet_ref_* supplementary fields.
    Substitution of the historical pass requires an explicit evaluator
    opt-in (SPARK_GRAFT_BENCH_SUBSTITUTE=1) and is fully disclosed via
    artifact_source + measured_now_*."""
    if quiet is not None and opt_in:
        stdout_keys = [k for k in record if k not in ("queries", "value")]
        return {
            **{k: quiet.get(k, record[k]) for k in stdout_keys},
            "artifact_source": "quietest_same_commit_pass",
            "measured_now_load1": record["load1"],
            "measured_now_value": record["value"],
            "queries": quiet["queries"],
            "value": quiet["value"],
        }
    supplement = {}
    if quiet is not None:
        supplement = {
            "quiet_ref_value": quiet["value"],
            "quiet_ref_load1": quiet["load1"],
            "quiet_ref_ts": quiet.get("ts"),
        }
    return {
        **{k: v for k, v in record.items() if k not in ("queries", "value")},
        "artifact_source": "this_run",
        **supplement,
        "queries": record["queries"],
        "value": record["value"],
    }


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - non-POSIX
        return -1.0


def _other_jvms() -> int:
    """Concurrent JVM count — the dominant noise source on this box
    (round-10's official bench ran 1.28x over an identical-code run 70
    minutes earlier; the per-query inflation profile matched scheduler
    contention). Counted BEFORE this bench's own session starts, so any
    nonzero value means a competing JVM."""
    n = 0
    try:
        pids = os.listdir("/proc")
    except OSError:  # pragma: no cover - non-Linux (no procfs)
        return 0
    for pid in pids:
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv0 = f.read().split(b"\0", 1)[0]
        except OSError:
            continue
        if argv0.endswith(b"java") or argv0.endswith(b"java.exe"):
            n += 1
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Machine-load context recorded into every bench entry so a noisy
    # run can never masquerade as a code regression again (round-11
    # verdict item). Captured before our own JVM exists.
    load_start = _load1()
    jvms_other = _other_jvms()
    noisy = load_start >= 4.0 or jvms_other > 0
    if noisy:
        print(
            f"# WARNING high machine load at bench start "
            f"(load1={load_start}, other JVMs={jvms_other}) — an extra "
            "headline pass will run so the min can land in a quieter "
            "window",
            file=sys.stderr,
        )
    spark = get_spark(app_name="oraaud-kafka-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]

    def run_once(name: str) -> float:
        # noop write materializes EVERY output column JVM-side — count()
        # would let Catalyst prune the computed columns of map-only
        # queries and under-measure them
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm every headline query TWICE so timings measure the engine in
    # steady state (codegen compiled, JIT tiers settled, classes
    # loaded, file listings cached) rather than first-call overhead —
    # measured on this box, the per-query floor is only reached after
    # 3-4 executions (C2 compilation of the generated stages), and one
    # warm left samples 30-50% above it.
    for _ in range(2):
        for name in names:
            run_once(name)

    # Warm the Arrow Python workers (one per core) before ANY timed
    # loop: the first pandas-UDF/mapInPandas query of a pass otherwise
    # pays worker spawn + Arrow init, charged to whichever extras name
    # happens to run first in roster order — observed as a ±0.4 s
    # anti-correlation between q_multimodal_phash and
    # q_multimodal_decode_stats across round-11 entries.
    def _arrow_ident(batches):
        yield from batches

    (
        spark.range(spark.sparkContext.defaultParallelism * 8)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_arrow_ident, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # settle GC debt from the warm loop so it isn't charged to the first
    # measured query
    spark.sparkContext._jvm.System.gc()

    # Two full passes over the suite, reported value = min across the
    # samples. Back-to-back min-of-3 turned out not to be noise-proof:
    # a sustained interference window (noisy neighbor, GC thrash)
    # covers all consecutive samples of one query and inflates its
    # "min" 5-10x. Separating sample groups by a whole suite pass
    # (~minutes) makes that failure mode require the interference to
    # span the entire bench. The HEADLINE metric keeps min-of-2 inside
    # each pass (4 samples after a dedicated warm); the extras (the full registry minus the headliners) —
    # informational coverage of the whole registry — take ONE timed
    # run per pass with pass 1 doubling as their warm run, so each
    # extra costs exactly 2 executions and total bench wall time stays
    # bounded as the registry grows (the min of the two pass-separated
    # samples discards the cold-plan cost of pass 1).
    samples: dict[str, list[float]] = {}
    extras_names = [n for n in EXTRAS if n in registry.QUERIES]
    for _pass in range(2):
        for name in (*names, *extras_names):
            n_inner = 2 if name in HEADLINE else 1
            best = min(run_once(name) for _ in range(n_inner))
            samples.setdefault(name, []).append(best)

    if noisy:
        # third pass over the HEADLINE only (~seconds): under start-time
        # contention the min of the earlier passes may never have seen a
        # quiet scheduler window; one more widely-separated pass gives
        # the official metric that chance without re-running the extras
        for name in names:
            best = min(run_once(name) for _ in range(2))
            samples[name].append(best)

    timings = {n: round(min(samples[n]), 4) for n in names}
    for name in names:
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    extras = {n: round(min(samples[n]), 4) for n in extras_names}
    for name in extras_names:
        print(f"# extra {name}: {extras[name]:.3f}s", file=sys.stderr)

    # Ingest throughput: the reference's own workload (audit files ->
    # sink). Synthetic corpus, full pipeline, one availableNow pass.
    from oraaud_kafka_spark.streaming.bench_ingest import run_ingest_bench

    ingest = run_ingest_bench(spark)
    print(f"# ingest: {ingest['ingest_mbps']} MB/s "
          f"({ingest['ingest_files']} files, {ingest['ingest_sec']}s)",
          file=sys.stderr)

    total = round(sum(timings.values()), 4)
    # Driver artifact storage keeps only a ~2000-char tail of stdout;
    # round 6's line outgrew it (65 extras inline) and the official
    # headline was lost (`parsed: null`). Two defenses:
    #   1. the stdout line stays SHORT (per-extra timings move to the
    #      history file; only their total stays inline) and orders
    #      `queries`/`value` LAST so even a truncated tail still carries
    #      the headline numbers;
    #   2. the full record (extras included) appends to an in-repo
    #      bench_history.jsonl, so round-over-round comparison never
    #      depends on driver artifact storage again.
    record = {
        "metric": "headline_queries_total_sec",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Measurement-methodology epoch (round-15 integrity fix): epoch 2
        # entries time FULLY RECOMPUTED invocations — query builds that
        # eagerly checkpoint or collect at build time are no longer plan-
        # memoized, so every timed sample pays the whole computation from
        # parquet. Epoch-1 entries (pre-fix) under-measured those queries
        # by serving build-time-computed state to later samples; the two
        # populations are NOT comparable, and the history regression
        # gates only compare entries of equal epoch.
        "meas_epoch": 2,
        # per-query value = best of 4 samples taken as min-of-2 inside
        # each of 2 whole-suite-separated passes (see comment above);
        # 6 when the loaded-start extra headline pass ran — recorded so
        # a loaded-machine driver run is identifiable AND its different
        # sampling protocol is stated, not silently mislabeled
        "best_of": 6 if noisy else 4,
        # load context: 1-minute loadavg at start (before our JVM) —
        # the regression gate uses this to tell a noisy run from a
        # real regression; full context goes to the history entry
        "load1": load_start,
        **ingest,
        "queries_extra_total_sec": round(sum(extras.values()), 4),
        "queries": timings,
        "value": total,
    }
    hist_path = os.environ.get("SPARK_GRAFT_BENCH_HISTORY") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"
    )
    git_tag = _git_tag()
    try:
        with open(hist_path, "a") as f:
            f.write(json.dumps({**record, "queries_extra": extras,
                                "load1_end": _load1(),
                                "jvms_other": jvms_other,
                                "extra_headline_pass": noisy,
                                "git": git_tag,
                                "ts": int(time.time())}) + "\n")
    except OSError as e:
        # best-effort telemetry: a read-only checkout or full disk must
        # not kill the run before the headline line prints — that would
        # recreate the exact lost-headline failure this file defends
        # against
        print(f"# WARNING bench history not written: {e}", file=sys.stderr)
    # Measurement integrity (round-13 advisor, HIGH): the headline
    # "value" is ALWAYS the value this run measured — never replaced by
    # a historical pass, however comparable. When this run started
    # loaded and a quiet SAME-COMMIT same-roster pass exists in
    # history, that pass rides along as supplementary quiet_ref_*
    # fields so the reader can tell machine noise from a code
    # regression, but the metric of record reflects the run that
    # produced it. Substitution (the pre-round-14 behavior) now
    # requires the evaluator to explicitly opt in via
    # SPARK_GRAFT_BENCH_SUBSTITUTE=1.
    quiet = _quietest_same_code(hist_path, git_tag, record, extras) if noisy else None
    opt_in = os.environ.get("SPARK_GRAFT_BENCH_SUBSTITUTE") == "1"
    if quiet is not None:
        verb = (
            "substituting (explicit SPARK_GRAFT_BENCH_SUBSTITUTE=1 opt-in)"
            if opt_in
            else "headline stays the measured value; reference only"
        )
        print(
            f"# quiet same-commit pass available: load1 {quiet['load1']} "
            f"value {quiet['value']} vs {record['load1']} / "
            f"{record['value']} measured now — {verb}",
            file=sys.stderr,
        )
    record = _finalize_record(record, quiet, opt_in)
    line = json.dumps(record)
    if len(line) > 1900:  # pragma: no cover - contract guard
        print(f"# WARNING stdout line {len(line)} chars nears the "
              "driver's 2000-char tail", file=sys.stderr)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
