"""Daemon entry point — the reference's ``main`` re-expressed
(OraaudKafka.java:133-276):

    python -m oraaud_kafka_spark <path-to-conf> [--checkpoint DIR] [--once]

Loads the ``a2.*`` properties file, validates it with the reference's
exit codes (2 = usage, 3 = config/broker, 4 = watched path), builds the
SparkSession, starts the streaming pipeline, and blocks on
awaitTermination — the analog of the reference's main thread parking in
its watch loop. ``--once`` runs a single availableNow pass (drain the
backlog and exit 0), the batch/backfill mode the reference lacks.
"""

from __future__ import annotations

import sys

EXIT_USAGE = 2
EXIT_CONFIG = 3
EXIT_WATCHED_PATH = 4


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    opts = {a for a in argv if a.startswith("--")}
    checkpoint = None
    for i, a in enumerate(argv):
        if a == "--checkpoint" and i + 1 < len(argv):
            checkpoint = argv[i + 1]
            args.remove(checkpoint)
    if len(args) != 1:
        print(
            "Usage: python -m oraaud_kafka_spark <configuration file> "
            "[--checkpoint DIR] [--once]",
            file=sys.stderr,
        )
        return EXIT_USAGE

    from .config import ConfigError, load_config

    try:
        cfg = load_config(args[0])
    except ConfigError as e:
        msg = str(e)
        print(f"FATAL: {msg}\nExiting.", file=sys.stderr)
        return EXIT_WATCHED_PATH if "watched.path" in msg else EXIT_CONFIG
    except OSError as e:
        print(f"FATAL: cannot read configuration: {e}\nExiting.", file=sys.stderr)
        return EXIT_CONFIG

    from .session import get_spark
    from .streaming.ingest import IngestMetrics, run_from_config

    spark = get_spark(app_name="oraaud-kafka-spark-daemon")
    metrics = IngestMetrics()
    spark.streams.addListener(metrics)
    query = run_from_config(
        spark,
        cfg,
        checkpoint_dir=checkpoint or f"{cfg.watched_path.rstrip('/')}/.checkpoint",
        available_now="--once" in opts,
    )
    try:
        query.awaitTermination()
    except KeyboardInterrupt:
        # the reference's shutdown hook: flush and stop (R-19)
        query.stop()
    finally:
        print(
            f"files={metrics.files} bytes={metrics.bytes} "
            f"batches={metrics.batches} total_batch_ms={metrics.total_batch_ms}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
