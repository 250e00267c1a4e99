"""Engine configuration: the reference's full ``a2.*`` java-properties
surface (R-20, OraaudKafka.java:133-276) re-expressed as a typed config
that drives the Spark ingest pipeline.

Every key the reference reads is accepted with the same name, default,
and clamp semantics, so an operator of the reference can point this
engine at their existing ``oraaud-kafka.conf`` unchanged:

- a2.watched.path             required; must be an existing directory
                              (OraaudKafka.java:152-173)
- a2.target.broker            kafka | kinesis, default kafka (:141-150)
- a2.worker.count             default 16, clamped to [0,150] (:65-70,355-373)
- a2.locked.file.query.interval  ms, default 1000 (:54-55,177-186)
- a2.kafka.servers/.topic/.client.id  required for kafka
                              (KafkaSingleton.java:65-92)
- a2.kafka.{compression.type,acks,batch.size,linger.ms,buffer.memory,
  max.request.size,retries,security.protocol,security.truststore.*}
  pass through to the Kafka sink as ``kafka.*`` options
  (KafkaSingleton.java:107-139); compression defaults to gzip (:108-114)
- a2.security.jaas.config     SASL JAAS string (KafkaSingleton.java:94-105)
- a2.kinesis.{stream,region,access.key,access.secret} required for
  kinesis (KinesisSingleton.java:70-103)
- a2.kinesis.file.size.threshold    gzip threshold, default 512 B (:36,144-153)
- a2.kinesis.max.connections        default 1 (:106-116)
- a2.kinesis.request.timeout        default 30000 ms (:119-129)
- a2.kinesis.request.record.max.buffered.time  default 5000 ms (:132-142)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

WORKER_DEFAULT = 16
WORKER_MAX = 150
LOCK_INTERVAL_DEFAULT_MS = 1000
KINESIS_GZIP_THRESHOLD_DEFAULT = 512


class ConfigError(ValueError):
    """Invalid/missing configuration — the analog of the reference's
    validation-and-exit paths (System.exit in OraaudKafka.main)."""


def parse_properties(text: str) -> dict[str, str]:
    """Minimal java-properties parser: `k = v` / `k=v` lines, `#`/`!`
    comments, blank lines skipped."""
    props: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" not in line:
            raise ConfigError(f"malformed property line: {raw!r}")
        k, _, v = line.partition("=")
        props[k.strip()] = v.strip()
    return props


def _clamped_workers(raw: str | None) -> int:
    if raw is None or not raw.strip():
        return WORKER_DEFAULT
    try:
        n = int(raw)
    except ValueError as e:
        raise ConfigError(f"a2.worker.count not an integer: {raw!r}") from e
    return max(0, min(n, WORKER_MAX))


# reference kafka tunables -> producer option names (KafkaSingleton.java:107-139)
_KAFKA_PASSTHROUGH = {
    "a2.kafka.compression.type": "compression.type",
    "a2.kafka.acks": "acks",
    "a2.kafka.batch.size": "batch.size",
    "a2.kafka.linger.ms": "linger.ms",
    "a2.kafka.buffer.memory": "buffer.memory",
    "a2.kafka.max.request.size": "max.request.size",
    "a2.kafka.retries": "retries",
    "a2.kafka.security.protocol": "security.protocol",
    "a2.kafka.security.truststore.location": "ssl.truststore.location",
    "a2.kafka.security.truststore.password": "ssl.truststore.password",
    "a2.security.jaas.config": "sasl.jaas.config",
}


@dataclass
class EngineConfig:
    watched_path: str
    target_broker: str = "kafka"
    worker_count: int = WORKER_DEFAULT
    lock_interval_ms: int = LOCK_INTERVAL_DEFAULT_MS
    # kafka
    kafka_servers: str | None = None
    kafka_topic: str | None = None
    kafka_client_id: str | None = None
    kafka_options: dict[str, str] = field(default_factory=dict)
    # kinesis
    kinesis_stream: str | None = None
    kinesis_region: str | None = None
    kinesis_access_key: str | None = None
    kinesis_access_secret: str | None = None
    kinesis_gzip_threshold: int = KINESIS_GZIP_THRESHOLD_DEFAULT
    kinesis_max_connections: int = 1
    kinesis_request_timeout_ms: int = 30000
    kinesis_record_max_buffered_ms: int = 5000

    @property
    def trigger(self) -> str:
        """Lock-poll interval -> streaming trigger (R-7)."""
        return f"{self.lock_interval_ms} milliseconds"

    @property
    def max_files_per_trigger(self) -> int | None:
        """Worker count bounds per-batch admission the way the pool
        bounded concurrent transfers (R-17); 0 = unbounded."""
        return self.worker_count or None


def load_config(path_or_text: str) -> EngineConfig:
    """Build an EngineConfig from a properties file path or raw text,
    with the reference's validation rules."""
    text = (
        open(path_or_text).read() if os.path.exists(path_or_text) else path_or_text
    )
    p = parse_properties(text)

    watched = p.get("a2.watched.path", "")
    if not watched:
        raise ConfigError("a2.watched.path is required")
    if not os.path.isdir(watched):
        raise ConfigError(f"a2.watched.path is not a directory: {watched}")

    broker = p.get("a2.target.broker", "kafka").lower()
    if broker not in ("kafka", "kinesis"):
        raise ConfigError(f"a2.target.broker must be kafka|kinesis, got {broker!r}")

    try:
        interval = int(p.get("a2.locked.file.query.interval", LOCK_INTERVAL_DEFAULT_MS))
    except ValueError as e:
        raise ConfigError("a2.locked.file.query.interval not an integer") from e

    cfg = EngineConfig(
        watched_path=watched,
        target_broker=broker,
        worker_count=_clamped_workers(p.get("a2.worker.count")),
        lock_interval_ms=interval,
    )

    if broker == "kafka":
        cfg.kafka_servers = p.get("a2.kafka.servers")
        cfg.kafka_topic = p.get("a2.kafka.topic")
        cfg.kafka_client_id = p.get("a2.kafka.client.id")
        missing = [
            k
            for k, v in {
                "a2.kafka.servers": cfg.kafka_servers,
                "a2.kafka.topic": cfg.kafka_topic,
                "a2.kafka.client.id": cfg.kafka_client_id,
            }.items()
            if not v
        ]
        if missing:
            raise ConfigError(f"missing required kafka settings: {missing}")
        # gzip by default, like the reference (KafkaSingleton.java:108-114)
        opts = {"compression.type": "gzip", "client.id": cfg.kafka_client_id}
        for a2_key, opt in _KAFKA_PASSTHROUGH.items():
            if a2_key in p:
                opts[opt] = p[a2_key]
        cfg.kafka_options = opts
    else:
        cfg.kinesis_stream = p.get("a2.kinesis.stream")
        cfg.kinesis_region = p.get("a2.kinesis.region")
        cfg.kinesis_access_key = p.get("a2.kinesis.access.key")
        cfg.kinesis_access_secret = p.get("a2.kinesis.access.secret")
        missing = [
            k
            for k, v in {
                "a2.kinesis.stream": cfg.kinesis_stream,
                "a2.kinesis.region": cfg.kinesis_region,
                "a2.kinesis.access.key": cfg.kinesis_access_key,
                "a2.kinesis.access.secret": cfg.kinesis_access_secret,
            }.items()
            if not v
        ]
        if missing:
            raise ConfigError(f"missing required kinesis settings: {missing}")
        cfg.kinesis_gzip_threshold = int(
            p.get("a2.kinesis.file.size.threshold", KINESIS_GZIP_THRESHOLD_DEFAULT)
        )
        cfg.kinesis_max_connections = int(p.get("a2.kinesis.max.connections", 1))
        cfg.kinesis_request_timeout_ms = int(p.get("a2.kinesis.request.timeout", 30000))
        cfg.kinesis_record_max_buffered_ms = int(
            p.get("a2.kinesis.request.record.max.buffered.time", 5000)
        )
    return cfg
